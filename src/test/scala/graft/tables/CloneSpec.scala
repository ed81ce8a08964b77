package graft.tables

import java.nio.file.Files

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zero-copy SHALLOW CLONE: the clone's first commit references the
  * source's data files by qualified URI — no bytes copied; every clone
  * operation (read, DML, compact, vacuum) leaves the source untouched. */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-clone").toString

  private def baseDf = spark.range(1000)
    .select(col("id"), (col("id") % 10).as("grp"), (col("id") * 2).as("v"))

  private def parquetsUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(dir))
  }

  test("clone reads the source's files; zero bytes copied") {
    val d = tmpDir()
    val src = VersionedTable.create(spark, baseDf.repartition(4), d + "/src")
    val c = src.shallowCloneTo(d + "/clone")
    assert(c.read.collect().toSet === src.read.collect().toSet)
    assert(parquetsUnder(d + "/clone").isEmpty, "clone must copy no data")
    val m = c.history(1).select("operationMetrics")
      .as[Map[String, String]].collect().head
    assert(m("numCopiedFiles") === "0")
    assert(m("numReferencedFiles").toInt === 4)
  }

  test("DML on the clone never mutates the source — including DV deletes") {
    val d = tmpDir()
    val src = VersionedTable.create(spark, baseDf.repartition(4), d + "/src")
    val c = src.shallowCloneTo(d + "/clone")
    // a deletion-vector delete on REFERENCED files: the sidecar must
    // resolve against the clone's absolute-URI log paths
    assert(c.delete("id % 100 < 10", deletionVectors = true) === 100L)
    c.append(Seq((5000L, 0L, 0L)).toDF("id", "grp", "v"))
    assert(c.read.count() === 901)
    assert(c.read.filter(col("id") === 7).count() === 0)
    // source sees none of it
    assert(src.read.count() === 1000)
    assert(parquetsUnder(d + "/src").size === 4)
  }

  test("merge and update on the clone rewrite into the clone's own dir") {
    val d = tmpDir()
    val src = VersionedTable.create(spark, baseDf.repartition(4), d + "/src")
    val c = src.shallowCloneTo(d + "/clone").as("t")
    c.merge(Seq((3L, 333L)).toDF("id", "nv").as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("v" -> "s.nv")).execute()
    assert(c.update("id = 4", Map("v" -> "400")) === 1L)
    assert(c.read.filter(col("id") === 3).select("v").as[Long].head() === 333L)
    assert(c.read.filter(col("id") === 4).select("v").as[Long].head() === 400L)
    assert(src.read.filter(col("id").isin(3L, 4L)).select("v")
      .as[Long].collect().toSet === Set(6L, 8L))
    assert(src.read.count() === 1000)
  }

  test("compact localizes the clone; its vacuum never touches the source") {
    val d = tmpDir()
    val src = VersionedTable.create(spark, baseDf.repartition(4), d + "/src")
    val c = src.shallowCloneTo(d + "/clone")
    c.compact()
    assert(parquetsUnder(d + "/clone").nonEmpty, "compact writes own files")
    c.vacuum(retainVersions = 1)
    assert(src.read.count() === 1000, "source files must survive clone vacuum")
    assert(parquetsUnder(d + "/src").size === 4)
    assert(c.read.collect().toSet === src.read.collect().toSet)
  }

  test("partitioned source: partition values survive the clone, pruning intact") {
    val d = tmpDir()
    val src = VersionedTable.create(spark, baseDf, d + "/src",
      partitionBy = Seq("grp"))
    val c = src.shallowCloneTo(d + "/clone")
    assert(c.read.collect().toSet === src.read.collect().toSet)
    // partition values come from the SOURCE's dir layout — a filter that
    // touches one partition must still read correct grp values
    assert(c.read.filter(col("grp") === 3).count() === 100)
    assert(c.read.filter(col("grp") === 3).select("id").as[Long]
      .collect().forall(_ % 10 === 3))
    // DML on one partition of a partitioned clone: mixed local +
    // referenced files in later reads
    assert(c.delete("grp = 4") === 100L)
    c.append(Seq((10000L, 4L, 0L)).toDF("id", "grp", "v"))
    assert(c.read.count() === 901)
    assert(c.read.filter(col("grp") === 4).count() === 1)
    assert(src.read.count() === 1000)
  }

  test("a source with live deletion vectors refuses to clone") {
    val d = tmpDir()
    val src = VersionedTable.create(spark, baseDf.repartition(4), d + "/src")
    src.delete("id = 1", deletionVectors = true)
    val ex = intercept[IllegalArgumentException] {
      src.shallowCloneTo(d + "/clone")
    }
    assert(ex.getMessage.contains("deletion vectors"))
    src.compact() // materializes the delete
    val c = src.shallowCloneTo(d + "/clone2")
    assert(c.read.count() === 999)
  }
}
