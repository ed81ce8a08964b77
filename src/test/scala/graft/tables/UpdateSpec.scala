package graft.tables

import java.nio.file.Files

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standalone UPDATE: file-pruned rewrite with exact row accounting. */
class UpdateSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-upd").toString

  private def baseDf = spark.range(2000)
    .select(col("id"), (col("id") % 20).as("grp"), (col("id") * 3).as("v"))

  test("update transforms exactly the matched rows") {
    val t = VersionedTable.create(spark, baseDf.repartition(4), tmpDir() + "/t")
    val n = t.update("grp = 5", Map("v" -> "v * 10 + grp"))
    assert(n === 100)
    val expected = baseDf.withColumn("v",
      when(col("grp") === 5, col("v") * 10 + col("grp")).otherwise(col("v")))
    assert(t.read.collect().toSet === expected.collect().toSet)
    assert(t.history().select("operation").as[String].collect().head === "UPDATE")
  }

  test("update prunes: files without matches are carried, not rewritten") {
    // partition by grp so matches concentrate in one directory
    val root = tmpDir() + "/t"
    val t = VersionedTable.create(spark, baseDf, root, partitionBy = Seq("grp"))
    val before = t.liveEntries.map(_.path).toSet
    t.update("grp = 5 AND id < 500", Map("v" -> "0"))
    val after = t.liveEntries.map(_.path).toSet
    val untouchedCarried = before.intersect(after)
    assert(untouchedCarried.size >= before.size - 2,
      s"only grp=5 files may be rewritten (before=${before.size}, carried=${untouchedCarried.size})")
    assert(after !== before)
  }

  test("update matching nothing commits nothing; NULL condition rows not matched") {
    val t = VersionedTable.create(spark,
      Seq((1L, Some(1L)), (2L, None)).toDF("id", "x").repartition(2),
      tmpDir() + "/t")
    val v = t.currentVersion
    assert(t.update("x > 99", Map("id" -> "-1")) === 0L)
    assert(t.currentVersion === v)
    // x IS NULL row: condition NULL → not matched
    assert(t.update("x = 1", Map("id" -> "-1")) === 1L)
    assert(t.read.filter(col("id") === 2L).count() === 1)
  }

  test("update of a dv'd file applies the vector, drops it, resurrects nothing") {
    val t = VersionedTable.create(spark, baseDf.repartition(4), tmpDir() + "/t")
    t.delete("grp = 5", deletionVectors = true)
    // id%5=0 → 400 physical rows, of which the 100 grp=5 rows (id ≡ 5
    // mod 20, all divisible by 5) are dv-dead → 300 live matches
    val n = t.update("id % 5 = 0", Map("v" -> "-1"))
    assert(n === 300, "dv-dead rows must not be updated (400 - 100 dead)")
    assert(t.read.filter(col("grp") === 5).count() === 0)
    assert(t.liveEntries.forall(_.dv.isEmpty))
    assert(t.read.count() === 1900)
  }

  test("update validates set columns") {
    val t = VersionedTable.create(spark, baseDf.repartition(2), tmpDir() + "/t")
    val e = intercept[IllegalArgumentException](
      t.update("grp = 1", Map("nope" -> "1")))
    assert(e.getMessage.contains("nope"))
  }
}
