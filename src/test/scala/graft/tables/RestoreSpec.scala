package graft.tables

import java.nio.file.Files

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE (roll the table back to an earlier version as a NEW commit):
  * content equality, metadata-only cost, history preservation,
  * undo-the-undo, and the vacuum interaction that makes it impossible. */
class RestoreSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-restore").toString

  private def baseDf = spark.range(1000)
    .select(col("id"), (col("id") % 10).as("grp"), (col("id") * 2).as("v"))

  test("restore reproduces the old content exactly, as a new commit") {
    val t = VersionedTable.create(spark, baseDf.repartition(4), tmpDir() + "/t").as("t")
    val v0 = t.currentVersion
    val expected = t.read.collect().toSet

    // v1: merge-update half the rows; v2: append new rows
    t.merge(baseDf.filter(col("id") < 500).withColumn("v", col("v") + 100)
        .as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("v" -> "s.v")).execute()
    t.append(Seq((5000L, 0L, 0L)).toDF("id", "grp", "v"))
    assert(t.read.collect().toSet != expected, "mutations must change content")

    val (readded, removed) = t.restoreToVersion(v0)
    assert(readded > 0 && removed > 0)
    assert(t.read.collect().toSet === expected)
    // new commit, not history rewrite: old versions still readable
    assert(t.currentVersion === v0 + 3)
    assert(t.readVersion(v0 + 2).count() === 1001)
    val ops = t.history().select("operation").as[String].collect()
    assert(ops.head === "RESTORE")
  }

  test("restore is metadata-only: no data files are written") {
    val root = tmpDir() + "/t"
    val t = VersionedTable.create(spark, baseDf.repartition(4), root).as("t")
    val v0 = t.currentVersion
    t.merge(baseDf.limit(10).withColumn("v", lit(-1L)).as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("v" -> "s.v")).execute()
    def dataFiles() = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten
          .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(root, "data")).filter(_.getName.endsWith(".parquet"))
        .map(_.getName).toSet
    }
    val before = dataFiles()
    t.restoreToVersion(v0)
    assert(dataFiles() === before, "restore must not write or delete data files")
  }

  test("a restore can itself be restored away") {
    val t = VersionedTable.create(spark, baseDf.repartition(2), tmpDir() + "/t").as("t")
    val v0 = t.currentVersion
    t.append(Seq((9999L, 9L, 9L)).toDF("id", "grp", "v"))
    val v1 = t.currentVersion
    val afterAppend = t.read.collect().toSet
    t.restoreToVersion(v0)
    assert(t.read.count() === 1000)
    t.restoreToVersion(v1) // undo the undo
    assert(t.read.collect().toSet === afterAppend)
  }

  test("restore to a vacuumed version fails cleanly, committing nothing") {
    val t = VersionedTable.create(spark, baseDf.repartition(4), tmpDir() + "/t").as("t")
    val v0 = t.currentVersion
    // rewrite everything twice so v0's files become unreferenced, then vacuum
    t.merge(baseDf.withColumn("v", col("v") + 1).as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("v" -> "s.v")).execute()
    t.merge(baseDf.withColumn("v", col("v") + 2).as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("v" -> "s.v")).execute()
    assert(t.vacuum(retainVersions = 1) > 0, "vacuum must reclaim v0 files")
    val verBefore = t.currentVersion
    val e = intercept[IllegalStateException](t.restoreToVersion(v0))
    assert(e.getMessage.contains("vacuum"))
    assert(t.currentVersion === verBefore, "failed restore must not commit")
  }
}
