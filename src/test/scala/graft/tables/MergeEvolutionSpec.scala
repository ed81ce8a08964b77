package graft.tables

import java.nio.file.Files

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Merge-time schema evolution (reference notes.md:102-105 — the
  * autoMerge case): assigned-but-unknown columns become new nullable
  * columns carried by the merge's commit; untouched files are never
  * rewritten and read the new column as NULL; pre-evolution versions
  * keep the old schema under time travel. */
class MergeEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-mergevo").toString

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    .toDF("id", "name")

  test("update+insert assignments evolve the schema; old rows read NULL") {
    val t = VersionedTable.create(spark, base.repartition(3), tmpDir() + "/t").as("t")
    val v0 = t.currentVersion
    val src = Seq((2L, 20L), (9L, 90L)).toDF("id", "score").as("s")
    t.merge(src, "t.id = s.id")
      .whenMatchedUpdate(Map("score" -> "s.score"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "name" -> "'(new)'",
        "score" -> "s.score"))
      .withSchemaEvolution()
      .execute()

    assert(t.schema.fieldNames.toSeq === Seq("id", "name", "score"))
    assert(t.schema("score").dataType === LongType)
    assert(t.schema("score").nullable)
    val rows = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(rows.toSeq === Seq((1L, "a", null), (2L, "b", 20L),
      (3L, "c", null), (9L, "(new)", 90L)))
    // the pre-evolution version is untouched under time travel
    assert(t.readVersion(v0).schema.fieldNames.toSeq === Seq("id", "name"))
    val m = t.history(1).select("operationMetrics")
      .as[Map[String, String]].collect().head
    assert(m("numColumnsEvolved") === "1")
  }

  test("untouched files are carried by reference, not rewritten") {
    val t = VersionedTable.create(spark, base.repartition(3), tmpDir() + "/t").as("t")
    val before = t.liveEntries.map(_.path).toSet
    // source matches only id=2 — the other files must survive verbatim
    t.merge(Seq((2L, "x")).toDF("id", "tag").as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("tag" -> "s.tag"))
      .withSchemaEvolution()
      .execute()
    val after = t.liveEntries.map(_.path).toSet
    assert((before intersect after).size === before.size - 1,
      s"exactly one file rewritten: before=$before after=$after")
    assert(t.schema("tag").dataType === StringType)
    assert(t.read.filter(col("tag").isNotNull).count() === 1)
  }

  test("insert-only fast path evolves too") {
    val t = VersionedTable.create(spark, base.repartition(3), tmpDir() + "/t").as("t")
    t.merge(Seq((7L, 0.5)).toDF("id", "w").as("s"), "t.id = s.id")
      .whenNotMatchedInsert(Map("id" -> "s.id", "w" -> "s.w"))
      .withSchemaEvolution()
      .execute()
    assert(t.schema.fieldNames.toSeq === Seq("id", "name", "w"))
    val got = t.read.filter(col("id") === 7L).select("name", "w").collect().head
    assert(got.isNullAt(0) && got.getDouble(1) === 0.5)
  }

  test("without withSchemaEvolution the target schema is the contract") {
    val t = VersionedTable.create(spark, base.repartition(3), tmpDir() + "/t").as("t")
    t.merge(Seq((2L, 20L)).toDF("id", "score").as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("score" -> "s.score"))
      .execute()
    assert(t.schema.fieldNames.toSeq === Seq("id", "name"))
  }

  test("a new-column assignment that cannot resolve on the source fails loudly") {
    val t = VersionedTable.create(spark, base.repartition(3), tmpDir() + "/t").as("t")
    val ex = intercept[IllegalArgumentException] {
      t.merge(Seq((2L, 20L)).toDF("id", "score").as("s"), "t.id = s.id")
        .whenMatchedUpdate(Map("bogus" -> "t.name || '!'"))
        .withSchemaEvolution()
        .execute()
    }
    assert(ex.getMessage.contains("bogus"))
  }
}
