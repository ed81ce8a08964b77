package graft.sources

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.read.format("graft")` interop surface. */
class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val path = {
    val p = Files.createTempDirectory("graft-src").toString + "/t"
    val t = VersionedTable.create(spark,
      spark.range(0, 1000).selectExpr("id", "cast(id % 7 AS int) AS grp",
        "concat('v', id) AS v"), p)
    t.append(spark.range(1000, 1200).selectExpr("id",
      "cast(id % 7 AS int) AS grp", "concat('v', id) AS v"))
    p
  }

  test("format(graft) reads the current table state") {
    val df = spark.read.format("graft").load(path)
    assert(df.count() == 1200)
    assert(df.schema.fieldNames.toSeq == Seq("id", "grp", "v"))
    // equality with the native read
    assert(df.exceptAll(VersionedTable.forPath(spark, path).read).isEmpty)
  }

  test("versionAsOf option time-travels") {
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(path)
    assert(v0.count() == 1000)
  }

  test("filters and pruning flow through; results match the native path") {
    val df = spark.read.format("graft").load(path)
      .filter($"grp" === 3 && $"id" >= 100)
      .select("id", "v")
    val native = VersionedTable.forPath(spark, path).read
      .filter($"grp" === 3 && $"id" >= 100)
      .select("id", "v")
    assert(df.count() == native.count())
    assert(df.exceptAll(native).isEmpty && native.exceptAll(df).isEmpty)
    // aggregates over the relation
    assert(spark.read.format("graft").load(path)
      .agg(sum("id")).as[Long].head() == (0L until 1200L).sum)
  }

  test("SQL surface: CREATE TABLE ... USING graft") {
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(s"CREATE TABLE graft_sql_t USING graft OPTIONS (path '$path')")
    try {
      val n = spark.sql(
        "SELECT count(*) FROM graft_sql_t WHERE grp = 1").as[Long].head()
      assert(n == spark.read.format("graft").load(path)
        .filter($"grp" === 1).count())
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_t")
  }
}
