package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-group z-score semantics on hand-checkable frames plus the plan
  * property the operator exists for: the group-stats side broadcasts,
  * the fact side is never shuffled (the sf-scale check is q49's DuckDB
  * window-formulation oracle). */
class GroupStatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // group a: values 1,2,3 → mean 2, stddev_samp 1
  // group b: single row → stddev undefined
  // group c: constant rows → stddev 0
  private lazy val df = Seq(
    ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
    ("b", 4L, 7.0),
    ("c", 5L, 5.0), ("c", 6L, 5.0))
    .toDF("g", "id", "v")

  private def zs = GroupStats.withZScore(df, Seq("g"), "v")
    .collect().map(r => r.getLong(1) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("z-score is (value - mean) / sample stddev per group") {
    assert(zs(1L) === Some(-1.0))
    assert(zs(2L) === Some(0.0))
    assert(zs(3L) === Some(1.0))
  }

  test("single-row and constant groups yield NULL, not Inf/NaN") {
    assert(zs(4L) === None, "single-row group has no sample stddev")
    assert(zs(5L) === None && zs(6L) === None, "constant group has stddev 0")
  }

  test("outlierFilter keeps |z| <= k and all undefined-stddev rows") {
    val wide = (Seq.fill(20)(10.0) :+ 1000.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }.toDF("g", "id", "v")
    val kept = GroupStats.outlierFilter(wide, Seq("g"), "v", 3.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(20L), "the 1000.0 outlier must be dropped")
    assert(kept.size === 20, "all inliers kept")
    val undef = GroupStats.outlierFilter(df.filter($"g" =!= "a"), Seq("g"), "v", 1.0)
    assert(undef.count() === 3, "undefined-stddev rows are kept")
  }

  test("NULL-group rows are scored against the NULL group's stats, not dropped") {
    val withNulls = Seq(
      (Option("a"), 1L, 1.0), (Option("a"), 2L, 3.0),
      (Option.empty[String], 3L, 1.0), (Option.empty[String], 4L, 2.0),
      (Option.empty[String], 5L, 3.0))
      .toDF("g", "id", "v")
    val out = GroupStats.withZScore(withNulls, Seq("g"), "v")
    assert(out.count() === 5, "null-safe join must retain NULL-group rows")
    val z = out.collect().map(r => r.getLong(1) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // NULL group: values 1,2,3 → mean 2, stddev_samp 1
    assert(z(3L) === Some(-1.0) && z(4L) === Some(0.0) && z(5L) === Some(1.0))
    assert(GroupStats.outlierFilter(withNulls, Seq("g"), "v", 3.0).count() === 5)
  }

  test("the stats side broadcasts; the fact side is not shuffled") {
    val p = GroupStats.withZScore(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"stats join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact side must not sort-merge:\n$p")
  }
}
