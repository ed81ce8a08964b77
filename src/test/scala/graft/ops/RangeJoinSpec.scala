package graft.ops

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

/** Range-join semantics on hand-checkable frames: bound inclusivity,
  * bucket-boundary crossing, per-key isolation, no duplicate pairs.
  * The sf-scale check is q44's DuckDB inequality-join oracle. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // one-hour windows; bucketSeconds deliberately SMALLER than the
  // interval (15 min) so every interval spans multiple buckets
  private lazy val windows = Seq(
    ("u1", 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    ("u2", 20L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")))
    .toDF("w_user", "w_id", "w_start", "w_end")

  private lazy val points = Seq(
    ("u1", 100L, ts("2024-01-01 10:00:00")), // exactly at start → in
    ("u1", 101L, ts("2024-01-01 10:59:59")), // inside, last bucket
    ("u1", 102L, ts("2024-01-01 11:00:00")), // exactly at end
    ("u1", 103L, ts("2024-01-01 09:59:59")), // before → out
    ("u2", 104L, ts("2024-01-01 10:45:00")), // in u2's window only
    ("u3", 105L, ts("2024-01-01 10:30:00"))) // key without windows
    .toDF("p_user", "p_id", "p_ts")

  private def pairs(inclusiveEnd: Boolean) = RangeJoin.rangeJoin(
    windows, points, Seq("w_user"), Seq("p_user"),
    "w_start", "w_end", "p_ts", bucketSeconds = 900,
    inclusiveEnd = inclusiveEnd)
    .select($"w_id", $"p_id").as[(Long, Long)].collect().toSet

  test("inclusive-end window: bounds, keys, bucket crossing") {
    assert(pairs(inclusiveEnd = true) ===
      Set((10L, 100L), (10L, 101L), (10L, 102L), (20L, 104L)))
  }

  test("half-open window excludes the end point") {
    assert(pairs(inclusiveEnd = false) ===
      Set((10L, 100L), (10L, 101L), (20L, 104L)))
  }

  test("each qualifying pair appears exactly once despite multi-bucket intervals") {
    val all = RangeJoin.rangeJoin(
      windows, points, Seq("w_user"), Seq("p_user"),
      "w_start", "w_end", "p_ts", bucketSeconds = 60) // 61-bucket intervals
      .select($"w_id", $"p_id").as[(Long, Long)].collect().toSeq
    assert(all.size === all.distinct.size)
    assert(all.toSet === Set((10L, 100L), (10L, 101L), (10L, 102L), (20L, 104L)))
  }

  test("shared column names across sides are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(windows, points.withColumnRenamed("p_user", "w_user"),
        Seq("w_user"), Seq("w_user"), "w_start", "w_end", "p_ts", 900)
    }
  }
}
