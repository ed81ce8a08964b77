package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — pairs every left interval [startCol, endCol]
  * with the right rows whose point column falls inside it, per key
  * (SURVEY.md §7.6 extension; the "events within a window around X"
  * primitive behind sessionization, attribution and feature windows).
  *
  * Spark plans a raw `l.key = r.key AND r.ts BETWEEN l.start AND l.end`
  * as a SortMergeJoin on the key with the range as a post-join filter —
  * fine for selective keys, catastrophic when keys are hot (every pair
  * for a key materializes). This operator buckets time instead: the left
  * interval explodes to the epoch buckets it overlaps (`sequence` over
  * `floor(ts / bucket)`), the right point maps to exactly one bucket, and
  * the join becomes an EQUI-join on (key…, bucket) with the precise range
  * predicate as a residual. Each qualifying pair meets in exactly one
  * bucket (the right point's), so no dedup is needed. Shuffle cost is
  * O(|L|·buckets_per_interval + |R|), per-partition work is bucket-local
  * — no BroadcastNestedLoopJoin, no hot-key blowup, and both sides stay
  * in whole-stage codegen.
  *
  * Pick `bucketSeconds` ≈ the typical interval length: intervals then
  * explode to ~2 buckets each. Correct for any value (recall is exact);
  * only the candidate count varies.
  *
  * Sides must not share column names (the output carries both sides'
  * columns) — alias one side first; this also sidesteps self-join
  * ambiguity when both sides derive from the same source.
  *
  * @param leftKeys/rightKeys equality key columns (positionally paired)
  * @param startCol/endCol    left interval bounds, timestamp columns
  * @param rightTs            right point timestamp column
  * @param bucketSeconds      epoch-bucket width in seconds
  * @param inclusiveEnd       whether endCol is inside the interval
  * @return left columns + right columns of every qualifying pair
  */
object RangeJoin {
  def rangeJoin(left: DataFrame,
                right: DataFrame,
                leftKeys: Seq[String],
                rightKeys: Seq[String],
                startCol: String,
                endCol: String,
                rightTs: String,
                bucketSeconds: Long,
                inclusiveEnd: Boolean = true): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "rangeJoin needs positionally-paired equality keys")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"column names shared across sides: ${shared.mkString(", ")} — alias one side first")

    def bucketOf(c: Column): Column =
      floor(unix_micros(c) / lit(bucketSeconds * 1000000L))

    val l = left.withColumn("__lbucket", explode(sequence(
      bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val r = right.withColumn("__rbucket", bucketOf(col(rightTs)))

    val keyCond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => col(lk) === col(rk) }
      .reduce(_ && _)
    val range = col(rightTs) >= col(startCol) &&
      (if (inclusiveEnd) col(rightTs) <= col(endCol) else col(rightTs) < col(endCol))

    l.join(r, keyCond && col("__lbucket") === col("__rbucket") && range, "inner")
      .select((left.columns.toSeq ++ right.columns.toSeq).map(col): _*)
  }
}
