package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group distribution statistics applied back to the rows — the
  * curation primitive behind "drop documents more than k standard
  * deviations from their language's length distribution" style rules.
  *
  * Scale design: pass 1 is one map-side-partial aggregate producing a
  * GROUP-CARDINALITY-sized stats frame (languages, sources — small by
  * construction); pass 2 broadcasts it back onto the fact side, so the
  * fact table is never shuffled — the window formulation of the same
  * z-score would shuffle every row by group. The broadcast is asserted
  * in the spec.
  */
object GroupStats {

  /** Append `(value - groupMean) / groupStddev` as `zCol`.
    *
    * NULL where the group's sample stddev is undefined (single-row
    * group) or zero (constant group) — a constant group has no outliers
    * to score, and NULL keeps that decidable downstream, unlike ±Inf.
    */
  def withZScore(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 zCol: String = "z_score"): DataFrame = {
    require(groupCols.nonEmpty, "withZScore needs at least one group column")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(avg(valueCol).as("__mu"), stddev_samp(valueCol).as("__sigma"))
    // groupBy keeps a NULL-group row, so the join back MUST be null-safe
    // (`<=>`): a plain equi-join would silently drop every row whose group
    // column is NULL instead of scoring it against the NULL group's stats.
    val statsR = groupCols.foldLeft(stats)((d, c) => d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(statsR), cond)
      .withColumn(zCol,
        when(col("__sigma") > 0, (col(valueCol) - col("__mu")) / col("__sigma")))
      .drop(groupCols.map(c => s"__g_$c") ++ Seq("__mu", "__sigma"): _*)
  }

  /** Keep rows within `k` standard deviations of their group mean;
    * rows whose group has no defined stddev are kept (nothing to
    * compare against). */
  def outlierFilter(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    k: Double): DataFrame = {
    require(k > 0, "k must be positive")
    withZScore(df, groupCols, valueCol, "__z")
      .filter(col("__z").isNull || abs(col("__z")) <= k)
      .drop("__z")
  }
}
