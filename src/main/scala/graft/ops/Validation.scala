package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Data-quality counters of one validated batch.
  * Reference: src/utils/validations_utils.py:124-132. */
case class DqMetrics(batchDate: String,
                     total: Long,
                     kept: Long,
                     discarded: Long,
                     duplicatesOlder: Long,
                     nullKey: Long,
                     batchDateMismatch: Long)

/** Batch validation operator: classify rows NULL_KEY → BATCH_DATE_MISMATCH →
  * DUPLICATE_OLDER (priority order of the when-chain), keep the most recent
  * row per dedup-key group, persist discards, and compute all DQ counters in
  * a single aggregation pass (one job, not five count()s).
  *
  * Reference: src/utils/validations_utils.py:14-150.
  */
object Validation {

  /** @param extracted  batch rows with `event_time` and `source_file` columns
    * @param dedupKeys  duplicate-group key (reference: contratto_cod, event_time)
    * @param sourceFile the batch's file name (driver-side — replaces the
    *                   reference's limit(1).collect() round-trip at
    *                   validations_utils.py:54-57, which doesn't scale)
    * @param dateRegex  extracts yyyyMMdd from the file name
    * @param discardedPath discarded-rows sink root (one dir per batch date)
    * @return (kept rows ready for transform, DQ counters, release hook that
    *         unpersists the cached tagged frame — call after the kept rows
    *         have been fully consumed)
    */
  def validate(extracted: DataFrame,
               dedupKeys: Seq[String],
               sourceFile: String,
               dateRegex: String,
               discardedPath: String): (DataFrame, DqMetrics, () => Unit) = {
    require(dedupKeys.nonEmpty, "dedupKeys must be a non-empty column list")

    // 1) parse event_time into timestamp/date with ordered fallbacks
    //    (reference: validations_utils.py:36-49)
    val df0 = extracted
      .withColumn("event_time_ts", coalesce(
        to_timestamp(col("event_time"), "yyyy-MM-dd HH:mm:ss"),
        to_timestamp(col("event_time"), "yyyy-MM-dd")))
      .withColumn("event_date_parsed", coalesce(
        to_date(col("event_time_ts")),
        to_date(col("event_time"), "yyyy-MM-dd"),
        to_date(col("event_time"))))

    // 2) batch date from the file name (driver-side)
    val m = dateRegex.r.findFirstMatchIn(sourceFile).getOrElse(
      throw new IllegalArgumentException(
        s"cannot extract batch date from file name $sourceFile with regex $dateRegex"))
    val batchDateStr = m.group(1)
    val batchDateIso =
      s"${batchDateStr.substring(0, 4)}-${batchDateStr.substring(4, 6)}-${batchDateStr.substring(6, 8)}"
    val batchDateLit = to_date(lit(batchDateIso), "yyyy-MM-dd")

    // 3) discard conditions (reference: validations_utils.py:68-69)
    val nullCondition = dedupKeys.map(col(_).isNull).reduce(_ || _)
    val mismatchCondition =
      col("event_date_parsed").isNull || (col("event_date_parsed") =!= batchDateLit)

    // 4) keep the most recent row per duplicate group
    val wDedup = Window.partitionBy(dedupKeys.map(col): _*)
      .orderBy(col("event_time_ts").desc_nulls_last)
    // Persisted: the tagged frame feeds three consumers (discard sink,
    // metrics agg, kept rows) — without it the CSV scan + parse + window
    // shuffle re-run three times. Caller releases via the returned handle
    // once the kept rows have been consumed.
    val df = df0
      .withColumn("rn", row_number().over(wDedup))
      .withColumn("discard_reason",
        when(nullCondition, lit("NULL_KEY"))
          .when(mismatchCondition, lit("BATCH_DATE_MISMATCH"))
          .when(col("rn") > 1, lit("DUPLICATE_OLDER"))
          .otherwise(lit(null)))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val kept = df.filter(col("rn") === 1 && !nullCondition && !mismatchCondition)
    val discarded = df.filter(col("discard_reason").isNotNull)

    // 5) discarded sink, one dir per batch (reference: validations_utils.py:102-103
    //    — Delta there; plain parquet here, the table is overwritten per batch)
    discarded.write.mode("overwrite")
      .parquet(s"$discardedPath/discarded_$batchDateStr")

    // 6) all DQ metrics in ONE aggregation (reference: validations_utils.py:106-120)
    val agg = df.select(
      when(col("rn") === 1 && !nullCondition && !mismatchCondition, 1).otherwise(0).as("is_kept"),
      when(col("discard_reason").isNotNull, 1).otherwise(0).as("is_discarded"),
      when(col("discard_reason") === "DUPLICATE_OLDER", 1).otherwise(0).as("is_dup_older"),
      when(col("discard_reason") === "NULL_KEY", 1).otherwise(0).as("is_null_key"),
      when(col("discard_reason") === "BATCH_DATE_MISMATCH", 1).otherwise(0).as("is_batch_mismatch")
    ).agg(
      sum("is_kept").as("kept"),
      sum("is_discarded").as("discarded"),
      sum("is_dup_older").as("duplicates_older"),
      sum("is_null_key").as("null_key"),
      sum("is_batch_mismatch").as("batch_date_mismatch"),
      count(lit(1)).as("total")
    ).collect()(0)

    val metrics = DqMetrics(
      batchDate = batchDateStr,
      total = agg.getAs[Long]("total"),
      kept = agg.getAs[Long]("kept"),
      discarded = agg.getAs[Long]("discarded"),
      duplicatesOlder = agg.getAs[Long]("duplicates_older"),
      nullKey = agg.getAs[Long]("null_key"),
      batchDateMismatch = agg.getAs[Long]("batch_date_mismatch"))

    val keptClean = kept.drop("rn", "discard_reason", "event_date_parsed", "event_time_ts")
    (keptClean, metrics, () => { df.unpersist(); () })
  }
}
