package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Mirrors the runtime configuration the reference pipeline relies on
  * (reference: src/header_etl.py:354-359 — CORRECTED time parser policy,
  * UTC session time zone) while sizing shuffle parallelism for the
  * local[N] test environment. On a real cluster the same builder applies;
  * only master/shuffle-partitions change (driven by env/config, not code).
  */
object GraftSession {

  /** Apply graft's standard SQL configs to an existing session (e.g. the
    * one handed to SparkEntry.queries by the driver's Verify/Bench mains).
    * Kept minimal and idempotent.
    */
  def tune(spark: SparkSession): SparkSession = {
    // The reference was built on Spark 3.5 semantics: non-ANSI (failed
    // casts/parses yield NULL — the 5-format to_timestamp fallback of
    // src/header_etl.py:89-102 depends on this) and CORRECTED parser.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "CORRECTED")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Parquet TIMESTAMP(NANOS) (events.ts) is rejected by Spark 4 unless
    // read as raw nanos; SparkEntry.tbl converts the long back to a
    // microsecond timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Reduce-side parallelism must scale with the DATA while fixture
    // stages stay cheap: AQE coalescing already handles the small end,
    // so the INITIAL shuffle partition count is pure headroom — heavy
    // stages keep up to 512 reducers (bounding one task's sort/build
    // share), tiny stages coalesce back to ~cores. A fixed 32 put a 9M-
    // doc gram sort's full per-partition share in one task's execution-
    // memory slice and OOM'd the 300× span_dedup row; 512 at that size
    // is ~64-128 MB/task. Streaming is untouched (AQE is off there and
    // state stores keep spark.sql.shuffle.partitions).
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
    spark
  }

  def local(appName: String = "graft",
            cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // one shuffle partition per core locally; cluster deployments
      // override via --conf. Never the 200 default.
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // data-scaled reducer headroom; see tune() for the rationale
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Recursive local-file delete — the ONE copy shared by the
    * bench/verify mains, fixture-building queries and specs. */
  private[graft] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
