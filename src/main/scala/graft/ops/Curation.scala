package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composite 5-step curation pipeline (the GPT-3/CCNet-shaped
  * data-curation chain) — ONE definition shared by the q77 oracle query
  * and the scale bench, so the thing the oracle verifies and the thing
  * the scale record measures can never drift apart:
  *
  *  1. quality floor (token count), 2. exact dedup (min-id
  *  representative per content fingerprint), 3. per-source quota,
  *  4. deterministic length-stratified sampling (replayable LCG
  *  variate), 5. corpus summary per (source, stratum).
  *
  * Scale shape: two keyed windows (fingerprint dedup, source cap) + one
  * aggregation; everything else is map-only. */
object Curation {

  /** Unordered (source, stratum, n_docs, total_tokens) summary —
    * callers add their own ordering. */
  def chain(docs: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
    val quality = toks.filter(col("n_tokens") >= 20)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint("text"))
      .orderBy(col("doc_id"))
    val deduped = quality.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
    val capped = Sampling.perGroupCap(deduped, "doc_id", "source", cap = 15)
    val strat = capped.withColumn("stratum",
      when(col("n_tokens") < 50, "short")
        .when(col("n_tokens") < 200, "medium")
        .otherwise("long"))
    val sampled = Sampling.stratifiedSample(strat, "doc_id", "stratum",
      rates = Map("short" -> 0.9, "medium" -> 0.6, "long" -> 0.3),
      uniform = Some(pmod(col("doc_id") * 48271 + 11, lit(10007)).cast("double") / 10007.0))
    sampled.groupBy("source", "stratum")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }
}
