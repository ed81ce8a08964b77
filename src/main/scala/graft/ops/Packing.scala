package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches (SURVEY.md §7.6 family):
  * documents are concatenated in a deterministic order and split into
  * bins of ~`budget` tokens — the standard preprocessing step that turns
  * a ragged corpus into fixed-budget training sequences.
  *
  * Semantics: within a shard, docs are taken in `idCol` order and doc i
  * lands in bin `floor(exclusive_cumsum(tokens) / budget)` — i.e. a new
  * bin starts once the running total crosses the budget (a bin may
  * overflow by at most one document, the usual split-at-boundary rule).
  *
  * Scale: packing is per-SHARD (one window shuffle on the shard key,
  * cumulative sums inside each shard) — never a global single-partition
  * sort. Shard count scales with the cluster; each training worker
  * consumes its shard's bins independently.
  */
object Packing {

  /** Assign each row a (shard, bin_id).
    * @param shard  shard expression (e.g. `pmod(col("doc_id"), 64)`) —
    *               packing runs independently per shard value
    * @param budget target tokens per bin */
  def sequencePack(df: DataFrame, idCol: String, tokensCol: String,
                   budget: Long, shard: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("__shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__shard", shard)
      .withColumn("__cum", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("__cum") / budget).cast("long"))
      .withColumn("shard", col("__shard"))
      .drop("__shard", "__cum")
  }

  /** Per-bin summary (docs and token total per (shard, bin)). */
  def binStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy("shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("total_tokens"))

  /** Length-bucketed batching: the padding-minimizing alternative to
    * [[sequencePack]] for models that pad each batch to its longest
    * member. Docs are grouped into token-length buckets of width
    * `bucketWidth`, and within a bucket assigned to fixed-size batches
    * of `batchSize` docs in `idCol` order — so a batch only ever pads
    * up to `bucketWidth - 1` tokens per doc. Assignment is two pure
    * expressions + ONE window rank per bucket (keyed shuffle on the
    * bucket id, which has ~max_len/bucketWidth values — salt the rank
    * by a shard column first at 100 TB, like [[sequencePack]] shards).
    * @return input + (bucket, batch_idx) */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokensCol: String,
                          bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "bucketWidth and batchSize must be positive")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    df.withColumn("bucket", floor(col(tokensCol) / bucketWidth).cast("long"))
      .withColumn("batch_idx",
        floor((row_number().over(w) - 1).cast("long") / batchSize).cast("long"))
  }

  /** Sliding-window token chunking — the context-window preprocessing
    * step (pretraining long-doc splitting, RAG passage windows): each
    * document becomes ceil-many chunks of at most `maxTokens` whitespace
    * tokens, consecutive chunks sharing `overlap` tokens. A chunk past
    * the first is emitted only if it adds tokens beyond the previous
    * chunk's end, so short tails never produce a fully-contained chunk.
    *
    * Scale: MAP-ONLY — the chunk fan-out is `posexplode(sequence(...))`
    * over pure expressions, no window, no shuffle, no state; a 100 TB
    * corpus chunks at scan speed and the output is ~(1 + overlap/step)×
    * the input tokens. Deterministic: (doc, chunk_idx) is a pure
    * function of the text. An empty or whitespace-only document yields
    * exactly one empty chunk with `n_tokens = 0` (never a phantom
    * 1-token chunk from the ""-token split artifact), so token-budget
    * accounting downstream stays exact.
    * @return (idCol, chunk_idx, chunk_text, n_tokens) */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val step = maxTokens - overlap
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    // ceil((n - maxTokens) / step) extra chunks after the first; the
    // emit rule "adds tokens beyond the previous chunk" is exactly this
    val nChunks = lit(1) + greatest(lit(0L),
      floor((size(toks) - maxTokens + step - 1) / step))
    df.select(col(idCol), toks.as("__toks"),
        posexplode(sequence(lit(0L), nChunks - 1)).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * step + 1).cast("int"), lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens),
          size(col("__toks")) - col("chunk_idx") * step).cast("long")
          .as("n_tokens"))
  }

  /** Padding-efficiency report per (bucket, batch): tokens actually
    * present vs tokens after padding every doc to the batch max —
    * the number a pipeline owner watches to tune `bucketWidth`. */
  def paddingStats(batched: DataFrame, tokensCol: String): DataFrame =
    batched.groupBy("bucket", "batch_idx")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol).as("real_tokens"),
        (count(lit(1)) * max(col(tokensCol))).as("padded_tokens"))
      .withColumn("waste_pct",
        // a batch of all-zero-token docs pads nothing: 0 waste, not a
        // NULL (non-ANSI) or error (ANSI) from the 0/0
        when(col("padded_tokens") === 0L, lit(0.0))
          .otherwise(round(lit(100.0) *
            (col("padded_tokens") - col("real_tokens")) /
            col("padded_tokens"), 2)))
}
