package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic corpus generator for SCALE measurement of the
  * LLM-pipeline operators — the documents/embeddings analog of
  * [[HeaderDataGen]] (same design: everything is a `spark.range`
  * pipeline, fully distributed, no driver-side data).
  *
  * The generated corpora deliberately plant the structures the dedup
  * operators exist to find, at scale-INDEPENDENT rates, so an op's work
  * per row is the same at every size and a time ratio between sizes
  * measures the op, not a drifting hit rate:
  *  - ~5% of documents are near-copies of their predecessor (same base
  *    text + a 2-token unique suffix → Jaccard ≈ 0.95): MinHash-LSH and
  *    SemDeDup candidate pairs stay ∝ n.
  *  - every 7th document opens with a shared 12-token boilerplate
  *    prefix: repeated-span dedup always has real spans to cut.
  *  - ~10% of embeddings are tiny perturbations of their predecessor
  *    (cosine ≈ 1): the LSH near-dup path has planted positives.
  *  - `source` cardinality grows with n (~50 docs per source), matching
  *    how real corpora shard — per-source quotas don't degenerate into
  *    one giant group at scale.
  */
object CorpusDataGen {

  /** ~250 distinct tokens; word shape (7-9 chars) close to English so
    * string/shingle costs are realistic. */
  private val vocab: Seq[String] =
    (0 until 250).map(i => f"word$i%03d" + ("able".take(i % 4)))

  /** Boilerplate is shared per GROUP of ~20 documents, not globally: a
    * single corpus-wide 12-token prefix would give every pair of
    * boilerplate docs Jaccard ≈ 0.04, and with 64 permissive 2-row LSH
    * bands that's an ~11% band-collision rate over an Θ(n)-sized
    * cluster — an O(n²) candidate set that measures the generator's
    * artifact, not the operator. Group-scoped boilerplate keeps clusters
    * bounded (≈20 docs) and candidate counts ∝ n, which is also what
    * real corpora look like after domain sharding. */
  private def boilerFor(bucket: org.apache.spark.sql.Column) =
    concat(lit("begin section b"), bucket,
      lit(" common preamble text repeated across many documents in group b"),
      bucket, lit(" "))

  /** `n` documents (doc_id, text, lang, source, n_chars) — the testdata
    * documents schema — with planted near-dups and repeated spans. */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
                partitions: Int = 32): DataFrame = {
    val df = spark.range(0L, n, 1L, partitions)
      .withColumn("__vocab", typedLit(vocab))
      // near-copy rows share their predecessor's base text
      .withColumn("__b",
        when(col("id") % 20 === 1, col("id") - 1).otherwise(col("id")))
      .withColumn("__nw",
        (lit(30) + pmod(hash(col("__b"), lit(seed)), lit(170))).cast("int"))
      .withColumn("__body", concat_ws(" ", expr(
        s"""transform(sequence(0, __nw - 1),
           |  i -> element_at(__vocab, 1 + pmod(hash(__b, i, $seed), ${vocab.size})))"""
          .stripMargin)))
      .withColumn("__pre",
        when(col("__b") % 7 === 0,
          boilerFor(pmod(hash(col("__b"), lit(seed + 3)),
            lit(math.max(1L, n / 140))))) // ~20 boilerplate docs per group
          .otherwise(lit("")))
      .withColumn("__suf",
        when(col("id") % 20 === 1, concat(lit(" zz"), col("id"))).otherwise(lit("")))
      .withColumn("text", concat(col("__pre"), col("__body"), col("__suf")))
    df.select(
      col("id").as("doc_id"),
      col("text"),
      when(pmod(col("__b"), lit(10)) < 7, "en").otherwise("it").as("lang"),
      concat(lit("src"),
        pmod(hash(col("__b"), lit(seed + 1)), lit(math.max(1L, n / 50))))
        .as("source"),
      length(col("text")).cast("long").as("n_chars"))
  }

  /** `n` events (event_id, ts, user_id, event_type, value) — the
    * testdata events schema minus props — for STREAMING scale
    * measurement. The timestamps span a fixed 24-hour window at every
    * size (event density grows with n, window count does not), so a
    * watermarked tumbling-window aggregation holds constant state
    * across scales and its work per row is size-independent. ~10% of
    * rows repeat their predecessor's event_id a fraction of a second
    * later (well inside any dedup watermark horizon), giving
    * first-arrival dedup a scale-independent planted duplicate rate.
    * Monotonic ts-in-id: range-partitioning the write by event_id
    * yields time-ordered files, so a file-source drain advances the
    * watermark monotonically instead of dropping random late rows. */
  def events(spark: SparkSession, n: Long, seed: Long = 11L,
             partitions: Int = 32): DataFrame = {
    val epoch = 1700000000L // fixed: determinism across runs
    spark.range(0L, n, 1L, partitions)
      .withColumn("__b",
        when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id")))
      .select(
        col("__b").as("event_id"),
        timestamp_seconds(lit(epoch) + col("id") * 86400.0 / n).as("ts"),
        pmod(hash(col("__b"), lit(seed)), lit(math.max(1L, n / 100)))
          .cast("long").as("user_id"),
        concat(lit("type"), pmod(hash(col("__b"), lit(seed + 1)), lit(5)))
          .as("event_type"),
        (pmod(hash(col("__b"), lit(seed + 2)), lit(100000)) / 100.0)
          .as("value"))
  }

  /** `n` embeddings (vec_id, embedding: array<float>, label) — the
    * testdata embeddings schema — with ~10% planted near-duplicates
    * (cosine ≈ 1 perturbations of the previous row). */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 32,
                 seed: Long = 7L, partitions: Int = 32): DataFrame =
    spark.range(0L, n, 1L, partitions)
      .withColumn("__b",
        when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id")))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}),
           |  j -> cast((pmod(hash(__b, j, $seed), 2001) - 1000) / 1000.0
           |            + (pmod(hash(id, j, ${seed + 1}), 100) / 100000.0)
           |       as float))""".stripMargin))
      .select(
        col("id").as("vec_id"),
        col("embedding"),
        pmod(hash(col("id"), lit(seed + 2)), lit(5)).cast("int").as("label"))
}
