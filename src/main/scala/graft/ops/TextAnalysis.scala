package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §7.6):
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is a codegen'd column expression — no UDFs, embarrassingly
  * parallel per partition, no shuffle. Each rule is deliberately
  * deterministic and re-expressible in ANSI SQL so the driver's DuckDB
  * oracle can verify it.
  */
object TextAnalysis {

  /** Distinct lowercase word tokens (set semantics, for stopword votes). */
  private def distinctToks(textCol: String): String =
    s"array_distinct(split(lower(trim($textCol)), '\\\\s+'))"

  // Small public stopword lists — votes, not linguistics.
  private val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "ein", "fur", "auf"),
    "fr" -> Seq("le", "la", "de", "et", "un", "pour", "dans", "que", "sur", "pas"))

  /** Heuristic language ID: character-script detection first (CJK,
    * Cyrillic, Arabic), then a stopword vote among Latin-script languages
    * with a fixed priority order on ties; 'und' when nothing matches. */
  def languageId(textCol: String): Column = {
    def lit(words: Seq[String]): String =
      s"array(${words.map(w => s"'$w'").mkString(",")})"
    val langs = Stopwords.map(_._1)
    // per-language stopword hits, referencing the BOUND distinct-token
    // array __dt; the scores themselves are then bound as __s so the
    // vote's CASE reads each score by index instead of re-running the
    // split+distinct+intersect (the textual form evaluated it up to 11×
    // per row — conditional CASE branches defeat codegen CSE)
    val scoresArr = Stopwords
      .map { case (_, words) => s"size(array_intersect(__dt, ${lit(words)}))" }
      .mkString("array(", ", ", ")")
    def s(lang: String): String = s"element_at(__s, ${langs.indexOf(lang) + 1})"
    expr(
      s"""CASE
         |  WHEN $textCol RLIKE '[\\\\u4E00-\\\\u9FFF]' THEN 'zh'
         |  WHEN $textCol RLIKE '[\\\\u0400-\\\\u04FF]' THEN 'ru'
         |  WHEN $textCol RLIKE '[\\\\u0600-\\\\u06FF]' THEN 'ar'
         |  ELSE element_at(transform(array(${distinctToks(textCol)}), __dt ->
         |    element_at(transform(array($scoresArr), __s ->
         |      CASE
         |        WHEN ${s("en")} = 0 AND ${s("es")} = 0 AND ${s("de")} = 0 AND ${s("fr")} = 0 THEN 'und'
         |        WHEN ${s("en")} >= ${s("es")} AND ${s("en")} >= ${s("de")} AND ${s("en")} >= ${s("fr")} THEN 'en'
         |        WHEN ${s("es")} >= ${s("de")} AND ${s("es")} >= ${s("fr")} THEN 'es'
         |        WHEN ${s("de")} >= ${s("fr")} THEN 'de'
         |        ELSE 'fr'
         |      END
         |    ), 1)
         |  ), 1)
         |END""".stripMargin)
  }

  /** BPE-ish token count: words | numbers | single punctuation marks. */
  def tokenCount(textCol: String): Column =
    expr(s"size(regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")

  /** Whitespace token count. */
  def wordCount(textCol: String): Column =
    expr(s"size(split(trim($textCol), '\\\\s+'))")

  /** Composite quality score in [0,1]:
    *   0.4 · min(words/100, 1)  — length credit
    * + 0.3 · alpha-char ratio   — symbol soup penalty
    * + 0.3 · distinct-word ratio — repetition penalty
    * rounded to 4 decimals. */
  def qualityScore(textCol: String): Column = {
    val words = s"cast(size(split(trim($textCol), '\\\\s+')) AS double)"
    val alphaRatio =
      s"cast(length(regexp_replace($textCol, '[^A-Za-z]', '')) AS double) / length($textCol)"
    val distinctRatio =
      s"cast(size(array_distinct(split(lower(trim($textCol)), '\\\\s+'))) AS double) / $words"
    expr(s"round(0.4 * least($words / 100.0, 1.0) + 0.3 * ($alphaRatio) + 0.3 * ($distinctRatio), 4)")
  }

  /** Fraction of word occurrences that are (English) stopwords — a
    * fluency signal: natural prose sits around 0.3-0.5, keyword spam and
    * symbol soup near 0. */
  def stopwordRatio(textCol: String,
                    stopwords: Seq[String] = Stopwords.toMap.apply("en")): Column = {
    val toks = s"split(lower(trim($textCol)), '\\\\s+')"
    val set = stopwords.map(w => s"'$w'").mkString("array(", ",", ")")
    // token array bound once (the textual form split the text twice)
    expr(s"element_at(transform(array($toks), __t -> " +
      s"size(filter(__t, t -> array_contains($set, t))) / " +
      s"cast(size(__t) AS double)), 1)")
  }

  /** Punctuation character ratio — complements [[qualityScore]]'s alpha
    * ratio for boilerplate/markup detection. */
  def punctRatio(textCol: String): Column =
    expr(s"cast(length(regexp_replace($textCol, '[^!-/:-@\\\\[-`{-~]', '')) AS double)" +
      s" / length($textCol)")

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text.
    * Identical across engines (md5 is md5), so exact-dup groups can be
    * found from fingerprints alone without shipping full texts. */
  def fingerprint(textCol: String): Column =
    expr(s"md5(concat_ws(' ', split(lower(trim($textCol)), '\\\\s+')))")

  /** Rolling polynomial hash over normalized tokens (order-sensitive —
    * distinguishes shuffled copies that [[fingerprint]] of sorted tokens
    * would not): h = fold(h * 31 + xxhash64(token)) mod 2^61-1. */
  def rollingHash(textCol: String): Column =
    expr(s"aggregate(split(lower(trim($textCol)), '\\\\s+'), 7L, " +
      "(acc, t) -> pmod(acc * 31 + xxhash64(t), 2305843009213693951L))")

  /** PII scrubbing patterns — deliberately written in the regex subset
    * that Java and RE2 interpret identically, so external systems can
    * reproduce the scrub byte-for-byte. Order matters: URLs first (they
    * may embed @ and digits), then emails, then long digit runs. */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{6,}"

  /** Redact URLs / emails / long digit runs with typed placeholders —
    * the standard pre-training scrub pass. Pure per-row codegen'd
    * regexp_replace chain: no shuffle, no UDF. */
  def redact(textCol: String): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(col(textCol), UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  /** Corpus-level unigram surprisal per document — the classic
    * perplexity-proxy quality filter (a cheap stand-in for an LM score):
    * build the corpus unigram distribution, then score each document by
    * the average negative log-probability of its tokens. Common-word
    * documents score low; documents of corpus-rare tokens score high
    * (gibberish, wrong-language and boilerplate-free outliers — prune by
    * quantile downstream).
    *
    * Scale shape: ONE hash-agg shuffle builds the vocabulary counts; the
    * corpus total rides a single bounded driver scalar; scoring is a
    * join of tokens against the vocabulary — BROADCAST while the vocab
    * fits (`maxBroadcastVocab` rows; word-level unigram tables are
    * usually millions of rows), falling back to a shuffled hash join
    * past that bound (web-scale vocabularies — URLs, typos, code tokens —
    * can exceed any broadcast limit) — followed by one per-doc hash agg.
    * The corpus token stream itself is never shuffled twice and never
    * collected.
    * @param maxBroadcastVocab vocab-row bound for the broadcast plan;
    *   above it the scoring join shuffles on the token instead
    * @return (idCol, n_tokens, surprisal) — natural-log, rounded to 4 */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String,
                       maxBroadcastVocab: Long = 4000000L): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
    // persisted (and registered with [[Caches]] for release after the
    // caller materializes): the total-count scalar materializes the
    // vocabulary once, and the scoring join then probes the cached table
    // instead of re-aggregating the token stream
    val vocab = Caches.registered(
      toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // one bounded 1-row collect (corpus token total + vocab size) —
    // never row-scaled; it doubles as the broadcast-size guard
    val stats = vocab.agg(sum(col("__c")), count(lit(1))).collect()(0)
    val total = stats.getLong(0).toDouble
    val scored =
      if (stats.getLong(1) <= maxBroadcastVocab) toks.join(broadcast(vocab), "__w")
      else toks.join(vocab, "__w")
    scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("__c") / lit(total))), 4).as("surprisal"))
  }

  /** CCNet-style quality bucketing: per language stratum, split
    * documents into `buckets` equal-count groups (1 = lowest surprisal
    * "head" … `buckets` = "tail") by their [[unigramSurprisal]] score —
    * the preprocessing rule behind head/middle/tail corpus tiers.
    * `ntile` is rank-based, so the split is exactly reproducible in any
    * engine (no quantile-interpolation arithmetic to disagree about);
    * ties break on the id.
    *
    * Scale shape: scoring is [[unigramSurprisal]]'s shape; bucketing is
    * ONE window shuffle keyed by the language stratum. A stratum's rank
    * sorts on its reducer (spillable); at 100 TB replace the exact
    * ntile with per-stratum approx-quantile cuts computed in one agg if
    * single-key strata dominate.
    * @return (idCol, stratumCol, surprisal, bucket) */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        stratumCol: String, buckets: Int = 3,
                        maxBroadcastVocab: Long = 4000000L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val scored = unigramSurprisal(df, idCol, textCol, maxBroadcastVocab)
      .join(df.select(col(idCol), col(stratumCol)), idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("surprisal"), col(idCol))
    scored.withColumn("bucket", ntile(buckets).over(w))
      .select(col(idCol), col(stratumCol), col("surprisal"), col("bucket"))
  }

  /** Convenience: attach all text-analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_guess", languageId(textCol))
      .withColumn("n_tokens", tokenCount(textCol))
      .withColumn("n_words", wordCount(textCol))
      .withColumn("quality", qualityScore(textCol))
      .withColumn("stopword_ratio", stopwordRatio(textCol))
      .withColumn("punct_ratio", punctRatio(textCol))
      .withColumn("fingerprint", fingerprint(textCol))
      .withColumn("rolling_hash", rollingHash(textCol))
}
