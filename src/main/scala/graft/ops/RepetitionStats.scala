package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition signals (Rae et al. 2021,
  * "Scaling Language Models" §A1.1 — the standard pre-training filters
  * for looping/boilerplate text), as pure codegen'd column expressions:
  * per-row higher-order functions, no UDF, no shuffle — at 100 TB this
  * is a map-only pass whose cost is bounded by the document length, and
  * every measure is re-expressible in ANSI/DuckDB list lambdas so the
  * oracle can verify it row-exactly.
  *
  * The n-gram measures are O(d²) in the per-document distinct-gram count
  * by construction (a per-row mode needs a count per candidate); that is
  * the right trade at scale — documents are bounded (thousands of
  * tokens), the corpus is not, so a per-row quadratic beats any
  * shuffle-based formulation by orders of magnitude.
  */
object RepetitionStats {

  private def toks(textCol: String): String =
    s"split(lower(trim($textCol)), '\\\\s+')"

  /** Word n-grams as strings, empty array when the text is shorter than
    * n: each gram is a slice of the token array joined back — whole-stage
    * codegen CSEs the repeated split. */
  private def grams(textCol: String, n: Int): String = {
    val t = toks(textCol)
    s"""CASE WHEN size($t) < $n THEN array()
       |ELSE transform(sequence(1, size($t) - ${n - 1}),
       |  __i -> array_join(slice($t, __i, $n), ' '))
       |END""".stripMargin
  }

  /** Fraction of word occurrences that repeat an earlier word:
    * 1 − distinct/total. 0 for fully-distinct prose, → 1 for loops. */
  def duplicateWordFraction(textCol: String): Column = {
    val t = toks(textCol)
    expr(s"round(1.0 - cast(size(array_distinct($t)) AS double) / size($t), 4)")
  }

  /** Fraction of word occurrences covered by the single most frequent
    * word n-gram (Gopher's "top n-gram fraction"): occurrences × n / words. */
  def topNgramFraction(textCol: String, n: Int): Column = {
    require(n >= 2, "topNgramFraction needs n >= 2")
    val g = grams(textCol, n)
    val t = toks(textCol)
    expr(
      s"""round(CASE WHEN size($g) = 0 THEN 0.0 ELSE
         |cast(array_max(transform(array_distinct($g),
         |  __d -> size(filter($g, __x -> __x = __d)))) * $n AS double)
         |/ size($t) END, 4)""".stripMargin)
  }

  /** Fraction of n-gram occurrences that are duplicates of another
    * occurrence (Gopher's "duplicate n-gram fraction"). */
  def duplicateNgramFraction(textCol: String, n: Int): Column = {
    require(n >= 2, "duplicateNgramFraction needs n >= 2")
    val g = grams(textCol, n)
    expr(
      s"""round(CASE WHEN size($g) = 0 THEN 0.0 ELSE
         |cast(size(filter($g, __x -> size(filter($g, __y -> __y = __x)) > 1)) AS double)
         |/ size($g) END, 4)""".stripMargin)
  }

  /** Attach the standard Gopher repetition columns. */
  def attach(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("dup_word_frac", duplicateWordFraction(textCol))
      .withColumn("top_bigram_frac", topNgramFraction(textCol, 2))
      .withColumn("dup_trigram_frac", duplicateNgramFraction(textCol, 3))

  /** Keep documents under all three repetition ceilings (Gopher's
    * published thresholds as defaults: top-2-gram 0.20, dup-3-gram 0.18;
    * word-level 0.6 ≈ its duplicate-line-fraction role for unstructured
    * text). */
  def gopherFilter(df: DataFrame, textCol: String,
                   maxDupWord: Double = 0.6,
                   maxTopBigram: Double = 0.20,
                   maxDupTrigram: Double = 0.18): DataFrame =
    attach(df, textCol)
      .filter(col("dup_word_frac") <= maxDupWord &&
        col("top_bigram_frac") <= maxTopBigram &&
        col("dup_trigram_frac") <= maxDupTrigram)
      .drop("dup_word_frac", "top_bigram_frac", "dup_trigram_frac")
}
