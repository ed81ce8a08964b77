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

  /** Word n-grams as strings over an already-BOUND token-array lambda
    * variable `tVar`, empty array when the text is shorter than n. The
    * caller must bind the split(...) via the element_at/transform idiom:
    * referencing the split expression textually here would re-evaluate
    * it interpreted once per gram (lambda bodies never reach codegen or
    * CSE — the CollapseProject-inlining trap, thread-dump verified on
    * the minhash band path). */
  private def gramsOf(tVar: String, n: Int): String =
    s"""CASE WHEN size($tVar) < $n THEN array()
       |ELSE transform(sequence(1, size($tVar) - ${n - 1}),
       |  __i -> array_join(slice($tVar, __i, $n), ' '))
       |END""".stripMargin

  /** Fraction of word occurrences that repeat an earlier word:
    * 1 − distinct/total. 0 for fully-distinct prose, → 1 for loops. */
  def duplicateWordFraction(textCol: String): Column = {
    val t = toks(textCol)
    expr(s"round(1.0 - cast(size(array_distinct($t)) AS double) / size($t), 4)")
  }

  /** Fraction of TOKEN POSITIONS covered by the single most frequent
    * word n-gram — a true fraction in [0, 1]: covered positions are the
    * deduplicated union of each occurrence's [i, i+n-1] span, so the
    * overlapping occurrences of a loop ("x x x x") count each position
    * once instead of once per occurrence (occurrences × n / words exceeds
    * 1 on exactly the looping text the filter exists for). This is the
    * token-position analog of Gopher's character-coverage "fraction of
    * characters in most common n-gram" (Rae et al. §A1.1). Among grams
    * tied on occurrence count the lexicographically smallest is measured,
    * so the statistic is deterministic and an independent oracle can
    * reproduce it exactly. */
  def topNgramFraction(textCol: String, n: Int): Column = {
    require(n >= 2, "topNgramFraction needs n >= 2")
    // Each intermediate (token array, gram array, distinct grams,
    // per-gram counts, the top gram) is BOUND once per row via the
    // single-element `element_at(transform(array(x), __v -> body), 1)`
    // idiom before the next stage uses it — inlining them textually
    // would re-run the O(d²) count scan inside the per-position lambda
    // and turn a bounded per-document cost into O(d⁴) (measured: q54
    // went from sub-second to unrunnable). With the bindings the whole
    // measure stays O(d²) in the per-document gram count, computed once
    // per stage.
    expr(
      s"""element_at(transform(array(${toks(textCol)}), __t ->
         |element_at(transform(array(${gramsOf("__t", n)}), __g ->
         |round(CASE WHEN size(__g) = 0 THEN 0.0 ELSE
         |  element_at(transform(array(array_distinct(__g)), __dg ->
         |    element_at(transform(array(
         |        transform(__dg, __d -> size(filter(__g, __x -> __x = __d)))
         |      ), __cnts ->
         |      element_at(transform(array(
         |          array_min(transform(
         |            filter(sequence(1, size(__dg)),
         |              __j -> element_at(__cnts, __j) = array_max(__cnts)),
         |            __j -> element_at(__dg, __j)))
         |        ), __top ->
         |        cast(size(array_distinct(flatten(transform(
         |          filter(sequence(1, size(__g)), __i -> element_at(__g, __i) = __top),
         |          __s -> sequence(__s, __s + ${n - 1}))))) AS double)
         |        / size(__t)
         |      ), 1)
         |    ), 1)
         |  ), 1)
         |END, 4)
         |), 1)
         |), 1)""".stripMargin)
  }

  /** Fraction of n-gram occurrences that are duplicates of another
    * occurrence (Gopher's "duplicate n-gram fraction"). */
  def duplicateNgramFraction(textCol: String, n: Int): Column = {
    require(n >= 2, "duplicateNgramFraction needs n >= 2")
    // tokens and grams each bound once; the old textually-inlined $g
    // inside the outer filter's lambda rebuilt the gram array (and
    // re-split the text) once per gram — O(d³) per document
    expr(
      s"""element_at(transform(array(${toks(textCol)}), __t ->
         |element_at(transform(array(${gramsOf("__t", n)}), __g ->
         |round(CASE WHEN size(__g) = 0 THEN 0.0 ELSE
         |cast(size(filter(__g, __x -> size(filter(__g, __y -> __y = __x)) > 1)) AS double)
         |/ size(__g) END, 4)
         |), 1)
         |), 1)""".stripMargin)
  }

  /** Attach the standard Gopher repetition columns. */
  def attach(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("dup_word_frac", duplicateWordFraction(textCol))
      .withColumn("top_bigram_frac", topNgramFraction(textCol, 2))
      .withColumn("dup_trigram_frac", duplicateNgramFraction(textCol, 3))

  /** Keep documents under all three repetition ceilings. Defaults are
    * GOPHER-INSPIRED, not Gopher-equivalent: the paper's 0.20 top-2-gram
    * / 0.18 dup-3-gram thresholds apply to character-coverage fractions,
    * while these measures are token-position analogs (word-level 0.6
    * plays its duplicate-line-fraction role for unstructured text) —
    * calibrate per corpus. */
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
