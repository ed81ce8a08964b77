package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share a
  * word n-gram with a held-out evaluation set — the standard guard
  * against test-set leakage in pre-training corpora (GPT-3 §C / PaLM
  * use 8-13-gram overlap; the n is a knob here).
  *
  * Scale design: both sides explode to (doc, gramHash) rows, the EVAL
  * side collapses to DISTINCT hashes, and contamination is one
  * inner-join + distinct on a single long column. The eval set is small
  * by construction (benchmarks, not corpora), so Catalyst/AQE broadcasts
  * its hash set and the corpus side never shuffles; gram strings never
  * leave their executor — only 8-byte xxhash64 values travel. The
  * corpus pass is a projection + explode, no per-row quadratic work.
  */
object Decontaminate {

  private def gramHashes(textCol: String, n: Int): String = {
    // tokens BOUND once as a lambda var: a textual split(...) inside the
    // transform lambda is re-evaluated interpreted once per gram —
    // O(words²) characters split per document
    s"""element_at(transform(array(split(lower(trim($textCol)), '\\\\s+')), __t ->
       |CASE WHEN size(__t) < $n THEN array()
       |ELSE array_distinct(transform(sequence(1, size(__t) - ${n - 1}),
       |  __i -> xxhash64(array_join(slice(__t, __i, $n), ' '))))
       |END), 1)""".stripMargin
  }

  /** (idCol, n_shared) per contaminated corpus document: how many of its
    * distinct n-grams appear anywhere in the eval set. */
  def contaminated(corpus: DataFrame, evalSet: DataFrame,
                   idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val evalGrams = evalSet
      .select(explode(expr(gramHashes(textCol, n))).as("__g"))
      .distinct()
    corpus
      .select(col(idCol), explode(expr(gramHashes(textCol, n))).as("__g"))
      .join(evalGrams, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus with contaminated documents removed (left-anti on the
    * contaminated id set). The id set is PERSISTED (and registered with
    * [[Caches]] for release after the caller materializes): without it
    * the anti-join's lineage would re-run [[contaminated]] — exploding
    * the corpus to grams a SECOND time, the dominant cost at corpus
    * scale. With it, the only Generate (explode) over the corpus in the
    * executed plan is the one inside the id-set computation, and the
    * anti-join probes a small cached id table. */
  def clean(corpus: DataFrame, evalSet: DataFrame,
            idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val ids = Caches.registered(
      contaminated(corpus, evalSet, idCol, textCol, n).select(idCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    corpus.join(ids, Seq(idCol), "left_anti")
  }
}
