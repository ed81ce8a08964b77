package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SURVEY.md §7.6 family) — the SemDeDup recipe:
  * drop every document but one deterministic representative from each
  * group of embedding-level near-duplicates (cosine ≥ threshold).
  * Catches what lexical dedup cannot: paraphrases, re-renderings and
  * templated rewrites whose token overlap is low but whose embeddings
  * nearly coincide.
  *
  * Composition of three already-bounded pieces, no new shuffle shapes:
  *  1. candidate pairs from OR-of-ANDs hyperplane LSH
  *     ([[Similarity.cosinePairsLsh]]) — bucket joins, never all-pairs,
  *     every candidate verified by exact cosine;
  *  2. groups = connected components over the pair edges
  *     ([[TextDedup.connectedComponents]]) — pointer doubling,
  *     O(log diameter) rounds of equi-joins;
  *  3. survivors = the minimum id per group (deterministic, any engine
  *     can replay it), applied as ONE left-anti join on the id.
  *
  * At 100 TB each stage is the documented scale path of its component:
  * the LSH shuffle is n·tables bucket rows, components carry (id, label)
  * pairs only, and the final anti-join is a keyed hash join against the
  * (small) drop list. */
object SemanticDedup {

  /** Rows of `emb` that SURVIVE semantic dedup at `threshold`.
    * @return the input frame minus non-representative near-duplicates */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double,
                    tables: Int = 8, bits: Int = 8,
                    seed: Long = 7L,
                    maxBucket: Int = 4096): DataFrame = {
    val drops = dropList(emb, idCol, vecCol, threshold, tables, bits, seed,
      maxBucket)
    emb.join(drops, Seq(idCol), "left_anti")
  }

  /** The ids semanticDedup would drop: every member of a near-dup
    * component except its minimum id. Exposed separately so pipelines
    * can audit (or soft-delete) instead of filtering. */
  def dropList(emb: DataFrame, idCol: String, vecCol: String,
               threshold: Double,
               tables: Int = 8, bits: Int = 8,
               seed: Long = 7L,
               maxBucket: Int = 4096): DataFrame = {
    val pairs = Similarity.cosinePairsLsh(emb, idCol, vecCol, threshold,
      tables, bits, seed, maxBucket)
    TextDedup.connectedComponents(pairs, s"${idCol}_1", s"${idCol}_2")
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
  }
}
