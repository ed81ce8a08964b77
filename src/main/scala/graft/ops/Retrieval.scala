package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus — classic Okapi BM25,
  * the standard sparse ranker (and the usual first stage in front of an
  * embedding re-ranker at corpus scale).
  *
  * Scale shape: the corpus token stream is filtered to the QUERY's terms
  * before anything shuffles (an `isin` over a handful of literals —
  * codegen'd, pushdown-friendly), so the per-(doc, term) frequency agg
  * and the scoring agg carry only matching postings, never the corpus.
  * Document lengths need one corpus-wide agg; N and avgdl ride a single
  * bounded driver scalar; document-frequency and idf per query term is
  * a tiny broadcast. Nothing is ever all-pairs and no UDF runs per row.
  */
object Retrieval {

  /** BM25 top-k: the `k` highest-scoring documents for `query`, ranked
    * by (rounded score DESC, `idCol` ASC — deterministic across ties).
    * @return (idCol, score) with score rounded to 4 decimals */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               query: String, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "empty query")
    val toks = corpus.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")

    // one corpus agg: per-document length; cached — the scalar (N,
    // avgdl) and the scoring join both read it
    val docLen = Caches.registered(
      toks.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nAvg = docLen.agg(count(lit(1)), avg(col("__dl"))).collect()(0)
    val n = nAvg.getLong(0).toDouble
    val avgdl = nAvg.getDouble(1)

    // postings restricted to query terms BEFORE any shuffle
    val postings = toks.filter(col("__w").isin(terms: _*))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__tf"))
    // per-term document frequency → idf (a |terms|-row broadcast)
    val idf = postings.groupBy(col("__w"))
      .agg(count(lit(1)).cast("double").as("__df"))
      .withColumn("__idf",
        log((lit(n) - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))

    postings
      .join(broadcast(idf), "__w")
      .join(docLen, idCol)
      .withColumn("__s", col("__idf") * col("__tf") * lit(k1 + 1) /
        (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / avgdl)))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
