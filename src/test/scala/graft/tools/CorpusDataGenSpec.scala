package graft.tools

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the ScaleBench corpus generator: the planted structures
  * (near-dups, boilerplate groups, duplicate event_ids) must occur at
  * scale-INDEPENDENT rates — a time ratio between two generated sizes
  * measures the operator under test, not a drifting hit rate — and
  * every frame must be seed-deterministic so a re-run reproduces the
  * same corpus. */
class CorpusDataGenSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("documents: planted near-dup and boilerplate rates are scale-independent; deterministic") {
    def rates(n: Long): (Double, Double) = {
      val df = CorpusDataGen.documents(spark, n).cache()
      val nearDup = df.filter(col("doc_id") % 20 === 1).count().toDouble / n
      val boiler = df.filter(col("text").startsWith("begin section b")).count().toDouble / n
      df.unpersist()
      (nearDup, boiler)
    }
    val (nd1, b1) = rates(2000)
    val (nd2, b2) = rates(20000)
    assert(math.abs(nd1 - nd2) < 0.01 && math.abs(nd1 - 0.05) < 0.01)
    assert(math.abs(b1 - b2) < 0.02 && math.abs(b1 - 1.0 / 7) < 0.02)
    val a = CorpusDataGen.documents(spark, 2000)
    val b = CorpusDataGen.documents(spark, 2000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("events: fixed 24h span at every size, ~10% planted duplicate ids inside any watermark horizon") {
    Seq(5000L, 50000L).foreach { n =>
      val ev = CorpusDataGen.events(spark, n).cache()
      // the ts span is the SAME 24 hours regardless of n (window count
      // — and with it streaming state — stays constant across scales)
      val span = ev.agg(
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("s"))
        .head().getLong(0)
      assert(span > 86000 && span <= 86400, s"span $span at n=$n")
      // planted duplicates: ~10% of rows repeat the previous event_id,
      // arriving one inter-event gap (86400/n s « any watermark) later
      val dups = (n - ev.select("event_id").distinct().count()).toDouble / n
      assert(math.abs(dups - 0.1) < 0.01, s"dup rate $dups at n=$n")
      ev.unpersist()
    }
    val a = CorpusDataGen.events(spark, 5000)
    val b = CorpusDataGen.events(spark, 5000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("embeddings: planted near-dup perturbations have cosine ~ 1 to their predecessor") {
    val emb = CorpusDataGen.embeddings(spark, 2000).cache()
    val pairs = emb.alias("a")
      .join(emb.alias("b"), expr("a.vec_id = b.vec_id + 1 AND a.vec_id % 10 = 1"))
      .select(graft.ops.Similarity
        .cosineExpr("a.embedding", "b.embedding").as("cos"))
    val minCos = pairs.agg(min("cos")).head().getDouble(0)
    assert(pairs.count() === 200)
    assert(minCos > 0.999, s"planted near-dup cosine floor was $minCos")
    emb.unpersist()
  }
}
