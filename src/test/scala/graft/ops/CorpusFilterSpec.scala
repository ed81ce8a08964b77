package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked semantics for the Gopher repetition signals and the
  * n-gram decontamination operator, plus the plan shapes they exist for
  * (repetition is map-only; decontamination ships only gram hashes).
  * The sf-scale checks are q54/q55's DuckDB list-lambda oracles. */
class CorpusFilterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "loop loop loop loop loop loop loop loop"),
    (2L, "alpha beta gamma delta alpha beta gamma delta epsilon zeta"),
    (3L, "every word in this sentence is completely unique today"))
    .toDF("doc_id", "text")

  test("repetition fractions match hand-computed values") {
    val out = RepetitionStats.attach(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // 8x "loop": 1 distinct word of 8; the 7 overlapping "loop loop"
    // occurrences cover every token position exactly once → 1.0, the
    // capped maximum (the old occurrences×n/words scored 1.75 here —
    // not a fraction)
    assert(out(1L) == (0.875, 1.0, 1.0))
    // 10 words, 6 distinct; "alpha beta" twice -> 2*2/10; trigram dups 4 of 8
    assert(out(2L) == (0.4, 0.4, 0.5))
    // fully unique prose: bigram max is 1 -> 2/9
    assert(out(3L) == (0.0, 0.2222, 0.0))
  }

  test("gopherFilter keeps only documents under every ceiling") {
    // bigram ceiling raised: in a 9-word doc even an all-unique bigram
    // set scores 2/9 ≈ 0.222 (Gopher's 0.20 default presumes long docs)
    val kept = RepetitionStats.gopherFilter(docs, "text", maxTopBigram = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L), "the loop and the repeated phrase must be dropped")
  }

  test("repetition measures are map-only: no shuffle in the plan") {
    val plan = RepetitionStats.attach(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition must not shuffle:\n$plan")
  }

  test("decontamination flags exactly the documents sharing an n-gram") {
    val evalSet = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a clean document about completely different things entirely"),
      // shares exactly "quick brown fox jumps over" with the eval doc
      (2L, "she said quick brown fox jumps over it all"),
      (3L, "short text"), // under n tokens: never flagged, never crashes
      (4L, "THE QUICK BROWN FOX JUMPS again")) // case-insensitive: 1 gram
      .toDF("doc_id", "text")
    val flagged = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged == Map(2L -> 1L, 4L -> 1L), s"got $flagged")
    val clean = Decontaminate.clean(corpus, evalSet, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(1L, 3L))
  }

  test("clean explodes the corpus ONCE, behind the cached contaminated-id set") {
    val evalSet = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a clean document about completely different things entirely"),
      (2L, "she said quick brown fox jumps over it all"))
      .toDF("doc_id", "text")
    val cleaned = Decontaminate.clean(corpus, evalSet, "doc_id", "text", n = 5)
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(1L))
    val plan = cleaned.queryExecution.executedPlan.toString
    // the anti-join must probe the PERSISTED id set — without the persist
    // its lineage would inline contaminated() and gram-explode the corpus
    // a second time when a caller materializes both frames
    val cacheAt = plan.indexOf("InMemoryRelation")
    assert(cacheAt >= 0, s"contaminated-id set must be cached:\n$plan")
    // every explode sits INSIDE the cached subtree (printed under the
    // InMemoryRelation); the outer anti-join plan re-explodes nothing
    var i = plan.indexOf("Generate")
    while (i >= 0) {
      assert(i > cacheAt,
        s"explode outside the cached id-set computation at offset $i:\n$plan")
      i = plan.indexOf("Generate", i + 1)
    }
    Caches.releaseAll()
  }

  test("decontamination join carries only 8-byte hashes, eval side broadcast") {
    val evalSet = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq((1L, "one two three four five six seven")).toDF("doc_id", "text")
    val df = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text")
    df.collect() // let AQE finalize the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the small eval gram set must broadcast:\n$plan")
  }
}
