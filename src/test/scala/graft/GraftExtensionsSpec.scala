package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{CosineSim, HashedShingles, SimHash64}

/** The SQL function surface must plan the SAME native expressions as the
  * Scala API — checked by computing each sketch both ways on the same
  * rows (the sf-scale check is q48's DuckDB cosine oracle). */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SharedSpark.spark
    GraftExtensions.install(s)
    s
  }
  import spark.implicits._

  test("graft_cosine in SQL equals the CosineSim expression") {
    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b").createOrReplaceTempView("ext_cos")
    val viaSql = spark.sql(
      "SELECT graft_cosine(a, b) AS c FROM ext_cos ORDER BY c")
      .collect().map(_.getDouble(0))
    val viaApi = spark.table("ext_cos")
      .select(GraftColumnBridge.column(CosineSim(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b")))).as("c"))
      .orderBy("c").collect().map(_.getDouble(0))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("graft_simhash64(graft_shingles(text, n)) equals the expression chain") {
    Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs")
      .toDF("text").createOrReplaceTempView("ext_sim")
    val viaSql = spark.sql(
      "SELECT graft_simhash64(graft_shingles(text, 3)) AS s FROM ext_sim")
      .collect().map(_.getLong(0))
    val viaApi = spark.table("ext_sim")
      .select(GraftColumnBridge.column(SimHash64(HashedShingles(
        GraftColumnBridge.expression(col("text")), 3))).as("s"))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("config arguments must be literals — clear analysis-time error") {
    Seq("x").toDF("text").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, length(text)) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("must be a non-null numeric literal"),
      s"unexpected error: ${e.getMessage}")
  }

  test("a non-numeric literal config gets the same clear error, not a CCE") {
    Seq("x").toDF("text").createOrReplaceTempView("ext_bad_str")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, '3') FROM ext_bad_str").collect()
    }
    assert(e.getMessage.contains("must be a non-null numeric literal"),
      s"unexpected error: ${e.getMessage}")
  }

  test("install is idempotent") {
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT graft_cosine(array(1.0f), array(1.0f)) AS c")
      .head().getDouble(0) === 1.0)
  }

  test("SpanCoverage: two-pointer flags match brute-force over sorted starts") {
    import graft.expressions.SpanCoverage
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def brute(starts: Seq[Int], n: Int, k: Int): Seq[Boolean] =
      (0 until n).map(p => starts.exists(s => s <= p && p <= s + k - 1))
    val cases = Seq(
      (Seq.empty[Int], 5, 3),          // no spans: all false
      (Seq(0), 5, 3),                  // span at the head
      (Seq(2), 5, 3),                  // span covering the tail
      (Seq(0, 1, 2), 8, 3),            // overlapping chain
      (Seq(0, 6), 10, 4),              // disjoint spans with a gap
      (Seq(4), 5, 8),                  // k longer than the doc tail
      (Seq.empty[Int], 0, 3))          // empty doc
    cases.foreach { case (starts, n, k) =>
      val got = SpanCoverage.compute(
        new GenericArrayData(starts.toArray), n, k)
      assert(got.toBooleanArray().toSeq === brute(starts, n, k),
        s"starts=$starts n=$n k=$k")
    }
  }

  test("GramHashes: positional, case-folded, tail slots partial, length-preserving") {
    import graft.expressions.GramHashes
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("X", "A", "B", "C", "D", "E")), // shares 1's gram at pos 1, case-folded
      (3L, Seq("a", "b")),                     // shorter than k: only partial folds
      (4L, Seq.empty[String]))
      .toDF("id", "toks")
      .select(col("id"), GraftColumnBridge.column(GramHashes(
        GraftColumnBridge.expression(col("toks")), 5)).as("gh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // output length == input length (positions align with the token array)
    assert(rows(1L).length == 5 && rows(2L).length == 6 &&
      rows(3L).length == 2 && rows(4L).isEmpty)
    // the full 5-gram "a b c d e" hashes identically at doc1 pos0 and
    // doc2 pos1 despite the casing difference
    assert(rows(1L)(0) == rows(2L)(1), "case-folded gram equality")
    // different grams hash differently
    assert(rows(2L)(0) != rows(1L)(0), "distinct grams must differ")
    // tail partial folds differ from the full gram (they hash fewer
    // tokens) — callers cut them with pos <= n-k
    assert(rows(1L)(1) != rows(1L)(0), "partial tail fold is not the full gram")
    // a doc shorter than k holds only partial folds, and its 2-token
    // fold at pos 0 equals nothing from the 5-gram world
    assert(!rows(1L).contains(rows(3L)(0)))
  }
}
