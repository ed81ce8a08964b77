package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: latest-prior-wins, inclusive equality, unmatched
  * → NULL, per-key isolation, tolerance windows — checked row-by-row on
  * frames small enough to verify by hand (the sf-scale check is q43's
  * DuckDB ASOF JOIN oracle). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:00:05"), 101.0),
    ("A", ts("2024-01-01 10:00:10"), 102.0),
    ("B", ts("2024-01-01 10:00:03"), 200.0))
    .toDF("sym", "q_ts", "price")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:04"), 1L), // after 10:00:00, before :05
    ("A", ts("2024-01-01 10:00:05"), 2L), // exactly at :05 → inclusive
    ("A", ts("2024-01-01 09:59:59"), 3L), // before any quote → NULL
    ("B", ts("2024-01-01 10:00:04"), 4L), // B's only quote, not A's
    ("C", ts("2024-01-01 10:00:04"), 5L)) // key with no quotes → NULL
    .toDF("sym", "t_ts", "trade_id")

  private def joined = AsofJoin.asofJoin(
    trades, quotes, Seq("sym"), "t_ts", "q_ts",
    rightCols = Seq("price", "q_ts"))

  test("latest prior right row wins; equality is inclusive") {
    val m = joined.collect().map(r =>
      r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(m(1L) === Some(100.0)) // :04 → quote at :00, not :05
    assert(m(2L) === Some(101.0)) // :05 → the quote AT :05
    assert(m(3L) === None)        // before the first quote
    assert(m(4L) === Some(200.0)) // B matches only B's quote
    assert(m(5L) === None)        // no quotes for C at all
  }

  test("all left rows and columns survive; matched right ts is attached") {
    val out = joined
    assert(out.count() === 5)
    assert(out.columns.toSeq === Seq("sym", "t_ts", "trade_id", "price", "q_ts"))
    val row = out.filter($"trade_id" === 2L).head()
    assert(row.getTimestamp(4) === ts("2024-01-01 10:00:05"))
  }

  test("a NULL right payload field does not fall back to an older row") {
    val q = Seq(("A", ts("2024-01-01 10:00:00"), Some(100.0)),
      ("A", ts("2024-01-01 10:00:05"), None: Option[Double]))
      .toDF("sym", "q_ts", "price")
    val t = Seq(("A", ts("2024-01-01 10:00:06"), 1L)).toDF("sym", "t_ts", "trade_id")
    val r = AsofJoin.asofJoin(t, q, Seq("sym"), "t_ts", "q_ts", Seq("price", "q_ts")).head()
    assert(r.isNullAt(3), "matched row's NULL price must be kept, not skipped")
    assert(r.getTimestamp(4) === ts("2024-01-01 10:00:05"),
      "the :05 row is the match even though its payload is NULL")
  }

  test("tolerance nulls out matches older than the lookback") {
    val within2s = AsofJoin.asofJoin(
      trades, quotes, Seq("sym"), "t_ts", "q_ts", Seq("price"),
      tolerance = Some((l, r) => l.cast("long") - r.cast("long") <= lit(2L)))
    val m = within2s.collect().map(r =>
      r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(m(1L) === None)        // match was 4 s back → dropped
    assert(m(2L) === Some(101.0)) // 0 s back → kept
    assert(m(4L) === Some(200.0)) // 1 s back → kept
  }

  test("a NULL right timestamp matches nothing (ASOF semantics)") {
    val q = Seq(("A", None: Option[java.sql.Timestamp], Some(99.0)),
      ("A", Some(ts("2024-01-01 10:00:05")), Some(101.0)))
      .toDF("sym", "q_ts", "price")
    val t = Seq(("A", ts("2024-01-01 10:00:01"), 1L), // before any real quote
      ("A", ts("2024-01-01 10:00:06"), 2L))           // after the :05 quote
      .toDF("sym", "t_ts", "trade_id")
    val m = AsofJoin.asofJoin(t, q, Seq("sym"), "t_ts", "q_ts", Seq("price"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(m(1L) === None, "NULL-ts quote must not act as an earliest match")
    assert(m(2L) === Some(101.0))
  }

  test("right payload names colliding with left columns are rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes.withColumnRenamed("price", "trade_id"),
        Seq("sym"), "t_ts", "q_ts", Seq("trade_id"))
    }
  }
}
