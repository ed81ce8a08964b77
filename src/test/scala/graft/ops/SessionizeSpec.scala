package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap-based sessionization semantics on hand-checkable frames: break
  * strictly beyond the gap, exact-gap rows stay, per-key isolation,
  * tie-break determinism, and the one-shuffle plan shape (the sf-scale
  * check is q41's DuckDB window-idiom oracle). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: 3 events within 10 min, then a 31-min gap, then 1 more
    (1L, 1L, ts("2024-01-01 10:00:00")),
    (1L, 2L, ts("2024-01-01 10:05:00")),
    (1L, 3L, ts("2024-01-01 10:10:00")),
    (1L, 4L, ts("2024-01-01 10:41:00")),
    // user 2: a single event — its own session 1
    (2L, 5L, ts("2024-01-01 10:00:00")),
    // user 3: gap of EXACTLY 30 min → same session (strict >)
    (3L, 6L, ts("2024-01-01 10:00:00")),
    (3L, 7L, ts("2024-01-01 10:30:00")),
    // user 3: then 30 min + 1 µs → breaks
    (3L, 8L, ts("2024-01-01 11:00:00.000001")))
    .toDF("user_id", "event_id", "ts")

  private def sessions = Sessionize.sessionizeSeconds(
    events, Seq("user_id"), "ts", gapSeconds = 30 * 60,
    tieBreakCols = Seq("event_id"))

  test("breaks only on gaps strictly beyond the threshold") {
    val m = sessions.collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(m(1L) === 1L && m(2L) === 1L && m(3L) === 1L)
    assert(m(4L) === 2L, "31-min gap must open session 2")
    assert(m(5L) === 1L, "a lone event is session 1")
    assert(m(6L) === 1L && m(7L) === 1L, "exactly-30-min gap must NOT break")
    assert(m(8L) === 2L, "30 min + 1 µs must break")
  }

  test("sessions are numbered per key, starting at 1") {
    val perUser = sessions.groupBy("user_id")
      .agg(min("session_id").as("lo"), max("session_id").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perUser(1L) === (1L, 2L))
    assert(perUser(2L) === (1L, 1L))
    assert(perUser(3L) === (1L, 2L))
  }

  test("tied timestamps resolve by the tie-break column, deterministically") {
    // Two rows at the same instant: ordered by event_id, they sit in one
    // session; the later-by-id row then opens session 2 after a big gap.
    val tied = Seq(
      (9L, 1L, ts("2024-01-01 09:00:00")),
      (9L, 2L, ts("2024-01-01 09:00:00")),
      (9L, 3L, ts("2024-01-01 12:00:00")))
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessionizeSeconds(
      tied, Seq("user_id"), "ts", 1800, Seq("event_id"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 2L)
  }

  test("NULL-timestamp rows are dropped, not phantom sessions") {
    // Without the filter, each NULL-ts row sorts first, reads prev=NULL,
    // and opens a session — shifting every real session id for the key.
    val withNull = Seq(
      (9L, 1L, Option(ts("2024-01-01 10:00:00"))),
      (9L, 2L, Option.empty[java.sql.Timestamp]),
      (9L, 3L, Option(ts("2024-01-01 12:00:00"))))
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessionizeSeconds(
      withNull, Seq("user_id"), "ts", 1800, Seq("event_id"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(!out.contains(2L), "NULL-ts row must be dropped")
    assert(out(1L) === 1L && out(3L) === 2L,
      "real rows keep their un-shifted session ids")
  }

  test("both windows and the session aggregate share one shuffle") {
    val agg = sessions.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
    val physical = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges === 1,
      s"expected a single hash exchange (windows + agg co-partitioned), got $exchanges:\n$physical")
  }
}
