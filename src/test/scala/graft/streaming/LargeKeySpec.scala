package graft.streaming

import java.sql.Timestamp

import graft.SharedSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stress + edge coverage for [[StreamingEventStats.sessionizeWithState]]:
  * the documented per-key-per-batch memory contract (one key's events for
  * one micro-batch are sorted in executor memory) at 100k events, and the
  * watermark clamp on the timeout (a batch whose sessions are already
  * behind the watermark must emit on the next batch, not throw).
  */
class LargeKeySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ev(uid: Long, ts: String, v: Double = 1.0) =
    StreamingEventStats.UserEvent(uid, Timestamp.valueOf(ts), v)

  test("100k events on ONE key in one batch sessionize within the documented bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingEventStats.UserEvent]
    val events = mem.toDS().withWatermark("ts", "0 seconds")
    val q = StreamingEventStats.sessionizeWithState(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("large_key_sessions")
      .outputMode("append").start()

    // one pathological key: 50k events 1 s apart, a >30-min gap, then 50k
    // more — delivered SHUFFLED so the per-batch sort is actually load-bearing
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val half = 50000
    val gapMs = 3600L * 1000L // 1 h between the two runs
    val all = (0 until half).map(i =>
      StreamingEventStats.UserEvent(1L, new Timestamp(base + i * 1000L), 1.0)) ++
      (0 until half).map(i =>
        StreamingEventStats.UserEvent(1L,
          new Timestamp(base + half * 1000L + gapMs + i * 1000L), 1.0))
    mem.addData(new scala.util.Random(11).shuffle(all))
    q.processAllAvailable()
    // a later event on another key pushes the watermark past the trailing
    // session's end, timing it out
    mem.addData(ev(2L, "2024-03-02 12:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2L, "2024-03-03 12:00:00"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("large_key_sessions")
      .as[StreamingEventStats.SessionOut].collect()
      .filter(_.userId == 1L).sortBy(_.start.getTime)
    assert(out.length == 2, s"expected both halves as sessions, got ${out.length}")
    assert(out(0).nEvents == half && out(0).totalValue == half.toDouble &&
      out(0).start.getTime == base,
      s"first session wrong: ${out(0)}")
    assert(out(1).nEvents == half &&
      out(1).start.getTime == base + half * 1000L + gapMs,
      s"second session wrong: ${out(1)}")
  }

  test("a batch entirely behind the watermark cannot fail the query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingEventStats.UserEvent]
    val events = mem.toDS().withWatermark("ts", "0 seconds")
    val q = StreamingEventStats.sessionizeWithState(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("late_batch_sessions")
      .outputMode("append").start()

    // batch 1: a clock event drives the watermark to 12:00
    mem.addData(ev(9L, "2024-03-01 12:00:00"))
    q.processAllAvailable()
    // batch 2: key 5's events are ALL before the watermark. On this Spark
    // version the stateful-operator late-event filter drops them before
    // they reach the function (verified below: no session, no state), so
    // the ADVICE scenario — a bare setTimeoutTimestamp at last+gap <=
    // watermark throwing and killing the query — is unreachable today.
    // The clamp in sessionizeWithState keeps the operator safe on
    // versions/behaviors where late rows DO reach the function; either
    // way this batch must not fail the query.
    mem.addData(
      ev(5L, "2024-03-01 10:00:00", 2.0),
      ev(5L, "2024-03-01 10:05:00", 3.0))
    q.processAllAvailable()
    assert(q.isActive, "late-only batch must not fail the query")
    // two more watermark advances: if any state HAD been created for key 5
    // its (clamped) timeout would fire and emit here
    mem.addData(ev(9L, "2024-03-01 12:30:00"))
    q.processAllAvailable()
    mem.addData(ev(9L, "2024-03-01 13:30:00"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("late_batch_sessions")
      .as[StreamingEventStats.SessionOut].collect().filter(_.userId == 5L)
    assert(out.isEmpty,
      s"fully-late rows are dropped by the late-event filter, so no session: ${out.mkString(", ")}")
  }
}
