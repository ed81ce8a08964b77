package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregations over the `events` shape
  * (ts, user_id, event_type, value) — watermarked windowed aggregation
  * and custom per-key state, the two Structured Streaming patterns a
  * continuous analytics surface needs (extension; the reference is
  * batch-only).
  */
object StreamingEventStats {

  /** Watermarked tumbling-window counts per event type. Late rows beyond
    * `watermark` are dropped and their windows finalized — append-mode
    * emits each window exactly once, when the watermark passes its end. */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** First-arrival deduplication with BOUNDED state — the production
    * path q50's plain `dropDuplicates` comment points at: a key's state
    * entry lives only until the event-time watermark passes the key's
    * first-seen timestamp plus `delay`. Duplicates arriving inside that
    * horizon are dropped; after it the entry is EVICTED (plain
    * dropDuplicates state grows with the distinct-key count forever — a
    * non-starter for churning keys at 100 TB/day), so a key re-appearing
    * later is emitted again. Downstream must be idempotent on key —
    * exactly the contract of a keyed upsert sink. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String, delay: String): DataFrame = {
    require(keyCols.nonEmpty, "dedupWithinWatermark needs at least one key column")
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Running per-user state maintained with mapGroupsWithState. */
  case class UserState(userId: Long, nEvents: Long, totalValue: Double,
                       lastTs: java.sql.Timestamp)
  case class UserEvent(userId: Long, ts: java.sql.Timestamp, value: Double)

  /** Custom keyed state: running event count / value sum / last-seen
    * timestamp per user, updated per micro-batch via
    * `mapGroupsWithState` (processing-time timeout left off — state
    * lives for the query's lifetime; a TTL would bound it in prod). */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(
            UserState(userId, 0L, 0.0, new java.sql.Timestamp(0L)))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserState(userId, acc.nEvents + 1, acc.totalValue + e.value,
              if (e.ts.after(acc.lastTs)) e.ts else acc.lastTs)
          }
          state.update(next)
          next
      }
  }

  /** The output mode [[runningUserStats]] requires. */
  val RunningStatsOutputMode: OutputMode = OutputMode.Update()

  /** One emitted closed session. */
  case class SessionOut(userId: Long, start: java.sql.Timestamp,
                        nEvents: Long, totalValue: Double)
  /** Per-key open-session state, microsecond timestamps. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, total: Double)

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Gap sessionization as CUSTOM keyed state: the same semantics as the
    * built-in `session_window` path (break at gap >= `gapMinutes`,
    * exclusive end), but via `flatMapGroupsWithState` + event-time
    * timeout — sessions closed by an in-batch gap emit immediately, the
    * key's trailing session stays in state with a timeout at
    * last + gap and emits when the watermark passes it. One state entry
    * per ACTIVE key, evicted on emission — the custom-state pattern for
    * when the built-in operator's shape (fixed gap, simple aggs) isn't
    * enough. q59 verifies it against the SAME oracle as q57. */
  def sessionizeWithState(events: Dataset[UserEvent],
                          gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, fromMicros(s.startUs), s.n, s.total))
          } else {
            val closed = scala.collection.mutable.ListBuffer[OpenSession]()
            var cur = state.getOption.orNull
            // CONTRACT: one key's events for ONE micro-batch are sorted in
            // executor memory (Spark hands them as an unordered iterator; gap
            // sessionization needs time order). The bound is per-key-per-batch
            // — ~48 bytes/event — NOT per-key-lifetime: state keeps only the
            // one open session between batches. A single key would need
            // hundreds of millions of events in a single batch to matter;
            // callers with such a key should pre-aggregate or bound the
            // trigger size. LargeKeySpec exercises 100k events on one key.
            rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
              val t = micros(e.ts)
              if (cur == null) cur = OpenSession(t, t, 1L, e.value)
              else if (t - cur.lastUs >= gapUs) {
                closed += cur; cur = OpenSession(t, t, 1L, e.value)
              } else cur = OpenSession(cur.startUs, t, cur.n + 1, cur.total + e.value)
            }
            state.update(cur)
            // fires once the event-time watermark passes the session end.
            // DEFENSIVE CLAMP: if a batch's events for a key all satisfied
            // last+gap <= watermark, a bare setTimeoutTimestamp would throw
            // (timeout must exceed the watermark) and fail the query. On
            // this Spark version the stateful-operator late-event filter
            // drops such rows before they reach the function (LargeKeySpec
            // pins that), but that filter is version-dependent — the clamp
            // keeps the operator safe either way, emitting an already-
            // expired session at the next watermark advance instead.
            val target = (cur.lastUs + gapUs) / 1000L
            state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1L, target))
            closed.iterator.map(s =>
              SessionOut(uid, fromMicros(s.startUs), s.n, s.total))
          }
      }
  }
}
