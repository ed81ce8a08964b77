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
}
