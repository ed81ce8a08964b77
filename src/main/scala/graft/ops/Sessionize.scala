package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a key's events into sessions, where a
  * new session starts whenever the gap to the previous event exceeds a
  * threshold — the standard event-pipeline primitive (user sessions,
  * machine bursts, conversation turns) that SQL engines express with the
  * lag-then-running-sum window idiom.
  *
  * Scale design: both windows (the `lag` gap probe and the running sum
  * that numbers sessions) share the SAME partitioning and ordering, so
  * Catalyst plans them over ONE Exchange + one Sort — a single shuffle
  * of the input keyed by the session keys, regardless of row count. A
  * downstream `groupBy(keys :+ session_id)` introduces no further
  * shuffle either: hash-partitioning on the keys already co-locates
  * every (key, session) group, and Catalyst recognizes the subset
  * partitioning as satisfying the aggregation's clustering requirement
  * (regression-guarded in PlanAuditSpec). Gap arithmetic is integer
  * microseconds end to end — no double rounding at DST-sized gaps.
  */
object Sessionize {

  /** Append a 1-based `sessionId` column per key group.
    *
    * A row opens a new session iff it is the key's first row (in
    * `tsCol`, then `tieBreakCols` order) or its timestamp is more than
    * `gapMicros` after the previous row's. A gap of exactly `gapMicros`
    * stays in the session (strict `>`), matching the half-open interval
    * semantics of SQL `ts - lag(ts) > INTERVAL g`.
    *
    * @param keyCols      session scope (e.g. user id)
    * @param tsCol        event-time timestamp column
    * @param gapMicros    inactivity threshold in microseconds
    * @param tieBreakCols extra ordering columns making the sort total
    *                     when timestamps can tie (e.g. an event id) —
    *                     without one, tied rows could permute across
    *                     runs and flip which row carries the break
    * @param sessionCol   name of the appended session-number column
    */
  def sessionize(df: DataFrame,
                 keyCols: Seq[String],
                 tsCol: String,
                 gapMicros: Long,
                 tieBreakCols: Seq[String] = Nil,
                 sessionCol: String = "session_id"): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs at least one key column")
    require(gapMicros > 0, "gapMicros must be positive")
    // A NULL event time has no position in a gap sequence. Left in, Spark
    // sorts it first ascending, so each NULL row would read prev as NULL
    // and open a phantom session, shifting every real session id for the
    // key (and DuckDB, which sorts nulls LAST, would disagree). Mirror
    // AsofJoin's rule: NULL-ts rows are dropped up front.
    val valid = df.filter(col(tsCol).isNotNull)
    val order = (tsCol +: tieBreakCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val ts = unix_micros(col(tsCol))
    val prev = lag(ts, 1).over(w)
    val opens = when(prev.isNull || ts - prev > gapMicros, 1L).otherwise(0L)
    valid.withColumn(
      sessionCol,
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Convenience: threshold in whole seconds. */
  def sessionizeSeconds(df: DataFrame, keyCols: Seq[String], tsCol: String,
                        gapSeconds: Long, tieBreakCols: Seq[String] = Nil,
                        sessionCol: String = "session_id"): DataFrame =
    sessionize(df, keyCols, tsCol, gapSeconds * 1000000L, tieBreakCols, sessionCol)
}
