package graft.ops

import org.apache.spark.sql.DataFrame

import scala.util.control.NonFatal

/** Registry for persisted frames held by LAZY operators.
  *
  * Operators that return a lazy DataFrame but persist an intermediate
  * ([[Similarity.cosinePairsLsh]], [[TextDedup.minHashLshPairs]],
  * [[TextDedup.simHashPairs]]) cannot unpersist before the caller has
  * consumed the result — the cache must outlive the function call. They
  * register the persisted frame here; the caller (a job runner, Verify,
  * Bench, or a library user) calls [[releaseAll]] once the results are
  * materialized, so cached blocks never leak for the session's lifetime.
  *
  * Eager operators (e.g. the table MERGE) release their own caches in
  * try/finally instead and never appear here.
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Register an already-persisted frame for later release; returns it. */
  private[graft] def registered(df: DataFrame): DataFrame = synchronized {
    frames += df
    df
  }

  /** Unpersist every registered frame (non-blocking) and clear. Safe to
    * call at any point: releasing a cache a still-lazy plan depends on
    * only costs recomputation, never correctness. */
  def releaseAll(): Unit = synchronized {
    frames.foreach { f => try f.unpersist(false) catch { case NonFatal(_) => } }
    frames.clear()
  }
}
