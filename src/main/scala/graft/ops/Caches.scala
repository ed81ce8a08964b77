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
  private val releases = scala.collection.mutable.ArrayBuffer[() => Unit]()

  /** Register an already-persisted frame for later release; returns it. */
  private[graft] def registered(df: DataFrame): DataFrame = synchronized {
    frames += df
    df
  }

  /** Register a custom release action — used for storage `unpersist`
    * can't reach, e.g. `localCheckpoint` blocks (released through
    * `GraftColumnBridge.unpersistCheckpoint`). */
  private[graft] def registeredRelease(f: () => Unit): Unit = synchronized {
    releases += f
  }

  /** Synchronously delete every COMPLETED shuffle's files — the staged-
    * pipeline hook behind `staged = true` operators (and measurement
    * harness rep loops). Spark otherwise frees shuffle disk only when
    * the ShuffleDependency is GC'd and the async ContextCleaner drains,
    * which lags a multi-stage pipeline by minutes; a 300×-scale op whose
    * stages all stay live inside one action exceeds a bounded disk
    * quota even though no single stage comes close. SAFETY CONTRACT: a
    * purged shuffle read again later triggers a full map-stage
    * recompute (correct but slow) — call only at a point where every
    * frame still to be executed reads from PERSISTED inputs, and never
    * while unrelated plans are running in the same session. */
  private[graft] def purgeShuffles(df: DataFrame): Unit =
    try org.apache.spark.GraftSparkBridge
      .cleanAllShuffles(df.sparkSession.sparkContext)
    catch { case NonFatal(_) => }

  /** Unpersist every registered frame (non-blocking), run registered
    * release actions, and clear. For plain persisted frames this is safe
    * at any point (release only costs recomputation); frames backed by a
    * local checkpoint (e.g. [[TextDedup.connectedComponents]] output)
    * cannot be recomputed after release, so materialize results first. */
  def releaseAll(): Unit = synchronized {
    frames.foreach { f => try f.unpersist(false) catch { case NonFatal(_) => } }
    frames.clear()
    releases.foreach { f => try f() catch { case NonFatal(_) => } }
    releases.clear()
  }
}
