package org.apache.spark

import org.apache.hadoop.conf.Configuration

/** Bridge to Spark's `private[spark]` utilities needed by graft's table
  * layer. Hadoop `Configuration` is not `java.io.Serializable`, so a job
  * that reads parquet footers ON EXECUTORS must ship the conf through
  * Spark's own [[org.apache.spark.util.SerializableConfiguration]]
  * (Kryo/Java-serializable wrapper) — which is `private[spark]`; this
  * object exposes it as a serializable factory closure instead of the
  * private type. */
object GraftSparkBridge {

  /** A serializable thunk yielding the wrapped Hadoop conf on executors. */
  def confFactory(conf: Configuration): (() => Configuration) =
    new ConfThunk(new org.apache.spark.util.SerializableConfiguration(conf))

  private class ConfThunk(sc: org.apache.spark.util.SerializableConfiguration)
      extends (() => Configuration) with Serializable {
    override def apply(): Configuration = sc.value
  }

  /** Block until the listener bus has delivered every queued event —
    * needed by measurement code that reads task InputMetrics accumulated
    * through a SparkListener right after an action returns (the bus is
    * async; without the drain the last tasks' metrics race the read).
    * `SparkContext.listenerBus` is `private[spark]`, hence the bridge. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Synchronously delete the shuffle files of every completed shuffle.
    * Spark frees shuffle disk only when the ShuffleDependency is GC'd
    * AND the async ContextCleaner drains its reference queue — under a
    * benchmark loop that runs the same multi-exchange operator
    * back-to-back, that cleanup lags reps by minutes and the leaked
    * files accumulate ~5 GB per rep until the disk quota kills a later
    * rep (spill "No space left on device" with 40+ GB of dead shuffle
    * files on disk). Measurement harnesses call this BETWEEN reps,
    * after dropping every reference to the previous rep's frames: a
    * cleaned shuffle cannot be re-read, so this must never run while a
    * plan that might reuse one is still live. `MapOutputTrackerMaster.
    * shuffleStatuses` and `ContextCleaner.doCleanupShuffle` are
    * `private[spark]`, hence the bridge. */
  def cleanAllShuffles(sc: SparkContext): Unit = {
    val tracker = sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m
      case _ => return
    }
    val ids = tracker.shuffleStatuses.keys.toSeq
    sc.cleaner.foreach { c =>
      ids.foreach(id => c.doCleanupShuffle(id, blocking = true))
    }
  }
}
