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
}
