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
}
