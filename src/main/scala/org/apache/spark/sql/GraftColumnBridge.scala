package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression conversions, so
  * graft's native Catalyst expressions (graft.expressions.*) can be used
  * as plain `Column`s on ANY session — including the driver's, which
  * builds its own SparkSession without extension hooks. The expressions
  * travel inside the plan; no function registration is required. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only releases entries in the cache
    * manager; a local checkpoint lives as a persisted RDD inside the
    * plan's `LogicalRDD`, which this walks to. After release the frame
    * CANNOT be recomputed (checkpointing truncated its lineage), so only
    * call once results are materialized. */
  def unpersistCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
