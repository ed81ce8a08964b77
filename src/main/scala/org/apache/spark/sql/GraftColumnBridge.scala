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

  /** Re-tag a batch DataFrame's relation leaves as streaming. The DSv1
    * `Source.getBatch` contract requires the returned plan to carry
    * `isStreaming = true` (MicroBatchExecution asserts it); built-in
    * DSv1 sources satisfy it by constructing their batch relations with
    * the flag set (Spark's FileStreamSource builds
    * `LogicalRelation(..., isStreaming = true)`), which is exactly what
    * this does after the fact for a frame built through the normal
    * reader. Handles the two leaf shapes graft change-frames produce:
    * parquet scans (LogicalRelation, possibly several under a Union for
    * multi-root clones) and the empty-batch frame (LogicalRDD). */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, LogicalPlan}
    def retag(plan: LogicalPlan): LogicalPlan = plan match {
      case j: Join if j.joinType == LeftAnti =>
        // deletion-vector sidecars are applied as a LeftAnti against a
        // broadcast dv scan (VersionedTable.readFileEntries): the dv
        // side must STAY a batch relation — stream-STATIC left-anti is
        // a supported streaming join, stream-stream left-anti is not
        j.copy(left = retag(j.left))
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
        if !lr.isStreaming => lr.copy(isStreaming = true)
      case rdd: org.apache.spark.sql.execution.LogicalRDD
        if !rdd.isStreaming && rdd.rdd.partitions.isEmpty =>
        // the empty-batch frame: an empty streaming LocalRelation with
        // the same output is the identical relation, flag included
        LocalRelation(rdd.output, Seq.empty, isStreaming = true)
      case other => other.mapChildren(retag)
    }
    classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession],
      retag(df.queryExecution.analyzed))
  }

  /** The inverse direction, for SINKS: re-materialize a micro-batch's
    * streaming-planned frame as a writable batch frame. A sink's
    * `addBatch` receives a frame carrying the incremental execution's
    * plan, which batch writers refuse ("must be executed with
    * writeStream.start()"); wrapping the already-planned physical RDD in
    * a fresh batch frame is how built-in and Delta sinks hand the data
    * to their writers. The RDD is the executed plan's output — no
    * recomputation of upstream state. */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val s = df.sparkSession.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** Unload every cached state-store provider (`StateStore.unloadAll`
    * is `private[sql]`, hence the bridge). A terminated streaming query
    * leaves its executor-side providers — and their in-memory version
    * maps — in the load cache until the maintenance thread notices the
    * deactivation, up to a minute later; a caller that has fully
    * consumed a drained query's output releases that state immediately,
    * the same way it unpersists caches. The next streaming query
    * re-loads providers on demand (and restarts maintenance), so this
    * is always safe between queries. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
