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
}
