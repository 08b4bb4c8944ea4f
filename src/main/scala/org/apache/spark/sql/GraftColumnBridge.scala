package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private-API bridge: Spark 4 made `Column` opaque
  * (ColumnNode-backed) and gated Expression↔Column conversion behind
  * `private[sql] classic.ExpressionUtils`. Custom Catalyst expressions
  * (graft.functions.DotProductF) need exactly this pair of conversions —
  * the same hook third-party Spark extensions use. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
