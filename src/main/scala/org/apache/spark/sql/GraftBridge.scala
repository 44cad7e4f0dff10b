package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge for graft's native expressions.
  * `classic.ExpressionUtils` is private[sql], so this one-liner lives in
  * the sql package — the standard pattern for out-of-tree Catalyst
  * extensions that construct Columns from custom Expressions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
