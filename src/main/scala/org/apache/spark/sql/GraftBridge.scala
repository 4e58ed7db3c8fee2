package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `sql`-private Expression ⇄ Column conversions so graft's
  * custom catalyst expressions (graft.plans.*) can be used through the
  * public Column API. Same approach Spark extension libraries use.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
