package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters — the
  * supported seam for extension libraries that define native Catalyst
  * expressions (Spark 4 moved the Column(expr) constructor behind
  * `classic.ExpressionUtils`). */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
