package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 routes Column through ColumnNode; ExpressionUtils is the
  * supported classic-mode conversion). Lives under org.apache.spark.sql
  * solely to satisfy the package-private access — the standard pattern
  * for Spark extension libraries that define custom expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
