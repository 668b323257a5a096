package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for custom Catalyst expressions: Spark 4 made the
  * Column↔Expression converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils, columnNodeSupport.scala),
  * so the library's custom expressions route through this in-package shim. */
object ColumnInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
