package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made these conversions `private[sql]` (columnNodeSupport.scala),
  * so — like other Spark-native extension libraries — graft exposes them
  * through a subpackage of `org.apache.spark.sql`. This is the ONLY file
  * outside the `graft` namespace and contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
