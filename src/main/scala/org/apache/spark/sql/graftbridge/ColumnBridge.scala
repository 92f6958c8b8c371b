package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 moved the conversion
  * behind `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils,
  * columnNodeSupport.scala); custom native expressions still need it, so
  * this shim lives in the sql namespace. No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
