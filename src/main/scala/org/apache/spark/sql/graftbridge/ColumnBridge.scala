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

  /** Spark 4 moved `cloneSession()` off the public SparkSession interface
    * onto the classic implementation; session-scoped conf (e.g. parquet
    * field-id reads) needs it. */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** DataFrame over a logical plan (`Dataset.ofRows` went `private[sql]`
    * with the classic/connect split). The SQL front door's INSERT command
    * needs it to execute the parsed source query. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
