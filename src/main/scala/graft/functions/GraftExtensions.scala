package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing the native functions to SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions). ...
  * // or spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * For an already-running session, [[GraftExtensions.register]] installs
  * the same functions into its registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDotDescriptor)
  }
}

object GraftExtensions {
  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
    VecDot(exprs.head, exprs(1))
  }

  private[functions] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    build
  )

  /** Installs the functions into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "built-in")
}
