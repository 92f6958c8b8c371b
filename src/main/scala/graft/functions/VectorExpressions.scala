package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding arithmetic.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product correctly but run interpreted (CodegenFallback with per-element
  * lambda dispatch) — measured ~10x slower than a fused loop on 64-dim
  * float vectors. This is the one place the engine genuinely needs a
  * custom `Expression` with `doGenCode`: a tight primitive loop inside
  * whole-stage codegen, no boxing, no lambda frames.
  *
  * Semantics match the HOF formulation exactly: elements are widened
  * float->double and accumulated left-to-right (same IEEE summation
  * order), so results are bit-identical to the previous implementation
  * and to the DuckDB oracle. That includes the degenerate cases —
  * `zip_with` pads a shorter array with nulls and `aggregate` propagates
  * them, so a length mismatch or a null element yields NULL here too
  * (not a silently truncated "plausible" number).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch / null elements, independent of input nullability
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    def get(e: Expression, arr: ArrayData, i: Int): Double =
      if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += get(left, x, i) * get(right, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(e: Expression, arr: String, i: String): String =
      if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(left, a, i)} * ${get(right, b, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two packed bit-code arrays (`array<bigint>`,
  * e.g. [[graft.ops.Similarity.binarySignCodes]] output): sum of
  * `Long.bitCount(a(i) ^ b(i))` in one fused loop. Semantics match the
  * HOF formulation `aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y)),
  * 0, (acc, d) -> acc + d)` exactly, including the degenerate cases: a
  * length mismatch or a null element yields NULL (zip_with pads with
  * nulls and aggregate propagates them), never a silently truncated
  * distance. */
case class VecHamming(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def dataType: DataType = IntegerType
  // null on length mismatch / null elements, independent of input nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_hamming expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecHamming =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** codegen'd dot product over array<float>/array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** codegen'd L2 norm. */
  def vec_norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** codegen'd Hamming distance over packed bit-code (`array<bigint>`)
    * columns. */
  def vec_hamming(a: Column, b: Column): Column =
    ColumnBridge.column(VecHamming(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
