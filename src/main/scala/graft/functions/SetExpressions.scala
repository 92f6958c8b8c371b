package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** `jaccard_ge(a, b, t)`: true iff the Jaccard similarity of two SORTED
  * long arrays (distinct-element sets) is >= t.
  *
  * Built for use INSIDE a join condition: evaluating the whole test there
  * means candidate pairs that fail never materialize a joined row, so the
  * (potentially large) set arrays are never copied into join output — the
  * cost that made a naive `size(array_intersect(...))` post-join projection
  * an order of magnitude slower. The intersection is a branch-light sorted
  * merge in generated code; `array_intersect` by contrast builds a hash set
  * per evaluation.
  *
  * Membership decisions are bit-identical to a SQL oracle computing
  * `CAST(c AS DOUBLE) / (n1 + n2 - c) >= t`: same IEEE division, same
  * comparison. The length pre-test (J <= min/max) only ever skips the merge
  * with a 1e-6 slack, so it cannot flip a boundary pair. The merge loop
  * carries a positional early exit: `need` is the smallest intersection
  * count whose FINAL double test passes (found by evaluating that exact
  * test, so it is decision-identical by the monotonicity of correctly
  * rounded division), and the loop stops once even matching every
  * remaining element cannot reach it — on failing candidates, the common
  * case, this cuts the scan to the fraction the threshold leaves open.
  */
case class SortedJaccardGe(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_ge expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    if (n1 < threshold * n2 - 1e-6 || n2 < threshold * n1 - 1e-6) return false
    // smallest intersection count whose FINAL double test passes — found
    // by evaluating that exact test, so the positional early exit below
    // can only fire when the final test provably returns false (the
    // division is correctly rounded, hence monotone in c)
    var need = math.ceil(threshold * (n1 + n2) / (1 + threshold)).toLong
    while (need > 0 && (need - 1).toDouble / (n1 + n2 - (need - 1)) >= threshold) need -= 1
    while (need.toDouble / (n1 + n2 - need) < threshold) need += 1
    var i = 0; var j = 0; var c = 0L
    while (i < n1 && j < n2) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else {
        if (xi < yj) i += 1 else j += 1
        // positional filter, tested only on a mismatch advance (a match
        // never lowers the attainable count): even matching every
        // remaining element cannot reach `need` — the candidate fails
        if (n1 - i < need - c || n2 - j < need - c) return false
      }
    }
    c.toDouble / (n1 + n2 - c) >= threshold
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = threshold.toString
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val need = ctx.freshName("need")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |${ev.value} = false;
         |if (!($n1 < $t * $n2 - 1e-6 || $n2 < $t * $n1 - 1e-6)) {
         |  long $need = (long) java.lang.Math.ceil($t * ($n1 + $n2) / (1 + $t));
         |  while ($need > 0 && ((double) ($need - 1)) / ($n1 + $n2 - ($need - 1)) >= $t) { $need--; }
         |  while (((double) $need) / ($n1 + $n2 - $need) < $t) { $need++; }
         |  int $i = 0; int $j = 0; long $c = 0L;
         |  while ($i < $n1 && $j < $n2) {
         |    long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $c++; $i++; $j++; }
         |    else {
         |      if ($xi < $yj) { $i++; } else { $j++; }
         |      if ($n1 - $i < $need - $c || $n2 - $j < $need - $c) break;
         |    }
         |  }
         |  ${ev.value} = ((double) $c) / ($n1 + $n2 - $c) >= $t;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccardGe =
    copy(left = newLeft, right = newRight)
}

/** `containment_ge(a, b, t)`: true iff |A∩B| / |A| >= t for two SORTED
  * long arrays — the ASYMMETRIC set-overlap measure (Broder containment).
  *
  * Where Jaccard scores symmetric near-duplication, containment detects a
  * short document (quote, excerpt, boilerplate block) living INSIDE a
  * longer one: the denominator is only the left set's size, so a 50-gram
  * doc fully present in a 5000-gram doc scores 1.0 (its Jaccard would be
  * ~0.01 and invisible). Same design as [[SortedJaccardGe]]: evaluated
  * inside the join condition, branch-light sorted merge, bit-identical to
  * a SQL oracle computing `n1 > 0 AND CAST(c AS DOUBLE) / n1 >= t` (same
  * IEEE division and comparison). The size pre-test skips the merge only
  * when even a full overlap could not reach t (with 1e-6 slack, so it
  * cannot flip a boundary pair); empty left sets are defined non-contained
  * in both engines (`n1 > 0` guard rather than 0/0). Same positional
  * early exit as [[SortedJaccardGe]]: decision-identical by construction,
  * and at t = 0.9 a failing candidate scans ~10% of the contained set
  * instead of all of it.
  */
case class SortedContainmentGe(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"containment_ge expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    if (n1 == 0 || n2 < threshold * n1 - 1e-6) return false
    // smallest intersection count whose FINAL double test passes (same
    // construction as [[SortedJaccardGe]]): the positional early exit can
    // only fire when the final test provably returns false
    var need = math.ceil(threshold * n1).toLong
    while (need > 0 && (need - 1).toDouble / n1 >= threshold) need -= 1
    while (need.toDouble / n1 < threshold) need += 1
    var i = 0; var j = 0; var c = 0L
    while (i < n1 && j < n2) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else {
        if (xi < yj) i += 1 else j += 1
        if (n1 - i < need - c || n2 - j < need - c) return false
      }
    }
    c.toDouble / n1 >= threshold
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = threshold.toString
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val need = ctx.freshName("need")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |${ev.value} = false;
         |if ($n1 > 0 && !($n2 < $t * $n1 - 1e-6)) {
         |  long $need = (long) java.lang.Math.ceil($t * $n1);
         |  while ($need > 0 && ((double) ($need - 1)) / $n1 >= $t) { $need--; }
         |  while (((double) $need) / $n1 < $t) { $need++; }
         |  int $i = 0; int $j = 0; long $c = 0L;
         |  while ($i < $n1 && $j < $n2) {
         |    long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $c++; $i++; $j++; }
         |    else {
         |      if ($xi < $yj) { $i++; } else { $j++; }
         |      if ($n1 - $i < $need - $c || $n2 - $j < $need - $c) break;
         |    }
         |  }
         |  ${ev.value} = ((double) $c) / $n1 >= $t;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedContainmentGe =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  /** codegen'd Jaccard >= t test over sorted array<bigint> set columns. */
  def jaccard_ge(a: Column, b: Column, threshold: Double): Column =
    ColumnBridge.column(SortedJaccardGe(
      ColumnBridge.expression(a), ColumnBridge.expression(b), threshold))

  /** codegen'd containment (|A∩B|/|A|) >= t test over sorted array<bigint>
    * set columns — left is the candidate CONTAINED set. */
  def containment_ge(a: Column, b: Column, threshold: Double): Column =
    ColumnBridge.column(SortedContainmentGe(
      ColumnBridge.expression(a), ColumnBridge.expression(b), threshold))
}
