package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index of two bucket ordinals — the alternative
  * space-filling clustering key to [[ZOrder]].
  *
  * Why offer both: Morton (z-order) interleaving has "seams" — adjacent
  * cells across a quadrant boundary can be 2^k apart along the key, so a
  * range of z-values occasionally spans far-apart rectangles and a file
  * sorted by z covers a ragged region. The Hilbert curve visits every
  * cell of the 2^bits x 2^bits grid in a Hamiltonian path (consecutive
  * keys are ALWAYS grid-adjacent), which tightens per-file bounding boxes
  * and therefore zone-map pruning on both columns; the trade is a
  * state-machine per level instead of pure bit-shuffling. Public
  * algorithm (the classic xy2d rotation loop).
  *
  * Inputs are masked into the grid (`v & (2^bits - 1)`); feed
  * [[ZOrder.scaledBucket]] ordinals for real columns. O(bits) integer
  * loop per row, whole-stage codegen'd.
  */
case class HilbertD2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_d2 expects bigint inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.hilbertRef(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry"); val nx = ctx.freshName("nx")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (int $i = ${bits - 1}; $i >= 0; $i--) {
         |  long $s = 1L << $i;
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $nx = ($rx == 1L) ? ($s - 1L - $y) : $y;
         |    $y = ($rx == 1L) ? ($s - 1L - $x) : $x;
         |    $x = $nx;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertD2 =
    copy(left = newLeft, right = newRight)
}

object HilbertCurve {

  val DefaultBits = 16

  private val Pattern = """hilbert\(([^)]+)\)""".r

  /** The inner columns of a `"hilbert(a, b)"` sort-field name; None for
    * plain column names. Exactly two columns (the d=2 curve); the string
    * form rides in [[graft.meta.SortField]] like zorder's does. */
  def columnsOf(sortColumn: String): Option[Seq[String]] = sortColumn match {
    case Pattern(inner) =>
      val cols = inner.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(cols.size == 2, s"hilbert(...) takes exactly 2 columns, got $cols")
      Some(cols)
    case _ => None
  }

  def sortField(a: String, b: String): String = s"hilbert($a, $b)"

  /** Column form of [[HilbertD2]] over two bigint bucket columns. */
  def hilbertD2(x: Column, y: Column, bits: Int = DefaultBits): Column =
    ColumnBridge.column(HilbertD2(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))

  /** The full Hilbert key for two (column, domain) specs — zorder's
    * [[ZOrder.zvalue]] twin: stats-scaled bucket ordinals, then the curve
    * index. */
  def hvalue(xSpec: (Column, (BigDecimal, BigDecimal)),
      ySpec: (Column, (BigDecimal, BigDecimal)), bits: Int = DefaultBits): Column =
    hilbertD2(
      ZOrder.scaledBucket(xSpec._1, xSpec._2._1, xSpec._2._2, bits),
      ZOrder.scaledBucket(ySpec._1, ySpec._2._1, ySpec._2._2, bits), bits)

  /** Driver-side reference implementation (spec oracle + interpreted
    * eval): the classic xy2d loop, top bit down. */
  def hilbertRef(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask; var y = y0 & mask
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) s - 1L - y else y
        y = if (rx == 1L) s - 1L - x else x
        x = nx
      }
      i -= 1
    }
    d
  }

  /** Inverse curve walk (d -> cell), for the Hamiltonian-path spec. */
  def d2xyRef(d0: Long, bits: Int): (Long, Long) = {
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
}
