package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_select(hashes, w)`: the winnowing window-minimum selection
  * (Schleimer/Wilkerson/Aiken) over an array of gram-hash strings —
  * for each of the `m - w + 1` windows of `w` consecutive hashes, the
  * RIGHTMOST minimal hash; returns the distinct selected entries as
  * `array<struct<p int, h string>>` in first-selected order.
  *
  * Why a native expression: the same selection as nested SQL HOFs
  * (`transform` + `aggregate` folds) pays interpreted-expression overhead
  * per window STEP — measured ~130 µs per window, turning a corpus pass
  * into minutes. Here the whole selection is one O(m*w) Scala loop over
  * UTF8String comparisons (~µs per row). `CodegenFallback` is deliberate:
  * the cost IS the loop, which is already native — emitting Java for the
  * struct-array construction would buy nothing measurable.
  *
  * Inputs shorter than `w` yield an empty array (too short to
  * fingerprint); null input yields null. Ties select the later position
  * (`<=`), matching the published algorithm and the DuckDB oracle fold.
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 2, s"w must be >= 2, got $w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("h", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[Integer]()
    var j = 0
    while (j <= m - w) {
      var bestP = j
      var bestH = hs.getUTF8String(j)
      var i = j + 1
      while (i < j + w) {
        val h = hs.getUTF8String(i)
        if (h.compareTo(bestH) <= 0) { bestH = h; bestP = i }
        i += 1
      }
      seen.add(bestP)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) {
      val p = it.next().intValue()
      // 1-based position, matching the SQL formulation and the oracle
      out(idx) = InternalRow(p + 1, hs.getUTF8String(p))
      idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowFunctions {
  /** Column form of [[WinnowSelect]]. */
  def winnow_select(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(hashes), w))
}
