package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.Puffin

/** Deletion-vector probe: the v3 read path's replacement for the
  * position-delete anti join (reference anti-join SQL at
  * core/src/executor/datafusion/datafusion_processor.rs:489-522).
  *
  * The lookup holds the SERIALIZED blob bytes (small, compressed roaring
  * bitmaps) so the expression ships compactly in the task binary; each
  * executor decodes once per task via the transient lazy map. The probe
  * itself is O(1) bitmap containment inside whole-stage codegen — no join,
  * no shuffle, no broadcast exchange. Callers gate on total blob bytes
  * before choosing this plan ([[graft.exec.Mor]]).
  */
final class DvLookup(val blobs: Map[String, Array[Byte]]) extends Serializable {
  @transient private lazy val bitmaps: java.util.HashMap[String, Puffin.PositionBitmap] = {
    val m = new java.util.HashMap[String, Puffin.PositionBitmap](blobs.size * 2)
    blobs.foreach { case (file, bytes) => m.put(file, Puffin.decodeDvBlob(bytes)) }
    m
  }
  def contains(file: UTF8String, pos: Long): Boolean = {
    val b = bitmaps.get(file.toString)
    b != null && b.contains(pos)
  }
}

/** true iff the deletion vector for `file` marks `pos` deleted; false for
  * files without a DV. Null inputs yield null (cannot happen on the MOR
  * path — `_metadata` columns are non-null — but keeps the expression
  * honest standalone). */
case class DvContains(left: Expression, right: Expression, lookup: DvLookup)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dv_contains expects (string, bigint), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(file: Any, pos: Any): Any =
    lookup.contains(file.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvLookup].getName)
    nullSafeCodeGen(ctx, ev, (file, pos) => s"${ev.value} = $ref.contains($file, $pos);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvContains =
    copy(left = newLeft, right = newRight)
}

object DvExpressions {
  /** Column form: `dv_contains(file, pos)` against the given blob map
    * (data-file path -> deletion-vector-v1 blob bytes). */
  def dvContains(file: Column, pos: Column, blobs: Map[String, Array[Byte]]): Column =
    ColumnBridge.column(DvContains(
      ColumnBridge.expression(file), ColumnBridge.expression(pos), new DvLookup(blobs)))
}
