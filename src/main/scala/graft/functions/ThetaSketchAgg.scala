package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.ThetaSketch

/** `theta_sketch(col)`: a Catalyst aggregate building the
  * [[graft.meta.ThetaSketch]] distinct-value sketch of a column — the
  * NDV statistic Iceberg's `apache-datasketches-theta-v1` Puffin blob
  * carries. A `TypedImperativeAggregate` keeps the SCAN vectorized and
  * inside whole-stage codegen (only the aggregate update is interpreted
  * — the previous `df.rdd.mapPartitions` pass de-vectorized the whole
  * read and paid Row deserialization on every column); partial
  * aggregation ships one bounded sketch per partition, so the driver
  * merge stays KBs regardless of table size, and sketches are mergeable
  * by construction — which is what makes ANALYZE incrementally
  * maintainable ([[graft.meta.NdvStats.analyze]] unions per-append
  * sketches instead of rescanning).
  *
  * Value encoding matches Iceberg's single-value binary rules (ints and
  * dates promote to long, timestamps hash their micros, strings UTF-8,
  * decimals the unscaled big-endian bytes, booleans one byte) — the
  * same domain [[graft.meta.NdvStats]] has always hashed, so sketches
  * from this aggregate are BIT-IDENTICAL to the old Row-pass ones. */
case class ThetaSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ThetaSketch = ThetaSketch.empty()

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | StringType |
         BooleanType => TypeCheckResult.TypeCheckSuccess
    case d: DecimalType if d.precision <= 38 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch does not support $t (no Iceberg single-value encoding)")
  }

  override def update(buffer: ThetaSketch, input: InternalRow): ThetaSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType | DateType => buffer.updateLong(v.asInstanceOf[Int].toLong)
      case LongType | TimestampType => buffer.updateLong(v.asInstanceOf[Long])
      case StringType => buffer.updateBytes(v.asInstanceOf[UTF8String].getBytes)
      case BooleanType =>
        buffer.updateBytes(Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0))
      case _: DecimalType => buffer.updateBytes(
        v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue.toByteArray)
      case _ => ()
    }
    buffer
  }

  override def merge(buffer: ThetaSketch, input: ThetaSketch): ThetaSketch =
    buffer.merge(input)

  override def eval(buffer: ThetaSketch): Any = buffer.serialize

  override def serialize(buffer: ThetaSketch): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): ThetaSketch =
    ThetaSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

object ThetaSketchAgg {
  /** Column form: `theta_sketch(c)` as an aggregate expression. */
  def theta_sketch(c: Column): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c)).toAggregateExpression())
}

/** `theta_estimate(bin)`: the distinct-value estimate of a serialized
  * theta sketch (the binary `theta_sketch` emits, or any
  * `apache-datasketches-theta-v1` compact blob). Evaluated once per
  * aggregated row — interpreter fallback is fine off the hot path. */
case class ThetaEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects a serialized theta sketch (binary), got $t")
  }
  override def nullSafeEval(v: Any): Any =
    ThetaSketch.deserialize(v.asInstanceOf[Array[Byte]]).estimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}
