package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg table-spec `truncate[W]` partition transform (public spec,
  * "Partition Transforms"): order-preserving width-W truncation —
  *
  *  - int/long: `v - (((v % W) + W) % W)` (floor to the next-lowest
  *    multiple of W, correct for negatives);
  *  - decimal: the same floor applied to the UNSCALED value (`scaled_W =
  *    decimal(W, scale(v))` in spec terms), scale preserved;
  *  - string: the first W Unicode CODE POINTS (valid UTF-8 by
  *    construction — never split mid-codepoint);
  *  - binary: the first W bytes.
  *
  * Result type = source type, which is what makes truncate values
  * value-addressable literals (unlike bucket ordinals) and
  * order-preserving (unlike hashes) — the property the pruning layer
  * exploits: all rows of a truncate[W] partition T lie in [T, T+W) /
  * the prefix interval of T. The reference consumes this transform via
  * iceberg-rust's transform enum (core/src/compaction/mod.rs partition
  * handling); tables partitioned with it are common on string/id keys.
  */
object IcebergTruncateUtil {
  def truncLong(v: Long, w: Int): Long = v - Math.floorMod(v, w.toLong)
  def truncInt(v: Int, w: Int): Int = v - Math.floorMod(v, w)
  def truncString(v: UTF8String, w: Int): UTF8String =
    if (v.numChars <= w) v else v.substring(0, w)
  def truncBinary(v: Array[Byte], w: Int): Array[Byte] =
    if (v.length <= w) v else java.util.Arrays.copyOf(v, w)
  def truncDecimal(v: Decimal, w: Int, precision: Int, scale: Int): Decimal = {
    val unscaled = v.toJavaBigDecimal.unscaledValue
    val rem = unscaled.mod(java.math.BigInteger.valueOf(w.toLong)) // mod is non-negative
    // precision here is the WIDENED result precision (source + 1): boundary
    // negatives floor past the source range and must still fit
    Decimal(new java.math.BigDecimal(unscaled.subtract(rem), scale), precision, scale)
  }
}

/** Catalyst expression form: static-call codegen body so truncate-
  * partitioned writes stay inside whole-stage codegen (same shape as
  * [[IcebergBucket]]). Null input -> null partition value. */
case class IcebergTruncate(child: Expression, width: Int) extends UnaryExpression {

  require(width > 0, s"truncate width must be positive, got $width")

  // decimals widen precision by 1 (capped): flooring a boundary negative
  // can need one more integer digit than the source declares (decimal(3,2)
  // -9.99 truncate 100 -> -10.00), and the spec transform is total — the
  // partition VALUE need not fit the column's declared precision
  override def dataType: DataType = child.dataType match {
    case d: DecimalType => DecimalType(math.min(d.precision + 1, 38), d.scale)
    case t => t
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | StringType | BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_truncate does not support $t (the Iceberg spec defines truncation for " +
          "int/long/decimal/string/binary)")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType => IcebergTruncateUtil.truncInt(v.asInstanceOf[Int], width)
    case LongType => IcebergTruncateUtil.truncLong(v.asInstanceOf[Long], width)
    case StringType => IcebergTruncateUtil.truncString(v.asInstanceOf[UTF8String], width)
    case BinaryType => IcebergTruncateUtil.truncBinary(v.asInstanceOf[Array[Byte]], width)
    case d: DecimalType =>
      IcebergTruncateUtil.truncDecimal(v.asInstanceOf[Decimal], width,
        math.min(d.precision + 1, 38), d.scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.IcebergTruncateUtil"
    val call: String => String = child.dataType match {
      case IntegerType => c => s"$util.truncInt($c, $width)"
      case LongType => c => s"$util.truncLong($c, $width)"
      case StringType => c => s"$util.truncString($c, $width)"
      case BinaryType => c => s"$util.truncBinary($c, $width)"
      case d: DecimalType =>
        c => s"$util.truncDecimal($c, $width, ${math.min(d.precision + 1, 38)}, ${d.scale})"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergTruncate =
    copy(child = newChild)
}

object IcebergTruncateFunctions {
  /** `iceberg_truncate(c, w)`: the spec truncate of `c` at width `w`. */
  def iceberg_truncate(c: Column, w: Int): Column =
    ColumnBridge.column(IcebergTruncate(ColumnBridge.expression(c), w))
}
