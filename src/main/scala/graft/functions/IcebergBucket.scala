package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg table-spec bucket transform (public spec, "Appendix B:
  * 32-bit Hash Requirements"): `bucket(v, n) = (murmur3_x86_32(encode(v))
  * & Int.MaxValue) % n`, where `encode` is the spec's single-value binary
  * encoding — ints/longs/dates/timestamps as the 8-byte little-endian
  * long, strings as UTF-8 bytes, binary as raw bytes, decimals as the
  * minimal two's-complement big-endian of the unscaled value. A table
  * bucketed with this transform assigns every row to the same bucket any
  * spec-compliant Iceberg reader/writer would (the compatibility the
  * reference inherits from iceberg-rust — its bucket-partitioned
  * integration test, integration-tests/src/integration_tests.rs:344-351).
  */
object IcebergBucketUtil {

  /** murmur3_x86_32, seed 0 — the spec's required hash function. */
  def hashBytes(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n4 = data.length & ~3
    var i = 0
    while (i < n4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (data.length & 3) match {
      case 3 =>
        k = ((data(n4 + 2) & 0xff) << 16) | ((data(n4 + 1) & 0xff) << 8) | (data(n4) & 0xff)
      case 2 =>
        k = ((data(n4 + 1) & 0xff) << 8) | (data(n4) & 0xff)
      case 1 =>
        k = data(n4) & 0xff
      case _ =>
    }
    if (k != 0) { k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** ints are promoted to long before hashing (spec rule), so
    * `bucket(34: Int) == bucket(34L)`; the encoding is the 8-byte
    * little-endian of the long. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    hashBytes(b)
  }

  /** decimal hashes the minimal two's-complement big-endian of the
    * UNSCALED value (the scale is carried by the type, not the bytes). */
  def hashDecimal(v: java.math.BigDecimal): Int =
    hashBytes(v.unscaledValue.toByteArray)

  private def pos(h: Int, n: Int): Int = (h & Integer.MAX_VALUE) % n

  def bucketLong(v: Long, n: Int): Int = pos(hashLong(v), n)
  def bucketBytes(v: Array[Byte], n: Int): Int = pos(hashBytes(v), n)
  def bucketString(v: UTF8String, n: Int): Int = pos(hashBytes(v.getBytes), n)
  def bucketDecimal(v: Decimal, n: Int): Int = pos(hashDecimal(v.toJavaBigDecimal), n)
}

/** Catalyst expression form of the transform: a static-call codegen body,
  * so bucketed writes stay inside whole-stage codegen. Null input -> null
  * bucket (Iceberg puts null partition values in the null partition; our
  * manifests reject them upstream, SparkExecutor.listWrittenFiles). */
case class IcebergBucket(child: Expression, numBuckets: Int) extends UnaryExpression {

  require(numBuckets > 0, s"bucket count must be positive, got $numBuckets")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | StringType |
           BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket does not support $t (the Iceberg spec defines bucketing for " +
          "int/long/date/timestamp/string/binary/decimal)")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => IcebergBucketUtil.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case LongType | TimestampType => IcebergBucketUtil.bucketLong(v.asInstanceOf[Long], numBuckets)
    case StringType => IcebergBucketUtil.bucketString(v.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => IcebergBucketUtil.bucketBytes(v.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType => IcebergBucketUtil.bucketDecimal(v.asInstanceOf[Decimal], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.IcebergBucketUtil"
    val call: String => String = child.dataType match {
      case IntegerType | DateType => c => s"$util.bucketLong((long) $c, $numBuckets)"
      case LongType | TimestampType => c => s"$util.bucketLong($c, $numBuckets)"
      case StringType => c => s"$util.bucketString($c, $numBuckets)"
      case BinaryType => c => s"$util.bucketBytes($c, $numBuckets)"
      case _: DecimalType => c => s"$util.bucketDecimal($c, $numBuckets)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergBucketFunctions {
  /** `iceberg_bucket(c, n)`: the spec bucket ordinal of `c` in [0, n). */
  def iceberg_bucket(c: Column, n: Int): Column =
    ColumnBridge.column(IcebergBucket(ColumnBridge.expression(c), n))
}
