package graft.functions

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** The Iceberg-spec bucket transform against the spec's own published
  * test values ("Appendix B: 32-bit Hash Requirements" of the Iceberg
  * table spec) — the compatibility contract: any engine that implements
  * the spec computes these exact hashes. */
class IcebergBucketSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("murmur3_x86_32 matches the spec's published hash vectors") {
    // int and long promote to the same 8-byte little-endian encoding
    assert(IcebergBucketUtil.hashLong(34L) == 2017239379)
    // string: UTF-8 bytes
    assert(IcebergBucketUtil.hashBytes(
      "iceberg".getBytes(StandardCharsets.UTF_8)) == 1210000089)
    // date 2017-11-16 = 17486 days from epoch, hashed as long
    assert(IcebergBucketUtil.hashLong(17486L) == -653330422)
    // time 22:31:08 = 81068000000 micros
    assert(IcebergBucketUtil.hashLong(81068000000L) == -662762989)
    // timestamp 2017-11-16T22:31:08 UTC = 1510871468000000 micros
    assert(IcebergBucketUtil.hashLong(1510871468000000L) == -2047944441)
    // decimal 14.20: minimal two's-complement of unscaled 1420
    assert(IcebergBucketUtil.hashDecimal(new java.math.BigDecimal("14.20")) == -500754589)
    // uuid f79c3e09-677c-4bbd-a479-3f349cb785e7: 16-byte big-endian
    val uuid = java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    assert(IcebergBucketUtil.hashBytes(bb.array()) == 1488055340)
  }

  test("bucket ordinal is (hash & Int.MaxValue) % n") {
    assert(IcebergBucketUtil.bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    assert(IcebergBucketUtil.bucketString(UTF8String.fromString("iceberg"), 16) ==
      (1210000089 & Int.MaxValue) % 16)
    // negative hash still lands in [0, n)
    assert(IcebergBucketUtil.bucketLong(17486L, 16) == (-653330422 & Int.MaxValue) % 16)
  }

  test("expression: codegen and interpreted eval agree with the static form") {
    import spark.implicits._
    val df = spark.range(0, 1000).toDF("v")
      .withColumn("s", concat(lit("k"), col("v")))
      .withColumn("d", (col("v") % 100).cast("decimal(10,2)") / 7)
    val out = df.select(
      col("v"),
      IcebergBucketFunctions.iceberg_bucket(col("v"), 16).as("bl"),
      IcebergBucketFunctions.iceberg_bucket(col("s"), 16).as("bs"),
      IcebergBucketFunctions.iceberg_bucket(col("v").cast("int"), 16).as("bi"),
      IcebergBucketFunctions.iceberg_bucket(col("d"), 16).as("bd"),
      col("d")
    ).collect()
    for (r <- out) {
      val v = r.getLong(0)
      assert(r.getInt(1) == IcebergBucketUtil.bucketLong(v, 16))
      assert(r.getInt(2) == IcebergBucketUtil.bucketBytes(
        s"k$v".getBytes(StandardCharsets.UTF_8), 16))
      // int promotes to the long encoding: same bucket
      assert(r.getInt(3) == r.getInt(1))
      assert(r.getInt(4) == IcebergBucketUtil.hashDecimal(r.getDecimal(5)).&(Int.MaxValue) % 16)
    }
  }

  test("unsupported types are rejected at analysis") {
    import spark.implicits._
    val df = Seq(1.5d).toDF("x")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(IcebergBucketFunctions.iceberg_bucket(col("x"), 4)).collect()
    }
  }

  test("null input yields null bucket") {
    import spark.implicits._
    val df = Seq(Some(5L), None).toDF("v")
    val out = df.select(IcebergBucketFunctions.iceberg_bucket(col("v"), 8)).collect()
    assert(out(0).getInt(0) == IcebergBucketUtil.bucketLong(5L, 8))
    assert(out(1).isNullAt(0))
  }
}
