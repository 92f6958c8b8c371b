package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VecDotSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("vec_dot matches the HOF formulation bit-for-bit on float arrays") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val hof = embs.select($"vec_id",
      aggregate(zip_with(transform($"embedding", x => x.cast("double")),
        transform($"embedding", x => x.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val native = embs.select($"vec_id", VectorFunctions.vec_dot($"embedding", $"embedding").as("d"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("vec_dot handles doubles, nulls, and mismatched lengths") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(1.0), Seq(2.0, 99.0)) // length mismatch -> NULL (like zip_with+aggregate)
    ).toDF("id", "a", "b")
    val got = df.select($"id", VectorFunctions.vec_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(32.0) && got(2L).isEmpty)
    // null array -> NULL (id=2's array is nulled; id=1 still computes)
    val withNull = df.withColumn("a", when($"id" === 1, $"a"))
      .select($"id", VectorFunctions.vec_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!withNull(1L) && withNull(2L))
    // null ELEMENT -> NULL, matching the HOF's null propagation
    val elemNull = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("id", "a", "b")
      .select(VectorFunctions.vec_dot($"a", $"b").as("d"))
    assert(elemNull.head.isNullAt(0))
  }

  test("vec_dot is SQL-callable after registration") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head.getDouble(0)
    assert(v == 11.0)
  }

  test("jaccard_ge is SQL-callable after registration") {
    GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT jaccard_ge(array(1L, 2L, 3L), array(2L, 3L, 4L), 0.5) AS ok").head.getBoolean(0))
    assert(!spark.sql(
      "SELECT jaccard_ge(array(1L, 2L, 3L), array(2L, 3L, 4L), 0.6) AS ok").head.getBoolean(0))
  }

  test("containment_ge and hilbert_d2 are SQL-callable after registration") {
    GraftExtensions.register(spark)
    // {1,2} fully inside {1,2,3}: containment 1.0; reverse is 2/3
    assert(spark.sql(
      "SELECT containment_ge(array(1L, 2L), array(1L, 2L, 3L), 1.0) AS ok").head.getBoolean(0))
    assert(!spark.sql(
      "SELECT containment_ge(array(1L, 2L, 3L), array(1L, 2L), 0.7) AS ok").head.getBoolean(0))
    assert(spark.sql("SELECT hilbert_d2(3L, 5L, 8) AS h").head.getLong(0) ==
      HilbertCurve.hilbertRef(3L, 5L, 8))
  }

  test("nfc and iceberg_bucket are SQL-callable after registration") {
    GraftExtensions.register(spark)
    // decomposed e + combining acute composes to U+00E9
    assert(spark.sql("SELECT nfc('café') AS s").head.getString(0) == "café")
    // Iceberg spec test vector: bucket hash of int 34 is 2017239379;
    // pmod over 16 buckets -> 3
    assert(spark.sql("SELECT iceberg_bucket(34L, 16) AS b").head.getInt(0) ==
      IcebergBucketUtil.bucketLong(34L, 16))
  }
}
