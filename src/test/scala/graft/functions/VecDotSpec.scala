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
      (2L, Seq(1.0), Seq(2.0, 99.0)) // truncates to min length
    ).toDF("id", "a", "b")
    val got = df.select($"id", VectorFunctions.vec_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 32.0 && got(2L) == 2.0)
    val withNull = df.withColumn("a", when($"id" === 1, $"a"))
      .select(VectorFunctions.vec_dot($"a", $"b").as("d"))
    assert(withNull.collect().count(_.isNullAt(0)) == 1)
  }

  test("vec_dot is SQL-callable after registration") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head.getDouble(0)
    assert(v == 11.0)
  }
}
