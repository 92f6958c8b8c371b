package graft.meta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Probe: does Spark's parquet reader fill a column ABSENT from the file
  * with the EXISTS_DEFAULT metadata literal, while keeping explicit nulls
  * from files that HAVE the column? */
class DefaultProbeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("EXISTS_DEFAULT fills file-absent columns only") {
    val dir = java.nio.file.Files.createTempDirectory("defprobe").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/old")
    Seq((2L, "b", Option("real")), (3L, "c", Option.empty[String]))
      .toDF("id", "v", "extra").write.parquet(s"$dir/new")
    val md = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "'unknown'")
      .putString("CURRENT_DEFAULT", "'unknown'").build()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("extra", StringType, nullable = true, md)))
    val got = spark.read.schema(schema).parquet(s"$dir/old", s"$dir/new")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got(1L).contains("unknown"), s"absent column not defaulted: $got")
    assert(got(2L).contains("real") && got(3L).isEmpty, s"explicit values broken: $got")
  }
}
