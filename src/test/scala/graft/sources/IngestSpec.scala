package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Corrupt-record quarantine: bad lines neither kill the job nor vanish. */
class IngestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("jsonl: good rows parse, malformed lines land in quarantine with the raw text") {
    val dir = Files.createTempDirectory("ingest").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      """{"doc_id": 1, "text": "hello"}
        |this is not json at all
        |{"doc_id": 2, "text": "world"}
        |{"doc_id": broken
        |""".stripMargin)
    val (good, bad) = Ingest.jsonl(spark, s"$dir/part.jsonl", schema)
    val rows = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "hello"), (2L, "world")))
    assert(good.columns.toSeq == Seq("doc_id", "text"), "capture column must not leak")
    val quarantined = bad.collect().map(_.getString(0)).toSet
    assert(quarantined == Set("this is not json at all", """{"doc_id": broken"""))
  }

  test("csv: type-mismatched rows quarantine, clean rows keep their schema") {
    val dir = Files.createTempDirectory("ingest").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.csv"),
      "1,alpha\nnot-a-number,beta\n3,gamma\n")
    val (good, bad) = Ingest.csv(spark, s"$dir/part.csv", schema)
    assert(good.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha"), (3L, "gamma")))
    assert(bad.collect().map(_.getString(0)).toSet == Set("not-a-number,beta"))
  }

  test("a schema already containing the capture column is rejected loudly") {
    intercept[IllegalArgumentException] {
      Ingest.jsonl(spark, "/nowhere", StructType(Seq(StructField("_corrupt", StringType))))
    }
  }
}
