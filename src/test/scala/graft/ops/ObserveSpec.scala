package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** observe()-based stage metrics: values arrive from the consuming
  * action itself, with no extra scan. */
class ObserveSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("docStats reports rows/tokens/chars from the consuming action") {
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val (observed, m) = Observe.docStats(docs, "ingest")
    assert(observed.count() == 2)
    assert(m.get("rows") == 2L)
    assert(m.get("tokens") == 5L)
    assert(m.get("chars") == 8L)
  }

  test("gateStats counts both verdicts of a gated stage in one pass") {
    val docs = Seq((1L, "the quick brown fox jumps over a lazy dog today"), (2L, "zz"))
      .toDF("doc_id", "text")
    val rules = Quality.gopherRules(docs, minWords = 5)
    val (observed, m) = Observe.gateStats(rules, "gopher")
    val kept = observed.filter(col("keep")).count()
    assert(m.get("kept") == kept && m.get("kept") == 1L)
    assert(m.get("dropped") == 1L)
  }

  test("chained stages each observe their own frame") {
    val docs = (1 to 100).map(i => (i.toLong, s"w$i x y")).toDF("doc_id", "text")
    val (stage1, m1) = Observe.counted(docs, "raw")
    val (stage2, m2) = Observe.counted(stage1.filter(col("doc_id") % 2 === 0), "evens")
    assert(stage2.count() == 50)
    assert(m1.get("rows") == 100L && m2.get("rows") == 50L)
  }
}
