package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Exact duplicated-substring windows and int8 embedding quantization. */
class SubstringQuantizeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("duplicatedNgramStats: cross-doc, within-doc, and short-doc cases") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),           // windows [a..h], [b..i]
      (2L, "a b c d e f g h x"),           // [a..h] shared with doc 1
      (3L, "z z z z z z z z z z"),         // 3 identical windows (self-dup)
      (4L, "too short")                    // no 8-token window
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramStats(docs, "doc_id", "text", n = 8, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((3L, 3L, 1.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("duplicatedNgramStats: bounded shuffles, no cartesian, hashes-only wire") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = Dedup.duplicatedNgramStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // gram count window + dup-doc aggregate + id join = at most 3
    // shuffle exchanges; never a cartesian pair scan
    val nShuffle = "ShuffleExchange".r.findAllIn(plan).length
    assert(nShuffle <= 3, s"expected <= 3 shuffles, got $nShuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no pair scan allowed:\n$plan")
  }

  test("exciseDuplicatedNgrams cuts covered tokens, leaves the rest in order") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),   // dup window at pos 0 covers tokens 0..7
      (2L, "a b c d e f g h x"),
      (3L, "z z z z z z z z z z"), // all three windows dup -> whole doc cut
      (4L, "too short")            // no window -> untouched
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicatedNgrams(docs, "doc_id", "text", n = 8, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((9L, 1L, "i")))
    assert(out(2L) == ((9L, 1L, "x")))
    assert(out(3L) == ((10L, 0L, "")))
    assert(out(4L) == ((2L, 2L, "too short")))
  }

  test("quantizeInt8: exact codes, scale, and reconstruction error") {
    val df = Seq(
      (1L, Seq(1f, -0.5f, 0f)),
      (2L, Seq(0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    // mx=1: q = [127, round(-63.5) = -64, 0]; err = (64/127 - 0.5)/3
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("127,-64,0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._2 == expectedMd5)
    assert(out(1L)._1 == 7874016L)  // round(1/127 * 1e9)
    assert(out(1L)._3 == 1312L)     // round((64/127 - 0.5)/3 * 1e6)
    val zeroMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("0,0,0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(2L) == ((0L, zeroMd5, 0L)))
  }

  test("quantizeInt8 is a zero-exchange per-row plan") {
    val df = Seq((1L, Seq(0.5f, 0.25f))).toDF("vec_id", "embedding")
    val plan = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantizeInt8 must not shuffle:\n$plan")
  }
}
