package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Adversarial-input behavior of the curation operators: heavy skew
  * (boilerplate in half the corpus) and null/empty text. These pin the
  * CONTRACT — what a pipeline author must handle — not just the happy
  * path. */
class RobustnessSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("substring stats/excision survive a 50%-boilerplate corpus (hot window hash)") {
    // one shared 10-token boilerplate in every even doc: a single window
    // hash carries half the corpus through the count window
    val boiler = "click here to subscribe and never miss an update today"
    val docs = (1 to 400).map { i =>
      val body = (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"$body $boiler" else body)
    }.toDF("doc_id", "text")
    val stats = Dedup.duplicatedNgramStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every even doc has duplicated windows; no odd doc does
    assert((1 to 400).forall(i => (stats(i.toLong) > 0) == (i % 2 == 0)))
    val excised = Dedup.exciseDuplicatedNgrams(docs, "doc_id", "text")
      .filter(col("id") % 2 === 0).select("clean_text").collect()
    // the boilerplate (and only spans touching it) is gone from every even doc
    excised.foreach(r => assert(!r.getString(0).contains("subscribe")))
  }

  test("LSH near-dup pairs survive an all-identical slice (hot bucket capped)") {
    val docs = ((1 to 50).map(i => (i.toLong, "the exact same boilerplate text repeated")) ++
      (51 to 60).map(i => (i.toLong, s"unique document number $i with words w$i x$i y$i")))
      .toDF("doc_id", "text")
    // 50 identical docs blow the default bucket cap; the op must complete
    // and still find pairs within the cap regime
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text",
      maxBucketSize = 10)
    assert(pairs.count() >= 0) // completes without OOM/explosion
  }

  test("null and empty text: metrics go null/zero, never crash; filters drop") {
    val docs = Seq[(Long, String)]((1L, "the quick brown fox jumps over a lazy dog now"),
      (2L, null), (3L, "")).toDF("doc_id", "text")

    val gopher = Quality.gopherRules(docs, minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(gopher(1L).getBoolean(6))
    // null text -> null verdict; filter(col("keep")) drops it
    assert(gopher(2L).isNullAt(6))
    // empty text -> one empty token, fails the word floor
    assert(!gopher(3L).getBoolean(6))

    val cleaned = Quality.c4CleanLines(docs).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString)).toMap
    assert(cleaned(2L).isEmpty || cleaned(2L).contains("")) // null-safe
    assert(cleaned(3L).contains(""))

    val stats = Dedup.duplicatedNgramStats(docs, "doc_id", "text")
    assert(stats.count() == 3) // the null doc still reports a row

    val q = Similarity.quantizeInt8(
      Seq((1L, Option(Seq(0.5f, 0.25f))), (2L, Option.empty[Seq[Float]]))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!q(1L).isNullAt(2))
    assert(q(2L).isNullAt(2)) // null vector -> null codes, not a crash
  }

  test("HLL and the quantile histogram exclude nulls instead of counting phantoms") {
    val items = Seq(Some("a"), Some("b"), None, Some("a")).toDF("x")
    val sk = Sketch.hyperLogLog(items, "x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val skNonNull = Sketch.hyperLogLog(items.filter($"x".isNotNull), "x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk == skNonNull && sk.size == 2)
    val vals = Seq(Some(1.0), None, Some(9.0)).toDF("v")
    val hist = Sketch.quantileHistogram(vals, "v", 0.0, 10.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(1L -> 1L, 9L -> 1L)) // the null is NOT a bin-0 row
  }

  test("pqEncode: null or wrong-length vectors get null codes, never the lowest cid") {
    val cb = Seq((0L, Seq(0f, 0f)), (1L, Seq(5f, 5f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Option(Seq(4.9f, 5f))),
      (11L, Option.empty[Seq[Float]]),
      (12L, Option(Seq(1f, 2f, 3f, 4f)))) // dim 4 vs codebook dim 2
      .toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(corpus, "vec_id", "embedding",
      cb, "vec_id", "embedding", m = 1)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(10L).contains(1L))
    assert(got(11L).isEmpty && got(12L).isEmpty)
  }

  test("interleave rejects null domains loudly; an empty input yields an empty output") {
    val bad = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("id", "dom")
    intercept[IllegalArgumentException] {
      Mixture.roundRobinInterleave(bad, "id", "dom")
    }
    val empty = Mixture.roundRobinInterleave(
      bad.filter(lit(false)).select($"id", $"dom".cast("string").as("dom")), "id", "dom")
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("id", "dom", "rn", "position"))
  }

  test("truncateTokens keeps null text null; oovRate reports null-text docs") {
    val d = Seq((1L, Option("the cat")), (2L, Option.empty[String])).toDF("id", "text")
    val t = d.select($"id", TextAnalysis.truncateTokens($"text", 5).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(t(1L).contains("the cat") && t(2L).isEmpty)
    val oov = TextAnalysis.oovRate(d, "id", "text", Seq("the").toDF("tok"), "tok")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(oov(1L) == ((2L, 1L, Some(500000L))))
    assert(oov(2L) == ((0L, 0L, None)), "null-text doc must appear in the report")
  }

  test("bloomPrune derives the bit width from the filter — a non-default build stays sound") {
    val build = (1 to 50).map(i => i * 3L).toDF("k")
    val probe = (1 to 300).map(i => (i.toLong, i)).toDF("k", "v")
    val bits = Sketch.bloomBits(build, "k", k = 3, bitHexChars = 5)
    val cand = Sketch.bloomPrune(probe, "k", bits)
      .select("k").collect().map(_.getLong(0)).toSet
    val trueKeys = probe.join(build, Seq("k"), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(cand), "width mismatch dropped true matches")
  }
}
