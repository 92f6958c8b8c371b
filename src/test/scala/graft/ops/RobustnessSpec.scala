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
}
