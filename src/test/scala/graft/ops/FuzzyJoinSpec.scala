package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Cross-table MinHash LSH join (record linkage): exact matches and
  * near matches link, far texts don't, id spaces never mix, and the
  * candidate stage is a keyed band join — no cross product. */
class FuzzyJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val other = "completely different words about cooking pasta with garlic butter and fresh basil leaves tonight"

  private def leftDf = Seq(
    (1L, base),
    (2L, other),
    (3L, "unrelated text on astronomy telescopes orbit planets stars galaxies and deep space nebulae")
  ).toDF("lid", "ltext")

  private def rightDf = Seq(
    (1L, other),                  // same id value as left 1 but matches left 2
    (10L, base),                  // exact copy of left 1
    (11L, base + " tail"),        // near copy of left 1
    (12L, "nothing in common with any left document at all just random filler tokens everywhere")
  ).toDF("rid", "rtext")

  test("exact and near matches link; far texts don't; overlapping id values don't mix") {
    val got = Dedup.minHashJoin(leftDf, rightDf, "lid", "ltext", "rid", "rtext",
        threshold = 0.5)
      .as[(Long, Long)].collect().toSet
    // left 1 links to both copies of base; left 2 links to right 1 (other);
    // right id=1 matching LEFT id=2 proves sides keep separate id spaces
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 1L)))
  }

  test("threshold prunes weak matches") {
    // base vs base+" tail": 3-shingle jaccard high but < 1.0 — a 0.99
    // threshold keeps only the exact copies (1,10) and (2,1)
    val strict = Dedup.minHashJoin(leftDf, rightDf, "lid", "ltext", "rid", "rtext",
        threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(strict == Set((1L, 10L), (2L, 1L)))
  }

  test("candidate stage is a keyed equi-join on (band, bh): no cartesian in the plan") {
    val df = Dedup.minHashJoin(leftDf, rightDf, "lid", "ltext", "rid", "rtext")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("broadcast and shuffled verify regimes agree") {
    val bcast = Dedup.minHashJoin(leftDf, rightDf, "lid", "ltext", "rid", "rtext")
      .as[(Long, Long)].collect().toSet
    val shuffled = Dedup.minHashJoin(leftDf, rightDf, "lid", "ltext", "rid", "rtext",
        maxBroadcastCandidates = 0L)
      .as[(Long, Long)].collect().toSet
    assert(bcast == shuffled)
  }

  test("hot-bucket cap drops over-cap buckets per side") {
    // 30 identical right rows all land in the same buckets; cap 10 drops
    // those buckets entirely -> no candidates survive for them
    val many = (100L until 130L).map(i => (i, base)).toDF("rid", "rtext")
    val got = Dedup.minHashJoin(leftDf, many, "lid", "ltext", "rid", "rtext",
        maxBucketSize = 10)
      .as[(Long, Long)].collect().toSet
    assert(got.isEmpty)
  }
}
