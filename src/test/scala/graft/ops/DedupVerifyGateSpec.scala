package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The LSH candidate-verify stage is size-gated, like the MOR delete-side
  * broadcasts: under [[Dedup.MaxBroadcastCandidates]] the candidate pairs
  * broadcast and the corpus never shuffles (two streaming passes); above
  * it the shuffled twin plans keyed joins so an O(corpus) candidate set —
  * normal for a high-duplication web crawl — cannot OOM the driver.
  * Results must be identical either way.
  */
class DedupVerifyGateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def corpus = {
    val seeded = docs.select($"doc_id", $"text").limit(60)
    seeded.unionAll(
      seeded.select(($"doc_id" + 100000).as("doc_id"), concat($"text", lit(" x")).as("text")))
  }

  test("verify stage: broadcast plan under the gate, shuffled plan above it") {
    val sets = Dedup.wordShingleSets(corpus, "doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minHashSignatures(Dedup.wordShingles(corpus, "doc_id", "text"))))

    val bcast = Dedup.verifyJaccardSets(pairs, sets, 0.5)
    val bcastPlan = bcast.queryExecution.executedPlan.toString
    assert(bcastPlan.contains("BroadcastHashJoin"),
      s"expected broadcast verify joins:\n$bcastPlan")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = Dedup.verifyJaccardSetsShuffled(pairs, sets, 0.5)
      val shuffledPlan = shuffled.queryExecution.executedPlan.toString
      assert(shuffledPlan.contains("SortMergeJoin") || shuffledPlan.contains("ShuffledHashJoin"),
        s"expected shuffled verify joins:\n$shuffledPlan")
      // the hot-bucket cap's broadcast ANTI join (tiny over-cap key list,
      // hint-driven) is allowed; no other broadcast may survive the gate
      assert(shuffledPlan.linesIterator.filter(_.contains("BroadcastHashJoin"))
          .forall(_.contains("LeftAnti")),
        s"no verify broadcast may survive above the gate:\n$shuffledPlan")

      assert(bcast.count() > 0)
      assert(bcast.exceptAll(shuffled).isEmpty && shuffled.exceptAll(bcast).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("per-row signature+set projection matches the exploded formulation exactly") {
    // the oracle (and minHashSignatures over wordShingles) computes each
    // lane as a grouped min over the exploded distinct gram relation; the
    // per-row path must produce bit-identical signatures and gsets
    val exploded = Dedup.minHashSignatures(Dedup.wordShingles(corpus, "doc_id", "text"), 16)
    val sets = Dedup.wordShingleSets(corpus, "doc_id", "text")
    val perRow = Dedup.minHashSignatureSets(corpus, "doc_id", "text", 3, 16)

    val sigCols = col("id") +: (0 until 16).map(j => col(s"mh$j"))
    val a = exploded.select(sigCols: _*)
    val b = perRow.select(sigCols: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "signature mismatch")

    val ga = sets.select(col("id"), col("gset"))
    val gb = perRow.select(col("id"), col("gset"))
    assert(ga.exceptAll(gb).isEmpty && gb.exceptAll(ga).isEmpty, "gset mismatch")

    // and the per-row plan stays narrow before banding — checked on a
    // plain scan input (the test corpus above has a limit()+union whose
    // own GlobalLimit exchange would mask the property under test). The
    // ONLY exchange allowed is [[Spread]]'s grow-only round-robin
    // repartition (parallelism floor for the per-row hot loop); no KEYED
    // shuffle may appear, and a pre-spread input gets none at all.
    val plan = Dedup.minHashSignatureSets(docs.select($"doc_id", $"text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"per-row signature plan must not shuffle on a key:\n$plan")
    val wide = docs.select($"doc_id", $"text")
      .repartition(spark.sparkContext.defaultParallelism)
    val widePlan = Dedup.minHashSignatureSets(wide, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // exactly the caller's own exchange: Spread must be a no-op on an
    // already-wide input
    assert("Exchange".r.findAllIn(widePlan).length <= 1,
      s"Spread must not re-partition an already-wide input:\n$widePlan")
  }

  test("minHashNearDupPairs selects a regime by candidate count; output identical") {
    val viaBroadcast = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
    // gate of 0 forces every candidate set onto the shuffled path
    val viaShuffle = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", threshold = 0.5,
      maxBroadcastCandidates = 0L)
    assert(viaBroadcast.count() > 0)
    assert(viaBroadcast.exceptAll(viaShuffle).isEmpty && viaShuffle.exceptAll(viaBroadcast).isEmpty)
  }

  test("minHashContainmentPairs: directed verdicts over LSH candidates, both regimes agree") {
    // the seeded corpus: each base doc vs its '+ x' copy is a mutual
    // near-dup (high Jaccard -> buckets together); containment holds in
    // BOTH directions at 0.9 (one extra token on a long doc), so directed
    // pairs must come out in both orientations
    val out = Dedup.minHashContainmentPairs(corpus, "doc_id", "text", threshold = 0.9)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // every bucketed seeded copy contains its base FULLY (the copy is the
    // base + one token), so the forward (base -> copy) orientation is
    // always present; the reverse holds only when the base is long enough
    // that one extra token stays under 10% of its shingles — short docs
    // are legitimately one-way, which is exactly what the directed
    // measure is for
    val anyBase = got.collect { case (a, b) if b == a + 100000 => (a, b) }
    assert(anyBase.nonEmpty, s"expected (base, base+100000) pairs, got $got")
    val mirrored = anyBase.count { case (a, b) => got.contains((b, a)) }
    assert(mirrored * 2 > anyBase.size,
      s"long docs should mirror (got $mirrored of ${anyBase.size})")

    // shuffled regime (gate 0) emits the identical directed set
    val shuffled = Dedup.minHashContainmentPairs(corpus, "doc_id", "text", threshold = 0.9,
      maxBroadcastCandidates = 0L)
    assert(out.exceptAll(shuffled).isEmpty && shuffled.exceptAll(out).isEmpty)

    // direction genuinely filters: with a threshold only the small-in-big
    // direction can pass, the big doc's containment in the small one fails
    val asym = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, (1 to 44).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val dAsym = Dedup.minHashContainmentPairs(asym, "doc_id", "text", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dAsym.contains((1L, 2L)) && !dAsym.contains((2L, 1L)), s"got $dAsym")
  }
}
