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
      assert(!shuffledPlan.contains("BroadcastHashJoin"),
        s"no broadcast may survive above the gate:\n$shuffledPlan")

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

    // and the per-row plan really is exchange-free before banding — checked
    // on a plain scan input (the test corpus above has a limit()+union whose
    // own GlobalLimit exchange would mask the property under test)
    val plan = Dedup.minHashSignatureSets(docs.select($"doc_id", $"text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"per-row signature plan must not shuffle:\n$plan")
  }

  test("minHashNearDupPairs selects a regime by candidate count; output identical") {
    val viaBroadcast = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
    // gate of 0 forces every candidate set onto the shuffled path
    val viaShuffle = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", threshold = 0.5,
      maxBroadcastCandidates = 0L)
    assert(viaBroadcast.count() > 0)
    assert(viaBroadcast.exceptAll(viaShuffle).isEmpty && viaShuffle.exceptAll(viaBroadcast).isEmpty)
  }
}
