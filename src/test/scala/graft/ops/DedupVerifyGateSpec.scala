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

  test("minHashNearDupPairs selects a regime by candidate count; output identical") {
    val viaBroadcast = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
    // gate of 0 forces every candidate set onto the shuffled path
    val viaShuffle = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", threshold = 0.5,
      maxBroadcastCandidates = 0L)
    assert(viaBroadcast.count() > 0)
    assert(viaBroadcast.exceptAll(viaShuffle).isEmpty && viaShuffle.exceptAll(viaBroadcast).isEmpty)
  }
}
