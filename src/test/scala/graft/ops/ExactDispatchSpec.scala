package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The adaptive exact-join dispatchers (d4/d11/d5's entry points): both
  * arms of each dispatcher emit identical pairs, and the arm choice
  * follows the byte/row budget — broadcast under it, the
  * shuffle-partitioned exact arm (prefix filter / tiled join) above it,
  * observable in the physical plan. */
class ExactDispatchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  // natural sf0.001 embeddings have no cosine-0.8 pairs — plant exact
  // duplicates so the joins have qualifying pairs to find
  private def vecCorpus = embs.select($"vec_id", $"embedding")
    .unionAll(embs.filter($"vec_id" % 3 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))

  // a corpus with planted containment: even docs get a copy whose text is
  // the original plus a long suffix — original is contained in the copy
  private def containCorpus = docs.select($"doc_id", $"text").limit(100)
    .unionAll(docs.limit(100).filter($"doc_id" % 2 === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" "), $"text").as("text")))

  test("prefix-filtered containment is exact: identical directed pairs to the broadcast join") {
    val direct = Dedup.containmentPairs(containCorpus, "doc_id", "text", 4, 0.9)
    val prefix = Dedup.containmentPairsPrefix(containCorpus, "doc_id", "text", 4, 0.9)
    assert(direct.exceptAll(prefix).isEmpty && prefix.exceptAll(direct).isEmpty)
    assert(direct.count() > 0)
  }

  test("tiled cosine join is exact: identical pairs to broadcast brute force") {
    val vecs = vecCorpus
    val brute = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.8, bruteForce = true)
    val tiled = Similarity.nearDupPairsTiled(vecs, "vec_id", "embedding",
      threshold = 0.8, tiles = 4)
    assert(brute.exceptAll(tiled).isEmpty && tiled.exceptAll(brute).isEmpty)
    assert(brute.count() > 0)
  }

  test("jaccard dispatcher: broadcast arm under the budget, prefix arm above it") {
    val corpus = docs.select($"doc_id", $"text").limit(80)
    val under = Dedup.ngramJaccardPairsExact(corpus, "doc_id", "text", 4, 0.6)
    assert(under.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "small corpus must take the broadcast nested-loop arm")
    val over = Dedup.ngramJaccardPairsExact(corpus, "doc_id", "text", 4, 0.6,
      broadcastBytesMax = 0L)
    assert(!over.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "over-budget corpus must take the prefix-filter arm (no broadcast NLJ)")
    assert(under.exceptAll(over).isEmpty && over.exceptAll(under).isEmpty,
      "both arms must emit identical pairs")
  }

  test("containment dispatcher: broadcast arm under the budget, prefix arm above it") {
    val under = Dedup.containmentPairsExact(containCorpus, "doc_id", "text", 4, 0.9)
    assert(under.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val over = Dedup.containmentPairsExact(containCorpus, "doc_id", "text", 4, 0.9,
      broadcastBytesMax = 0L)
    assert(!over.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(under.exceptAll(over).isEmpty && over.exceptAll(under).isEmpty)
  }

  test("cosine dispatcher: brute force under the row budget, tiled join above it") {
    val vecs = vecCorpus
    val under = Similarity.nearDupPairsExact(vecs, "vec_id", "embedding", threshold = 0.8)
    val over = Similarity.nearDupPairsExact(vecs, "vec_id", "embedding",
      threshold = 0.8, broadcastRowsMax = 16L)
    // the tiled arm never broadcasts a side: its only broadcast-eligible
    // relation would be a replicated corpus, which the tile-key shuffle
    // join replaces
    assert(!over.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(under.exceptAll(over).isEmpty && over.exceptAll(under).isEmpty)
    assert(under.count() > 0)
  }

  test("prefix arms stay exact across a threshold sweep") {
    // the prefix length formula |A| - ceil(t|A|) + 1 must be lossless at
    // EVERY threshold, not just the defaults the other tests pin
    val corpus = docs.select($"doc_id", $"text").limit(60)
      .unionAll(docs.limit(60).filter($"doc_id" % 2 === 0)
        .select(($"doc_id" + 100000).as("doc_id"), concat($"text", lit(" pad")).as("text")))
    for (t <- Seq(0.35, 0.6, 0.85)) {
      val direct = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 4, t)
      val prefix = Dedup.ngramJaccardPairsPrefix(corpus, "doc_id", "text", 4, t)
      assert(direct.exceptAll(prefix).isEmpty && prefix.exceptAll(direct).isEmpty,
        s"jaccard prefix diverged at t=$t")
    }
    for (t <- Seq(0.5, 0.75, 0.95)) {
      val bcast = Dedup.containmentPairs(containCorpus, "doc_id", "text", 4, t)
      val prefix = Dedup.containmentPairsPrefix(containCorpus, "doc_id", "text", 4, t)
      assert(bcast.exceptAll(prefix).isEmpty && prefix.exceptAll(bcast).isEmpty,
        s"containment prefix diverged at t=$t")
    }
  }

  test("tiled join distributes: no task sees more than ~2n/tiles rows of either side") {
    // structural invariant at scale: with `tiles` buckets a tile joins
    // two ~n/tiles slices, so the per-task pair block is (n/tiles)^2
    // regardless of corpus size. Verify the replication arithmetic: each
    // row lands in bucket-row count x (tiles+1)/2 tile slots total.
    val vecs = embs.select($"vec_id", $"embedding").limit(64)
    val n = vecs.count()
    val tiles = 4
    val base = vecs.withColumn("__b", pmod(xxhash64($"vec_id"), lit(tiles)).cast("int"))
    val leftSlots = base
      .withColumn("__tile", explode(expr(s"transform(sequence(__b, ${tiles - 1}), j -> __b * $tiles + j)")))
      .count()
    val rightSlots = base
      .withColumn("__tile", explode(expr(s"transform(sequence(0, __b), i -> i * $tiles + __b)")))
      .count()
    // left + right slots together = n * (tiles + 1): linear in n, not n^2
    assert(leftSlots + rightSlots == n * (tiles + 1),
      s"replication must be exactly (tiles+1) per row: $leftSlots + $rightSlots != $n * ${tiles + 1}")
  }
}
