package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.LocalCatalog

/** Cross-run exact dedup against a persisted fingerprint index. */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(java.nio.file.Files.createTempDirectory("dedup-idx").toString)

  test("batches dedup against everything ever ingested, lowest id wins within a batch") {
    val catalog = freshCatalog()
    val b0 = Seq((3L, "alpha"), (1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val out0 = Dedup.incrementalExact(spark, catalog, "idx", b0, "doc_id", "text", 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // within-batch dup of "alpha" collapses to id 1
    assert(out0 == Set((1L, "alpha"), (2L, "beta")))
    // batch 1: one repeat of old content (dropped), one novel doc (kept)
    val b1 = Seq((10L, "alpha"), (11L, "gamma")).toDF("doc_id", "text")
    val out1 = Dedup.incrementalExact(spark, catalog, "idx", b1, "doc_id", "text", 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out1 == Set((11L, "gamma")))
    // the index carries one row per distinct content with its first-seen batch
    val idx = graft.meta.IceRead.table(spark, catalog, "idx")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(idx == Set((1L, 0L), (2L, 0L), (11L, 1L)))
  }

  test("replaying a committed batch re-emits exactly the same rows, not nothing") {
    val catalog = freshCatalog()
    val b0 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    Dedup.incrementalExact(spark, catalog, "idx", b0, "doc_id", "text", 0L).collect()
    val b1 = Seq((10L, "beta"), (11L, "gamma"), (12L, "delta")).toDF("doc_id", "text")
    val first = Dedup.incrementalExact(spark, catalog, "idx", b1, "doc_id", "text", 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(first == Set((11L, "gamma"), (12L, "delta")))
    // the downstream write failed; the batch replays after the index commit
    val replay = Dedup.incrementalExact(spark, catalog, "idx", b1, "doc_id", "text", 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(replay == first, "replay must re-emit the batch's novel rows")
    // and the index did not grow
    assert(graft.meta.IceRead.table(spark, catalog, "idx").count() == 4)
  }

  test("an all-duplicate batch emits nothing and commits nothing") {
    val catalog = freshCatalog()
    val b0 = Seq((1L, "alpha")).toDF("doc_id", "text")
    Dedup.incrementalExact(spark, catalog, "idx", b0, "doc_id", "text", 0L).collect()
    val snapsBefore = graft.meta.IceRead.snapshots(spark, catalog, "idx").count()
    val b1 = Seq((9L, "alpha")).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(spark, catalog, "idx", b1, "doc_id", "text", 1L)
    assert(out.isEmpty)
    assert(graft.meta.IceRead.snapshots(spark, catalog, "idx").count() == snapsBefore,
      "empty batch must not create a snapshot")
  }

  test("dedupSink: a stream lands as a continuously-deduped table") {
    import graft.testkit.FileGenerator
    val catalog = freshCatalog()
    val srcDir = java.nio.file.Files.createTempDirectory("sink-src")
    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream
      .foreachBatch(Dedup.dedupSink(catalog, "sink_idx", "sink_out", "doc_id", "text"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sink-ck").toString)
      .start()
    try {
      FileGenerator.writeSingleParquet(spark,
        Seq((3L, "alpha"), (1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
        srcDir.resolve("b0.parquet"))
      q.processAllAvailable()
      FileGenerator.writeSingleParquet(spark,
        Seq((10L, "alpha"), (11L, "gamma")).toDF("doc_id", "text"),
        srcDir.resolve("b1.parquet"))
      q.processAllAvailable()
      val out = graft.meta.IceRead.table(spark, catalog, "sink_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((1L, "alpha"), (2L, "beta"), (11L, "gamma")))
    } finally q.stop()
  }

  // near-dup fixtures: one extra trailing token ~ Jaccard 11/12 on 3-gram
  // sets, far above the 0.5 threshold
  private val textA = "the quick brown fox jumps over the lazy dog near the river bank"
  private val textB = "completely different content about spark catalyst optimizer and shuffles everywhere always"
  private val textD = "yet another unrelated document discussing parquet footers and manifest pruning logic"

  test("near-dup index: batches dedup against every batch ever ingested") {
    val catalog = freshCatalog()
    val b0 = Seq((3L, textA + " today"), (1L, textA), (2L, textB)).toDF("doc_id", "text")
    val out0 = Dedup.incrementalMinHash(spark, catalog, "nidx", b0, "doc_id", "text", 0L)
      .collect().map(_.getLong(0)).toSet
    // 3 is a near-dup of 1 (lower id wins within the batch)
    assert(out0 == Set(1L, 2L))
    // batch 1: a near-dup of batch-0 content (dropped), one novel doc (kept)
    val b1 = Seq((10L, textA + " again"), (11L, textD)).toDF("doc_id", "text")
    val out1 = Dedup.incrementalMinHash(spark, catalog, "nidx", b1, "doc_id", "text", 1L)
      .collect().map(_.getLong(0)).toSet
    assert(out1 == Set(11L))
    val idx = graft.meta.IceRead.table(spark, catalog, "nidx")
      .select($"id", $"batch_id").as[(Long, Long)].collect().toSet
    assert(idx == Set((1L, 0L), (2L, 0L), (11L, 1L)))
  }

  test("near-dup index: replaying a committed batch re-emits the same rows") {
    val catalog = freshCatalog()
    val b0 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    Dedup.incrementalMinHash(spark, catalog, "nidx", b0, "doc_id", "text", 0L).collect()
    val b1 = Seq((10L, textB + " addendum"), (11L, textD)).toDF("doc_id", "text")
    val first = Dedup.incrementalMinHash(spark, catalog, "nidx", b1, "doc_id", "text", 1L)
      .collect().map(_.getLong(0)).toSet
    assert(first == Set(11L))
    // downstream failed; the batch replays AFTER its index commit — the
    // replay guard must keep the batch from matching its own rows
    val replay = Dedup.incrementalMinHash(spark, catalog, "nidx", b1, "doc_id", "text", 1L)
      .collect().map(_.getLong(0)).toSet
    assert(replay == first, "replay must re-emit the batch's novel rows")
    assert(graft.meta.IceRead.table(spark, catalog, "nidx").count() == 3)
  }

  test("near-dup index: the hot-bucket cap applies to the INDEX side of the band join") {
    val catalog = freshCatalog()
    val b0 = Seq((1L, textA)).toDF("doc_id", "text")
    Dedup.incrementalMinHash(spark, catalog, "nidx", b0, "doc_id", "text", 0L).collect()
    // maxBucketSize = 0 drops EVERY bucket — batch and index side alike —
    // so an exact repeat of indexed content escapes the cross-run check.
    // If the cap were applied only within-batch, the repeat would still
    // be caught by the uncapped index join and get dropped.
    val b1 = Seq((9L, textA)).toDF("doc_id", "text")
    val out = Dedup.incrementalMinHash(spark, catalog, "nidx", b1, "doc_id", "text", 1L,
      maxBucketSize = 0)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(9L), "capped-out buckets must generate no cross-run candidates")
  }

  test("near-dup index: an all-near-dup batch emits nothing and commits nothing") {
    val catalog = freshCatalog()
    val b0 = Seq((1L, textA)).toDF("doc_id", "text")
    Dedup.incrementalMinHash(spark, catalog, "nidx", b0, "doc_id", "text", 0L).collect()
    val snapsBefore = graft.meta.IceRead.snapshots(spark, catalog, "nidx").count()
    val b1 = Seq((9L, textA + " extra")).toDF("doc_id", "text")
    val out = Dedup.incrementalMinHash(spark, catalog, "nidx", b1, "doc_id", "text", 1L)
    assert(out.isEmpty)
    assert(graft.meta.IceRead.snapshots(spark, catalog, "nidx").count() == snapsBefore,
      "an all-dup batch must not create a snapshot")
  }
}
