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
}
