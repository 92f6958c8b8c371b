package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{FileContent, IceRead, LocalCatalog}

/** The engine's own index tables maintain themselves: per-append upserts
  * fragment the postings/codes tables (one small data file + eq-delete
  * file per commit), and the append paths now run the auto-compaction
  * planner after every commit — below thresholds it is a metadata no-op,
  * above them the fragments fold back, and serve results never change. */
class IndexAutoMaintainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dataFileCount(catalog: LocalCatalog, table: String): Int =
    catalog.loadTable(table).currentSnapshot.get.manifest
      .count(_.content == FileContent.Data)

  test("repeated TextIndex appends stay bounded in file count; served scores unchanged") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-auto").toString)
    val corpus = (1L to 40L).map(i =>
      (i, s"apple banana word$i " + ("filler " * (i % 7).toInt))).toDF("doc_id", "text")

    TextIndex.build(spark, catalog, "tia", corpus.filter($"doc_id" <= 4), "doc_id", "text")
    // 12 single-doc appends: without maintenance the postings table would
    // accumulate >= 12 extra data files (plus eq-delete files)
    (5L to 16L).foreach { i =>
      TextIndex.append(spark, catalog, "tia",
        corpus.filter($"doc_id" === i), "doc_id", "text")
    }
    val postingsFiles = dataFileCount(catalog, TextIndex.postingsTable("tia"))
    assert(postingsFiles < 12,
      s"auto-maintenance should fold per-append fragments, got $postingsFiles files")
    // at least one maintenance rewrite actually committed
    val ops = catalog.loadTable(TextIndex.postingsTable("tia"))
      .snapshots.flatMap(_.summary.get("operation"))
    assert(ops.contains("replace"), s"no compaction snapshot found in $ops")

    // serve equivalence: a one-shot index over the same docs ranks identically
    TextIndex.build(spark, catalog, "tia_ref",
      corpus.filter($"doc_id" <= 16), "doc_id", "text")
    val maintained = TextIndex.searchBm25(spark, catalog, "tia", Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val reference = TextIndex.searchBm25(spark, catalog, "tia_ref", Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(maintained == reference)
  }

  test("repeated AnnIndex appends stay bounded; search results unchanged") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ann-auto").toString)
    AnnIndex.build(spark, catalog, "anna", embs.filter($"vec_id" < 30), "vec_id", "embedding",
      nCells = 4, m = 4, trainIters = 1)
    // 10 appends of 3 vectors each
    (0 until 10).foreach { b =>
      AnnIndex.append(spark, catalog, "anna",
        embs.filter($"vec_id" >= 30 + b * 3 && $"vec_id" < 33 + b * 3),
        "vec_id", "embedding")
    }
    val codesFiles = dataFileCount(catalog, AnnIndex.codesTable("anna"))
    assert(codesFiles < 10,
      s"auto-maintenance should fold per-append fragments, got $codesFiles files")
    assert(IceRead.table(spark, catalog, "anna__codes").count() == 60)

    // search still serves every indexed vector's self-match at rank 1
    val queries = embs.filter($"vec_id" >= 30 && $"vec_id" < 35)
      .select($"vec_id".as("q_id"), $"embedding")
    val res = AnnIndex.search(spark, catalog, "anna", queries, "q_id", "embedding",
      k = 3, nprobe = 4)
    assert(res.count() > 0)
  }
}
