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

  /** The every-append autoCompact hook has a COST envelope, not just a
    * file-count one: across N single-doc appends, total bytes physically
    * written must stay within the analytic bound
    * `N*maxFragment + k*(maxLive + maxFragment)` — N append fragments
    * (data + eq-delete file each) plus k rewrites whose output is at most
    * the live set they fold. The failure mode this pins down: a hook that
    * compacted on EVERY append would make k ~ N and blow the bound
    * (O(N^2) write amplification); the planner's MinSmallFilesCount
    * threshold is what rate-limits k. */
  test("write amplification across 50 single-doc appends stays under the analytic bound") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-wamp").toString)
    val n = 50
    val corpus = (1L to (n + 1).toLong).map(i =>
      (i, s"alpha beta gamma token$i")).toDF("doc_id", "text")
    TextIndex.build(spark, catalog, "tiw", corpus.filter($"doc_id" === 1), "doc_id", "text")
    (2L to (n + 1).toLong).foreach { i =>
      TextIndex.append(spark, catalog, "tiw",
        corpus.filter($"doc_id" === i), "doc_id", "text")
    }

    val meta = catalog.loadTable(TextIndex.postingsTable("tiw"))
    val snaps = meta.snapshots.sortBy(_.sequenceNumber)
    def isReplace(s: graft.meta.Snapshot): Boolean =
      s.summary.get("operation").contains("replace")

    // classify every physical file by the snapshot that FIRST references
    // it: append fragments vs rewrite outputs
    val firstSeen = scala.collection.mutable.LinkedHashMap.empty[String, graft.meta.Snapshot]
    for (s <- snaps; f <- s.manifest)
      if (!firstSeen.contains(f.resolutionKey)) firstSeen(f.resolutionKey) = s
    val everyFile = snaps.flatMap(_.manifest)
      .groupBy(_.resolutionKey).map(_._2.head).toSeq
    val totalWritten = everyFile.map(_.length).sum
    val bytesBySnap = everyFile.groupBy(f => firstSeen(f.resolutionKey).snapshotId)
      .map { case (sid, fs) => sid -> fs.map(_.length).sum }
    val (replaceSnaps, appendSnaps) = snaps.partition(isReplace)
    val k = replaceSnaps.size
    val nAppends = appendSnaps.size
    val maxFrag = appendSnaps.flatMap(s => bytesBySnap.get(s.snapshotId)).max
    val maxLive = snaps.map(
      _.manifest.filter(_.content == FileContent.Data).map(_.length).sum).max

    assert(k > 0, "50 fragmenting appends must have triggered maintenance")
    // the planner needs MinSmallFilesCount small files to trigger, so
    // rewrites are rate-limited to ~1 per (threshold - 1) appends (the
    // -1: a rewrite's own output file can count toward the next trigger)
    val kBound = nAppends / (graft.selection.Defaults.MinSmallFilesCount - 1) + 1
    assert(k <= kBound,
      s"$k rewrites across $nAppends appends — the every-append hook must be " +
        s"threshold-rate-limited to <= $kBound (MinSmallFilesCount = " +
        s"${graft.selection.Defaults.MinSmallFilesCount})")
    val bound = nAppends.toLong * maxFrag + k.toLong * (maxLive + maxFrag)
    assert(totalWritten <= bound,
      s"write amplification out of envelope: $totalWritten B written total " +
        s"across $nAppends append snapshots (max fragment $maxFrag B) and $k " +
        s"rewrites (max live $maxLive B); analytic bound " +
        s"N*maxFragment + k*(maxLive+maxFragment) = $bound B")

    // and the maintained index still serves exactly
    TextIndex.build(spark, catalog, "tiw_ref",
      corpus.filter($"doc_id" <= (n + 1).toLong), "doc_id", "text")
    val got = TextIndex.searchBm25(spark, catalog, "tiw", Seq("alpha", "beta"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = TextIndex.searchBm25(spark, catalog, "tiw_ref", Seq("alpha", "beta"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
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
