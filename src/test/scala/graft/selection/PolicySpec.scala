package graft.selection

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.compaction.Compaction
import graft.exec.ParquetWriteConfig
import graft.meta._

/** The built-in compaction policies (reference roadmap README.md:54) and
  * the parquet writer tunables (write_parquet_properties,
  * config/mod.rs:403). */
class PolicySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = spark.read.parquet(s"$sf/events.parquet")
    .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  private def entry(path: String, day: String, len: Long = 1000L): FileEntry =
    FileEntry(path = path, length = len, content = FileContent.Data,
      recordCount = 10, sequenceNumber = 1,
      partitionValues = Map("ts" -> day))

  test("TimePartitionFilter: literal-ordered bounds, unknown values excluded") {
    val files = Seq(
      entry("/a", "2024-01-03"), entry("/b", "2024-01-05"),
      entry("/c", "2024-01-07"),
      entry("/d", "2024-01-04").copy(partitionValues = Map.empty), // marked/foreign
      entry("/e", "2024-01-04").copy(partitionValues = Map("other" -> "x")))
    val older = TimePartitionFilter("ts", olderThan = Some("2024-01-05"))
    assert(older.filter(files).map(_.path) == Seq("/a"))
    val window = TimePartitionFilter("ts",
      olderThan = Some("2024-01-07"), newerThan = Some("2024-01-04"))
    assert(window.filter(files).map(_.path) == Seq("/b"))
    val newer = TimePartitionFilter("ts", newerThan = Some("2024-01-05"))
    assert(newer.filter(files).map(_.path) == Seq("/b", "/c"))
  }

  test("CostBudget: benefit-per-byte ranking under a byte budget, deterministic") {
    def group(paths: Seq[String], size: Long, deletes: Int): FileGroup =
      FileGroup(
        dataFiles = paths.map(p => entry(p, "2024-01-01", size / paths.size)),
        positionDeleteFiles = (0 until deletes).map(i =>
          entry(s"${paths.head}-del$i", "2024-01-01", 10L)
            .copy(content = FileContent.PositionDeletes)),
        equalityDeleteFiles = Nil)
    val hot = group(Seq("/h1", "/h2"), 1000L, 3)    // score = (3*4 + 1) / 1000 = .013
    val mid = group(Seq("/m1", "/m2", "/m3"), 3000L, 0) // score = 2 / 3000 ≈ .00067
    val cold = group(Seq("/c1"), 8000L, 0)          // score = 0
    val budget = CostBudget(maxRewriteBytes = 4500L)
    assert(budget.score(hot) > budget.score(mid) && budget.score(mid) > budget.score(cold))
    // hot (1000) + mid (3000) fit; cold (8000) would overflow
    val kept = budget.filterGroups(Seq(cold, mid, hot))
    assert(kept.map(_.dataFiles.head.path).toSet == Set("/m1", "/h1"))
    // planning order preserved for the kept set
    assert(kept.map(_.dataFiles.head.path) == Seq("/m1", "/h1"))
    // a tight budget keeps only the densest group
    assert(CostBudget(1500L).filterGroups(Seq(cold, mid, hot))
      .map(_.dataFiles.head.path) == Seq("/h1"))
  }

  test("PolicyConfig composes through PlanStrategy.fromConfig") {
    val cfg = PolicyConfig(
      FullCompactionConfig(),
      extraFileFilters = Seq(TimePartitionFilter("ts", olderThan = Some("2024-01-03"))),
      extraGroupFilters = Seq(CostBudget(10000L)))
    val strat = PlanStrategy.fromConfig(cfg)
    assert(strat.describe.contains("TimePartitionFilter") &&
      strat.describe.contains("CostBudget"))
    // two old-day files (a mergeable group: benefit > 0) + one hot-day file
    val files = Seq(entry("/a", "2024-01-01"), entry("/a2", "2024-01-01"),
      entry("/b", "2024-01-09"))
    val groups = strat.execute(files, cfg.params, _ => None)
    assert(groups.flatMap(_.dataFiles).map(_.path) == Seq("/a", "/a2"))
  }

  test("time-based policy compacts only days older than the cutoff; rows invariant") {
    val catalog = LocalCatalog(Files.createTempDirectory("pol-time").toString)
    IceWrite.create(spark, catalog, "ev_pol", events.filter(dayofmonth(col("ts")) <= 6),
      partitionSpec = Seq(PartitionField("ts", "day")))
    val meta = catalog.loadTable("ev_pol")
    val before = meta.currentSnapshot.get.manifest
    val hotPaths = before.filter(_.partitionValues("ts") >= "2024-01-04").map(_.path).toSet
    assert(hotPaths.nonEmpty)
    val total = IceRead.table(spark, catalog, "ev_pol").count()

    val res = new Compaction(catalog, "ev_pol", spark,
      config = CompactionPolicy.timeBased(meta, olderThan = Some("2024-01-04")),
      targetFileSizeBytes = 512L * 1024 * 1024).compact()
    assert(res.addedFiles.nonEmpty, "cold days must have been rewritten")

    val after = catalog.loadTable("ev_pol").currentSnapshot.get.manifest
    // the hot days' files survive untouched, byte-for-byte
    assert(after.map(_.path).toSet.intersect(hotPaths) == hotPaths)
    // every rewritten (new) file belongs to a cold day
    val newFiles = after.filterNot(f => before.exists(_.path == f.path))
    assert(newFiles.nonEmpty && newFiles.forall(_.partitionValues("ts") < "2024-01-04"))
    assert(IceRead.table(spark, catalog, "ev_pol").count() == total)
  }

  test("time-based policy refuses tables without a time transform") {
    val meta = TableMetadata(name = "flat", location = "", formatVersion = 2,
      schema = Seq(SchemaField(1, "id", "BIGINT")), partitionSpec = Nil)
    val e = intercept[RuntimeException] {
      CompactionPolicy.timeBased(meta, olderThan = Some("2024-01-01"))
    }
    assert(e.getMessage.contains("no time-transform"))
  }

  test("cost-optimized policy stays under the rewrite-byte budget end to end") {
    val catalog = LocalCatalog(Files.createTempDirectory("pol-cost").toString)
    IceWrite.create(spark, catalog, "ev_cost", events.filter(dayofmonth(col("ts")) <= 6),
      partitionSpec = Seq(PartitionField("ts", "day")))
    // second batch -> 2 files per day: every group has benefit > 0
    // (a cost policy never admits zero-benefit groups)
    IceWrite.append(spark, catalog, "ev_cost", events.filter(dayofmonth(col("ts")) <= 6))
    val before = catalog.loadTable("ev_cost").currentSnapshot.get.manifest
    val totalBytes = before.map(_.length).sum
    val budget = totalBytes / 2
    val c = new Compaction(catalog, "ev_cost", spark,
      config = CompactionPolicy.costOptimized(budget,
        base = FullCompactionConfig()),
      targetFileSizeBytes = 512L * 1024 * 1024)
    val plans = c.planCompaction()
    assert(plans.nonEmpty, "budget admits at least the densest groups")
    val planned = plans.map(_.fileGroup.totalSize).sum
    assert(planned <= budget,
      s"planned rewrite bytes $planned must stay under the $budget budget")
    // and the one-shot run is a normal correct compaction of that subset
    val total = IceRead.table(spark, catalog, "ev_cost").count()
    c.compact()
    assert(IceRead.table(spark, catalog, "ev_cost").count() == total)
  }

  test("Iceberg write.parquet.* table properties drive every writer") {
    import scala.jdk.CollectionConverters._
    val catalog = LocalCatalog(Files.createTempDirectory("pol-prop").toString)
    IceWrite.create(spark, catalog, "t_prop",
      spark.read.parquet(s"$sf/nation.parquet"),
      extraProperties = Map("write.parquet.compression-codec" -> "snappy"))
    IceWrite.append(spark, catalog, "t_prop", spark.read.parquet(s"$sf/nation.parquet"))
    new Compaction(catalog, "t_prop", spark,
      config = FullCompactionConfig(),
      targetFileSizeBytes = 512L * 1024 * 1024).compact()
    val conf = spark.sessionState.newHadoopConf()
    val files = catalog.loadTable("t_prop").currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data)
    assert(files.nonEmpty)
    // the create write, the append write, and the compaction rewrite all
    // honored the table property (only compaction outputs survive here,
    // but a wrong codec anywhere would surface as a mixed set pre-compact)
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.path), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val codecs = r.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala).map(_.getCodec.toString).toSet
        assert(codecs == Set("SNAPPY"), s"expected SNAPPY, got $codecs in ${f.path}")
      } finally r.close()
    }
  }

  test("parquet writer tunables reach the rewritten files") {
    import scala.jdk.CollectionConverters._
    val catalog = LocalCatalog(Files.createTempDirectory("pol-pq").toString)
    // lineitem (~6k rows): enough buffered bytes to exercise row-group splits
    IceWrite.create(spark, catalog, "ev_pq",
      spark.read.parquet(s"$sf/lineitem.parquet"))
    new Compaction(catalog, "ev_pq", spark,
      config = FullCompactionConfig(),
      targetFileSizeBytes = 512L * 1024 * 1024,
      parquetWrite = ParquetWriteConfig(
        compression = "gzip",
        rowGroupBytes = 64L * 1024,
        dictionaryEnabled = Some(false))).compact()
    val files = catalog.loadTable("ev_pq").currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data)
    assert(files.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.path), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks.asScala
        val codecs = blocks.flatMap(_.getColumns.asScala).map(_.getCodec.toString).toSet
        assert(codecs == Set("GZIP"), s"expected GZIP everywhere, got $codecs")
        // 64 KiB row groups over this slice must split into several groups
        assert(blocks.size > 1,
          s"tiny rowGroupBytes must yield multiple row groups, got ${blocks.size}")
      } finally r.close()
    }
  }
}
