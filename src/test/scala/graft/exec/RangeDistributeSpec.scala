package graft.exec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.compaction.Compaction
import graft.meta._
import graft.selection.{FullCompactionConfig, PlanningParams}

/** `write.distribution-mode=range`: sort-ordered compaction writes
  * globally ordered files with non-overlapping zone maps. */
class RangeDistributeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(java.nio.file.Files.createTempDirectory("range-wh").toString)

  /** ids 0..4095 arriving SHUFFLED (md5 order) in one file, so nothing is
    * clustered until a rewrite clusters it. */
  private def shuffledTable(catalog: Catalog, name: String): Unit = {
    val rows = (0L until 4096L).map(i => (i, s"v$i")).toDF("id", "v")
      .orderBy(md5(col("id").cast("string"))).coalesce(1)
    IceWrite.create(spark, catalog, name, rows, sortOrder = Seq(SortField("id")))
  }

  private def dataEntries(catalog: Catalog, name: String): Seq[FileEntry] =
    catalog.loadTable(name).currentSnapshot.get
      .manifest.filter(_.content == FileContent.Data)

  test("range mode: multi-file rewrite yields disjoint zone maps and 1-file range reads") {
    val catalog = freshCatalog()
    shuffledTable(catalog, "t")
    SchemaEvolution.updateProperties(catalog, "t",
      Map("write.distribution-mode" -> "range"))
    // the planning-time target must match the write-time target, or the
    // parallelism calculator hands the whole group to ONE writer (whose
    // rolling split is trivially contiguous) and the exchange under test
    // never happens
    new Compaction(catalog, "t", spark,
      config = FullCompactionConfig(
        PlanningParams(targetFileSizeBytes = 1024, maxOutputParallelism = 8)),
      targetFileSizeBytes = 1024).compact()

    val files = dataEntries(catalog, "t")
    assert(files.size >= 4, s"expected a multi-file rewrite, got ${files.size}")
    // globally ordered: per-file [min, max] of id must not overlap
    val ranges = files.map(_.columnStats("id"))
      .map { case (mn, mx) => (BigDecimal(mn), BigDecimal(mx)) }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping zone maps: $ranges")
      case _ => ()
    }
    // a narrow range read scans exactly one file
    val meta = catalog.loadTable("t")
    val snap = meta.currentSnapshot.get
    val hit = IceRead.selectFilesByRange(meta, snap, "id", BigDecimal(10), BigDecimal(20))
    assert(hit.size == 1, s"narrow range hit ${hit.size} of ${files.size} files")
    // content intact and globally readable
    val got = IceRead.tableRange(spark, catalog, "t", "id", BigDecimal(10), BigDecimal(20))
    assert(got.count() == 11L)
    assert(IceRead.table(spark, catalog, "t").count() == 4096L)
  }

  test("default mode unchanged: round-robin output overlaps, rows preserved") {
    val catalog = freshCatalog()
    shuffledTable(catalog, "t")
    new Compaction(catalog, "t", spark,
      config = FullCompactionConfig(
        PlanningParams(targetFileSizeBytes = 1024, maxOutputParallelism = 8)),
      targetFileSizeBytes = 1024).compact()
    val files = dataEntries(catalog, "t")
    assert(files.size >= 4)
    // round-robin spreads the shuffled input: every file spans ~the whole
    // domain, so a narrow range prunes nothing (this is exactly the
    // behavior range mode exists to fix)
    val meta = catalog.loadTable("t")
    val snap = meta.currentSnapshot.get
    val hit = IceRead.selectFilesByRange(meta, snap, "id", BigDecimal(10), BigDecimal(20))
    assert(hit.size == files.size)
    assert(IceRead.table(spark, catalog, "t").count() == 4096L)
  }

  test("range mode composes with partition fan-out: per-partition files stay disjoint") {
    val catalog = freshCatalog()
    val rows = (0L until 2048L).map(i => (i, (i % 2).toString)).toDF("id", "p")
      .orderBy(md5(col("id").cast("string"))).coalesce(1)
    IceWrite.create(spark, catalog, "tp", rows,
      partitionSpec = Seq(PartitionField("p")), sortOrder = Seq(SortField("id")))
    SchemaEvolution.updateProperties(catalog, "tp",
      Map("write.distribution-mode" -> "range"))
    new Compaction(catalog, "tp", spark,
      config = FullCompactionConfig(
        PlanningParams(targetFileSizeBytes = 512, maxOutputParallelism = 8)),
      targetFileSizeBytes = 512).compact()
    val files = dataEntries(catalog, "tp")
    // within each partition, zone maps must be disjoint
    for ((_, fs) <- files.groupBy(_.partitionValues) if fs.size > 1) {
      val ranges = fs.map(_.columnStats("id"))
        .map { case (mn, mx) => (BigDecimal(mn), BigDecimal(mx)) }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap in partition: $ranges")
        case _ => ()
      }
    }
    assert(IceRead.table(spark, catalog, "tp").count() == 2048L)
  }
}
