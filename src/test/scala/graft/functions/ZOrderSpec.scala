package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.meta.{IceRead, IceWrite, LocalCatalog, SchemaEvolution, SortField}

/** Z-order clustering: the interleave expression matches the driver-side
  * reference bit-for-bit, and a z-ordered table's zone maps prune files on
  * BOTH participating columns where a linear sort prunes only its own.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("interleaved expression matches the reference implementation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("a", "b")
    val got = df.select(ZOrder.interleaved(Seq(col("a"), col("b"))).as("z"))
      .as[Long].collect()
    val want = rows.map { case (a, b) => ZOrder.interleaveRef(Seq(a, b)) }
    assert(got.toSeq == want)

    // 3-column interleave, 8 bits
    val df3 = Seq((5L, 9L, 12L)).toDF("a", "b", "c")
    val z3 = df3.select(ZOrder.interleaved(Seq(col("a"), col("b"), col("c")), 8)).head.getLong(0)
    assert(z3 == ZOrder.interleaveRef(Seq(5L, 9L, 12L), 8))

    // key width guard
    intercept[IllegalArgumentException] {
      ZOrder.interleaved(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
  }

  test("scaledBucket clamps, handles nulls and degenerate domains") {
    val df = Seq[java.lang.Long](0L, 50L, 100L, null).toDF("v")
    val got = df.select(ZOrder.scaledBucket(col("v"), BigDecimal(0), BigDecimal(100), 4))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 8L, 15L, 0L)) // max clamps to buckets-1, null -> min bucket
    val degenerate = df.select(ZOrder.scaledBucket(col("v"), BigDecimal(7), BigDecimal(7), 4))
      .as[Long].collect().toSeq
    assert(degenerate.forall(_ == 0L))
  }

  test("zorder sort order prunes range reads on both columns; linear sort on one") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    // 64x64 grid; one write task sorts globally, ~256 rows/file -> 16 files
    val rows = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y").coalesce(1)

    IceWrite.create(spark, catalog, "t_z", rows,
      sortOrder = Seq(SortField(ZOrder.sortField("x", "y"))),
      targetFileSizeBytes = 65536)
    IceWrite.create(spark, catalog, "t_linear", rows,
      sortOrder = Seq(SortField("x")),
      targetFileSizeBytes = 65536)

    def scanned(table: String, colName: String): (Int, Int) = {
      val meta = catalog.loadTable(table)
      val snap = meta.currentSnapshot.get
      (IceRead.selectFilesByRange(meta, snap, colName, BigDecimal(0), BigDecimal(15)).size,
        snap.manifest.size)
    }

    val (zOnY, zTotal) = scanned("t_z", "y")
    val (linOnY, linTotal) = scanned("t_linear", "y")
    assert(zTotal >= 8 && linTotal >= 8, s"expected multi-file tables, got $zTotal/$linTotal")
    // linear-by-x files each span the full y domain: y-range prunes nothing
    assert(linOnY == linTotal, s"x-sorted files should all intersect a y range")
    // z-ordered files cover compact (x, y) blocks: most files prune away
    assert(zOnY * 2 <= zTotal, s"zorder scanned $zOnY of $zTotal files for a 1/4 y-range")

    // and the x column still prunes too (both tables)
    val (zOnX, _) = scanned("t_z", "x")
    assert(zOnX * 2 <= zTotal, s"zorder scanned $zOnX of $zTotal files for a 1/4 x-range")

    // correctness: the z-ordered MOR view has exactly the source rows
    val out = IceRead.table(spark, catalog, "t_z")
    assert(out.count() == 4096 && out.select(sum($"id")).head.getLong(0) == rows.select(sum($"id")).head.getLong(0))
  }

  test("updateSortOrder + compaction reclusters an existing table into zorder") {
    import graft.compaction.Compaction
    import graft.selection.{FullCompactionConfig, PlanningParams}
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    // ingest x-sorted (the natural arrival order): y ranges prune nothing
    val rows = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y").coalesce(1)
    IceWrite.create(spark, catalog, "t_recluster", rows,
      sortOrder = Seq(SortField("x")), targetFileSizeBytes = 65536)

    def scannedOnY(): (Int, Int) = {
      val meta = catalog.loadTable("t_recluster")
      val snap = meta.currentSnapshot.get
      (IceRead.selectFilesByRange(meta, snap, "y", BigDecimal(0), BigDecimal(15)).size,
        snap.manifest.count(_.content == graft.meta.FileContent.Data))
    }
    val (beforeY, beforeTotal) = scannedOnY()
    assert(beforeY == beforeTotal, "x-sorted layout: y range scans everything")

    // flip the declared order to zorder(x, y) and compact: the rewrite
    // derives the scaling domains from the manifest zone maps (no extra
    // agg pass) and writes the recrustered layout
    SchemaEvolution.updateSortOrder(catalog, "t_recluster",
      Seq(SortField(ZOrder.sortField("x", "y"))))
    // small byte target: the rewrite derives records-per-file from the
    // measured input bytes/record (~15 B/row here), so 4 KiB ~ 16 files
    new Compaction(catalog, "t_recluster", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      targetFileSizeBytes = 4096).compact()

    val (afterY, afterTotal) = scannedOnY()
    assert(afterTotal >= 4, s"expected a multi-file compacted table, got $afterTotal")
    assert(afterY * 2 <= afterTotal,
      s"recrustered table scanned $afterY of $afterTotal files for the same y range")
    assert(IceRead.table(spark, catalog, "t_recluster").count() == 4096)

    // sort columns must exist
    intercept[IllegalArgumentException] {
      SchemaEvolution.updateSortOrder(catalog, "t_recluster",
        Seq(SortField(ZOrder.sortField("x", "nope"))))
    }
  }
}
