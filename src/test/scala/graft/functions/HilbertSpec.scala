package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.meta.{IceRead, IceWrite, LocalCatalog, SchemaEvolution, SortField}

/** Hilbert clustering: the codegen'd expression matches the reference
  * walk bit-for-bit, the curve is a genuine Hamiltonian path of the grid
  * (the locality property z-order lacks), and a hilbert(x, y) sort order
  * flows through updateSortOrder + compaction to prune on both columns. */
class HilbertSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("expression matches the reference implementation; inputs masked to grid") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("a", "b")
      .select(HilbertCurve.hilbertD2(col("a"), col("b"), 16).as("h"))
      .as[Long].collect()
    val want = rows.map { case (a, b) => HilbertCurve.hilbertRef(a, b, 16) }
    assert(got.toSeq == want)
    // out-of-grid values mask in rather than corrupt
    assert(HilbertCurve.hilbertRef(256 + 3, 5, 8) == HilbertCurve.hilbertRef(3, 5, 8))
  }

  test("the curve is a Hamiltonian path: bijective, consecutive cells grid-adjacent") {
    val bits = 5 // 32x32 grid, 1024 cells
    val n = 1L << bits
    val cells = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val ds = cells.map { case (x, y) => HilbertCurve.hilbertRef(x, y, bits) }
    assert(ds.toSet == (0L until n * n).toSet) // bijection onto [0, n^2)
    // inverse agrees, and consecutive indices are grid neighbors
    var d = 0L
    var prev = HilbertCurve.d2xyRef(0L, bits)
    assert(HilbertCurve.hilbertRef(prev._1, prev._2, bits) == 0L)
    while (d < n * n - 1) {
      val next = HilbertCurve.d2xyRef(d + 1, bits)
      assert(HilbertCurve.hilbertRef(next._1, next._2, bits) == d + 1)
      val dist = math.abs(next._1 - prev._1) + math.abs(next._2 - prev._2)
      assert(dist == 1L, s"curve jumps at d=$d: $prev -> $next")
      prev = next
      d += 1
    }
  }

  test("hilbert beats z-order on file bounding boxes at non-aligned splits") {
    // the pruning-relevant metric: cut the keyspace into F consecutive
    // ranges (files) and sum each file's cell bounding-box area — the
    // region its zone map claims. At power-of-4 F both curves fill
    // quadrants exactly; at every OTHER F (where real size-targeted file
    // boundaries land) z-order's quadrant seams inflate the boxes while
    // hilbert's connected ranges stay tight.
    val bits = 5
    val n = (1L << bits).toInt
    val hCells = Array.ofDim[(Int, Int)](n * n)
    val zCells = Array.ofDim[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      hCells(HilbertCurve.hilbertRef(x, y, bits).toInt) = (x, y)
      zCells(ZOrder.interleaveRef(Seq(x, y), bits).toInt) = (x, y)
    }
    // z's consecutive-key seam jump spans the grid; hilbert's never
    // exceeds 1 (proven cell-by-cell in the Hamiltonian test above)
    val zJump = (0 until n * n - 1).map { d =>
      math.abs(zCells(d)._1 - zCells(d + 1)._1) +
        math.abs(zCells(d)._2 - zCells(d + 1)._2)
    }.max
    assert(zJump >= n, s"expected a z seam jump spanning the grid, got $zJump")

    def bboxSum(cells: Array[(Int, Int)], files: Int): Long =
      (0 until files).map { f =>
        val lo = cells.length * f / files; val hi = cells.length * (f + 1) / files
        val pts = cells.slice(lo, hi)
        val xs = pts.map(_._1); val ys = pts.map(_._2)
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
      }.sum
    for (files <- Seq(6, 10, 12, 20, 24)) {
      val h = bboxSum(hCells, files); val z = bboxSum(zCells, files)
      assert(h < z, s"files=$files: hilbert bbox=$h !< zorder bbox=$z")
    }
  }

  test("updateSortOrder + compaction reclusters into hilbert; prunes both columns") {
    import graft.compaction.Compaction
    import graft.selection.{FullCompactionConfig, PlanningParams}
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val rows = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y").coalesce(1)
    IceWrite.create(spark, catalog, "t_hilbert", rows,
      sortOrder = Seq(SortField("x")), targetFileSizeBytes = 65536)

    def scanned(colName: String): (Int, Int) = {
      val meta = catalog.loadTable("t_hilbert")
      val snap = meta.currentSnapshot.get
      (IceRead.selectFilesByRange(meta, snap, colName, BigDecimal(0), BigDecimal(15)).size,
        snap.manifest.count(_.content == graft.meta.FileContent.Data))
    }
    val (beforeY, beforeTotal) = scanned("y")
    assert(beforeY == beforeTotal, "x-sorted layout: y range scans everything")

    SchemaEvolution.updateSortOrder(catalog, "t_hilbert",
      Seq(SortField(HilbertCurve.sortField("x", "y"))))
    new Compaction(catalog, "t_hilbert", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      targetFileSizeBytes = 4096).compact()

    val (afterY, afterTotal) = scanned("y")
    assert(afterTotal >= 4, s"expected a multi-file compacted table, got $afterTotal")
    assert(afterY * 2 <= afterTotal,
      s"hilbert table scanned $afterY of $afterTotal files for a 1/4 y range")
    val (afterX, _) = scanned("x")
    assert(afterX * 2 <= afterTotal,
      s"hilbert table scanned $afterX of $afterTotal files for a 1/4 x range")

    // correctness: reclustering changed layout, not content
    val out = IceRead.table(spark, catalog, "t_hilbert")
    assert(out.count() == 4096 &&
      out.select(sum($"id")).head.getLong(0) == rows.select(sum($"id")).head.getLong(0))

    // schema validation still rejects unknown inner columns
    intercept[IllegalArgumentException] {
      SchemaEvolution.updateSortOrder(catalog, "t_hilbert",
        Seq(SortField(HilbertCurve.sortField("x", "nope"))))
    }
  }
}
