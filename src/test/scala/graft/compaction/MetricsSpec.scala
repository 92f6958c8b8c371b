package graft.compaction

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.selection._
import graft.testkit.FileGenerator

/** Histograms (op 41): bucket placement math and end-to-end recording
  * through a real compaction, mirroring the reference's distribution
  * metrics (metrics.rs:58-92). */
class MetricsSpec extends AnyFunSuite {

  test("exponential histogram places values in le-buckets with overflow") {
    val h = new Histogram(1000.0, 4.0, 8)
    assert(h.bounds == IndexedSeq(1000.0, 4000.0, 16000.0, 64000.0,
      256000.0, 1024000.0, 4096000.0, 16384000.0))
    h.record(500.0)       // <= 1000
    h.record(1000.0)      // <= 1000 (boundary inclusive)
    h.record(1001.0)      // <= 4000
    h.record(20.0e6)      // overflow
    val s = h.snapshot
    assert(s.count == 4 && s.sum == 500.0 + 1000.0 + 1001.0 + 20.0e6)
    assert(s.cumulativeCounts == IndexedSeq(2L, 3L, 3L, 3L, 3L, 3L, 3L, 3L, 4L))
  }

  test("file-count and size envelopes match the reference design") {
    val files = new Histogram(1.0, 2.0, 13)
    assert(files.bounds.last == 4096.0) // ~4096 files ceiling
    val bytes = new Histogram(1024.0 * 1024.0, 4.0, 12)
    assert(bytes.bounds.last == 1024.0 * 1024.0 * math.pow(4.0, 11)) // ~4TiB+
    files.record(5.0); bytes.record(3.0 * 1024 * 1024)
    assert(files.snapshot.cumulativeCounts(2) == 0 && files.snapshot.cumulativeCounts(3) == 1) // 5 <= 8
    assert(bytes.snapshot.cumulativeCounts(0) == 0 && bytes.snapshot.cumulativeCounts(1) == 1) // 3MiB <= 4MiB
  }

  test("dynamic size estimation smooths observed output ratios (factor 0.3)") {
    val e = new SizeEstimator()
    assert(e.estimate.isEmpty)
    e.observe(1000L, 10L) // 100 B/record
    assert(e.estimate.contains(100.0))
    e.observe(2000L, 10L) // 200 B/record -> 100 + 0.3*(200-100)
    assert(e.estimate.contains(130.0))
    e.observe(0L, 0L) // empty rewrites don't poison the estimate
    assert(e.estimate.contains(130.0))

    // wired through a real compaction: the estimator learns the actual
    // output ratio of the files it wrote
    val spark = SparkTestBase.spark
    val catalog = graft.meta.LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    FileGenerator.writeTable(spark, catalog, "t_dyn", src,
      FileGenerator.Config(dataFileCount = 4, orderCol = "n_nationkey"))
    val c = new Compaction(catalog, "t_dyn", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      enableDynamicSizeEstimation = true)
    val result = c.compact()
    val expected = result.stats.map(_.outputBytes).sum.toDouble /
      result.stats.map(_.outputRecords).sum
    assert(c.sizeEstimator.estimate.exists(v => math.abs(v - expected) < 1e-9))
  }

  test("a real compaction records duration, file-count and size distributions") {
    val spark = SparkTestBase.spark
    val catalog = graft.meta.LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    FileGenerator.writeTable(spark, catalog, "t_hist", src,
      FileGenerator.Config(dataFileCount = 4, orderCol = "n_nationkey"))
    val m = new Metrics
    new Compaction(catalog, "t_hist", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      metrics = m).compact()

    val h = m.histogramSnapshots
    assert(h("rewrite_duration_ms").count == 1)
    assert(h("compaction_duration_ms").count == 1)
    assert(h("plan_file_count").count == 1)
    // 4 input files -> cumulative count at le=4 (index 2) is 1
    assert(h("plan_file_count").cumulativeCounts(2) == 1)
    assert(h("plan_size_bytes").count == 1 && h("plan_size_bytes").sum > 0)
    // +Inf bucket always equals total count
    h.values.foreach(s => assert(s.cumulativeCounts.last == s.count))
  }

  test("progress callback ticks planned -> per-group rewriting -> committed") {
    val spark = SparkTestBase.spark
    val catalog = graft.meta.LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    FileGenerator.writeTable(spark, catalog, "t_prog", src,
      FileGenerator.Config(dataFileCount = 4, orderCol = "n_nationkey"))
    val ticks = new java.util.concurrent.ConcurrentLinkedQueue[CompactionProgress]
    new Compaction(catalog, "t_prog", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      onProgress = ticks.add(_): Unit).compact()
    val seq = ticks.toArray(Array.empty[CompactionProgress]).toSeq
    val total = seq.head.plansTotal
    assert(total >= 1 && seq.head.phase == "planned" && seq.head.plansDone == 0)
    val rewrites = seq.filter(_.phase == "rewriting")
    assert(rewrites.size == total, "one rewriting tick per plan")
    assert(rewrites.map(_.plansDone).sorted == (1 to total),
      "plansDone counts up monotonically across worker threads")
    assert(rewrites.map(_.bytesDone).max == seq.head.bytesTotal,
      "the last rewriting tick accounts for every planned input byte")
    assert(seq.last.phase == "committed" && seq.last.plansDone == total &&
      seq.last.bytesDone == seq.last.bytesTotal)
  }
}
