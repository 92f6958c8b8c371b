package graft.compaction

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import graft.exec.RewriteStats

/** Exponential-bucket histogram (thread-safe), the Prometheus-style
  * distribution the reference records for durations / file counts / bytes
  * (core/src/common/metrics.rs:58-92, `Buckets::exponential`). Bucket i
  * counts observations `<= start * factor^i` (cumulative le-semantics at
  * snapshot time, like Prometheus), with a +Inf overflow bucket, plus
  * running sum and count.
  */
final class Histogram(val start: Double, val factor: Double, val bucketCount: Int) {
  /** upper bounds, ascending; observations above the last land in +Inf. */
  val bounds: IndexedSeq[Double] =
    (0 until bucketCount).map(i => start * math.pow(factor, i.toDouble))
  private val perBucket = Array.fill(bucketCount + 1)(new AtomicLong) // + overflow
  private val totalSum = new java.util.concurrent.atomic.DoubleAdder
  private val totalCount = new AtomicLong

  def record(value: Double): Unit = {
    val i = bounds.indexWhere(value <= _)
    perBucket(if (i < 0) bucketCount else i).incrementAndGet()
    totalSum.add(value)
    totalCount.incrementAndGet()
  }

  /** Cumulative counts per `le` bound (+Inf last), plus (sum, count). */
  def snapshot: HistogramSnapshot = {
    val raw = perBucket.map(_.get)
    val cumulative = raw.scanLeft(0L)(_ + _).drop(1)
    HistogramSnapshot(bounds, cumulative.toIndexedSeq, totalSum.sum(), totalCount.get)
  }
}

final case class HistogramSnapshot(
    bounds: IndexedSeq[Double],
    cumulativeCounts: IndexedSeq[Long], // one per bound, +Inf last
    sum: Double,
    count: Long)

/** Metrics registry mirroring the reference's counter AND histogram set
  * (core/src/common/metrics.rs:24-92): commit outcomes, rewrite volumes,
  * and duration/file-count/bytes distributions with the reference's
  * designed bucket envelopes (1s x4 ^8 for durations ~= 4.5h ceiling,
  * 1 x2 ^13 for file counts ~= 4096 files, 1MiB x4 ^12 ~= 16TB). In-JVM
  * atomics; on a cluster these would surface through a
  * SparkListener/accumulators — the recording API stays the same. */
final class Metrics {
  val commitSucceeded = new AtomicLong
  val commitFailed = new AtomicLong
  val rewriteCount = new AtomicLong
  val inputFiles = new AtomicLong
  val inputBytes = new AtomicLong
  val outputFiles = new AtomicLong
  val outputBytes = new AtomicLong
  val outputRecords = new AtomicLong
  val rewriteMillis = new AtomicLong
  private val custom = TrieMap.empty[String, AtomicLong]

  // histogram envelopes from metrics.rs:58-72
  val rewriteDurationMs = new Histogram(1000.0, 4.0, 8) // per-plan exec duration
  val compactionDurationMs = new Histogram(1000.0, 4.0, 8) // whole compact() run
  val planFileCount = new Histogram(1.0, 2.0, 13) // files per plan
  val planSizeBytes = new Histogram(1024.0 * 1024.0, 4.0, 12) // input bytes per plan

  def recordRewrite(s: RewriteStats): Unit = {
    rewriteCount.incrementAndGet()
    inputFiles.addAndGet(s.inputFiles)
    inputBytes.addAndGet(s.inputBytes)
    outputFiles.addAndGet(s.outputFiles)
    outputBytes.addAndGet(s.outputBytes)
    outputRecords.addAndGet(s.outputRecords)
    rewriteMillis.addAndGet(s.durationMs)
    rewriteDurationMs.record(s.durationMs.toDouble)
    planFileCount.record(s.inputFiles.toDouble)
    planSizeBytes.record(s.inputBytes.toDouble)
  }

  def recordCompaction(durationMs: Long): Unit =
    compactionDurationMs.record(durationMs.toDouble)

  def counter(name: String): AtomicLong = custom.getOrElseUpdate(name, new AtomicLong)

  private val customHists = TrieMap.empty[String, Histogram]

  /** Named histogram with the given envelope, created on first use —
    * how the serve layer rolls per-table distributions (scan planning
    * latency, result file counts, commit durations) into this registry
    * alongside the fixed compaction set. The (start, factor, buckets)
    * of the FIRST call wins for a name; callers use one envelope per
    * metric family, like the reference's designed buckets. */
  def histogram(name: String, start: Double, factor: Double,
      bucketCount: Int): Histogram =
    customHists.getOrElseUpdate(name, new Histogram(start, factor, bucketCount))

  def snapshot: Map[String, Long] = Map(
    "commit_succeeded" -> commitSucceeded.get,
    "commit_failed" -> commitFailed.get,
    "rewrite_count" -> rewriteCount.get,
    "input_files" -> inputFiles.get,
    "input_bytes" -> inputBytes.get,
    "output_files" -> outputFiles.get,
    "output_bytes" -> outputBytes.get,
    "output_records" -> outputRecords.get,
    "rewrite_millis" -> rewriteMillis.get
  ) ++ custom.map { case (k, v) => k -> v.get }

  def histogramSnapshots: Map[String, HistogramSnapshot] = Map(
    "rewrite_duration_ms" -> rewriteDurationMs.snapshot,
    "compaction_duration_ms" -> compactionDurationMs.snapshot,
    "plan_file_count" -> planFileCount.snapshot,
    "plan_size_bytes" -> planSizeBytes.snapshot
  ) ++ customHists.map { case (k, h) => k -> h.snapshot }
}
