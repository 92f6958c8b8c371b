package graft.compaction

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import graft.exec.RewriteStats

/** Lightweight metrics registry mirroring the reference's counter set
  * (core/src/common/metrics.rs:24-52): commit outcomes, rewrite volumes,
  * durations. In-JVM atomics; on a cluster these would surface through a
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

  def recordRewrite(s: RewriteStats): Unit = {
    rewriteCount.incrementAndGet()
    inputFiles.addAndGet(s.inputFiles)
    inputBytes.addAndGet(s.inputBytes)
    outputFiles.addAndGet(s.outputFiles)
    outputBytes.addAndGet(s.outputBytes)
    outputRecords.addAndGet(s.outputRecords)
    rewriteMillis.addAndGet(s.durationMs)
  }

  def counter(name: String): AtomicLong = custom.getOrElseUpdate(name, new AtomicLong)

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
}
