package graft.compaction

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.SparkTestBase
import graft.exec.{CompactionExecutor, RewriteRequest, RewriteResult, SparkExecutor}
import graft.meta._
import graft.selection.{FullCompactionConfig, PlanningParams}

/** Breakpoint resume: a crashed compaction rerun with the same runId
  * reuses journaled group rewrites and only executes the rest. */
class ResumableCompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  /** counts rewrites; throws once the allowance is exhausted. */
  private final class FlakyExecutor(allow: Int) extends CompactionExecutor {
    val calls = new AtomicInteger(0)
    override def rewriteFiles(spark: SparkSession, req: RewriteRequest): RewriteResult = {
      if (calls.incrementAndGet() > allow)
        throw new RuntimeException("injected crash after allowance")
      SparkExecutor.rewriteFiles(spark, req)
    }
  }

  private def params = PlanningParams(
    targetFileSizeBytes = 512L * 1024 * 1024,
    maxInputParallelism = 4, maxOutputParallelism = 1)

  /** day-partitioned events => one plan group per day. */
  private def mkTable(catalog: Catalog, name: String, days: Int): Long = {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .filter(dayofmonth(col("ts")) <= days)
    IceWrite.create(spark, catalog, name, events,
      partitionSpec = Seq(PartitionField("ts", "day")))
    events.count()
  }

  test("happy path: compactResumable == compact semantics, journal removed") {
    val catalog = LocalCatalog(Files.createTempDirectory("res-ok").toString)
    val rows = mkTable(catalog, "t", days = 3)
    val c = new Compaction(catalog, "t", spark, config = FullCompactionConfig(params))
    val res = c.compactResumable("run1")
    assert(res.addedFiles.nonEmpty)
    assert(IceRead.table(spark, catalog, "t").count() == rows)
    val journalPath = MetaIO.join(catalog.loadTable("t").location,
      "metadata", "rewrite-journal-run1.json")
    assert(!MetaIO.exists(journalPath), "journal must be deleted after commit")
  }

  test("crash after one group; resume rewrites only the remaining groups") {
    val catalog = LocalCatalog(Files.createTempDirectory("res-crash").toString)
    val rows = mkTable(catalog, "t", days = 3) // 3 day-groups
    val flaky = new FlakyExecutor(allow = 1)
    val crashed = new Compaction(catalog, "t", spark,
      config = FullCompactionConfig(params), executor = flaky,
      maxConcurrentPlans = 1) // deterministic: groups run in plan order
    val nPlans = crashed.planCompaction().size
    assert(nPlans == 3, s"expected one group per day, got $nPlans")
    intercept[Exception] { crashed.compactResumable("runX") }
    assert(flaky.calls.get() >= 2, "crash must happen on the second group")

    // journal survived the crash with exactly the completed rewrite
    val journalPath = MetaIO.join(catalog.loadTable("t").location,
      "metadata", "rewrite-journal-runX.json")
    assert(MetaIO.exists(journalPath), "journal must persist across the crash")
    // nothing was committed by the crashed run
    assert(catalog.loadTable("t").snapshots.size == 1)

    // resume with a counting (non-failing) executor and the same runId:
    // only the two remaining groups are rewritten
    val counter = new FlakyExecutor(allow = Int.MaxValue)
    val resumed = new Compaction(catalog, "t", spark,
      config = FullCompactionConfig(params), executor = counter,
      maxConcurrentPlans = 1, enableValidate = true)
    val res = resumed.compactResumable("runX")
    assert(counter.calls.get() == nPlans - 1,
      s"resume must reuse the journaled group: rewrote ${counter.calls.get()} of $nPlans")
    assert(res.addedFiles.size == nPlans, "all groups' outputs committed")
    assert(IceRead.table(spark, catalog, "t").count() == rows)
    assert(!MetaIO.exists(journalPath), "journal removed after the resumed commit")
  }

  test("a moved snapshot invalidates the journal: resume reruns everything") {
    val catalog = LocalCatalog(Files.createTempDirectory("res-stale").toString)
    val rows = mkTable(catalog, "t", days = 2)
    val flaky = new FlakyExecutor(allow = 1)
    val crashed = new Compaction(catalog, "t", spark,
      config = FullCompactionConfig(params), executor = flaky,
      maxConcurrentPlans = 1)
    intercept[Exception] { crashed.compactResumable("runY") }

    // concurrent append moves the head between crash and resume
    val extra = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .filter(dayofmonth(col("ts")) === 3)
    IceWrite.append(spark, catalog, "t", extra)

    val counter = new FlakyExecutor(allow = Int.MaxValue)
    val resumed = new Compaction(catalog, "t", spark,
      config = FullCompactionConfig(params), executor = counter,
      maxConcurrentPlans = 1)
    val plans = resumed.planCompaction().size
    resumed.compactResumable("runY")
    assert(counter.calls.get() == plans,
      "stale journal must be ignored — every group rewritten fresh")
    assert(IceRead.table(spark, catalog, "t").count() == rows + extra.count())
  }

  test("journal round-trip preserves entry fidelity (zone maps included)") {
    val catalog = LocalCatalog(Files.createTempDirectory("res-json").toString)
    mkTable(catalog, "t", days = 1)
    val j = new RewriteJournal(catalog, "t", "rt")
    assert(j.load(42L).isEmpty)
    val entry = FileEntry(path = "/w/a.parquet", length = 10L,
      content = FileContent.Data, recordCount = 3, sequenceNumber = 7,
      partitionValues = Map("ts" -> "2024-01-01"),
      columnStats = Map("value" -> ("1", "9")), nullCounts = Map("value" -> 0L))
    j.append("k1", Seq(entry))
    val back = new RewriteJournal(catalog, "t", "rt").load(42L)
    assert(back == Map("k1" -> Seq(entry)))
    // wrong snapshot: discarded
    assert(new RewriteJournal(catalog, "t", "rt").load(43L).isEmpty)
    j.delete()
  }
}
