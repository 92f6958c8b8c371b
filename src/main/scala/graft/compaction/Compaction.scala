package graft.compaction

import java.nio.file.Paths
import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.meta._
import graft.selection._
import graft.exec._

/** A planned unit of work: one file group against one snapshot of one
  * branch (core/src/compaction/mod.rs:1227-1235). */
final case class CompactionPlan(
    fileGroup: FileGroup,
    toBranch: String,
    snapshotId: Long
)

final case class RewriteOutcome(plan: CompactionPlan, result: RewriteResult)

/** One progress tick of a managed compaction run — phase is "planned",
  * "rewriting" (per completed group), or "committed". Byte figures are
  * planned INPUT bytes, known at planning time, so a display can show a
  * meaningful fraction before the first rewrite finishes. */
final case class CompactionProgress(
    phase: String,
    plansTotal: Int,
    plansDone: Int,
    bytesTotal: Long,
    bytesDone: Long)

final case class CompactionResult(
    addedFiles: Seq[FileEntry],
    stats: Seq[RewriteStats],
    table: Option[TableMetadata]
)

final case class CommitRetryConfig(
    maxRetries: Int = 3,
    initialDelayMs: Long = 1000L,
    maxDelayMs: Long = 10000L
)

/** Exponentially-smoothed OUTPUT bytes/record, shared across a run's
  * rewrite plans (the reference's dynamic size estimation,
  * config/mod.rs:37-38, smoothing factor 0.3): the first plan sizes files
  * from the input ratio (compressed-input bytes underestimate output
  * ratio after compaction rewrites), later plans from what was actually
  * written. Thread-safe — plans run concurrently. */
final class SizeEstimator(val smoothing: Double = Defaults.SizeEstimationSmoothingFactor) {
  private val state = new java.util.concurrent.atomic.AtomicReference[Option[Double]](None)
  def estimate: Option[Double] = state.get
  def observe(outputBytes: Long, outputRecords: Long): Unit =
    if (outputRecords > 0 && outputBytes > 0) {
      val obs = outputBytes.toDouble / outputRecords
      state.updateAndGet {
        case Some(e) => Some(e + smoothing * (obs - e))
        case None    => Some(obs)
      }: Unit
    }
}

/** The managed compaction workflow over the local table format, keeping the
  * reference's composable 3-method public API (plan / rewrite / commit) plus
  * the one-shot `compact()` (core/src/compaction/mod.rs:193-303).
  */
final class Compaction(
    val catalog: Catalog,
    val tableName: String,
    val spark: SparkSession,
    val config: PlanningConfig = SmallFilesConfig(),
    val executor: CompactionExecutor = SparkExecutor,
    val toBranch: String = "main",
    val targetFileSizeBytes: Long = Defaults.TargetFileSize,
    val maxConcurrentPlans: Int = Defaults.MaxConcurrentCompactionPlans,
    val enableValidate: Boolean = false,
    val retry: CommitRetryConfig = CommitRetryConfig(),
    val metrics: Metrics = new Metrics,
    val enableDynamicSizeEstimation: Boolean = Defaults.EnableDynamicSizeEstimation,
    val sizeEstimator: SizeEstimator = new SizeEstimator(),
    /** after a successful commit, also fold now-dangling delete files out
      * of the manifest (Maintenance.removeDanglingDeletes) — off by
      * default to keep commit latency flat. */
    val cleanupDanglingDeletes: Boolean = false,
    /** identifier normalization for the rewrite's column resolution — the
      * reference's `enable_ident_normalization` (datafusion_processor.rs:
      * 65-71), mapped to Spark's `spark.sql.caseSensitive` (normalization
      * ON == case-INsensitive resolution, both defaults). Applied through
      * a scoped (cloned) session so the caller's conf is never mutated;
      * with normalization on, manifest column names whose case drifted
      * from the files' still resolve. */
    val enableIdentNormalization: Boolean = true,
    /** parquet writer tunables for rewritten files — the reference's
      * `write_parquet_properties` (config/mod.rs:403); defaults keep
      * reference parity (zstd, 128 MiB row groups). The table's own
      * Iceberg `write.parquet.*` properties override per field. */
    val parquetWrite: graft.exec.ParquetWriteConfig = graft.exec.ParquetWriteConfig(),
    /** live progress callback (reference roadmap "Job progress display",
      * README.md:66): fired once after planning, per completed group
      * rewrite (from the worker thread that finished it), and after the
      * commit. No-op by default. */
    val onProgress: CompactionProgress => Unit = _ => ()
) {

  /** The session rewrites run under: the caller's, unless the ident-
    * normalization knob disagrees with its `spark.sql.caseSensitive`. */
  private val execSpark: SparkSession = {
    val wantCaseSensitive = !enableIdentNormalization
    val current = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    if (current == wantCaseSensitive) spark
    else {
      val s = org.apache.spark.sql.graftbridge.ColumnBridge.cloneSession(spark)
      s.conf.set("spark.sql.caseSensitive", wantCaseSensitive.toString)
      s
    }
  }

  /** Stage 1 — metadata-only planning (mod.rs:448-461,1307-1336).
    * Branch resolution is strict for non-main branches (an explicit branch
    * that doesn't exist must not silently plan against main's data). */
  def planCompaction(): Seq[CompactionPlan] = {
    val table = catalog.loadTable(tableName)
    val snapshot =
      if (toBranch == "main") table.snapshotForRef(toBranch).orElse(table.currentSnapshot)
      else table.snapshotForRef(toBranch)
    snapshot match {
      case None => Nil
      case Some(snap) =>
        val tasks = table.scanTasks(snap) // op 1: data files w/ deletes attached
        val byPath = snap.manifest.map(f => f.resolutionKey -> f).toMap
        val strategy = PlanStrategy.fromConfig(config)
        val groups = strategy.execute(tasks, config.params, byPath.get)
        groups.filterNot(_.isEmpty).map(g => CompactionPlan(g, toBranch, snap.snapshotId))
    }
  }

  /** Stage 2 — execute one plan as a single Spark job. */
  def rewritePlan(plan: CompactionPlan): RewriteOutcome = {
    val table = catalog.loadTable(tableName)
    val req = RewriteRequest(
      group = plan.fileGroup,
      schemaColumns = table.schemaColumns,
      outputDir = Paths.get(table.location, "data").toString,
      targetFileSizeBytes = targetFileSizeBytes,
      partitionSpec = table.partitionSpec,
      statsRetired = table.statsRetiredNames,
      sortOrder = table.sortOrder,
      formatVersion = table.formatVersion,
      tableSchema = table.schema,
      // v3: surviving rows keep their identity — the rewrite reads row
      // ids and materializes `_row_id` into the new files
      preserveRowIds = table.formatVersion >= 3 &&
        table.schema.nonEmpty && table.schema.forall(_.isTyped),
      bytesPerRecordHint =
        if (enableDynamicSizeEstimation) sizeEstimator.estimate.getOrElse(0.0) else 0.0,
      // Iceberg's write.distribution-mode=range: sort-ordered tables opt
      // into a range exchange so rewritten files carry globally ordered,
      // non-overlapping zone maps (range reads then prune to the files
      // that intersect — the clustering that makes tableRange useful)
      rangeDistribute =
        table.properties.get("write.distribution-mode").contains("range"),
      // Iceberg `write.parquet.*` TABLE PROPERTIES take precedence (the
      // table owns its layout, like write.distribution-mode above); the
      // constructor config supplies every field no property names
      parquet = graft.exec.ParquetWriteConfig.fromProperties(
        table.properties, base = parquetWrite)
    )
    val res = executor.rewriteFiles(execSpark, req)
    if (enableDynamicSizeEstimation)
      sizeEstimator.observe(res.stats.outputBytes, res.stats.outputRecords)
    metrics.recordRewrite(res.stats)
    RewriteOutcome(plan, res)
  }

  /** Bounded-concurrency plan execution (mod.rs:523-540; default 4).
    * Each plan is an independent Spark job; Spark's scheduler interleaves
    * their stages across the shared executor pool. */
  def concurrentRewritePlans(plans: Seq[CompactionPlan]): Seq[RewriteOutcome] =
    concurrentRewritePlans(plans, _ => ())

  /** [[concurrentRewritePlans]] with a per-completion hook, invoked on
    * the worker thread as soon as that plan's rewrite finishes — the
    * journaling point for [[compactResumable]] (a crash mid-batch keeps
    * every hooked completion). */
  def concurrentRewritePlans(plans: Seq[CompactionPlan],
      onComplete: RewriteOutcome => Unit): Seq[RewriteOutcome] = {
    if (plans.isEmpty) return Nil
    val pool = Executors.newFixedThreadPool(math.max(1, math.min(maxConcurrentPlans, plans.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futs = plans.map(p => Future { val o = rewritePlan(p); onComplete(o); o })
      Await.result(Future.sequence(futs), Duration.Inf)
    } finally {
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.SECONDS)
    }
  }

  /** Stage 3 — one transaction for all results (mod.rs:472-516). */
  def commitRewriteResults(outcomes: Seq[RewriteOutcome]): TableMetadata =
    commitResults(outcomes, overwrite = false)

  /** OverwriteFiles variant (mod.rs:1068-1177): same add/remove swap but
    * WITHOUT the starting-sequence-number rule — new files take a fresh
    * sequence number, so they outrank deletes committed since planning. */
  def commitOverwriteResults(outcomes: Seq[RewriteOutcome]): TableMetadata =
    commitResults(outcomes, overwrite = true)

  private def commitResults(outcomes: Seq[RewriteOutcome], overwrite: Boolean): TableMetadata = {
    require(outcomes.nonEmpty, "No rewrite results to commit")
    validateResultsConsistency(outcomes)
    val cm = new CommitManager(catalog, tableName, retry, metrics)
    cm.rewriteFiles(
      added = outcomes.flatMap(_.result.addedFiles),
      rewrittenPaths = outcomes.flatMap(_.plan.fileGroup.dataFiles.map(_.path)),
      toBranch = toBranch,
      startingSnapshotId = outcomes.head.plan.snapshotId,
      useStartingSequenceNumber = !overwrite,
      operation = if (overwrite) "overwrite" else "replace"
    )
  }

  /** Emits [[CompactionProgress]] ticks through `onProgress`: one
    * "planned" tick at construction, thread-safe per-completion
    * "rewriting" ticks, one "committed" tick. */
  private final class ProgressTracker(plans: Seq[CompactionPlan]) {
    private val total = plans.size
    private val bytesTotal = plans.map(_.fileGroup.totalSize).sum
    private val nDone = new java.util.concurrent.atomic.AtomicInteger
    private val bDone = new java.util.concurrent.atomic.AtomicLong
    onProgress(CompactionProgress("planned", total, 0, bytesTotal, 0L))
    def completed(o: RewriteOutcome): Unit =
      onProgress(CompactionProgress("rewriting", total, nDone.incrementAndGet(),
        bytesTotal, bDone.addAndGet(o.plan.fileGroup.totalSize)))
    def committed(): Unit =
      onProgress(CompactionProgress("committed", total, total, bytesTotal, bytesTotal))
  }

  /** All results must target one branch + snapshot before a single-
    * transaction commit (mod.rs:55-76). */
  def validateResultsConsistency(outcomes: Seq[RewriteOutcome]): Unit = {
    val snapshotId = outcomes.head.plan.snapshotId
    outcomes.foreach { o =>
      require(o.plan.toBranch == toBranch,
        s"inconsistent branch: ${o.plan.toBranch} != $toBranch")
      require(o.plan.snapshotId == snapshotId,
        s"inconsistent snapshot: ${o.plan.snapshotId} != $snapshotId")
    }
  }

  /** Single-plan convenience (mod.rs:644-705): rewrite ONE planned group
    * and commit it on its own — the incremental-compaction entry point for
    * callers that plan once, then spread execution over time/budgets.
    * Empty plan -> None, like the reference. */
  def compactWithPlan(plan: CompactionPlan): Option[CompactionResult] = {
    if (plan.fileGroup.isEmpty) return None
    val t0 = System.nanoTime()
    val outcome = rewritePlan(plan)
    val committed = commitRewriteResults(Seq(outcome))
    metrics.recordCompaction((System.nanoTime() - t0) / 1000000L)
    if (enableValidate)
      Validator.validate(spark, plan.fileGroup, outcome.result.addedFiles,
        committed.schemaColumns, committed.formatVersion, committed.schema)
    Some(CompactionResult(outcome.result.addedFiles, Seq(outcome.result.stats), Some(committed)))
  }

  /** Managed workflow: plan -> concurrent rewrite -> commit -> validate
    * (mod.rs:259-303). Empty plans -> no-op result. */
  def compact(): CompactionResult = {
    val t0 = System.nanoTime()
    val plans = planCompaction()
    if (plans.isEmpty) return CompactionResult(Nil, Nil, None)
    val progress = new ProgressTracker(plans)
    val outcomes = concurrentRewritePlans(plans, progress.completed)
    var committed = commitRewriteResults(outcomes)
    progress.committed()
    if (cleanupDanglingDeletes)
      committed = Maintenance.removeDanglingDeletes(spark, catalog, tableName, retry)
    metrics.recordCompaction((System.nanoTime() - t0) / 1000000L)
    if (enableValidate) {
      val table = committed
      outcomes.foreach { o =>
        Validator.validate(spark, o.plan.fileGroup, o.result.addedFiles,
          table.schemaColumns, table.formatVersion, table.schema)
      }
    }
    CompactionResult(outcomes.flatMap(_.result.addedFiles), outcomes.map(_.result.stats), Some(committed))
  }

  /** [[compact]] with BREAKPOINT RESUME (reference roadmap README.md:61):
    * every completed group rewrite is journaled before the commit, so a
    * crashed run rerun with the SAME runId reuses its finished rewrites
    * (the written parquet is committed as-is) and only executes the
    * remaining groups. The journal binds to the planned snapshot — a
    * head that moved between crash and resume invalidates it and the run
    * degrades to a normal full compaction (stale outputs are orphans for
    * [[Maintenance.orphanFiles]]). On success the journal is deleted;
    * results and commit semantics are identical to [[compact]]. */
  def compactResumable(runId: String): CompactionResult = {
    val t0 = System.nanoTime()
    val plans = planCompaction()
    if (plans.isEmpty) return CompactionResult(Nil, Nil, None)
    val journal = new RewriteJournal(catalog, tableName, runId)
    val progress = new ProgressTracker(plans)
    val recovered = journal.load(plans.head.snapshotId)
    // reuse only fully intact journal entries (every output still on disk)
    val (done, todo) = plans.partition { p =>
      recovered.get(RewriteJournal.groupKey(p.fileGroup))
        .exists(fs => fs.nonEmpty && fs.forall(f => graft.meta.MetaIO.exists(f.path)))
    }
    val reused = done.map { p =>
      val added = recovered(RewriteJournal.groupKey(p.fileGroup))
      RewriteOutcome(p, graft.exec.RewriteResult(added, graft.exec.RewriteStats(
        inputFiles = p.fileGroup.inputFilesCount,
        inputBytes = p.fileGroup.inputTotalBytes,
        outputFiles = added.size,
        outputBytes = added.map(_.length).sum,
        outputRecords = added.map(_.recordCount).sum,
        durationMs = 0L)))
    }
    reused.foreach(progress.completed)
    val fresh = concurrentRewritePlans(todo, { o =>
      journal.append(RewriteJournal.groupKey(o.plan.fileGroup), o.result.addedFiles)
      progress.completed(o)
    })
    val outcomes = reused ++ fresh
    var committed = commitRewriteResults(outcomes)
    progress.committed()
    journal.delete()
    if (cleanupDanglingDeletes)
      committed = Maintenance.removeDanglingDeletes(spark, catalog, tableName, retry)
    metrics.recordCompaction((System.nanoTime() - t0) / 1000000L)
    if (enableValidate) {
      val table = committed
      outcomes.foreach { o =>
        Validator.validate(spark, o.plan.fileGroup, o.result.addedFiles,
          table.schemaColumns, table.formatVersion, table.schema)
      }
    }
    CompactionResult(outcomes.flatMap(_.result.addedFiles), outcomes.map(_.result.stats), Some(committed))
  }
}

/** Commit with optimistic retry + exponential backoff (mod.rs:763-782,
  * 950-1061): reloads the table on every attempt, checks rewritten files
  * still exist, stamps added files with the starting snapshot's sequence
  * number so they don't outrank concurrent deletes, preserves custom
  * snapshot summary properties.
  */
final class CommitManager(
    catalog: Catalog,
    tableName: String,
    retry: CommitRetryConfig = CommitRetryConfig(),
    metrics: Metrics = new Metrics
) {

  def rewriteFiles(
      added: Seq[FileEntry],
      rewrittenPaths: Seq[String],
      toBranch: String,
      startingSnapshotId: Long,
      useStartingSequenceNumber: Boolean,
      operation: String = "replace"
  ): TableMetadata = retryLoop { () =>
    val table = catalog.loadTable(tableName) // reload every attempt
    val starting = table.snapshotById(startingSnapshotId).getOrElse(
      throw new IllegalStateException(s"No snapshot found with id $startingSnapshotId"))
    val current = table.snapshotForRef(toBranch).orElse(table.currentSnapshot).getOrElse(starting)

    // file-existence check (set_check_file_existence(true))
    val currentPaths = current.manifest.map(_.path).toSet
    val missing = rewrittenPaths.filterNot(currentPaths.contains)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"rewritten files no longer in snapshot: ${missing.take(3).mkString(",")}...")

    val newSeq = table.lastSequenceNumber + 1
    val fileSeq = if (useStartingSequenceNumber) starting.sequenceNumber else newSeq
    // v3 row lineage: rewritten files materialize `_row_id`, so their
    // inherited range is never consulted for surviving rows — but the
    // range is still claimed (fresh cursor in the same CAS), keeping the
    // invariant that every v3 data file owns disjoint ids
    var rowCursor = table.nextRowId
    val stamped = added.map { f =>
      val s = f.copy(sequenceNumber = fileSeq, content = FileContent.Data)
      if (table.formatVersion < 3) s
      else { val assigned = s.copy(firstRowId = Some(rowCursor))
             rowCursor += s.recordCount; assigned }
    }

    val removed = rewrittenPaths.toSet
    val newManifest = current.manifest.filterNot(f => removed.contains(f.path)) ++ stamped
    val snapshotId = table.snapshots.map(_.snapshotId).foldLeft(0L)(math.max) + 1
    val snap = Snapshot(
      snapshotId = snapshotId,
      parentId = Some(current.snapshotId),
      sequenceNumber = newSeq,
      timestampMs = System.currentTimeMillis(),
      manifest = newManifest,
      // custom (non-auto-computed) summary properties carry forward;
      // auto stats recomputed per commit (mod.rs:1187-1224).
      // "rewrite" -> "compaction" marks this snapshot as a PHYSICAL
      // rewrite regardless of the operation string — the overwrite
      // variant shares operation="overwrite" with logical upserts, and
      // changelog consumers must not replay a compaction as change.
      // (Reserved key: never carried forward to later snapshots.)
      summary = TableMetadata.preservedProperties(current.summary) ++
        TableMetadata.computedSummary(current.manifest, newManifest) +
        ("operation" -> operation) + ("rewrite" -> "compaction")
    )
    val updated = table.copy(
      currentSnapshotId = Some(snapshotId),
      refs = table.refs + (toBranch -> snapshotId),
      snapshots = table.snapshots :+ snap,
      lastSequenceNumber = newSeq,
      nextRowId = rowCursor
    )
    val committed = catalog.commit(table, updated)
    metrics.commitSucceeded.incrementAndGet()
    committed
  }

  private def retryLoop(op: () => TableMetadata): TableMetadata = {
    var attempt = 0
    var delay = retry.initialDelayMs
    while (true) {
      try return op()
      catch {
        case NonFatal(e) if attempt < retry.maxRetries && isRetriable(e) =>
          metrics.commitFailed.incrementAndGet()
          attempt += 1
          Thread.sleep(delay)
          delay = math.min(delay * 2, retry.maxDelayMs)
        case NonFatal(e) =>
          metrics.commitFailed.incrementAndGet()
          throw e
      }
    }
    sys.error("unreachable")
  }

  private def isRetriable(e: Throwable): Boolean = e match {
    case _: CommitConflictException => true
    case _: IllegalStateException   => true // DataInvalid / Unexpected analogue
    case _                          => false
  }
}
