package graft.selection

import graft.meta.{FileEntry, PartitionField, TableMetadata}


/** Built-in compaction POLICIES — the reference roadmap's "Compaction
  * Policy: Multiple built-in policies (size-based, time-based,
  * cost-optimized)" (reference README.md:54), unimplemented there,
  * realized here on top of the existing selection pipeline:
  *
  *  - size-based:  [[SmallFilesConfig]] (already the default strategy)
  *  - time-based:  [[TimePartitionFilter]] scopes a run to partitions
  *    older/newer than a cutoff literal of the table's time transform —
  *    "compact yesterday's ingest", "leave the hot day alone"
  *  - cost-optimized: [[CostBudget]] ranks planned groups by expected
  *    benefit per byte rewritten and keeps the best set under a byte
  *    budget — bounded-I/O maintenance windows
  *
  * All of it composes through [[PolicyConfig]] (in Config.scala with the
  * sealed PlanningConfig family), which wraps any base [[PlanningConfig]]
  * with extra file/group filters and changes nothing else about
  * planning, parallelism, or commit. */

/** Scope a compaction run by a VALUE-ADDRESSABLE partition column (time
  * transforms year/month/day/hour, or any identity column with ordered
  * literals): keep a file iff its recorded partition literal satisfies
  * `newerThan <= v < olderThan`. Time-transform literals ("2026",
  * "2026-08", "2026-08-14", "2026-08-14-15") are zero-padded UTC forms,
  * so STRING comparison IS chronological comparison within one
  * granularity — metadata-only, no data read.
  *
  * Files without a recorded value for `column` (different/historical
  * spec, transform-evolution markers) are EXCLUDED: a time-scoped run
  * must not touch files it cannot prove are in scope. Heal those with a
  * full compaction, which re-marks them under the current spec. */
final case class TimePartitionFilter(
    column: String,
    olderThan: Option[String] = None,
    newerThan: Option[String] = None
) extends FileFilterStrategy {
  require(olderThan.nonEmpty || newerThan.nonEmpty,
    "TimePartitionFilter needs at least one bound")
  override def filter(files: Seq[FileEntry]): Seq[FileEntry] = files.filter { f =>
    f.partitionValues.get(column) match {
      case Some(v) => olderThan.forall(v < _) && newerThan.forall(v >= _)
      case None => false
    }
  }
  override def describe: String =
    s"TimePartitionFilter[$column in [${newerThan.getOrElse("")}, ${olderThan.getOrElse("")}))"
}

/** Keep the most valuable planned groups under a total rewrite-byte
  * budget. Benefit density of a group =
  * (deleteFiles x deleteWeight + (dataFiles - 1) x fileWeight) / bytes:
  * folding delete files buys MOR read-path joins back, merging N files
  * into ~1 buys open/seek amplification back, and dividing by input
  * bytes prices both against the I/O the rewrite costs. Groups are
  * taken greedily by density (ties: smaller first, then first-data-file
  * path — deterministic across runs); a group that would overflow the
  * budget is skipped, later (smaller) groups may still fit. Zero-benefit
  * groups (single file, no deletes) are never admitted — a cost policy
  * does not spend budget on rewrites that change nothing. */
final case class CostBudget(
    maxRewriteBytes: Long,
    deleteWeight: Double = 4.0,
    fileWeight: Double = 1.0
) extends GroupFilterStrategy {
  require(maxRewriteBytes > 0, s"budget must be positive, got $maxRewriteBytes")

  def score(g: FileGroup): Double = {
    val deletes = g.positionDeleteFiles.size + g.equalityDeleteFiles.size
    (deletes * deleteWeight + math.max(0, g.dataFileCount - 1) * fileWeight) /
      math.max(1L, g.totalSize).toDouble
  }

  override def filterGroups(groups: Seq[FileGroup]): Seq[FileGroup] = {
    val ranked = groups.filter(score(_) > 0).sortBy(g =>
      (-score(g), g.totalSize, g.dataFiles.headOption.map(_.path).getOrElse("")))
    var spent = 0L
    val kept = Seq.newBuilder[FileGroup]
    ranked.foreach { g =>
      if (spent + g.totalSize <= maxRewriteBytes) { spent += g.totalSize; kept += g }
    }
    // preserve planning order for the kept set so downstream concurrency
    // and commit grouping see the same deterministic sequence as unbudgeted runs
    val keep = kept.result().toSet
    groups.filter(keep.contains)
  }
  override def describe: String =
    s"CostBudget[<=$maxRewriteBytes B, wDel=$deleteWeight, wFile=$fileWeight]"
}

object CompactionPolicy {

  /** Size-based policy: compact files under `smallFileThresholdBytes`
    * (the default strategy, named here for discoverability). */
  def sizeBased(smallFileThresholdBytes: Long = Defaults.SmallFileThreshold,
      params: PlanningParams = PlanningParams()): PlanningConfig =
    SmallFilesConfig(params, smallFileThresholdBytes)

  /** Time-based policy: scope `base` to partitions of the table's time
    * transform strictly OLDER than `olderThan` (optionally also
    * `newerThan`-bounded). The time column is resolved from `meta`'s
    * current spec; tables without a time transform are refused — a
    * time policy on an un-time-partitioned table would silently compact
    * nothing or everything. */
  def timeBased(meta: TableMetadata, olderThan: Option[String],
      newerThan: Option[String] = None,
      base: PlanningConfig = FullCompactionConfig()): PolicyConfig = {
    val timeField = meta.partitionSpec.find(_.isTime).getOrElse(
      sys.error(s"table ${meta.name} has no time-transform partition field " +
        s"(spec: ${meta.partitionSpec.map(p => s"${p.column}:${p.transform}").mkString(", ")})"))
    PolicyConfig(base,
      extraFileFilters = Seq(TimePartitionFilter(timeField.column, olderThan, newerThan)))
  }

  /** Cost-optimized policy: plan with `base` (delete-heavy files first by
    * default), then keep the highest benefit-per-byte groups under
    * `maxRewriteBytes` — the bounded maintenance-window run. */
  def costOptimized(maxRewriteBytes: Long,
      base: PlanningConfig = FilesWithDeletesConfig(),
      deleteWeight: Double = 4.0, fileWeight: Double = 1.0): PolicyConfig =
    PolicyConfig(base,
      extraGroupFilters = Seq(CostBudget(maxRewriteBytes, deleteWeight, fileWeight)))

  /** The time field a [[timeBased]] policy would use, if any. */
  def timeFieldOf(meta: TableMetadata): Option[PartitionField] =
    meta.partitionSpec.find(_.isTime)
}
