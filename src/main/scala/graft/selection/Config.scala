package graft.selection

/** Planning configuration, mirroring the reference's defaults and strategy
  * configs (core/src/config/mod.rs:28-55,123-311). */
object Defaults {
  val TargetFileSize: Long = 1024L * 1024 * 1024 // 1 GiB
  /** config/mod.rs:37-38 */
  val EnableDynamicSizeEstimation: Boolean = false
  val SizeEstimationSmoothingFactor: Double = 0.3
  val MaxRecordBatchRows: Int = 1024
  val MaxRowGroupBytes: Long = 128L * 1024 * 1024
  val SmallFileThreshold: Long = 32L * 1024 * 1024
  val MinSizePerPartition: Long = 512L * 1024 * 1024
  val MaxFileCountPerPartition: Int = 32
  val MaxConcurrentCompactionPlans: Int = 4
  val MinDeleteFileCountThreshold: Int = 128
  val MinSmallFilesCount: Int = 5
  val MinFilesWithDeletesCount: Int = 1
  val TargetGroupSize: Long = 100L * 1024 * 1024 * 1024 // 100 GiB
  val SplitOverhead: Long = 5L * 1024 * 1024
  def maxInputParallelism(cpus: Int): Int = 4 * cpus
  def maxOutputParallelism(cpus: Int): Int = cpus
}

/** Partition-scoped (default) vs whole-table grouping
  * (config/mod.rs:97-108). */
object FileGroupScope extends Enumeration {
  val Partition, Table = Value
}

sealed trait GroupingStrategy
object GroupingStrategy {
  case object Single extends GroupingStrategy
  final case class BinPack(targetGroupSizeBytes: Long = Defaults.TargetGroupSize)
      extends GroupingStrategy
}

final case class GroupFilters(
    minGroupSizeBytes: Option[Long] = None,
    minGroupFileCount: Option[Int] = None
)

/** Shared planning knobs (reference CompactionPlanningConfig accessors). */
final case class PlanningParams(
    targetFileSizeBytes: Long = Defaults.TargetFileSize,
    minSizePerPartition: Long = Defaults.MinSizePerPartition,
    maxFileCountPerPartition: Int = Defaults.MaxFileCountPerPartition,
    maxInputParallelism: Int = Defaults.maxInputParallelism(Runtime.getRuntime.availableProcessors),
    maxOutputParallelism: Int = Defaults.maxOutputParallelism(Runtime.getRuntime.availableProcessors),
    enableHeuristicOutputParallelism: Boolean = true,
    groupingStrategy: GroupingStrategy = GroupingStrategy.BinPack(),
    fileGroupScope: FileGroupScope.Value = FileGroupScope.Partition,
    groupFilters: Option[GroupFilters] = None
)

/** The three strategy configs (strategy.rs:797-902). */
sealed trait PlanningConfig { def params: PlanningParams }
final case class SmallFilesConfig(
    params: PlanningParams = PlanningParams(),
    smallFileThresholdBytes: Long = Defaults.SmallFileThreshold
) extends PlanningConfig
final case class FullCompactionConfig(
    params: PlanningParams = PlanningParams()
) extends PlanningConfig
final case class FilesWithDeletesConfig(
    params: PlanningParams = PlanningParams(),
    minDeleteFileCountThreshold: Int = Defaults.MinDeleteFileCountThreshold
) extends PlanningConfig

/** A POLICY wrapper around any base config: the base's strategy plus
  * extra file/group filters (see [[CompactionPolicy]] for the built-in
  * time-based and cost-optimized policies). Planning params delegate to
  * the base unchanged. */
final case class PolicyConfig(
    base: PlanningConfig,
    extraFileFilters: Seq[FileFilterStrategy] = Nil,
    extraGroupFilters: Seq[GroupFilterStrategy] = Nil
) extends PlanningConfig {
  override def params: PlanningParams = base.params
}
