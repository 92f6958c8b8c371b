package graft.selection

import org.scalatest.funsuite.AnyFunSuite

/** Default-for-default parity with the reference's config table
  * (core/src/config/mod.rs:28-52) — a user switching engines must get the
  * same planning behavior without touching a knob. */
class ConfigParitySpec extends AnyFunSuite {

  test("planning defaults match the reference's constants") {
    assert(Defaults.TargetFileSize == 1024L * 1024 * 1024) // DEFAULT_TARGET_FILE_SIZE
    assert(Defaults.MaxRecordBatchRows == 1024) // DEFAULT_MAX_RECORD_BATCH_ROWS
    assert(Defaults.MaxRowGroupBytes == 128L * 1024 * 1024) // DEFAULT_MAX_ROW_GROUP_BYTES
    assert(Defaults.SmallFileThreshold == 32L * 1024 * 1024) // DEFAULT_SMALL_FILE_THRESHOLD
    assert(Defaults.MinSizePerPartition == 512L * 1024 * 1024) // DEFAULT_MIN_SIZE_PER_PARTITION
    assert(Defaults.MaxFileCountPerPartition == 32) // DEFAULT_MAX_FILE_COUNT_PER_PARTITION
    assert(Defaults.MaxConcurrentCompactionPlans == 4) // DEFAULT_MAX_CONCURRENT_COMPACTION_PLANS
    assert(Defaults.MinDeleteFileCountThreshold == 128) // DEFAULT_MIN_DELETE_FILE_COUNT_THRESHOLD
    assert(Defaults.MinSmallFilesCount == 5) // DEFAULT_MIN_SMALL_FILES_COUNT
    assert(Defaults.MinFilesWithDeletesCount == 1) // DEFAULT_MIN_FILES_WITH_DELETES_COUNT
    assert(Defaults.TargetGroupSize == 100L * 1024 * 1024 * 1024) // DEFAULT_TARGET_GROUP_SIZE
    assert(!Defaults.EnableDynamicSizeEstimation) // DEFAULT_ENABLE_DYNAMIC_SIZE_ESTIMATION
    assert(Defaults.SizeEstimationSmoothingFactor == 0.3) // DEFAULT_SIZE_ESTIMATION_SMOOTHING_FACTOR
  }

  test("derived planning config defaults match the reference wiring") {
    val p = PlanningParams()
    assert(p.groupingStrategy == GroupingStrategy.BinPack(Defaults.TargetGroupSize))
    assert(p.fileGroupScope == FileGroupScope.Partition)
    assert(p.groupFilters.isEmpty)
    assert(p.enableHeuristicOutputParallelism)
    val cpus = Runtime.getRuntime.availableProcessors
    assert(p.maxInputParallelism == 4 * cpus)
    assert(p.maxOutputParallelism == cpus)
    assert(SmallFilesConfig().smallFileThresholdBytes == Defaults.SmallFileThreshold)
    assert(FilesWithDeletesConfig().minDeleteFileCountThreshold == Defaults.MinDeleteFileCountThreshold)
  }
}
