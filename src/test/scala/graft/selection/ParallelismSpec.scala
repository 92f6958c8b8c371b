package graft.selection

import org.scalatest.funsuite.AnyFunSuite
import graft.meta.{FileContent, FileEntry}

/** Parallelism-math cases mirroring the reference's
  * (strategy.rs:1185-3469 parallelism sections); formulas from
  * strategy.rs:163-343. */
class ParallelismSpec extends AnyFunSuite {

  private val MB = 1024L * 1024
  private val GB = 1024L * MB

  test("min/max/writeMax file size derivation") {
    assert(FileGroup.minFileSize(1 * GB) == 768 * MB)
    assert(FileGroup.maxFileSize(1 * GB) == 1024L * MB * 9 / 5)
    val max = FileGroup.maxFileSize(1 * GB)
    assert(FileGroup.writeMaxFileSize(1 * GB, max) == 1 * GB + (max - 1 * GB) / 2)
  }

  test("expectedOutputFiles: below target -> 1") {
    assert(FileGroup.expectedOutputFiles(100 * MB, GB, 768 * MB, 9 * GB / 5) == 1)
    assert(FileGroup.expectedOutputFiles(1, GB, 768 * MB, 9 * GB / 5) == 1)
  }

  test("expectedOutputFiles: large remainder rounds up") {
    // 2.9 GB, remainder 0.9 GB > min (0.75 GB) -> 3 files
    val in = 2 * GB + 900 * MB
    assert(FileGroup.expectedOutputFiles(in, GB, 768 * MB, 9 * GB / 5) == 3)
  }

  test("expectedOutputFiles: small remainder distributes down") {
    // 2.2 GB, remainder 0.2 GB < min; avg 1.1 GB <= 1.1*target -> 2 files
    val in = 2 * GB + 200 * MB
    assert(FileGroup.expectedOutputFiles(in, GB, 768 * MB, 9 * GB / 5) == 2)
  }

  test("expectedOutputFiles: zero target -> 1") {
    assert(FileGroup.expectedOutputFiles(10 * GB, 0, 0, 0) == 1)
  }

  test("inputSplitSize stays within [target, writeMax]") {
    val target = GB
    val min = FileGroup.minFileSize(target)
    val max = FileGroup.maxFileSize(target)
    val writeMax = FileGroup.writeMaxFileSize(target, max)
    for (in <- Seq(GB / 2, GB, 3 * GB, 10 * GB, 100 * GB)) {
      val s = FileGroup.inputSplitSize(in, target, min, max)
      assert(s >= target && s <= writeMax, s"split $s for input $in")
    }
  }

  private def group(dataSizes: Seq[Long], deleteSizes: Seq[Long] = Nil): FileGroup = {
    val data = dataSizes.zipWithIndex.map { case (s, i) =>
      FileEntry(s"d$i", s, FileContent.Data, 100, 1) }
    val dels = deleteSizes.zipWithIndex.map { case (s, i) =>
      FileEntry(s"p$i", s, FileContent.PositionDeletes, 10, 2) }
    FileGroup(data, dels, Nil)
  }

  test("calculateParallelism: empty group errors") {
    intercept[IllegalArgumentException] {
      FileGroup.calculateParallelism(FileGroup.empty, PlanningParams())
    }
  }

  test("small input heuristic forces single output file") {
    val p = PlanningParams(targetFileSizeBytes = GB,
      maxInputParallelism = 64, maxOutputParallelism = 64)
    // data below one target file but enough delete bytes to raise
    // expectedOutputFiles above 1 without the heuristic
    val g = group(Seq(100 * MB, 100 * MB), deleteSizes = Seq(2 * GB))
    val (_, out) = FileGroup.calculateParallelism(g, p)
    assert(out == 1)
    val noHeuristic = p.copy(enableHeuristicOutputParallelism = false)
    val (_, out2) = FileGroup.calculateParallelism(g, noHeuristic)
    assert(out2 > 1)
  }

  test("output parallelism capped by maxOutputParallelism") {
    val p = PlanningParams(targetFileSizeBytes = GB,
      maxInputParallelism = 512, maxOutputParallelism = 4)
    val g = group(Seq.fill(20)(GB))
    val (_, out) = FileGroup.calculateParallelism(g, p)
    assert(out == 4)
  }

  test("input parallelism: count-based kicks in for many tiny files") {
    val p = PlanningParams(targetFileSizeBytes = GB,
      maxFileCountPerPartition = 32, maxInputParallelism = 512, maxOutputParallelism = 8)
    val g = group(Seq.fill(100)(MB))
    val (in, _) = FileGroup.calculateParallelism(g, p)
    // 100 files / 32 per partition -> ceil = 4
    assert(in == 4)
  }

  test("input parallelism capped by maxInputParallelism") {
    val p = PlanningParams(targetFileSizeBytes = GB,
      maxFileCountPerPartition = 1, maxInputParallelism = 8, maxOutputParallelism = 8)
    val g = group(Seq.fill(100)(MB))
    val (in, _) = FileGroup.calculateParallelism(g, p)
    assert(in == 8)
  }

  test("overflow safety on huge sizes") {
    val p = PlanningParams(targetFileSizeBytes = GB, maxInputParallelism = 1 << 20,
      maxOutputParallelism = 1 << 20)
    val g = group(Seq.fill(10)(16L * 1024 * GB)) // 16 TB each
    val (in, out) = FileGroup.calculateParallelism(g, p)
    assert(in > 0 && out > 0)
  }
}
