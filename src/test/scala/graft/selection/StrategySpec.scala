package graft.selection

import org.scalatest.funsuite.AnyFunSuite
import graft.meta.{FileContent, FileEntry}

/** Selection-pipeline cases mirroring the reference's strategy tests
  * (core/src/file_selection/strategy.rs:973-3493). */
class StrategySpec extends AnyFunSuite {

  private val MB = 1024L * 1024

  private def dataFile(
      path: String, size: Long, deletes: Seq[String] = Nil,
      partition: Map[String, String] = Map.empty): FileEntry =
    FileEntry(path, size, FileContent.Data, recordCount = 100, sequenceNumber = 1,
      partitionValues = partition, deletes = deletes)

  private def posDelete(path: String, size: Long = MB): FileEntry =
    FileEntry(path, size, FileContent.PositionDeletes, 10, 2)

  private def eqDelete(path: String, ids: Seq[String], size: Long = MB): FileEntry =
    FileEntry(path, size, FileContent.EqualityDeletes, 10, 2, equalityIds = ids)

  private val params = PlanningParams(
    targetFileSizeBytes = 1024 * MB,
    maxInputParallelism = 128,
    maxOutputParallelism = 32)

  test("size filter: min inclusive, max exclusive") {
    val f = SizeFilter(Some(10 * MB), Some(32 * MB))
    val files = Seq(dataFile("a", 9 * MB), dataFile("b", 10 * MB),
      dataFile("c", 31 * MB), dataFile("d", 32 * MB))
    assert(f.filter(files).map(_.path) == Seq("b", "c"))
  }

  test("size filter: open-ended bounds") {
    val files = Seq(dataFile("a", 5 * MB), dataFile("b", 50 * MB))
    assert(SizeFilter(None, None).filter(files).size == 2)
    assert(SizeFilter(Some(10 * MB), None).filter(files).map(_.path) == Seq("b"))
    assert(SizeFilter(None, Some(10 * MB)).filter(files).map(_.path) == Seq("a"))
  }

  test("delete-count filter keeps files with >= threshold deletes") {
    val files = Seq(
      dataFile("a", MB, deletes = Seq("d1", "d2")),
      dataFile("b", MB, deletes = Seq("d1")),
      dataFile("c", MB))
    assert(DeleteFileCountFilter(2).filter(files).map(_.path) == Seq("a"))
    assert(DeleteFileCountFilter(0).filter(files).size == 3)
  }

  test("single grouping: all files one group; empty input none") {
    val s = new PlanStrategy(Nil, GroupingStrategy.Single, FileGroupScope.Table, Nil)
    assert(s.execute(Nil, params, _ => None).isEmpty)
    val groups = s.execute(Seq(dataFile("a", MB), dataFile("b", MB)), params, _ => None)
    assert(groups.size == 1 && groups.head.dataFileCount == 2)
  }

  test("partition scope groups per partition; table scope ignores partitions") {
    val files = Seq(
      dataFile("a", MB, partition = Map("id" -> "0")),
      dataFile("b", MB, partition = Map("id" -> "0")),
      dataFile("c", MB, partition = Map("id" -> "1")),
      dataFile("d", MB, partition = Map("id" -> "2")),
      dataFile("e", MB, partition = Map("id" -> "2")))
    val partScope = new PlanStrategy(Nil, GroupingStrategy.Single, FileGroupScope.Partition, Nil)
    assert(partScope.execute(files, params, _ => None).size == 3)
    val tableScope = new PlanStrategy(Nil, GroupingStrategy.Single, FileGroupScope.Table, Nil)
    val g = tableScope.execute(files, params, _ => None)
    assert(g.size == 1 && g.head.dataFileCount == 5)
  }

  test("unpartitioned files group together under partition scope") {
    val files = Seq(dataFile("a", MB), dataFile("b", MB))
    val s = new PlanStrategy(Nil, GroupingStrategy.Single, FileGroupScope.Partition, Nil)
    assert(s.execute(files, params, _ => None).size == 1)
  }

  test("bin-pack grouping splits at target group size") {
    val s = new PlanStrategy(Nil, GroupingStrategy.BinPack(100 * MB), FileGroupScope.Table, Nil)
    val files = (1 to 6).map(i => dataFile(s"f$i", 40 * MB))
    val groups = s.execute(files, params, _ => None)
    assert(groups.size == 3) // 2x40MB per 100MB bin
    assert(groups.map(_.dataFileCount).sum == 6)
  }

  test("group gating: min size and min file count") {
    val sizeGate = MinGroupSize(50 * MB)
    val countGate = MinGroupFileCount(3)
    val small = FileGroup(Seq(dataFile("a", 10 * MB)), Nil, Nil)
    val bigEnough = FileGroup((1 to 3).map(i => dataFile(s"b$i", 20 * MB)), Nil, Nil)
    assert(sizeGate.filterGroups(Seq(small, bigEnough)).map(_.dataFileCount) == Seq(3))
    assert(countGate.filterGroups(Seq(small, bigEnough)).map(_.dataFileCount) == Seq(3))
  }

  test("delete files dedup by path across group; pos/eq partitioned by content") {
    val deletes = Map(
      "p1" -> posDelete("p1"),
      "e1" -> eqDelete("e1", Seq("id")))
    val files = Seq(
      dataFile("a", MB, deletes = Seq("p1", "e1")),
      dataFile("b", MB, deletes = Seq("p1", "e1")))
    val g = FileGroup.fromDataFiles(files, deletes.get)
    assert(g.positionDeleteFiles.map(_.path) == Seq("p1"))
    assert(g.equalityDeleteFiles.map(_.path) == Seq("e1"))
    assert(g.inputFilesCount == 4)
  }

  test("strategy configs build the reference pipelines") {
    val small = PlanStrategy.fromConfig(SmallFilesConfig(params, 32 * MB))
    assert(small.fileFilters.exists(_.isInstanceOf[SizeFilter]))
    val full = PlanStrategy.fromConfig(FullCompactionConfig(params))
    assert(full.fileFilters.isEmpty && full.groupFilters.isEmpty)
    val withDeletes = PlanStrategy.fromConfig(FilesWithDeletesConfig(params, 2))
    assert(withDeletes.fileFilters.exists(_.isInstanceOf[DeleteFileCountFilter]))
    // zero threshold -> no delete filter (strategy.rs:874-880)
    val noFilter = PlanStrategy.fromConfig(FilesWithDeletesConfig(params, 0))
    assert(noFilter.fileFilters.isEmpty)
  }
}
