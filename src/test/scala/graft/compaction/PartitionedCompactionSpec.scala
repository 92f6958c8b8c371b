package graft.compaction

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.meta._
import graft.selection._
import graft.testkit.FileGenerator

/** Partition-scope planning + partitioned/sorted write paths, mirroring the
  * reference's bucket-partition and sort-order integration tests
  * (integration-tests/src/integration_tests.rs:330-575; file_group_scope.rs). */
class PartitionedCompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def newCatalog(): LocalCatalog =
    LocalCatalog(Files.createTempDirectory("graft-wh").toString)

  test("identity partitions: partition-scope planning makes one plan per partition") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/nation.parquet") // 25 rows, n_regionkey 0..4
    FileGenerator.writeTable(spark, catalog, "t_part", src,
      FileGenerator.Config(orderCol = "n_nationkey",
        partitionSpec = Seq(PartitionField("n_regionkey")), filesPerPartition = 2))

    val meta = catalog.loadTable("t_part")
    val dataFiles = meta.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    assert(dataFiles.size == 10) // 5 regions x 2 files
    assert(dataFiles.forall(_.partitionValues.keySet == Set("n_regionkey")))

    val c = new Compaction(catalog, "t_part", spark,
      config = FullCompactionConfig(PlanningParams(
        fileGroupScope = FileGroupScope.Partition,
        groupingStrategy = GroupingStrategy.Single,
        maxOutputParallelism = 2)))
    val plans = c.planCompaction()
    assert(plans.size == 5) // one per region

    val result = c.compact()
    assert(result.table.nonEmpty)
    val after = catalog.loadTable("t_part")
    val outFiles = after.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    // outputs carry decoded partition values from the fan-out write
    assert(outFiles.forall(_.partitionValues.keySet == Set("n_regionkey")))
    assert(outFiles.size == 5)
    val rows = spark.read.parquet(outFiles.map(_.path): _*)
    assert(rows.count() == 25)
    // per-partition row counts survive
    val got = rows.groupBy($"n_regionkey").count().collect()
      .map(r => r.getInt(0).toString -> r.getLong(1)).toMap
    val want = src.groupBy($"n_regionkey").count().collect()
      .map(r => r.getInt(0).toString -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("table scope groups all partitions into one plan") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/nation.parquet")
    FileGenerator.writeTable(spark, catalog, "t_scope", src,
      FileGenerator.Config(orderCol = "n_nationkey",
        partitionSpec = Seq(PartitionField("n_regionkey")), filesPerPartition = 1))
    val c = new Compaction(catalog, "t_scope", spark,
      config = FullCompactionConfig(PlanningParams(
        fileGroupScope = FileGroupScope.Table,
        groupingStrategy = GroupingStrategy.Single, maxOutputParallelism = 2)))
    assert(c.planCompaction().size == 1)
  }

  test("bucket partitions: stable bucket ids, global deletes still apply") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/customer.parquet") // 150 rows
    FileGenerator.writeTable(spark, catalog, "t_bucket", src,
      FileGenerator.Config(orderCol = "c_custkey",
        partitionSpec = Seq(PartitionField("c_custkey", "bucket[4]")),
        filesPerPartition = 2, posDeleteRowsPerFile = 3))
    val meta = catalog.loadTable("t_bucket")
    val dataFiles = meta.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    assert(dataFiles.map(_.partitionValues("c_custkey")).toSet.subsetOf(Set("0", "1", "2", "3")))
    val posCount = meta.currentSnapshot.get.manifest
      .filter(_.content == FileContent.PositionDeletes).map(_.recordCount).sum

    val result = new Compaction(catalog, "t_bucket", spark,
      config = FullCompactionConfig(PlanningParams(
        fileGroupScope = FileGroupScope.Partition,
        groupingStrategy = GroupingStrategy.Single, maxOutputParallelism = 2))).compact()
    val after = catalog.loadTable("t_bucket")
    val outFiles = after.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    assert(spark.read.parquet(outFiles.map(_.path): _*).count() == src.count() - posCount)
  }

  test("sort-order compaction: every output file is internally sorted") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
    FileGenerator.writeTable(spark, catalog, "t_sorted", src,
      FileGenerator.Config(dataFileCount = 4, orderCol = "l_orderkey",
        sortOrder = Seq(SortField("l_shipdate", ascending = true, nullsFirst = true))))
    new Compaction(catalog, "t_sorted", spark,
      config = FullCompactionConfig(PlanningParams(
        targetFileSizeBytes = 64L * 1024, // force several output files
        maxOutputParallelism = 4))).compact()
    val after = catalog.loadTable("t_sorted")
    val outFiles = after.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    assert(outFiles.size > 1)
    for (f <- outFiles) {
      // ISO timestamp strings sort like the timestamps themselves
      val ts = spark.read.parquet(f.path)
        .select(col("l_shipdate").cast("string")).as[String].collect()
      assert(ts.sameElements(ts.sorted), s"file ${f.path} not sorted")
    }
    assert(spark.read.parquet(outFiles.map(_.path): _*).count() == src.count())
  }
}
