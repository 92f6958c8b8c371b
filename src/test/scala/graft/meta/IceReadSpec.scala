package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.compaction._
import graft.selection._
import graft.testkit.FileGenerator

class IceReadSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("MOR table read is invariant under compaction") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet(s"$sf/orders.parquet")
    FileGenerator.writeTable(spark, catalog, "t_read", src,
      FileGenerator.Config(dataFileCount = 4, posDeleteRowsPerFile = 10,
        eqDeleteRowsPerFile = 10, equalityIds = Seq("o_orderkey"), orderCol = "o_orderkey"))

    val before = IceRead.table(spark, catalog, "t_read").cache()
    val nBefore = before.count()
    assert(nBefore > 0 && nBefore < src.count()) // deletes visible through the read

    new Compaction(catalog, "t_read", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 2))).compact()

    val after = IceRead.table(spark, catalog, "t_read")
    // the user-visible table content must be byte-identical across compaction
    assert(after.count() == nBefore)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("SQL over the registered MOR view") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet(s"$sf/region.parquet")
    FileGenerator.writeTable(spark, catalog, "t_sql", src,
      FileGenerator.Config(dataFileCount = 2, orderCol = "r_regionkey"))
    IceRead.createTempView(spark, catalog, "t_sql", "region_v")
    val n = spark.sql("SELECT count(*) AS n FROM region_v").head.getLong(0)
    assert(n == 5)
  }
}
