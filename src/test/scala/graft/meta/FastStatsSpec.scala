package graft.meta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Metadata-only COUNT(*) / min / max — the stats-shortcut reads that
  * never launch a scan job. */
class FastStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(java.nio.file.Files.createTempDirectory("fast-wh").toString)

  test("fastCount sums manifest record counts; any delete file makes it refuse") {
    val catalog = freshCatalog()
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    IceWrite.create(spark, catalog, "t", df.repartition(4))
    assert(IceRead.fastCount(catalog, "t").contains(100L))
    // appends keep it fast
    IceWrite.append(spark, catalog, "t", Seq((101L, "x")).toDF("id", "v"))
    assert(IceRead.fastCount(catalog, "t").contains(101L))
    // a position tombstone shades the snapshot: metadata cannot know the
    // surviving count -> None, and the fallback scan gives the truth
    IceWrite.deleteWhere(spark, catalog, "t", col("id") <= 10)
    assert(IceRead.fastCount(catalog, "t").isEmpty)
    assert(IceRead.table(spark, catalog, "t").count() == 91L)
    // compaction folds the tombstones away -> fast again, and consistent
    new graft.compaction.Compaction(catalog, "t", spark).compact()
    graft.compaction.Maintenance.removeDanglingDeletes(spark, catalog, "t")
    assert(IceRead.fastCount(catalog, "t").contains(91L))
  }

  test("fastMinMax reads zone maps; deletes or missing stats make it refuse") {
    val catalog = freshCatalog()
    val df = Seq((5L, "a"), (-3L, "b"), (42L, "c"), (7L, "d")).toDF("id", "v")
    IceWrite.create(spark, catalog, "t", df.repartition(2))
    assert(IceRead.fastMinMax(catalog, "t", "id")
      .contains((BigDecimal(-3), BigDecimal(42))))
    // string columns carry no numeric zone maps -> None
    assert(IceRead.fastMinMax(catalog, "t", "v").isEmpty)
    // unknown column -> None, not a wrong answer
    assert(IceRead.fastMinMax(catalog, "t", "nope").isEmpty)
    // a delete could have removed the extreme row -> refuse
    IceWrite.deleteWhere(spark, catalog, "t", col("id") === 42L)
    assert(IceRead.fastMinMax(catalog, "t", "id").isEmpty)
  }

  test("fastCount/fastMinMax on an empty table") {
    val catalog = freshCatalog()
    val df = Seq.empty[(Long, String)].toDF("id", "v")
    IceWrite.create(spark, catalog, "t", df)
    assert(IceRead.fastCount(catalog, "t").contains(0L))
    assert(IceRead.fastMinMax(catalog, "t", "id").isEmpty)
  }
}
