package graft.compaction

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{FileContent, IceRead, IceWrite, LocalCatalog}

/** Copy-on-write UPDATE / purge: affected-file discovery, MOR-view
  * rewrite, overwrite commit, physical erasure. */
class RowRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(java.nio.file.Files.createTempDirectory("cow-wh").toString)

  private def dataPaths(catalog: LocalCatalog, name: String): Set[String] =
    catalog.loadTable(name).currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).map(_.path).toSet

  test("updateWhere rewrites only affected files; untouched files keep their paths") {
    val catalog = freshCatalog()
    // two files with disjoint key ranges -> the update touches one
    IceWrite.create(spark, catalog, "t",
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    IceWrite.append(spark, catalog, "t",
      (51L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val before = dataPaths(catalog, "t")
    RowRewrite.updateWhere(spark, catalog, "t", col("id") <= 10,
      Map("v" -> concat(lit("UPD-"), col("v"))))
    val after = dataPaths(catalog, "t")
    assert((before intersect after).size == 1,
      "the file with no matching rows must keep its path")
    val rows = IceRead.table(spark, catalog, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 100)
    (1L to 10L).foreach(i => assert(rows(i) == s"UPD-v$i"))
    (11L to 100L).foreach(i => assert(rows(i) == s"v$i"))
    assert(catalog.loadTable("t").currentSnapshot.get
      .summary.get("operation").contains("overwrite"))
  }

  test("updateWhere assignments see the ORIGINAL row (simultaneous SQL semantics)") {
    val catalog = freshCatalog()
    IceWrite.create(spark, catalog, "t",
      Seq((1L, 10L, 20L), (2L, 3L, 4L)).toDF("id", "a", "b"))
    RowRewrite.updateWhere(spark, catalog, "t", col("id") === 1L,
      Map("a" -> col("b"), "b" -> col("a"))) // swap — sequential would alias
    val got = IceRead.table(spark, catalog, "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 20L, 10L), (2L, 3L, 4L)))
  }

  test("purgeWhere physically removes rows: no live data file contains the purged keys") {
    val catalog = freshCatalog()
    IceWrite.create(spark, catalog, "t",
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4))
    RowRewrite.purgeWhere(spark, catalog, "t", col("id") % 10 === 0)
    assert(IceRead.table(spark, catalog, "t").count() == 90)
    // the erasure claim: scan the live data files RAW — the bytes are gone
    val raw = spark.read.parquet(dataPaths(catalog, "t").toSeq: _*)
    assert(raw.filter(col("id") % 10 === 0).count() == 0,
      "purged rows must not exist in any live data file")
    // vs the MOR tombstone path, where deleted bytes remain on disk
    val catalog2 = freshCatalog()
    IceWrite.create(spark, catalog2, "t2",
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4))
    IceWrite.deleteWhere(spark, catalog2, "t2", col("id") % 10 === 0)
    val raw2 = spark.read.parquet(dataPaths(catalog2, "t2").toSeq: _*)
    assert(raw2.filter(col("id") % 10 === 0).count() == 10,
      "tombstoned rows still exist physically — the contrast purgeWhere exists for")
  }

  test("COW update over a MOR-shaded table does not resurrect tombstoned rows") {
    val catalog = freshCatalog()
    IceWrite.create(spark, catalog, "t",
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    IceWrite.deleteWhere(spark, catalog, "t", col("id") <= 5)
    // the update's file overlaps the tombstoned rows: the rewrite goes
    // through the MOR view, so ids 1..5 must stay gone
    RowRewrite.updateWhere(spark, catalog, "t", col("id") === 10L,
      Map("v" -> lit("ten")))
    val rows = IceRead.table(spark, catalog, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 15 && !rows.contains(1L) && rows(10L) == "ten")
  }

  test("no matching rows -> metadata unchanged; unknown update column rejected") {
    val catalog = freshCatalog()
    IceWrite.create(spark, catalog, "t", Seq((1L, "a")).toDF("id", "v"))
    val before = catalog.loadTable("t").currentSnapshot.get.snapshotId
    RowRewrite.updateWhere(spark, catalog, "t", col("id") === 999L,
      Map("v" -> lit("x")))
    RowRewrite.purgeWhere(spark, catalog, "t", col("id") === 999L)
    assert(catalog.loadTable("t").currentSnapshot.get.snapshotId == before)
    intercept[IllegalArgumentException] {
      RowRewrite.updateWhere(spark, catalog, "t", col("id") === 1L,
        Map("nope" -> lit("x")))
    }
  }
}
