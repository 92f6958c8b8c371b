package graft.meta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Persisted per-file Bloom filters + point-lookup file skipping
  * ([[BloomIndex]]). */
class BloomIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(java.nio.file.Files.createTempDirectory("bloom-wh").toString)

  /** 4 files of 50 ids each, disjoint ranges (repartitionByRange on id). */
  private def rangedTable(catalog: Catalog, name: String): Unit = {
    val df = (0L until 200L).map(i => (i, s"name-$i", i % 7)).toDF("id", "name", "grp")
    IceWrite.create(spark, catalog, name,
      df.repartitionByRange(4, col("id")))
  }

  test("driver probe positions replay the Spark build expression exactly") {
    // the build hashes with Spark md5/conv; the probe with MessageDigest —
    // any drift is a silent false negative, so pin them against each other
    val vals = Seq("0", "137", "-5", "hello world", "Ünïcode ✓")
    val m = 1 << 18; val k = 4
    val sparkSide = vals.toDF("v").select(expr(
      s"transform(sequence(0, ${k - 1}), i -> " +
        s"cast(conv(substring(md5(concat(cast(v as string), '#', cast(i as string))), 1, 12), 16, 10) as bigint) % $m)")
      .as("pos")).collect().map(_.getSeq[Long](0).toSeq)
    val driverSide = vals.map(v => BloomIndex.bitPositions(v, m, k))
    assert(sparkSide.toSeq == driverSide)
  }

  test("point lookup prunes to the one file that can match, result stays exact") {
    val catalog = freshCatalog()
    rangedTable(catalog, "t")
    val containers = BloomIndex.build(spark, catalog, "t", "id")
    assert(containers.nonEmpty)

    val meta = catalog.loadTable("t")
    val snap = meta.currentSnapshot.get
    val allFiles = snap.manifest.filter(_.content == FileContent.Data).map(_.path).toSet
    assert(allFiles.size == 4)

    // every present value: pruned read == full filter (no false negatives)
    for (v <- Seq(0L, 57L, 137L, 199L)) {
      val kept = BloomIndex.mayContainFiles(meta, snap, "id", v.toString).get
      assert(kept.nonEmpty && kept.subsetOf(allFiles))
      assert(kept.size < allFiles.size, s"no pruning for id=$v: kept ${kept.size}")
      val got = BloomIndex.tablePoint(spark, catalog, "t", "id", v.toString)
        .select("id", "name").collect()
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((v, s"name-$v")))
    }

    // absent value: usually every filter says no; result must be empty
    val gone = BloomIndex.tablePoint(spark, catalog, "t", "id", "100000").collect()
    assert(gone.isEmpty)
  }

  test("files appended after the build are kept conservatively; exactness survives") {
    val catalog = freshCatalog()
    rangedTable(catalog, "t")
    BloomIndex.build(spark, catalog, "t", "id")
    val before = catalog.loadTable("t").currentSnapshot.get
      .manifest.filter(_.content == FileContent.Data).map(_.path).toSet
    IceWrite.append(spark, catalog, "t", Seq((1000L, "name-1000", 6L)).toDF("id", "name", "grp"))

    val meta = catalog.loadTable("t")
    val snap = meta.currentSnapshot.get
    val newFiles = snap.manifest.filter(_.content == FileContent.Data).map(_.path)
      .filterNot(before.contains).toSet
    assert(newFiles.nonEmpty)
    // the fresh files have no blob -> they must survive EVERY verdict
    for (v <- Seq("0", "1000", "424242")) {
      val kept = BloomIndex.mayContainFiles(meta, snap, "id", v).get
      assert(newFiles.subsetOf(kept), s"appended file pruned for value $v")
    }
    val got = BloomIndex.tablePoint(spark, catalog, "t", "id", "1000").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1000L))
  }

  test("point lookup composes with MOR deletes and rebuild restores pruning") {
    val catalog = freshCatalog()
    rangedTable(catalog, "t")
    BloomIndex.build(spark, catalog, "t", "id")
    // tombstone the looked-up row: the pruned MOR read must still apply it
    IceWrite.deleteWhere(spark, catalog, "t", col("id") === 57L)
    assert(BloomIndex.tablePoint(spark, catalog, "t", "id", "57").collect().isEmpty)
    assert(BloomIndex.tablePoint(spark, catalog, "t", "id", "58").count() == 1L)

    // compaction rewrites every path -> verdict-free files -> no pruning,
    // still exact; rebuild re-establishes pruning on the new paths
    new graft.compaction.Compaction(catalog, "t", spark).compact()
    val meta = catalog.loadTable("t")
    val snap = meta.currentSnapshot.get
    val files = snap.manifest.filter(_.content == FileContent.Data).map(_.path).toSet
    assert(BloomIndex.mayContainFiles(meta, snap, "id", "58").get == files)
    BloomIndex.build(spark, catalog, "t", "id")
    assert(BloomIndex.tablePoint(spark, catalog, "t", "id", "58").count() == 1L)
  }

  test("string column index; drop removes registration and containers") {
    val catalog = freshCatalog()
    rangedTable(catalog, "t")
    val containers = BloomIndex.build(spark, catalog, "t", "name")
    val got = BloomIndex.tablePoint(spark, catalog, "t", "name", "name-42")
      .select("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(42L))

    BloomIndex.drop(catalog, "t", "name")
    assert(!catalog.loadTable("t").properties.keys.exists(_.startsWith("graft.bloom.name")))
    assert(containers.forall(c => !java.nio.file.Files.exists(java.nio.file.Paths.get(c))))
    // no index -> plain (unpruned) read, still exact
    assert(BloomIndex.tablePoint(spark, catalog, "t", "name", "name-42").count() == 1L)
  }
}
