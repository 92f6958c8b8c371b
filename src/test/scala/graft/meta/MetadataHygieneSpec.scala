package graft.meta

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.compaction.Maintenance
import graft.testkit.FileGenerator

/** Round-5 hardening: empirical anchor discovery in metadata cleanup,
  * hint-file validation against truncated/stale reads, and the spec's
  * reserved field ids on position-delete parquet footers. */
class MetadataHygieneSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** Top-level field ids of a parquet file's footer schema, by name. */
  private def footerFieldIds(path: String): Map[String, Option[Int]] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(f => f.getName -> Option(f.getId).map(_.intValue())).toMap
    finally r.close()
  }

  test("appendPositionDeletes stamps the reserved iceberg field ids into the footer") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet(s"$sf/region.parquet")
    val meta = IceWrite.create(spark, catalog, "t_fid", src)
    val firstFile = meta.currentSnapshot.get.manifest.head.path
    val pos = Seq((firstFile, 0L)).toDF("file_path", "pos")
    IceWrite.appendPositionDeletes(spark, catalog, "t_fid", pos)

    val tombstone = catalog.loadTable("t_fid").currentSnapshot.get.manifest
      .filter(_.content == FileContent.PositionDeletes)
    assert(tombstone.nonEmpty)
    tombstone.foreach { f =>
      val ids = footerFieldIds(f.path)
      assert(ids("file_path").contains(IceWrite.PosDeleteFilePathFieldId))
      assert(ids("pos").contains(IceWrite.PosDeletePosFieldId))
    }
    // the MOR view still applies the tombstone (name-matched read unbroken)
    assert(IceRead.table(spark, catalog, "t_fid").count() == 4)
  }

  test("FileGenerator and maintenance rewrites stamp reserved ids too") {
    val catalog = LocalCatalog(Files.createTempDirectory("graft-wh").toString)
    val src = spark.read.parquet(s"$sf/nation.parquet")
    FileGenerator.writeTable(spark, catalog, "t_fid2", src,
      FileGenerator.Config(dataFileCount = 3, posDeleteRowsPerFile = 4,
        orderCol = "n_nationkey"))
    def posFiles() = catalog.loadTable("t_fid2").currentSnapshot.get.manifest
      .filter(f => f.content == FileContent.PositionDeletes && !f.isDeletionVector)
    posFiles().foreach { f =>
      val ids = footerFieldIds(f.path)
      assert(ids("file_path").contains(IceWrite.PosDeleteFilePathFieldId))
      assert(ids("pos").contains(IceWrite.PosDeletePosFieldId))
    }
    val before = IceRead.table(spark, catalog, "t_fid2").count()
    Maintenance.rewritePositionDeletes(spark, catalog, "t_fid2")
    posFiles().foreach { f =>
      val ids = footerFieldIds(f.path)
      assert(ids("file_path").contains(IceWrite.PosDeleteFilePathFieldId))
      assert(ids("pos").contains(IceWrite.PosDeletePosFieldId))
    }
    assert(IceRead.table(spark, catalog, "t_fid2").count() == before)
  }

  test("cleanMetadataVersions survives a warehouse reopened with a different anchorEvery") {
    // writer: anchors every 16 versions -> v1 is the only full anchor in
    // the first window; v2..v12 are deltas chained down to v1
    val wh = Files.createTempDirectory("graft-wh").toString
    val writer = new LocalCatalog(wh, anchorEvery = 16)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, writer, "t_anchor", src)
    (1 to 11).foreach { i =>
      IceWrite.append(spark, writer, "t_anchor",
        src.withColumn("r_regionkey", col("r_regionkey") + i * 100))
    }
    assert(writer.loadTable("t_anchor").version == 12)

    // reader instance with MISMATCHED anchorEvery=4: arithmetic would put
    // the "anchor" at v12 and delete the whole delta chain below it —
    // empirical discovery must keep v1..v11 because v12's delta-of-version
    // chain reaches them
    val reader = new LocalCatalog(wh, anchorEvery = 4)
    Maintenance.cleanMetadataVersions(reader, "t_anchor", keepLast = 1)

    // a FRESH instance (empty decoded cache — nothing masked) still loads
    val fresh = new LocalCatalog(wh)
    val meta = fresh.loadTable("t_anchor")
    assert(meta.version == 12)
    assert(meta.snapshots.size == 12)
    assert(IceRead.table(spark, fresh, "t_anchor").count() == 12 * 5)
  }

  test("cleanMetadataVersions still prunes when chains allow it") {
    // anchorEvery=1: every version full, nothing chains -> keepLast wins
    val wh = Files.createTempDirectory("graft-wh").toString
    val cat = new LocalCatalog(wh, anchorEvery = 1)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, cat, "t_prune", src)
    (1 to 9).foreach(i => IceWrite.append(spark, cat, "t_prune",
      src.withColumn("r_regionkey", col("r_regionkey") + i * 100)))
    val deleted = Maintenance.cleanMetadataVersions(cat, "t_prune", keepLast = 3)
    assert(deleted == 7) // v1..v7 gone, v8..v10 retained
    assert(new LocalCatalog(wh).loadTable("t_prune").version == 10)
  }

  test("a stale or truncated numeric hint is distrusted when its version file is gone") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val cat = new LocalCatalog(wh, anchorEvery = 1)
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, cat, "t_hint", src)
    (1 to 19).foreach(i => IceWrite.append(spark, cat, "t_hint",
      src.withColumn("r_regionkey", col("r_regionkey") + i * 100)))
    Maintenance.cleanMetadataVersions(cat, "t_hint", keepLast = 5) // v16..v20 remain

    // simulate the torn read the in-place hint rewrite allows: a reader
    // observes the numeric PREFIX "2" of "20" — which names a version
    // cleanup already pruned; roll-forward from there would die at the gap
    val hint = MetaIO.join(wh, "t_hint", "metadata", "version-hint.text")
    MetaIO.writeString(hint, "2")
    val fresh = new LocalCatalog(wh)
    assert(fresh.loadTable("t_hint").version == 20)
    assert(IceRead.table(spark, fresh, "t_hint").count() == 20 * 5)
  }
}
