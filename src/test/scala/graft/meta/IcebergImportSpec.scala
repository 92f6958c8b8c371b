package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The interop loop closed: a graft table exported to Iceberg-v2
  * metadata imports back into a FRESH catalog and reads identically —
  * MOR semantics (equality deletes + sequence rules), time travel,
  * partition pruning, refs. Data files are referenced in place; the
  * import costs metadata only. */
class IcebergImportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("export -> import round trip: same MOR view, snapshots, refs") {
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-rt-src").toString)
    val src = spark.read.parquet(s"$sf/customer.parquet")
    IceWrite.create(spark, srcCat, "t_rt", src)
    IceWrite.append(spark, srcCat, "t_rt",
      src.withColumn("c_custkey", col("c_custkey") + 1000))
    IceWrite.appendEqualityDeletes(spark, srcCat, "t_rt",
      src.filter(col("c_custkey") < 7).select(col("c_custkey")), Seq("c_custkey"))
    IceWrite.createTag(srcCat, "t_rt", "v1", 1L)
    val orig = srcCat.loadTable("t_rt")

    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "t_rt")

    val dstCat = LocalCatalog(Files.createTempDirectory("ice-rt-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dstCat, "t_back", jsonPath)

    // schema ids/names/types survive
    assert(back.schema == orig.schema)
    assert(back.tags == orig.tags)
    assert(back.currentSnapshotId == orig.currentSnapshotId)
    assert(back.snapshots.map(_.snapshotId) == orig.snapshots.map(_.snapshotId))
    assert(back.snapshots.map(_.sequenceNumber) == orig.snapshots.map(_.sequenceNumber))

    // the MOR view through the imported metadata equals the original
    val a = IceRead.table(spark, srcCat, "t_rt")
    val b = IceRead.table(spark, dstCat, "t_back")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.count() == 2 * src.count() - 7) // keys 0..6 deleted

    // time travel through the imported history
    val atV1 = IceRead.tableAt(spark, dstCat, "t_back", 1L)
    assert(atV1.count() == src.count())
  }

  test("partitioned export/import keeps partition values and pruning") {
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-rt-p-src").toString)
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    IceWrite.create(spark, srcCat, "t_p", src,
      partitionSpec = Seq(PartitionField("n_regionkey")))
    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "t_p")
    val dstCat = LocalCatalog(Files.createTempDirectory("ice-rt-p-dst").toString)
    val back = IcebergImport.importIcebergMetadata(dstCat, "t_pb", jsonPath)
    assert(back.partitionSpec == Seq(PartitionField("n_regionkey")))
    val entries = back.currentSnapshot.get.manifest
    assert(entries.forall(_.partitionValues.contains("n_regionkey")))
    val a = IceRead.table(spark, srcCat, "t_p")
    val b = IceRead.table(spark, dstCat, "t_pb")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("format v3 and non-parquet formats are refused") {
    val dir = Files.createTempDirectory("ice-rt-bad").toString
    val p = MetaIO.join(dir, "bad.metadata.json")
    MetaIO.writeString(p, """{"format-version": 3}""")
    val cat = LocalCatalog(Files.createTempDirectory("ice-rt-bad-c").toString)
    val e = intercept[IllegalArgumentException](
      IcebergImport.importIcebergMetadata(cat, "t_bad", p))
    assert(e.getMessage.contains("format-version"))
  }
}
