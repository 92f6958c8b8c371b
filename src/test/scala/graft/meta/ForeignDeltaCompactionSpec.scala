package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.compaction.Compaction

/** The switch-engines loop CLOSED end to end: a foreign engine writes
  * row-deltas (pos- and equality-deletes) through the REST commit
  * endpoint, graft's native auto-compaction then clears that foreign
  * delete debt, and a follower attached over REST sees the compaction
  * as INVISIBLE (rows identical, changelog silent) — the reference's
  * whole raison d'être (MOR delete compaction) driven by deletes this
  * engine never planned. */
class ForeignDeltaCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("foreign REST deltas -> native compaction -> follower continuity") {
    val cat = LocalCatalog(Files.createTempDirectory("fdc-src").toString)
    IceWrite.create(spark, cat, "t",
      (1L to 30L).map(i => (i, s"n$i")).toDF("id", "name").repartition(1))
    IceWrite.append(spark, cat, "t",
      (31L to 60L).map(i => (i, s"n$i")).toDF("id", "name").repartition(1))
    IceWrite.append(spark, cat, "t",
      (61L to 90L).map(i => (i, s"n$i")).toDF("id", "name").repartition(1))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val dst = LocalCatalog(Files.createTempDirectory("fdc-dst").toString)
      IcebergRestImport.importTable(dst, "t", srv.uri, Seq("wh"), "t")
      val staging = Files.createTempDirectory("fdc-stage").toString
      val schema = cat.loadTable("t").schema

      // ---- the FOREIGN engine's deltas: a pos-delete on file 1 and an
      // equality-delete, committed through the spec endpoint
      val f1 = cat.loadTable("t").currentSnapshot.get.manifest
        .filter(_.content == FileContent.Data).head.path
      val (pd, pdSz, pdN, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withPosDeleteFieldIds(
          Seq((f1, 0L), (f1, 1L), (f1, 2L)).toDF("file_path", "pos")),
        java.nio.file.Paths.get(staging, "fpd.parquet"))
      IcebergRestCommit.commitDelta(srv.uri, Seq("wh"), "t", Nil,
        Seq(IcebergRestCommit.AddedDeleteFile(pd, pdSz, pdN, "position")), staging)
      val (eq, eqSz, eqN, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          Seq(40L, 41L, 42L, 80L).map(Tuple1(_)).toDF("id"), schema),
        java.nio.file.Paths.get(staging, "feq.parquet"))
      IcebergRestCommit.commitDelta(srv.uri, Seq("wh"), "t", Nil,
        Seq(IcebergRestCommit.AddedDeleteFile(eq, eqSz, eqN, "equality",
          equalityFieldIds = Seq(1))), staging)

      val expected = IceRead.table(spark, cat, "t").collect().toSet
      assert(expected.size == 83, s"3 pos + 4 eq masked: ${expected.size}")

      // the follower refreshes onto the post-delta state
      IcebergRestImport.refreshTable(dst, "t")
      val refreshSnapshot = dst.loadTable("t").currentSnapshotId.get

      // ---- NATIVE auto-compaction clears the FOREIGN delete debt
      // (cleanupDanglingDeletes folds the now-inapplicable foreign
      // delete files out of the manifest in the same pass)
      val result = new Compaction(cat, "t", spark,
        cleanupDanglingDeletes = true).compact()
      assert(result.addedFiles.nonEmpty)
      val head = cat.loadTable("t").currentSnapshot.get
      assert(head.manifest.forall(_.content == FileContent.Data),
        s"foreign delete files must be compacted away: ${head.manifest}")
      assert(IceRead.table(spark, cat, "t").collect().toSet == expected,
        "compaction must preserve exactly the post-delta rows")

      // ---- the follower follows: same rows, and the compaction window
      // is changelog-SILENT (physical rewrite, no logical change)
      val r = IcebergRestImport.refreshTable(dst, "t")
      assert(r.refreshed)
      assert(IceRead.table(spark, dst, "t").collect().toSet == expected)
      val changes = Changelog.changesBetween(spark, dst, "t",
        refreshSnapshot, dst.loadTable("t").currentSnapshotId.get)
      assert(changes.isEmpty, "a compaction must not replay as change")

      // ---- and the spec client keeps writing on the compacted table
      val (nf, nfSz, nfN, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(Seq((1000L, "post")).toDF("id", "name"), schema),
        java.nio.file.Paths.get(staging, "post.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "t",
        Seq(IcebergRestCommit.AddedFile(nf, nfSz, nfN)), staging)
      assert(IceRead.table(spark, cat, "t").count() == 84L)
    } finally srv.stop()
  }
}
