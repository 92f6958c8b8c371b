package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Iceberg v3 row lineage: disjoint id ranges claimed at commit through
  * the CAS, inherited `_row_id` reads, identity surviving deletes and —
  * via materialization — compaction. */
class RowLineageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("lineage-wh").toString)

  private def rows(from: Long, n: Long) =
    (from until from + n).map(i => (i, s"n$i")).toDF("id", "name")

  test("v3 commits claim disjoint ranges; v2 tables claim nothing") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t3", rows(0, 10).repartition(2), formatVersion = 3)
    IceWrite.append(spark, cat, "t3", rows(100, 5))
    val meta = cat.loadTable("t3")
    val data = meta.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).sortBy(_.firstRowId.get)
    assert(data.forall(_.firstRowId.isDefined))
    // ranges tile [0, totalRows) exactly: each file starts where the
    // previous ended
    val expectedStarts = data.scanLeft(0L)(_ + _.recordCount).init
    assert(data.map(_.firstRowId.get) == expectedStarts)
    assert(meta.nextRowId == 15L)

    val cat2 = freshCatalog()
    IceWrite.create(spark, cat2, "t2", rows(0, 10))
    val m2 = cat2.loadTable("t2")
    assert(m2.nextRowId == 0L)
    assert(m2.currentSnapshot.get.manifest.forall(_.firstRowId.isEmpty))
    intercept[IllegalArgumentException](
      IceRead.tableWithRowIds(spark, cat2, "t2"))
  }

  test("row ids are unique, dense, and stable across deletes") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t", rows(0, 20).repartition(3), formatVersion = 3)
    val before = IceRead.tableWithRowIds(spark, cat, "t")
      .select(col("id"), col(graft.exec.Mor.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(before.values.toSeq.sorted == (0L until 20L))

    IceWrite.deleteWhere(spark, cat, "t", col("id") % 3 === 0)
    val after = IceRead.tableWithRowIds(spark, cat, "t")
      .select(col("id"), col(graft.exec.Mor.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(after.keySet == (0L until 20L).filterNot(_ % 3 == 0).toSet)
    // every survivor keeps exactly its old id
    assert(after.forall { case (k, rid) => before(k) == rid })
  }

  test("compaction preserves row ids by materializing _row_id") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "tc", rows(0, 30).repartition(4), formatVersion = 3)
    IceWrite.deleteWhere(spark, cat, "tc", col("id") >= 25)
    IceWrite.append(spark, cat, "tc", rows(500, 5))
    val before = IceRead.tableWithRowIds(spark, cat, "tc")
      .select(col("id"), col(graft.exec.Mor.RowIdCol))
      .as[(Long, Long)].collect().toMap
    // _last_updated_seq BEFORE compaction: created rows carry their data
    // file's seq 1, the later append's rows its own (higher) seq
    val seqsBefore = IceRead.tableWithRowIds(spark, cat, "tc")
      .select(col("id"), col(graft.exec.Mor.LastUpdatedSeqCol))
      .as[(Long, Long)].collect().toMap
    assert(seqsBefore.filter(_._1 < 500).values.toSet == Set(1L))
    assert(seqsBefore.filter(_._1 >= 500).values.toSet.size == 1)
    assert(seqsBefore.filter(_._1 >= 500).values.head > 1L)

    new graft.compaction.Compaction(cat, "tc", spark).compact()

    val meta = cat.loadTable("tc")
    val dataFiles = meta.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data)
    // rewritten files physically carry BOTH lineage columns
    val footerCols = graft.exec.SparkExecutor.parquetFooterColumns(
      spark.sessionState.newHadoopConf(),
      dataFiles.head.path)
    assert(footerCols.contains(graft.exec.Mor.RowIdCol))
    assert(footerCols.contains(graft.exec.Mor.LastUpdatedSeqCol))
    // ...and the ORIGINAL update seqs survive the rewrite (compaction is
    // not an update)
    val seqsAfter = IceRead.tableWithRowIds(spark, cat, "tc")
      .select(col("id"), col(graft.exec.Mor.LastUpdatedSeqCol))
      .as[(Long, Long)].collect().toMap
    assert(seqsAfter == seqsBefore, "compaction changed last-updated seqs")

    val after = IceRead.tableWithRowIds(spark, cat, "tc")
      .select(col("id"), col(graft.exec.Mor.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(after == before, "compaction re-identified rows")

    // and the next append continues from an advanced cursor (the rewrite
    // claimed ranges even though its rows are materialized)
    IceWrite.append(spark, cat, "tc", rows(900, 3))
    val ids = IceRead.tableWithRowIds(spark, cat, "tc")
      .select(col(graft.exec.Mor.RowIdCol)).as[Long].collect()
    assert(ids.distinct.length == ids.length, "duplicate row ids after append")
  }

  test("COW updateWhere/purgeWhere preserve survivor identity; updates bump the seq") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "tw", rows(0, 12).repartition(2), formatVersion = 3)
    def lineage() = IceRead.tableWithRowIds(spark, cat, "tw")
      .select(col("id"), col(graft.exec.Mor.RowIdCol),
        col(graft.exec.Mor.LastUpdatedSeqCol))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val before = lineage()

    // COW UPDATE of ids % 4 == 0: every surviving row keeps its _row_id;
    // updated rows get the overwrite's fresh seq, untouched rows keep 1
    graft.compaction.RowRewrite.updateWhere(spark, cat, "tw",
      col("id") % 4 === 0, Map("name" -> upper(col("name"))))
    val afterUpd = lineage()
    assert(afterUpd.keySet == before.keySet)
    assert(afterUpd.forall { case (k, (rid, _)) => before(k)._1 == rid },
      "COW update re-identified rows")
    val updSeq = afterUpd.filter(_._1 % 4 == 0).values.map(_._2).toSet
    assert(updSeq.size == 1 && updSeq.head > 1L, s"updated rows seq: $updSeq")
    assert(afterUpd.filterNot(_._1 % 4 == 0).values.forall(_._2 == 1L),
      "untouched rows lost their original update seq")

    // COW purge of ids % 3 == 0: survivors keep both lineage fields
    graft.compaction.RowRewrite.purgeWhere(spark, cat, "tw", col("id") % 3 === 0)
    val afterPurge = lineage()
    assert(afterPurge.keySet == afterUpd.keySet.filterNot(_ % 3 == 0))
    assert(afterPurge.forall { case (k, v) => afterUpd(k) == v },
      "purge changed survivor lineage")
  }

  test("MOR updateWhere on v3: DV tombstones + identity-preserving rewritten copies") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "tm", rows(0, 12).repartition(2), formatVersion = 3)
    def lineage() = IceRead.tableWithRowIds(spark, cat, "tm")
      .select(col("id"), col(graft.exec.Mor.RowIdCol),
        col(graft.exec.Mor.LastUpdatedSeqCol))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val before = lineage()

    // ONE snapshot: deletion-vector tombstones (v3 forbids new parquet
    // position deletes) + rewritten copies materializing the survivor's
    // _row_id — the updated row is the SAME row
    IceWrite.updateWhere(spark, cat, "tm",
      Map("name" -> upper(col("name"))), col("id") % 4 === 0)
    val head = cat.loadTable("tm").currentSnapshot.get
    assert(head.summary("operation") == "overwrite")
    assert(head.manifest.filter(_.content == FileContent.PositionDeletes)
      .forall(_.isDeletionVector), "v3 MOR update must tombstone via DVs")

    val after = lineage()
    assert(after.keySet == before.keySet, "update lost or duplicated rows")
    assert(after.forall { case (k, (rid, _)) => before(k)._1 == rid },
      "MOR v3 update re-identified rows")
    // updated rows' _last_updated_seq moves to the update's sequence
    // (derived from the new file's sequence number, nothing materialized)
    val updSeq = after.filter(_._1 % 4 == 0).values.map(_._2).toSet
    assert(updSeq == Set(head.sequenceNumber), s"updated rows seq: $updSeq")
    assert(after.filterNot(_._1 % 4 == 0).values.forall(_._2 == 1L),
      "untouched rows lost their original update seq")
    // values actually updated; ids stay globally unique
    assert(IceRead.table(spark, cat, "tm").filter(col("id") % 4 === 0)
      .select("name").as[String].collect().forall(n => n == n.toUpperCase))
    val ids = after.values.map(_._1).toSeq
    assert(ids.distinct.size == ids.size)
  }

  test("concurrent appends claim disjoint ranges through the CAS") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "tr", rows(0, 4), formatVersion = 3)
    // real concurrency: both writers load the same head, race the commit,
    // the loser retries against the winner's cursor
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = (1 to 4).map(k => scala.concurrent.Future {
        IceWrite.append(spark, cat, "tr", rows(k * 100L, 5))
      })
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs), scala.concurrent.duration.Duration("120s"))
    } finally pool.shutdown()

    val meta = cat.loadTable("tr")
    val data = meta.currentSnapshot.get.manifest.filter(_.content == FileContent.Data)
    val ranges = data.map(f => (f.firstRowId.get, f.firstRowId.get + f.recordCount))
      .sortBy(_._1)
    // no two files overlap, and the ranges tile [0, nextRowId) exactly
    assert(ranges.sliding(2).forall {
      case Seq((_, e1), (s2, _)) => e1 <= s2; case _ => true })
    assert(ranges.map { case (s, e) => e - s }.sum == 24L)
    assert(meta.nextRowId == ranges.map(_._2).max)
    val ids = IceRead.tableWithRowIds(spark, cat, "tr")
      .select(col(graft.exec.Mor.RowIdCol)).as[Long].collect()
    assert(ids.distinct.length == 24)
  }

  test("imported (add_files) data participates in lineage: inherited ids, preserved by compaction") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "ti", rows(0, 6), formatVersion = 3)
    // foreign parquet (no field ids, no _row_id column): the name-matched
    // read yields NULL for the materialized column, so the inherited
    // firstRowId + position path must carry the ids
    val ext = Files.createTempDirectory("lineage-ext").toString + "/d"
    rows(100, 4).coalesce(1).write.parquet(ext)
    val files = scala.util.Using.resource(
      Files.walk(java.nio.file.Paths.get(ext))) { w =>
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(_.toString).toSeq.sorted
      }
    IceWrite.addFiles(spark, cat, "ti", files)

    val got = IceRead.tableWithRowIds(spark, cat, "ti")
      .select(col("id"), col(graft.exec.Mor.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 10 && got.values.toSeq.sorted == (0L until 10L))
    // imported rows claimed the appended range
    assert(got.filter(_._1 >= 100).values.toSet == (6L until 10L).toSet)

    // compaction graduates the imported files AND preserves their ids
    new graft.compaction.Compaction(cat, "ti", spark).compact()
    val after = IceRead.tableWithRowIds(spark, cat, "ti")
      .select(col("id"), col(graft.exec.Mor.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(after == got)
    assert(cat.loadTable("ti").currentSnapshot.get.manifest.forall(!_.nameMatched))
  }

  test("metadata JSON round-trips lineage fields") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "tj", rows(0, 4), formatVersion = 3)
    val meta = cat.loadTable("tj")
    val re = MetadataJson.read(MetadataJson.write(meta))
    assert(re == meta)
    assert(re.nextRowId == 4L)
    assert(re.currentSnapshot.get.manifest.head.firstRowId.contains(0L))
  }
}
