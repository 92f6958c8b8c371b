package graft.meta

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.compaction._
import graft.selection._

/** Write-path lifecycle tests. Catalog-parametrized like
  * [[graft.compaction.CompactionE2ESpec]]: this class runs against
  * [[LocalCatalog]]; [[RestIceWriteSpec]] re-runs the suite (including the
  * concurrent CAS-retry test) against the REST catalog. */
class IceWriteSpec extends AnyFunSuite {

  protected lazy val spark = SparkTestBase.spark
  import spark.implicits._
  protected val sf = "/root/testdata/sf0.001"

  protected def newCatalog(): Catalog =
    LocalCatalog(Files.createTempDirectory("graft-wh").toString)

  test("create -> append -> read lifecycle") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, catalog, "t_w", src)
    assert(IceRead.table(spark, catalog, "t_w").count() == 5)

    IceWrite.append(spark, catalog, "t_w",
      src.withColumn("r_regionkey", col("r_regionkey") + 100))
    val after = IceRead.table(spark, catalog, "t_w")
    assert(after.count() == 10)
    val meta = catalog.loadTable("t_w")
    assert(meta.snapshots.size == 2)
    assert(meta.currentSnapshot.get.summary("operation") == "append")
  }

  test("equality-delete append hides matching keys from the MOR view") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/orders.parquet")
    IceWrite.create(spark, catalog, "t_del", src)
    val keys = src.filter($"o_orderkey" % 10 === 0).select($"o_orderkey")
    val nDeleted = keys.count()
    IceWrite.appendEqualityDeletes(spark, catalog, "t_del", keys, Seq("o_orderkey"))

    val view = IceRead.table(spark, catalog, "t_del")
    assert(view.count() == src.count() - nDeleted)
    assert(view.filter($"o_orderkey" % 10 === 0).count() == 0)

    // rows appended AFTER the delete (newer sequence) are NOT affected
    IceWrite.append(spark, catalog, "t_del", src.filter($"o_orderkey" === 10))
    assert(IceRead.table(spark, catalog, "t_del").filter($"o_orderkey" === 10).count() > 0)
  }

  test("position-delete append removes exact rows") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/region.parquet")
    val meta = IceWrite.create(spark, catalog, "t_pos", src)
    val firstFile = meta.currentSnapshot.get.manifest.head.path
    import spark.implicits._
    val pos = Seq((firstFile, 0L), (firstFile, 2L)).toDF("file_path", "pos")
    IceWrite.appendPositionDeletes(spark, catalog, "t_pos", pos)
    assert(IceRead.table(spark, catalog, "t_pos").count() == 3)
  }

  test("concurrent appends both survive via CAS retry") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, catalog, "t_cc", src)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val futs = (1 to 2).map { i =>
      Future {
        IceWrite.append(spark, catalog, "t_cc",
          src.withColumn("r_regionkey", col("r_regionkey") + i * 100))
      }
    }
    Await.result(Future.sequence(futs), 120.seconds)
    pool.shutdown()
    assert(IceRead.table(spark, catalog, "t_cc").count() == 15) // 5 + 5 + 5
    assert(catalog.loadTable("t_cc").snapshots.size == 3)
  }

  test("two equality-delete schemas chain through real MOR read and compaction") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/customer.parquet") // 150 rows
    IceWrite.create(spark, catalog, "t_multi", src)
    // group 1: delete by c_custkey; group 2: delete by (c_nationkey, c_mktsegment)
    IceWrite.appendEqualityDeletes(spark, catalog, "t_multi",
      src.filter($"c_custkey" <= 10).select($"c_custkey"), Seq("c_custkey"))
    IceWrite.appendEqualityDeletes(spark, catalog, "t_multi",
      src.filter($"c_custkey" === 60).select($"c_nationkey", $"c_mktsegment"),
      Seq("c_nationkey", "c_mktsegment"))

    val expected = {
      val k60 = src.filter($"c_custkey" === 60).select($"c_nationkey", $"c_mktsegment")
      src.filter($"c_custkey" > 10)
        .join(k60, Seq("c_nationkey", "c_mktsegment"), "left_anti")
    }
    val view = IceRead.table(spark, catalog, "t_multi")
    assert(view.count() == expected.count())
    assert(view.select(src.columns.map(org.apache.spark.sql.functions.col): _*)
      .exceptAll(expected.select(src.columns.map(org.apache.spark.sql.functions.col): _*)).isEmpty)

    // the file group sees two distinct equality-id runs
    val meta = catalog.loadTable("t_multi")
    val tasks = meta.scanTasks(meta.currentSnapshot.get)
    val byPath = meta.currentSnapshot.get.manifest.map(f => f.path -> f).toMap
    val group = graft.selection.FileGroup.fromDataFiles(tasks, byPath.get)
    assert(graft.exec.Mor.equalityDeleteGroups(group.equalityDeleteFiles).size == 2)

    // compaction applies both groups and the compacted read is identical
    new Compaction(catalog, "t_multi", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)),
      enableValidate = true).compact()
    val after = IceRead.table(spark, catalog, "t_multi")
    assert(after.count() == expected.count())
  }

  test("upsert: one snapshot replaces matching keys and inserts new ones") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_up",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "name", "qty"))

    IceWrite.upsert(spark, catalog, "t_up",
      Seq((2L, "B2", 200L), (4L, "d", 40L)).toDF("id", "name", "qty"), keys = Seq("id"))

    val out = IceRead.table(spark, catalog, "t_up")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a", 10L), (2L, "B2", 200L), (3L, "c", 30L), (4L, "d", 40L)))

    // atomicity: exactly ONE snapshot was added, carrying delete + data
    val meta = catalog.loadTable("t_up")
    assert(meta.snapshots.size == 2)
    val m = meta.currentSnapshot.get.manifest
    assert(m.exists(_.content == FileContent.EqualityDeletes))
    assert(meta.currentSnapshot.get.summary("operation") == "overwrite")

    // a second upsert of the same key wins again (seq ordering)
    IceWrite.upsert(spark, catalog, "t_up",
      Seq((2L, "B3", 300L)).toDF("id", "name", "qty"), keys = Seq("id"))
    val again = IceRead.table(spark, catalog, "t_up")
      .filter($"id" === 2).head
    assert(again.getString(1) == "B3" && again.getLong(2) == 300L)
  }

  test("merge: conditional update/delete/insert in one snapshot; delete wins") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_m",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
        .toDF("id", "name", "qty"))

    // source matches 2, 3, 4 and brings new key 9:
    //  - id 2: update condition holds (t.qty < 25) -> updated, qty = t+s
    //  - id 3: delete condition holds (s.name = 'DEL') AND the update
    //    condition also holds -> delete wins (clause precedence)
    //  - id 4: neither condition (t.qty = 40) -> untouched
    //  - id 9: not matched -> inserted as-is
    val source = Seq((2L, "b2", 200L), (3L, "DEL", 1L), (4L, "x", 400L), (9L, "i", 90L))
      .toDF("id", "name", "qty")
    IceWrite.merge(spark, catalog, "t_m", source, keys = Seq("id"),
      matchedUpdateWhen = col("t.qty") < 25,
      matchedDeleteWhen = col("s.name") === "DEL",
      updateSet = Map("qty" -> (col("t.qty") + col("s.qty"))))

    val out = IceRead.table(spark, catalog, "t_m")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, "a", 10L),     // never in source
      (2L, "b2", 220L),   // updated: source name, t.qty + s.qty
      (4L, "d", 40L),     // matched but untouched
      (9L, "i", 90L)))    // inserted

    // atomicity: ONE snapshot carries eq-deletes + data
    val meta = catalog.loadTable("t_m")
    assert(meta.snapshots.size == 2)
    assert(meta.currentSnapshot.get.manifest.exists(_.content == FileContent.EqualityDeletes))
    assert(meta.currentSnapshot.get.summary("operation") == "overwrite")
  }

  test("merge WHEN NOT MATCHED BY SOURCE: deletes and updates unmatched target rows") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_mbs",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "stale", 30L), (4L, "old", 40L))
        .toDF("id", "name", "qty"))

    // source touches only id 1; ids 2-4 are NOT MATCHED BY SOURCE:
    //  - id 3 (name = 'stale'): by-source delete condition -> removed
    //  - id 4 (qty >= 35): by-source update condition -> qty zeroed,
    //    other columns keep target values
    //  - id 2: matches neither by-source clause -> untouched
    val source = Seq((1L, "a1", 100L)).toDF("id", "name", "qty")
    IceWrite.merge(spark, catalog, "t_mbs", source, keys = Seq("id"),
      notMatchedBySourceDeleteWhen = col("t.name") === "stale",
      notMatchedBySourceUpdateWhen = col("t.qty") >= 35,
      notMatchedBySourceSet = Map("qty" -> lit(0L)))

    val out = IceRead.table(spark, catalog, "t_mbs")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, "a1", 100L),  // matched: whole-row replace (default updateSet)
      (2L, "b", 20L),    // unmatched, no clause applies
      (4L, "old", 0L)))  // unmatched, by-source update (name kept)

    // still ONE atomic snapshot for the whole merge
    assert(catalog.loadTable("t_mbs").snapshots.size == 2)

    // default merge (clauses off) never touches unmatched target rows
    IceWrite.merge(spark, catalog, "t_mbs",
      Seq((9L, "new", 90L)).toDF("id", "name", "qty"), keys = Seq("id"))
    val out2 = IceRead.table(spark, catalog, "t_mbs")
      .collect().map(r => r.getLong(0)).toSet
    assert(out2 == Set(1L, 2L, 4L, 9L))
  }

  test("merge: NULL-valued clause conditions mean 'does not apply', never lose rows") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    // name is NULL for id 4: the delete condition (t.name === 'stale')
    // evaluates to NULL there — three-valued logic must NOT tombstone the
    // key while dropping it from the update set (silent row loss)
    IceWrite.create(spark, catalog, "t_mnull",
      Seq((1L, Some("a"), 10L), (4L, None, 40L), (5L, Some("stale"), 50L))
        .toDF("id", "name", "qty"))
    IceWrite.merge(spark, catalog, "t_mnull",
      Seq((9L, "new", 90L)).toDF("id", "name", "qty"), keys = Seq("id"),
      notMatchedBySourceDeleteWhen = col("t.name") === "stale",
      notMatchedBySourceUpdateWhen = col("t.qty") >= 35,
      notMatchedBySourceSet = Map("qty" -> lit(0L)))
    val out = IceRead.table(spark, catalog, "t_mnull")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2))).toSet
    // id 4: delete does not apply (NULL), update applies -> qty zeroed
    // id 5: deleted; id 1: untouched; id 9: inserted
    assert(out == Set((1L, "a", 10L), (4L, null, 0L), (9L, "new", 90L)))

    // matched path: a NULL update condition must leave the row untouched,
    // not tombstone it
    IceWrite.create(spark, catalog, "t_mnull2",
      Seq((1L, Some("a"), 10L), (2L, None, 20L)).toDF("id", "name", "qty"))
    IceWrite.merge(spark, catalog, "t_mnull2",
      Seq((1L, "a1", 100L), (2L, "b1", 200L)).toDF("id", "name", "qty"),
      keys = Seq("id"),
      matchedUpdateWhen = col("t.name") === "a") // NULL for id 2
    val out2 = IceRead.table(spark, catalog, "t_mnull2")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out2 == Set((1L, 100L), (2L, 20L)))
  }

  test("merge rejects duplicate source keys (SQL MERGE multi-match rule)") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_mdup",
      Seq((1L, "a")).toDF("id", "name"))
    val err = intercept[IllegalArgumentException] {
      IceWrite.merge(spark, catalog, "t_mdup",
        Seq((1L, "x"), (1L, "y")).toDF("id", "name"), keys = Seq("id"))
    }
    assert(err.getMessage.contains("duplicate keys"))
    assert(catalog.loadTable("t_mdup").snapshots.size == 1) // nothing committed
  }

  test("deleteWhere appends position tombstones; no data file rewritten") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/nation.parquet")
    IceWrite.create(spark, catalog, "t_dw", src)
    val filesBefore = catalog.loadTable("t_dw").currentSnapshot.get
      .manifest.filter(_.content == FileContent.Data).map(_.path).toSet

    IceWrite.deleteWhere(spark, catalog, "t_dw", col("n_regionkey") === 2)

    val out = IceRead.table(spark, catalog, "t_dw")
    val expected = src.filter(col("n_regionkey") =!= 2)
    assert(out.count() == expected.count())
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
    val meta = catalog.loadTable("t_dw")
    val dataAfter = meta.currentSnapshot.get.manifest
      .filter(_.content == FileContent.Data).map(_.path).toSet
    assert(dataAfter == filesBefore) // untouched: MOR, not rewrite
    assert(meta.currentSnapshot.get.manifest.exists(_.content == FileContent.PositionDeletes))

    // deleting already-deleted rows is a harmless no-op on the view
    IceWrite.deleteWhere(spark, catalog, "t_dw", col("n_regionkey") === 2)
    assert(IceRead.table(spark, catalog, "t_dw").count() == expected.count())
  }

  test("write-audit-publish: staged branch commits invisible on main until publish") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_wap",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    IceWrite.createBranch(catalog, "t_wap", "audit")

    // stage an upsert and a delete on the branch
    IceWrite.upsert(spark, catalog, "t_wap",
      Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), keys = Seq("id"), branch = "audit")
    IceWrite.deleteWhere(spark, catalog, "t_wap", $"id" === 1, branch = "audit")

    // main is untouched; the branch sees the staged state
    val main = IceRead.table(spark, catalog, "t_wap")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(main == Set((1L, "a"), (2L, "b")))
    val staged = IceRead.table(spark, catalog, "t_wap", branch = "audit")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(staged == Set((2L, "b2"), (3L, "c")))

    // publish fast-forwards main to the audited head
    IceWrite.publishBranch(catalog, "t_wap", "audit")
    val published = IceRead.table(spark, catalog, "t_wap")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(published == staged)
  }

  test("snapshot summaries carry auto-computed stats; metadata tables expose them") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_sum", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    IceWrite.append(spark, catalog, "t_sum", Seq((3L, "c")).toDF("id", "v"))
    IceWrite.deleteWhere(spark, catalog, "t_sum", col("id") === 1)

    val meta = catalog.loadTable("t_sum")
    val head = meta.currentSnapshot.get.summary
    assert(head("operation") == "delete")
    assert(head("added-delete-files") == "1")
    assert(head("total-records") == "3") // data records; tombstone hides one at read
    val appendSummary = meta.snapshotById(2L).get.summary
    assert(appendSummary("added-data-files").toInt >= 1)
    assert(appendSummary("added-records") == "1")

    val snaps = IceRead.snapshots(spark, catalog, "t_sum")
    assert(snaps.count() == 3)
    assert(snaps.filter(col("operation") === "append").count() == 2)
    val files = IceRead.files(spark, catalog, "t_sum")
    assert(files.filter(col("content") === "Data").count() ==
      head("total-data-files").toLong)
    assert(files.filter(col("content") === "PositionDeletes").count() == 1)
  }

  test("rollback moves a branch to an ancestor; tags pin snapshots and never move") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    IceWrite.create(spark, catalog, "t_rb", Seq((1L, "a")).toDF("id", "v"))   // 1
    IceWrite.append(spark, catalog, "t_rb", Seq((2L, "b")).toDF("id", "v"))   // 2
    IceWrite.createTag(catalog, "t_rb", "v1.0", 2L)
    IceWrite.append(spark, catalog, "t_rb", Seq((3L, "c")).toDF("id", "v"))   // 3
    assert(IceRead.table(spark, catalog, "t_rb").count() == 3)

    // rollback to snapshot 2: reads shrink, nothing deleted, history intact
    IceWrite.rollbackTo(catalog, "t_rb", 2L)
    assert(IceRead.table(spark, catalog, "t_rb").count() == 2)
    assert(catalog.loadTable("t_rb").snapshots.size == 3)
    assert(IceRead.tableAt(spark, catalog, "t_rb", 3L).count() == 3) // still travelable

    // a tag reads its pinned snapshot; immutability + validation enforced
    assert(IceRead.tableAtTag(spark, catalog, "t_rb", "v1.0").count() == 2)
    intercept[IllegalArgumentException] { IceWrite.createTag(catalog, "t_rb", "v1.0", 1L) }
    intercept[IllegalArgumentException] { IceWrite.createTag(catalog, "t_rb", "v2", 99L) }
    intercept[IllegalArgumentException] { IceWrite.rollbackTo(catalog, "t_rb", 3L) } // not an ancestor now

    // refs metadata table lists branches and tags
    val refs = IceRead.refs(spark, catalog, "t_rb")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs == Set(("main", "branch", 2L), ("v1.0", "tag", 2L)))

    // history metadata table is rollback-aware: the abandoned snapshot 3
    // stays listed but is no longer a current ancestor
    val hist = IceRead.history(spark, catalog, "t_rb")
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(hist == Map(1L -> true, 2L -> true, 3L -> false))

    // all_files spans the whole history: snapshot 3's file is still
    // pinned by snapshot 3 even though the head rolled back past it
    val af = IceRead.allFiles(spark, catalog, "t_rb")
    assert(af.filter(af("snapshot_id") === 3L).count() >= 3) // its full manifest
    assert(af.select("snapshot_id").distinct().count() == 3)

    // expiry keeps the tag-pinned snapshot even when out of the keep window
    IceWrite.append(spark, catalog, "t_rb", Seq((4L, "d")).toDF("id", "v"))   // 4 (new head)
    graft.compaction.Maintenance.expireSnapshots(catalog, "t_rb", keepLast = 1)
    val kept = catalog.loadTable("t_rb").snapshots.map(_.snapshotId).toSet
    assert(kept.contains(2L), "tag-pinned snapshot must survive expiry")
    assert(!kept.contains(1L) && !kept.contains(3L))
    assert(IceRead.tableAtTag(spark, catalog, "t_rb", "v1.0").count() == 2)

    // dropping the tag unpins it for the next expiry
    IceWrite.dropTag(catalog, "t_rb", "v1.0")
    graft.compaction.Maintenance.expireSnapshots(catalog, "t_rb", keepLast = 1)
    assert(!catalog.loadTable("t_rb").snapshots.map(_.snapshotId).contains(2L))
  }

  test("partitions metadata table aggregates the manifest per partition") {
    val catalog = newCatalog()
    val s = spark
    import s.implicits._
    val src = (1L to 40L).map(i => (i, s"v$i", (i % 4).toString)).toDF("id", "v", "p")
    IceWrite.create(spark, catalog, "t_parts", src,
      partitionSpec = Seq(PartitionField("p")))
    IceWrite.deleteWhere(spark, catalog, "t_parts", col("id") === 1L)

    val parts = IceRead.partitions(spark, catalog, "t_parts")
      .collect().map(r => (r.getMap[String, String](0).toMap,
        r.getLong(1), r.getLong(2), r.getLong(4))).toList
    assert(parts.map(_._1).toSet ==
      (0 to 3).map(i => Map("p" -> i.toString)).toSet ++
        Set(Map.empty[String, String])) // the unpartitioned pos-delete file
    // each identity partition holds 10 records
    for ((pv, dataFiles, records, _) <- parts if pv.nonEmpty) {
      assert(dataFiles >= 1L && records == 10L, s"partition $pv: $dataFiles files, $records records")
    }
    // tombstone files are global (no partition values), counted as deletes
    val global = parts.find(_._1.isEmpty).get
    assert(global._2 == 0L && global._4 >= 1L)
  }

  test("ingested table compacts and reads back identically") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/customer.parquet")
    IceWrite.create(spark, catalog, "t_ing", src.limit(50))
    IceWrite.append(spark, catalog, "t_ing", src.filter($"c_custkey" > 50).limit(50))
    IceWrite.appendEqualityDeletes(spark, catalog, "t_ing",
      src.limit(10).select($"c_custkey"), Seq("c_custkey"))
    val before = IceRead.table(spark, catalog, "t_ing").cache()
    val n = before.count()
    new Compaction(catalog, "t_ing", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1))).compact()
    val after = IceRead.table(spark, catalog, "t_ing")
    assert(after.count() == n)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("cherry-pick refuses a staged snapshot whose parent was expired") {
    val catalog = newCatalog()
    val src = spark.read.parquet(s"$sf/region.parquet")
    IceWrite.create(spark, catalog, "t_cp", src) // snap 1
    // stage an append (parent = snap 1), then move main twice
    IceWrite.append(spark, catalog, "t_cp",
      src.withColumn("r_regionkey", col("r_regionkey") + 100),
      stageWapId = Some("w1"))
    val stagedId = catalog.loadTable("t_cp").snapshots
      .find(_.summary.get("wap.id").contains("w1")).get.snapshotId
    IceWrite.append(spark, catalog, "t_cp",
      src.withColumn("r_regionkey", col("r_regionkey") + 200))
    IceWrite.append(spark, catalog, "t_cp",
      src.withColumn("r_regionkey", col("r_regionkey") + 300))
    // expire the staged snapshot's parent: keep the newest 3 (incl. the
    // staged one) so only snap 1 drops
    Maintenance.expireSnapshots(catalog, "t_cp", keepLast = 3)
    val meta = catalog.loadTable("t_cp")
    assert(meta.snapshotById(stagedId).nonEmpty, "test setup: staged snapshot survives")
    assert(meta.snapshotById(meta.snapshotById(stagedId).get.parentId.get).isEmpty,
      "test setup: the staged snapshot's parent is expired")
    // without the parent, the 'added files' of the staged snapshot cannot
    // be derived — a blind re-apply would duplicate its EXISTING files
    val e = intercept[IllegalArgumentException](
      IceWrite.cherrypickSnapshot(catalog, "t_cp", stagedId))
    assert(e.getMessage.contains("expired"))
    // and the refusal left the table untouched
    assert(IceRead.table(spark, catalog, "t_cp").count() == 15)
  }
}
