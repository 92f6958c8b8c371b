package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.compaction.Compaction
import graft.selection.{FullCompactionConfig, PlanningParams}

/** ChangeFeed delivery contract: ordered per-snapshot frames, durable
  * checkpoint resume, compaction-invisible, end-to-end mirror via the
  * upsert sink.
  */
class ChangeFeedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def newCatalog(): LocalCatalog =
    LocalCatalog(Files.createTempDirectory("graft-wh").toString)

  private def df(rows: Seq[(Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "name", "qty")
  }

  test("poll delivers one ordered frame per snapshot and checkpoints each") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_feed", df(Seq((1L, "a", 10L))))      // 1
    IceWrite.append(spark, catalog, "t_feed", df(Seq((2L, "b", 20L))))      // 2
    IceWrite.upsert(spark, catalog, "t_feed", df(Seq((2L, "b2", 21L))), Seq("id")) // 3

    val ck = Files.createTempDirectory("feed-ck").resolve("ck").toString
    val feed = new ChangeFeed(spark, catalog, "t_feed", ck)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String)])]
    assert(feed.poll((frame, snap) => seen += snap.snapshotId ->
      frame.collect().map(r => (r.getLong(0), r.getString(3))).toSet) == 3)

    assert(seen.map(_._1).toSeq == Seq(1L, 2L, 3L), "commit order")
    assert(seen(0)._2 == Set((1L, "insert")))
    assert(seen(1)._2 == Set((2L, "insert")))
    assert(seen(2)._2 == Set((2L, "insert"), (2L, "delete")))
    assert(feed.checkpoint() == 3L)

    // nothing new -> no deliveries; new commit -> exactly one more
    assert(feed.poll((_, _) => fail("no new snapshot to deliver")) == 0)
    IceWrite.append(spark, catalog, "t_feed", df(Seq((4L, "d", 40L))))      // 4
    assert(feed.poll((frame, snap) => {
      assert(snap.snapshotId == 4L)
      assert(frame.count() == 1)
    }) == 1)
  }

  test("pollPrepared: prepare runs once per snapshot, handlers stay ordered, " +
      "checkpoint still advances per handled snapshot") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_feedp", df(Seq((1L, "a", 10L))))      // 1
    IceWrite.append(spark, catalog, "t_feedp", df(Seq((2L, "b", 20L))))      // 2
    IceWrite.upsert(spark, catalog, "t_feedp", df(Seq((2L, "b2", 21L))), Seq("id")) // 3

    val ck = Files.createTempDirectory("feedp-ck").resolve("ck").toString
    val feed = new ChangeFeed(spark, catalog, "t_feedp", ck)
    val prepared = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val handled = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String)])]
    val ckAtHandle = scala.collection.mutable.ArrayBuffer.empty[Long]
    val n = feed.pollPrepared { (frame, snap) =>
      prepared.add(snap.snapshotId)
      frame.localCheckpoint(true)
    } { (frame, snap) =>
      // the checkpoint must not have advanced past the PREVIOUS snapshot
      // when this handler runs, no matter how far prepare has raced ahead
      ckAtHandle += feed.checkpoint()
      handled += snap.snapshotId ->
        frame.collect().map(r => (r.getLong(0), r.getString(3))).toSet
    }
    assert(n == 3)
    assert(handled.map(_._1).toSeq == Seq(1L, 2L, 3L), "commit order")
    assert(prepared.asInstanceOf[java.util.Set[Long]].size == 3, "one prepare per snapshot")
    assert(ckAtHandle.toSeq == Seq(0L, 1L, 2L), "checkpoint trails the handler")
    // frames are identical to the sequential poll's
    assert(handled(0)._2 == Set((1L, "insert")))
    assert(handled(1)._2 == Set((2L, "insert")))
    assert(handled(2)._2 == Set((2L, "insert"), (2L, "delete")))
    assert(feed.checkpoint() == 3L)
  }

  test("restart resumes from the durable checkpoint; compaction advances it rowlessly") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_feed2", df(Seq((1L, "a", 10L), (2L, "b", 20L)))) // 1
    val ckDir = Files.createTempDirectory("feed-ck2")
    val ck = ckDir.resolve("ck").toString
    new ChangeFeed(spark, catalog, "t_feed2", ck).poll((_, _) => ())
    assert(MetaIO.readString(ck).trim == "1")

    IceWrite.deleteWhere(spark, catalog, "t_feed2", col("id") === 1L)       // 2
    new Compaction(catalog, "t_feed2", spark,
      config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1))).compact() // 3

    // a NEW feed instance (restart) picks up from snapshot 1
    val resumed = new ChangeFeed(spark, catalog, "t_feed2", ck)
    val events = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    assert(resumed.poll((frame, snap) => events += snap.snapshotId -> frame.count()) == 2)
    assert(events.toSeq == Seq(2L -> 1L, 3L -> 0L)) // delete row; replace = rowless
    assert(resumed.checkpoint() == 3L)
  }

  test("an expired checkpoint fails loudly instead of silently skipping") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_feed3", df(Seq((1L, "a", 10L))))
    val ck = Files.createTempDirectory("feed-ck3").resolve("ck").toString
    MetaIO.writeString(ck, "42") // a snapshot id not on the chain
    val feed = new ChangeFeed(spark, catalog, "t_feed3", ck)
    val boom = intercept[IllegalArgumentException] { feed.poll((_, _) => ()) }
    assert(boom.getMessage.contains("expired"))
  }

  test("end-to-end mirror: feeding the changelog into upsert replicates the table") {
    val catalog = newCatalog()
    IceWrite.create(spark, catalog, "t_src", df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    IceWrite.upsert(spark, catalog, "t_src", df(Seq((2L, "b2", 21L), (3L, "c", 30L))), Seq("id"))
    IceWrite.deleteWhere(spark, catalog, "t_src", col("id") === 1L)

    val ck = Files.createTempDirectory("feed-ck4").resolve("ck").toString
    val feed = new ChangeFeed(spark, catalog, "t_src", ck)
    feed.poll { (frame, _) =>
      val inserts = frame.filter(col(Changelog.ChangeTypeCol) === "insert")
        .select(col("id"), col("name"), col("qty"))
      val deletes = frame.filter(col(Changelog.ChangeTypeCol) === "delete")
        .select(col("id")).distinct()
      if (!catalog.tableExists("t_dst")) {
        IceWrite.create(spark, catalog, "t_dst", inserts): Unit
      } else {
        // deletes FIRST: a snapshot's delete events clear the keys its
        // insert events then repopulate (upsert decomposition); deleting
        // after appending would erase the replacements
        if (!deletes.isEmpty) IceWrite.appendEqualityDeletes(
          spark, catalog, "t_dst", deletes, Seq("id")): Unit
        if (!inserts.isEmpty) IceWrite.append(spark, catalog, "t_dst", inserts): Unit
      }
    }
    val src = IceRead.table(spark, catalog, "t_src")
    val dst = IceRead.table(spark, catalog, "t_dst")
    assert(src.exceptAll(dst).isEmpty && dst.exceptAll(src).isEmpty)
    assert(dst.count() == 2)
  }
  test("TableSync.mirror: replication across all write kinds, compaction-invisible, replay-safe") {
    val src = newCatalog(); val dst = newCatalog()
    IceWrite.create(spark, src, "t_src", df(Seq((1L, "a", 10L), (2L, "b", 20L))))
    IceWrite.append(spark, src, "t_src", df(Seq((3L, "c", 30L))))
    IceWrite.upsert(spark, src, "t_src", df(Seq((2L, "B", 21L), (4L, "d", 40L))), Seq("id"))
    IceWrite.deleteWhere(spark, src, "t_src", org.apache.spark.sql.functions.col("id") === 1)

    val ck = Files.createTempDirectory("sync-ck").resolve("ck").toString
    val applied = TableSync.mirror(spark, src, "t_src", dst, "t_dst", Seq("id"), ck)
    assert(applied == 4)

    def read(cat: Catalog, n: String) = {
      val s = spark; import s.implicits._
      IceRead.table(spark, cat, n).as[(Long, String, Long)].collect().toSet
    }
    val want = Set((2L, "B", 21L), (3L, "c", 30L), (4L, "d", 40L))
    assert(read(src, "t_src") == want)
    assert(read(dst, "t_dst") == want)

    // compaction on the source advances the mirror with NO row movement
    new graft.compaction.Compaction(src, "t_src", spark).compact()
    val dstVer = dst.loadTable("t_dst").version
    assert(TableSync.mirror(spark, src, "t_src", dst, "t_dst", Seq("id"), ck) == 1)
    assert(dst.loadTable("t_dst").version == dstVer, "compaction-only poll wrote to the mirror")

    // incremental: further source writes flow through on the next poll
    IceWrite.upsert(spark, src, "t_src", df(Seq((3L, "C2", 31L))), Seq("id"))
    IceWrite.deleteWhere(spark, src, "t_src", org.apache.spark.sql.functions.col("id") === 4)
    assert(TableSync.mirror(spark, src, "t_src", dst, "t_dst", Seq("id"), ck) == 2)
    val want2 = Set((2L, "B", 21L), (3L, "C2", 31L))
    assert(read(src, "t_src") == want2 && read(dst, "t_dst") == want2)

    // crash replay: re-applying the LAST snapshot converges (idempotent by
    // value) — simulate by rolling the checkpoint back one snapshot
    val last = src.loadTable("t_src").currentSnapshot.get
    MetaIO.writeString(ck, last.parentId.get.toString)
    assert(TableSync.mirror(spark, src, "t_src", dst, "t_dst", Seq("id"), ck) == 1)
    assert(read(dst, "t_dst") == want2, "replayed snapshot diverged the mirror")
  }
}
