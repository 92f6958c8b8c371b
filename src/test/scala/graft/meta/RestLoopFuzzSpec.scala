package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized end-to-end fuzz of the round-trip REST surface: a SOURCE
  * graft table takes an interleaving of native appends, native MOR
  * deletes, and spec-client REST appends (IcebergRestCommit through the
  * live server); a FOLLOWER attached over REST refreshes at random
  * points. Invariants after every refresh, checked against a driver-side
  * model of the expected row set:
  *
  *  - the follower's MOR view equals the model (and hence the source);
  *  - changelog continuity: the changelog between consecutive refresh
  *    points carries EXACTLY the rows appended and deleted in between —
  *    no spurious churn for untouched rows;
  *  - a final fingerprint: follower == source, row for row.
  */
class RestLoopFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("rest-fuzz-wh").toString)

  for (seed <- Seq(7, 23)) test(s"native ops + REST write-backs + follow-refresh (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val src = freshCatalog()
    IceWrite.create(spark, src, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    val srv = new IcebergRestServe(src, namespace = "wh", prefix = "p")
    try {
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "t", srv.uri, Seq("wh"), "t")
      val staging = Files.createTempDirectory("rest-fuzz-stage").toString

      // the driver-side model of live rows
      var model: Map[Long, String] = (1L to 40L).map(i => i -> s"v$i").toMap
      var nextKey = 1000L
      // net change since the last refresh, for changelog continuity
      var addedSince = 0L
      var deletedSince = 0L
      var lastRefreshSnapshot = dst.loadTable("t").currentSnapshotId.get

      def freshRows(n: Int): Seq[(Long, String)] = {
        val rows = (0 until n).map(i => (nextKey + i, s"x${nextKey + i}"))
        nextKey += n + 10
        rows
      }

      for (step <- 1 to 24) {
        rnd.nextInt(4) match {
          case 0 => // native append
            val rows = freshRows(1 + rnd.nextInt(5))
            IceWrite.append(spark, src, "t", rows.toDF("id", "v"))
            model ++= rows; addedSince += rows.size
          case 1 => // REST append through the spec client
            val rows = freshRows(1 + rnd.nextInt(5))
            val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
              spark, IceWrite.withFieldIds(rows.toDF("id", "v"), src.loadTable("t").schema),
              java.nio.file.Paths.get(staging, s"wb-$seed-$step.parquet"))
            IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "t",
              Seq(IcebergRestCommit.AddedFile(p, sz, n)), staging)
            model ++= rows; addedSince += rows.size
          case 2 => // native MOR delete of a random live slice
            val live = model.keys.toSeq.sorted
            if (live.nonEmpty) {
              val k = live(rnd.nextInt(live.size))
              val mod = 2 + rnd.nextInt(5)
              val victims = live.filter(id => id % mod == k % mod).take(6)
              if (victims.nonEmpty) {
                IceWrite.deleteWhere(spark, src, "t", col("id").isin(victims: _*))
                model --= victims; deletedSince += victims.size
              }
            }
          case 3 => // follower refresh + full invariant check
            val r = IcebergRestImport.refreshTable(dst, "t")
            val got = IceRead.table(spark, dst, "t")
              .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
            assert(got == model,
              s"seed $seed step $step: follower diverged after refresh " +
                s"(missing ${(model.keySet -- got.keySet).take(5)}, " +
                s"extra ${(got.keySet -- model.keySet).take(5)})")
            if (r.refreshed) {
              // changelog continuity across the refresh window: exactly
              // the net inserts/deletes, nothing for untouched rows
              val head = dst.loadTable("t").currentSnapshotId.get
              val byType = Changelog.changesBetween(spark, dst, "t",
                lastRefreshSnapshot, head)
                .groupBy("_change_type").count()
                .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
              assert(byType.getOrElse("insert", 0L) == addedSince,
                s"seed $seed step $step: changelog inserts ${byType.get("insert")} " +
                  s"!= appended $addedSince")
              assert(byType.getOrElse("delete", 0L) == deletedSince,
                s"seed $seed step $step: changelog deletes ${byType.get("delete")} " +
                  s"!= deleted $deletedSince")
              lastRefreshSnapshot = head
              addedSince = 0L; deletedSince = 0L
            }
        }
      }

      // closing invariant: one last refresh, follower == source exactly
      IcebergRestImport.refreshTable(dst, "t")
      val a = IceRead.table(spark, src, "t")
      val b = IceRead.table(spark, dst, "t")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"seed $seed: final follower/source divergence")
    } finally srv.stop()
  }
}
