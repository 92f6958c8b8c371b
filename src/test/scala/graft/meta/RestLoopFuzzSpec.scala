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

  // v2 seeds use pos-delete parquet natively; v3 seeds route native
  // deletes through DELETION VECTORS and additionally pin row-id
  // uniqueness through every foreign interleaving
  for ((seed, fv) <- Seq((7, 2), (23, 2), (5, 3), (31, 3)))
  test(s"native ops + REST write-backs + follow-refresh (seed $seed, v$fv)") {
    val rnd = new scala.util.Random(seed)
    val src = freshCatalog()
    IceWrite.create(spark, src, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"), formatVersion = fv)
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

      val http = java.net.http.HttpClient.newHttpClient()
      // the spec pool the foreign client cycles through: bucket growth
      // (the transform change that appends a re-marking snapshot once
      // native appends recorded values), and unpartitioning
      val specPool = Seq(
        """[{"source-id": 1, "transform": "bucket[4]", "name": "idb"}]""",
        """[{"source-id": 1, "transform": "bucket[8]", "name": "idb"}]""",
        "[]")
      for (step <- 1 to 24) {
        rnd.nextInt(7) match {
          case 6 => // FOREIGN spec evolution, then an immediate foreign write
            val fields = specPool(rnd.nextInt(specPool.size))
            val resp = http.send(java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/t"))
              .header("Content-Type", "application/json")
              .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
                s"""{"requirements": [], "updates": [
                   |{"action": "add-spec", "spec": {"spec-id": ${10 + step},
                   |  "fields": $fields}},
                   |{"action": "set-default-spec-id", "spec-id": -1}]}"""
                  .stripMargin)).build(),
              java.net.http.HttpResponse.BodyHandlers.ofString())
            assert(resp.statusCode() == 200,
              s"seed $seed step $step: foreign add-spec refused: ${resp.body()}")
            val rows = freshRows(1 + rnd.nextInt(4))
            val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
              spark, IceWrite.withFieldIds(rows.toDF("id", "v"), src.loadTable("t").schema),
              java.nio.file.Paths.get(staging, s"se-$seed-$step.parquet"))
            IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "t",
              Seq(IcebergRestCommit.AddedFile(p, sz, n)), staging)
            model ++= rows; addedSince += rows.size
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
                // v3 routes native deletes through deletion vectors
                if (fv >= 3)
                  IceWrite.deleteWhereDv(spark, src, "t", col("id").isin(victims: _*))
                else
                  IceWrite.deleteWhere(spark, src, "t", col("id").isin(victims: _*))
                model --= victims; deletedSince += victims.size
              }
            }
          case 4 => // FOREIGN delete: spec-client equality-delete row-delta
            val live = model.keys.toSeq.sorted
            if (live.nonEmpty) {
              val victims = rnd.shuffle(live).take(1 + rnd.nextInt(4))
              val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
                spark, IceWrite.withFieldIds(victims.map(Tuple1(_)).toDF("id"),
                  src.loadTable("t").schema),
                java.nio.file.Paths.get(staging, s"fd-$seed-$step.parquet"))
              IcebergRestCommit.commitDelta(srv.uri, Seq("wh"), "t", Nil,
                Seq(IcebergRestCommit.AddedDeleteFile(p, sz, n, "equality",
                  equalityFieldIds = Seq(1))), staging)
              model --= victims; deletedSince += victims.size
            }
          case 5 => // FOREIGN compaction: spec-client replace of the MOR state
            val head = src.loadTable("t")
            val files = head.currentSnapshot.get.manifest.map(_.path).distinct
            // the spec client refuses to rewrite a head with historical-
            // spec-marked files (rewriting spec-evolved tables stays with
            // the serving engine) — with the spec-evolution arm in the
            // loop that state is reachable, and skipping mirrors what a
            // real foreign compactor does on the refusal
            val marked = head.currentSnapshot.get.manifest.exists(_.specId != 0)
            if (model.nonEmpty && files.size >= 2 && !marked) {
              val live = IceRead.table(spark, src, "t")
              val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
                spark, IceWrite.withFieldIds(live, head.schema),
                java.nio.file.Paths.get(staging, s"rw-$seed-$step.parquet"))
              IcebergRestCommit.replaceFiles(srv.uri, Seq("wh"), "t", files,
                Seq(IcebergRestCommit.AddedFile(p, sz, n)), staging)
              // a rewrite is INVISIBLE: model unchanged, changelog silent
            }
          case 3 => // follower refresh + full invariant check
            val r = IcebergRestImport.refreshTable(dst, "t")
            val got = IceRead.table(spark, dst, "t")
              .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
            assert(got == model,
              s"seed $seed step $step: follower diverged after refresh " +
                s"(missing ${(model.keySet -- got.keySet).take(5)}, " +
                s"extra ${(got.keySet -- model.keySet).take(5)})")
            if (fv >= 3) {
              // v3 row lineage stays globally unique through every
              // foreign interleaving (deltas server-assign, replaces
              // claim fresh ranges)
              val ids = IceRead.tableWithRowIds(spark, dst, "t")
                .select("_row_id").collect().map(_.getLong(0))
              assert(ids.length == model.size && ids.distinct.length == ids.length,
                s"seed $seed step $step: duplicate or missing _row_id")
            }
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

  /** Fuzz of the LIFECYCLE + TRANSACTION surface: random interleavings
    * of REST table creates, appends from both engines, REST drops, view
    * creates/drops, and multi-table property transactions (half pinned
    * to live heads — must land everywhere; half deliberately STALE —
    * must land NOWHERE). A driver-side model of (tables, rows, applied
    * transaction rounds, views) is checked after every step. */
  for (seed <- Seq(11, 42)) test(s"REST lifecycle + transactions fuzz (seed $seed)") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val rnd = new scala.util.Random(seed)
    val cat = freshCatalog()
    val catName = s"rlf$seed"
    GraftSql.register(catName, cat)
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    val http = HttpClient.newHttpClient()
    def post(path: String, body: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    def delete(path: String): Int =
      http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString()).statusCode()
    try {
      val staging = Files.createTempDirectory("rest-lfz-stage").toString
      var model = Map.empty[String, Map[Long, String]] // table -> live rows
      var views = Set.empty[String]
      var applied = 0 // successful transaction rounds
      var nextTable = 0
      var nextKey = 0L
      def freshRows(n: Int): Seq[(Long, String)] = {
        val rows = (0 until n).map(i => (nextKey + i, s"x${nextKey + i}"))
        nextKey += n
        rows
      }
      def randomTable(): Option[String] =
        if (model.isEmpty) None
        else Some(model.keys.toSeq.sorted.apply(rnd.nextInt(model.size)))

      for (step <- 1 to 30) {
        rnd.nextInt(10) match {
          case 0 => // REST create
            val t = s"t$nextTable"; nextTable += 1
            val resp = post("/v1/p/namespaces/wh/tables",
              s"""{"name": "$t", "schema": {"type": "struct", "fields": [
                 |{"id": 1, "name": "id", "required": false, "type": "long"},
                 |{"id": 2, "name": "v", "required": false, "type": "string"}]}}"""
                .stripMargin)
            assert(resp.statusCode() == 200, s"step $step create: ${resp.body()}")
            model += t -> Map.empty
          case 1 => randomTable().foreach { t => // REST append
            val rows = freshRows(1 + rnd.nextInt(4))
            val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
              spark, IceWrite.withFieldIds(rows.toDF("id", "v"), cat.loadTable(t).schema),
              java.nio.file.Paths.get(staging, s"a-$seed-$step.parquet"))
            IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), t,
              Seq(IcebergRestCommit.AddedFile(p, sz, n)), staging)
            model += t -> (model(t) ++ rows)
          }
          case 2 => randomTable().foreach { t => // native append
            val rows = freshRows(1 + rnd.nextInt(4))
            IceWrite.append(spark, cat, t, rows.toDF("id", "v"))
            model += t -> (model(t) ++ rows)
          }
          case 3 if model.size >= 2 => // transaction pinned to LIVE heads
            val ts = rnd.shuffle(model.keys.toSeq).take(2)
            val changes = ts.map { t =>
              val head = cat.loadTable(t).currentSnapshotId.getOrElse(-1L)
              val reqs = if (head >= 0)
                s"""[{"type": "assert-ref-snapshot-id", "ref": "main",
                   |"snapshot-id": $head}]""".stripMargin.replace("\n", " ")
              else "[]"
              s"""{"identifier": {"namespace": ["wh"], "name": "$t"},
                 |"requirements": $reqs,
                 |"updates": [{"action": "set-properties",
                 |  "updates": {"round": "${applied + 1}"}}]}"""
                .stripMargin.replace("\n", " ")
            }
            val resp = post("/v1/p/transactions/commit",
              s"""{"table-changes": [${changes.mkString(",")}]}""")
            assert(resp.statusCode() == 204, s"step $step txn: ${resp.body()}")
            applied += 1
            ts.foreach(t => assert(
              cat.loadTable(t).properties.get("round").contains(applied.toString),
              s"step $step: txn round $applied missing on $t"))
          case 4 if model.size >= 2 => // STALE transaction: all-or-nothing
            val ts = rnd.shuffle(model.keys.toSeq).take(2)
            val changes = ts.zipWithIndex.map { case (t, i) =>
              val head = cat.loadTable(t).currentSnapshotId.getOrElse(-1L)
              // the SECOND change pins a bogus head — the whole txn must 409
              val pin = if (i == 0) head else head + 7777
              s"""{"identifier": {"namespace": ["wh"], "name": "$t"},
                 |"requirements": [{"type": "assert-ref-snapshot-id",
                 |  "ref": "main", "snapshot-id": $pin}],
                 |"updates": [{"action": "set-properties",
                 |  "updates": {"poison": "yes"}}]}"""
                .stripMargin.replace("\n", " ")
            }
            val resp = post("/v1/p/transactions/commit",
              s"""{"table-changes": [${changes.mkString(",")}]}""")
            assert(resp.statusCode() == 409, s"step $step stale txn: ${resp.body()}")
            ts.foreach(t => assert(!cat.loadTable(t).properties.contains("poison"),
              s"step $step: stale txn leaked onto $t"))
          case 5 if model.size >= 2 => // REST drop (keep at least one table)
            val t = randomTable().get
            assert(delete(s"/v1/p/namespaces/wh/tables/$t") == 204)
            model -= t
            // views OVER THE DROPPED TABLE break at read, loudly (late
            // binding); views over surviving tables keep working
            views.filter(_ == s"view_of_$t").foreach { v =>
              val e = intercept[Exception](
                spark.sql(s"SELECT * FROM $catName.$v").collect())
              assert(e.getMessage.contains("does not exist"), e.getMessage)
            }
            views.foreach(v => assert(delete(s"/v1/p/namespaces/wh/views/$v") == 204))
            views = Set.empty
          case 6 => randomTable().foreach { t => // REST rename under live state
            val t2 = s"${t}_r$step"
            val resp = post("/v1/p/tables/rename",
              s"""{"source": {"namespace": ["wh"], "name": "$t"},
                 |"destination": {"namespace": ["wh"], "name": "$t2"}}"""
                .stripMargin.replace("\n", " "))
            assert(resp.statusCode() == 204, s"step $step rename: ${resp.body()}")
            // identity preserved through the rename: same uuid, same rows
            // (checked by the per-step model sweep below under the NEW name)
            model += t2 -> model(t); model -= t
            // views over the renamed-away name break at read (late
            // binding, like drops) — clear them out of the model
            views.filter(_ == s"view_of_$t").foreach { v =>
              assert(delete(s"/v1/p/namespaces/wh/views/$v") == 204)
              views -= v
            }
          }
          case 7 => randomTable().foreach { t => // FOREIGN property updates
            // reserved graft.* keys must 400 through the commit door and
            // change NOTHING (the per-step model sweep below then proves
            // reads stay exact); unreserved keys through the same door land
            val reserved = Seq("graft.stats.retired-names", "graft.table-uuid",
              "graft.bloom.v.paths")(rnd.nextInt(3))
            val upd =
              if (rnd.nextBoolean())
                s"""{"action": "set-properties", "updates": {"$reserved": "poison"}}"""
              else
                s"""{"action": "remove-properties", "removals": ["$reserved"]}"""
            val before = cat.loadTable(t).properties
            val refused = post(s"/v1/p/namespaces/wh/tables/$t",
              s"""{"requirements": [], "updates": [$upd]}""")
            assert(refused.statusCode() == 400,
              s"step $step: reserved $reserved answered ${refused.statusCode()}")
            assert(cat.loadTable(t).properties == before,
              s"step $step: refused reserved update mutated $t")
            val landed = post(s"/v1/p/namespaces/wh/tables/$t",
              s"""{"requirements": [], "updates": [{"action": "set-properties",
                 |"updates": {"fuzz.step": "$step"}}]}""".stripMargin.replace("\n", " "))
            assert(landed.statusCode() == 200, s"step $step: ${landed.body()}")
            assert(cat.loadTable(t).properties.get("fuzz.step").contains(step.toString))
          }
          case 8 => randomTable().foreach { t => // FOREIGN snapshot expiry
            val m = cat.loadTable(t)
            val pinned = m.refs.values.toSet ++ m.tags.values.toSet ++
              m.currentSnapshotId.toSet
            val victims = m.snapshots.map(_.snapshotId)
              .filterNot(pinned).take(1 + rnd.nextInt(2))
            if (victims.nonEmpty) {
              val resp = post(s"/v1/p/namespaces/wh/tables/$t",
                s"""{"requirements": [], "updates": [{"action":
                   |"remove-snapshots",
                   |"snapshot-ids": [${victims.mkString(",")}]}]}"""
                  .stripMargin.replace("\n", " "))
              assert(resp.statusCode() == 200, s"step $step expiry: ${resp.body()}")
              val after = cat.loadTable(t)
              assert(victims.forall(id => after.snapshotById(id).isEmpty))
              // rows unchanged — proven by the per-step model sweep below
            }
            // the pinned head always refuses
            m.currentSnapshotId.foreach { head =>
              val r = post(s"/v1/p/namespaces/wh/tables/$t",
                s"""{"requirements": [], "updates": [{"action":
                   |"remove-snapshots", "snapshot-ids": [$head]}]}"""
                  .stripMargin.replace("\n", " "))
              assert(r.statusCode() == 400,
                s"step $step: expiring the current head must refuse")
            }
          }
          case _ => randomTable().foreach { t => // view create or drop
            val v = s"view_of_$t"
            if (!views.contains(v) && model.contains(t)) {
              Views.create(spark, cat, v,
                s"SELECT id, v FROM $catName.$t WHERE id % 2 = 0", orReplace = false)
              views += v
              val expect = model(t).keys.count(_ % 2 == 0)
              assert(spark.sql(s"SELECT count(*) AS c FROM $catName.$v")
                .head.getLong(0) == expect, s"step $step: view row count")
            }
          }
        }
        // ---- invariants every step: listings partition the namespace,
        // every table's MOR read equals the model
        val listed = IcebergRestImport.resolvePrefix(srv.uri, None) // touch config
        val _ = listed
        val tl = post("/v1/p/namespaces/wh/tables", "").statusCode() // POST {} is 400
        assert(tl == 400)
        for ((t, rows) <- model) {
          val got = IceRead.table(spark, cat, t)
            .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
          assert(got == rows, s"seed $seed step $step: $t diverged from model " +
            s"(missing ${(rows.keySet -- got.keySet).take(5)}, " +
            s"extra ${(got.keySet -- rows.keySet).take(5)})")
        }
        assert(cat.listTables.filterNot(n =>
          Views.isView(cat.loadTable(n))).toSet == model.keySet,
          s"seed $seed step $step: catalog tables != model")
      }
    } finally { srv.stop(); GraftSql.unregister(catName) }
  }
}
