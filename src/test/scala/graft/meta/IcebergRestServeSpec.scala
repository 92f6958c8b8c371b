package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Serving graft tables over the public Iceberg REST read surface —
  * contract-tested as a ROUND TRIP through real sockets with
  * [[IcebergRestImport]] as the spec client, plus direct probes of the
  * listing/auth/refusal endpoints. */
class IcebergRestServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private def get(uri: String, token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(uri)).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("rest-srv-wh").toString)

  test("round trip: serve a table, attach it with the REST client, read it back") {
    val cat = freshCatalog()
    val rows = (1L to 120L).map(i => (i, s"g${i % 3}", s"n$i")).toDF("id", "grp", "name")
    IceWrite.create(spark, cat, "clicks", rows, partitionSpec = Seq(PartitionField("grp")))
    IceWrite.deleteWhere(spark, cat, "clicks", col("id") % 8 === 0)

    val srv = new IcebergRestServe(cat, namespace = "warehouse", prefix = "acct")
    try {
      val dst = freshCatalog()
      val back = IcebergRestImport.importTable(dst, "clicks2", srv.uri,
        Seq("warehouse"), "clicks")
      val a = IceRead.table(spark, cat, "clicks")
      val b = IceRead.table(spark, dst, "clicks2")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      assert(back.partitionSpec == Seq(PartitionField("grp")))

      // metadata-location names the exported *.metadata.json FILE (spec
      // clients may honor it over the embedded copy): it must exist and
      // parse to the same metadata the response embeds
      val ltr = JsonMethods.parse(get(
        s"${srv.uri}/v1/acct/namespaces/warehouse/tables/clicks").body())
      val loc = (ltr \ "metadata-location").asInstanceOf[JString].s
      assert(loc.endsWith(".metadata.json"), s"metadata-location not a file: $loc")
      assert(JsonMethods.parse(MetaIO.readString(loc)) == (ltr \ "metadata"))

      // an appended version serves FRESH metadata (per-version cache)
      IceWrite.append(spark, cat, "clicks",
        Seq((1000L, "g0", "late")).toDF("id", "grp", "name"))
      val dst2 = freshCatalog()
      IcebergRestImport.importTable(dst2, "c3", srv.uri, Seq("warehouse"), "clicks")
      assert(IceRead.table(spark, dst2, "c3").count() ==
        IceRead.table(spark, cat, "clicks").count())
    } finally srv.stop()
  }

  test("SQL onboarding: CALL attach_iceberg / attach_iceberg_rest") {
    val srcCat = freshCatalog()
    IceWrite.create(spark, srcCat, "orders",
      (1L to 60L).map(i => (i, s"c${i % 5}")).toDF("o_id", "o_cust"))
    val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, "orders")
    val srv = new IcebergRestServe(srcCat, namespace = "wh", prefix = "p1",
      bearerToken = Some("tk"))
    try {
      val dst = freshCatalog()
      GraftSql.register("onb", dst)
      try {
        // file-path attach
        val r1 = spark.sql(s"CALL onb.system.attach_iceberg('o1', '$jsonPath')").head
        assert(r1.getString(0) == "o1" && r1.getLong(2) > 0L)
        assert(spark.sql("SELECT count(*) AS n FROM onb.o1").head.getLong(0) == 60L)
        // REST attach with named token arg
        val r2 = spark.sql("CALL onb.system.attach_iceberg_rest('o2', " +
          s"'${srv.uri}', 'wh', 'orders', token => 'tk')").head
        assert(r2.getString(0) == "o2")
        assert(spark.sql("SELECT count(*) AS n FROM onb.o2").head.getLong(0) == 60L)
        // the attached tables are full graft tables: DML works
        spark.sql("DELETE FROM onb.o2 WHERE o_id <= 10")
        assert(spark.sql("SELECT count(*) AS n FROM onb.o2").head.getLong(0) == 50L)
      } finally GraftSql.unregister("onb")
    } finally srv.stop()
  }

  test("commit endpoint: spec client appends through REST; stale commits 409 and retry succeeds") {
    val cat = freshCatalog()
    val rows = (1L to 50L).map(i => (i, s"n$i")).toDF("id", "name")
    IceWrite.create(spark, cat, "orders", rows)
    val meta0 = cat.loadTable("orders")
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      // the client's data file: plain parquet on the shared store
      val staging = Files.createTempDirectory("rest-commit-stage").toString
      val newRows = (1000L to 1019L).map(i => (i, s"x$i")).toDF("id", "name")
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(newRows, meta0.schema),
        java.nio.file.Paths.get(staging, "add1.parquet"))

      // ---- the full spec loop: load -> write manifests -> POST commit
      val snapId = IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "orders",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
      val after = cat.loadTable("orders")
      assert(after.currentSnapshotId.contains(snapId),
        "graft head must move to the REST-committed snapshot")
      assert(after.currentSnapshot.get.summary("operation") == "append")
      val got = IceRead.table(spark, cat, "orders")
      assert(got.count() == 70L)
      assert(got.filter(col("id") >= 1000L).count() == 20L)

      // ---- a STALE commit (requirement pinned to the pre-append head)
      // answers 409, and the table is untouched
      val staleReq = s"""{"requirements":[{"type":"assert-ref-snapshot-id",
        "ref":"main","snapshot-id":${meta0.currentSnapshotId.get}}],
        "updates":[]}""".replace("\n", " ")
      val post = HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/orders"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(staleReq)).build()
      val staleResp = http.send(post, HttpResponse.BodyHandlers.ofString())
      assert(staleResp.statusCode() == 409, s"stale requirement must 409: ${staleResp.body()}")
      // ...and the spec retry loop (reload + rebuild) still lands a commit
      val (p2, sz2, n2, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          (2000L to 2009L).map(i => (i, s"y$i")).toDF("id", "name"), meta0.schema),
        java.nio.file.Paths.get(staging, "add2.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "orders",
        Seq(IcebergRestCommit.AddedFile(p2, sz2, n2)), staging)
      assert(IceRead.table(spark, cat, "orders").count() == 80L)

      // ---- a commit whose manifest list DROPS every live file is a
      // legal PURE-REMOVAL since the replace shape landed: it commits as
      // a whole-table delete (not a 400) and readers see zero rows
      val listSchema = new org.apache.avro.Schema.Parser().parse(
        IcebergExport.manifestListSchemaJsonV(2))
      val emptyList = MetaIO.join(staging, "empty-list.avro")
      IcebergExport.avroWrite(emptyList, listSchema, Map("format-version" -> "2"), Nil)
      val dropBody = """{"requirements":[],"updates":[
        {"action":"add-snapshot","snapshot":{"snapshot-id":777,
         "sequence-number":99,"timestamp-ms":1,"manifest-list":"""" + emptyList +
        """","summary":{"operation":"delete"}}},
        {"action":"set-snapshot-ref","ref-name":"main","type":"branch",
         "snapshot-id":777}]}"""
      val dropResp = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/orders"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(dropBody)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(dropResp.statusCode() == 200,
        s"pure-removal commit must land: ${dropResp.statusCode()} ${dropResp.body()}")
      assert(cat.loadTable("orders").currentSnapshot.get.summary("operation") == "delete")
      assert(IceRead.table(spark, cat, "orders").count() == 0L)

      // set-properties / remove-properties ride the same endpoint
      val propBody = """{"requirements":[],"updates":[
        {"action":"set-properties","updates":{"owner":"etl"}}]}"""
      val propResp = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/orders"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(propBody)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(propResp.statusCode() == 200, propResp.body())
      assert(cat.loadTable("orders").properties.get("owner").contains("etl"))
    } finally srv.stop()
  }

  test("concurrent REST commits both land via the 409-retry loop") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "race", (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val staging = Files.createTempDirectory("rest-race").toString
      val schema = cat.loadTable("race").schema
      val files = (0 until 2).map { i =>
        graft.testkit.FileGenerator.writeSingleParquet(
          spark, IceWrite.withFieldIds(
            (100L * (i + 1) to 100L * (i + 1) + 9).map(j => (j, s"c$i-$j")).toDF("id", "name"),
            schema),
          java.nio.file.Paths.get(staging, s"race-$i.parquet"))
      }
      // two spec clients race the same head: one MUST hit 409 and retry
      // with a rebuilt manifest list off the new head
      val pool = Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val commits = files.map { case (p, sz, n, _) => Future {
          IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "race",
            Seq(IcebergRestCommit.AddedFile(p, sz, n)), staging)
        }}
        val ids = Await.result(Future.sequence(commits), 120.seconds)
        assert(ids.distinct.size == 2, s"snapshot ids must differ: $ids")
      } finally pool.shutdown()
      val after = cat.loadTable("race")
      assert(after.snapshots.size == 3, "both commits must land as snapshots")
      assert(IceRead.table(spark, cat, "race").count() == 30L,
        "no rows lost or duplicated under the race")
      // LOSING attempts' staged avros are deleted on retry (nothing
      // references them, and no orphan sweep visits a foreign staging
      // dir) — exactly one manifest + one list per SUCCESSFUL commit
      // remains however many 409 rounds the race took
      val avros = MetaIO.listFiles(staging).map(_._1).filter(_.endsWith(".avro"))
      assert(avros.size == 4,
        s"staging must hold the 2 winning attempts' manifest+list pairs only: $avros")
    } finally srv.stop()
  }

  test("commit endpoint on a partitioned table: client-written partition values decode") {
    val cat = freshCatalog()
    val rows = (1L to 40L).map(i => (i, i % 4, s"n$i")).toDF("id", "region", "name")
    IceWrite.create(spark, cat, "pt", rows,
      partitionSpec = Seq(PartitionField("region")))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val staging = Files.createTempDirectory("rest-commit-part").toString
      // one appended file, all rows in partition region=9
      val extra = (500L to 509L).map(i => (i, 9L, s"x$i")).toDF("id", "region", "name")
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(extra, cat.loadTable("pt").schema),
        java.nio.file.Paths.get(staging, "part-add.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "pt",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1,
          partitionValues = Map("region" -> "9"))), staging)
      val added = cat.loadTable("pt").currentSnapshot.get.manifest.find(_.path == p1).get
      assert(added.partitionValues == Map("region" -> "9"),
        s"partition values lost through the commit wire: ${added.partitionValues}")
      // the appended partition is value-addressable like any native one
      assert(IceRead.tablePartition(spark, cat, "pt", Map("region" -> "9")).count() == 10L)
      assert(spark.sql("SELECT 1").count() == 1L) // session sanity
      assert(IceRead.table(spark, cat, "pt").count() == 50L)

      // HEAD: the spec existence probe answers status-only
      val head = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/pt"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(head.statusCode() == 204 && head.body().isEmpty)
      assert(http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/nope"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() == 404)
    } finally srv.stop()
  }

  test("commit endpoint on a v3 table: server assigns row lineage to REST-appended files") {
    val cat = freshCatalog()
    val rows = (1L to 30L).map(i => (i, s"n$i")).toDF("id", "name")
    IceWrite.create(spark, cat, "ev", rows, formatVersion = 3)
    val nextBefore = cat.loadTable("ev").nextRowId
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val staging = Files.createTempDirectory("rest-commit-v3").toString
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          (500L to 509L).map(i => (i, s"z$i")).toDF("id", "name"),
          cat.loadTable("ev").schema),
        java.nio.file.Paths.get(staging, "v3add.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "ev",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
      val after = cat.loadTable("ev")
      val added = after.currentSnapshot.get.manifest.find(_.path == p1).get
      assert(added.firstRowId.contains(nextBefore),
        "REST-appended file must take row ids from the table cursor")
      assert(after.nextRowId == nextBefore + n1)
      // row ids stay globally unique through the mixed history
      val ids = IceRead.tableWithRowIds(spark, cat, "ev")
        .select("_row_id").collect().map(_.getLong(0))
      assert(ids.length == 40 && ids.distinct.length == 40)
    } finally srv.stop()
  }

  test("refresh: an attached table follows its source; local commits refuse") {
    val src = freshCatalog()
    val rows = (1L to 50L).map(i => (i, s"n$i")).toDF("id", "name")
    IceWrite.create(spark, src, "orders", rows)
    val srv = new IcebergRestServe(src, namespace = "wh", prefix = "p")
    try {
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "o", srv.uri, Seq("wh"), "orders")
      val attachedAt = dst.loadTable("o").currentSnapshotId.get

      // fresh source: the probe is a NO-OP (metadata-location unchanged)
      val r0 = IcebergRestImport.refreshTable(dst, "o")
      assert(!r0.refreshed && r0.snapshotId.contains(attachedAt))

      // the SOURCE moves: an append and a MOR delete
      IceWrite.append(spark, src, "orders",
        (100L to 119L).map(i => (i, s"late$i")).toDF("id", "name"))
      IceWrite.deleteWhere(spark, src, "orders", col("id") % 10 === 0)
      val r1 = IcebergRestImport.refreshTable(dst, "o")
      assert(r1.refreshed && r1.addedSnapshots == 2)
      val a = IceRead.table(spark, src, "orders")
      val b = IceRead.table(spark, dst, "o")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

      // CHANGELOG CONTINUITY across the refresh: from the attach point to
      // the refreshed head, only the real foreign changes appear — the 20
      // appended rows as inserts, the 7 tombstoned rows as deletes (ids
      // 10,20,30,40,50,100,110), NO churn for the 45 unchanged rows
      val changes = Changelog.changesBetween(spark, dst, "o",
        attachedAt, dst.loadTable("o").currentSnapshotId.get)
      val byType = changes.groupBy("_change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType.getOrElse("insert", 0L) == 20L, s"changelog: $byType")
      assert(byType.getOrElse("delete", 0L) == 7L, s"changelog: $byType")

      // a second refresh right after is a no-op again
      assert(!IcebergRestImport.refreshTable(dst, "o").refreshed)

      // LOCAL commits past the attach point refuse (no rebase)
      IceWrite.append(spark, dst, "o", Seq((9999L, "local")).toDF("id", "name"))
      val e = intercept[IllegalArgumentException](
        IcebergRestImport.refreshTable(dst, "o"))
      assert(e.getMessage.contains("LOCAL commits"))

      // the SQL procedure drives the same loop
      val dst2 = freshCatalog()
      GraftSql.register("rf", dst2)
      try {
        spark.sql(s"CALL rf.system.attach_iceberg_rest('o2', '${srv.uri}', 'wh', 'orders')")
        val row = spark.sql("CALL rf.system.refresh_iceberg_rest('o2')").head
        assert(!row.getBoolean(1), "freshly attached table must probe as fresh")
        IceWrite.append(spark, src, "orders", Seq((7777L, "x")).toDF("id", "name"))
        val row2 = spark.sql("CALL rf.system.refresh_iceberg_rest('o2')").head
        assert(row2.getBoolean(1) && row2.getLong(3) == 1L)
        assert(spark.sql("SELECT count(*) AS n FROM rf.o2 WHERE id = 7777").head.getLong(0) == 1L)
        // local PROPERTY changes (ANALYZE) do not block following...
        spark.sql("ANALYZE TABLE rf.o2 COMPUTE STATISTICS NOSCAN")
        assert(!spark.sql("CALL rf.system.refresh_iceberg_rest('o2')").head.getBoolean(1))
        // ...but metadata-only local changes (schema evolution here)
        // would be DISCARDED by a re-import — the fingerprint guard refuses
        spark.sql("ALTER TABLE rf.o2 ADD COLUMNS (note STRING)")
        val e2 = intercept[Exception](spark.sql("CALL rf.system.refresh_iceberg_rest('o2')"))
        assert(e2.getMessage.contains("metadata changes"), e2.getMessage)
      } finally GraftSql.unregister("rf")
    } finally srv.stop()
  }

  test("views over REST: list, load, attach, create, drop") {
    val cat = freshCatalog()
    GraftSql.register("rsv", cat)
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      IceWrite.create(spark, cat, "t",
        (1L to 12L).map(i => (i, i * 2L)).toDF("k", "v"))
      Views.create(spark, cat, "doubled",
        "SELECT k, v FROM rsv.t WHERE v >= 10")

      // views and tables are separate object kinds on the wire
      val tl = JsonMethods.parse(get(s"${srv.uri}/v1/p/namespaces/wh/tables").body())
      assert(JsonMethods.compact(JsonMethods.render(tl)).contains("\"t\"") &&
        !JsonMethods.compact(JsonMethods.render(tl)).contains("doubled"),
        "tables listing must exclude views")
      val vl = JsonMethods.parse(get(s"${srv.uri}/v1/p/namespaces/wh/views").body())
      assert(JsonMethods.compact(JsonMethods.render(vl)).contains("doubled"))
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/doubled").statusCode() == 404,
        "a view must not load from the tables route")
      val head = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/views/doubled"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(head.statusCode() == 204)

      // LoadViewResult: spec v1 metadata with the stable identity
      val lv = get(s"${srv.uri}/v1/p/namespaces/wh/views/doubled")
      assert(lv.statusCode() == 200, lv.body())
      val vm = JsonMethods.parse(lv.body()) \ "metadata"
      assert((vm \ "format-version") == JInt(1))
      assert((vm \ "view-uuid") == JString(cat.loadTable("doubled").stableUuid))

      // spec client ATTACH into a second catalog; reads match (table
      // names inside the SQL resolve via the registered rsv catalog)
      val dst = freshCatalog()
      IcebergRestImport.importView(dst, "d2", srv.uri, Seq("wh"), "doubled")
      GraftSql.register("rsvd", dst)
      val a = spark.sql("SELECT * FROM rsvd.d2").collect().toSeq.sortBy(_.getLong(0))
      val b = spark.sql("SELECT * FROM rsv.doubled").collect().toSeq.sortBy(_.getLong(0))
      assert(a == b && a.size == 8)

      // CREATE a view THROUGH REST (spec CreateViewRequest)
      val created = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/views"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"name": "vrest",
            |  "schema": {"type": "struct", "fields": [
            |    {"id": 1, "name": "k", "required": false, "type": "long"}]},
            |  "view-version": {"timestamp-ms": 1700000000000,
            |    "summary": {"engine-name": "spec-client"},
            |    "representations": [
            |      {"type": "sql", "sql": "SELECT k FROM rsv.t WHERE k <= 3",
            |       "dialect": "spark"}],
            |    "default-namespace": ["wh"]},
            |  "properties": {"comment": "made over the wire"}}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(created.statusCode() == 200, created.body())
      assert(spark.sql("SELECT count(*) AS c FROM rsv.vrest").head.getLong(0) == 3L)
      assert(cat.loadTable("vrest").properties.get("comment")
        .contains("made over the wire"))

      // DROP over the views route; the tables route never touches views
      val delT = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/vrest"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString())
      assert(delT.statusCode() == 404)
      val delV = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/views/vrest"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString())
      assert(delV.statusCode() == 204 && !cat.tableExists("vrest"))
    } finally {
      srv.stop(); GraftSql.unregister("rsv"); GraftSql.unregister("rsvd")
    }
  }

  test("multi-table transaction commits all-or-nothing") {
    val inner = freshCatalog()
    // a decorator that fails ONE commit on demand — simulating a racing
    // NATIVE writer CAS-beating the transaction mid-apply
    @volatile var failOnce: Option[String] = None
    val cat: Catalog = new Catalog {
      def createTable(meta: TableMetadata) = inner.createTable(meta)
      def loadTable(name: String) = inner.loadTable(name)
      def tableExists(name: String) = inner.tableExists(name)
      def commit(base: TableMetadata, updated: TableMetadata) = {
        if (failOnce.contains(updated.name)) {
          failOnce = None
          throw new CommitConflictException(s"simulated native race on ${updated.name}")
        }
        inner.commit(base, updated)
      }
      def dropTable(name: String) = inner.dropTable(name)
      def listTables = inner.listTables
      def tableLocation(name: String) = inner.tableLocation(name)
      def dataDir(name: String) = inner.dataDir(name)
    }
    IceWrite.create(spark, cat, "t1", Seq((1L, "a")).toDF("id", "v"))
    IceWrite.create(spark, cat, "t2", Seq((2L, "b")).toDF("id", "v"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def txn(body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(
          URI.create(s"${srv.uri}/v1/p/transactions/commit"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      def change(t: String, k: String, v: String, reqs: String = "[]") =
        s"""{"identifier": {"namespace": ["wh"], "name": "$t"},
           |"requirements": $reqs,
           |"updates": [{"action": "set-properties", "updates": {"$k": "$v"}}]}"""
          .stripMargin
      def prop(t: String, k: String) = cat.loadTable(t).properties.get(k)

      // both changes land atomically
      val ok = txn(s"""{"table-changes": [${change("t1", "stage", "gold")},
        ${change("t2", "stage", "gold")}]}""")
      assert(ok.statusCode() == 204, ok.body())
      assert(prop("t1", "stage").contains("gold") && prop("t2", "stage").contains("gold"))

      // a failing requirement on the SECOND change leaves the FIRST
      // unapplied: validate-all strictly precedes apply-any
      val headT2 = cat.loadTable("t2").currentSnapshotId.get
      val stale = s"""[{"type": "assert-ref-snapshot-id", "ref": "main",
        "snapshot-id": ${headT2 + 999}}]""".replace("\n", " ")
      val bad = txn(s"""{"table-changes": [${change("t1", "round", "2")},
        ${change("t2", "round", "2", stale)}]}""")
      assert(bad.statusCode() == 409, bad.body())
      assert(prop("t1", "round").isEmpty && prop("t2", "round").isEmpty)

      // a mid-apply CAS loss on t2 rolls the already-applied t1 BACK
      failOnce = Some("t2")
      val raced = txn(s"""{"table-changes": [${change("t1", "round", "3")},
        ${change("t2", "round", "3")}]}""")
      assert(raced.statusCode() == 409, raced.body())
      assert(prop("t1", "round").isEmpty, "applied change must compensate-rollback")
      assert(prop("t2", "round").isEmpty)
      // ...and the spec retry (reload + resend) then succeeds cleanly
      val retry = txn(s"""{"table-changes": [${change("t1", "round", "4")},
        ${change("t2", "round", "4")}]}""")
      assert(retry.statusCode() == 204, retry.body())
      assert(prop("t1", "round").contains("4") && prop("t2", "round").contains("4"))

      // shape refusals: empty, duplicate table, unknown table
      assert(txn("""{"table-changes": []}""").statusCode() == 400)
      assert(txn(s"""{"table-changes": [${change("t1", "x", "1")},
        ${change("t1", "y", "2")}]}""").statusCode() == 400)
      assert(txn(s"""{"table-changes": [${change("nope", "x", "1")}]}""")
        .statusCode() == 404)
    } finally srv.stop()
  }

  test("table lifecycle over REST: create, write both ways, register, drop") {
    val cat = freshCatalog()
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())

      // ---- CREATE: the spec CreateTableRequest — schema, partition
      // spec, write order and properties all land in the graft table
      val createReq =
        """{"name": "events",
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "id", "required": true, "type": "long"},
          |    {"id": 2, "name": "day", "required": false, "type": "string"},
          |    {"id": 3, "name": "payload", "required": false, "type": "string"}]},
          |  "partition-spec": {"fields": [
          |    {"name": "day", "transform": "identity", "source-id": 2, "field-id": 1000}]},
          |  "write-order": {"fields": [
          |    {"transform": "identity", "source-id": 1,
          |     "direction": "asc", "null-order": "nulls-first"}]},
          |  "properties": {"owner": "etl"}}""".stripMargin
      val created = post("/v1/p/namespaces/wh/tables", createReq)
      assert(created.statusCode() == 200, created.body())
      val meta = cat.loadTable("events")
      assert(meta.schema.map(_.name) == Seq("id", "day", "payload"))
      assert(!meta.schema.head.nullable && meta.schema(1).nullable)
      assert(meta.partitionSpec == Seq(PartitionField("day", "identity")))
      assert(meta.sortOrder == Seq(SortField("id")))
      assert(meta.properties.get("owner").contains("etl"))
      // the served uuid is the created table's stable identity
      assert((JsonMethods.parse(created.body()) \ "metadata" \ "table-uuid") ==
        JString(meta.stableUuid))

      // the REST-created table takes NATIVE writes...
      IceWrite.append(spark, cat, "events",
        Seq((1L, "d1", "a"), (2L, "d2", "b")).toDF("id", "day", "payload"))
      // ...and spec-client commits, partition values included
      val staging = Files.createTempDirectory("rest-create-stage").toString
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          Seq((3L, "d3", "c")).toDF("id", "day", "payload"), meta.schema),
        java.nio.file.Paths.get(staging, "add.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "events",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1, Map("day" -> "d3"))), staging)
      val rows = IceRead.table(spark, cat, "events")
      assert(rows.count() == 3L)
      assert(rows.filter(col("day") === "d3").count() == 1L)

      // duplicate create: the spec's AlreadyExists
      assert(post("/v1/p/namespaces/wh/tables", createReq).statusCode() == 409)
      // stage-create answers the staged metadata WITHOUT registering
      // (the full handshake has its own spec below)
      val staged = post("/v1/p/namespaces/wh/tables",
        createReq.replace("\"name\": \"events\"",
          "\"name\": \"staged\", \"stage-create\": true"))
      assert(staged.statusCode() == 200, staged.body())
      assert((JsonMethods.parse(staged.body()) \ "metadata-location") == JNothing,
        "a staged table has no durable metadata yet")
      assert(!cat.tableExists("staged"), "stage-create must not register")
      // an unconvertible partition transform refuses with the SAME
      // message an attach would produce (shared import machinery)
      val badSpec = post("/v1/p/namespaces/wh/tables",
        createReq.replace("\"events\"", "\"bad\"")
          .replace("\"identity\", \"source-id\": 2", "\"void\", \"source-id\": 2"))
      assert(badSpec.statusCode() == 400 &&
        badSpec.body().contains("unsupported partition transform"), badSpec.body())
      assert(!cat.tableExists("bad"), "a refused create must leave nothing behind")

      // ---- REGISTER: adopt an exported *.metadata.json in place
      val other = freshCatalog()
      IceWrite.create(spark, other, "src",
        (1L to 7L).map(i => (i, s"n$i")).toDF("a", "b"))
      val exported = IcebergExport.exportIcebergMetadata(other, "src")
      val reg = post("/v1/p/namespaces/wh/register",
        s"""{"name": "adopted", "metadata-location": "$exported"}""")
      assert(reg.statusCode() == 200, reg.body())
      assert(IceRead.table(spark, cat, "adopted").count() == 7L)
      assert(post("/v1/p/namespaces/wh/register",
        s"""{"name": "adopted", "metadata-location": "$exported"}""")
        .statusCode() == 409)

      // ---- namespace create: single-namespace catalog answers honestly
      assert(post("/v1/p/namespaces", """{"namespace": ["wh"]}""").statusCode() == 409)
      assert(post("/v1/p/namespaces", """{"namespace": ["other"]}""").statusCode() == 400)

      // ---- DROP: table gone from catalog and every read route
      val del = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/events")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() == 204)
      assert(!cat.tableExists("events"))
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/events").statusCode() == 404)
      val del2 = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/events")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del2.statusCode() == 404, "double drop must 404, not crash")

      // RECREATE under the same name with a different schema: the served
      // metadata must be the NEW incarnation — the response cache keys by
      // stable uuid, so the recreated version-1 can never hit the old
      // incarnation's cached version-1 body
      val recreated = post("/v1/p/namespaces/wh/tables",
        """{"name": "events", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "only", "required": false, "type": "long"}]}}"""
          .stripMargin)
      assert(recreated.statusCode() == 200, recreated.body())
      val served = get(s"${srv.uri}/v1/p/namespaces/wh/tables/events").body()
      assert(served.contains("\"only\"") && !served.contains("payload"),
        "drop + recreate must serve the NEW incarnation's schema")

      // the endpoint capability list advertises the lifecycle routes
      val cfg = get(s"${srv.uri}/v1/config").body()
      assert(cfg.contains("POST /v1/{prefix}/namespaces/{namespace}/tables\"") &&
        cfg.contains("/register") && cfg.contains("DELETE /v1/{prefix}"))
    } finally srv.stop()
  }

  test("REST commit client labels manifests with the catalog's default spec id") {
    // a FOREIGN catalog whose table evolved its partition spec: spec 0 is
    // the retired layout, default-spec-id is 1. The client writes
    // manifests against the default spec and must LABEL them so — a
    // partition_spec_id of 0 would make conforming readers decode the
    // partition struct with the wrong spec's fields. Graft's own serve
    // always exports default-spec-id 0, so this needs a stub spec server.
    val staging = Files.createTempDirectory("rest-specid").toString
    val loadBody =
      s"""{"metadata": {
         |  "format-version": 2,
         |  "table-uuid": "11111111-2222-3333-4444-555555555555",
         |  "location": "$staging",
         |  "last-sequence-number": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "required": false, "type": "long"},
         |    {"id": 2, "name": "name", "required": false, "type": "string"}]}],
         |  "default-spec-id": 1,
         |  "partition-specs": [
         |    {"spec-id": 0, "fields": []},
         |    {"spec-id": 1, "fields": [
         |      {"name": "id", "transform": "identity", "source-id": 1, "field-id": 1001}]}],
         |  "current-snapshot-id": -1,
         |  "snapshots": []
         |}}""".stripMargin
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var posted: String = null
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body =
        if (ex.getRequestMethod == "POST") {
          posted = new String(ex.getRequestBody.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          "{}"
        } else loadBody
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    srv.start()
    try {
      val snapId = IcebergRestCommit.appendFiles(
        s"http://127.0.0.1:${srv.getAddress.getPort}", Seq("wh"), "evolved",
        Seq(IcebergRestCommit.AddedFile(
          MetaIO.join(staging, "f.parquet"), 10L, 3L, Map("id" -> "7"))),
        staging, prefix = Some(""))
      assert(snapId == 1L && posted != null)
      val mPath = MetaIO.listFiles(staging).map(_._1)
        .find(p => p.contains("-m0") && p.endsWith(".avro")).get
      val (_, mMeta) = IcebergExport.readAvro(mPath)
      assert(mMeta.get("partition-spec-id").contains("1"),
        s"manifest must carry the DEFAULT spec id: $mMeta")
      val listPath = MetaIO.listFiles(staging).map(_._1)
        .find(p => p.contains("client-snap-") && p.endsWith(".avro")).get
      val (entries, _) = IcebergExport.readAvro(listPath)
      assert(entries.size == 1 &&
        entries.head.get("partition_spec_id").toString == "1",
        "manifest-list entry must carry the DEFAULT spec id")
    } finally srv.stop(0)
  }

  test("table-uuid is stable across commits; a recreated source refuses refresh") {
    val src = freshCatalog()
    IceWrite.create(spark, src, "u", (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    val srv = new IcebergRestServe(src, namespace = "wh", prefix = "p")
    try {
      def servedUuid(): String =
        (JsonMethods.parse(get(s"${srv.uri}/v1/p/namespaces/wh/tables/u").body()) \
            "metadata" \ "table-uuid") match {
          case JString(x) => x
          case o => fail(s"no table-uuid in served metadata: $o")
        }
      // the spec requires table-uuid IMMUTABLE for the table's life —
      // conforming clients (Iceberg Java/Rust) validate it on every
      // refresh and hard-fail on a change, so a per-export uuid would
      // break any client that loads, sees a commit land, and reloads
      val u0 = servedUuid()
      IceWrite.append(spark, src, "u", Seq((100L, "x")).toDF("id", "name"))
      assert(servedUuid() == u0, "graft-side commit must not change table-uuid")
      val staging = Files.createTempDirectory("rest-uuid-stage").toString
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(Seq((200L, "y")).toDF("id", "name"),
          src.loadTable("u").schema),
        java.nio.file.Paths.get(staging, "add.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "u",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
      assert(servedUuid() == u0, "a REST client's own commit must not change table-uuid")

      // a follower attaches, then the source is DROPPED AND RECREATED
      // under the same name. Graft snapshot ids are sequential from 1, so
      // the recreated table's ids COLLIDE with the attached history — the
      // head-still-exists continuity check alone cannot see the swap; the
      // uuid identity guard must refuse instead of silently replacing the
      // follower with an unrelated table's rows
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "uf", srv.uri, Seq("wh"), "u")
      val headAtAttach = dst.loadTable("uf").currentSnapshotId.get
      src.dropTable("u")
      IceWrite.create(spark, src, "u", (1L to 5L).map(i => (i, s"other$i")).toDF("id", "name"))
      (1 to headAtAttach.toInt).foreach(i =>
        IceWrite.append(spark, src, "u", Seq((1000L + i, "z")).toDF("id", "name")))
      assert(src.loadTable("u").snapshots.exists(_.snapshotId == headAtAttach),
        "fixture: the recreated table must reuse the attached head's snapshot id")
      val e = intercept[IllegalArgumentException](
        IcebergRestImport.refreshTable(dst, "uf"))
      assert(e.getMessage.contains("table-uuid"), e.getMessage)
      // the follower's rows are untouched by the refused refresh
      assert(IceRead.table(spark, dst, "uf").count() == 12L)
    } finally srv.stop()
  }

  test("listing endpoints, auth, write refusal, v3 served faithfully") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t1", (1L to 5L).map(i => (i, i)).toDF("a", "b"))
    IceWrite.create(spark, cat, "t2", (1L to 5L).map(i => (i, i)).toDF("a", "b"))
    // a v3 table with deletion vectors serves format-version 3 metadata
    IceWrite.create(spark, cat, "tv3", (1L to 20L).map(i => (i, i)).toDF("a", "b"),
      formatVersion = 3)
    IceWrite.deleteWhereDv(spark, cat, "tv3", col("a") % 2 === 0)

    val srv = new IcebergRestServe(cat, bearerToken = Some("s3cret"))
    try {
      // everything 401s without the token
      assert(get(s"${srv.uri}/v1/config").statusCode() == 401)
      val tok = Some("s3cret")
      assert(get(s"${srv.uri}/v1/config", tok).statusCode() == 200)
      val tables = JsonMethods.parse(
        get(s"${srv.uri}/v1/graft/namespaces/graft/tables", tok).body()) \ "identifiers"
      val names = tables match {
        case JArray(xs) => xs.map(x => (x \ "name").asInstanceOf[JString].s)
        case _ => fail("no identifiers")
      }
      assert(names == List("t1", "t2", "tv3"))
      assert(get(s"${srv.uri}/v1/graft/namespaces", tok).statusCode() == 200)
      assert(get(s"${srv.uri}/v1/graft/namespaces/graft/tables/nosuch", tok)
        .statusCode() == 404)

      // a malformed CreateTableRequest answers 400 with the reason...
      val post = HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/graft/namespaces/graft/tables"))
        .header("Authorization", "Bearer s3cret")
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
      val malformed = http.send(post, HttpResponse.BodyHandlers.ofString())
      assert(malformed.statusCode() == 400 &&
        malformed.body().contains("CreateTableRequest"), malformed.body())
      // ...and the rename route exists now: a malformed request is a 400
      // (not the old blanket 405)
      val rename = HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/graft/tables/rename"))
        .header("Authorization", "Bearer s3cret")
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
      assert(http.send(rename, HttpResponse.BodyHandlers.ofString()).statusCode() == 400)

      // v3 DV table: served as a format-version 3 LoadTableResult, and a
      // spec client (our import) attaches it with MOR semantics intact
      val v3 = get(s"${srv.uri}/v1/graft/namespaces/graft/tables/tv3", tok)
      assert(v3.statusCode() == 200, s"expected 200, got ${v3.statusCode()}: ${v3.body()}")
      assert((JsonMethods.parse(v3.body()) \ "metadata" \ "format-version") == JInt(3))
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "tv3b", srv.uri, Seq("graft"), "tv3",
        authToken = Some("s3cret"))
      val a = IceRead.table(spark, cat, "tv3")
      val b = IceRead.table(spark, dst, "tv3b")
      assert(b.count() == 10L)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally srv.stop()
  }

  test("drop + re-register of the same source serves the NEW incarnation, not a cached body") {
    // register/import PRESERVE the foreign uuid and restart the version
    // counter, so (uuid, version) alone recurs across incarnations — the
    // response cache must purge on lifecycle mutations
    val src = freshCatalog()
    IceWrite.create(spark, src, "s", (1L to 5L).map(i => (i, s"n$i")).toDF("a", "b"))
    val cat = freshCatalog()
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      val exp1 = IcebergExport.exportIcebergMetadata(src, "s")
      val r1 = post("/v1/p/namespaces/wh/register",
        s"""{"name": "adopt", "metadata-location": "$exp1"}""")
      assert(r1.statusCode() == 200, r1.body())
      // prime the cache through a read, too
      val g1 = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables/adopt").body())
      assert((g1 \ "metadata" \ "snapshots").asInstanceOf[JArray].arr.size == 1)

      // the SOURCE advances; the follower drops + re-registers (same
      // uuid, version counter restarts — the stale-cache trap)
      IceWrite.append(spark, src, "s", Seq((100L, "late")).toDF("a", "b"))
      val exp2 = IcebergExport.exportIcebergMetadata(src, "s")
      assert(http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/adopt")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() == 204)
      val r2 = post("/v1/p/namespaces/wh/register",
        s"""{"name": "adopt", "metadata-location": "$exp2"}""")
      assert(r2.statusCode() == 200, r2.body())
      assert(cat.loadTable("adopt").stableUuid == src.loadTable("s").stableUuid,
        "re-register must preserve the foreign uuid (the scenario under test)")
      val g2 = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables/adopt").body())
      assert((g2 \ "metadata" \ "snapshots").asInstanceOf[JArray].arr.size == 2,
        "a recurring (uuid, version) must serve the NEW incarnation's body")
      assert((r2.body() != r1.body()) && (g2 \ "metadata" \ "current-snapshot-id") ==
        JInt(BigInt(src.loadTable("s").currentSnapshotId.get)))
    } finally srv.stop()
  }

  test("client commit-state-unknown: a post-apply error response must not delete staged files") {
    import com.sun.net.httpserver.HttpServer
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "orders", (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    // a proxy that FORWARDS every request to the real server but answers
    // 500 to successful commit POSTs — the commit applies server-side,
    // the client sees an error (the post-apply-5xx shape)
    // dropCommits=false: POSTs forward, successful commits answer 500
    // (applied-then-error). dropCommits=true: POSTs are NOT forwarded
    // (commit does not apply), answer 500, and table GETs start failing
    // too — the genuinely-UNKNOWN shape.
    val dropCommits = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failGets = new java.util.concurrent.atomic.AtomicBoolean(false)
    val proxy = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    proxy.createContext("/", ex => {
      val path = ex.getRequestURI.toString
      val body = ex.getRequestBody.readAllBytes()
      val isCommit = ex.getRequestMethod == "POST" && path.endsWith("/tables/orders")
      val isTableGet = ex.getRequestMethod == "GET" && path.endsWith("/tables/orders")
      val (code, bytes) =
        if (isCommit && dropCommits.get()) {
          failGets.set(true); (500, "{}".getBytes("UTF-8"))
        } else if (isTableGet && failGets.get()) (500, "{}".getBytes("UTF-8"))
        else {
          val fb = HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          Option(ex.getRequestHeaders.getFirst("Content-Type"))
            .foreach(ct => fb.header("Content-Type", ct))
          val resp = http.send(
            (if (ex.getRequestMethod == "POST")
              fb.POST(HttpRequest.BodyPublishers.ofByteArray(body)) else fb.GET()).build(),
            HttpResponse.BodyHandlers.ofString())
          val c = if (isCommit && resp.statusCode() == 200) 500 else resp.statusCode()
          (c, resp.body().getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    proxy.start()
    val proxyUri = s"http://127.0.0.1:${proxy.getAddress.getPort}"
    try {
      val staging = Files.createTempDirectory("rest-unknown").toString
      val schema = cat.loadTable("orders").schema
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          (100L to 109L).map(i => (i, s"x$i")).toDF("id", "name"), schema),
        java.nio.file.Paths.get(staging, "u1.parquet"))
      // the commit APPLIES but answers 500: the client must detect the
      // applied snapshot via its follow-up load and report SUCCESS —
      // deleting the staged manifests here would corrupt the table
      val snapId = IcebergRestCommit.appendFiles(proxyUri, Seq("wh"), "orders",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
      assert(cat.loadTable("orders").currentSnapshotId.contains(snapId))
      assert(IceRead.table(spark, cat, "orders").count() == 20L,
        "the applied-despite-500 commit must be readable (staged avro intact)")

      val avros1 = MetaIO.listFiles(staging).map(_._1).filter(_.endsWith(".avro"))
      assert(avros1.size == 2,
        s"the applied commit's staged manifest+list must remain: $avros1")

      // now the GENUINELY-UNKNOWN shape: the commit POST is dropped (500,
      // never applied) and the follow-up load fails too — the client must
      // KEEP the staged files (deleting could corrupt an applied commit it
      // cannot observe) and surface the ambiguity
      dropCommits.set(true)
      val (p2, sz2, n2, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          (200L to 209L).map(i => (i, s"y$i")).toDF("id", "name"), schema),
        java.nio.file.Paths.get(staging, "u2.parquet"))
      val e = intercept[RuntimeException](
        IcebergRestCommit.appendFiles(proxyUri, Seq("wh"), "orders",
          Seq(IcebergRestCommit.AddedFile(p2, sz2, n2)), staging))
      assert(e.getMessage.contains("could not determine"), e.getMessage)
      assert(e.getMessage.contains("kept"), e.getMessage)
      val avros2 = MetaIO.listFiles(staging).map(_._1).filter(_.endsWith(".avro"))
      assert(avros2.size == 4,
        s"unknown-state staged files must be KEPT, not deleted: $avros2")
      // ...and the table was genuinely untouched by the dropped commit
      assert(IceRead.table(spark, cat, "orders").count() == 20L)
    } finally { proxy.stop(0); srv.stop() }
  }

  test("rename over REST: metadata-only, identity + history preserved, data protected") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "orders",
      (1L to 30L).map(i => (i, s"n$i")).toDF("id", "name"))
    IceWrite.deleteWhere(spark, cat, "orders", col("id") % 10 === 0)
    val uuid = cat.loadTable("orders").stableUuid
    val snapsBefore = cat.loadTable("orders").snapshots.size
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      def renameBody(from: String, to: String) =
        s"""{"source": {"namespace": ["wh"], "name": "$from"},
           |"destination": {"namespace": ["wh"], "name": "$to"}}"""
          .stripMargin.replace("\n", " ")
      // a LIVE reader primes the cache under the old name first
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/orders").statusCode() == 200)

      assert(post("/v1/p/tables/rename", renameBody("orders", "archive"))
        .statusCode() == 204)
      // old name gone from every route; new name serves the SAME table
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/orders").statusCode() == 404)
      val g = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables/archive").body())
      assert((g \ "metadata" \ "table-uuid") == JString(uuid),
        "rename must preserve the table uuid")
      assert((g \ "metadata" \ "snapshots").asInstanceOf[JArray].arr.size == snapsBefore,
        "rename must preserve the full history")
      // the DATA never moved, reads and writes keep working
      assert(IceRead.table(spark, cat, "archive").count() == 27L)
      IceWrite.append(spark, cat, "archive", Seq((500L, "post-rename")).toDF("id", "name"))
      assert(IceRead.table(spark, cat, "archive").count() == 28L)

      // the old name's root still holds the data: a re-create of the old
      // name is REFUSED (its orphan sweep would eat the renamed table)
      val recreate = post("/v1/p/namespaces/wh/tables",
        """{"name": "orders", "schema": {"type": "struct", "fields": [
          |{"id": 1, "name": "x", "required": false, "type": "long"}]}}""".stripMargin)
      assert(recreate.statusCode() == 400 &&
        recreate.body().contains("renamed"), recreate.body())

      // renaming BACK home is allowed (the marker protects this table's
      // own data) and releases the name again
      assert(post("/v1/p/tables/rename", renameBody("archive", "orders"))
        .statusCode() == 204)
      assert(IceRead.table(spark, cat, "orders").count() == 28L)
      assert(cat.loadTable("orders").stableUuid == uuid)

      // view rename rides its own route; the table route 404s views
      spark.sparkContext.setLogLevel("WARN")
      Views.create(spark, cat, "v1", "SELECT 1 AS one")
      assert(post("/v1/p/tables/rename", renameBody("v1", "v2")).statusCode() == 404)
      assert(post("/v1/p/views/rename", renameBody("v1", "v2")).statusCode() == 204)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/views/v1").statusCode() == 404)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/views/v2").statusCode() == 200)

      // refusals: missing source 404, occupied destination 409
      assert(post("/v1/p/tables/rename", renameBody("nope", "x")).statusCode() == 404)
      IceWrite.create(spark, cat, "other", Seq((1L, "a")).toDF("id", "name"))
      assert(post("/v1/p/tables/rename", renameBody("other", "orders"))
        .statusCode() == 409)
    } finally srv.stop()
  }

  test("stage-create: the CTAS handshake registers atomically on first commit") {
    val cat = freshCatalog()
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      val stagedResp = post("/v1/p/namespaces/wh/tables",
        """{"name": "ctas", "stage-create": true,
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "id", "required": false, "type": "long"},
          |    {"id": 2, "name": "v", "required": false, "type": "string"}]}}"""
          .stripMargin)
      assert(stagedResp.statusCode() == 200, stagedResp.body())
      val stagedM = JsonMethods.parse(stagedResp.body()) \ "metadata"
      val stagedUuid = (stagedM \ "table-uuid").asInstanceOf[JString].s
      val loc = (stagedM \ "location").asInstanceOf[JString].s
      // invisible everywhere until the first commit — and a "crash" here
      // (doing nothing) leaves no catalog entry
      assert(!cat.tableExists("ctas"))
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/ctas").statusCode() == 404)

      // the CTAS writer stages data under the assigned location...
      val staging = MetaIO.join(loc, "data")
      MetaIO.mkdirs(staging)
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(
          (1L to 12L).map(i => (i, s"c$i")).toDF("id", "v"),
          Seq(SchemaField(1, "id", "BIGINT"), SchemaField(2, "v", "STRING"))),
        java.nio.file.Paths.get(staging, "ctas.parquet"))

      // ...a FAILED first commit (nonexistent file) leaves no entry
      val bad = intercept[RuntimeException](
        IcebergRestCommit.commitStagedCreate(srv.uri, Seq("wh"), "ctas",
          stagedM, Seq(IcebergRestCommit.AddedFile("/nope/gone.parquet", 1L, 1L)),
          staging))
      assert(bad.getMessage.contains("does not exist"), bad.getMessage)
      assert(!cat.tableExists("ctas"),
        "a refused first commit must roll the staged create back out")

      // ...and the real first commit registers create+data atomically
      val snapId = IcebergRestCommit.commitStagedCreate(srv.uri, Seq("wh"), "ctas",
        stagedM, Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
      val meta = cat.loadTable("ctas")
      assert(meta.stableUuid == stagedUuid, "the staged identity is the table's")
      assert(meta.currentSnapshotId.contains(snapId))
      assert(IceRead.table(spark, cat, "ctas").count() == 12L)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/ctas").statusCode() == 200)

      // a SECOND staged commit for the same name now loses assert-create
      val again = post("/v1/p/namespaces/wh/tables",
        """{"name": "ctas", "stage-create": true,
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "id", "required": false, "type": "long"}]}}"""
          .stripMargin)
      assert(again.statusCode() == 409, "staging an existing name must refuse")

      // race: stage a fresh name, then a DIRECT create takes it — the
      // staged first commit must lose and leave the direct table intact
      val s2 = post("/v1/p/namespaces/wh/tables",
        """{"name": "raced", "stage-create": true,
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "id", "required": false, "type": "long"},
          |    {"id": 2, "name": "v", "required": false, "type": "string"}]}}"""
          .stripMargin)
      assert(s2.statusCode() == 200)
      IceWrite.create(spark, cat, "raced", Seq((99L, "direct")).toDF("id", "v"))
      val lost = intercept[RuntimeException](
        IcebergRestCommit.commitStagedCreate(srv.uri, Seq("wh"), "raced",
          JsonMethods.parse(s2.body()) \ "metadata",
          Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging))
      assert(lost.getMessage.contains("409"), lost.getMessage)
      assert(IceRead.table(spark, cat, "raced").count() == 1L,
        "the direct table must survive the losing staged commit")
    } finally srv.stop()
  }

  test("server-side scan planning: plan/preplan serve manifest-pruned file tasks") {
    val cat = freshCatalog()
    val rows = (1L to 400L).map(i => (i, s"n$i")).toDF("id", "name")
    // four RANGE-DISJOINT files so zone maps can discriminate
    IceWrite.create(spark, cat, "t", rows.filter(col("id") <= 100).repartition(1))
    for (lo <- Seq(101L, 201L, 301L))
      IceWrite.append(spark, cat, "t",
        rows.filter(col("id") > lo - 1 && col("id") <= lo + 99).repartition(1))
    IceWrite.deleteWhere(spark, cat, "t", col("id") % 50 === 0)
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      def tasksOf(body: String): (List[JValue], List[JValue]) = {
        val resp = post("/v1/p/namespaces/wh/tables/t/plan", body)
        assert(resp.statusCode() == 200, resp.body())
        val j = JsonMethods.parse(resp.body())
        assert((j \ "plan-status") == JString("completed"))
        ((j \ "file-scan-tasks").asInstanceOf[JArray].arr,
          (j \ "delete-files").asInstanceOf[JArray].arr)
      }

      // no filter: every data file is a task, each carrying its resolved
      // delete references into the SHARED delete-files list
      val (all, dels) = tasksOf("{}")
      assert(all.size == 4, s"4 data files expected, got ${all.size}")
      assert(dels.nonEmpty, "the MOR delete must surface in delete-files")
      all.foreach { t =>
        (t \ "delete-file-references") match {
          case JArray(refs) => refs.foreach { r =>
            val i = r.asInstanceOf[JInt].num.toInt
            assert(i >= 0 && i < dels.size, s"dangling delete reference $i")
            assert((dels(i) \ "content") == JString("position-deletes"))
          }
          case _ => fail("every file here has an applicable pos-delete")
        }
      }

      // a selective filter: the plan returns FEWER tasks, and exactly as
      // many as graft's own manifest pruning keeps for the same read
      val filter = """{"filter": {"type": "lt-eq", "term": "id", "value": 100}}"""
      val (kept, _) = tasksOf(filter)
      assert(kept.size < all.size, "the filter must prune files server-side")
      val probe = IceRead.table(spark, cat, "t").filter(col("id") <= 100)
      probe.collect()
      val (total, localKept) = graft.exec.GraftScan.pruneStats(probe)
      assert(total == 4 && kept.size == localKept,
        s"plan kept ${kept.size}, graft's own pruning kept $localKept")
      assert((kept.head \ "residual-filter" \ "type") == JString("lt-eq"),
        "the filter echoes back as the residual")

      // compound + IN + starts-with filters stay sound (never keep less
      // than the engine's own pruning)
      val (k2, _) = tasksOf(
        """{"filter": {"type": "and",
          |  "left": {"type": "gt", "term": "id", "value": 90},
          |  "right": {"type": "lt", "term": "id", "value": 120}}}""".stripMargin)
      assert(k2.size == 2, s"range straddling two files must keep 2, got ${k2.size}")
      val (k3, _) = tasksOf("""{"filter": {"type": "in", "term": "id", "values": [350, 360]}}""")
      assert(k3.size == 1, s"IN within one file must keep 1, got ${k3.size}")
      // unsupported shapes degrade to keep-everything, never to wrong
      val (k4, _) = tasksOf("""{"filter": {"type": "st-invalid", "term": "id"}}""")
      assert(k4.size == 4)

      // preplan hands back an opaque task that plans identically
      val pre = JsonMethods.parse(post("/v1/p/namespaces/wh/tables/t/preplan", "{}").body())
      val planTask = (pre \ "plan-tasks").asInstanceOf[JArray].arr.head
        .asInstanceOf[JString].s
      val (viaTask, _) = tasksOf(
        s"""{"plan-task": "$planTask", "filter": {"type": "lt-eq", "term": "id", "value": 100}}""")
      assert(viaTask.size == kept.size)

      // snapshot-id pins historical state: the pre-delete snapshot has no
      // delete files
      val firstSnap = cat.loadTable("t").snapshots.head.snapshotId
      val (h, hd) = tasksOf(s"""{"snapshot-id": $firstSnap}""")
      assert(h.size == 1 && hd.isEmpty,
        "the first snapshot had one file and no deletes")
    } finally srv.stop()
  }

  test("REST schema evolution: add-schema is the foreign ALTER TABLE; refs removable; metrics sink") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t",
      (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      def commit(updates: String): HttpResponse[String] =
        post("/v1/p/namespaces/wh/tables/t",
          s"""{"requirements": [], "updates": [$updates]}""")

      // rename by id (name->label), add a column (fresh id 3), one commit
      val ev = commit(
        """{"action": "add-schema", "last-column-id": 3, "schema":
          |  {"type": "struct", "schema-id": 1, "fields": [
          |   {"id": 1, "name": "id", "required": false, "type": "long"},
          |   {"id": 2, "name": "label", "required": false, "type": "string"},
          |   {"id": 3, "name": "score", "required": false, "type": "double"}]}},
          |{"action": "set-current-schema-id", "schema-id": -1}""".stripMargin)
      assert(ev.statusCode() == 200, ev.body())
      val m = cat.loadTable("t")
      assert(m.schema.map(_.name) == Seq("id", "label", "score"))
      assert(m.lastColumnId == 3)
      assert(m.statsRetiredNames.contains("name"), "renamed-away name must retire")
      // the rename resolves BY FIELD ID: existing rows read under label
      val rows = IceRead.table(spark, cat, "t")
      assert(rows.filter(col("label") === "n3").count() == 1L)
      assert(rows.filter(col("score").isNull).count() == 10L)

      // refusals share the SQL rulebook: id reuse and narrowing 400
      val reuse = commit(
        """{"action": "add-schema", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"},
          |  {"id": 2, "name": "label", "required": false, "type": "string"},
          |  {"id": 3, "name": "fresh", "required": false, "type": "string"}]}}"""
          .stripMargin.replace("\"id\": 3, \"name\": \"fresh\"",
            "\"id\": 2, \"name\": \"label\"")) // degenerate: same id twice
      assert(reuse.statusCode() == 400, reuse.body())
      val narrow = commit(
        """{"action": "add-schema", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "int"},
          |  {"id": 2, "name": "label", "required": false, "type": "string"},
          |  {"id": 3, "name": "score", "required": false, "type": "double"}]}}"""
          .stripMargin)
      assert(narrow.statusCode() == 400 &&
        narrow.body().contains("widenings"), narrow.body())

      // set/remove snapshot refs over REST: tag the head, then remove it
      val head = cat.loadTable("t").currentSnapshotId.get
      assert(commit(s"""{"action": "set-snapshot-ref", "ref-name": "keep",
        "type": "tag", "snapshot-id": $head}""").statusCode() == 200)
      assert(cat.loadTable("t").tags.get("keep").contains(head))
      assert(commit("""{"action": "remove-snapshot-ref", "ref-name": "keep"}""")
        .statusCode() == 200)
      assert(!cat.loadTable("t").tags.contains("keep"))
      assert(commit("""{"action": "remove-snapshot-ref", "ref-name": "main"}""")
        .statusCode() == 400)
      assert(commit("""{"action": "remove-snapshot-ref", "ref-name": "nope"}""")
        .statusCode() == 400)

      // the metrics sink accepts and discards (clients report blindly)
      assert(post("/v1/p/namespaces/wh/tables/t/metrics",
        """{"report-type": "scan-report", "metrics": {}}""").statusCode() == 204)
      assert(post("/v1/p/namespaces/wh/tables/nope/metrics", "{}").statusCode() == 404)

      // conforming clients pin schema state with their commits: the
      // honest validations accept fresh pins and 409 stale ones
      val lastId = cat.loadTable("t").lastColumnId
      assert(post("/v1/p/namespaces/wh/tables/t",
        s"""{"requirements": [
           |{"type": "assert-current-schema-id", "current-schema-id": 0},
           |{"type": "assert-default-spec-id", "default-spec-id": 0},
           |{"type": "assert-last-assigned-field-id",
           | "last-assigned-field-id": $lastId}],
           |"updates": [{"action": "set-properties", "updates": {"pin": "ok"}}]}"""
          .stripMargin).statusCode() == 200)
      assert(post("/v1/p/namespaces/wh/tables/t",
        """{"requirements": [{"type": "assert-last-assigned-field-id",
          |"last-assigned-field-id": 1}], "updates": []}""".stripMargin)
        .statusCode() == 409, "a stale field-id pin must 409")
      assert(post("/v1/p/namespaces/wh/tables/t",
        """{"requirements": [{"type": "assert-current-schema-id",
          |"current-schema-id": 5}], "updates": []}""".stripMargin)
        .statusCode() == 409)
    } finally srv.stop()
  }

  test("view commit over REST: a foreign CREATE OR REPLACE VIEW versions the served view") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "base",
      (1L to 12L).map(i => (i, i % 3)).toDF("k", "g"))
    GraftSql.register("vcr", cat)
    spark.sql("CREATE VIEW vcr.v AS SELECT k FROM vcr.base WHERE k <= 6")
    val uuid = cat.loadTable("v").stableUuid
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(
          URI.create(s"${srv.uri}/v1/p/namespaces/wh/views/v"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      // a stale client (wrong uuid) gets the spec's 409
      assert(post("""{"requirements": [{"type": "assert-view-uuid",
        "uuid": "00000000-0000-0000-0000-000000000000"}], "updates": []}""")
        .statusCode() == 409)
      // the foreign replace: new spark-dialect version, current moves
      val rep = post(
        s"""{"requirements": [{"type": "assert-view-uuid", "uuid": "$uuid"}],
           |"updates": [
           |{"action": "add-view-version", "view-version": {"version-id": 2,
           |  "timestamp-ms": 12345, "representations": [
           |  {"type": "sql", "sql": "SELECT k, g FROM vcr.base WHERE k > 6",
           |   "dialect": "spark"}]}},
           |{"action": "set-current-view-version", "view-version-id": -1}]}"""
          .stripMargin)
      assert(rep.statusCode() == 200, rep.body())
      val m = cat.loadTable("v")
      assert(Views.versions(m).map(_._1) == Seq(1, 2))
      assert(m.properties(Views.CurrentVersionKey) == "2")
      assert(spark.sql("SELECT * FROM vcr.v").count() == 6L,
        "the replaced definition must serve reads (k > 6: 6 rows)")
      // a TRINO version inside the safe subset lands and reads translated
      val trino = post(
        s"""{"requirements": [], "updates": [
           |{"action": "add-view-version", "view-version": {"version-id": 3,
           |  "representations": [{"type": "sql",
           |  "sql": "SELECT \\"g\\", count(*) AS c FROM vcr.base GROUP BY \\"g\\"",
           |  "dialect": "trino"}]}},
           |{"action": "set-current-view-version", "view-version-id": -1}]}"""
          .stripMargin)
      assert(trino.statusCode() == 200, trino.body())
      assert(spark.sql("SELECT * FROM vcr.v").count() == 3L)
      // reserved graft.view.* properties refuse; wrong current-id refuses
      assert(post("""{"requirements": [], "updates": [{"action": "set-properties",
        "updates": {"graft.view.sql": "boom"}}]}""").statusCode() == 400)
      assert(post("""{"requirements": [], "updates": [
        {"action": "add-view-version", "view-version": {"version-id": 9,
          "representations": [{"type": "sql", "sql": "SELECT 1", "dialect": "spark"}]}},
        {"action": "set-current-view-version", "view-version-id": 7}]}""")
        .statusCode() == 400)
    } finally { srv.stop(); GraftSql.unregister("vcr") }
  }

  test("preplan shards large manifests into bounded plan tasks") {
    // 2500 synthetic manifest entries (plan never opens data files, so
    // none need to exist) — preplan must shard, and the union of every
    // shard's pruned answer must equal the unsharded answer exactly
    val cat = freshCatalog()
    val m0 = cat.createTable(TableMetadata("big", location = "",
      schema = Seq(SchemaField(1, "id", "BIGINT"))))
    val entries = (0 until 2500).map(i => FileEntry(s"/data/f$i.parquet", 100L,
      FileContent.Data, 10L, 1L,
      columnStats = Map("id" -> (s"${i * 10}", s"${i * 10 + 9}"))))
    cat.commit(m0, m0.copy(snapshots = Seq(Snapshot(1L, None, 1L, 0L, entries)),
      currentSnapshotId = Some(1L), refs = Map("main" -> 1L),
      lastSequenceNumber = 1L))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      val pre = JsonMethods.parse(post("/v1/p/namespaces/wh/tables/big/preplan", "{}").body())
      val planTasks = (pre \ "plan-tasks").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JString].s)
      assert(planTasks.size == 3, s"2500 files / 1000 per task = 3, got $planTasks")

      def shardFiles(task: String, filter: String): Seq[String] = {
        val body = s"""{"plan-task": "$task"$filter}"""
        val j = JsonMethods.parse(post("/v1/p/namespaces/wh/tables/big/plan", body).body())
        (j \ "file-scan-tasks").asInstanceOf[JArray].arr
          .map(t => (t \ "data-file" \ "file-path").asInstanceOf[JString].s)
      }
      // no filter: disjoint shards, exact union, every shard bounded
      val all = planTasks.map(shardFiles(_, ""))
      assert(all.map(_.size).sum == 2500 && all.forall(_.size <= 1000))
      assert(all.flatten.distinct.size == 2500, "shards must be disjoint")
      // with a filter: the sharded union equals the unsharded answer.
      // An unsharded ad-hoc plan over 2500 files goes ASYNC (round 10):
      // submitted + plan-id, polled to completion, fetched paged
      val f = """, "filter": {"type": "lt", "term": "id", "value": 100}"""
      val unsharded = {
        val sub = JsonMethods.parse(post("/v1/p/namespaces/wh/tables/big/plan",
          s"""{"snapshot-id": 1$f}""").body())
        assert((sub \ "plan-status") == JString("submitted"), sub)
        val pid = (sub \ "plan-id").asInstanceOf[JString].s
        var j: JValue = JNothing
        var polls = 0
        while ({
          j = JsonMethods.parse(get(
            s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/$pid").body())
          (j \ "plan-status") == JString("submitted")
        }) { polls += 1; assert(polls < 200, "plan never completed"); Thread.sleep(25) }
        assert((j \ "plan-status") == JString("completed"), j)
        (j \ "file-scan-tasks").asInstanceOf[JArray].arr
          .map(t => (t \ "data-file" \ "file-path").asInstanceOf[JString].s)
      }
      assert(unsharded.size == 10, s"zone maps must keep 10 files, got ${unsharded.size}")
      assert(planTasks.flatMap(shardFiles(_, f)).toSet == unsharded.toSet)
    } finally srv.stop()
  }

  test("nested namespaces: a.b.t round-trips through the spec client") {
    val cat = freshCatalog()
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      // namespace lifecycle: children must chain off an existing parent
      assert(post("/v1/p/namespaces", """{"namespace": ["wh", "a", "b"]}""")
        .statusCode() == 404, "missing parent must refuse")
      assert(post("/v1/p/namespaces", """{"namespace": ["wh", "a"]}""").statusCode() == 200)
      assert(post("/v1/p/namespaces", """{"namespace": ["wh", "a", "b"]}""")
        .statusCode() == 200)
      assert(post("/v1/p/namespaces", """{"namespace": ["wh", "a"]}""").statusCode() == 409)
      assert(post("/v1/p/namespaces", """{"namespace": ["other", "x"]}""")
        .statusCode() == 400)
      // parent= listing walks the tree
      val kids = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces?parent=wh").body()) \ "namespaces"
      assert(kids == JArray(List(JArray(List(JString("wh"), JString("a"))))), kids)

      // create a table INSIDE wh.a.b through REST; the catalog sees the
      // dot-prefixed entry, the native engine reads/writes it as a.b.t
      val created = post("/v1/p/namespaces/wh%1Fa%1Fb/tables",
        """{"name": "t", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"},
          |  {"id": 2, "name": "v", "required": false, "type": "string"}]}}"""
          .stripMargin)
      assert(created.statusCode() == 200, created.body())
      assert(cat.tableExists("a.b.t"))
      IceWrite.append(spark, cat, "a.b.t", Seq((1L, "x"), (2L, "y")).toDF("id", "v"))

      // spec-client append against the NESTED namespace
      val staging = Files.createTempDirectory("rest-ns-stage").toString
      val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
        spark, IceWrite.withFieldIds(Seq((3L, "z")).toDF("id", "v"),
          cat.loadTable("a.b.t").schema),
        java.nio.file.Paths.get(staging, "ns.parquet"))
      IcebergRestCommit.appendFiles(srv.uri, Seq("wh", "a", "b"), "t",
        Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
      assert(IceRead.table(spark, cat, "a.b.t").count() == 3L)

      // spec-client ATTACH from the nested namespace: full round trip
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "back", srv.uri, Seq("wh", "a", "b"), "t")
      assert(IceRead.table(spark, dst, "back").count() == 3L)

      // listings: the table shows under ITS namespace only, with the
      // bare name; the root lists nothing
      val inB = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh%1Fa%1Fb/tables").body()) \ "identifiers"
      assert(inB == JArray(List(JObject(
        "namespace" -> JArray(List(JString("wh"), JString("a"), JString("b"))),
        "name" -> JString("t")))), inB)
      assert((JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables").body()) \ "identifiers")
        == JArray(Nil))
      // namespace existence: implicit for populated, 404 for absent
      assert(get(s"${srv.uri}/v1/p/namespaces/wh%1Fa%1Fb").statusCode() == 200)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh%1Fnope").statusCode() == 404)
      // encoded path separators / dot-dot NEVER reach the filesystem as
      // catalog keys — they 404 instead of traversing out of the warehouse
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/..%2F..%2Fetc").statusCode() == 404)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/%2E%2E").statusCode() == 404)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh%1F..%2Fx/tables").statusCode() == 404)

      // DELETE: non-empty refuses; after the table drops, children then
      // parents drop cleanly
      def deleteNs(ns: String): Int = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/$ns")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode()
      assert(deleteNs("wh%1Fa%1Fb") == 409, "non-empty namespace must refuse drop")
      assert(http.send(HttpRequest.newBuilder(URI.create(
        s"${srv.uri}/v1/p/namespaces/wh%1Fa%1Fb/tables/t")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() == 204)
      assert(deleteNs("wh%1Fa") == 409, "namespace with children must refuse drop")
      assert(deleteNs("wh%1Fa%1Fb") == 204)
      assert(deleteNs("wh%1Fa") == 204)
      assert(deleteNs("wh") == 400, "the root never drops")
    } finally srv.stop()
  }

  test("listing pagination: pageToken/pageSize walk 1k tables completely") {
    val cat = freshCatalog()
    val names = (0 until 1000).map(i => f"p$i%04d")
    names.foreach(n => cat.createTable(TableMetadata(n, location = "")))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      // no params: the full listing, no token
      val all = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables").body())
      assert((all \ "identifiers").asInstanceOf[JArray].arr.size == 1000)
      assert((all \ "next-page-token") == JNothing)

      // paged walk: every page bounded, tokens chain, union is exact
      var token: Option[String] = None
      var pages = 0
      val seen = Seq.newBuilder[String]
      var done = false
      while (!done) {
        val q = s"pageSize=137" + token.map(t => s"&pageToken=$t").getOrElse("")
        val j = JsonMethods.parse(get(
          s"${srv.uri}/v1/p/namespaces/wh/tables?$q").body())
        val page = (j \ "identifiers").asInstanceOf[JArray].arr
          .map(e => (e \ "name").asInstanceOf[JString].s)
        assert(page.size <= 137)
        seen ++= page
        pages += 1
        (j \ "next-page-token") match {
          case JString(t) => token = Some(t)
          case _ => done = true
        }
        assert(pages <= 10, "token chain must terminate")
      }
      assert(pages == 8, s"1000/137 needs 8 pages, got $pages")
      assert(seen.result() == names, "paged union must be the exact sorted listing")
    } finally srv.stop()
  }

  test("remove-snapshots over REST: expiry semantics, pins refuse, GC stays server-side") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t", Seq((1L, "a")).toDF("id", "v"))
    for (i <- 2 to 5)
      IceWrite.append(spark, cat, "t", Seq((i.toLong, s"v$i")).toDF("id", "v"))
    val snaps = cat.loadTable("t").snapshots.map(_.snapshotId)
    assert(snaps.size == 5)
    val Seq(s1, s2, s3, s4, s5) = snaps
    IceWrite.createTag(cat, "t", "keepme", s3)
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def commit(upds: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(
          URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/t"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"requirements": [], "updates": [$upds]}""")).build(),
          HttpResponse.BodyHandlers.ofString())

      // pins refuse: current head, tag-pinned, and unknown ids
      val rCur = commit(s"""{"action": "remove-snapshots", "snapshot-ids": [$s5]}""")
      assert(rCur.statusCode() == 400 && rCur.body().contains("pinned"), rCur.body())
      val rTag = commit(s"""{"action": "remove-snapshots", "snapshot-ids": [$s3]}""")
      assert(rTag.statusCode() == 400 && rTag.body().contains("pinned"), rTag.body())
      val rNo = commit("""{"action": "remove-snapshots", "snapshot-ids": [999]}""")
      assert(rNo.statusCode() == 400 && rNo.body().contains("no snapshot"), rNo.body())
      // one bad id refuses the WHOLE batch
      val rMix = commit(
        s"""{"action": "remove-snapshots", "snapshot-ids": [$s1, $s5]}""")
      assert(rMix.statusCode() == 400, rMix.body())
      assert(cat.loadTable("t").snapshots.size == 5,
        "refused expiry must change nothing")

      // the real expiry: drop s1, s2 — reads, lineage of the head, and
      // the changelog of surviving commits are untouched
      val ok = commit(
        s"""{"action": "remove-snapshots", "snapshot-ids": [$s1, $s2]}""")
      assert(ok.statusCode() == 200, ok.body())
      val after = cat.loadTable("t")
      assert(after.snapshots.map(_.snapshotId) == Seq(s3, s4, s5))
      assert(IceRead.table(spark, cat, "t").count() == 5,
        "expiry is metadata-only: the head read keeps every row")
      assert(IceRead.tableAtTag(spark, cat, "t", "keepme").count() == 3)
      // time-travel to an expired snapshot fails CLEANLY
      val gone = intercept[IllegalStateException](
        IceRead.tableAt(spark, cat, "t", s1).count())
      assert(gone.getMessage.contains("no snapshot"))
      // changelog across the surviving window still works
      val chg = Changelog.changesBetween(spark, cat, "t", s3, s5)
      assert(chg.where(col("_change_type") === "insert").count() == 2)

      // expire a TAGGED snapshot by removing the tag in the SAME commit
      // (remove-snapshots applies last, against the post-ref-update state)
      val both = commit(
        s"""{"action": "remove-snapshot-ref", "ref-name": "keepme"},
           |{"action": "remove-snapshots", "snapshot-ids": [$s3]}"""
          .stripMargin.replace("\n", " "))
      assert(both.statusCode() == 200, both.body())
      val fin = cat.loadTable("t")
      assert(fin.snapshots.map(_.snapshotId) == Seq(s4, s5) &&
        fin.tags.isEmpty)
      assert(IceRead.table(spark, cat, "t").count() == 5)
      // GC stays server-side: expired snapshots' files are NOT deleted by
      // the REST exchange; they surface through the maintenance sweep's
      // orphan detection instead
      val orphans = graft.compaction.Maintenance.orphanFiles(cat, "t", olderThanMs = 0L)
      assert(orphans.isEmpty || orphans.forall(p => MetaIO.exists(p)),
        "expiry must not have deleted any file")

      // a MID-CHAIN removal (the head's parent) is metadata-legal (native
      // keepLast=1 expiry already leaves the head parentless): reads are
      // unaffected and changelog over the severed range fails LOUDLY,
      // never silently wrong
      val rmMid = commit(
        s"""{"action": "remove-snapshots", "snapshot-ids": [$s4]}""")
      assert(rmMid.statusCode() == 200, rmMid.body())
      assert(cat.loadTable("t").snapshots.map(_.snapshotId) == Seq(s5))
      assert(IceRead.table(spark, cat, "t").count() == 5,
        "head reads survive a severed parent chain")
      val sever = intercept[IllegalArgumentException](
        Changelog.changesOfLatest(spark, cat, "t").count())
      assert(sever.getMessage.contains("not an ancestor"), sever.getMessage)
    } finally srv.stop()
  }

  test("set/remove-statistics over REST: foreign ANALYZE registers, graft serves and reuses") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t",
      (1L to 100L).map(i => (i, s"v${i % 7}")).toDF("id", "v"))
    val meta0 = cat.loadTable("t")
    val snapId = meta0.currentSnapshotId.get
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def commit(upd: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(
          URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/t"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"requirements": [], "updates": [$upd]}""")).build(),
          HttpResponse.BodyHandlers.ofString())

      // the FOREIGN engine's ANALYZE: theta-sketch both columns, write a
      // Puffin sidecar, register it through the commit endpoint
      val idSketch = ThetaSketch.empty()
      (1L to 100L).foreach(idSketch.updateLong)
      val vSketch = ThetaSketch.empty()
      (0L to 6L).foreach(i => vSketch.updateString(s"v$i"))
      val statsPath = MetaIO.join(meta0.location, "stats", "foreign.puffin")
      val fid = meta0.fieldByName("id").get.id
      val fv = meta0.fieldByName("v").get.id
      Puffin.write(statsPath, Seq(
        Puffin.Blob("apache-datasketches-theta-v1", idSketch.serialize,
          snapId, 1L, Seq(fid), Map("ndv" -> idSketch.estimate.toString)),
        Puffin.Blob("apache-datasketches-theta-v1", vSketch.serialize,
          snapId, 1L, Seq(fv), Map("ndv" -> "7"))))

      // refusals first: wrong snapshot, missing file, junk file
      val rSnap = commit(s"""{"action": "set-statistics", "statistics":
        {"snapshot-id": ${snapId + 99}, "statistics-path": "$statsPath"}}""")
      assert(rSnap.statusCode() == 400 && rSnap.body().contains("current"), rSnap.body())
      val rMiss = commit(s"""{"action": "set-statistics", "statistics":
        {"snapshot-id": $snapId, "statistics-path": "${meta0.location}/nope.puffin"}}""")
      assert(rMiss.statusCode() == 400 && rMiss.body().contains("exist"), rMiss.body())
      val junk = MetaIO.join(meta0.location, "stats", "junk.puffin")
      MetaIO.writeString(junk, "not a puffin file")
      val rJunk = commit(s"""{"action": "set-statistics", "statistics":
        {"snapshot-id": $snapId, "statistics-path": "$junk"}}""")
      assert(rJunk.statusCode() == 400, rJunk.body())

      // the real registration
      val ok = commit(s"""{"action": "set-statistics", "statistics":
        {"snapshot-id": $snapId, "statistics-path": "$statsPath"}}""")
      assert(ok.statusCode() == 200, ok.body())
      val m1 = cat.loadTable("t")
      assert(m1.properties.get("ndv.sketch.path").contains(statsPath))
      assert(m1.properties.get("ndv.sketch.snapshot-id").contains(snapId.toString))

      // served back: the next LoadTableResult's statistics list carries
      // blobs with the foreign cardinalities for external CBOs
      val ltr = JsonMethods.parse(http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/t")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body())
      val stats = (ltr \ "metadata" \ "statistics").asInstanceOf[JArray].arr
      assert(stats.size == 1, JsonMethods.compact(JsonMethods.render(ltr \ "metadata" \ "statistics")))
      val ndvs = (stats.head \ "blob-metadata").asInstanceOf[JArray].arr.map(b =>
        (b \ "properties" \ "ndv").asInstanceOf[JString].s.toLong).toSet
      assert(ndvs == Set(idSketch.estimate, 7L),
        s"served ndvs $ndvs must carry the foreign cardinalities")

      // graft's own ANALYZE REUSES the foreign provenance: after an
      // append-only delta it takes the incremental path (possible only
      // because the registered sidecar was read back)
      IceWrite.append(spark, cat, "t",
        (101L to 120L).map(i => (i, s"v${i % 7}")).toDF("id", "v"))
      val res = NdvStats.analyze(spark, cat, "t", Seq("id", "v"))
      assert(res.incremental,
        "ANALYZE after an append must ride the foreign-registered sketches")
      assert(res.sketches("id").estimate >= 115 && res.sketches("id").estimate <= 125,
        s"id ndv ${res.sketches("id").estimate} must reflect old+new")
      assert(res.sketches("v").estimate == 7)

      // remove-statistics: idempotent unregistration; the serve stops
      // carrying a statistics list for the de-registered provenance
      val m2 = cat.loadTable("t")
      val sid2 = m2.properties("ndv.sketch.snapshot-id").toLong
      val rm = commit(s"""{"action": "remove-statistics", "snapshot-id": $sid2}""")
      assert(rm.statusCode() == 200, rm.body())
      assert(!cat.loadTable("t").properties.contains("ndv.sketch.path"))
      val rm2 = commit(s"""{"action": "remove-statistics", "snapshot-id": $sid2}""")
      assert(rm2.statusCode() == 200, "removal is idempotent")
      val ltr2 = JsonMethods.parse(http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/t")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body())
      assert((ltr2 \ "metadata" \ "statistics") == JArray(Nil))
    } finally srv.stop()
  }

  test("reserved graft.* table properties refuse on every foreign door") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v0"))
    // the rename retires v0's per-file stats — the exact property whose
    // foreign removal would re-arm stale zone maps and read wrong rows
    SchemaEvolution.renameColumn(cat, "t", "v0", "v")
    assert(cat.loadTable("t").statsRetiredNames == Set("v0"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def post(path: String, body: String): HttpResponse[String] =
        http.send(HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      def commit(upd: String): HttpResponse[String] =
        post("/v1/p/namespaces/wh/tables/t",
          s"""{"requirements": [], "updates": [$upd]}""")
      val before = cat.loadTable("t").properties

      val r1 = commit("""{"action": "remove-properties",
        "removals": ["graft.stats.retired-names"]}""")
      assert(r1.statusCode() == 400 && r1.body().contains("reserved"), r1.body())
      val r2 = commit("""{"action": "set-properties",
        "updates": {"graft.table-uuid": "11111111-2222-3333-4444-555555555555"}}""")
      assert(r2.statusCode() == 400 && r2.body().contains("reserved"), r2.body())
      val r3 = commit("""{"action": "set-properties",
        "updates": {"graft.bloom.v.paths": "/tmp/forged"}}""")
      assert(r3.statusCode() == 400, r3.body())
      // a reserved key hidden among innocent ones refuses the WHOLE commit
      val r4 = commit("""{"action": "set-properties",
        "updates": {"owner": "etl", "graft.stats.retired-names": ""}}""")
      assert(r4.statusCode() == 400, r4.body())
      assert(cat.loadTable("t").properties == before,
        "a refused property commit must change nothing")

      // unreserved keys through the same door still land
      val ok = commit("""{"action": "set-properties", "updates": {"owner": "etl"}}""")
      assert(ok.statusCode() == 200, ok.body())
      assert(cat.loadTable("t").properties.get("owner").contains("etl"))
      val rm = commit("""{"action": "remove-properties", "removals": ["owner"]}""")
      assert(rm.statusCode() == 200, rm.body())
      assert(!cat.loadTable("t").properties.contains("owner"))
      assert(cat.loadTable("t").statsRetiredNames == Set("v0"),
        "retirement survives the whole exchange")

      // the CREATE door refuses client-forged reserved keys too (register
      // is the sanctioned adopt-a-foreign-uuid path)
      val cr = post("/v1/p/namespaces/wh/tables",
        """{"name": "t2", "schema": {"type": "struct", "fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"}]},
          "properties": {"graft.table-uuid": "99999999-0000-0000-0000-000000000000"}}""")
      assert(cr.statusCode() == 400 && cr.body().contains("reserved"), cr.body())
    } finally srv.stop()
  }
}
