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

      // ---- non-append shapes refuse with 400: a commit whose manifest
      // list DROPS the table's live files
      val listSchema = new org.apache.avro.Schema.Parser().parse(
        IcebergExport.manifestListSchemaJsonV(2))
      val emptyList = MetaIO.join(staging, "empty-list.avro")
      IcebergExport.avroWrite(emptyList, listSchema, Map("format-version" -> "2"), Nil)
      val dropBody = """{"requirements":[],"updates":[
        {"action":"add-snapshot","snapshot":{"snapshot-id":777,
         "sequence-number":99,"timestamp-ms":1,"manifest-list":"""" + emptyList +
        """","summary":{"operation":"delete"}}}]}"""
      val dropResp = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/orders"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(dropBody)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(dropResp.statusCode() == 400,
        s"file-dropping commit must 400: ${dropResp.statusCode()} ${dropResp.body()}")

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

      // writes refuse with 405 (read-only surface)
      val post = HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/graft/namespaces/graft/tables"))
        .header("Authorization", "Bearer s3cret")
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
      assert(http.send(post, HttpResponse.BodyHandlers.ofString()).statusCode() == 405)

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
}
