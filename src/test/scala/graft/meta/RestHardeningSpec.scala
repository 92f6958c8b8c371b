package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-10 hardening regressions:
  *
  *  - `/plan` filter translation is POLARITY-AWARE: dropping an
  *    unparseable AND conjunct weakens the predicate, which is only
  *    conservative outside a NOT — under one, the whole subtree must
  *    translate fully or degrade to keep-everything (never prune wrong);
  *  - BODY-derived identifiers (rename source/destination, transaction
  *    identifiers, create/register names, namespace segments) get the
  *    same traversal guard as URL-derived ones;
  *  - dropping a STALE name after a rename deletes nothing (the renamed
  *    entry's live data still lives under the old name's root), on both
  *    [[LocalCatalog]] and [[RestCatalog]];
  *  - creating under a nonexistent namespace answers the spec's 404.
  */
class RestHardeningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("rest-hard-wh").toString)
  private def get(uri: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(uri: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("plan filter polarity: NOT over a partially-translatable AND keeps everything") {
    val cat = freshCatalog()
    // identity-partitioned: constEval evaluates ARBITRARY deterministic
    // shapes (including NOT) over the partition constant — the arm the
    // polarity bug pruned through
    val rows = (1L to 90L).map(i => (i, s"g${i % 3}", s"n$i")).toDF("id", "grp", "name")
    IceWrite.create(spark, cat, "t", rows,
      partitionSpec = Seq(PartitionField("grp")))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def tasks(filter: String): Int = {
        val resp = post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/plan",
          s"""{"filter": $filter}""")
        assert(resp.statusCode() == 200, resp.body())
        (JsonMethods.parse(resp.body()) \ "file-scan-tasks")
          .asInstanceOf[JArray].arr.size
      }
      val total = tasks("{}")
      assert(total >= 3, s"3 partitions expected, got $total files")
      // a fully-translated NOT prunes: g0's files drop out
      val notEq = tasks("""{"type": "not", "child":
        {"type": "eq", "term": "grp", "value": "g0"}}""")
      assert(notEq < total, s"NOT(eq) must prune the g0 partition ($notEq/$total)")
      // NOT over AND(translatable, UNTRANSLATABLE): dropping the conjunct
      // would yield Not(grp = 'g0') and wrongly prune g0's files, whose
      // rows CAN match the original filter (any g0 row where the
      // untranslatable conjunct is false) — the subtree must degrade to
      // keep-everything instead
      assert(tasks("""{"type": "not", "child": {"type": "and",
        "left": {"type": "eq", "term": "grp", "value": "g0"},
        "right": {"type": "st-unknown-shape", "term": "id"}}}""") == total,
        "weakened conjunct under NOT must not prune")
      // at positive polarity the conjunct-drop stays allowed (keeps more):
      // only g0's files survive
      assert(tasks("""{"type": "and",
        "left": {"type": "eq", "term": "grp", "value": "g0"},
        "right": {"type": "st-unknown-shape", "term": "id"}}""") == total - notEq)
    } finally srv.stop()
  }

  test("plan filter FUZZ: pruning is advisory, never wrong, under arbitrary polarity") {
    val cat = freshCatalog()
    // identity partitions (grp) x range-disjoint id files: both pruning
    // arms (constEval over partition constants, zone maps) in play
    val mk = (lo: Long, hi: Long) =>
      (lo to hi).map(i => (i, s"g${i % 3}", s"n$i")).toDF("id", "grp", "name")
    IceWrite.create(spark, cat, "t", mk(1L, 100L),
      partitionSpec = Seq(PartitionField("grp")))
    IceWrite.append(spark, cat, "t", mk(101L, 200L))
    IceWrite.append(spark, cat, "t", mk(201L, 300L))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      import org.apache.spark.sql.Column
      val rnd = new scala.util.Random(20260816L)
      // each generated node is (spec filter JSON, GROUND-TRUTH column) —
      // untranslatable leaves still have real semantics for the truth side
      def leaf(): (String, Column) = rnd.nextInt(6) match {
        case 0 =>
          val g = s"g${rnd.nextInt(3)}"
          (s"""{"type": "eq", "term": "grp", "value": "$g"}""", col("grp") === g)
        case 1 =>
          val n = 1 + rnd.nextInt(300)
          val (op, c) = Seq(
            ("lt", col("id") < n), ("gt", col("id") > n),
            ("lt-eq", col("id") <= n), ("gt-eq", col("id") >= n))(rnd.nextInt(4))
          (s"""{"type": "$op", "term": "id", "value": $n}""", c)
        case 2 =>
          val vs = Seq.fill(3)(1L + rnd.nextInt(300))
          (s"""{"type": "in", "term": "id", "values": [${vs.mkString(",")}]}""",
            col("id").isin(vs: _*))
        case 3 => ("""{"type": "not-null", "term": "grp"}""", col("grp").isNotNull)
        // UNTRANSLATABLE shapes with real row semantics the server never
        // sees — the polarity machinery must keep every matching file
        case 4 => ("""{"type": "st-unknown", "term": "id"}""", col("id") % 7 === 0)
        case _ => ("""{"type": "st-mystery", "term": "grp"}""", col("id") % 5 === 1)
      }
      def gen(depth: Int): (String, Column) =
        if (depth <= 0) leaf()
        else rnd.nextInt(4) match {
          case 0 => val (lj, lc) = gen(depth - 1); val (rj, rc) = gen(depth - 1)
            (s"""{"type": "and", "left": $lj, "right": $rj}""", lc && rc)
          case 1 => val (lj, lc) = gen(depth - 1); val (rj, rc) = gen(depth - 1)
            (s"""{"type": "or", "left": $lj, "right": $rj}""", lc || rc)
          case 2 => val (cj, cc) = gen(depth - 1)
            (s"""{"type": "not", "child": $cj}""", !cc)
          case _ => leaf()
        }
      val filters = Seq.fill(60)(gen(2 + rnd.nextInt(2)))

      // ground truth in ONE pass: per data file, does ANY row match each
      // filter (null-safe: a null predicate row does not match)
      val paths = cat.loadTable("t").currentSnapshot.get.manifest
        .filter(_.content == FileContent.Data).map(_.path)
      val all = spark.read.parquet(paths: _*)
        .select(col("*"), col("_metadata.file_path").as("__f"))
      val aggs = filters.zipWithIndex.map { case ((_, truth), i) =>
        max(when(truth, 1).otherwise(0)).as(s"m$i") }
      val perFile = all.groupBy(col("__f")).agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getString(0).replaceFirst("^file:/+", "/") ->
          (1 to filters.size).map(i => r.getInt(i) == 1)).toMap

      filters.zipWithIndex.foreach { case ((json, _), i) =>
        val resp = post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/plan",
          s"""{"filter": $json}""")
        assert(resp.statusCode() == 200, resp.body())
        val kept = (JsonMethods.parse(resp.body()) \ "file-scan-tasks")
          .asInstanceOf[JArray].arr
          .map(t => (t \ "data-file" \ "file-path").asInstanceOf[JString].s).toSet
        perFile.foreach { case (f, matches) =>
          if (matches(i))
            assert(kept.contains(f),
              s"filter #$i pruned file $f that has matching rows:\n$json")
        }
      }
    } finally srv.stop()
  }

  test("body-derived identifiers refuse traversal and aliasing (400), keys stay flat") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t", Seq((1L, "a")).toDF("id", "v"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val before = cat.listTables
      // rename DESTINATION with a traversing namespace segment
      assert(post(s"${srv.uri}/v1/p/tables/rename",
        """{"source": {"namespace": ["wh"], "name": "t"},
          | "destination": {"namespace": ["wh", "../x"], "name": "t"}}"""
          .stripMargin).statusCode() == 400)
      // rename DESTINATION with a traversing bare name
      assert(post(s"${srv.uri}/v1/p/tables/rename",
        """{"source": {"namespace": ["wh"], "name": "t"},
          | "destination": {"namespace": ["wh"], "name": "../t2"}}"""
          .stripMargin).statusCode() == 400)
      // rename SOURCE likewise (never reaches the catalog as a key)
      assert(post(s"${srv.uri}/v1/p/tables/rename",
        """{"source": {"namespace": ["wh"], "name": "../../etc"},
          | "destination": {"namespace": ["wh"], "name": "t2"}}"""
          .stripMargin).statusCode() == 400)
      // create with a nesting name: `a/b` would put one table's root
      // inside another's orphan-sweep domain
      assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables",
        """{"name": "a/b", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"}]}}"""
          .stripMargin).statusCode() == 400)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables",
        """{"name": "..", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"}]}}"""
          .stripMargin).statusCode() == 400)
      // register with a backslash name
      assert(post(s"${srv.uri}/v1/p/namespaces/wh/register",
        """{"name": "a\\b", "metadata-location": "/nowhere.metadata.json"}""")
        .statusCode() == 400)
      // view create with a separator name
      assert(post(s"${srv.uri}/v1/p/namespaces/wh/views",
        """{"name": "v/w", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"}]},
          | "view-version": {"timestamp-ms": 1, "representations": [
          |   {"type": "sql", "sql": "SELECT 1", "dialect": "spark"}],
          |   "default-namespace": ["wh"]}}""".stripMargin).statusCode() == 400)
      // transaction identifier with a traversing namespace
      assert(post(s"${srv.uri}/v1/p/transactions/commit",
        """{"table-changes": [{
          |  "identifier": {"namespace": ["wh", "../x"], "name": "t"},
          |  "requirements": [], "updates": []}]}""".stripMargin)
        .statusCode() == 400)
      // namespace create with traversing / separator segments
      assert(post(s"${srv.uri}/v1/p/namespaces",
        """{"namespace": ["wh", "../x"]}""").statusCode() == 400)
      assert(post(s"${srv.uri}/v1/p/namespaces",
        """{"namespace": ["wh", "a/b"]}""").statusCode() == 400)
      // nothing changed: every catalog key is still flat and inside
      assert(cat.listTables == before)
      assert(cat.listTables.forall(n => !n.contains("/") && !n.contains("\\")))
      // read routes reject '.'-aliased names instead of aliasing into
      // another namespace's entry
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/a.b").statusCode() == 404)
    } finally srv.stop()
  }

  test("create/register under a nonexistent namespace answers the spec's 404") {
    val cat = freshCatalog()
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fnope/tables",
        """{"name": "t", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"}]}}"""
          .stripMargin).statusCode() == 404)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fnope/register",
        """{"name": "t", "metadata-location": "/nowhere.metadata.json"}""")
        .statusCode() == 404)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fnope/views",
        """{"name": "v", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"}]},
          | "view-version": {"timestamp-ms": 1, "representations": [
          |   {"type": "sql", "sql": "SELECT 1", "dialect": "spark"}],
          |   "default-namespace": ["wh"]}}""".stripMargin).statusCode() == 404)
      // after an explicit create, the same request lands
      assert(post(s"${srv.uri}/v1/p/namespaces",
        """{"namespace": ["wh", "nope"]}""").statusCode() == 200)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fnope/tables",
        """{"name": "t", "schema": {"type": "struct", "fields": [
          |  {"id": 1, "name": "id", "required": false, "type": "long"}]}}"""
          .stripMargin).statusCode() == 200)
    } finally srv.stop()
  }

  test("LocalCatalog: dropping the STALE name after a rename deletes nothing") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "dr_a", Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    cat.renameTable("dr_a", "dr_b")
    val origRoot = MetaIO.join(cat.warehouse, "dr_a")
    assert(MetaIO.exists(origRoot), "rename keeps data under the original root")
    // the stale-name drop (e.g. an idempotent retry) is a no-op: the root
    // holds dr_b's LIVE data
    cat.dropTable("dr_a")
    assert(MetaIO.exists(origRoot), "stale-name drop must not destroy the renamed table's data")
    assert(IceRead.table(spark, cat, "dr_b").count() == 2L,
      "the renamed table still reads after the stale drop")
    // the OWNING entry's drop still reclaims both roots
    cat.dropTable("dr_b")
    assert(!MetaIO.exists(origRoot) &&
      !MetaIO.exists(MetaIO.join(cat.warehouse, "dr_b")))
  }

  test("RestCatalog: DELETE of a nonexistent name is 404 and deletes nothing") {
    val wh = Files.createTempDirectory("rest-hard-s3").toString
    val srv = new RestCatalog.Server(wh)
    try {
      val c = new RestCatalog.Client(srv.uri)
      val m = c.createTable(TableMetadata("rn_a", location = ""))
      val dataFile = MetaIO.join(c.dataDir("rn_a"), "part-0.parquet")
      MetaIO.writeString(dataFile, "live bytes")
      c.renameTable("rn_a", "rn_b")
      // stale-name DELETE: must answer 404 and touch NOTHING — rn_b's
      // live data is under warehouse/rn_a
      val resp = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/tables/rn_a")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 404, resp.body())
      assert(MetaIO.exists(dataFile),
        "stale-name DELETE must not destroy the renamed table's data")
      assert(c.loadTable("rn_b").stableUuid == m.stableUuid)
      // a CREATE adopting the renamed root refuses (two tables would
      // interleave files and orphan-sweep each other)
      val create = intercept[Exception](
        c.createTable(TableMetadata("rn_a", location = "")))
      assert(create.getMessage.contains("renamed"), create.getMessage)
      assert(MetaIO.exists(dataFile))
      // the owning entry's drop reclaims its (original) location
      c.dropTable("rn_b")
      assert(!MetaIO.exists(dataFile))
    } finally srv.stop()
  }
}
