package graft.meta

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Attach from a spec-compliant Iceberg REST catalog: a mock server
  * implements the public REST surface subset (`GET /v1/config` with a
  * prefix override, `GET /v1/{prefix}/namespaces/{ns}/tables/{t}`
  * returning a LoadTableResult) over metadata produced by
  * [[IcebergExport]] — so the wire shapes, the %1F namespace encoding,
  * the bearer auth header, and both metadata-delivery forms (embedded vs
  * metadata-location) are all pinned. */
class IcebergRestImportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("rest-imp-wh").toString)

  /** (metadataJsonPath, source catalog) for a table with partitions,
    * deletes, and NDV stats — everything the import must carry. */
  private def exportedFixture(): (String, LocalCatalog) = {
    val cat = freshCatalog()
    val rows = (1L to 200L).map(i => (i, s"g${i % 4}", s"n$i")).toDF("id", "grp", "name")
    IceWrite.create(spark, cat, "src", rows, partitionSpec = Seq(PartitionField("grp")))
    IceWrite.deleteWhere(spark, cat, "src", col("id") % 10 === 0)
    val sketches = NdvStats.compute(spark, cat, "src")
    (IcebergExport.exportIcebergMetadata(cat, "src", ndvSketches = sketches), cat)
  }

  /** Serves the REST subset; records request paths + auth headers. */
  private class MockRestServer(metadataJson: String, metadataPath: String,
      prefix: String, token: Option[String], embedMetadata: Boolean) {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getRawPath
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      seen += ((path, auth))
      val body: Option[String] =
        if (path == "/v1/config")
          Some(s"""{"defaults":{},"overrides":{"prefix":"$prefix"}}""")
        else if (path == s"/v1/$prefix/namespaces/prod%1Fevents/tables/clicks") {
          if (token.exists(t => !auth.contains(s"Bearer $t"))) None // 401 below
          else if (embedMetadata)
            Some(s"""{"metadata-location":"$metadataPath","metadata":$metadataJson,"config":{}}""")
          else
            Some(s"""{"metadata-location":"$metadataPath"}""")
        } else None
      val (code, out) = body match {
        case Some(b) => (200, b)
        case None => (if (token.isDefined) 401 else 404, """{"error":{"message":"nope"}}""")
      }
      val bytes = out.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("importTable: config handshake, %1F namespace, bearer auth, embedded metadata") {
    val (jsonPath, srcCat) = exportedFixture()
    val metadataJson = MetaIO.readString(jsonPath)
    val srv = new MockRestServer(metadataJson, jsonPath, "acct1", Some("tok-7"),
      embedMetadata = true)
    try {
      val dst = freshCatalog()
      val back = IcebergRestImport.importTable(dst, "clicks_local", srv.uri,
        Seq("prod", "events"), "clicks", authToken = Some("tok-7"))
      // wire shapes: config handshake first, then the prefixed table GET
      // with the unit-separator namespace and the bearer header
      assert(srv.seen.head._1 == "/v1/config")
      assert(srv.seen.last._1 == "/v1/acct1/namespaces/prod%1Fevents/tables/clicks")
      assert(srv.seen.last._2.contains("Bearer tok-7"))

      // the attached table IS the source: MOR deletes, partitions, stats
      val a = IceRead.table(spark, srcCat, "src")
      val b = IceRead.table(spark, dst, "clicks_local")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      assert(back.partitionSpec == Seq(PartitionField("grp")))
      // sketches were computed over the post-delete MOR view: 180 live ids
      assert(back.properties.get("stats.id.ndv").contains("180"))
      // partition pruning works on the attached table
      val q = b.filter(col("grp") === "g1")
      q.collect()
      val (total, kept) = graft.exec.GraftScan.pruneStats(q)
      assert(kept < total, s"attached table did not prune ($kept of $total)")
    } finally srv.stop()
  }

  test("metadata-location-only responses fall back to reading the file") {
    val (jsonPath, srcCat) = exportedFixture()
    val srv = new MockRestServer("", jsonPath, "acct1", None, embedMetadata = false)
    try {
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "t2", srv.uri,
        Seq("prod", "events"), "clicks")
      assert(IceRead.table(spark, dst, "t2").count() ==
        IceRead.table(spark, srcCat, "src").count())
    } finally srv.stop()
  }

  test("auth failures and unknown tables surface as clear errors") {
    val (jsonPath, _) = exportedFixture()
    val srv = new MockRestServer("{}", jsonPath, "acct1", Some("secret"),
      embedMetadata = true)
    try {
      val dst = freshCatalog()
      val e = intercept[IllegalArgumentException](
        IcebergRestImport.importTable(dst, "x", srv.uri,
          Seq("prod", "events"), "clicks", authToken = Some("WRONG")))
      assert(e.getMessage.contains("401"))
      val e2 = intercept[IllegalArgumentException](
        IcebergRestImport.importTable(dst, "x", srv.uri,
          Seq("prod", "events"), "nosuch", authToken = Some("secret")))
      assert(e2.getMessage.contains("HTTP"))
    } finally srv.stop()
  }
}
