package graft.meta

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Serves a graft catalog's tables over the public **Iceberg REST
  * catalog** read surface, so any spec-compliant Iceberg client
  * (engines, iceberg-rs — and therefore the reference itself) can load
  * them without knowing anything about this engine:
  *
  *  - `GET /v1/config` — prefix handshake;
  *  - `GET /v1/{prefix}/namespaces` / `.../namespaces/{ns}` — the single
  *    flat namespace this catalog models;
  *  - `GET /v1/{prefix}/namespaces/{ns}/tables` — table listing;
  *  - `GET /v1/{prefix}/namespaces/{ns}/tables/{t}` — LoadTableResult
  *    with the spec v2 metadata EMBEDDED (produced by [[IcebergExport]]
  *    on demand and cached per table version, so repeated loads of an
  *    unchanged table cost no re-export).
  *
  * READ-ONLY by design: writes stay with this engine's own commit path
  * (POSTs answer 405). v3-featured tables that cannot export faithfully
  * answer 409 with the exporter's reason instead of serving wrong
  * metadata. Optional bearer-token auth; [[IcebergRestImport]] is the
  * in-repo client, and the round trip through real sockets is the
  * contract test. */
final class IcebergRestServe(catalog: Catalog, namespace: String = "graft",
    prefix: String = "graft", bearerToken: Option[String] = None, port: Int = 0) {

  /** exported metadata (file path, JSON content) cached per
    * (table, version) — the path is served as `metadata-location`, so it
    * must be the actual `*.metadata.json` file, not its directory. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (String, String)]()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null)
  server.start()

  def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(msg: String, code: Int): (Int, String) =
    code -> JsonMethods.compact(JsonMethods.render(
      "error" -> (("message" -> msg) ~ ("type" -> "RESTException") ~ ("code" -> code))))

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getRawPath
    val (code, body): (Int, String) =
      if (bearerToken.exists(t => !Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains(s"Bearer $t")))
        err("not authorized", 401)
      else if (ex.getRequestMethod != "GET")
        err(s"${ex.getRequestMethod} not supported: this endpoint serves reads; " +
          "commits stay with the graft engine", 405)
      else if (path == "/v1/config")
        200 -> JsonMethods.compact(JsonMethods.render(
          ("defaults" -> JObject(Nil)) ~ ("overrides" -> ("prefix" -> prefix))))
      else if (path == s"/v1/$prefix/namespaces")
        200 -> JsonMethods.compact(JsonMethods.render(
          "namespaces" -> List(List(namespace))))
      else if (path == s"/v1/$prefix/namespaces/$namespace")
        200 -> JsonMethods.compact(JsonMethods.render(
          ("namespace" -> List(namespace)) ~ ("properties" -> JObject(Nil))))
      else if (path == s"/v1/$prefix/namespaces/$namespace/tables")
        200 -> JsonMethods.compact(JsonMethods.render(
          "identifiers" -> catalog.listTables.sorted.map(t =>
            ("namespace" -> List(namespace)) ~ ("name" -> t))))
      else path.stripPrefix(s"/v1/$prefix/namespaces/$namespace/tables/") match {
        case t if t.nonEmpty && !t.contains("/") && path.endsWith(s"/tables/$t") =>
          val table = java.net.URLDecoder.decode(t, java.nio.charset.StandardCharsets.UTF_8)
          if (!catalog.tableExists(table)) err(s"table $table not found", 404)
          else loadTableResult(table)
        case _ => err(s"no such route: $path", 404)
      }
    respond(ex, code, body)
  } catch {
    case e: Exception =>
      val (code, body) = err(Option(e.getMessage).getOrElse(e.toString), 500)
      respond(ex, code, body)
  }

  private def loadTableResult(table: String): (Int, String) = {
    val meta = catalog.loadTable(table)
    val (jsonPath, json) =
      try cache.computeIfAbsent((table, meta.version), _ => {
        val p = IcebergExport.exportIcebergMetadata(catalog, table)
        (p, MetaIO.readString(p))
      })
      catch {
        // v3 features the v2 wire cannot carry: refuse with the reason
        // rather than serving wrong metadata
        case e: IllegalArgumentException => return err(e.getMessage, 409)
      }
    // metadata-location is the exported *.metadata.json itself (spec
    // clients that honor it over the embedded copy must land on a real
    // file), and the whole response renders through json4s so paths with
    // quotes/backslashes stay valid JSON
    200 -> JsonMethods.compact(JsonMethods.render(
      ("metadata-location" -> jsonPath) ~
        ("metadata" -> JsonMethods.parse(json)) ~
        ("config" -> JObject(Nil))))
  }
}
