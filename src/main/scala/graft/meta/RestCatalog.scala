package graft.meta

import java.io.OutputStream
import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** REST-shaped catalog: the second [[Catalog]] implementation, proving the
  * seam the same way the reference's primary integration surface does — a
  * REST catalog service plus an object store
  * (integration-tests/testdata/docker-compose.yaml:22-62, harness
  * integration-tests/src/docker_compose.rs:48-80). Metadata travels as
  * JSON over HTTP; commits are optimistic CAS surfaced as HTTP 409 and
  * re-raised client-side as [[CommitConflictException]], so the
  * load-retry-commit loops in Compaction/IceWrite/Maintenance work
  * unchanged against either catalog.
  *
  * Protocol (modeled on the Iceberg REST catalog's shape):
  *  - `GET  /v1/config`                 -> `{"warehouse": "..."}` — where
  *    table files live (the object-store stand-in; executors write there
  *    directly, the catalog serves metadata only, as in a real deployment)
  *  - `GET  /v1/tables/{name}`          -> table metadata JSON | 404
  *  - `HEAD /v1/tables/{name}`          -> 200 | 404
  *  - `POST /v1/tables`                 -> create (body = metadata), 409 if exists
  *  - `POST /v1/tables/{name}/commit`   -> CAS commit; the expected base
  *    version rides the `X-Graft-Base-Version` header; 409 on conflict
  *  - `POST /v1/tables/{name}/rename`   -> metadata-only rename (body
  *    `{"to": name}`); same uuid/history/location, version continues
  *  - `DELETE /v1/tables/{name}`        -> drop (removes data too,
  *    including a renamed entry's original location)
  */
object RestCatalog {

  /** In-process catalog service. Metadata lives in server memory (not the
    * filesystem — deliberately unlike [[LocalCatalog]], so the seam is
    * proven against a genuinely different store); the warehouse directory
    * only holds table data files. */
  final class Server(val warehouse: String, port: Int = 0) {
    private val store = new ConcurrentHashMap[String, TableMetadata]()
    private val pool = Executors.newFixedThreadPool(8)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(pool)
    MetaIO.mkdirs(warehouse)

    server.createContext("/v1/", (ex: HttpExchange) => handle(ex))
    server.start()

    def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    def stop(): Unit = { server.stop(0); pool.shutdown() }

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
        if (bytes.nonEmpty) {
          val os: OutputStream = ex.getResponseBody
          try os.write(bytes) finally os.close()
        }
      }
      ex.close()
    }

    private def handle(ex: HttpExchange): Unit = try {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/").split("/").toList
      (ex.getRequestMethod, path) match {
        case ("GET", List("config")) =>
          respond(ex, 200, s"""{"warehouse": ${JsonMethods.compact(JString(warehouse))}}""")

        case ("GET", List("tables")) =>
          val names = store.keySet().asScala.toSeq.sorted
          respond(ex, 200, JsonMethods.compact(JArray(names.map(JString(_)).toList)))

        case ("GET" | "HEAD", List("tables", name)) =>
          store.get(name) match {
            case null => respond(ex, 404, s"""{"error": "table $name not found"}""")
            case m    => respond(ex, 200, MetadataJson.write(m))
          }

        case ("POST", List("tables")) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val meta = MetadataJson.read(body)
          val loc = MetaIO.join(warehouse, meta.name)
          val assigned = meta.copy(version = 1, location = loc)
          // a renamed-away entry keeps its data under its ORIGINAL root: a
          // new table adopting that path would interleave two tables' files
          // (and one's orphan sweep would delete the other's live data) —
          // same refusal LocalCatalog enforces via its rename marker
          val outcome = store.synchronized {
            if (store.values.asScala.exists(m => m.location == loc && m.name != meta.name))
              Left(409 -> s"location $loc holds the data of a renamed table — pick another name")
            else if (store.putIfAbsent(meta.name, assigned) != null)
              Left(409 -> s"table ${meta.name} already exists")
            else Right(assigned)
          }
          outcome match {
            case Left((c, msg)) => respond(ex, c, s"""{"error": "$msg"}""")
            case Right(a) =>
              MetaIO.mkdirs(MetaIO.join(warehouse, meta.name, "data"))
              respond(ex, 201, MetadataJson.write(a))
          }

        case ("POST", List("tables", name, "commit")) =>
          val baseVersion = Option(ex.getRequestHeaders.getFirst("X-Graft-Base-Version"))
            .map(_.toInt).getOrElse(-1)
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          // the CAS: atomically advance name's metadata iff the stored
          // version is still the one the writer planned against. The body
          // is either full metadata or a cross-version DELTA against the
          // base version (the O(change) wire shape — like the Iceberg
          // REST protocol's update-list commits); a delta resolves against
          // the server's stored copy INSIDE the same atomic compute.
          val parsed = MetadataJson.parseValue(body) // ONE parse per request
          var outcome: Either[Int, TableMetadata] = Left(404)
          store.compute(name, (_, cur) =>
            if (cur == null) { outcome = Left(404); cur }
            else if (cur.version != baseVersion) { outcome = Left(409); cur }
            else {
              val updated =
                if (MetadataJson.isDelta(parsed)) {
                  require(MetadataJson.deltaBaseVersion(parsed) == cur.version,
                    s"delta base ${MetadataJson.deltaBaseVersion(parsed)} != stored ${cur.version}")
                  MetadataJson.readDelta(parsed, cur)
                } else MetadataJson.readValue(parsed)
              val next = updated.copy(version = cur.version + 1)
              outcome = Right(next); next
            })
          outcome match {
            // O(change) BOTH ways: the client already holds the committed
            // content (it sent it) — only the assigned version returns,
            // never a re-serialization of the full snapshot chain
            case Right(next) => respond(ex, 200, s"""{"version": ${next.version}}""")
            case Left(404) => respond(ex, 404, s"""{"error": "table $name not found"}""")
            case Left(_) => respond(ex, 409,
              s"""{"error": "table $name: commit base version $baseVersion is stale"}""")
          }

        case ("POST", List("tables", name, "rename")) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          JsonMethods.parse(body) \ "to" match {
            case JString(to) if to.nonEmpty =>
              // two-key atomicity via a coarse lock — renames are rare
              // operator actions, and the in-memory store makes the
              // critical section a couple of map ops
              val out = store.synchronized {
                val cur = store.get(name)
                if (cur == null) Left(404 -> s"table $name not found")
                else if (store.containsKey(to)) Left(409 -> s"table $to already exists")
                else {
                  // metadata-only: the LOCATION stays (data in place);
                  // the version counter continues so client CAS loops
                  // never see a version reused across the rename
                  val renamed = cur.copy(name = to, version = cur.version + 1)
                  store.put(to, renamed); store.remove(name)
                  Right(renamed)
                }
              }
              out match {
                case Right(m) => respond(ex, 200, MetadataJson.write(m))
                case Left((c, msg)) => respond(ex, c, s"""{"error": "$msg"}""")
              }
            case _ => respond(ex, 400, """{"error": "rename needs {\"to\": name}"}""")
          }

        case ("DELETE", List("tables", name)) =>
          store.synchronized { Option(store.remove(name)) } match {
            case None =>
              // drop of a NONEXISTENT entry deletes NOTHING: after a
              // rename a->b the path warehouse/a still holds b's live
              // data, and a stale-name delete (an idempotent retry)
              // reaching the filesystem would destroy it
              respond(ex, 404, s"""{"error": "table $name not found"}""")
            case Some(cur) =>
              // the entry OWNS its location (possibly its pre-rename
              // root); the name-root is reclaimed only when no surviving
              // entry's location is that path
              if (MetaIO.exists(cur.location)) MetaIO.deleteRecursive(cur.location)
              val root = MetaIO.join(warehouse, name)
              if (root != cur.location && MetaIO.exists(root) &&
                  !store.values.asScala.exists(_.location == root))
                MetaIO.deleteRecursive(root)
              respond(ex, 204, "")
          }

        case _ => respond(ex, 400, s"""{"error": "unsupported route"}""")
      }
    } catch {
      case e: Throwable => respond(ex, 500, s"""{"error": "${e.getMessage}"}""")
    }
  }

  /** HTTP client face of the catalog. Stateless aside from the cached
    * `/v1/config` warehouse; every operation is one request. */
  final class Client(baseUri: String) extends Catalog {
    private val http = HttpClient.newHttpClient()

    private def req(path: String): HttpRequest.Builder =
      HttpRequest.newBuilder(URI.create(s"$baseUri$path"))

    private def send(r: HttpRequest): HttpResponse[String] =
      http.send(r, HttpResponse.BodyHandlers.ofString())

    lazy val warehouse: String = {
      val resp = send(req("/v1/config").GET().build())
      require(resp.statusCode == 200, s"catalog config failed: ${resp.body}")
      JsonMethods.parse(resp.body) \ "warehouse" match {
        case JString(w) => w
        case other => sys.error(s"bad config response: $other")
      }
    }

    def tableLocation(name: String): String = MetaIO.join(warehouse, name)
    def dataDir(name: String): String = MetaIO.join(warehouse, name, "data")

    override def tableExists(name: String): Boolean =
      send(req(s"/v1/tables/$name").method("HEAD", HttpRequest.BodyPublishers.noBody())
        .build()).statusCode == 200

    override def createTable(meta: TableMetadata): TableMetadata = {
      val resp = send(req("/v1/tables")
        .POST(HttpRequest.BodyPublishers.ofString(
          MetadataJson.write(TableMetadata.withStableUuid(meta)))).build())
      require(resp.statusCode == 201, s"createTable ${meta.name} failed: ${resp.body}")
      MetadataJson.read(resp.body)
    }

    override def loadTable(name: String): TableMetadata = {
      val resp = send(req(s"/v1/tables/$name").GET().build())
      require(resp.statusCode == 200, s"table $name does not exist")
      MetadataJson.read(resp.body)
    }

    override def commit(base: TableMetadata, updated: TableMetadata): TableMetadata = {
      // O(change) wire shape: send the cross-version delta when the
      // evolution is delta-expressible (all of this engine's commit
      // paths), full metadata otherwise — at 10^6 tracked files the
      // difference between KBs and hundreds of MBs per commit
      val body = MetadataJson
        .writeDelta(base, updated.copy(version = base.version))
        .getOrElse(MetadataJson.write(updated))
      val resp = send(req(s"/v1/tables/${base.name}/commit")
        .header("X-Graft-Base-Version", base.version.toString)
        .POST(HttpRequest.BodyPublishers.ofString(body)).build())
      resp.statusCode match {
        case 200 =>
          // the response carries only the assigned version; the committed
          // content is what this client sent (CAS guarantees the server
          // resolved the delta against content-identical base state)
          val v = JsonMethods.parse(resp.body) \ "version" match {
            case JInt(x) => x.toInt
            case other => sys.error(s"bad commit response: $other")
          }
          updated.copy(version = v)
        case 409 => throw new CommitConflictException(
          s"table ${base.name}: version ${base.version + 1} was committed concurrently")
        case c => sys.error(s"commit ${base.name} failed ($c): ${resp.body}")
      }
    }

    override def dropTable(name: String): Unit = {
      send(req(s"/v1/tables/$name").DELETE().build()): Unit
    }

    override def renameTable(from: String, to: String): TableMetadata = {
      val resp = send(req(s"/v1/tables/$from/rename")
        .POST(HttpRequest.BodyPublishers.ofString(JsonMethods.compact(
          JsonMethods.render(JObject("to" -> JString(to)))))).build())
      resp.statusCode match {
        case 200 => MetadataJson.read(resp.body)
        case 404 => throw new IllegalArgumentException(s"table $from does not exist")
        case 409 => throw new IllegalArgumentException(s"table $to already exists")
        case c => sys.error(s"rename $from -> $to failed ($c): ${resp.body}")
      }
    }

    override def listTables: Seq[String] = {
      val resp = send(req("/v1/tables").GET().build())
      require(resp.statusCode == 200, s"listTables failed: ${resp.body}")
      JsonMethods.parse(resp.body) match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case other => sys.error(s"bad listTables response: $other")
      }
    }
  }
}
