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
  *    with the spec metadata EMBEDDED (produced by [[IcebergExport]]
  *    on demand and cached per table version, so repeated loads of an
  *    unchanged table cost no re-export);
  *  - `POST /v1/{prefix}/namespaces/{ns}/tables/{t}` — the spec COMMIT
  *    endpoint: requirements (`assert-ref-snapshot-id`,
  *    `assert-table-uuid`) validate against the live graft state and
  *    answer 409 on staleness (the spec's retry signal); updates
  *    (`add-snapshot` + `set-snapshot-ref`, `set-properties`/
  *    `remove-properties`) map onto graft's own CAS commit. An added
  *    snapshot's manifest list — written by the client on shared
  *    storage — is decoded with the import machinery and must be
  *    APPEND-SHAPED on top of the current head (REST writers get the
  *    same conservative contract as `cherrypick`); on v3 tables the
  *    server assigns row lineage from the table's next-row-id cursor.
  *
  * Other mutations (CREATE/DROP over REST) stay with this engine and
  * answer 405. Optional bearer-token auth; [[IcebergRestImport]] /
  * [[IcebergRestCommit]] are the in-repo clients, and the round trip
  * through real sockets is the contract test. */
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
      else if (ex.getRequestMethod == "POST" &&
          path.startsWith(s"/v1/$prefix/namespaces/$namespace/tables/") &&
          !path.stripPrefix(s"/v1/$prefix/namespaces/$namespace/tables/").contains("/")) {
        val t = java.net.URLDecoder.decode(
          path.stripPrefix(s"/v1/$prefix/namespaces/$namespace/tables/"),
          java.nio.charset.StandardCharsets.UTF_8)
        val body = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        if (!catalog.tableExists(t)) err(s"table $t not found", 404)
        else commitTable(t, body)
      }
      else if (ex.getRequestMethod == "HEAD" &&
          path.startsWith(s"/v1/$prefix/namespaces/$namespace/tables/") &&
          !path.stripPrefix(s"/v1/$prefix/namespaces/$namespace/tables/").contains("/")) {
        // spec table-existence check: status only, no body
        val t = java.net.URLDecoder.decode(
          path.stripPrefix(s"/v1/$prefix/namespaces/$namespace/tables/"),
          java.nio.charset.StandardCharsets.UTF_8)
        (if (catalog.tableExists(t)) 204 else 404) -> ""
      }
      else if (ex.getRequestMethod != "GET")
        err(s"${ex.getRequestMethod} not supported: reads plus the table " +
          "commit endpoint; other mutations stay with the graft engine", 405)
      else if (path == "/v1/config")
        // the spec capability list: clients discover that this server
        // takes table COMMITS as well as reads
        200 -> JsonMethods.compact(JsonMethods.render(
          ("defaults" -> JObject(Nil)) ~ ("overrides" -> ("prefix" -> prefix)) ~
            ("endpoints" -> List(
              "GET /v1/config",
              "GET /v1/{prefix}/namespaces",
              "GET /v1/{prefix}/namespaces/{namespace}",
              "GET /v1/{prefix}/namespaces/{namespace}/tables",
              "GET /v1/{prefix}/namespaces/{namespace}/tables/{table}",
              "HEAD /v1/{prefix}/namespaces/{namespace}/tables/{table}",
              "POST /v1/{prefix}/namespaces/{namespace}/tables/{table}"))))
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

  /** The table-uuid the CURRENT version serves (exports mint one per
    * version) — what `assert-table-uuid` requirements check against. */
  private def servedUuid(table: String, meta: TableMetadata): Option[String] =
    try {
      val (_, json) = cache.computeIfAbsent((table, meta.version), _ => {
        val p = IcebergExport.exportIcebergMetadata(catalog, table)
        (p, MetaIO.readString(p))
      })
      JsonMethods.parse(json) \ "table-uuid" match {
        case JString(u) => Some(u); case _ => None
      }
    } catch { case _: IllegalArgumentException => None }

  private def lng(j: JValue): Long = j match {
    case JInt(x) => x.toLong; case JLong(x) => x
    case other => sys.error(s"expected number, got $other")
  }
  private def str(j: JValue): String = j match {
    case JString(s) => s; case other => sys.error(s"expected string, got $other")
  }

  /** `POST .../tables/{t}`: the spec CommitTableRequest. */
  private def commitTable(table: String, body: String): (Int, String) = {
    val req = JsonMethods.parse(body)
    val meta = catalog.loadTable(table)

    // ---- requirements: each validates against the LIVE state; failures
    // answer 409, the spec's "reload and retry" signal
    val reqList = (req \ "requirements") match {
      case JArray(xs) => xs; case JNothing | JNull => Nil
      case o => return err(s"bad requirements: $o", 400)
    }
    reqList.foreach { r =>
      (r \ "type") match {
        case JString("assert-ref-snapshot-id") =>
          val ref = str(r \ "ref")
          val want = (r \ "snapshot-id") match {
            case JNothing | JNull => None; case v => Some(lng(v))
          }
          val have = meta.refs.get(ref).orElse(meta.tags.get(ref))
          if (want != have)
            return err(s"requirement failed: ref $ref is at " +
              s"${have.getOrElse("absent")}, client expected ${want.getOrElse("absent")}", 409)
        case JString("assert-table-uuid") =>
          val served = servedUuid(table, meta)
          if (!served.contains(str(r \ "uuid")))
            return err(s"requirement failed: table uuid changed (now " +
              s"${served.getOrElse("unavailable")}) — reload and retry", 409)
        case JString(t) => return err(s"unsupported requirement: $t", 400)
        case o => return err(s"bad requirement: $o", 400)
      }
    }

    // ---- updates
    var properties = meta.properties
    var addSnap: Option[(Long, String, Map[String, String])] = None
    var setRefs: Seq[(String, String, Long)] = Nil
    val updList = (req \ "updates") match {
      case JArray(xs) => xs; case JNothing | JNull => Nil
      case o => return err(s"bad updates: $o", 400)
    }
    updList.foreach { u =>
      (u \ "action") match {
        case JString("add-snapshot") =>
          val s = u \ "snapshot"
          if (addSnap.nonEmpty) return err("multiple add-snapshot updates", 400)
          addSnap = Some((lng(s \ "snapshot-id"), str(s \ "manifest-list"),
            (s \ "summary") match {
              case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
              case _ => Map.empty[String, String]
            }))
        case JString("set-snapshot-ref") =>
          setRefs :+= ((str(u \ "ref-name"),
            (u \ "type") match { case JString(t) => t; case _ => "branch" },
            lng(u \ "snapshot-id")))
        case JString("set-properties") =>
          (u \ "updates") match {
            case JObject(kv) =>
              properties ++= kv.collect { case (k, JString(v)) => k -> v }
            case o => return err(s"bad set-properties: $o", 400)
          }
        case JString("remove-properties") =>
          (u \ "removals") match {
            case JArray(ks) => properties --= ks.collect { case JString(k) => k }
            case o => return err(s"bad remove-properties: $o", 400)
          }
        case JString(a) => return err(s"unsupported update: $a", 400)
        case o => return err(s"bad update: $o", 400)
      }
    }

    // ---- build the new snapshot from the client-written manifest list
    val (snapOpt, nextRowIdAfter): (Option[Snapshot], Long) = addSnap match {
      case None => (None, meta.nextRowId)
      case Some((snapId, listPath, summary)) =>
        if (meta.snapshots.exists(_.snapshotId == snapId))
          return err(s"snapshot id $snapId already exists", 409)
        val entries =
          try IcebergImport.decodeManifestListForTable(meta, listPath)
          catch { case e: Exception =>
            return err(s"cannot decode manifest list $listPath: ${e.getMessage}", 400) }
        val headManifest = meta.currentSnapshot.map(_.manifest).getOrElse(Nil)
        val headKeys = headManifest.map(_.resolutionKey).toSet
        val newKeys = entries.map(_.resolutionKey).toSet
        // append-shaped only: every live file still present, additions are
        // plain data files that exist on storage
        if (!headKeys.subsetOf(newKeys))
          return err("commit removes files from the current snapshot — only " +
            "append-shaped commits are accepted over REST", 400)
        val added = entries.filterNot(f => headKeys.contains(f.resolutionKey))
        if (added.isEmpty)
          return err("add-snapshot carries no new files", 400)
        if (!added.forall(_.content == FileContent.Data))
          return err("only data-file appends are accepted over REST (delete " +
            "files change MOR semantics and stay with the owning engine)", 400)
        added.find(f => !MetaIO.exists(f.path)).foreach(f =>
          return err(s"added data file does not exist: ${f.path}", 400))
        val newSeq = meta.lastSequenceNumber + 1
        // server-side row lineage on v3 tables: ids come from THIS table's
        // cursor, whatever the client proposed
        var cursor = meta.nextRowId
        val stamped = added.map { f =>
          val s = f.copy(sequenceNumber = newSeq,
            firstRowId = if (meta.formatVersion >= 3) Some(cursor) else None)
          if (meta.formatVersion >= 3) cursor += f.recordCount
          s
        }
        val snap = Snapshot(snapId, meta.currentSnapshotId, newSeq,
          System.currentTimeMillis(), headManifest ++ stamped,
          meta.currentSnapshot.map(s => TableMetadata.preservedProperties(s.summary))
            .getOrElse(Map.empty) ++
            TableMetadata.computedSummary(headManifest, headManifest ++ stamped) ++
            summary + ("operation" -> summary.getOrElse("operation", "append")))
        (Some(snap), cursor)
    }
    setRefs.find { case (_, _, id) =>
      !meta.snapshots.exists(_.snapshotId == id) && !snapOpt.exists(_.snapshotId == id)
    }.foreach { case (name, _, id) =>
      return err(s"set-snapshot-ref $name: no snapshot $id", 400)
    }

    val updated0 = meta.copy(
      snapshots = meta.snapshots ++ snapOpt.toSeq,
      lastSequenceNumber = snapOpt.map(_.sequenceNumber)
        .getOrElse(meta.lastSequenceNumber),
      nextRowId = nextRowIdAfter,
      properties = properties)
    val updated = setRefs.foldLeft(updated0) { case (m, (name, typ, id)) =>
      if (typ == "tag") m.copy(tags = m.tags + (name -> id))
      else if (name == "main")
        m.copy(refs = m.refs + (name -> id), currentSnapshotId = Some(id))
      else m.copy(refs = m.refs + (name -> id))
    }
    try catalog.commit(meta, updated)
    catch {
      case _: CommitConflictException =>
        return err("concurrent commit — reload and retry", 409)
    }
    loadTableResult(table)
  }
}
