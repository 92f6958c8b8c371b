package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** WRITE-side client for the **Iceberg REST catalog** commit endpoint —
  * the other half of [[IcebergRestImport]]'s switch-engines loop: append
  * pre-written parquet data files to a table served by ANY spec
  * catalog (including [[IcebergRestServe]]) exactly the way a
  * conforming engine does it:
  *
  *  1. `GET .../tables/{t}` — load the table (metadata, uuid, head);
  *  2. write a spec manifest for the new files and a manifest LIST that
  *     carries the head's manifests plus the new one (both on shared
  *     storage, next to the data);
  *  3. `POST .../tables/{t}` with `assert-table-uuid` +
  *     `assert-ref-snapshot-id(main)` requirements and `add-snapshot` +
  *     `set-snapshot-ref` updates;
  *  4. on 409 (someone committed in between) reload and REBUILD from the
  *     new head — the spec's optimistic-concurrency loop.
  *
  * Scope: append-only data commits (the conservative shape
  * [[IcebergRestServe]] accepts); unpartitioned tables or partitions
  * whose values the caller supplies as graft literal strings. Stats are
  * omitted from the client-written manifest (spec-optional) — the
  * serving engine keeps its own zone maps for files it wrote and simply
  * doesn't prune on the appended ones. */
object IcebergRestCommit {

  /** One pre-written parquet data file to register. `partitionValues`
    * uses graft's literal forms (day strings for dates, floor multiples
    * for truncate, ordinals for bucket), keyed by SOURCE column name. */
  final case class AddedFile(path: String, sizeInBytes: Long, recordCount: Long,
      partitionValues: Map[String, String] = Map.empty)

  private val http = HttpClient.newHttpClient()

  private def send(b: HttpRequest.Builder, authToken: Option[String]): HttpResponse[String] = {
    authToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.header("Accept", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())
  }

  import IcebergImport.{arr, lng, str}

  /** Appends `files` to `namespace.table` on the catalog at `uri` and
    * returns the snapshot id the commit published. `stagingDir` receives
    * the client-written manifest + manifest list (must be readable by
    * the serving engine — same shared storage as the data files). */
  def appendFiles(uri: String, namespace: Seq[String], table: String,
      files: Seq[AddedFile], stagingDir: String,
      authToken: Option[String] = None, prefix: Option[String] = None,
      maxRetries: Int = 3): Long = {
    require(files.nonEmpty, "appendFiles: no files given")
    val route = IcebergRestImport.tableRoute(uri,
      prefix.getOrElse(IcebergRestImport.resolvePrefix(uri, authToken)),
      namespace, table)

    var attempt = 0
    while (true) {
      // ---- 1. load
      val load = send(HttpRequest.newBuilder(URI.create(route)).GET(), authToken)
      require(load.statusCode() == 200,
        s"load $route failed: HTTP ${load.statusCode()} ${load.body().take(300)}")
      val m = JsonMethods.parse(load.body()) \ "metadata"
      val fv = lng(m \ "format-version").toInt
      val uuid = str(m \ "table-uuid")
      val lastSeq = lng(m \ "last-sequence-number")
      val curId = (m \ "current-snapshot-id") match {
        case JNothing | JNull => None
        case v => Some(lng(v)).filter(_ != -1L)
      }
      val snapIds = arr(m \ "snapshots").map(s => lng(s \ "snapshot-id"))
      val newSnapId = (snapIds :+ 0L).max + 1
      val newSeq = lastSeq + 1

      // ---- the table's schema + default spec, in manifest layout
      val schemaJ = arr(m \ "schemas").find(s =>
        lng(s \ "schema-id") == lng(m \ "current-schema-id")).getOrElse(
        sys.error("no current schema in loaded metadata"))
      val schemaFields = arr(schemaJ \ "fields").map { f =>
        SchemaField(lng(f \ "id").toInt, str(f \ "name"),
          IcebergImport.ddlOf(f \ "type"), nullable = (f \ "required") != JBool(true))
      }
      val byId = schemaFields.map(f => f.id -> f).toMap
      val defaultSpecId = lng(m \ "default-spec-id").toInt
      val specJ = arr(m \ "partition-specs").find(s =>
        lng(s \ "spec-id") == defaultSpecId).getOrElse(
        sys.error("no default partition spec in loaded metadata"))
      val specFields = arr(specJ \ "fields").map { f =>
        val src = byId(lng(f \ "source-id").toInt)
        (PartitionField(src.name, str(f \ "transform")), lng(f \ "field-id").toInt)
      }
      val clientMeta = TableMetadata("rest-client", "", schema = schemaFields,
        partitionSpec = specFields.map(_._1))
      val idOf = specFields.toMap
      val mSchema = new Schema.Parser().parse(IcebergExport.manifestSchemaJsonFor(
        clientMeta, specFields.map(_._1), idOf, fv))

      // ---- 2a. the new manifest (ADDED data entries, explicit sequences).
      // UUID-named like any Iceberg writer's metadata files: two clients
      // racing the same head would otherwise write the SAME staging path
      // (both compute the same next snapshot id) and tear each other's avro
      val tag = java.util.UUID.randomUUID().toString.take(12)
      val records = files.map { f =>
        val dfSchema = mSchema.getField("data_file").schema()
        val part = new GenericData.Record(dfSchema.getField("partition").schema())
        specFields.foreach { case (p, _) =>
          part.put(IcebergExport.partFieldName(p),
            IcebergExport.partitionValue(clientMeta, p, f.partitionValues.get(p.column)))
        }
        val df = new GenericData.Record(dfSchema)
        df.put("content", Integer.valueOf(0))
        df.put("file_path", f.path)
        df.put("file_format", "PARQUET")
        df.put("partition", part)
        df.put("record_count", java.lang.Long.valueOf(f.recordCount))
        df.put("file_size_in_bytes", java.lang.Long.valueOf(f.sizeInBytes))
        val e = new GenericData.Record(mSchema)
        e.put("status", Integer.valueOf(1)) // ADDED
        e.put("snapshot_id", java.lang.Long.valueOf(newSnapId))
        e.put("sequence_number", java.lang.Long.valueOf(newSeq))
        e.put("file_sequence_number", java.lang.Long.valueOf(newSeq))
        e.put("data_file", df)
        e
      }
      val mPath = MetaIO.join(stagingDir, s"client-$tag-m0.avro")
      // the manifest is written against the table's DEFAULT spec, and
      // must say so — a catalog whose default-spec-id != 0 (any table
      // that evolved its partition spec) would otherwise have readers
      // decode the partition struct with the wrong spec's fields
      val mLen = IcebergExport.avroWrite(mPath, mSchema, Map(
        "schema" -> JsonMethods.compact(JsonMethods.render(schemaJ)),
        "partition-spec" -> JsonMethods.compact(JsonMethods.render(specJ \ "fields")),
        "partition-spec-id" -> defaultSpecId.toString,
        "format-version" -> fv.toString,
        "content" -> "data"), records)

      // ---- 2b. the new manifest LIST: the head's entries carried over
      // (copied field-by-field into our list schema) plus the new one
      val listSchema = new Schema.Parser().parse(
        IcebergExport.manifestListSchemaJsonV(fv))
      val carried: Seq[GenericData.Record] = curId.toSeq.flatMap { id =>
        val headList = arr(m \ "snapshots").find(s => lng(s \ "snapshot-id") == id)
          .map(s => str(s \ "manifest-list")).getOrElse(
            sys.error(s"current snapshot $id missing from loaded metadata"))
        IcebergExport.readAvro(headList)._1.map { old =>
          val rec = new GenericData.Record(listSchema)
          import scala.jdk.CollectionConverters._
          listSchema.getFields.asScala.foreach { f =>
            if (old.getSchema.getField(f.name) != null) rec.put(f.name, old.get(f.name))
          }
          rec
        }
      }
      val le = new GenericData.Record(listSchema)
      le.put("manifest_path", mPath)
      le.put("manifest_length", java.lang.Long.valueOf(mLen))
      le.put("partition_spec_id", Integer.valueOf(defaultSpecId))
      le.put("content", Integer.valueOf(0))
      le.put("sequence_number", java.lang.Long.valueOf(newSeq))
      le.put("min_sequence_number", java.lang.Long.valueOf(newSeq))
      le.put("added_snapshot_id", java.lang.Long.valueOf(newSnapId))
      le.put("added_files_count", Integer.valueOf(files.size))
      le.put("existing_files_count", Integer.valueOf(0))
      le.put("deleted_files_count", Integer.valueOf(0))
      le.put("added_rows_count", java.lang.Long.valueOf(files.map(_.recordCount).sum))
      le.put("existing_rows_count", java.lang.Long.valueOf(0L))
      le.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      val listPath = MetaIO.join(stagingDir, s"client-snap-$tag.avro")
      IcebergExport.avroWrite(listPath, listSchema, Map(
        "format-version" -> fv.toString,
        "snapshot-id" -> newSnapId.toString,
        "sequence-number" -> newSeq.toString,
        "parent-snapshot-id" -> curId.map(_.toString).getOrElse("null")),
        carried :+ le)

      // ---- 3. commit. The summary carries a per-attempt marker: servers
      // that re-render metadata (graft re-exports its own manifest lists)
      // keep summary keys verbatim, so the marker is how a failed-looking
      // commit can be CHECKED for having actually applied (below)
      val snapshotJ: JValue =
        ("snapshot-id" -> newSnapId) ~
          ("parent-snapshot-id" -> curId) ~
          ("sequence-number" -> newSeq) ~
          ("timestamp-ms" -> System.currentTimeMillis()) ~
          ("manifest-list" -> listPath) ~
          ("summary" -> (("operation" -> "append") ~
            ("graft.commit-uuid" -> tag): JValue)) ~
          ("schema-id" -> lng(m \ "current-schema-id"))
      val reqJ: JValue =
        ("identifier" -> (("namespace" -> namespace) ~ ("name" -> table))) ~
          ("requirements" -> List[JValue](
            ("type" -> "assert-table-uuid") ~ ("uuid" -> uuid),
            ("type" -> "assert-ref-snapshot-id") ~ ("ref" -> "main") ~
              ("snapshot-id" -> curId))) ~
          ("updates" -> List[JValue](
            ("action" -> "add-snapshot") ~ ("snapshot" -> snapshotJ),
            ("action" -> "set-snapshot-ref") ~ ("ref-name" -> "main") ~
              ("type" -> "branch") ~ ("snapshot-id" -> newSnapId)))
      val resp = send(HttpRequest.newBuilder(URI.create(route))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          JsonMethods.compact(JsonMethods.render(reqJ)))), authToken)
      resp.statusCode() match {
        case 200 => return newSnapId
        case code =>
          // A non-200 does NOT prove the commit was not applied: a server
          // can commit first and only then fail rendering the response
          // (graft's own endpoint 409s a v3-wire export refusal AFTER the
          // CAS), and catalogs behind proxies can answer 5xx post-apply.
          // Deleting the staged avro then would leave the COMMITTED
          // snapshot referencing dead files — table corruption. So:
          // reload and look for this attempt's unique marker before
          // touching the staged files (Iceberg's CommitStateUnknown
          // handling); delete only on a PROVEN no-apply.
          val applied: Option[Boolean] =
            try {
              val re = send(HttpRequest.newBuilder(URI.create(route)).GET(), authToken)
              if (re.statusCode() != 200) None
              else Some(arr(JsonMethods.parse(re.body()) \ "metadata" \ "snapshots")
                .exists(s => (s \ "manifest-list") == JString(listPath) ||
                  (s \ "summary" \ "graft.commit-uuid") == JString(tag)))
            } catch { case scala.util.control.NonFatal(_) => None }
          applied match {
            case Some(true) =>
              // applied despite the error answer — the commit IS durable
              return newSnapId
            case Some(false) if code == 409 && attempt < maxRetries =>
              // someone moved the head — reload and rebuild. The losing
              // attempt's staged avro is referenced by NOTHING (the
              // table's orphan sweep never visits a foreign staging
              // dir), so delete it rather than leak two files per race
              MetaIO.delete(mPath); MetaIO.delete(listPath)
              attempt += 1
            case Some(false) =>
              MetaIO.delete(mPath); MetaIO.delete(listPath)
              sys.error(s"commit $route failed: HTTP $code ${resp.body().take(500)}")
            case None =>
              // commit state UNKNOWN (the follow-up load failed too):
              // keep the staged files — orphans are recoverable, a
              // committed snapshot over deleted files is not
              sys.error(s"commit $route failed with HTTP $code and the " +
                "follow-up load could not determine whether it applied — " +
                s"staged files kept: $mPath, $listPath. ${resp.body().take(300)}")
          }
      }
    }
    sys.error("unreachable")
  }
}
