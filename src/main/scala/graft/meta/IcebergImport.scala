package graft.meta

import org.json4s._
import org.json4s.jackson.JsonMethods

/** ONE-WAY import of an Apache Iceberg format-v2/v3 table's metadata into a
  * graft catalog — the inverse of [[IcebergExport]]: the spec's
  * table-metadata JSON, manifest lists, and manifest files (all public
  * Iceberg table-spec layouts) are read back into graft's native model
  * and registered as a new table. Data files are NOT copied — the
  * imported table references the existing parquet in place, so switching
  * an Iceberg table to this engine costs one metadata read per manifest
  * and one catalog commit, regardless of data size.
  *
  * Supported: formats v2 AND v3 — v3 deletion vectors (content=1 entries
  * naming a Puffin `deletion-vector-v1` blob by referenced data file +
  * byte range) map onto graft's native DV model, row lineage imports
  * with the spec's first_row_id inheritance (explicit per-file values,
  * else manifest first_row_id + preceding added record counts) and the
  * `next-row-id` cursor, and schema `initial-default` values land in
  * graft's initial-default slot; parquet data files; data +
  * position-delete + equality-delete content; ADDED/EXISTING entries with the spec's
  * sequence-number inheritance (a null sequence on an ADDED entry
  * inherits the manifest-list sequence); identity and bucket[n] partition
  * transforms; PARTITION-SPEC EVOLUTION — each manifest decodes its
  * partition struct with the spec named by its manifest-list
  * `partition_spec_id`, files record which spec they were written under
  * ([[FileEntry.specId]], graft-relative: default spec = 0), and a spec
  * is validated only when some manifest actually references it; branch
  * and tag refs; per-file `lower_bounds`/`upper_bounds`/
  * `null_value_counts` (when the foreign writer recorded them) decode
  * back into graft's manifest zone maps, so imported tables keep
  * manifest-level file skipping with zero footer reads. Refused with
  * clear errors: format v3, non-parquet file formats, genuinely
  * unconvertible transforms on a REFERENCED spec. DELETED status
  * entries are skipped (they are history bookkeeping, not state).
  *
  * Iceberg-written parquet always carries field ids (spec requirement),
  * so imported entries stay ID-addressed — renames remain safe. */
object IcebergImport {

  // strict JValue coercers, shared by the whole REST/import surface
  // ([[IcebergRestServe]], [[IcebergRestCommit]]) — one place to extend
  // if a server ever answers JDecimal/JDouble for an integral field
  private[meta] def str(j: JValue): String = j match {
    case JString(s) => s; case other => sys.error(s"expected string, got $other")
  }
  private[meta] def lng(j: JValue): Long = j match {
    case JInt(x) => x.toLong; case JLong(x) => x
    case other => sys.error(s"expected number, got $other")
  }
  private[meta] def arr(j: JValue): List[JValue] = j match {
    case JArray(xs) => xs; case JNothing => Nil
    case other => sys.error(s"expected array, got $other")
  }

  /** Inverse of [[IcebergExport.boundBytes]]: one Appendix-D
    * single-value bound back to graft's decimal-string zone-map form
    * (timestamps stay micros, dates stay day ordinals — the same domain
    * the footer collector records, so [[FileEntry.mayContainRange]]
    * comparisons are uniform). Types without a numeric zone-map form
    * return None and the bound is ignored. */
  private[meta] def boundDecode(ddl: String, bytes: java.nio.ByteBuffer): Option[String] = {
    import java.nio.ByteOrder
    val b = bytes.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val t = ddl.trim.toUpperCase
    try t match {
      case "INT" | "INTEGER" | "SMALLINT" | "TINYINT" | "DATE" if b.remaining == 4 =>
        Some(b.getInt.toString)
      case "BIGINT" | "LONG" | "TIMESTAMP" | "TIMESTAMP_NTZ" if b.remaining == 8 =>
        Some(b.getLong.toString)
      case "FLOAT" | "REAL" if b.remaining == 4 =>
        Some(BigDecimal(b.getFloat.toString).toString)
      case "DOUBLE" if b.remaining == 8 =>
        Some(BigDecimal(b.getDouble.toString).toString)
      case dec if dec.startsWith("DECIMAL") =>
        val arr = new Array[Byte](b.remaining); b.get(arr)
        Some(BigInt(arr).toString)
      // string bounds are UTF-8 (Appendix D); spec-truncated bounds stay
      // VALID bounds, which pruning tolerates. Same 64-byte cap as the
      // footer collector; startsWith matches VARCHAR(n)/CHAR(n) like the
      // export side does.
      case s if (s == "STRING" || s.startsWith("VARCHAR") || s.startsWith("CHAR")) &&
          b.remaining <= 64 =>
        val arr = new Array[Byte](b.remaining); b.get(arr)
        Some(new String(arr, java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    } catch { case _: NumberFormatException => None }
  }

  /** A manifest kv-map field ([[IcebergExport.kvMapType]]'s array-of-
    * key/value-records encoding) decoded to field-id -> value. */
  private def kvMapOf(df: org.apache.avro.generic.GenericRecord,
      field: String): Map[Int, AnyRef] =
    (if (df.getSchema.getField(field) == null) None else Option(df.get(field)))
      .map { arr =>
        import scala.jdk.CollectionConverters._
        arr.asInstanceOf[java.util.Collection[AnyRef]].asScala.map { e =>
          val r = e.asInstanceOf[org.apache.avro.generic.GenericRecord]
          r.get("key").asInstanceOf[Int] -> r.get("value")
        }.toMap
      }.getOrElse(Map.empty)

  /** Inverse of [[IcebergExport.defaultJsonValue]]: a spec JSON
    * single-value default back to the SQL literal text graft stores in
    * [[SchemaField.initialDefault]]. Unsupported shapes import as no
    * default (spec-optional — the column just reads NULL-filled). */
  private[meta] def defaultSqlOf(ddl: String, j: JValue): Option[String] = {
    val t = ddl.trim.toUpperCase
    j match {
      case JNothing | JNull => None
      case JBool(b) => Some(b.toString)
      case JInt(n) => Some(n.toString)
      case JLong(n) => Some(n.toString)
      case JDouble(d) if t == "DOUBLE" => Some(s"CAST($d AS DOUBLE)")
      case JDouble(d) if t == "FLOAT" || t == "REAL" => Some(s"CAST($d AS FLOAT)")
      case JDecimal(d) => Some(d.toString)
      case JString(s) if t.startsWith("DECIMAL") => Some(s)
      case JString(s) if t == "DATE" => Some(s"DATE '$s'")
      case JString(s) if t == "TIMESTAMP" || t == "TIMESTAMP_NTZ" =>
        // spec timestamps are ISO-8601; Spark's literal form wants a space
        Some(s"TIMESTAMP '${s.replace("T", " ").stripSuffix("+00:00")}'")
      case JString(s) => Some("'" + s.replace("'", "''") + "'")
      case _ => None
    }
  }

  /** Iceberg type JSON -> graft DDL string. */
  private[meta] def ddlOf(t: JValue): String = t match {
    case JString("long") => "BIGINT"
    case JString("int") => "INT"
    case JString("string") => "STRING"
    case JString("double") => "DOUBLE"
    case JString("float") => "FLOAT"
    case JString("boolean") => "BOOLEAN"
    case JString("date") => "DATE"
    case JString("timestamptz") => "TIMESTAMP"
    case JString("timestamp") => "TIMESTAMP_NTZ"
    case JString("binary") => "BINARY"
    case JString(d) if d.startsWith("decimal") => d.toUpperCase
    case o: JObject if (o \ "type") == JString("list") =>
      s"ARRAY<${ddlOf(o \ "element")}>"
    case other => sys.error(s"importIcebergMetadata: unsupported type $other")
  }

  /** Resolves a user-supplied attach location to the table-metadata
    * JSON file: a `*.metadata.json` path passes through; a TABLE
    * DIRECTORY resolves like Iceberg's HadoopCatalog/HadoopTables —
    * `metadata/version-hint.text` names the current version
    * (`v<N>.metadata.json`), falling back to the NUMERICALLY newest
    * `v<N>.metadata.json` under `metadata/` (HadoopCatalog does not
    * zero-pad, so v10 must beat v9), or the lexicographically newest
    * for other naming schemes. */
  private[meta] def resolveMetadataJson(location: String): String = {
    if (location.endsWith(".metadata.json") || MetaIO.isFile(location)) return location
    val metaDir =
      if (MetaIO.fileName(location) == "metadata") location
      else MetaIO.join(location, "metadata")
    require(MetaIO.exists(metaDir) && MetaIO.isDirectory(metaDir),
      s"importIcebergMetadata: $location is neither a *.metadata.json file nor a " +
        "table directory with a metadata/ folder")
    val hint = MetaIO.join(metaDir, "version-hint.text")
    val hinted =
      if (!MetaIO.exists(hint)) None
      else scala.util.Try(MetaIO.readString(hint).trim).toOption.flatMap { v =>
        // HadoopCatalog writes the bare version number; tolerate a full
        // file name too
        Seq(s"v$v.metadata.json", v).map(MetaIO.join(metaDir, _))
          .find(p => scala.util.Try(MetaIO.isFile(p)).getOrElse(false))
      }
    hinted.getOrElse {
      val candidates = MetaIO.listFiles(metaDir).map(_._1)
        .filter(_.endsWith(".metadata.json"))
      require(candidates.nonEmpty,
        s"importIcebergMetadata: no *.metadata.json under $metaDir")
      // HadoopCatalog writes UNPADDED v<N>.metadata.json, so v10+ sorts
      // BEFORE v9 lexicographically — compare the version number
      // numerically when present ("00000-uuid" padded names still sort
      // correctly on the lexicographic fallback)
      val vName = "^v(\\d+)\\.metadata\\.json$".r
      val numbered = candidates.flatMap(p => MetaIO.fileName(p) match {
        case vName(n) => Some(n.toLong -> p)
        case _ => None
      })
      if (numbered.nonEmpty) numbered.maxBy(_._1)._2 else candidates.max
    }
  }

  /** Imports the table at `metadataJsonPath` (an Iceberg
    * `*.metadata.json`, or a HadoopCatalog-style table directory — see
    * [[resolveMetadataJson]]) into `catalog` under `name`. Returns the
    * registered metadata. */
  def importIcebergMetadata(catalog: Catalog, name: String,
      metadataJsonPath: String): TableMetadata =
    importIcebergMetadataJson(catalog, name,
      JsonMethods.parse(MetaIO.readString(resolveMetadataJson(metadataJsonPath))))

  /** [[importIcebergMetadata]] over an already-parsed table-metadata
    * document — what a REST catalog's LoadTableResult embeds
    * ([[IcebergRestImport]]). */
  def importIcebergMetadataJson(catalog: Catalog, name: String,
      j: JValue): TableMetadata =
    catalog.createTable(parseIcebergMetadataJson(name, j))

  /** Imports an **Iceberg view spec** (format-version 1) view-metadata
    * JSON as a graft VIEW ([[Views]]): every version's SQL + timestamp
    * under the source's own version ids, the current version resolved,
    * and the spec's `view-uuid` as the stable identity. For each version
    * the `spark` dialect representation is preferred; a view whose
    * current representation is another dialect still imports (the
    * dialect is recorded), and fails with that dialect named only when
    * READ. */
  def importIcebergViewMetadata(catalog: Catalog, name: String,
      metadataJsonPath: String): TableMetadata =
    catalog.createTable(parseIcebergViewMetadataJson(name,
      JsonMethods.parse(MetaIO.readString(metadataJsonPath))))

  /** [[importIcebergViewMetadata]] over an already-parsed document —
    * what a REST LoadViewResult embeds. */
  def importIcebergViewMetadataJson(catalog: Catalog, name: String,
      j: JValue): TableMetadata =
    catalog.createTable(parseIcebergViewMetadataJson(name, j))

  /** The pure parse half of [[importIcebergViewMetadata]]. */
  def parseIcebergViewMetadataJson(name: String, j: JValue): TableMetadata = {
    val fv = lng(j \ "format-version")
    require(fv == 1,
      s"importIcebergViewMetadata: view format-version $fv not supported (v1 only)")
    val curId = lng(j \ "current-version-id").toInt
    val versionsJ = arr(j \ "versions")
    require(versionsJ.nonEmpty, "importIcebergViewMetadata: no versions")
    val versions = versionsJ.map { v =>
      val id = lng(v \ "version-id").toInt
      val ts = (v \ "timestamp-ms") match { case JNothing | JNull => 0L; case x => lng(x) }
      val reps = arr(v \ "representations").collect {
        case r if (r \ "type") == JString("sql") =>
          (str(r \ "sql"), (r \ "dialect") match { case JString(d) => d; case _ => "" })
      }
      require(reps.nonEmpty,
        s"importIcebergViewMetadata: version $id carries no SQL representation")
      val (sql, dialect) = reps.find(_._2.equalsIgnoreCase("spark")).getOrElse(reps.head)
      (id, sql, ts, dialect)
    }
    val cur = versions.find(_._1 == curId).getOrElse(sys.error(
      s"importIcebergViewMetadata: current-version-id $curId not in versions"))
    // the CURRENT version's schema is what reads/DESCRIBE surface
    val schemaId = versionsJ.find(v => lng(v \ "version-id") == curId)
      .map(v => (v \ "schema-id") match { case JNothing | JNull => 0L; case x => lng(x) })
      .getOrElse(0L)
    // refuse NOW, not at a later export/serve: a view accepted without a
    // resolvable schema would 400 confusingly on every LoadViewResult
    val schema = arr(j \ "schemas").find(s => lng(s \ "schema-id") == schemaId)
      .map(s => arr(s \ "fields").map { f =>
        SchemaField(lng(f \ "id").toInt, str(f \ "name"), ddlOf(f \ "type"),
          nullable = (f \ "required") != JBool(true))
      }).getOrElse(sys.error(
        s"importIcebergViewMetadata: the current version's schema-id $schemaId " +
          "is not in the schemas list"))
    require(schema.nonEmpty,
      "importIcebergViewMetadata: the current version's schema has no fields")
    val foreignProps = (j \ "properties") match {
      case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    TableMetadata(name, location = "", schema = schema,
      properties = foreignProps ++
        versions.flatMap { case (id, sql, ts, dialect) => Seq(
          Views.versionSqlKey(id) -> sql, Views.versionTsKey(id) -> ts.toString) ++
          // per-version: a mixed-dialect history must re-export each
          // version under ITS OWN dialect label
          (if (dialect.nonEmpty) Seq(Views.versionDialectKey(id) -> dialect)
           else Nil) } ++
        Map(Views.SqlKey -> cur._2, Views.DialectKey -> cur._4,
          Views.CurrentVersionKey -> curId.toString) ++
        ((j \ "view-uuid") match {
          case JString(u) => Map(TableMetadata.UuidKey -> u)
          case _ => Map.empty[String, String]
        }))
  }

  /** The pure parse half of the import: an Iceberg table-metadata
    * document to a graft [[TableMetadata]] (location unset — the catalog
    * assigns it at registration). Shared by first attach and
    * [[IcebergRestImport.refreshTable]], which commits the re-parsed
    * state as a new VERSION of an already-attached table. */
  /** Parses ONE Iceberg partition-spec field (`{source-id, transform,
    * name}`) against a field-id-indexed schema, enforcing the engine's
    * literal-faithfulness rules — shared by metadata import and the REST
    * commit endpoint's `add-spec` door so a spec a foreign client can
    * commit is exactly a spec this engine could have imported. Returns
    * (spec field name, graft field, source DDL). Throws
    * IllegalArgumentException with the refusal reason. */
  private[meta] def foreignSpecField(byId: Map[Int, SchemaField], f: JValue,
      label: String): (String, PartitionField, String) = {
    val src = byId.getOrElse(lng(f \ "source-id").toInt,
      throw new IllegalArgumentException(
        s"$label: partition source-id ${f \ "source-id"} not in schema"))
    val transform = str(f \ "transform")
    require(transform == "identity" || transform.matches("bucket\\[\\d+\\]") ||
        transform.matches("truncate\\[\\d+\\]") ||
        PartitionField.TimeTransforms.contains(transform),
      s"$label: unsupported partition transform $transform")
    val srcDdl = src.dataType.trim.toUpperCase
    if (transform.startsWith("truncate["))
      // truncate values ride in the SOURCE type; int/long/string have
      // one faithful literal form (decimal/binary truncation does not
      // round-trip through graft's string partition values)
      require(Set("BIGINT", "LONG", "INT", "INTEGER", "STRING", "VARCHAR")
          .contains(srcDdl),
        s"$label: truncate partition on ${src.name}: $srcDdl has " +
          "no faithful literal partition-value form here")
    if (transform == "identity")
      // graft records partition values as LITERAL strings and prunes by
      // string equality — only types whose avro partition value has one
      // faithful literal form may import (timestamps arrive as epoch
      // micros, decimals as byte buffers: a raw toString would silently
      // match no user filter, the worst failure mode)
      require(Set("BIGINT", "LONG", "INT", "INTEGER", "STRING", "VARCHAR",
          "DATE", "BOOLEAN").contains(srcDdl),
        s"$label: identity partition on ${src.name}: $srcDdl is not " +
          "importable as a literal partition value (timestamp/decimal/binary " +
          "identity partitions have no faithful string form here)")
    (str(f \ "name"), PartitionField(src.name, transform), srcDdl)
  }

  def parseIcebergMetadataJson(name: String, j: JValue): TableMetadata = {
    val fv = lng(j \ "format-version")
    require(fv == 2 || fv == 3,
      s"importIcebergMetadata: format-version $fv not supported (v2/v3 only)")

    val currentSchemaId = lng(j \ "current-schema-id")
    val schemaJ = arr(j \ "schemas").find(s =>
      lng(s \ "schema-id") == currentSchemaId).getOrElse(
      sys.error(s"no schema with id $currentSchemaId"))
    val schema = arr(schemaJ \ "fields").map { f =>
      val ddl = ddlOf(f \ "type")
      SchemaField(lng(f \ "id").toInt, str(f \ "name"), ddl,
        nullable = (f \ "required") != JBool(true),
        // v3 initial-default (Appendix D JSON single value) -> the SQL
        // literal graft's read fill / INSERT fill consume
        initialDefault = defaultSqlOf(ddl, f \ "initial-default"))
    }
    val byId = schema.map(f => f.id -> f).toMap

    // ALL partition specs parse; each validates LAZILY, the first time a
    // manifest (or the default) actually references it — a table whose
    // HISTORY includes an unconvertible spec imports fine as long as no
    // live manifest was written under it ("refuse only genuinely
    // unconvertible transforms").
    val defaultSpecId = lng(j \ "default-spec-id")
    val specJsonById: Map[Long, List[JValue]] = arr(j \ "partition-specs")
      .map(s => lng(s \ "spec-id") -> arr(s \ "fields")).toMap
    val resolvedSpecs = scala.collection.mutable.Map.empty[Long, Seq[(String, PartitionField, String)]]
    // per-manifest partition struct field name -> (graft field, source DDL)
    def resolveSpec(specId: Long): Seq[(String, PartitionField, String)] =
      resolvedSpecs.getOrElseUpdate(specId, {
        val fields = specJsonById.getOrElse(specId,
          sys.error(s"importIcebergMetadata: no partition spec with id $specId"))
        fields.map(foreignSpecField(byId, _, s"importIcebergMetadata: spec $specId"))
      })
    val specFields = resolveSpec(defaultSpecId) // eager: governs the table
    // graft-relative spec marker (FileEntry.specId): the default spec is 0
    // (graft's "current spec" convention), historical specs renumber to
    // foreign id + 1 so a foreign historical spec 0 cannot collide with it
    def graftSpecId(foreign: Long): Int =
      if (foreign == defaultSpecId) 0 else foreign.toInt + 1

    val sortOrder = (for {
      oid <- Option(lng(j \ "default-sort-order-id")) if oid != 0
      so <- arr(j \ "sort-orders").find(s => lng(s \ "order-id") == oid)
    } yield arr(so \ "fields").flatMap { f =>
      // only identity sort transforms map onto graft's sort orders
      if (str(f \ "transform") != "identity") None
      else byId.get(lng(f \ "source-id").toInt).map { src =>
        SortField(src.name,
          ascending = str(f \ "direction") == "asc",
          nullsFirst = str(f \ "null-order") == "nulls-first")
      }
    }).getOrElse(Nil)

    val snapshots = arr(j \ "snapshots").map { s =>
      val manifest = decodeManifestList(str(s \ "manifest-list"), byId,
        resolveSpec, graftSpecId)
      Snapshot(
        snapshotId = lng(s \ "snapshot-id"),
        parentId = (s \ "parent-snapshot-id") match {
          case JNothing | JNull => None; case p => Some(lng(p))
        },
        sequenceNumber = lng(s \ "sequence-number"),
        timestampMs = lng(s \ "timestamp-ms"),
        manifest = manifest,
        summary = (s \ "summary") match {
          case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty
        })
    }

    val refs = (j \ "refs") match {
      case JObject(kv) => kv.toMap
      case _ => Map.empty[String, JValue]
    }
    val branchRefs = refs.collect {
      case (b, r) if (r \ "type") == JString("branch") => b -> lng(r \ "snapshot-id")
    }
    val tagRefs = refs.collect {
      case (t, r) if (r \ "type") == JString("tag") => t -> lng(r \ "snapshot-id")
    }
    val currentId = (j \ "current-snapshot-id") match {
      case JNothing | JNull => None
      case v => Some(lng(v)).filter(_ != -1L)
    }

    // the row-id cursor resumes PAST every assigned range, so native
    // appends after the attach cannot collide with imported lineage
    val nextRowId: Long = (j \ "next-row-id") match {
      case JNothing | JNull =>
        snapshots.flatMap(_.manifest.flatMap(f =>
          f.firstRowId.map(_ + f.recordCount))).foldLeft(0L)(math.max)
      case v => lng(v)
    }

    TableMetadata(
      name = name, location = "",
      formatVersion = fv.toInt,
      nextRowId = nextRowId,
      schema = schema,
      partitionSpec = specFields.map(_._2),
      // every referenced NON-default spec's definition, keyed by its
      // graft marker — what lets a later re-export stay spec-faithful
      historicalSpecs = resolvedSpecs.toMap.collect {
        case (fid, fields) if fid != defaultSpecId =>
          graftSpecId(fid) -> fields.map(_._2)
      },
      sortOrder = sortOrder,
      currentSnapshotId = currentId,
      refs = if (branchRefs.nonEmpty) branchRefs
             else currentId.map(id => Map("main" -> id)).getOrElse(Map.empty),
      snapshots = snapshots,
      lastSequenceNumber = lng(j \ "last-sequence-number"),
      lastColumnId = lng(j \ "last-column-id").toInt,
      tags = tagRefs,
      properties = ((j \ "properties") match {
        case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty[String, String]
      }) ++ ndvProperties(j, currentId, byId) ++
        // the FOREIGN table's identity rides along (spec: table-uuid is
        // immutable for the table's life): re-export/serve emit the same
        // uuid, and refreshTable can detect a dropped-and-recreated
        // source — same name, new uuid — instead of silently replacing
        // the follower's history
        ((j \ "table-uuid") match {
          case JString(u) => Map(TableMetadata.UuidKey -> u)
          case _ => Map.empty[String, String]
        }))
  }


  /** Decodes every manifest referenced by one manifest LIST into graft
    * [[FileEntry]]s — the shared read path of the full import, the REST
    * commit endpoint (validating a client-written list against the
    * served table), and foreign-table refresh. `resolveSpec` maps a
    * foreign spec id to its decoded fields in manifest layout (field
    * name, graft field, source DDL); `graftSpecId` maps it to the
    * graft-relative marker recorded on each file. */
  private[meta] def decodeManifestList(listPath: String,
      byId: Map[Int, SchemaField],
      resolveSpec: Long => Seq[(String, PartitionField, String)],
      graftSpecId: Long => Int): Seq[FileEntry] = {
    val (listEntries, _) = IcebergExport.readAvro(listPath)
    listEntries.flatMap { le =>
        val mPath = le.get("manifest_path").toString
        val listSeq = le.get("sequence_number").asInstanceOf[Long]
        // each manifest decodes with the spec it was WRITTEN under — a
        // spec-evolved table's older manifests carry a different
        // partition struct than the default spec's
        val mSpecId = le.get("partition_spec_id").asInstanceOf[Int].toLong
        val mSpecFields = resolveSpec(mSpecId)
        val (recs, _) = IcebergExport.readAvro(mPath)
        // v3 row-lineage inheritance: ADDED data files with a null
        // first_row_id take the manifest's first_row_id plus the record
        // counts of the ADDED data files before them (spec "Row Lineage")
        var rowIdCursor: Option[Long] =
          if (le.getSchema.getField("first_row_id") == null) None
          else Option(le.get("first_row_id")).map(_.asInstanceOf[Long])
        recs.flatMap { r =>
          val status = r.get("status").asInstanceOf[Int]
          if (status == 2) None // DELETED: not part of the snapshot's state
          else {
            val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            def optF(field: String): Option[AnyRef] =
              if (df.getSchema.getField(field) == null) None else Option(df.get(field))
            val content = df.get("content").asInstanceOf[Int]
            // v3 deletion vectors: content=1 entries addressing a Puffin
            // blob by referenced data file + byte range
            val refFile = optF("referenced_data_file").map(_.toString)
            val isDv = content == 1 && refFile.nonEmpty
            val fmt = df.get("file_format").toString
            require(fmt.equalsIgnoreCase("PARQUET") ||
                (isDv && fmt.equalsIgnoreCase("PUFFIN")),
              s"importIcebergMetadata: unsupported file format $fmt")
            require(!isDv || (optF("content_offset").nonEmpty &&
                optF("content_size_in_bytes").nonEmpty),
              s"importIcebergMetadata: deletion vector for ${refFile.get} lacks " +
                "content_offset/content_size_in_bytes")
            val seq = Option(r.get("sequence_number"))
              .map(_.asInstanceOf[Long])
              .getOrElse { require(status == 1,
                "EXISTING entry without explicit sequence number"); listSeq }
            val firstRowId: Option[Long] =
              if (content != 0) None
              else optF("first_row_id").map(_.asInstanceOf[Long].longValue)
                .orElse(if (status == 1) rowIdCursor else None)
            if (content == 0 && status == 1)
              rowIdCursor = rowIdCursor.map(_ +
                df.get("record_count").asInstanceOf[Long])
            val partVals = {
              val part = df.get("partition")
                .asInstanceOf[org.apache.avro.generic.GenericRecord]
              mSpecFields.flatMap { case (fieldName, pf, srcDdl) =>
                Option(part.get(fieldName)).map { v =>
                  // foreign DATE identity partitions arrive as avro ints
                  // (days since epoch, per the Iceberg spec's partition
                  // data encoding); graft's partition values are the
                  // LITERAL day strings — a raw toString would record
                  // "19723" and silently match no user filter. Types with
                  // no faithful literal form were refused at spec parse.
                  val s = (pf.isIdentity, srcDdl, v) match {
                    // time transforms arrive as the spec's int ordinals
                    // (years/months/days/hours since epoch); graft records
                    // the human literal
                    case (false, _, i: java.lang.Integer) if pf.isTime =>
                      PartitionField.timeOrdinalToLiteral(pf.transform, i.intValue)
                    case (true, "DATE", i: java.lang.Integer) =>
                      java.time.LocalDate.ofEpochDay(i.longValue).toString
                    case _ => v.toString
                  }
                  pf.column -> s
                }
              }.toMap
            }
            val eqIds = Option(df.get("equality_ids")).toSeq.flatMap(
              _.asInstanceOf[java.util.List[Integer]].toArray.toSeq
                .map(_.asInstanceOf[Integer].intValue))
            // per-file stats (when the foreign writer recorded them):
            // lower/upper bounds decode into graft's manifest zone maps —
            // imported tables get manifest-level file skipping with ZERO
            // footer reads, which at a 10^6-file import is the difference
            // between instant pruning and a full footer sweep
            val lower = kvMapOf(df, "lower_bounds")
            val upper = kvMapOf(df, "upper_bounds")
            val stats = lower.keySet.intersect(upper.keySet).toSeq.flatMap { id =>
              byId.get(id).flatMap { f =>
                for {
                  mn <- boundDecode(f.dataType, lower(id).asInstanceOf[java.nio.ByteBuffer])
                  mx <- boundDecode(f.dataType, upper(id).asInstanceOf[java.nio.ByteBuffer])
                } yield f.name -> (mn, mx)
              }
            }.toMap
            val nulls = kvMapOf(df, "null_value_counts").toSeq.flatMap { case (id, v) =>
              byId.get(id).map(f => f.name -> v.asInstanceOf[java.lang.Long].longValue)
            }.toMap
            Some(FileEntry(
              path = df.get("file_path").toString,
              length = df.get("file_size_in_bytes").asInstanceOf[Long],
              content = content match {
                case 0 => FileContent.Data
                case 1 => FileContent.PositionDeletes
                case 2 => FileContent.EqualityDeletes
              },
              recordCount = df.get("record_count").asInstanceOf[Long],
              sequenceNumber = seq,
              equalityIds = eqIds.flatMap(byId.get).map(_.name),
              equalityFieldIds = eqIds,
              partitionValues = partVals,
              columnStats = stats,
              nullCounts = nulls,
              specId = graftSpecId(mSpecId),
              referencedDataFile = refFile.filter(_ => isDv),
              contentOffset =
                if (isDv) optF("content_offset").map(_.asInstanceOf[Long].longValue)
                else None,
              contentSizeInBytes =
                if (isDv) optF("content_size_in_bytes").map(_.asInstanceOf[Long].longValue)
                else None,
              firstRowId = firstRowId))
          }
        }
      }
  }

  /** [[decodeManifestList]] AGAINST an existing graft table: spec ids in
    * the list are graft's own markers (what [[IcebergExport]] writes —
    * 0 = the current spec, historical markers verbatim) and field names
    * follow the export layout. This is how the REST commit endpoint
    * reads a manifest list a spec client wrote on top of served
    * metadata. */
  private[meta] def decodeManifestListForTable(meta: TableMetadata,
      listPath: String): Seq[FileEntry] = {
    val byId = meta.schema.map(f => f.id -> f).toMap
    def fieldsOf(spec: Seq[PartitionField]) = spec.map { p =>
      val src = meta.fieldByName(p.column).getOrElse(
        sys.error(s"partition column ${p.column} not in schema"))
      (IcebergExport.partFieldName(p), p, src.dataType.trim.toUpperCase)
    }
    decodeManifestList(listPath, byId,
      specId =>
        if (specId == 0) fieldsOf(meta.partitionSpec)
        else fieldsOf(meta.historicalSpecs.getOrElse(specId.toInt,
          sys.error(s"unknown partition spec marker $specId"))),
      _.toInt)
  }

  /** Foreign NDV statistics (`statistics` list, theta blobs) for the
    * CURRENT snapshot, as graft `stats.<col>.ndv` table properties — the
    * same keys [[graft.compaction.Maintenance.analyzeTable]] writes, so
    * cost-based consumers read one scheme. The blob `ndv` property is
    * authoritative (what Iceberg's stats handler writes and engines
    * read); when absent, the sketch payload decodes best-effort. Stale
    * entries (other snapshots) and unresolvable field ids are ignored. */
  private def ndvProperties(j: JValue, currentId: Option[Long],
      byId: Map[Int, SchemaField]): Map[String, String] = {
    val entries = (j \ "statistics") match {
      case JArray(xs) => xs
      case _ => return Map.empty
    }
    val cur = currentId.getOrElse(return Map.empty)
    val ndv = entries.filter(e => scala.util.Try(lng(e \ "snapshot-id")).toOption.contains(cur))
      .flatMap { e =>
        val statsPath = (e \ "statistics-path") match {
          case JString(p) => Some(p)
          case _ => None
        }
        arr(e \ "blob-metadata").flatMap { b =>
          val isTheta = (b \ "type") == JString("apache-datasketches-theta-v1")
          val field = (b \ "fields") match {
            case JArray(List(f)) => scala.util.Try(lng(f).toInt).toOption
            case _ => None
          }
          val fromProp = (b \ "properties" \ "ndv") match {
            case JString(v) => scala.util.Try(v.toLong).toOption
            case _ => None
          }
          // fall back to decoding the sketch bytes from the Puffin file
          def fromSketch: Option[Long] = statsPath.flatMap(p => scala.util.Try {
            Puffin.readFooter(p).find(m =>
              m.blobType == "apache-datasketches-theta-v1" && m.fields == field.toSeq)
              .map { m =>
                val all = MetaIO.readBytes(p)
                ThetaSketch.deserialize(java.util.Arrays.copyOfRange(
                  all, m.offset.toInt, (m.offset + m.length).toInt)).estimate
              }
          }.toOption.flatten)
          for {
            _ <- Some(()).filter(_ => isTheta)
            fid <- field
            f <- byId.get(fid)
            n <- fromProp.orElse(fromSketch)
          } yield s"stats.${f.name}.ndv" -> n.toString
        }
      }.toMap
    if (ndv.isEmpty) Map.empty
    else ndv + ("stats.snapshot-id" -> cur.toString)
  }
}
