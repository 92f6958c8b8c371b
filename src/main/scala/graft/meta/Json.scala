package graft.meta

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Hand-rolled JSON codec for table metadata (json4s ships with Spark).
  * Explicit field-by-field mapping: stable on-disk format, no reflection. */
object MetadataJson {

  private def str(v: String): JValue = JString(v)

  def toJson(m: TableMetadata): JValue = JObject(
    "name" -> str(m.name),
    "location" -> str(m.location),
    "format-version" -> JInt(m.formatVersion),
    "schema" -> JArray(m.schema.map(f =>
      JObject("id" -> JInt(f.id), "name" -> str(f.name), "type" -> str(f.dataType),
        "nullable" -> JBool(f.nullable))).toList),
    "last-column-id" -> JInt(m.lastColumnId),
    "partition-spec" -> JArray(m.partitionSpec.map(p =>
      JObject("column" -> str(p.column), "transform" -> str(p.transform))).toList),
    "sort-order" -> JArray(m.sortOrder.map(s =>
      JObject("column" -> str(s.column), "ascending" -> JBool(s.ascending),
        "nulls-first" -> JBool(s.nullsFirst))).toList),
    "current-snapshot-id" -> m.currentSnapshotId.map(JLong(_)).getOrElse(JNull),
    "refs" -> JObject(m.refs.toList.map { case (k, v) => k -> (JLong(v): JValue) }),
    "snapshots" -> JArray(m.snapshots.map(snapshotToJson).toList),
    "last-sequence-number" -> JLong(m.lastSequenceNumber),
    "version" -> JInt(m.version)
  )

  private def snapshotToJson(s: Snapshot): JValue = JObject(
    "snapshot-id" -> JLong(s.snapshotId),
    "parent-id" -> s.parentId.map(JLong(_)).getOrElse(JNull),
    "sequence-number" -> JLong(s.sequenceNumber),
    "timestamp-ms" -> JLong(s.timestampMs),
    "summary" -> JObject(s.summary.toList.map { case (k, v) => k -> (str(v): JValue) }),
    "manifest" -> JArray(s.manifest.map(fileToJson).toList)
  )

  private def fileToJson(f: FileEntry): JValue = JObject(
    "path" -> str(f.path),
    "length" -> JLong(f.length),
    "content" -> str(f.content.toString),
    "record-count" -> JLong(f.recordCount),
    "sequence-number" -> JLong(f.sequenceNumber),
    "equality-ids" -> JArray(f.equalityIds.map(str).toList),
    "equality-field-ids" -> JArray(f.equalityFieldIds.map(i => JInt(i): JValue).toList),
    "partition" -> JObject(f.partitionValues.toList.map { case (k, v) => k -> (str(v): JValue) }),
    "column-stats" -> JObject(f.columnStats.toList.map { case (k, (mn, mx)) =>
      k -> (JObject("min" -> str(mn), "max" -> str(mx)): JValue) })
  )

  def write(m: TableMetadata): String = JsonMethods.pretty(JsonMethods.render(toJson(m)))

  def read(s: String): TableMetadata = {
    val j = JsonMethods.parse(s)
    def fStr(v: JValue): String = v match { case JString(x) => x; case _ => sys.error(s"expected string, got $v") }
    def fLong(v: JValue): Long = v match {
      case JLong(x) => x; case JInt(x) => x.toLong; case JDouble(x) => x.toLong
      case _ => sys.error(s"expected long, got $v")
    }
    def fBool(v: JValue): Boolean = v match { case JBool(x) => x; case _ => sys.error(s"expected bool, got $v") }
    def arr(v: JValue): List[JValue] = v match { case JArray(xs) => xs; case _ => Nil }
    def obj(v: JValue): List[(String, JValue)] = v match { case JObject(xs) => xs; case _ => Nil }
    def optLong(v: JValue): Option[Long] = v match { case JNull | JNothing => None; case x => Some(fLong(x)) }

    def file(v: JValue): FileEntry = {
      val m = obj(v).toMap
      FileEntry(
        path = fStr(m("path")),
        length = fLong(m("length")),
        content = FileContent.withName(fStr(m("content"))),
        recordCount = fLong(m("record-count")),
        sequenceNumber = fLong(m("sequence-number")),
        equalityIds = arr(m.getOrElse("equality-ids", JArray(Nil))).map(fStr),
        equalityFieldIds = arr(m.getOrElse("equality-field-ids", JArray(Nil))).map(v => fLong(v).toInt),
        partitionValues = obj(m.getOrElse("partition", JObject())).map { case (k, x) => k -> fStr(x) }.toMap,
        columnStats = obj(m.getOrElse("column-stats", JObject())).map { case (k, x) =>
          val sm = obj(x).toMap
          k -> (fStr(sm("min")), fStr(sm("max")))
        }.toMap
      )
    }
    def snap(v: JValue): Snapshot = {
      val m = obj(v).toMap
      Snapshot(
        snapshotId = fLong(m("snapshot-id")),
        parentId = optLong(m.getOrElse("parent-id", JNull)),
        sequenceNumber = fLong(m("sequence-number")),
        timestampMs = fLong(m("timestamp-ms")),
        manifest = arr(m.getOrElse("manifest", JArray(Nil))).map(file),
        summary = obj(m.getOrElse("summary", JObject())).map { case (k, x) => k -> fStr(x) }.toMap
      )
    }
    val m = obj(j).toMap
    TableMetadata(
      name = fStr(m("name")),
      location = fStr(m("location")),
      formatVersion = fLong(m.getOrElse("format-version", JInt(2))).toInt,
      // typed "schema" preferred; legacy "schema-columns" becomes an
      // untyped (name-addressed) schema with positional ids
      schema = m.get("schema") match {
        case Some(JArray(xs)) if xs.nonEmpty => xs.map { f =>
          val fm = obj(f).toMap
          SchemaField(fLong(fm("id")).toInt, fStr(fm("name")),
            fStr(fm.getOrElse("type", JString(""))),
            fBool(fm.getOrElse("nullable", JBool(true))))
        }
        case _ => SchemaField.fromNames(arr(m.getOrElse("schema-columns", JArray(Nil))).map(fStr))
      },
      partitionSpec = arr(m.getOrElse("partition-spec", JArray(Nil))).map { p =>
        val pm = obj(p).toMap
        PartitionField(fStr(pm("column")), fStr(pm.getOrElse("transform", JString("identity"))))
      },
      sortOrder = arr(m.getOrElse("sort-order", JArray(Nil))).map { s =>
        val sm = obj(s).toMap
        SortField(fStr(sm("column")), fBool(sm.getOrElse("ascending", JBool(true))),
          fBool(sm.getOrElse("nulls-first", JBool(true))))
      },
      currentSnapshotId = optLong(m.getOrElse("current-snapshot-id", JNull)),
      refs = obj(m.getOrElse("refs", JObject())).map { case (k, v) => k -> fLong(v) }.toMap,
      snapshots = arr(m.getOrElse("snapshots", JArray(Nil))).map(snap),
      lastSequenceNumber = fLong(m.getOrElse("last-sequence-number", JLong(0L))),
      version = fLong(m.getOrElse("version", JInt(0))).toInt,
      lastColumnId = fLong(m.getOrElse("last-column-id", JInt(0))).toInt
    )
  }
}
