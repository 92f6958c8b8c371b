package graft.meta

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Hand-rolled JSON codec for table metadata (json4s ships with Spark).
  * Explicit field-by-field mapping: stable on-disk format, no reflection.
  *
  * Manifests are DELTA-ENCODED against the parent snapshot where lossless:
  * a full manifest per snapshot makes the metadata file O(snapshots x
  * files) — at 10^6 tracked files an append would rewrite gigabytes of
  * JSON per commit (this model's analogue of why Iceberg splits manifests
  * into reusable avro files). A snapshot whose parent appears in the same
  * metadata serializes only `removed-paths` + in-place `replaced` entries
  * + `appended` entries, making metadata O(total change). The writer
  * RECONSTRUCTS the manifest from the candidate delta and compares it to
  * the original — exact order included, because MOR delete application is
  * manifest-order sensitive — and falls back to the full form on any
  * mismatch, so the encoding is lossless by construction, not by
  * assumption. Reading full-manifest metadata written before this
  * encoding still works (field-presence switch). */
object MetadataJson {

  private def str(v: String): JValue = JString(v)

  def toJson(m: TableMetadata): JValue = {
    // parents resolve only against snapshots serialized EARLIER in the
    // list (commit order), so the reader can decode in one forward pass
    val seen = scala.collection.mutable.Map.empty[Long, Snapshot]
    val snapJsons = m.snapshots.map { s =>
      val j = snapshotToJson(s, s.parentId.flatMap(seen.get))
      seen(s.snapshotId) = s
      j
    }
    JObject(
      "name" -> str(m.name),
      "location" -> str(m.location),
      "format-version" -> JInt(m.formatVersion),
      "schema" -> schemaToJson(m),
      "last-column-id" -> JInt(m.lastColumnId),
      "partition-spec" -> specToJson(m),
      "sort-order" -> sortToJson(m),
      "historical-specs" -> historicalSpecsToJson(m),
      "current-snapshot-id" -> m.currentSnapshotId.map(JLong(_)).getOrElse(JNull),
      "refs" -> JObject(m.refs.toList.map { case (k, v) => k -> (JLong(v): JValue) }),
      "tags" -> JObject(m.tags.toList.map { case (k, v) => k -> (JLong(v): JValue) }),
      "properties" -> JObject(m.properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (str(v): JValue) }),
      "snapshots" -> JArray(snapJsons.toList),
      "last-sequence-number" -> JLong(m.lastSequenceNumber),
      "next-row-id" -> JLong(m.nextRowId),
      "version" -> JInt(m.version)
    )
  }

  private def schemaToJson(m: TableMetadata): JValue = JArray(m.schema.map { f =>
    val base = List[(String, JValue)]("id" -> JInt(f.id), "name" -> str(f.name),
      "type" -> str(f.dataType), "nullable" -> JBool(f.nullable))
    JObject(f.initialDefault.fold(base)(d => base :+ ("initial-default" -> (str(d): JValue))))
  }.toList)

  private def specToJson(m: TableMetadata): JValue = JArray(m.partitionSpec.map(p =>
    JObject("column" -> str(p.column), "transform" -> str(p.transform))).toList)

  private def historicalSpecsToJson(m: TableMetadata): JValue =
    JObject(m.historicalSpecs.toList.sortBy(_._1).map { case (k, fields) =>
      k.toString -> (JArray(fields.map(p =>
        JObject("column" -> str(p.column), "transform" -> str(p.transform))).toList): JValue)
    })

  private def sortToJson(m: TableMetadata): JValue = JArray(m.sortOrder.map(s =>
    JObject("column" -> str(s.column), "ascending" -> JBool(s.ascending),
      "nulls-first" -> JBool(s.nullsFirst))).toList)

  /** True when `child` is exactly `parent ++ <appended>` with the parent
    * prefix REFERENCE-identical — the plain-append commit shape. O(n)
    * pointer compares, no hashing: the fast path that keeps a 1-file
    * append on a million-entry manifest from building million-key maps
    * just to discover nothing changed. */
  private def isAppendOnly(child: Seq[FileEntry], parent: Seq[FileEntry]): Boolean =
    child.length >= parent.length && {
      val ci = child.iterator; val pi = parent.iterator
      var same = true
      while (same && pi.hasNext) same = ci.next().asInstanceOf[AnyRef] eq pi.next().asInstanceOf[AnyRef]
      same
    }

  private def snapshotToJson(s: Snapshot, parent: Option[Snapshot]): JValue = {
    val manifestField: (String, JValue) = parent match {
      case Some(p) if isAppendOnly(s.manifest, p.manifest) && p.manifest.nonEmpty =>
        "manifest-delta" -> JObject(
          "base-snapshot-id" -> JLong(p.snapshotId),
          "removed-paths" -> JArray(Nil),
          "replaced" -> JArray(Nil),
          "appended" -> JArray(s.manifest.drop(p.manifest.length).map(fileToJson).toList))
      case Some(p) =>
        // keyed by resolutionKey: DV entries share their container's path
        val childByPath = s.manifest.map(f => f.resolutionKey -> f).toMap
        val parentPaths = p.manifest.map(_.resolutionKey).toSet
        val removed = p.manifest.map(_.resolutionKey).filterNot(childByPath.contains)
        val replaced = p.manifest.flatMap(f =>
          childByPath.get(f.resolutionKey).filter(_ != f))
        val appended = s.manifest.filterNot(f => parentPaths.contains(f.resolutionKey))
        val reconstructed = p.manifest
          .flatMap(f => childByPath.get(f.resolutionKey)) ++ appended
        val deltaCost = removed.size + replaced.size + appended.size
        if (reconstructed == s.manifest && deltaCost < s.manifest.size)
          "manifest-delta" -> JObject(
            "base-snapshot-id" -> JLong(p.snapshotId),
            "removed-paths" -> JArray(removed.map(str).toList),
            "replaced" -> JArray(replaced.map(fileToJson).toList),
            "appended" -> JArray(appended.map(fileToJson).toList))
        else "manifest" -> JArray(s.manifest.map(fileToJson).toList)
      case None => "manifest" -> JArray(s.manifest.map(fileToJson).toList)
    }
    JObject(
      "snapshot-id" -> JLong(s.snapshotId),
      "parent-id" -> s.parentId.map(JLong(_)).getOrElse(JNull),
      "sequence-number" -> JLong(s.sequenceNumber),
      "timestamp-ms" -> JLong(s.timestampMs),
      "summary" -> JObject(s.summary.toList.map { case (k, v) => k -> (str(v): JValue) }),
      manifestField
    )
  }

  private def fileToJson(f: FileEntry): JValue = JObject(
    List(
      "path" -> (str(f.path): JValue),
      "length" -> (JLong(f.length): JValue),
      "content" -> (str(f.content.toString): JValue),
      "record-count" -> (JLong(f.recordCount): JValue),
      "sequence-number" -> (JLong(f.sequenceNumber): JValue),
      "equality-ids" -> (JArray(f.equalityIds.map(str).toList): JValue),
      "equality-field-ids" -> (JArray(f.equalityFieldIds.map(i => JInt(i): JValue).toList): JValue),
      "partition" -> (JObject(f.partitionValues.toList.map { case (k, v) => k -> (str(v): JValue) }): JValue),
      "column-stats" -> (JObject(f.columnStats.toList.map { case (k, (mn, mx)) =>
        k -> (JObject("min" -> str(mn), "max" -> str(mx)): JValue) }): JValue)
    ) ++
      // written only when present, so pre-existing metadata round-trips
      (if (f.nullCounts.isEmpty) Nil
       else List("null-counts" -> (JObject(f.nullCounts.toList.map { case (k, n) =>
         k -> (JLong(n): JValue) }): JValue))) ++
      // v3 deletion-vector coordinates — written only when present, so
      // pre-DV metadata files round-trip byte-identically
      f.referencedDataFile.map(p => "referenced-data-file" -> (str(p): JValue)).toList ++
      f.contentOffset.map(o => "content-offset" -> (JLong(o): JValue)).toList ++
      f.contentSizeInBytes.map(s => "content-size-in-bytes" -> (JLong(s): JValue)).toList ++
      // written only when true, so pre-add_files metadata round-trips
      (if (f.nameMatched) List("name-matched" -> (JBool(true): JValue)) else Nil) ++
      f.firstRowId.map(r => "first-row-id" -> (JLong(r): JValue)).toList ++
      (if (f.specId != 0) List("spec-id" -> (JInt(f.specId): JValue)) else Nil)
  )

  def write(m: TableMetadata): String = JsonMethods.pretty(JsonMethods.render(toJson(m)))

  /** Standalone FileEntry-list codec for auxiliary persistence (the
    * compaction rewrite journal) — same field encoding as the manifest. */
  def fileEntriesToJson(files: Seq[FileEntry]): JValue = JArray(files.map(fileToJson).toList)
  def fileEntriesFromJson(v: JValue): Seq[FileEntry] = v match {
    case JArray(xs) => xs.map(file)
    case other => sys.error(s"expected file entry array, got $other")
  }

  /** CROSS-VERSION delta: serializes `updated` against the already-
    * persisted `base` version, so a commit writes O(change) bytes instead
    * of re-inlining the whole manifest chain — at 10^6 tracked files the
    * difference between ~10 MiB (gzip'd full) and a few KiB per commit.
    * The delta file carries every SCALAR field in full (schema, refs,
    * properties — all small), the ids of snapshots removed since `base`,
    * and the appended snapshots (whose manifests may themselves
    * delta-encode against any base snapshot). Returns None when the
    * delta would be lossy — a carried snapshot differing from its base
    * twin (snapshots are immutable in every commit path, so this is
    * belt-and-braces, checked by reference first) — in which case the
    * caller writes the full form. Readers dispatch on `delta-of-version`
    * ([[readResolved]]). */
  def writeDelta(base: TableMetadata, updated: TableMetadata): Option[String] = {
    val baseById = base.snapshots.map(s => s.snapshotId -> s).toMap
    val carriedOk = updated.snapshots.forall { s =>
      baseById.get(s.snapshotId) match {
        case None => true
        case Some(b) => (b eq s) || b == s // identity fast path; == fallback
      }
    }
    if (!carriedOk) return None
    val updatedIds = updated.snapshots.map(_.snapshotId).toSet
    val removedIds = base.snapshots.map(_.snapshotId).filterNot(updatedIds.contains)
    val appended = updated.snapshots.filterNot(s => baseById.contains(s.snapshotId))
    // appended snapshots may delta ONLY against snapshots the READER will
    // have resolved: the KEPT base snapshots plus earlier appended ones.
    // Seeding with removed base snapshots here would emit a delta file
    // the reader cannot decode (an expire+append composed into one commit
    // whose new snapshot chains off an expired parent) — the parent falls
    // back to a full manifest instead.
    val seen = scala.collection.mutable.Map.empty[Long, Snapshot]
    val removedSet = removedIds.toSet
    base.snapshots.foreach(s =>
      if (!removedSet.contains(s.snapshotId)) seen(s.snapshotId) = s)
    val appendedJ = appended.map { s =>
      val j = snapshotToJson(s, s.parentId.flatMap(seen.get))
      seen(s.snapshotId) = s
      j
    }
    val j = JObject(
      "delta-of-version" -> JInt(base.version),
      "name" -> str(updated.name),
      "location" -> str(updated.location),
      "format-version" -> JInt(updated.formatVersion),
      "schema" -> schemaToJson(updated),
      "last-column-id" -> JInt(updated.lastColumnId),
      "partition-spec" -> specToJson(updated),
      "sort-order" -> sortToJson(updated),
      "historical-specs" -> historicalSpecsToJson(updated),
      "current-snapshot-id" -> updated.currentSnapshotId.map(JLong(_)).getOrElse(JNull),
      "refs" -> JObject(updated.refs.toList.map { case (k, v) => k -> (JLong(v): JValue) }),
      "tags" -> JObject(updated.tags.toList.map { case (k, v) => k -> (JLong(v): JValue) }),
      "properties" -> JObject(updated.properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (str(v): JValue) }),
      "removed-snapshot-ids" -> JArray(removedIds.map(JLong(_): JValue).toList),
      "snapshots-appended" -> JArray(appendedJ.toList),
      "last-sequence-number" -> JLong(updated.lastSequenceNumber),
      "next-row-id" -> JLong(updated.nextRowId),
      "version" -> JInt(updated.version)
    )
    Some(JsonMethods.pretty(JsonMethods.render(j)))
  }

  /** One jackson parse per metadata file/body: callers parse once and
    * dispatch on the result (the multi-MiB anchors and the REST commit
    * handler must not re-parse per question). */
  def parseValue(text: String): JValue = JsonMethods.parse(text)

  /** True when the parsed metadata is a cross-version delta. */
  def isDelta(j: JValue): Boolean = (j \ "delta-of-version") != JNothing
  def isDelta(text: String): Boolean = isDelta(parseValue(text))

  /** The base version a delta resolves against. */
  def deltaBaseVersion(j: JValue): Int = j \ "delta-of-version" match {
    case JInt(v) => v.toInt
    case other => sys.error(s"not a delta metadata file: $other")
  }
  def deltaBaseVersion(text: String): Int = deltaBaseVersion(parseValue(text))

  /** Resolves a parsed cross-version delta against its loaded base. */
  def readDelta(j: JValue, base: TableMetadata): TableMetadata = {
    val full = readValue(j) // scalar fields (appended snapshots resolved below)
    val removed = (j \ "removed-snapshot-ids") match {
      case JArray(xs) => xs.map { case JInt(x) => x.toLong; case JLong(x) => x
        case other => sys.error(s"bad removed id $other") }.toSet
      case _ => Set.empty[Long]
    }
    val kept = base.snapshots.filterNot(s => removed.contains(s.snapshotId))
    // decode appended snapshots WITH the kept base snapshots resolvable
    val appended = decodeSnapshots(j \ "snapshots-appended", kept)
    full.copy(snapshots = kept ++ appended)
  }
  def readDelta(text: String, base: TableMetadata): TableMetadata =
    readDelta(parseValue(text), base)

  private def fStr(v: JValue): String = v match { case JString(x) => x; case _ => sys.error(s"expected string, got $v") }
  private def fLong(v: JValue): Long = v match {
    case JLong(x) => x; case JInt(x) => x.toLong; case JDouble(x) => x.toLong
    case _ => sys.error(s"expected long, got $v")
  }
  private def fBool(v: JValue): Boolean = v match { case JBool(x) => x; case _ => sys.error(s"expected bool, got $v") }
  private def arr(v: JValue): List[JValue] = v match { case JArray(xs) => xs; case _ => Nil }
  private def obj(v: JValue): List[(String, JValue)] = v match { case JObject(xs) => xs; case _ => Nil }
  private def optLong(v: JValue): Option[Long] = v match { case JNull | JNothing => None; case x => Some(fLong(x)) }

  private def file(v: JValue): FileEntry = {
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
      }.toMap,
      nullCounts = obj(m.getOrElse("null-counts", JObject())).map { case (k, x) =>
        k -> fLong(x)
      }.toMap,
      referencedDataFile = m.get("referenced-data-file").map(fStr),
      contentOffset = m.get("content-offset").flatMap(optLong),
      contentSizeInBytes = m.get("content-size-in-bytes").flatMap(optLong),
      nameMatched = m.get("name-matched").exists(fBool),
      firstRowId = m.get("first-row-id").flatMap(optLong),
      specId = m.get("spec-id").map(fLong(_).toInt).getOrElse(0)
    )
  }

  /** Decodes a snapshot array in one forward pass: delta manifests
    * resolve against already-decoded snapshots — those decoded earlier in
    * THIS array or supplied via `pre` (cross-version delta files seed the
    * base version's snapshots there). */
  private[meta] def decodeSnapshots(v: JValue, pre: Seq[Snapshot]): Seq[Snapshot] = {
    val resolved = scala.collection.mutable.Map.empty[Long, Snapshot]
    pre.foreach(s => resolved(s.snapshotId) = s)
    arr(v).map { sv =>
      val m = obj(sv).toMap
      val manifest = m.get("manifest-delta") match {
        case Some(d) =>
          val dm = obj(d).toMap
          val baseId = fLong(dm("base-snapshot-id"))
          val base = resolved.getOrElse(baseId,
            sys.error(s"manifest-delta base snapshot $baseId not decoded yet"))
          val removed = arr(dm.getOrElse("removed-paths", JArray(Nil))).map(fStr).toSet
          val replaced = arr(dm.getOrElse("replaced", JArray(Nil))).map(file)
            .map(f => f.resolutionKey -> f).toMap
          val appended = arr(dm.getOrElse("appended", JArray(Nil))).map(file)
          base.manifest.filterNot(f => removed.contains(f.resolutionKey))
            .map(f => replaced.getOrElse(f.resolutionKey, f)) ++ appended
        case None => arr(m.getOrElse("manifest", JArray(Nil))).map(file)
      }
      val s = Snapshot(
        snapshotId = fLong(m("snapshot-id")),
        parentId = optLong(m.getOrElse("parent-id", JNull)),
        sequenceNumber = fLong(m("sequence-number")),
        timestampMs = fLong(m("timestamp-ms")),
        manifest = manifest,
        summary = obj(m.getOrElse("summary", JObject())).map { case (k, x) => k -> fStr(x) }.toMap
      )
      resolved(s.snapshotId) = s
      s
    }
  }

  def read(s: String): TableMetadata = readValue(parseValue(s))

  def readValue(j: JValue): TableMetadata = {
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
            fBool(fm.getOrElse("nullable", JBool(true))),
            fm.get("initial-default").map(fStr))
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
      historicalSpecs = obj(m.getOrElse("historical-specs", JObject())).map { case (k, v) =>
        k.toInt -> arr(v).map { p =>
          val pm = obj(p).toMap
          PartitionField(fStr(pm("column")), fStr(pm.getOrElse("transform", JString("identity"))))
        }
      }.toMap,
      currentSnapshotId = optLong(m.getOrElse("current-snapshot-id", JNull)),
      refs = obj(m.getOrElse("refs", JObject())).map { case (k, v) => k -> fLong(v) }.toMap,
      tags = obj(m.getOrElse("tags", JObject())).map { case (k, v) => k -> fLong(v) }.toMap,
      // absent in pre-properties metadata: default empty keeps it loading
      properties = obj(m.getOrElse("properties", JObject()))
        .map { case (k, v) => k -> fStr(v) }.toMap,
      snapshots = decodeSnapshots(m.getOrElse("snapshots", JArray(Nil)), Nil),
      lastSequenceNumber = fLong(m.getOrElse("last-sequence-number", JLong(0L))),
      nextRowId = fLong(m.getOrElse("next-row-id", JLong(0L))),
      version = fLong(m.getOrElse("version", JInt(0))).toInt,
      lastColumnId = fLong(m.getOrElse("last-column-id", JInt(0))).toInt
    )
  }
}
