package graft.meta

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** import(export(T)) fidelity, fuzzed: for 100 randomized EXPORTABLE
  * tables — random typed schemas, identity/bucket/time partition specs
  * (year/month/day/hour literals <-> spec int ordinals at the boundary),
  * snapshot chains with refs/tags/branches, data + equality-delete
  * entries, per-file partition values and sequence numbers — exporting
  * to the Iceberg-v2 layout (real avro manifests + metadata JSON on
  * disk) and importing into a fresh catalog must preserve every
  * spec-representable fact: manifest entry sets (path, content, length,
  * record count, sequence number, equality ids, partition values),
  * snapshot lineage and sequences, refs, tags, schema, sort order.
  *
  * Half the cases take the FORMAT-V3 arm: deletion vectors (content=1
  * entries with blob coordinates), per-file first_row_id + next-row-id
  * row lineage, and column initial-defaults — asserting the v3 wire
  * carries them losslessly too.
  *
  * Deliberately OUT of the property (not representable in the wire
  * layout or validated elsewhere): zone maps / null counts (export emits
  * them as bounds; import leaves pruning stats to the new engine's own
  * footer reads), snapshot summary keys beyond `operation`, and MOR
  * execution itself — data-backed MOR equivalence of the round trip is
  * pinned by IcebergImportSpec's oracle-checked fixtures; this spec
  * fuzzes the metadata space those fixtures can't enumerate.
  *
  * Generator constraints mirror the exporter's documented scope: no
  * plain parquet position deletes (their footers must exist on disk and
  * carry reserved field ids — covered by IcebergExportSpec), partition
  * values present for exactly the spec's fields, equality ids drawn
  * from the schema. */
class IcebergRoundTripPropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- constrained generator: metadata the exporter's scope admits ----

  private val colTypes =
    Seq("BIGINT", "INT", "STRING", "DOUBLE", "FLOAT", "BOOLEAN", "DATE",
      "TIMESTAMP", "DECIMAL(10,2)", "ARRAY<FLOAT>")
  // identity partitions need a faithful literal value form on BOTH sides
  private val identityPartTypes = Set("BIGINT", "INT", "STRING", "DATE")

  private val schemaGen: Gen[Seq[SchemaField]] = for {
    n <- Gen.chooseNum(1, 6)
    types <- Gen.listOfN(n, Gen.oneOf(colTypes))
  } yield types.zipWithIndex.map { case (t, i) =>
    SchemaField(i + 1, s"c$i", t, nullable = i % 2 == 0)
  }

  private val timePartTypes = Set("DATE", "TIMESTAMP")

  private def specGen(schema: Seq[SchemaField]): Gen[Seq[PartitionField]] = {
    val identityCands = schema.filter(f => identityPartTypes.contains(f.dataType))
    val bucketCands = schema.filter(f =>
      Set("BIGINT", "INT", "STRING").contains(f.dataType))
    val timeCands = schema.filter(f => timePartTypes.contains(f.dataType))
    for {
      nId <- Gen.chooseNum(0, math.min(1, identityCands.size))
      idCols <- Gen.pick(nId, identityCands)
      bkPool = bucketCands.filterNot(idCols.contains)
      nBk <- Gen.chooseNum(0, math.min(1, bkPool.size))
      bkCols <- Gen.pick(nBk, bkPool)
      tPool = timeCands.filterNot(idCols.contains).filterNot(bkCols.contains)
      nT <- Gen.chooseNum(0, math.min(1, tPool.size))
      tCols <- Gen.pick(nT, tPool)
      // hour needs sub-day resolution in the source column (spec: hour is
      // a timestamp transform); year/month/day apply to both types
      tTransform <- Gen.oneOf("year", "month", "day", "hour")
      // the non-identity hashed/truncated slot exercises both transforms
      bkTransform <- Gen.oneOf("bucket[8]", "truncate[4]")
    } yield idCols.map(f => PartitionField(f.name)).toSeq ++
      bkCols.map(f => PartitionField(f.name, bkTransform)).toSeq ++
      tCols.map(f => PartitionField(f.name,
        if (tTransform == "hour" && f.dataType != "TIMESTAMP") "day" else tTransform)).toSeq
  }

  private def partValue(f: SchemaField, p: PartitionField, i: Int): String =
    if (p.isTime) PartitionField.timeOrdinalToLiteral(p.transform, 19000 + i)
    else if (p.isTruncate) f.dataType match {
      // truncate values are SOURCE-TYPED literals already floored/prefixed
      // at the width (w=4 here)
      case "BIGINT" | "INT" => (i * 4).toString
      case _ => s"p$i".take(4)
    }
    else if (!p.isIdentity) (i % 8).toString
    else f.dataType match {
      case "BIGINT" | "INT" => (i * 10).toString
      case "DATE" => java.time.LocalDate.ofEpochDay(18000L + i).toString
      case _ => s"v$i"
    }

  /** An optional HISTORICAL spec (marker 3): a bucket or time spec some
    * files were written under before an evolution — exercises the
    * multi-spec export/import path. */
  private def histSpecGen(schema: Seq[SchemaField]): Gen[Option[Seq[PartitionField]]] = {
    val bCands = schema.filter(f => Set("BIGINT", "INT", "STRING").contains(f.dataType))
    val tCands = schema.filter(f => timePartTypes.contains(f.dataType))
    // defs, not vals: Gen.oneOf rejects an empty pool at CONSTRUCTION
    // time, so each generator may only be built inside its guarded branch
    def bucketGen = for {
      col <- Gen.oneOf(bCands)
      tr <- Gen.oneOf("bucket[2]", "bucket[4]", "truncate[4]")
    } yield Seq(PartitionField(col.name, tr))
    def timeGen = for {
      col <- Gen.oneOf(tCands)
      t <- Gen.oneOf("year", "month", "day")
    } yield Seq(PartitionField(col.name, t))
    (bCands.nonEmpty, tCands.nonEmpty) match {
      case (false, false) => Gen.const(None)
      case (true, false) => Gen.option(bucketGen)
      case (false, true) => Gen.option(timeGen)
      case (true, true) => Gen.option(Gen.oneOf(bucketGen, timeGen))
    }
  }
  private val HistMarker = 3

  private def fileGen(schema: Seq[SchemaField], spec: Seq[PartitionField],
      histSpec: Option[Seq[PartitionField]], tag: String): Gen[FileEntry] = for {
    content <- Gen.frequency(3 -> Gen.const(FileContent.Data),
      1 -> Gen.const(FileContent.EqualityDeletes))
    rows <- Gen.chooseNum(1L, 1L << 20)
    len <- Gen.chooseNum(100L, 1L << 30)
    seq <- Gen.chooseNum(1L, 20L)
    partIdx <- Gen.chooseNum(0, 3)
    nEq <- Gen.chooseNum(1, schema.size)
    eqFields <- Gen.pick(nEq, schema)
    useHist <- Gen.frequency(2 -> Gen.const(false),
      (if (histSpec.isDefined) 1 else 0) -> Gen.const(true))
    suffix <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val eqIds = if (content == FileContent.EqualityDeletes)
      eqFields.map(_.id).toSeq.sorted else Nil
    val fileSpec = if (useHist) histSpec.get else spec
    FileEntry(
      path = s"/w/$tag/f$suffix.parquet",
      length = len, content = content, recordCount = rows,
      sequenceNumber = seq,
      equalityIds = eqIds.flatMap(id => schema.find(_.id == id)).map(_.name),
      equalityFieldIds = eqIds,
      partitionValues = fileSpec.map(p =>
        p.column -> partValue(schema.find(_.name == p.column).get, p, partIdx)).toMap,
      specId = if (useHist) HistMarker else 0)
  }

  private def snapshotsGen(schema: Seq[SchemaField], spec: Seq[PartitionField],
      histSpec: Option[Seq[PartitionField]]): Gen[Seq[Snapshot]] = for {
    n <- Gen.chooseNum(1, 4)
    manifests <- Gen.sequence[Seq[Seq[FileEntry]], Seq[FileEntry]](
      (1 to n).map(i => Gen.chooseNum(1, 5).flatMap(k =>
        Gen.listOfN(k, fileGen(schema, spec, histSpec, s"s$i")).map(_.distinctBy(_.path)))))
  } yield manifests.zipWithIndex.map { case (m, i) =>
    val seq = (i + 1).toLong * 20 // every file seq (<=20) <= snapshot seq
    Snapshot(100L + i, if (i == 0) None else Some(100L + i - 1), seq,
      1000L * (i + 1), m.map(f => f.copy(sequenceNumber = math.min(f.sequenceNumber, seq))),
      Map("operation" -> (if (i == 0) "append" else "overwrite")))
  }

  /** A round-trippable default literal for the v3 arm (types whose
    * Appendix-D JSON single value maps back to the same SQL text). */
  private def defaultFor(t: String, i: Int): Option[String] = t match {
    case "STRING" => Some(s"'d$i'")
    case "INT" | "BIGINT" => Some((i * 7).toString)
    case "BOOLEAN" => Some((i % 2 == 0).toString)
    case "DATE" => Some(s"DATE '${java.time.LocalDate.ofEpochDay(18000L + i)}'")
    case "DECIMAL(10,2)" => Some(s"$i.25")
    case _ => None
  }

  /** The v3 arm: row lineage (per-file first_row_id + next-row-id), one
    * deletion vector per snapshot referencing one of its data files, and
    * column defaults — everything the v3 wire carries beyond v2. */
  private def v3ify(meta: TableMetadata): TableMetadata = {
    var cursor = 0L
    val snaps = meta.snapshots.map { s =>
      val withIds = s.manifest.map { f =>
        if (f.content == FileContent.Data) {
          val r = f.copy(firstRowId = Some(cursor)); cursor += f.recordCount; r
        } else f
      }
      val dv = withIds.find(_.content == FileContent.Data).map { d =>
        FileEntry(path = s"${d.path}.dv.puffin", length = 200L,
          content = FileContent.PositionDeletes, recordCount = 3L,
          sequenceNumber = s.sequenceNumber,
          partitionValues = d.partitionValues, specId = d.specId,
          referencedDataFile = Some(d.path), contentOffset = Some(4L),
          contentSizeInBytes = Some(64L))
      }
      s.copy(manifest = withIds ++ dv.toSeq)
    }
    meta.copy(formatVersion = 3, snapshots = snaps, nextRowId = cursor,
      schema = meta.schema.map(f =>
        f.copy(initialDefault = defaultFor(f.dataType, f.id))))
  }

  private val metaGen: Gen[TableMetadata] = for {
    schema <- schemaGen
    spec <- specGen(schema)
    histSpec <- histSpecGen(schema)
    sortCols <- Gen.someOf(schema.filterNot(_.dataType.startsWith("ARRAY")))
    asc <- Gen.oneOf(true, false)
    snaps <- snapshotsGen(schema, spec, histSpec)
    nTags <- Gen.chooseNum(0, 2)
    extraBranch <- Gen.oneOf(true, false)
    v3 <- Gen.oneOf(true, false)
  } yield {
    val cur = snaps.last.snapshotId
    val refs = Map("main" -> cur) ++
      (if (extraBranch && snaps.size > 1) Map("dev" -> snaps.head.snapshotId)
       else Map.empty)
    val tags = snaps.take(nTags).zipWithIndex.map { case (s, i) =>
      s"tag$i" -> s.snapshotId
    }.toMap
    val base = TableMetadata(
      name = "fuzz", location = "", formatVersion = 2,
      schema = schema, partitionSpec = spec,
      sortOrder = sortCols.take(2).map(f => SortField(f.name, asc, !asc)).toSeq,
      currentSnapshotId = Some(cur), refs = refs, snapshots = snaps,
      lastSequenceNumber = snaps.map(_.sequenceNumber).max,
      lastColumnId = schema.map(_.id).max, tags = tags,
      properties = Map("fuzz.case" -> "1"),
      historicalSpecs = histSpec.map(HistMarker -> _).toMap)
    if (v3) v3ify(base) else base
  }

  private def entryKey(f: FileEntry) =
    (f.path, f.content, f.length, f.recordCount, f.sequenceNumber,
      f.equalityFieldIds, f.equalityIds.toSet, f.partitionValues,
      // v3 facts: DV blob coordinates and row lineage
      f.referencedDataFile, f.contentOffset, f.contentSizeInBytes, f.firstRowId)

  test("import(export(T)) preserves entry sets, sequences, refs over 100 random tables") {
    val srcCat = LocalCatalog(Files.createTempDirectory("ice-fz-src").toString)
    val dstCat = LocalCatalog(Files.createTempDirectory("ice-fz-dst").toString)
    val cases = samples(metaGen, 100)
    assert(cases.size >= 100, s"generator must produce 100 cases, got ${cases.size}")
    cases.zipWithIndex.foreach { case (meta0, i) =>
      val name = s"t_fz$i"
      srcCat.createTable(meta0.copy(name = name,
        location = MetaIO.join(srcCat.warehouse, name)))
      val jsonPath = IcebergExport.exportIcebergMetadata(srcCat, name)
      val back = IcebergImport.importIcebergMetadata(dstCat, name, jsonPath)
      val orig = srcCat.loadTable(name)

      assert(back.schema == orig.schema, s"case $i: schema drift")
      assert(back.formatVersion == orig.formatVersion, s"case $i: format-version drift")
      assert(back.nextRowId == orig.nextRowId, s"case $i: next-row-id drift")
      assert(back.partitionSpec == orig.partitionSpec, s"case $i: spec drift")
      assert(back.sortOrder == orig.sortOrder, s"case $i: sort-order drift")
      assert(back.currentSnapshotId == orig.currentSnapshotId, s"case $i")
      assert(back.refs == orig.refs, s"case $i: refs drift")
      assert(back.tags == orig.tags, s"case $i: tags drift")
      assert(back.lastSequenceNumber == orig.lastSequenceNumber, s"case $i")
      assert(back.snapshots.size == orig.snapshots.size, s"case $i")
      orig.snapshots.zip(back.snapshots).foreach { case (a, b) =>
        assert(b.snapshotId == a.snapshotId && b.parentId == a.parentId &&
          b.sequenceNumber == a.sequenceNumber && b.timestampMs == a.timestampMs,
          s"case $i: snapshot lineage drift at ${a.snapshotId}")
        assert(b.summary.get("operation") == a.summary.get("operation"), s"case $i")
        assert(b.manifest.map(entryKey).toSet == a.manifest.map(entryKey).toSet,
          s"case $i: manifest entry drift at snapshot ${a.snapshotId}")
        // spec markers survive (the numbering is graft-relative and may
        // shift on re-import, but WHICH files are historical-spec must not)
        assert(b.manifest.filter(_.specId != 0).map(_.path).toSet ==
          a.manifest.filter(_.specId != 0).map(_.path).toSet,
          s"case $i: historical-spec marking drift at snapshot ${a.snapshotId}")
      }
      // a REFERENCED historical spec's definition round-trips
      if (orig.snapshots.exists(_.manifest.exists(_.specId != 0)))
        assert(back.historicalSpecs.values.toSet == orig.historicalSpecs.values.toSet,
          s"case $i: historical spec definition drift")
    }
  }
}
