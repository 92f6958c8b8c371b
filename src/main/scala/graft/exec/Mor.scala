package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.meta.{FileEntry, SchemaField}
import graft.selection.FileGroup

/** Merge-on-read DataFrame construction.
  *
  * The reference generates one SQL string per file group —
  * `data ANTI JOIN pos_deletes ANTI JOIN eq_deletes_k...` (SQL builder at
  * core/src/executor/datafusion/datafusion_processor.rs:438-584) — and runs
  * it on DataFusion. Here the same logical plan is declared directly with
  * the DataFrame API and Catalyst plans it:
  *
  *  - hidden columns (datafusion_processor.rs:48-51, populated in
  *    iceberg_file_task_scan.rs:410-429,590-639) come from Spark's native
  *    parquet metadata columns: `_metadata.file_path` and
  *    `_metadata.row_index` give the exact per-file row position without
  *    any window/shuffle, split-safe and fully distributed;
  *  - the per-file `sys_hidden_seq_num` constant is attached via a
  *    broadcast join against the (tiny) file->sequence-number manifest map;
  *  - delete sides are broadcast ONLY while their manifest byte sum stays
  *    under [[Mor.BroadcastDeleteBytesMax]] — delete files are small
  *    relative to data by construction, so the anti joins normally stay
  *    BroadcastHashJoins with zero shuffle of the data side (the plan you
  *    want at 100 TB); but a delete-heavy table (the FilesWithDeletes
  *    strategy exists precisely for those) must not OOM the driver, so
  *    above the gate Catalyst picks a shuffled join instead;
  *  - with a typed field-id schema ([[SchemaField]]), files are read by
  *    parquet field id instead of name, making the read correct across
  *    renames (the reference's `field_by_id` addressing,
  *    datafusion_processor.rs:693,741).
  */
object Mor {
  val SeqNumCol = "sys_hidden_seq_num"
  val FilePathCol = "sys_hidden_file_path"
  val PosCol = "sys_hidden_pos"

  /** Iceberg v3 row-lineage column: row N of a data file has id
    * `firstRowId + N` unless the file MATERIALIZES this column (rewrites
    * do — that is how ids survive compaction). */
  val RowIdCol = "_row_id"
  /** Engine-reserved parquet field id for the materialized [[RowIdCol]]
    * (far above any user column, mirroring Iceberg's reserved-id
    * convention for metadata columns). */
  val RowIdFieldId = 2147483540

  /** v3's second lineage column: the sequence number of the commit that
    * last CREATED/UPDATED the row — the data file's sequence for plain
    * rows, the materialized original for rewritten rows (compaction must
    * not look like an update). */
  val LastUpdatedSeqCol = "_last_updated_seq"
  val LastUpdatedSeqFieldId = 2147483539

  private def reservedField(name: String, id: Int): org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(name,
      org.apache.spark.sql.types.LongType, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(SchemaField.ParquetFieldIdKey, id.toLong).build())
  private[graft] def rowIdField = reservedField(RowIdCol, RowIdFieldId)
  private[graft] def lastUpdatedSeqField =
    reservedField(LastUpdatedSeqCol, LastUpdatedSeqFieldId)

  /** Broadcast gate for delete sides, in manifest (compressed parquet)
    * bytes. 64 MiB compressed unpacks to a few hundred MB of hashed
    * relation — near the edge of what a driver/executor should hold; past
    * it, a shuffled join is the safe plan. */
  val BroadcastDeleteBytesMax: Long = 64L * 1024 * 1024

  /** `_metadata.file_path` is a URI (file:///x); manifest paths are plain
    * absolute paths. Normalize URIs to paths for joining. */
  def normalizePath(c: Column): Column = regexp_replace(c, "^file:/+", "/")

  /** A MANIFEST path in the exact form Spark renders
    * `_metadata.file_path` (Hadoop-canonical: empty URI authorities
    * collapse, `file:` stripped like [[normalizePath]]). Foreign clients
    * legally commit non-canonical spellings (`slowfs:///x` for
    * `slowfs:/x`); keying the per-file broadcast maps by the canonical
    * form keeps the seq-number and row-lineage joins from silently
    * missing — a miss would DROP equality deletes (null sequence never
    * wins the strict `<`), resurrecting rows. */
  def canonicalManifestPath(p: String): String = {
    val s = try new org.apache.hadoop.fs.Path(p).toString
            catch { case _: IllegalArgumentException => p }
    if (s.startsWith("file:")) s.replaceFirst("^file:/+", "/") else s
  }

  /** Reader with parquet field-id resolution enabled, SCOPED to the
    * relations it builds: the parquet source consults the session conf of
    * the relation's own session at scan planning (per-read options are
    * ignored for `spark.sql.parquet.fieldId.read.enabled` — verified
    * empirically), so the flag is set on a cloned session and the caller's
    * session is never mutated. The relation keeps the clone alive; frames
    * built here compose freely with the caller's frames. */
  def fieldIdReader(spark: SparkSession, schema: StructType): org.apache.spark.sql.DataFrameReader =
    fieldIdSession(spark).read.schema(schema)

  /** The field-id-scoped session clone [[fieldIdReader]] reads under,
    * exposed for relation builders that attach a session directly
    * ([[GraftScan.relation]]). */
  def fieldIdSession(spark: SparkSession): SparkSession = {
    val scoped = org.apache.spark.sql.graftbridge.ColumnBridge.cloneSession(spark)
    scoped.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    scoped
  }

  /** Reads DATA files with correct per-file column addressing: engine-
    * written files by parquet FIELD ID (rename-safe), add_files-imported
    * (`nameMatched`) files by NAME — their footers carry no ids, and
    * Spark's id reader resolves id-less files to all-NULL columns, so
    * they get their own relation with the id metadata stripped (initial-
    * defaults kept). `f` is applied to EACH underlying relation before
    * the union, so `_metadata.file_path`/`row_index` references inside it
    * still bind to their own scan; filters inside `f` push down per
    * branch. Every data-file read in the engine (MOR, deleteWhere, COW
    * discovery, bloom build, eq->pos conversion) goes through here.
    *
    * Typed reads are backed by [[GraftFileIndex]], so any filter Catalyst
    * pushes to the scan — from `f`, from SQL, from frames composed on
    * top — skips files by manifest zone maps / null counts / identity-
    * partition values before tasks launch. `pruneSpec` is the table's
    * CURRENT partition spec (identity fields give exact per-file
    * constants, bucket fields prune equality predicates; empty = zone
    * maps only). */
  def readDataWith(spark: SparkSession, files: Seq[FileEntry],
      typed: Option[StructType], pruneSpec: Seq[graft.meta.PartitionField] = Nil,
      statsRetired: Set[String] = Set.empty,
      metadataAggregates: Boolean = true)(
      f: DataFrame => DataFrame): DataFrame = {
    require(files.nonEmpty, "readDataWith: empty file list")
    def strippedIds(st: StructType): StructType = StructType(st.fields.map { fd =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(fd.metadata).remove(SchemaField.ParquetFieldIdKey)
      fd.copy(metadata = mb.build())
    })
    val frames = typed match {
      case None => Seq(spark.read.parquet(files.map(_.path): _*))
      case Some(st) =>
        val (byName, byId) = files.partition(_.nameMatched)
        Seq(
          if (byId.nonEmpty)
            Some(GraftScan.relation(fieldIdSession(spark), byId, st, pruneSpec, statsRetired,
              metadataAggregates))
          else None,
          if (byName.nonEmpty)
            Some(GraftScan.relation(spark, byName, strippedIds(st), pruneSpec, statsRetired,
              metadataAggregates))
          else None).flatten
    }
    frames.map(f).reduce(_ unionByName _)
  }

  private def seqMap(spark: SparkSession, files: Seq[FileEntry]): DataFrame = {
    import spark.implicits._
    files.map(f => (canonicalManifestPath(f.path), f.sequenceNumber))
      .toDF(FilePathCol, SeqNumCol)
  }

  /** Broadcast when the manifest says the delete side is small; otherwise
    * leave the join strategy to Catalyst (SMJ/SHJ — shuffles the data side,
    * but cannot OOM the driver). */
  private def gated(df: DataFrame, manifestBytes: Long, maxBytes: Long): DataFrame =
    if (manifestBytes <= maxBytes) broadcast(df) else df

  /** Position-delete `file_path` VALUES are spec'd to name the data
    * file; the scan side carries the Hadoop-canonical rendering, and
    * legal URI spellings vary BOTH ways (`scheme:///x` in a manifest for
    * a canonical `scheme:/x` value, or the inverse — a foreign writer's
    * own path type re-renders). For every scheme'd data file the remap
    * holds each plausible spelling (manifest form, canonical form's
    * empty-authority variant) -> canonical, applied as a BROADCAST left
    * join (per-row map-probe of a literal CreateMap would be a linear
    * scan over #files per delete row — quadratic at manifest scale, and
    * a codegen-breaking expression tree). Scheme-less local paths have
    * one spelling: the common case stays a driver-side no-op. */
  private def canonicalizeFilePathValues(pos: DataFrame,
      dataFiles: Seq[FileEntry]): DataFrame = {
    val remap: Seq[(String, String)] = dataFiles.flatMap { f =>
      val canon = canonicalManifestPath(f.path)
      // scheme:/p <-> scheme:///p (empty authority renders both ways)
      val variants = Seq(f.path, canon) ++
        "^([a-zA-Z][a-zA-Z0-9+.-]*):/(?!/)".r.findFirstMatchIn(canon)
          .map(m => m.group(1) + ":///" + canon.drop(m.group(1).length + 2))
      variants.distinct.filter(_ != canon).map(_ -> canon)
    }.distinct
    if (remap.isEmpty) pos
    else {
      val spark = pos.sparkSession
      import scala.jdk.CollectionConverters._
      val remapDf = spark.createDataFrame(
        remap.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__variant",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__canon",
            org.apache.spark.sql.types.StringType))))
      pos.join(broadcast(remapDf), pos(FilePathCol) === col("__variant"), "left")
        .select(coalesce(col("__canon"), pos(FilePathCol)).as(FilePathCol),
          pos(PosCol))
    }
  }

  /** Groups equality-delete files into runs of consecutive identical
    * `equalityIds`, each run becoming one anti-join (the reference's
    * consecutive-distinct grouping, datafusion_processor.rs:700-728). */
  def equalityDeleteGroups(files: Seq[FileEntry]): Seq[(Seq[String], Seq[FileEntry])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], scala.collection.mutable.ArrayBuffer[FileEntry])]
    for (f <- files) {
      if (out.nonEmpty && out.last._1 == f.equalityIds) out.last._2 += f
      else out += ((f.equalityIds, scala.collection.mutable.ArrayBuffer(f)))
    }
    out.map { case (ids, fs) => (ids, fs.toSeq) }.toSeq
  }

  /** Position-delete anti join: drop data rows whose (file_path, pos) has a
    * tombstone (datafusion_processor.rs:489-522; reference RIGHT ANTI ==
    * our LEFT ANTI).
    *
    * The delete side broadcasts only under the byte gate — same contract as
    * [[dataFrame]]. Callers holding manifest sizes pass them via
    * `deleteBytes`; otherwise Catalyst's plan-time size estimate stands in,
    * so an unexpectedly large delete relation degrades to a shuffled join
    * instead of OOMing the driver. (The reference merely *assumes* delete
    * sides are small, datafusion_processor.rs:524-571.) */
  def applyPositionDeletes(
      data: DataFrame, deletes: DataFrame,
      deleteBytes: Long = -1L,
      broadcastDeleteBytesMax: Long = BroadcastDeleteBytesMax): DataFrame = {
    val bytes =
      if (deleteBytes >= 0) deleteBytes
      else deletes.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong
    data.join(gated(deletes, bytes, broadcastDeleteBytesMax), Seq(FilePathCol, PosCol), "left_anti")
  }

  /** Equality-delete anti join: drop data rows matching a tombstone's key
    * columns with strictly newer sequence number
    * (datafusion_processor.rs:524-571). `deletes` must carry the eq columns
    * plus `delSeqCol`; empty `eqIds` degrades to the pure seq theta-join
    * (-> BroadcastNestedLoopJoin, fine: delete side broadcast). */
  def applyEqualityDeletes(
      data: DataFrame, deletes: DataFrame, eqIds: Seq[String],
      dataSeqCol: String = SeqNumCol, delSeqCol: String = "__del_seq"): DataFrame = {
    val del = deletes.select(
      eqIds.map(c => col(c).as(s"__del_$c")) :+ col(delSeqCol).as("__del_seq__"): _*)
    // plain (null-unsafe) equality, matching the reference's generated `=`
    // predicates (datafusion_processor.rs:533-545)
    val eqCond = eqIds.map(c => data(c) === col(s"__del_$c")).reduceOption(_ && _)
    val seqCond = data(dataSeqCol) < col("__del_seq__")
    val cond = eqCond.map(_ && seqCond).getOrElse(seqCond)
    data.join(broadcast(del), cond, "left_anti")
  }

  /** Applies Iceberg v3 deletion vectors ([[graft.meta.Puffin]] blobs) to a
    * frame carrying [[FilePathCol]]/[[PosCol]].
    *
    * Two plans behind the same byte gate as the anti joins:
    *  - blobs under the gate (the normal case — DVs are compressed bitmaps,
    *    orders of magnitude smaller than the rows they tombstone): the
    *    driver reads them once and the shade becomes a codegen'd scalar
    *    `!dv_contains(file, pos)` FILTER — no join, no exchange, the data
    *    side never leaves whole-stage codegen. Strictly better than the v2
    *    anti join, and the reason DVs exist;
    *  - past the gate: blob coordinates (a tiny driver-side list) are
    *    parallelized and EXECUTORS decode the bitmaps into (file, pos) rows,
    *    which feed the existing gated anti join — nothing large ever
    *    materializes on the driver. */
  def applyDeletionVectors(
      spark: SparkSession, data: DataFrame, dvEntries: Seq[FileEntry],
      broadcastDeleteBytesMax: Long = BroadcastDeleteBytesMax): DataFrame = {
    require(dvEntries.forall(e => e.isDeletionVector && e.contentSizeInBytes.isDefined),
      "applyDeletionVectors requires DV entries with content-size set")
    // referenced-data-file spellings compare against the CANONICAL
    // rendered scan path (see canonicalManifestPath) — a miss would
    // silently resurrect the DV's rows
    val dvCanon = dvEntries.map(e =>
      e.copy(referencedDataFile = e.referencedDataFile.map(canonicalManifestPath)))
    val totalBytes = dvCanon.map(_.contentSizeInBytes.get).sum
    if (dvCanon.nonEmpty && totalBytes <= broadcastDeleteBytesMax) {
      val blobs = dvCanon.map { e =>
        e.referencedDataFile.get -> graft.meta.Puffin.readBlob(
          e.path, e.contentOffset.getOrElse(0L), e.contentSizeInBytes.get)
      }.toMap
      data.filter(!graft.functions.DvExpressions.dvContains(
        col(FilePathCol), col(PosCol), blobs))
    } else {
      val pos = graft.meta.DeletionVectors.positionsFrame(spark, dvCanon)
        .select(col("file_path").as(FilePathCol), col("pos").as(PosCol))
      // blob bytes exceeded the gate, so the expanded relation is large:
      // leave the join strategy to Catalyst (shuffled, driver-safe)
      data.join(pos, Seq(FilePathCol, PosCol), "left_anti")
    }
  }

  /** Builds the MOR DataFrame for a file group.
    *
    * @param projectCols the table schema columns to produce (hidden columns
    *                    are dropped from the final result, matching the
    *                    final SELECT at datafusion_processor.rs:573-581)
    * @param formatVersion >=3 drops equality deletes from the task, as the
    *                    reference does (datafusion_processor.rs:632-648);
    *                    position deletes are always applied by our scan
    *                    layer (equivalent to V3's reader-applied deletes).
    * @param tableSchema typed field-id schema; when fully typed, data and
    *                    equality-delete files are read BY FIELD ID (rename-
    *                    safe) and equality keys resolve through
    *                    `equalityFieldIds` to their current names.
    * @param broadcastDeleteBytesMax per-join manifest-bytes gate for
    *                    broadcasting delete sides.
    * @param keepHidden  keep [[FilePathCol]]/[[PosCol]] in the output —
    *                    row lineage for consumers that must address
    *                    surviving rows physically (changelog delete
    *                    attribution, position-delete writers).
    */
  def dataFrame(
      spark: SparkSession,
      group: FileGroup,
      projectCols: Seq[String],
      formatVersion: Int = 2,
      tableSchema: Seq[SchemaField] = Nil,
      broadcastDeleteBytesMax: Long = BroadcastDeleteBytesMax,
      keepHidden: Boolean = false,
      /** emit [[RowIdCol]] (v3 row lineage): the materialized `_row_id`
        * when the file carries one, else the inherited
        * `firstRowId + row position`. Requires a typed schema. */
      keepRowIds: Boolean = false,
      /** the table's CURRENT partition spec — lets [[GraftFileIndex]]
        * prune by exact identity-partition values and bucket-transform
        * equality, beyond the zone maps. */
      pruneSpec: Seq[graft.meta.PartitionField] = Nil,
      /** retired stats names ([[graft.meta.TableMetadata.statsRetiredNames]]). */
      statsRetired: Set[String] = Set.empty,
      /** false = this frame's aggregates must come from a real scan, never
        * from manifest statistics (validation counts — see
        * [[GraftFileIndex.metadataAggregates]]). */
      metadataAggregates: Boolean = true
  ): DataFrame = {
    require(group.dataFiles.nonEmpty, "empty file group")
    val typed: Option[StructType] =
      if (tableSchema.nonEmpty && tableSchema.forall(_.isTyped))
        Some(StructType(tableSchema.map(_.toStructField)))
      else None
    require(!keepRowIds || typed.isDefined,
      "row-lineage reads require a fully typed table schema")
    // the data read schema gains the optional materialized lineage
    // fields: files that carry them (rewrites) yield values, files that
    // don't (plain appends) fill NULL and inherit from the manifest
    val dataTyped =
      if (keepRowIds)
        typed.map(st => StructType(st.fields :+ rowIdField :+ lastUpdatedSeqField))
      else typed

    // id-matched parquet reads go through the field-id-scoped reader
    // (harmless for requested schemas without ids — those match by name);
    // untyped reads use the caller's session untouched
    def readParquet(files: Seq[FileEntry], schema: Option[StructType]): DataFrame = {
      val r = schema.fold(spark.read)(fieldIdReader(spark, _))
      r.parquet(files.map(_.path): _*)
    }
    def readDataSelect(files: Seq[FileEntry], cols: Seq[Column]): DataFrame =
      readDataWith(spark, files, dataTyped, pruneSpec, statsRetired,
        metadataAggregates)(_.select(cols: _*))
    // with a typed schema, the authoritative eq key is the field-id list;
    // resolve to CURRENT names so the join condition survives renames
    def resolveEq(f: FileEntry): FileEntry =
      if (typed.isDefined && f.equalityFieldIds.nonEmpty)
        f.copy(equalityIds = f.equalityFieldIds.map(id =>
          tableSchema.find(_.id == id).getOrElse(sys.error(
            s"equality-delete field id $id not in table schema")).name))
      else f

    // EVERY format version applies equality deletes: the v3 spec replaces
    // position-delete PARQUET with deletion vectors but keeps equality
    // deletes (streaming engines' delete shape) — graft's own v3 writers
    // emit DVs, but foreign engines (REST row-delta commits, attached
    // tables) legitimately add eq-deletes to v3 tables, and skipping them
    // silently resurrects rows (caught by the v3 REST fuzz)
    val eqDeletes = group.equalityDeleteFiles.map(resolveEq)
    // v3 deletion vectors ride the position-delete content type but carry a
    // Puffin bitmap blob, not a parquet file — split them out of the
    // parquet-backed anti-join path
    val (dvEntries, posDeletes) = group.positionDeleteFiles.partition(_.isDeletionVector)
    val needSeq = eqDeletes.nonEmpty
    val needFilePos = posDeletes.nonEmpty || dvEntries.nonEmpty

    val projected = projectCols.map(col)
    val hidden = if (keepHidden) Seq(col(FilePathCol), col(PosCol)) else Nil

    // no deletes: plain projected scan (datafusion_processor.rs:447-458)
    if (!needSeq && !needFilePos && !keepHidden && !keepRowIds)
      return readDataSelect(group.dataFiles, projected)

    var df = readDataSelect(group.dataFiles,
      projected ++ Seq(normalizePath(col("_metadata.file_path")).as(FilePathCol)) ++
        (if (needFilePos || keepHidden || keepRowIds)
          Seq(col("_metadata.row_index").as(PosCol)) else Nil) ++
        (if (keepRowIds) Seq(col(RowIdCol).as("__mat_row_id"),
          col(LastUpdatedSeqCol).as("__mat_upd_seq")) else Nil))

    if (needSeq) {
      // per-file sequence number: broadcast join on the manifest map
      df = df.join(broadcast(seqMap(spark, group.dataFiles)), Seq(FilePathCol), "left")
    }

    if (posDeletes.nonEmpty) {
      // position-delete files always carry plain (file_path, pos) — not
      // table-schema columns, so never id-matched
      val pos = canonicalizeFilePathValues(readParquet(posDeletes, None)
        .select(col("file_path").as(FilePathCol), col("pos").as(PosCol)),
        group.dataFiles)
      df = df.join(gated(pos, posDeletes.map(_.length).sum, broadcastDeleteBytesMax),
        Seq(FilePathCol, PosCol), "left_anti")
    }

    if (dvEntries.nonEmpty)
      df = applyDeletionVectors(spark, df, dvEntries, broadcastDeleteBytesMax)

    // one anti join per equality-ids run, in manifest order
    // (datafusion_processor.rs:524-571)
    for ((eqIds, files) <- equalityDeleteGroups(eqDeletes)) {
      val delSchema = typed.map(_ => StructType(eqIds.map(n =>
        tableSchema.find(_.name == n).getOrElse(sys.error(
          s"equality-delete column $n not in table schema")).toStructField)))
      val delRaw = readParquet(files, delSchema)
        .select(eqIds.map(col) :+ normalizePath(col("_metadata.file_path")).as(FilePathCol): _*)
        .join(broadcast(seqMap(spark, files)), Seq(FilePathCol), "left")
      val del = delRaw.select(
        eqIds.map(c => col(c).as(s"__del_$c")) :+ col(SeqNumCol).as("__del_seq__"): _*)
      val eqCond = eqIds.map(c => df(c) === col(s"__del_$c")).reduceOption(_ && _)
      val seqCond = df(SeqNumCol) < col("__del_seq__")
      val cond = eqCond.map(_ && seqCond).getOrElse(seqCond)
      // empty-keys theta join stays broadcast regardless: a non-broadcast
      // nested-loop over two big sides has no good plan anyway, and the
      // reference emits the same degenerate shape
      val gatedDel =
        if (eqIds.isEmpty) broadcast(del)
        else gated(del, files.map(_.length).sum, broadcastDeleteBytesMax)
      df = df.join(gatedDel, cond, "left_anti")
    }

    if (!keepRowIds) df.select(projected ++ hidden: _*)
    else {
      // inherited half: the per-file firstRowId range from the manifest
      // (tiny broadcast map, like the sequence numbers); files without an
      // assigned range (pre-v3 history) yield NULL ids rather than lies
      import scala.jdk.CollectionConverters._
      val rowMap = spark.createDataFrame(
        group.dataFiles.map(f => org.apache.spark.sql.Row(
          canonicalManifestPath(f.path), f.firstRowId.map(Long.box).orNull,
          Long.box(f.sequenceNumber))).asJava,
        StructType(Seq(
          org.apache.spark.sql.types.StructField(FilePathCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__first_row_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__file_seq",
            org.apache.spark.sql.types.LongType))))
      val withIds = df.join(broadcast(rowMap), Seq(FilePathCol), "left")
      withIds.select(projected ++ hidden :+
        coalesce(col("__mat_row_id"), col("__first_row_id") + col(PosCol))
          .as(RowIdCol) :+
        coalesce(col("__mat_upd_seq"), col("__file_seq"))
          .as(LastUpdatedSeqCol): _*)
    }
  }
}
