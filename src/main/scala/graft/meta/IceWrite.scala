package graft.meta

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exec.SparkExecutor
import graft.selection.Defaults

/** Write/ingest API for the table format: create, append, and MOR delete
  * files, each committed as a CAS-retried snapshot. Together with
  * [[IceRead]] this closes the loop — a pipeline can ingest (batch or
  * streaming via foreachBatch), delete by key or position, query the MOR
  * view, compact, and garbage-collect, all against the same metadata.
  */
object IceWrite {

  /** Creates the table and commits the DataFrame as snapshot 1. */
  def create(
      spark: SparkSession,
      catalog: LocalCatalog,
      name: String,
      df: DataFrame,
      partitionSpec: Seq[PartitionField] = Nil,
      sortOrder: Seq[SortField] = Nil,
      formatVersion: Int = 2,
      targetFileSizeBytes: Long = Defaults.TargetFileSize): TableMetadata = {
    val schema = SchemaField.fromStruct(df.schema)
    val meta = catalog.createTable(TableMetadata(
      name = name, location = "", formatVersion = formatVersion,
      schema = schema, lastColumnId = schema.map(_.id).foldLeft(0)(math.max),
      partitionSpec = partitionSpec, sortOrder = sortOrder))
    appendInternal(spark, catalog, meta.name, df, FileContent.Data, Nil, targetFileSizeBytes)
  }

  /** Appends rows as new data files (new snapshot, fresh sequence number). */
  def append(spark: SparkSession, catalog: LocalCatalog, name: String, df: DataFrame,
      targetFileSizeBytes: Long = Defaults.TargetFileSize): TableMetadata =
    appendInternal(spark, catalog, name, df, FileContent.Data, Nil, targetFileSizeBytes)

  /** Appends an equality-delete file: every existing row whose `equalityIds`
    * columns match a key row (and whose sequence number is older) vanishes
    * from the MOR view. `keys` must contain exactly the equality columns. */
  def appendEqualityDeletes(spark: SparkSession, catalog: LocalCatalog, name: String,
      keys: DataFrame, equalityIds: Seq[String]): TableMetadata = {
    require(keys.columns.toSeq.sorted == equalityIds.sorted,
      s"keys columns ${keys.columns.toSeq} must equal equalityIds $equalityIds")
    appendInternal(spark, catalog, name, keys.select(equalityIds.map(org.apache.spark.sql.functions.col): _*),
      FileContent.EqualityDeletes, equalityIds, Defaults.TargetFileSize)
  }

  /** Appends a position-delete file; `positions` needs (file_path, pos). */
  def appendPositionDeletes(spark: SparkSession, catalog: LocalCatalog, name: String,
      positions: DataFrame): TableMetadata = {
    require(positions.columns.toSet == Set("file_path", "pos"),
      "positions must have columns (file_path, pos)")
    appendInternal(spark, catalog, name, positions, FileContent.PositionDeletes, Nil,
      Defaults.TargetFileSize)
  }

  /** foreachBatch sink for Structured Streaming ingestion:
    * {{{ ds.writeStream.foreachBatch(IceWrite.streamingAppend(catalog, name)).start() }}}
    * Each micro-batch commits one snapshot (CAS-retried, so concurrent
    * writers interleave safely). */
  def streamingAppend(catalog: LocalCatalog, name: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) { append(batch.sparkSession, catalog, name, batch): Unit }

  /** Stamps each column with its stable field id so the parquet writer puts
    * ids in the file footer (Spark's `parquet.field.id` metadata +
    * `spark.sql.parquet.fieldId.write.enabled`) — the write half of rename-
    * safe id-addressed reads. Columns are emitted in table-schema order;
    * absent (newly added, nullable) columns are simply not written and read
    * back as NULL by id. */
  private def withFieldIds(df: DataFrame, schema: Seq[SchemaField]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val names = schema.map(_.name).toSet
    val unknown = df.columns.filterNot(names.contains)
    require(unknown.isEmpty, s"columns not in table schema: ${unknown.mkString(",")}")
    val present = df.columns.toSet
    df.select(schema.filter(f => present.contains(f.name)).map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(SchemaField.ParquetFieldIdKey, f.id.toLong).build()
      col(f.name).as(f.name, md)
    }: _*)
  }

  private def appendInternal(
      spark: SparkSession,
      catalog: LocalCatalog,
      name: String,
      df: DataFrame,
      content: FileContent.Value,
      equalityIds: Seq[String],
      targetFileSizeBytes: Long): TableMetadata = {
    val table0 = catalog.loadTable(name)
    val typed = table0.schema.nonEmpty && table0.schema.forall(_.isTyped)
    // data and equality-delete files carry table-schema columns -> stamp
    // field ids; position deletes carry (file_path, pos), never id-matched
    val out =
      if (typed && content != FileContent.PositionDeletes) withFieldIds(df, table0.schema)
      else df
    val eqFieldIds =
      if (typed && content == FileContent.EqualityDeletes)
        equalityIds.map(n => table0.fieldByName(n).getOrElse(
          throw new IllegalArgumentException(s"equality column $n not in schema")).id)
      else Nil
    // write the files once; only the metadata commit retries on conflict
    val rowsEstimate = math.max(1L, targetFileSizeBytes / 256L) // ~256 B/row guess pre-stats
    val written = SparkExecutor.writeDataFiles(
      spark, out, Paths.get(table0.location, "data").toString,
      if (content == FileContent.Data) table0.partitionSpec else Nil,
      if (content == FileContent.Data) table0.sortOrder else Nil,
      maxRecordsPerFile = rowsEstimate)
    require(written.nonEmpty || df.isEmpty, s"append to $name wrote no files")

    var attempt = 0
    while (true) {
      val meta = catalog.loadTable(name)
      val current = meta.currentSnapshot
      val newSeq = meta.lastSequenceNumber + 1
      val stamped = written.map(_.copy(
        content = content, sequenceNumber = newSeq, equalityIds = equalityIds,
        equalityFieldIds = eqFieldIds))
      val snapshotId = meta.snapshots.map(_.snapshotId).foldLeft(0L)(math.max) + 1
      val snap = Snapshot(
        snapshotId = snapshotId,
        parentId = current.map(_.snapshotId),
        sequenceNumber = newSeq,
        timestampMs = System.currentTimeMillis(),
        manifest = current.map(_.manifest).getOrElse(Nil) ++ stamped,
        summary = Map("operation" -> (if (content == FileContent.Data) "append" else "delete")))
      val updated = meta.copy(
        currentSnapshotId = Some(snapshotId),
        refs = meta.refs + ("main" -> snapshotId),
        snapshots = meta.snapshots :+ snap,
        lastSequenceNumber = newSeq)
      try return catalog.commit(meta, updated)
      catch { case _: CommitConflictException if attempt < 5 => attempt += 1 }
    }
    sys.error("unreachable")
  }
}
