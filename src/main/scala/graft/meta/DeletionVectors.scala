package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared deletion-vector assembly: positions -> per-file bitmap blobs ->
  * Puffin container + manifest entries. Used by the v3 maintenance
  * conversion ([[graft.compaction.Maintenance.convertPositionDeletesToDVs]])
  * and the native v3 delete writer ([[IceWrite.deleteWhereDv]]).
  */
object DeletionVectors {

  /** One DV ready to commit: referenced data file, encoded blob payload,
    * tombstoned-position count. */
  final case class DvBlob(referencedDataFile: String, blob: Array[Byte], cardinality: Long)

  /** Driver-side blob-assembly budget: below this estimate the encoded
    * blobs collect to the driver (one container, simplest commit); above
    * it the containers are written EXECUTOR-side ([[writeEntriesStreamed]])
    * and only manifest coordinates return. Same order as
    * [[graft.exec.Mor.BroadcastDeleteBytesMax]]. */
  val MaxDriverBlobBytes: Long = 64L * 1024 * 1024

  /** Upper-bound estimate of the total encoded blob bytes for a
    * (file_path, pos) frame: roaring bitmaps cost at most ~2 bytes per
    * set position plus fixed per-file framing. One aggregate job. */
  def estimateBlobBytes(positions: DataFrame): Long = {
    import org.apache.spark.sql.functions.{count, countDistinct, lit}
    val r = positions.agg(count(lit(1)).as("n"),
      countDistinct(org.apache.spark.sql.functions.col("file_path")).as("f")).head()
    2L * r.getLong(0) + 64L * r.getLong(1)
  }

  /** The driver gate decision. Deliberately an EXACT counting aggregate,
    * not a plan-stats shortcut: Spark's size-only estimator scales leaf
    * bytes by default column widths and can UNDER-estimate a wide,
    * well-compressed table's row count — an "estimate says small" fast
    * path could route a dense delete onto the driver-collect path the
    * gate exists to prevent. The aggregate reads only the two projected
    * columns under the delete predicate; that one cheap extra pass is
    * the price of a gate that cannot be fooled. */
  def underDriverGate(positions: DataFrame, maxDriverBlobBytes: Long): Boolean =
    estimateBlobBytes(positions) <= maxDriverBlobBytes

  /** Builds one encoded blob per referenced data file from a (file_path,
    * pos) frame. Bitmaps are assembled EXECUTOR-side — one aggregate keyed
    * by data file — and only the compressed blobs return to the driver.
    * For delete passes whose [[estimateBlobBytes]] exceeds
    * [[MaxDriverBlobBytes]], use [[writeEntriesStreamed]] instead: this
    * collect is unbounded in the number of tombstoned positions. */
  def buildBlobs(spark: SparkSession, positions: DataFrame): Seq[DvBlob] = {
    import spark.implicits._
    positions.select("file_path", "pos").as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val bm = Puffin.PositionBitmap.empty
        it.foreach(t => bm.add(t._2))
        (file, Puffin.encodeDvBlob(bm), bm.cardinality)
      }
      .collect().toSeq
      .map { case (f, b, c) => DvBlob(f, b, c) }
      .sortBy(_.referencedDataFile)
  }

  /** The scale path past the driver gate: builds, merges, and WRITES the
    * deletion vectors entirely executor-side — one grouped aggregate keyed
    * by data file builds each bitmap, any pre-existing DV for that file is
    * range-read and unioned in place, and each task streams its blobs into
    * its own Puffin container under `location/deletes/`. Only the manifest
    * coordinates (path, offset, length, cardinality — a few rows per data
    * file) return to the driver, so a delete-everything pass over a huge
    * table never assembles blob bytes driver-side. The multi-container
    * result is spec-fine: entries address blobs by (path, offset, length).
    *
    * `existingDv` maps referenced data file -> (container path, offset,
    * length) of the DV to union; `partitionOf` supplies each entry's
    * partition values. */
  def writeEntriesStreamed(spark: SparkSession, positions: DataFrame,
      existingDv: Map[String, (String, Long, Long)],
      location: String, snapshotId: Long, sequenceNumber: Long,
      partitionOf: String => Map[String, String]): Seq[FileEntry] = {
    import spark.implicits._
    val dir = MetaIO.join(location, "deletes")
    MetaIO.mkdirs(dir)
    // ship the driver's spark.hadoop.* conf: executors have no session,
    // and the bare-Configuration fallback would drop object-store creds
    val shippedConf = MetaIO.serializableConf()
    val coords = positions.select("file_path", "pos").as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        MetaIO.installExecutorConf(shippedConf) // readBlob below hits the FS
        val bm = Puffin.PositionBitmap.empty
        it.foreach(t => bm.add(t._2))
        existingDv.get(file).foreach { case (p, off, len) =>
          Puffin.decodeDvBlob(Puffin.readBlob(p, off, len)).positions.foreach(bm.add)
        }
        (file, Puffin.encodeDvBlob(bm), bm.cardinality)
      }
      .mapPartitions { it =>
        MetaIO.installExecutorConf(shippedConf)
        val blobs = it.toSeq
        if (blobs.isEmpty) Iterator.empty
        else {
          val path = MetaIO.join(dir,
            s"dv-${java.util.UUID.randomUUID().toString.take(12)}.puffin")
          val metas = Puffin.write(path, blobs.map { case (f, b, c) =>
            Puffin.Blob(Puffin.DvBlobType, b, snapshotId, sequenceNumber,
              properties = Map("referenced-data-file" -> f, "cardinality" -> c.toString))
          })
          val size = MetaIO.size(path)
          blobs.zip(metas).iterator.map { case ((f, _, c), bm) =>
            (path, size, f, bm.offset, bm.length, c)
          }
        }
      }
      .collect().toSeq.sortBy(t => (t._1, t._4))
    coords.map { case (path, size, file, off, len, card) =>
      FileEntry(
        path = path, length = size,
        content = FileContent.PositionDeletes, recordCount = card,
        sequenceNumber = sequenceNumber,
        partitionValues = partitionOf(file),
        referencedDataFile = Some(file),
        contentOffset = Some(off), contentSizeInBytes = Some(len))
    }
  }

  /** Unions fresh blobs into any pre-existing DVs for the same data files
    * (the spec allows at most one DV per data file; the old entry gets
    * replaced by the union). */
  def mergeWithExisting(blobs: Seq[DvBlob], existing: Map[String, FileEntry]): Seq[DvBlob] =
    blobs.map { b =>
      existing.get(b.referencedDataFile) match {
        case Some(old) =>
          val bm = Puffin.decodeDvBlob(Puffin.readBlob(
            old.path, old.contentOffset.getOrElse(0L), old.contentSizeInBytes.get))
          Puffin.decodeDvBlob(b.blob).positions.foreach(bm.add)
          DvBlob(b.referencedDataFile, Puffin.encodeDvBlob(bm), bm.cardinality)
        case None => b
      }
    }.sortBy(_.referencedDataFile)

  /** Expands DV entries into a (file_path, pos) frame, decoding blobs on
    * EXECUTORS — only the (tiny) blob coordinate list leaves the driver,
    * so arbitrarily large vectors never materialize driver-side. */
  def positionsFrame(spark: SparkSession, dvEntries: Seq[FileEntry]): DataFrame = {
    require(dvEntries.forall(e => e.isDeletionVector && e.contentSizeInBytes.isDefined),
      "positionsFrame requires DV entries with content-size set")
    import spark.implicits._
    val coords = dvEntries.map(e =>
      (e.path, e.contentOffset.getOrElse(0L), e.contentSizeInBytes.get,
        e.referencedDataFile.get))
    spark.createDataset(coords).flatMap { case (path, off, len, referenced) =>
      val bytes = Puffin.readBlob(path, off, len)
      Puffin.decodeDvBlob(bytes).positions.map(p => (referenced, p))
    }.toDF("file_path", "pos")
  }

  /** Writes the blobs into one fresh Puffin container under
    * `location/deletes/` and returns the manifest entries to commit. */
  def writeEntries(location: String, blobs: Seq[DvBlob], snapshotId: Long,
      sequenceNumber: Long, partitionOf: String => Map[String, String]): Seq[FileEntry] = {
    if (blobs.isEmpty) return Nil
    val dir = MetaIO.join(location, "deletes")
    MetaIO.mkdirs(dir)
    val puffinPath = MetaIO.join(dir,
      s"dv-${java.util.UUID.randomUUID().toString.take(12)}.puffin")
    val blobMetas = Puffin.write(puffinPath, blobs.map { b =>
      Puffin.Blob(Puffin.DvBlobType, b.blob, snapshotId, sequenceNumber,
        properties = Map(
          "referenced-data-file" -> b.referencedDataFile,
          "cardinality" -> b.cardinality.toString))
    })
    val puffinSize = MetaIO.size(puffinPath)
    blobs.zip(blobMetas).map { case (b, bm) =>
      FileEntry(
        path = puffinPath, length = puffinSize,
        content = FileContent.PositionDeletes, recordCount = b.cardinality,
        sequenceNumber = sequenceNumber,
        partitionValues = partitionOf(b.referencedDataFile),
        referencedDataFile = Some(b.referencedDataFile),
        contentOffset = Some(bm.offset), contentSizeInBytes = Some(bm.length))
    }
  }
}
