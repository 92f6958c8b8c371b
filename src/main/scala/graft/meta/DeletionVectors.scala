package graft.meta

import java.nio.file.{Files, Paths}

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

  /** Builds one encoded blob per referenced data file from a (file_path,
    * pos) frame. Bitmaps are assembled EXECUTOR-side — one aggregate keyed
    * by data file — and only the compressed blobs return to the driver. */
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
    val dir = Paths.get(location, "deletes")
    Files.createDirectories(dir)
    val puffinPath = dir.resolve(
      s"dv-${java.util.UUID.randomUUID().toString.take(12)}.puffin").toString
    val blobMetas = Puffin.write(puffinPath, blobs.map { b =>
      Puffin.Blob(Puffin.DvBlobType, b.blob, snapshotId, sequenceNumber,
        properties = Map(
          "referenced-data-file" -> b.referencedDataFile,
          "cardinality" -> b.cardinality.toString))
    })
    val puffinSize = Files.size(Paths.get(puffinPath))
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
