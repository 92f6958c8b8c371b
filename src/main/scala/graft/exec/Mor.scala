package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.FileEntry
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
  *  - delete sides are explicitly `broadcast()` — delete files are small
  *    relative to data by construction, so each anti join stays a
  *    BroadcastHashJoin with zero shuffle of the data side, which is the
  *    plan you want at 100 TB (shuffle-free scan -> joins -> write).
  */
object Mor {
  val SeqNumCol = "sys_hidden_seq_num"
  val FilePathCol = "sys_hidden_file_path"
  val PosCol = "sys_hidden_pos"

  /** `_metadata.file_path` is a URI (file:///x); manifest paths are plain
    * absolute paths. Normalize URIs to paths for joining. */
  def normalizePath(c: Column): Column = regexp_replace(c, "^file:/+", "/")

  private def seqMap(spark: SparkSession, files: Seq[FileEntry]): DataFrame = {
    import spark.implicits._
    files.map(f => (f.path, f.sequenceNumber)).toDF(FilePathCol, SeqNumCol)
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
    * our LEFT ANTI). The delete side is broadcast: no data-side shuffle. */
  def applyPositionDeletes(data: DataFrame, deletes: DataFrame): DataFrame =
    data.join(broadcast(deletes), Seq(FilePathCol, PosCol), "left_anti")

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

  /** Builds the MOR DataFrame for a file group.
    *
    * @param projectCols the table schema columns to produce (hidden columns
    *                    are dropped from the final result, matching the
    *                    final SELECT at datafusion_processor.rs:573-581)
    * @param formatVersion >=3 drops equality deletes from the task, as the
    *                    reference does (datafusion_processor.rs:632-648);
    *                    position deletes are always applied by our scan
    *                    layer (equivalent to V3's reader-applied deletes).
    */
  def dataFrame(
      spark: SparkSession,
      group: FileGroup,
      projectCols: Seq[String],
      formatVersion: Int = 2
  ): DataFrame = {
    require(group.dataFiles.nonEmpty, "empty file group")
    val eqDeletes = if (formatVersion >= 3) Nil else group.equalityDeleteFiles
    val posDeletes = group.positionDeleteFiles
    val needSeq = eqDeletes.nonEmpty
    val needFilePos = posDeletes.nonEmpty

    val base = spark.read.parquet(group.dataFiles.map(_.path): _*)
    val projected = projectCols.map(col)

    // no deletes: plain projected scan (datafusion_processor.rs:447-458)
    if (!needSeq && !needFilePos) return base.select(projected: _*)

    var df = base.select(
      projected ++ Seq(normalizePath(col("_metadata.file_path")).as(FilePathCol)) ++
        (if (needFilePos) Seq(col("_metadata.row_index").as(PosCol)) else Nil): _*)

    if (needSeq) {
      // per-file sequence number: broadcast join on the manifest map
      df = df.join(broadcast(seqMap(spark, group.dataFiles)), Seq(FilePathCol), "left")
    }

    if (needFilePos) {
      val pos = spark.read.parquet(posDeletes.map(_.path): _*)
        .select(col("file_path").as(FilePathCol), col("pos").as(PosCol))
      df = applyPositionDeletes(df, pos)
    }

    // one anti join per equality-ids run, in manifest order
    // (datafusion_processor.rs:524-571)
    for ((eqIds, files) <- equalityDeleteGroups(eqDeletes)) {
      val del = spark.read.parquet(files.map(_.path): _*)
        .select(eqIds.map(col) :+ normalizePath(col("_metadata.file_path")).as(FilePathCol): _*)
        .join(broadcast(seqMap(spark, files)), Seq(FilePathCol), "left")
      df = applyEqualityDeletes(df, del, eqIds, SeqNumCol, SeqNumCol)
    }

    df.select(projected: _*)
  }
}
