package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-driven table MIRRORING: replays a source table's changelog into a
  * destination table, commit by commit — the replication/downstream-sync
  * story ([[MaterializedView]] is the aggregate cousin; this one carries
  * rows). Built entirely from shipped parts: [[ChangeFeed]] supplies
  * ordered exactly-once-per-snapshot frames with a durable checkpoint,
  * and each frame applies as
  *
  *  - one atomic [[IceWrite.upsert]] for the inserted rows (an update's
  *    delete+insert pair collapses into the upsert — its equality delete
  *    already erases the old version), and
  *  - one equality-delete commit for keys deleted WITHOUT reinsertion;
  *
  * both applications are idempotent BY VALUE, so the crash edge of the
  * checkpoint contract (a snapshot re-delivered after a crash between
  * handling and checkpointing) converges instead of duplicating —
  * re-upserting the same rows and re-deleting the same keys are no-ops in
  * the MOR view. Physical rewrites (compaction) produce empty frames and
  * advance the checkpoint silently, so the mirror never re-copies data
  * the source merely reorganized.
  *
  * At scale each poll moves only the CHANGED rows (the changelog is the
  * snapshot delta), never the table; the destination may live in a
  * different catalog entirely (local -> REST, or across warehouses).
  */
object TableSync {

  /** Creates/advances the mirror `dstName` (in `dstCatalog`) of
    * `srcName` (in `srcCatalog`). Returns the number of source snapshots
    * applied this call. Run on a schedule to tail; `checkpointFile`
    * carries the position across restarts. `keys` are the row identity
    * (the upsert/delete key). */
  def mirror(spark: SparkSession,
      srcCatalog: Catalog, srcName: String,
      dstCatalog: Catalog, dstName: String,
      keys: Seq[String], checkpointFile: String,
      branch: String = "main"): Int = {
    require(keys.nonEmpty, "mirror needs at least one key column")
    val feed = new ChangeFeed(spark, srcCatalog, srcName, checkpointFile, branch)
    // ONE materialization per snapshot: the changelog frame is a MOR
    // diff plan, and the apply below reads it up to five times (insert
    // split, emptiness probes, upsert write, pure-delete anti join) —
    // each read re-ran the whole diff. The frame is the snapshot's
    // change volume, the same rows the upsert writes anyway. It runs in
    // pollPrepared's PREFETCH slot: snapshot k+1's diff (pure reads of
    // the immutable source) materializes while snapshot k's commits
    // apply to the destination, instead of serializing with them.
    feed.pollPrepared((rawFrame, _) => rawFrame.localCheckpoint(true)) { (frame, _) =>
      val dataCols = frame.columns.filterNot(c =>
        c == Changelog.ChangeTypeCol || c == Changelog.SnapshotIdCol).toSeq
      val ins = frame.filter(col(Changelog.ChangeTypeCol) === "insert")
        .select(dataCols.map(col): _*)
      // Per-KEY change profile: one groupBy over the checkpointed blocks
      // carries has-insert/has-delete flags per key group, so a single
      // driver action answers ALL THREE gates (any insert, any pure
      // delete) and the pure-delete key set itself is a filter over the
      // same relation — the r11 form still paid a separate
      // `pureDel.isEmpty` job (plus a delKeys-anti-insKeys join plan)
      // inside the nDel>0 branch, per delete-bearing snapshot, forever.
      // A key group with a NULL component keeps the anti-join semantics
      // it replaces: null keys never equi-match, so such deletes are
      // pure deletes even when the same null-keyed row was re-inserted.
      val isIns = when(col(Changelog.ChangeTypeCol) === "insert", 1).otherwise(0)
      val isDel = when(col(Changelog.ChangeTypeCol) === "delete", 1).otherwise(0)
      val perKey = frame.groupBy(keys.map(col): _*)
        .agg(max(isIns).as("__ins"), max(isDel).as("__del"))
      val nullKey = keys.map(col(_).isNull).reduce(_ || _)
      val pureDelPred = col("__del") === 1 && (col("__ins") === 0 || nullKey)
      val gates = perKey.agg(
        sum(col("__ins")).as("__nins"),
        sum(when(pureDelPred, 1L).otherwise(0L)).as("__npure")).head
      val (nIns, nPure) = (if (gates.isNullAt(0)) 0L else gates.getLong(0),
        if (gates.isNullAt(1)) 0L else gates.getLong(1))
      if (!dstCatalog.tableExists(dstName))
        IceWrite.create(spark, dstCatalog, dstName, ins.limit(0)): Unit
      if (nIns > 0)
        IceWrite.upsert(spark, dstCatalog, dstName, ins, keys): Unit
      // keys deleted without reinsertion (updates were handled by the
      // upsert's own equality delete)
      if (nPure > 0) {
        val pureDel = perKey.filter(pureDelPred).select(keys.map(col): _*)
        // REBALANCE: the aggregate inherits the frame's partitioning and
        // would write one tiny tombstone file per partition
        IceWrite.appendEqualityDeletes(spark, dstCatalog, dstName,
          pureDel.hint("rebalance"), keys): Unit
      }
    }
  }
}
