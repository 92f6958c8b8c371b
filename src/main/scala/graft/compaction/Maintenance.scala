package graft.compaction

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.meta._

/** Table maintenance: snapshot expiry and orphan-file detection. The
  * reference lists these as roadmap items (README.md:49-86) — they are
  * required to close the storage loop once compaction rewrites files, so
  * rewritten data files eventually get reclaimed.
  *
  * All metadata-only driver-side work; deletion itself is explicit and
  * separate from detection so callers can dry-run.
  */
object Maintenance {

  /** Keeps the `keepLast` newest snapshots (plus every snapshot a branch
    * ref points at); commits the trimmed metadata via CAS retry. */
  def expireSnapshots(catalog: Catalog, tableName: String, keepLast: Int,
      retry: CommitRetryConfig = CommitRetryConfig()): TableMetadata = {
    require(keepLast >= 1, "keepLast must be >= 1")
    var attempt = 0
    while (true) {
      val meta = catalog.loadTable(tableName)
      val byAge = meta.snapshots.sortBy(-_.snapshotId)
      val pinned = meta.refs.values.toSet ++ meta.currentSnapshotId.toSet
      val keep = (byAge.take(keepLast).map(_.snapshotId).toSet ++ pinned)
      val trimmed = meta.copy(snapshots = meta.snapshots.filter(s => keep.contains(s.snapshotId)))
      try return catalog.commit(meta, trimmed)
      catch {
        case _: CommitConflictException if attempt < retry.maxRetries => attempt += 1
        case e: Throwable => throw e
      }
    }
    sys.error("unreachable")
  }

  /** Default orphan grace period: 3 days, same as Iceberg's
    * removeOrphanFiles `olderThan` default — files land on disk BEFORE the
    * metadata commit that references them, so a writer in flight always
    * has some "orphan-looking" files; the age cutoff is what keeps GC from
    * eating them. */
  val DefaultOrphanGraceMs: Long = 3L * 24 * 60 * 60 * 1000

  /** Files under the table's data directory referenced by NO live
    * snapshot AND last-modified more than `olderThanMs` ago — safe to
    * delete after expiry. Detection only.
    *
    * The grace period exists because file writes precede the metadata
    * commit: an in-flight append/rewrite's files are unreferenced until
    * its CAS lands, and deleting them makes the subsequent commit point at
    * missing data. Pass a small `olderThanMs` ONLY when no writer can be
    * concurrent (e.g. tests). */
  def orphanFiles(catalog: Catalog, tableName: String,
      olderThanMs: Long = DefaultOrphanGraceMs): Seq[String] = {
    val meta = catalog.loadTable(tableName)
    val live = meta.snapshots.flatMap(_.manifest.map(_.path)).toSet
    val dataDir = Paths.get(meta.location, "data")
    if (!Files.exists(dataDir)) return Nil
    val cutoff = System.currentTimeMillis() - math.max(0L, olderThanMs)
    Files.walk(dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .map(_.toString)
      .filterNot(live.contains)
      .toSeq.sorted
  }

  /** Deletes the given orphans (paths must come from [[orphanFiles]],
    * called with the same `olderThanMs`). */
  def deleteOrphans(catalog: Catalog, tableName: String, paths: Seq[String],
      olderThanMs: Long = DefaultOrphanGraceMs): Int = {
    val current = orphanFiles(catalog, tableName, olderThanMs).toSet
    val deletable = paths.filter(current.contains) // re-check before deleting
    deletable.count(p => Files.deleteIfExists(Paths.get(p)))
  }
}
