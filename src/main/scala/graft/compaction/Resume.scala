package graft.compaction

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.meta.{Catalog, FileEntry, MetadataJson, MetaIO}
import graft.selection.FileGroup

/** Durable rewrite journal backing [[Compaction.compactResumable]] — the
  * reference roadmap's "Task breakpoint resume" (README.md:61,
  * unimplemented there). A compaction run's expensive part is the group
  * rewrites (the full MOR scan + write per group); the commit is one
  * cheap metadata CAS at the end. The journal makes the expensive part
  * restartable: after each group's rewrite completes, its (input-set
  * key -> added file entries) is persisted under the table's metadata
  * dir, so a rerun with the same runId reuses every journaled rewrite —
  * the already-written parquet is committed, not re-scanned.
  *
  * Safety properties:
  *  - The journal binds to the snapshot the plans were made against; a
  *    resume whose replanned snapshot differs discards it (stale outputs
  *    become orphans for [[Maintenance.orphanFiles]]).
  *  - A journaled group is only reused if every recorded output file
  *    still exists (a half-crashed write that never journaled simply
  *    reruns; a journaled entry whose files were swept reruns too).
  *  - The journal file is rewritten whole per append (entries are file
  *    METADATA — tens of bytes per output file); a torn/corrupt journal
  *    parses as empty and the run degrades to a full rerun, never to a
  *    wrong commit.
  *  - On successful commit the journal is deleted. */
final class RewriteJournal(catalog: Catalog, tableName: String, val runId: String) {
  require(runId.matches("[A-Za-z0-9_.-]+"), s"runId must be a path-safe token: $runId")

  private val path: String = MetaIO.join(
    catalog.loadTable(tableName).location, "metadata", s"rewrite-journal-$runId.json")

  private var snapshotId: Long = -1L
  private val entries = scala.collection.mutable.LinkedHashMap.empty[String, Seq[FileEntry]]

  /** Loads journaled rewrites for a run planned against `forSnapshotId`.
    * Returns the group-key -> added-entries map (empty when absent,
    * snapshot-stale, or unparseable). */
  def load(forSnapshotId: Long): Map[String, Seq[FileEntry]] = synchronized {
    snapshotId = forSnapshotId
    entries.clear()
    if (MetaIO.exists(path)) {
      try {
        val j = JsonMethods.parse(MetaIO.readString(path))
        val snap = j \ "snapshot-id" match { case JInt(v) => v.toLong; case JLong(v) => v; case _ => -1L }
        if (snap == forSnapshotId) {
          (j \ "entries") match {
            case JArray(xs) => xs.foreach { e =>
              val key = e \ "group-key" match { case JString(s) => s; case _ => "" }
              if (key.nonEmpty)
                entries(key) = MetadataJson.fileEntriesFromJson(e \ "added")
            }
            case _ => ()
          }
        }
      } catch { case _: Exception => entries.clear() } // torn journal = no journal
    }
    entries.toMap
  }

  /** Records one completed group rewrite. Thread-safe (the concurrent
    * plan pool calls this from worker threads); each append persists the
    * full journal — entry count is the plan count, so the rewrite is
    * always >> the journal I/O. */
  def append(groupKey: String, added: Seq[FileEntry]): Unit = synchronized {
    entries(groupKey) = added
    val j = JObject(
      "run-id" -> JString(runId),
      "snapshot-id" -> JLong(snapshotId),
      "entries" -> JArray(entries.toList.map { case (k, fs) =>
        JObject("group-key" -> JString(k), "added" -> MetadataJson.fileEntriesToJson(fs))
      }))
    MetaIO.writeString(path, JsonMethods.compact(JsonMethods.render(j)))
  }

  def delete(): Unit = synchronized {
    if (MetaIO.exists(path)) MetaIO.delete(path): Unit
  }
}

object RewriteJournal {
  /** Identity of a planned group across runs: the sorted input data-file
    * paths (the plan is a pure function of snapshot + config, but group
    * ORDER could drift, so the key must not be positional). */
  def groupKey(g: FileGroup): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    g.dataFiles.map(_.path).sorted.foreach(p => md.update(p.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }
}
