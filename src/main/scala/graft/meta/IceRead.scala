package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exec.Mor
import graft.selection.FileGroup

/** User-facing read API: the merge-on-read view of a committed table —
  * what a query engine on top of this format would expose as
  * `spark.read.format("icelite").table(name)`.
  *
  * Builds one [[FileGroup]] from the branch snapshot's scan tasks and
  * returns [[Mor.dataFrame]] over it: data parquet scan, broadcast anti
  * joins against live position/equality deletes, hidden columns dropped.
  * The plan is the same shape the compaction rewrite executes, so reads
  * scale identically (no shuffle on the data path).
  */
object IceRead {

  def table(spark: SparkSession, catalog: Catalog, name: String, branch: String = "main"): DataFrame = {
    val meta = catalog.loadTable(name)
    // strict on explicit branches: silently reading another branch's data
    // would be surprising; only "main" may fall back to the current
    // snapshot (pre-refs tables)
    val snap = (if (branch == "main") meta.snapshotForRef(branch).orElse(meta.currentSnapshot)
                else meta.snapshotForRef(branch))
      .getOrElse(throw new IllegalStateException(s"table $name has no snapshot on branch $branch"))
    val tasks = meta.scanTasks(snap)
    require(tasks.nonEmpty, s"table $name is empty")
    val byPath = snap.manifest.map(f => f.path -> f).toMap
    val group = FileGroup.fromDataFiles(tasks, byPath.get)
    Mor.dataFrame(spark, group, meta.schemaColumns, meta.formatVersion)
  }

  /** Registers the MOR view as a temp view for SQL access. */
  def createTempView(spark: SparkSession, catalog: Catalog, name: String,
      viewName: String, branch: String = "main"): Unit =
    table(spark, catalog, name, branch).createOrReplaceTempView(viewName)
}
