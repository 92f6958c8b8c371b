package graft.meta

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Table-level CHECK constraints, stored as table properties and enforced
  * on write (the Delta-Lake-style `ALTER TABLE ADD CONSTRAINT` contract;
  * the reference's config surface has no equivalent, so this is a
  * pipeline-hardening extension in the same spirit as its validator,
  * `compaction/validator.rs`).
  *
  * Semantics are ANSI CHECK: a row VIOLATES a constraint only when the
  * predicate evaluates to FALSE — NULL (unknown) passes, exactly like SQL
  * `CHECK`. NOT NULL is therefore its own constraint form, not a CHECK.
  *
  * Scale contract: [[checkedAppend]] costs ONE pass over the batch — the
  * per-constraint violation counts ride the write itself via `observe`
  * (computed inside the same tasks that write the parquet), and the
  * metadata commit is gated on the observed counts, so a violating batch
  * aborts with nothing visible and no second scan. [[addCheck]] validates
  * existing data with one aggregate over the table (all constraints in a
  * single pass), mirroring Delta's add-constraint scan.
  */
object Constraints {

  val CheckPrefix = "constraint.check."

  final class ConstraintViolationException(
      val violations: Map[String, Long], table: String)
    extends RuntimeException(
      s"append to $table rejected: " + violations.toSeq.sorted
        .map { case (n, c) => s"$n ($c rows)" }.mkString(", "))

  /** The table's CHECK constraints: name -> SQL predicate. */
  def checks(meta: TableMetadata): Map[String, String] =
    meta.properties.collect {
      case (k, v) if k.startsWith(CheckPrefix) => k.stripPrefix(CheckPrefix) -> v
    }

  /** Violation indicator for one predicate: 1 when the predicate is FALSE
    * (NULL passes — ANSI CHECK). */
  private def violated(sqlPredicate: String) =
    when(not(coalesce(expr(sqlPredicate), lit(true))), 1L).otherwise(0L)

  /** Per-constraint violation counts of `df` — ONE aggregate pass for all
    * constraints. Returns (check_name, n_violations), name-ordered. */
  def violationReport(df: DataFrame, cs: Map[String, String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (cs.isEmpty) return Seq.empty[(String, Long)].toDF("check_name", "n_violations")
    val ordered = cs.toSeq.sortBy(_._1)
    val aggs = ordered.map { case (n, p) => sum(violated(p)).as(n) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    ordered.zipWithIndex
      .map { case ((n, _), i) => (n, if (row.isNullAt(i)) 0L else row.getLong(i)) }
      .toDF("check_name", "n_violations")
  }

  /** Adds a CHECK constraint after proving the CURRENT table state
    * satisfies it (one aggregate scan); fails without committing if any
    * existing row violates. The predicate is any Spark SQL boolean
    * expression over the table's columns. */
  def addCheck(spark: SparkSession, catalog: Catalog, table: String,
      name: String, sqlPredicate: String): TableMetadata = {
    require(name.nonEmpty && !name.contains('='), s"bad constraint name: $name")
    val existing = IceRead.table(spark, catalog, table)
    val bad = existing.agg(sum(violated(sqlPredicate)).as("v")).head()
    val n = if (bad.isNullAt(0)) 0L else bad.getLong(0)
    if (n > 0) throw new ConstraintViolationException(Map(name -> n), table)
    SchemaEvolution.updateProperties(catalog, table, Map(CheckPrefix + name -> sqlPredicate))
  }

  /** NOT NULL as sugar: stored as a CHECK that fails exactly on NULL. */
  def addNotNull(spark: SparkSession, catalog: Catalog, table: String,
      column: String): TableMetadata =
    addCheck(spark, catalog, table, s"${column}_not_null", s"$column IS NOT NULL")

  def dropCheck(catalog: Catalog, table: String, name: String): TableMetadata =
    SchemaEvolution.updateProperties(catalog, table, Map.empty, Set(CheckPrefix + name))

  /** Append gated on every stored CHECK, in ONE data pass: violation
    * counts are observed during the parquet write, and the snapshot
    * commit happens only if all counts are zero — otherwise the written
    * files are removed and [[ConstraintViolationException]] carries the
    * per-constraint counts. Tables with no constraints append as usual. */
  def checkedAppend(spark: SparkSession, catalog: Catalog, table: String,
      df: DataFrame): TableMetadata = {
    val cs = checks(catalog.loadTable(table))
    if (cs.isEmpty) return IceWrite.append(spark, catalog, table, df)
    val ordered = cs.toSeq.sortBy(_._1)
    val obs = Observation()
    val metrics = ordered.map { case (n, p) => sum(violated(p)).as(n) }
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    IceWrite.appendValidated(spark, catalog, table, observed, afterWrite = written => {
      // the write action is done -> the observation is populated
      val got = obs.get
      val viol = ordered.map(_._1)
        .map(n => n -> (got.get(n) match {
          case Some(l: java.lang.Long) => l.longValue
          case Some(l: Long) => l
          case _ => 0L // empty batch: sum over zero rows is NULL
        }))
        .filter(_._2 > 0L).toMap
      if (viol.nonEmpty) {
        // abort: reclaim this write's whole uuid dir (it is exclusively
        // ours and also holds _SUCCESS/.crc sidecars), commit nothing
        val dataDir = MetaIO.normalize(
          MetaIO.join(catalog.loadTable(table).location, "data"))
        written.map { f =>
          // climb to the uuid dir directly under <location>/data
          var p = MetaIO.normalize(f.path)
          while (MetaIO.parent(p) != dataDir && MetaIO.parent(p).nonEmpty) p = MetaIO.parent(p)
          p
        }.distinct.filter(p => MetaIO.parent(p) == dataDir).foreach { root =>
          try MetaIO.deleteRecursive(root)
          catch { case _: java.io.IOException => () }
        }
        throw new ConstraintViolationException(viol, table)
      }
    })
  }
}
