package graft.meta

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** SQL FRONT DOOR: graft tables addressable from plain `spark.sql`.
  *
  * [[graft.functions.GraftExtensions]] injects [[GraftSql.Rule]] into the
  * analyzer (build the session with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`); after
  * `GraftSql.register("graft", catalog)` — or a
  * `spark.graft.catalog.graft=<warehouse>` conf — queries resolve
  * against the catalog LATE (every statement re-loads table metadata,
  * so a committed append is visible to the next query, unlike the
  * snapshot-pinned [[IceRead.attachViews]] temp views):
  *
  * {{{
  * SELECT * FROM graft.t WHERE d >= DATE'2024-01-01'   -- MOR view, filters
  *                                                     -- push into the scan
  * SELECT * FROM graft.t.branch_dev                    -- branch read
  * SELECT * FROM graft.t.tag_v1                        -- immutable tag
  * SELECT * FROM graft.t.snapshot_id_42                -- time travel by id
  * SELECT * FROM graft.t.at_timestamp_1700000000000    -- time travel by ms
  * SELECT * FROM graft.t.snapshots                     -- metadata tables:
  *                                                     -- files / history /
  *                                                     -- refs / partitions /
  *                                                     -- all_files
  * INSERT INTO graft.t SELECT ...                      -- append snapshot
  * INSERT OVERWRITE graft.t PARTITION (day='x') ...    -- dynamic partition
  *                                                     -- overwrite (or full
  *                                                     -- replace when
  *                                                     -- unpartitioned)
  * }}}
  *
  * The suffix grammar (`branch_` / `tag_` / `snapshot_id_` /
  * `at_timestamp_` as trailing identifier parts) is Iceberg's public
  * Spark-connector convention, so queries port across. Resolution
  * substitutes the relation with [[IceRead]]'s composed MOR plan —
  * ordinary Catalyst nodes, so filter pushdown, column pruning and
  * join planning optimize THROUGH the front door exactly as they do for
  * the Scala API (the reference exposes no SQL surface at all; this is
  * the engine-side seam its README.md:12-22 leaves to "query engines").
  */
object GraftSql {

  /** catalog-name -> live Catalog, process-global (mirrors how Spark
    * treats `spark.sql.catalog.*`: one registry the session consults). */
  private val registry = TrieMap.empty[String, Catalog]
  /** conf-declared warehouses, keyed (name, warehouse) so re-pointing
    * the conf at a different path takes effect immediately. */
  private val confCatalogs = TrieMap.empty[(String, String), Catalog]

  /** Metadata-table suffixes served by [[IceRead]]'s metadata entry
    * points. A data table can never collide: catalog names are flat, so
    * `graft.t.snapshots` is unambiguous (`t.snapshots` is not a legal
    * table name). */
  private val MetadataTables =
    Set("snapshots", "files", "history", "refs", "partitions", "all_files")

  def register(name: String, catalog: Catalog): Unit =
    registry.put(name.toLowerCase(java.util.Locale.ROOT), catalog)

  def unregister(name: String): Unit =
    registry.remove(name.toLowerCase(java.util.Locale.ROOT))

  /** The catalog a name resolves to: explicit [[register]] first, then
    * the session conf `spark.graft.catalog.<name>` (a LocalCatalog
    * warehouse path — REST or custom catalogs register programmatically). */
  def resolve(spark: SparkSession, name: String): Option[Catalog] = {
    val key = name.toLowerCase(java.util.Locale.ROOT)
    registry.get(key).orElse {
      spark.conf.getOption(s"spark.graft.catalog.$key").map { wh =>
        confCatalogs.getOrElseUpdate((key, wh), LocalCatalog(wh))
      }
    }
  }

  /** Analyzer rule: rewrites `graft.<table>[.<suffix>]` relations into
    * IceRead plans and INSERTs targeting them into [[InsertCommand]].
    * Top-down so the INSERT case claims its target relation before the
    * bare-relation case would. */
  final class SqlRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
      case ins @ InsertIntoStatement(u: UnresolvedRelation, _, _, _, _, _, _)
          if resolvable(u.multipartIdentifier).isDefined =>
        val (catName, cat, parts) = resolvable(u.multipartIdentifier).get
        require(parts.lengthCompare(1) == 0,
          s"INSERT into ${u.multipartIdentifier.mkString(".")}: writes target the " +
            "table itself — branch/tag/snapshot suffixes and metadata tables are read-only")
        require(!ins.ifPartitionNotExists,
          "INSERT ... IF NOT EXISTS is not supported; use INSERT INTO (append) " +
            "or INSERT OVERWRITE (replace)")
        InsertCommand(catName, parts.head, ins.partitionSpec,
          ins.userSpecifiedCols, ins.query, ins.overwrite, ins.byName)
      case u: UnresolvedRelation if resolvable(u.multipartIdentifier).isDefined =>
        val (catName, cat, parts) = resolvable(u.multipartIdentifier).get
        SubqueryAlias(catName +: parts, relationPlan(cat, catName, parts))
    }

    /** Some((catalogName, catalog, identifier-after-catalog)) when the
      * head part names a registered graft catalog. */
    private def resolvable(ident: Seq[String]): Option[(String, Catalog, Seq[String])] =
      if (ident.lengthCompare(2) < 0) None
      else resolve(spark, ident.head).map(c => (ident.head, c, ident.tail))

    private def relationPlan(cat: Catalog, catName: String, parts: Seq[String]): LogicalPlan = {
      val table = parts.head
      require(cat.tableExists(table),
        s"table $catName.$table does not exist in the registered catalog")
      val df = parts.drop(1) match {
        case Seq() => IceRead.table(spark, cat, table)
        case Seq(sub) => sub match {
          case "snapshots" => IceRead.snapshots(spark, cat, table)
          case "files" => IceRead.files(spark, cat, table)
          case "history" => IceRead.history(spark, cat, table)
          case "refs" => IceRead.refs(spark, cat, table)
          case "partitions" => IceRead.partitions(spark, cat, table)
          case "all_files" => IceRead.allFiles(spark, cat, table)
          case b if b.startsWith("branch_") =>
            IceRead.table(spark, cat, table, branch = b.stripPrefix("branch_"))
          case t if t.startsWith("tag_") =>
            IceRead.tableAtTag(spark, cat, table, t.stripPrefix("tag_"))
          case s if s.startsWith("snapshot_id_") =>
            IceRead.tableAt(spark, cat, table, s.stripPrefix("snapshot_id_").toLong)
          case ts if ts.startsWith("at_timestamp_") =>
            IceRead.tableAsOf(spark, cat, table, ts.stripPrefix("at_timestamp_").toLong)
          case other => throw new IllegalArgumentException(
            s"$catName.$table.$other: unknown suffix — expected a metadata table " +
              s"(${MetadataTables.toSeq.sorted.mkString("/")}) or branch_* / tag_* / " +
              "snapshot_id_* / at_timestamp_*")
        }
        case more => throw new IllegalArgumentException(
          s"${(catName +: parts).mkString(".")}: at most one suffix part after the table name")
      }
      df.queryExecution.analyzed
    }
  }

  /** `INSERT INTO` = append snapshot; `INSERT OVERWRITE` = dynamic
    * partition overwrite (partitioned) or atomic full replace
    * (unpartitioned) — Iceberg's INSERT OVERWRITE semantics. The source
    * query is analyzed at run time (it may itself read graft relations),
    * then aligned to the table schema: by position (default), by the
    * `(col, ...)` list, or by name (`INSERT ... BY NAME`); static
    * PARTITION values become literal columns; absent nullable columns
    * fill with NULL. */
  final case class InsertCommand(
      catalogName: String,
      table: String,
      staticPartition: Map[String, Option[String]],
      userCols: Seq[String],
      query: LogicalPlan,
      overwrite: Boolean,
      byName: Boolean) extends LeafRunnableCommand {

    override def innerChildren: Seq[LogicalPlan] = Seq(query)

    override def run(spark: SparkSession): Seq[Row] = {
      val cat = GraftSql.resolve(spark, catalogName).getOrElse(
        throw new IllegalStateException(s"graft catalog $catalogName vanished between " +
          "analysis and execution"))
      val meta = cat.loadTable(table)
      val target: Seq[(String, Option[DataType], Boolean)] =
        if (meta.schema.nonEmpty)
          meta.schema.map(f =>
            (f.name, if (f.isTyped) Some(f.sparkType) else None, f.nullable))
        else // legacy untyped table: names+types from the live read schema
          IceRead.table(spark, cat, table).schema.fields.toSeq
            .map(f => (f.name, Some(f.dataType), f.nullable))

      val static = staticPartition.collect { case (k, Some(v)) => k -> v }
      static.keys.foreach { k =>
        require(target.exists(_._1 == k),
          s"PARTITION column $k is not a column of $catalogName.$table")
      }

      val src = ColumnBridge.ofRows(spark, query)
      // name the provided columns
      val provided: Seq[(String, org.apache.spark.sql.Column)] =
        if (byName) src.columns.toSeq.map(c => c -> col(c))
        else {
          val names =
            if (userCols.nonEmpty) userCols
            else target.map(_._1).filterNot(static.contains)
          require(src.columns.length == names.length,
            s"INSERT into $catalogName.$table: query produces ${src.columns.length} " +
              s"columns but ${names.length} are expected (${names.mkString(", ")})")
          names.zip(src.columns.toSeq.map(col))
        }
      val byTarget = provided.toMap
      provided.map(_._1).diff(target.map(_._1)).headOption.foreach { extra =>
        throw new IllegalArgumentException(
          s"INSERT into $catalogName.$table: column $extra does not exist " +
            s"(table columns: ${target.map(_._1).mkString(", ")})")
      }

      val out = src.select(target.map { case (name, dt, nullable) =>
        def typedCol(c: org.apache.spark.sql.Column) = dt.fold(c)(c.cast)
        static.get(name) match {
          case Some(v) => typedCol(lit(v)).as(name)
          case None => byTarget.get(name) match {
            case Some(c) => typedCol(c).as(name)
            case None =>
              require(nullable, s"INSERT into $catalogName.$table: non-nullable " +
                s"column $name has no value")
              typedCol(lit(null)).as(name)
          }
        }
      }: _*)

      if (!overwrite) IceWrite.append(spark, cat, table, out)
      else if (meta.partitionSpec.nonEmpty) IceWrite.overwritePartitions(spark, cat, table, out)
      else IceWrite.replaceAll(spark, cat, table, out)
      Seq.empty
    }
  }
}
