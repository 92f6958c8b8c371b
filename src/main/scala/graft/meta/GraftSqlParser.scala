package graft.meta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL-extension parser for the partition-spec / sort-order lifecycle
  * statements Spark's grammar lacks — the same surface Iceberg adds with
  * its SQL extensions module, so operational DDL ports verbatim:
  *
  * {{{
  * ALTER TABLE cat.t ADD PARTITION FIELD days(ts)
  * ALTER TABLE cat.t DROP PARTITION FIELD bucket(2, id)
  * ALTER TABLE cat.t REPLACE PARTITION FIELD bucket(2, id) WITH bucket(4, id)
  * ALTER TABLE cat.t WRITE ORDERED BY category ASC NULLS LAST, id DESC
  * ALTER TABLE cat.t WRITE UNORDERED
  * CREATE [OR REPLACE] VIEW cat.v AS SELECT ...   -- catalog views ([[Views]])
  * DROP VIEW [IF EXISTS] cat.v
  * }}}
  *
  * Statements whose target catalog is NOT registered with [[GraftSql]]
  * delegate to the underlying parser untouched (and fail there with
  * Spark's own syntax error — nothing else handles this grammar). The
  * heavy lifting (spec markers for transform changes, sort-order
  * replacement) is [[SchemaEvolution.updatePartitionSpec]] /
  * [[SchemaEvolution.updateSortOrder]]; this parser only produces the
  * [[GraftSql.AlterCommand]] ops. Injected via `injectParser` by
  * [[graft.functions.GraftExtensions]].
  */
final class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseExtended(session, sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  import GraftSql.{AlterCommand, AlterOp}

  private val AddDropRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r
  private val ReplaceRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*;?\s*$""".r
  private val OrderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*$""".r
  private val UnorderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+WRITE\s+UNORDERED\s*;?\s*$""".r
  private val CreateRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+CREATE\s+(BRANCH|TAG)\s+""" +
      """(IF\s+NOT\s+EXISTS\s+)?(\S+?)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r
  private val DropRefRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+(BRANCH|TAG)\s+(IF\s+EXISTS\s+)?(\S+?)\s*;?\s*$""".r
  // catalog VIEWS: only when the target catalog is registered — session
  // (TEMPORARY) views never match this shape and keep Spark's grammar.
  // IF NOT EXISTS and the column-alias-list form `(a, b)` match too, so
  // they get graft semantics (or a graft refusal) instead of falling
  // through to Spark's parser and failing with a foreign-catalog error
  private val CreateViewRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([^\s(]+)\s*(\([^)]*\))?\s+AS\s+(.+?)\s*;?\s*$""").r
  private val DropViewRe =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?(\S+?)\s*;?\s*$""".r

  /** Some(plan) when the statement is extension grammar targeting a
    * registered graft catalog; None delegates to Spark's parser. */
  private[meta] def parseExtended(spark: SparkSession, sql: String): Option[LogicalPlan] =
    sql match {
      case AddDropRe(ident, verb, tr) => target(spark, ident).map { case (cat, t) =>
        val f = parseTransform(tr)
        if (verb.equalsIgnoreCase("ADD")) AlterCommand(cat, t, AlterOp.AddPartField(f))
        else AlterCommand(cat, t, AlterOp.DropPartField(f))
      }
      case ReplaceRe(ident, from, to) => target(spark, ident).map { case (cat, t) =>
        AlterCommand(cat, t,
          AlterOp.ReplacePartField(parseTransform(from), parseTransform(to)))
      }
      case OrderedRe(ident, items) => target(spark, ident).map { case (cat, t) =>
        AlterCommand(cat, t, AlterOp.WriteOrdered(parseSortItems(items)))
      }
      case UnorderedRe(ident) => target(spark, ident).map { case (cat, t) =>
        AlterCommand(cat, t, AlterOp.WriteOrdered(Nil))
      }
      case CreateRefRe(ident, kind, ifNot, ref, asOf) => target(spark, ident).map {
        case (cat, t) => AlterCommand(cat, t, AlterOp.CreateRef(
          strip(ref), isBranch = kind.equalsIgnoreCase("BRANCH"),
          ifNotExists = ifNot != null,
          asOfVersion = Option(asOf).map(_.toLong)))
      }
      case DropRefRe(ident, kind, ifExists, ref) => target(spark, ident).map {
        case (cat, t) => AlterCommand(cat, t, AlterOp.DropRef(
          strip(ref), isBranch = kind.equalsIgnoreCase("BRANCH"),
          ifExists = ifExists != null))
      }
      case CreateViewRe(orReplace, ifNotExists, ident, colList, query) =>
        target(spark, ident).map { case (cat, v) =>
          require(orReplace == null || ifNotExists == null,
            s"CREATE VIEW $cat.$v: cannot specify both OR REPLACE and IF NOT EXISTS")
          val cols = Option(colList).map(_.trim.stripPrefix("(").stripSuffix(")")
            .split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          cols.foreach(c => require(c.matches("`[^`]+`|[A-Za-z_][A-Za-z0-9_]*"),
            s"CREATE VIEW $cat.$v: unsupported column specification '$c' — " +
              "plain column alias names only (no COMMENT clauses)"))
          GraftSql.CreateViewCommand(cat, v, query.trim, orReplace != null,
            ifNotExists != null, cols)
        }
      case DropViewRe(ifExists, ident) => target(spark, ident).map {
        case (cat, v) => GraftSql.DropViewCommand(cat, v, ifExists != null)
      }
      case _ => None
    }

  private def target(spark: SparkSession, ident: String): Option[(String, String)] = {
    val parts = ident.split('.').map(strip).toSeq
    parts match {
      case Seq(cat, table) if GraftSql.resolve(spark, cat).isDefined => Some((cat, table))
      case _ => None
    }
  }

  private def strip(s: String): String = s.trim.stripPrefix("`").stripSuffix("`")

  private val FnRe = """(?s)^\s*(\w+)\s*\(\s*(.*?)\s*\)\s*$""".r

  /** Iceberg transform syntax -> [[PartitionField]]: bare column =
    * identity; `bucket(N, col)` / `truncate(W, col)` (either arg order);
    * `year|month|day|hour(col)` with Iceberg's plural aliases. `AS name`
    * suffixes are refused — partition fields here are named by their
    * source column. */
  private[meta] def parseTransform(raw: String): PartitionField = {
    val s = raw.trim
    require(!s.toUpperCase(java.util.Locale.ROOT).matches("(?s).*\\s+AS\\s+\\S+$"),
      s"custom partition field names (AS ...) are not supported: $s")
    s match {
      case FnRe(fn, args) =>
        val a = args.split(",").map(strip).toSeq
        fn.toLowerCase(java.util.Locale.ROOT) match {
          case "identity" =>
            require(a.length == 1, s"identity takes one column: $s")
            PartitionField(a.head)
          case "bucket" | "truncate" =>
            require(a.length == 2, s"$fn takes (width, column): $s")
            val base = fn.toLowerCase(java.util.Locale.ROOT)
            a.map(x => scala.util.Try(x.toInt).toOption) match {
              case Seq(Some(n), None) => PartitionField(a(1), s"$base[$n]")
              case Seq(None, Some(n)) => PartitionField(a(0), s"$base[$n]")
              case _ => throw new IllegalArgumentException(
                s"$fn needs one int width and one column: $s")
            }
          case "year" | "years" => PartitionField(a.head, "year")
          case "month" | "months" => PartitionField(a.head, "month")
          case "day" | "days" | "date" => PartitionField(a.head, "day")
          case "hour" | "hours" | "date_hour" => PartitionField(a.head, "hour")
          case other => throw new IllegalArgumentException(
            s"unsupported partition transform $other in: $s")
        }
      case bare => PartitionField(strip(bare))
    }
  }

  /** `col [ASC|DESC] [NULLS FIRST|LAST], ...` -> [[SortField]]s. Items
    * split on TOP-LEVEL commas so `zorder(a, b)` survives as one field.
    * Defaults follow Iceberg: ASC -> NULLS FIRST, DESC -> NULLS LAST. */
  private[meta] def parseSortItems(raw: String): Seq[SortField] =
    splitTopLevel(raw).map { item =>
      val ItemRe =
        """(?is)^\s*(.+?)\s*(?:\b(ASC|DESC)\b)?\s*(?:NULLS\s+(FIRST|LAST)\b)?\s*$""".r
      item match {
        case ItemRe(expr, dir, nulls) =>
          val asc = dir == null || dir.equalsIgnoreCase("ASC")
          val nf = if (nulls == null) asc else nulls.equalsIgnoreCase("FIRST")
          SortField(strip(expr), ascending = asc, nullsFirst = nf)
        case other => throw new IllegalArgumentException(s"cannot parse sort item: $other")
      }
    }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
