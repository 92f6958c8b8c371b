package graft.meta

/** MECHANICAL translation of a conservative SQL subset from other
  * engines' dialects (Trino/Presto, Hive) into Spark SQL, so an imported
  * Iceberg view whose only representation is foreign can still be read
  * here — the common case the view spec anticipates (engines are asked
  * to translate representations they understand).
  *
  * The contract is soundness over coverage: a translation is produced
  * ONLY when every construct in the statement is known to mean the same
  * thing in the source dialect and in Spark; anything else returns None
  * and the caller refuses by dialect name (exactly as before). The rules:
  *
  *  - quoted identifiers: Trino's `"col"` becomes Spark's backquoted
  *    form; Hive's `"..."`/`'...'` are both string literals and pass
  *    through as single-quoted literals (Hive identifiers are already
  *    backquoted, which Spark shares);
  *  - `||` concatenation, comparison/arithmetic operators, and comments
  *    pass through (identical);
  *  - a WORD followed by `(` must be a whitelisted KEYWORD (clause
  *    syntax shared by both dialects) or a whitelisted FUNCTION with
  *    identical semantics — a small rename map covers same-semantics
  *    different-name pairs (`strpos`->`instr`, `starts_with`->
  *    `startswith`, ...). Any other call form refuses: Trino's `split`
  *    (literal delimiter) vs Spark's (regex), `date_add(unit, n, ts)`
  *    vs `date_add(date, n)`, `repeat` (array vs string) are the kind
  *    of silent-wrong traps the whitelist exists to block;
  *  - array subscripts / constructors (`[`, `]`) refuse — Trino
  *    subscripts are 1-based, Spark's are 0-based; lambdas (`->`)
  *    refuse with them (their useful targets are the excluded
  *    higher-order functions);
  *  - `AT TIME ZONE`, `TRY`, and row-field access stay out (no Spark
  *    equivalent with identical semantics).
  */
object DialectTranslate {

  private val Keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "fetch", "join", "inner", "left", "right", "full", "outer",
    "cross", "on", "using", "and", "or", "not", "in", "exists", "between",
    "like", "escape", "is", "null", "true", "false", "case", "when", "then",
    "else", "end", "as", "cast", "try_cast", "distinct", "all", "union",
    "intersect", "except", "values", "with", "asc", "desc", "nulls", "first",
    "last", "over", "partition", "rows", "range", "unbounded", "preceding",
    "following", "current", "row", "interval", "extract", "filter", "date",
    "timestamp", "by")

  /** Functions with IDENTICAL name + semantics in Trino/Hive and Spark. */
  private val Functions: Set[String] = Set(
    // math
    "abs", "ceil", "ceiling", "floor", "round", "sqrt", "exp", "ln",
    "log10", "log2", "power", "pow", "mod", "sign", "greatest", "least",
    // trig / constants / binning — identical IEEE semantics everywhere;
    // note log(b, x) is log base b in BOTH Trino and Spark
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "cbrt", "degrees", "radians", "pi", "e",
    "log", "width_bucket",
    // null handling / conditionals
    "coalesce", "nullif", "if",
    // strings
    "length", "lower", "upper", "trim", "ltrim", "rtrim", "replace",
    "substr", "substring", "concat", "concat_ws", "reverse", "lpad", "rpad",
    "translate", "initcap",
    // date/time — NOTE the deliberate absences: from_unixtime returns a
    // STRING in Spark but a timestamp in Trino (silently different
    // frames), date_trunc on DATE input returns date in Trino but
    // timestamp in Spark, to_unixtime has no Spark twin — all refuse
    "year", "month", "day", "hour", "minute", "second", "quarter",
    "now", "current_date", "current_timestamp",
    // aggregates — approx_distinct deliberately ABSENT: both engines are
    // HLL-based but different implementations answer different values
    "count", "sum", "min", "max", "avg", "stddev", "stddev_pop",
    "stddev_samp", "variance", "var_pop", "var_samp", "count_if",
    "bool_and", "bool_or", "corr", "covar_pop", "covar_samp",
    "min_by", "max_by",
    // windows
    "row_number", "rank", "dense_rank", "ntile", "lag", "lead",
    "first_value", "last_value", "nth_value", "cume_dist", "percent_rank",
    // misc
    "cardinality", "cast", "try_cast", "extract")

  /** Same semantics, different name: source -> Spark. */
  private val Renames: Map[String, String] = Map(
    "strpos" -> "instr",
    "starts_with" -> "startswith",
    "ends_with" -> "endswith",
    "chr" -> "char",
    "codepoint" -> "ascii")

  /** Round-11 tier: the whitelist goes PER-DIALECT, because "identical
    * semantics" is a property of (source dialect, Spark) pairs — Hive's
    * `split(str, regex)` is Spark's very function (Spark SQL inherited
    * Hive's UDF surface), while Trino's `split(str, delim)` takes a
    * LITERAL delimiter and must keep refusing. Everything here is
    * mechanically safe by lineage or by published definition:
    *
    *  - Hive-only pass-throughs: functions Spark inherited from Hive
    *    byte-for-byte (split/instr/locate/nvl/elt/find_in_set/
    *    get_json_object/base64/unbase64/size/lcase/ucase/char_length/
    *    character_length/datediff — int days between date-truncated
    *    operands in both). Deliberate absences: `date_add`/`date_sub`
    *    return STRING before Hive 2.1 and DATE after (version-dependent
    *    ≠ known-identical), `from_unixtime`/`unix_timestamp` with a
    *    format argument hit the SimpleDateFormat-vs-DateTimeFormatter
    *    pattern divergence and this translator cannot see arity,
    *    `regexp_extract`'s no-match result is not provably identical.
    *  - Trino-only renames: `day_of_year`/`doy` -> `dayofyear`,
    *    `day_of_month` -> `dayofmonth`, `week`/`week_of_year` ->
    *    `weekofyear` (ISO-8601 week numbering on BOTH sides; Trino
    *    `day_of_week` stays refused — ISO 1=Monday vs Spark 1=Sunday),
    *    `to_base64`/`from_base64` -> `base64`/`unbase64` (RFC 4648
    *    standard alphabet both), `levenshtein_distance` ->
    *    `levenshtein` (classic single-character-edit distance, code-
    *    point based on both sides). */
  private val HiveOnlyFunctions: Set[String] = Set(
    "split", "instr", "locate", "nvl", "elt", "find_in_set",
    "get_json_object", "base64", "unbase64", "size", "lcase", "ucase",
    "char_length", "character_length", "datediff")
  private val TrinoOnlyRenames: Map[String, String] = Map(
    "day_of_year" -> "dayofyear", "doy" -> "dayofyear",
    "day_of_month" -> "dayofmonth",
    "week" -> "weekofyear", "week_of_year" -> "weekofyear",
    "to_base64" -> "base64", "from_base64" -> "unbase64",
    "levenshtein_distance" -> "levenshtein")

  /** Bare TYPE names (cast targets) spelled differently. Sized forms
    * (`varchar(10)`) refuse via the call whitelist before this applies. */
  private val TypeRenames: Map[String, String] = Map(
    "varchar" -> "string", "varbinary" -> "binary", "real" -> "float")

  private sealed trait Tok
  private final case class Word(s: String) extends Tok
  private final case class Quoted(inner: String) extends Tok // "..." source
  private final case class Str(raw: String) extends Tok      // '...' verbatim
  private final case class Tick(raw: String) extends Tok     // `...` verbatim
  private final case class Other(s: String) extends Tok      // ops, spaces, comments

  /** Some(spark SQL) when `sql` (in `dialect`) is inside the safe
    * subset; None otherwise — never a best-effort guess. */
  def toSpark(dialect: String, sql: String): Option[String] = {
    val d = dialect.toLowerCase(java.util.Locale.ROOT)
    if (!Set("trino", "presto", "hive").contains(d)) return None
    val toks = tokenize(sql).getOrElse(return None)
    // dialect-resolved whitelists (see the round-11 tier note above)
    val functions =
      if (d == "hive") Functions ++ HiveOnlyFunctions else Functions
    val renames =
      if (d == "hive") Renames else Renames ++ TrinoOnlyRenames
    // refusal scan: constructs outside the subset
    val words = toks.collect { case Word(w) => w.toLowerCase(java.util.Locale.ROOT) }
    if (words.contains("try") || words.contains("at") || words.contains("lateral") ||
        words.contains("unnest") || words.contains("tablesample") ||
        words.contains("grouping") || words.contains("array") || words.contains("map"))
      return None
    if (toks.exists { case Other(s) =>
        s.contains("[") || s.contains("]") || s.contains("->") ||
          s.contains("?") || s.contains("{") || s.contains("}")
      case _ => false }) return None
    if (d != "hive" && toks.exists {
        case Quoted(inner) => inner.contains("`"); case _ => false })
      return None // a backtick inside a quoted identifier cannot re-quote
    // string-literal semantics diverge: Spark's default parser processes
    // backslash escapes ('C:\temp' -> tab) where Trino/Hive take the
    // backslash literally, and our lexer's view of a backslash-adjacent
    // quote can differ from the source dialect's — any literal carrying a
    // backslash refuses rather than risking a silently different value
    if (toks.exists { case Str(raw) => raw.contains("\\"); case _ => false })
      return None
    if (d == "hive" && toks.exists {
        case Quoted(inner) => inner.contains("\\"); case _ => false })
      return None // same refusal for Hive's double-quoted string literals
    // every call position must be whitelisted
    val meaningful = toks.filter {
      case Other(s) => s.trim.nonEmpty && !s.startsWith("--") && !s.startsWith("/*")
      case _ => true
    }
    meaningful.zip(meaningful.drop(1)).foreach {
      case (Word(w), Other(op)) if op.trim.startsWith("(") =>
        val lw = w.toLowerCase(java.util.Locale.ROOT)
        if (!Keywords.contains(lw) && !functions.contains(lw) &&
            !renames.contains(lw)) return None
      case (Quoted(_) | Tick(_), Other(op)) if op.trim.startsWith("(") =>
        // a quoted/backquoted-identifier call is never in the subset —
        // `date_format`(...) would bypass the whitelist and run with
        // Spark's (different) pattern semantics
        return None
      case _ => ()
    }
    // Spark-safe single-quoted literal from decoded content (no
    // backslashes survive to here, so only the quote needs escaping —
    // '' would re-lex in Spark as two ADJACENT literals, not an escape)
    def sparkStr(inner: String): String = "'" + inner.replace("'", "\\'") + "'"
    // emit. Renames apply only in CALL position (an unquoted Trino column
    // legally named strpos/chr must stay a column reference), and
    // TypeRenames only to the AS-target inside a cast(...) paren (a
    // select alias named `varchar` must keep naming the output column).
    val isMeaningful: Tok => Boolean = {
      case Other(s) => s.trim.nonEmpty && !s.startsWith("--") && !s.startsWith("/*")
      case _ => true
    }
    val out = new StringBuilder
    var parenStack: List[Boolean] = Nil // true = opened directly by cast/try_cast
    var pendingCast = false
    var prevWord: Option[String] = None // previous meaningful Word, lowercased
    toks.zipWithIndex.foreach { case (tok, i) =>
      def nextIsCall: Boolean = toks.drop(i + 1).find(isMeaningful).exists {
        case Other(s) => s.trim.startsWith("("); case _ => false
      }
      tok match {
        case Word(w) =>
          val lw = w.toLowerCase(java.util.Locale.ROOT)
          val inCastTarget =
            parenStack.headOption.contains(true) && prevWord.contains("as")
          if (renames.contains(lw) && nextIsCall) out ++= renames(lw)
          else if (TypeRenames.contains(lw) && inCastTarget && !nextIsCall)
            out ++= TypeRenames(lw)
          else out ++= w
          pendingCast = (lw == "cast" || lw == "try_cast") && nextIsCall
          prevWord = Some(lw)
        case Quoted(inner) =>
          if (d == "hive") // Hive double-quotes are STRING literals
            out ++= sparkStr(inner)
          else out ++= "`" + inner + "`"
          pendingCast = false; prevWord = None
        case Str(raw) =>
          if (d == "hive") out ++= raw // backslash-free: lexes identically
          else { // Trino/Presto: '' is the quote escape — decode, re-encode
            val inner = raw.substring(1, raw.length - 1).replace("''", "'")
            out ++= sparkStr(inner)
          }
          pendingCast = false; prevWord = None
        case Tick(raw) => // backquoted identifier: Spark shares the form
          out ++= raw
          pendingCast = false; prevWord = None
        case Other(s) =>
          out ++= s
          if (!(s.startsWith("--") || s.startsWith("/*"))) s.foreach { c =>
            if (c == '(') { parenStack ::= pendingCast; pendingCast = false }
            else if (c == ')') { if (parenStack.nonEmpty) parenStack = parenStack.tail }
            else if (!c.isWhitespace) { pendingCast = false; prevWord = None }
          }
      }
    }
    Some(out.toString)
  }

  /** Lexes into words / double-quoted / single-quoted / rest, handling
    * the doubled-quote escapes both dialects share. None on an
    * unterminated quote. */
  private def tokenize(sql: String): Option[Vector[Tok]] = {
    val toks = Vector.newBuilder[Tok]
    val other = new StringBuilder
    def flush(): Unit = if (other.nonEmpty) { toks += Other(other.toString); other.clear() }
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        flush()
        val start = i; i += 1
        var done = false
        while (!done) {
          if (i >= n) return None
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        toks += Str(sql.substring(start, i))
      } else if (c == '"') {
        flush()
        i += 1
        val inner = new StringBuilder
        var done = false
        while (!done) {
          if (i >= n) return None
          if (sql.charAt(i) == '"') {
            if (i + 1 < n && sql.charAt(i + 1) == '"') { inner += '"'; i += 2 }
            else { done = true; i += 1 }
          } else { inner += sql.charAt(i); i += 1 }
        }
        toks += Quoted(inner.toString)
      } else if (c == '`') {
        // backquoted identifier (Hive form — Spark-compatible verbatim);
        // its OWN token kind: inside an Other it would dodge the
        // call-position whitelist, and parens in its text would corrupt
        // the cast-target paren tracking
        flush()
        val start = i; i += 1
        while (i < n && sql.charAt(i) != '`') i += 1
        if (i >= n) return None
        i += 1
        toks += Tick(sql.substring(start, i))
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        flush()
        val start = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        toks += Other(sql.substring(start, i))
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        flush()
        val start = i; i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        if (i + 1 >= n) return None
        i += 2
        toks += Other(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        flush()
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        toks += Word(sql.substring(start, i))
      } else {
        other += c; i += 1
      }
    }
    flush()
    Some(toks.result())
  }
}
