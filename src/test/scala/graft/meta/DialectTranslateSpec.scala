package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** Unit matrix for [[DialectTranslate]]'s soundness contract — the
  * round-10 fixes: string-literal semantics (Trino's `''` escape vs
  * Spark's adjacent-literal lexing; backslashes literal in Trino/Hive but
  * escapes in Spark) and rename POSITIONING (function renames only in
  * call position, type renames only as a cast target — an unquoted Trino
  * column legally named `strpos` or `varchar` must survive untouched). */
class DialectTranslateSpec extends AnyFunSuite {
  private def t(sql: String): Option[String] = DialectTranslate.toSpark("trino", sql)
  private def h(sql: String): Option[String] = DialectTranslate.toSpark("hive", sql)

  test("trino '' quote escape re-encodes to Spark's backslash escape") {
    // 'it''s' means it's in Trino; verbatim it would lex in Spark as TWO
    // adjacent literals ('it' aliased s) — a silently different value
    assert(t("SELECT 'it''s' AS x FROM t") ==
      Some("SELECT 'it\\'s' AS x FROM t"))
    // plain literals survive unchanged in content
    assert(t("SELECT 'abc' FROM t") == Some("SELECT 'abc' FROM t"))
  }

  test("literals carrying backslashes refuse (escape semantics diverge)") {
    // Trino: literal backslash; Spark default parser: escape ('\t' = tab)
    assert(t("SELECT 'C:\\temp' FROM t").isEmpty)
    assert(h("SELECT 'C:\\temp' FROM t").isEmpty)
    // Hive double-quoted STRING with a backslash refuses too
    assert(h("SELECT count(*) FROM t WHERE s <> \"a\\b\"").isEmpty)
  }

  test("hive double-quoted strings emit with Spark-safe quote escaping") {
    assert(h("SELECT count(*) FROM t WHERE s <> \"don't\"") ==
      Some("SELECT count(*) FROM t WHERE s <> 'don\\'t'"))
  }

  test("function renames apply ONLY in call position") {
    // call position: renamed
    assert(t("SELECT strpos(s, 'x') FROM t") ==
      Some("SELECT instr(s, 'x') FROM t"))
    assert(t("SELECT chr(65) FROM t") == Some("SELECT char(65) FROM t"))
    // bare column references named like renamable functions: UNTOUCHED
    // (strpos/chr are not reserved in Trino — they are legal column names)
    assert(t("SELECT strpos FROM t") == Some("SELECT strpos FROM t"))
    assert(t("SELECT chr, codepoint FROM t WHERE strpos > 1") ==
      Some("SELECT chr, codepoint FROM t WHERE strpos > 1"))
  }

  test("type renames apply ONLY as a cast target") {
    assert(t("SELECT cast(x AS varchar) FROM t") ==
      Some("SELECT cast(x AS string) FROM t"))
    assert(t("SELECT try_cast(x AS real) FROM t") ==
      Some("SELECT try_cast(x AS float) FROM t"))
    // a SELECT alias named varchar/real keeps naming the output column
    assert(t("SELECT x AS varchar FROM t") == Some("SELECT x AS varchar FROM t"))
    assert(t("SELECT x AS real, y AS varbinary FROM t") ==
      Some("SELECT x AS real, y AS varbinary FROM t"))
    // bare column references likewise
    assert(t("SELECT varchar FROM t WHERE real > 1") ==
      Some("SELECT varchar FROM t WHERE real > 1"))
    // an alias inside a non-cast paren does not rename
    assert(t("SELECT max(x) AS m FROM (SELECT k AS varchar, x FROM u) w")
      .contains("SELECT max(x) AS m FROM (SELECT k AS varchar, x FROM u) w"))
  }

  test("round-10 widened tier: trig/constants/binning/min_by/window ranks translate and run") {
    val spark = graft.SparkTestBase.spark
    // pass-through names whose semantics are identical in Trino and
    // Spark; each translated form must also EXECUTE in Spark
    val widened = Seq(
      "SELECT sin(1.0), cos(1.0), tan(0.5), asin(0.5), acos(0.5), atan(0.5)",
      "SELECT atan2(1.0, 2.0), sinh(1.0), cosh(1.0), tanh(1.0), cbrt(27.0)",
      "SELECT degrees(pi()), radians(180.0), e(), log(2, 8), width_bucket(5.3, 0.0, 10.0, 5)")
    widened.foreach { sql =>
      val out = t(sql)
      assert(out.contains(sql), s"$sql must pass through unchanged: $out")
      spark.sql(out.get).collect() // the Spark side genuinely has them
    }
    assert(t("SELECT min_by(a, b), max_by(a, b) FROM t") ==
      Some("SELECT min_by(a, b), max_by(a, b) FROM t"))
    assert(t("SELECT cume_dist() OVER (ORDER BY a), percent_rank() OVER (ORDER BY a) FROM t") ==
      Some("SELECT cume_dist() OVER (ORDER BY a), percent_rank() OVER (ORDER BY a) FROM t"))
    // still-refused traps stay refused: approximate aggregates answer
    // different values per implementation; date/time frames diverge
    assert(t("SELECT approx_distinct(x) FROM t").isEmpty)
    assert(t("SELECT format_datetime(ts, 'yyyy') FROM t").isEmpty)
    assert(t("SELECT from_iso8601_timestamp(s) FROM t").isEmpty)
    assert(t("SELECT date_trunc('month', d) FROM t").isEmpty)
  }

  test("round-11 tier: whitelists are per-dialect; each translated form runs in Spark") {
    val spark = graft.SparkTestBase.spark
    // Hive-only pass-throughs: Spark inherited these from Hive verbatim.
    // The SAME calls keep refusing from Trino (split takes a literal
    // delimiter there; instr/nvl/etc. aren't the point — split is the trap)
    val hiveOnly = Seq(
      "SELECT split('a,b,c', ',')",
      "SELECT instr('hello', 'll'), locate('l', 'hello')",
      "SELECT nvl(NULL, 'x'), elt(2, 'a', 'b'), find_in_set('b', 'a,b,c')",
      "SELECT get_json_object('{\"k\": 1}', '$.k')",
      "SELECT base64(cast('hi' AS binary)), unbase64('aGk=')",
      "SELECT size(split('a,b', ',')), lcase('AB'), ucase('ab')",
      "SELECT char_length('abc'), character_length('abc')",
      "SELECT datediff('2024-03-01', '2024-02-27')")
    hiveOnly.foreach { sql =>
      val out = h(sql)
      assert(out.contains(sql), s"hive must pass through: $sql -> $out")
      spark.sql(out.get).collect()
    }
    assert(t("SELECT split(s, ',') FROM x").isEmpty,
      "Trino split takes a LITERAL delimiter — must keep refusing")
    assert(t("SELECT size(a) FROM x").isEmpty)
    assert(t("SELECT datediff('day', a, b) FROM x").isEmpty,
      "Trino datediff(unit, from, to) is a different function")

    // Trino-only renames (and their Spark execution)
    assert(t("SELECT day_of_year(d), doy(d), day_of_month(d) FROM x") ==
      Some("SELECT dayofyear(d), dayofyear(d), dayofmonth(d) FROM x"))
    assert(t("SELECT week(d), week_of_year(d) FROM x") ==
      Some("SELECT weekofyear(d), weekofyear(d) FROM x"))
    assert(t("SELECT to_base64(b), from_base64(s) FROM x") ==
      Some("SELECT base64(b), unbase64(s) FROM x"))
    assert(t("SELECT levenshtein_distance('kitten', 'sitting')") ==
      Some("SELECT levenshtein('kitten', 'sitting')"))
    assert(spark.sql("SELECT levenshtein('kitten', 'sitting')").head.getInt(0) == 3)
    assert(spark.sql(
      "SELECT dayofyear(DATE'2024-02-01'), weekofyear(DATE'2024-01-04')")
      .head() != null)
    // renames stay out of the OTHER dialect (Hive has no week() function
    // with ISO semantics guaranteed; a Hive view naming one refuses)
    assert(h("SELECT week(d) FROM x").isEmpty)
    assert(h("SELECT to_base64(b) FROM x").isEmpty)

    // deliberate refusals hold on BOTH doors
    assert(h("SELECT date_add(d, 1) FROM x").isEmpty,
      "Hive date_add returns string pre-2.1 and date after — version-dependent")
    assert(h("SELECT from_unixtime(c, 'u') FROM x").isEmpty,
      "format-arg pattern dialects diverge and arity is invisible here")
    assert(h("SELECT regexp_extract(s, 'a(b)', 1) FROM x").isEmpty)
    assert(t("SELECT day_of_week(d) FROM x").isEmpty,
      "ISO 1=Monday vs Spark 1=Sunday")
  }

  test("backquoted identifiers: verbatim as names, REFUSED in call position") {
    // names pass through (Spark shares the form)
    assert(h("SELECT `weird col` FROM t") == Some("SELECT `weird col` FROM t"))
    // a backquoted CALL dodges the word whitelist by construction — it
    // must refuse, not run with Spark's (different) semantics
    assert(h("SELECT `date_format`(ts, 'y-MM') FROM t").isEmpty)
    assert(t("SELECT `split`(s, ',') FROM t").isEmpty)
    // parens inside a backquoted name must not corrupt the cast-target
    // paren tracking (alias named varchar stays un-renamed)
    assert(h("SELECT cast(`a)` AS varchar), x AS varchar FROM t")
      .contains("SELECT cast(`a)` AS string), x AS varchar FROM t"))
  }

  test("the existing safe subset still translates") {
    assert(t("""SELECT "g", sum("k") AS total FROM t WHERE "k" BETWEEN 2 AND 11 GROUP BY "g"""") ==
      Some("SELECT `g`, sum(`k`) AS total FROM t WHERE `k` BETWEEN 2 AND 11 GROUP BY `g`"))
    // traps still refuse
    assert(t("SELECT split(s, ',') FROM t").isEmpty)
    assert(t("SELECT arr[1] FROM t").isEmpty)
    assert(t("SELECT from_unixtime(k) FROM t").isEmpty)
  }
}
