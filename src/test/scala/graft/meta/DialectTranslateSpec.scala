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

  test("the existing safe subset still translates") {
    assert(t("""SELECT "g", sum("k") AS total FROM t WHERE "k" BETWEEN 2 AND 11 GROUP BY "g"""") ==
      Some("SELECT `g`, sum(`k`) AS total FROM t WHERE `k` BETWEEN 2 AND 11 GROUP BY `g`"))
    // traps still refuse
    assert(t("SELECT split(s, ',') FROM t").isEmpty)
    assert(t("SELECT arr[1] FROM t").isEmpty)
    assert(t("SELECT from_unixtime(k) FROM t").isEmpty)
  }
}
