package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, all
  * expressed with codegen'd `org.apache.spark.sql.functions` (no UDFs):
  * each is a narrow per-row transform — no shuffle, scales linearly with
  * input splits at any data size.
  *
  * Cross-engine determinism (for the DuckDB oracle): md5 for hashing,
  * token counts from regexp splits with disjoint alternatives, ratios
  * rounded at fixed precision.
  */
object TextAnalysis {

  /** whitespace normalization: trim + collapse runs of whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(trim(text), "\\s+", " ")

  /** Stable document fingerprint: md5 of the lowercased normalized text. */
  def fingerprint(text: Column): Column = md5(lower(normalize(text)))

  /** lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(normalize(text)), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex token count: letter runs, single digits, single
    * punctuation — the classic pre-tokenizer shape. Alternatives are
    * disjoint character classes, so Java-regex and RE2 agree. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  def punctCount(text: Column): Column = regexp_count(text, lit("[.,;:!?]"))

  /** share of [.,;:!?] characters, 4 decimals. */
  def punctRatio(text: Column): Column =
    round(punctCount(text) / greatest(length(text), lit(1)), 4)

  private def stopwordsFor(lang: String): Seq[String] = lang match {
    case "en" => Seq("the", "a", "of", "and", "to", "is", "in")
    case "fr" => Seq("le", "la", "les", "et", "de", "un", "une")
    case "es" => Seq("el", "los", "y", "que", "en", "un", "una")
    case "de" => Seq("der", "die", "das", "und", "ein", "nicht")
    case _    => Nil
  }

  /** count of tokens contained in `lang`'s stopword list. */
  def stopwordCount(text: Column, lang: String): Column = {
    val words = array(stopwordsFor(lang).map(lit): _*)
    size(filter(tokens(text), t => array_contains(words, t)))
  }

  def stopwordRatio(text: Column, lang: String = "en"): Column =
    round(stopwordCount(text, lang) / greatest(tokenCount(text), lit(1)).cast("double"), 4)

  /** CJK character count (language-ID signal). */
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[一-鿿]"))

  /** n-gram-free heuristic language ID: CJK presence, then stopword-hit
    * argmax with fixed tie preference de > fr > es > en. */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, "en"); val fr = stopwordCount(text, "fr")
    val es = stopwordCount(text, "es"); val de = stopwordCount(text, "de")
    when(cjkCount(text) > 0, "zh")
      .when(de > 0 && de >= fr && de >= es && de >= en, "de")
      .when(fr > 0 && fr >= es && fr >= en, "fr")
      .when(es > 0 && es >= en, "es")
      .otherwise("en")
  }

  /** Composite quality score in [0,1]: length, punctuation sanity, token
    * volume. 4-decimal rounded, deterministic. */
  def qualityScore(text: Column, nChars: Column): Column =
    round(
      least(nChars / 500.0, lit(1.0)) * 0.3 +
        (lit(1.0) - punctRatio(text)) * 0.4 +
        least(tokenCount(text) / 100.0, lit(1.0)) * 0.3,
      4)

  /** Adds the full analysis column set to a documents DataFrame. */
  def analyze(df: DataFrame, textCol: String = "text", nCharsCol: String = "n_chars"): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", tokenCount(t).cast("long"))
      .withColumn("re_tokens", regexTokenCount(t).cast("long"))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("pred_lang", langId(t))
      .withColumn("quality", qualityScore(t, col(nCharsCol)))
      .withColumn("fingerprint", fingerprint(t))
  }
}
