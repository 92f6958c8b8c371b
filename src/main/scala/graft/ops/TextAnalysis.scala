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

  /** Token-budget truncation (the context-window trim): keep the first
    * `n` tokens, rejoined single-spaced. Per-row, zero shuffle. Null text
    * stays null — concat_ws alone would swallow it into "" (the same
    * null-swallow quantizeInt8 guards against). */
  def truncateTokens(text: Column, n: Int): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(concat_ws(" ", slice(tokens(text), 1, n)))

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

  /** Unicode script ranges shared by [[scriptProfile]] and its oracle —
    * literal codepoint ranges so the Spark and DuckDB regexes are the
    * same bytes. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "digit" -> "0-9",
    "cjk" -> "一-鿿",
    "cyrillic" -> "Ѐ-ӿ",
    "arabic" -> "؀-ۿ")

  /** Per-document Unicode script histogram + deterministic dominant
    * script — the charset complement to [[langId]] (script tells you
    * zh/ru/ar long before stopwords can; mixed-script docs are a spam
    * signal). One per-row projection of codegen'd regexp counts, zero
    * shuffles at any scale. Dominant ties break on the fixed order
    * arabic > cjk > cyrillic > digit > latin; all-zero counts report
    * 'none'. Output: (id, n_chars, n_latin, n_digit, n_cjk, n_cyrillic,
    * n_arabic, n_other, dominant). */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counts = ScriptRanges.map { case (name, cls) =>
      name -> regexp_count(t, lit(s"[$cls]")).cast("long")
    }
    val byName = counts.toMap
    val total = length(t).cast("long")
    val m = greatest(counts.map(_._2): _*)
    df.select(
      col(idCol).as("id"),
      total.as("n_chars"),
      byName("latin").as("n_latin"),
      byName("digit").as("n_digit"),
      byName("cjk").as("n_cjk"),
      byName("cyrillic").as("n_cyrillic"),
      byName("arabic").as("n_arabic"),
      (total - counts.map(_._2).reduce(_ + _)).as("n_other"),
      when(m === 0, "none")
        .when(byName("arabic") === m, "arabic")
        .when(byName("cjk") === m, "cjk")
        .when(byName("cyrillic") === m, "cyrillic")
        .when(byName("digit") === m, "digit")
        .otherwise("latin").as("dominant"))
  }

  /** Composite quality score in [0,1]: length, punctuation sanity, token
    * volume. 4-decimal rounded, deterministic. */
  def qualityScore(text: Column, nChars: Column): Column =
    round(
      least(nChars / 500.0, lit(1.0)) * 0.3 +
        (lit(1.0) - punctRatio(text)) * 0.4 +
        least(tokenCount(text) / 100.0, lit(1.0)) * 0.3,
      4)

  /** Longest run of consecutive equal elements in an array column —
    * a single per-row fold (`aggregate`), no explode, no shuffle.
    * Empty arrays yield 0, single elements 1. */
  private def maxRunLength(a: String): Column = {
    expr(
      s"""CASE WHEN size($a) < 2 THEN size($a) ELSE
         |  aggregate(sequence(2, size($a)),
         |    named_struct('run', 1, 'best', 1),
         |    (acc, i) -> IF(element_at($a, i) = element_at($a, i - 1),
         |      named_struct('run', acc.run + 1, 'best', greatest(acc.best, acc.run + 1)),
         |      named_struct('run', 1, 'best', acc.best)),
         |    acc -> acc.best)
         |END""".stripMargin)
  }

  /** Repetition / boilerplate signals (the Gopher- and C4-style filters a
    * crawl pipeline cuts on), all per-row expressions over the token
    * array — no explode, no shuffle, linear in input splits:
    *
    *  - `dup_word_frac`: fraction of tokens that are repeats of an
    *    already-seen token, `(n - n_distinct) / n`;
    *  - `top_word_frac`: coverage of the single most frequent token
    *    (mode count / n) — boilerplate pushes this up;
    *  - `top_bigram_frac`: coverage of the most frequent word bigram over
    *    the n-1 bigrams; 0.0 for single-token docs;
    *  - `max_run_len`: longest consecutive repeat of one token ("buy buy
    *    buy ..."), the classic spam/repetition tell.
    *
    * Mode counts come from `array_sort` + a run-length fold (the mode of a
    * multiset == the longest equal-run of its sorted array), so the whole
    * metric set is one narrow projection. Fractions are 6-decimal rounded
    * for cross-engine determinism. */
  def repetitionMetrics(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val out = df
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      // NB sequence(1, 0) DESCENDS in Spark, hence the explicit size guard
      .withColumn("__bigrams", expr(
        """CASE WHEN size(__toks) < 2 THEN array()
          |ELSE transform(sequence(1, size(__toks) - 1),
          |       i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))
          |END""".stripMargin))
      // sorted arrays are MATERIALIZED as their own columns: splicing
      // `array_sort(...)` textually into the run-length fold would
      // re-sort the array at every element_at inside the lambda
      // (O(n^2 log n) per document on long docs); as a multiply-referenced
      // non-cheap alias, CollapseProject keeps these computed once per row
      .withColumn("__sorted", array_sort(col("__toks")))
      .withColumn("__bsorted", array_sort(col("__bigrams")))
      .withColumn("dup_word_frac",
        round((col("__n") - size(array_distinct(col("__toks")))) /
          col("__n").cast("double"), 6))
      .withColumn("top_word_frac",
        round(maxRunLength("__sorted") / col("__n").cast("double"), 6))
      .withColumn("top_bigram_frac",
        when(col("__n") < 2, lit(0.0)).otherwise(
          round(maxRunLength("__bsorted") /
            size(col("__bigrams")).cast("double"), 6)))
      .withColumn("max_run_len", maxRunLength("__toks").cast("long"))
    out.select(col(idCol), col("dup_word_frac"), col("top_word_frac"),
      col("top_bigram_frac"), col("max_run_len"))
  }

  /** Character-diversity signals over a bounded prefix — the
    * entropy-family randomness/quality tell, kept in EXACT integer ppm.
    *
    * Shannon entropy itself needs cross-engine float logs (a silent
    * hash-mismatch class; docs/ORACLE.md "ratio-not-log"), so this reports
    * the collision probability `sum c_i^2 / n^2` instead — the Rényi-2
    * quantity `H2 = -log2(collision)` is a strictly monotone transform of
    * it, so any entropy threshold translates to a collision threshold and
    * the decision ORDERING of documents is identical. High collision_ppm =
    * low diversity (repeated characters, padding, keyboard mash); natural
    * prose sits in a narrow band per language.
    *
    *  - `n_chars`: prefix length actually scored (min(len, prefixLen));
    *  - `distinct_chars`: distinct code points in the prefix;
    *  - `collision_ppm`: `floor(1e6 * sum c^2 / n^2)` — probability two
    *    random prefix positions hold the same character;
    *  - `mode_ppm`: `floor(1e6 * max c / n)` — coverage of the most
    *    frequent character.
    *
    * All per-row expressions (transform/array_sort + one fold), zero
    * exchanges, linear in input splits. The sum of squared counts comes
    * from a single run-length fold over the SORTED char array (runs of a
    * sorted multiset ARE the counts) — O(n log n) per row, not the
    * O(n * distinct) of a per-character filter count. Bounded by
    * `prefixLen` so the cost per row is capped no matter how long the
    * document is; empty texts are scored null-free by the caller filtering
    * `length(text) > 0` (both engines would otherwise disagree on
    * splitting ""). */
  def charDiversity(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", prefixLen: Int = 512): DataFrame = {
    val out = df
      .withColumn("__p", expr(s"substring($textCol, 1, $prefixLen)"))
      .withColumn("__n", length(col("__p")).cast("long"))
      .withColumn("__chars", expr(
        "transform(sequence(1, greatest(cast(__n as int), 1)), i -> substring(__p, i, 1))"))
      .withColumn("__csorted", array_sort(col("__chars")))
      // sum of squared run lengths over the sorted chars: at each value
      // change, bank run^2; the finish adds the final run. NB
      // sequence(2, 1) DESCENDS in Spark, hence the size<2 guard
      .withColumn("__sumsq", expr(
        """CASE WHEN size(__csorted) < 2 THEN cast(size(__csorted) as bigint) ELSE
          |aggregate(sequence(2, size(__csorted)),
          |  named_struct('run', 1L, 'acc', 0L),
          |  (s, i) -> IF(element_at(__csorted, i) = element_at(__csorted, i - 1),
          |    named_struct('run', s.run + 1L, 'acc', s.acc),
          |    named_struct('run', 1L, 'acc', s.acc + s.run * s.run)),
          |  s -> s.acc + s.run * s.run)
          |END""".stripMargin))
      .withColumn("__mode", maxRunLength("__csorted").cast("long"))
    out.select(col(idCol),
      col("__n").as("n_chars"),
      size(array_distinct(col("__chars"))).cast("long").as("distinct_chars"),
      expr("__sumsq * 1000000L div (__n * __n)").as("collision_ppm"),
      expr("__mode * 1000000L div __n").as("mode_ppm"))
  }

  /** PII patterns, chosen to parse identically under Java regex (Spark)
    * and RE2 (DuckDB): no backrefs, no lookaround, disjoint shapes (email
    * needs '@', phone needs a leading '+', IPv4 is dotted digits). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d[\\d ]{6,}\\d"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  /** Redacts emails, then phones, then IPv4s with typed placeholders —
    * the scrub pass a crawl corpus takes before training. Order matters
    * and is fixed (email first: its local part may contain digits a
    * phone/IP pattern could nibble at). Pure per-row regexp_replace
    * chain: no shuffle, codegen'd. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Candidate payment-card runs: 13-19 digits with optional single
    * space/dash separators, word-bounded. Java-regex/RE2-identical (no
    * backrefs, no lookaround); a 20+-digit run matches nothing (no
    * boundary fits), which is the desired negative. */
  val CardRe = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Luhn mod-10 sum of a digit string — one per-row `aggregate` fold,
    * from the right: every second digit doubles, 9 subtracted past 9. */
  private def luhnSum(d: Column): Column =
    aggregate(sequence(lit(1), length(d)), lit(0), (acc, i) => {
      val v = ascii(substr(d, i, lit(1))) - lit(48)
      val dbl = v * lit(2)
      acc + when((length(d) - i) % 2 === 1,
        when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(v)
    })

  /** Per-document card-number stats: regex candidates, then the Luhn
    * checksum — the validation step that separates card numbers from
    * arbitrary digit runs (order IDs, timestamps), cutting the false
    * positives a redaction pass would otherwise eat. Pure per-row
    * HOF fold over the (few) candidates; zero shuffles.
    * Output: (id, n_candidates, n_valid). */
  def cardStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val cands = regexp_extract_all(t, lit(CardRe), lit(0))
    val digits = transform(cands, c => regexp_replace(c, lit("[^0-9]"), lit("")))
    df.select(col(idCol).as("id"),
      size(cands).cast("long").as("n_candidates"),
      size(filter(digits, d => luhnSum(d) % 10 === 0)).cast("long").as("n_valid"))
  }

  /** IBAN candidate pattern, Java-regex/RE2-identical (no lookaround —
    * RE2 has none): country code + 2 check digits + 4-char groups with
    * optional single spaces. Greedy grouping can overextend into a
    * following ALL-CAPS word; the checksum then fails and the candidate
    * counts as invalid — the validator, not the regex, is the filter. */
  val IbanRe = "\\b[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]{4}){2,7}(?: ?[A-Z0-9]{1,3})?\\b"

  /** ISO 7064 mod-97 remainder of a space-stripped IBAN candidate: first
    * four chars rotate to the end, letters expand to 10..35, and the
    * remainder folds left-to-right one char at a time (digit: x10,
    * letter: x100) — so no big-integer ever materializes. Valid IBANs
    * leave remainder 1. One per-row `aggregate` fold, codegen'd. */
  private def ibanMod97(s: Column): Column = {
    val re = concat(substr(s, lit(5), length(s) - 4), substr(s, lit(1), lit(4)))
    aggregate(sequence(lit(1), length(re)), lit(0L), (acc, i) => {
      val c = ascii(substr(re, i, lit(1)))
      when(c.between(48, 57), (acc * 10 + (c - 48)) % 97)
        .otherwise((acc * 100 + (c - 55)) % 97) // 'A' (65) -> 10
    })
  }

  /** Per-document IBAN stats — the bank-account sibling of [[cardStats]]:
    * regex candidates, then ISO 7064 mod-97 with the 15..34 length rule.
    * Pure per-row HOF folds; zero shuffles. Output:
    * (id, n_candidates, n_valid). */
  def ibanStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val cands = regexp_extract_all(t, lit(IbanRe), lit(0))
    val stripped = transform(cands, c => regexp_replace(c, lit(" "), lit("")))
    df.select(col(idCol).as("id"),
      size(cands).cast("long").as("n_candidates"),
      size(filter(stripped, s =>
        length(s).between(15, 34) && ibanMod97(s) === 1)).cast("long").as("n_valid"))
  }

  /** URL pattern (group 1 = host), Java-regex/RE2-identical: no backrefs,
    * no lookaround. */
  val UrlRe = "https?://([A-Za-z0-9.-]+)"

  def urlCount(text: Column): Column = regexp_count(text, lit(UrlRe))

  /** All URL hostnames in the text, in order (source-domain analysis:
    * crawl mixes are weighed and filtered by domain). */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(1))

  /** Domain-suffix blocklist verdict — the crawl-pipeline kill switch: true
    * when any URL hostname in the text equals a blocklisted domain or is a
    * SUBDOMAIN of one ("example.com" blocks "a.b.example.com" but never
    * "notexample.com" — matching is on dot-boundary suffixes, not
    * substrings). The blocklist is an operator-curated bounded list, so it
    * compiles into the expression as a literal array: the whole test is
    * per-row codegen — no join, no shuffle, nothing broadcast — and a
    * hostname contributes at most its label count (~8) suffixes.
    * Case-insensitive on both sides. For blocklists past ~100k entries,
    * switch to a broadcast semi join on the exploded suffixes instead. */
  def blockedByDomain(text: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "empty blocklist")
    require(blocklist.size <= 100000,
      s"${blocklist.size} blocklist entries: past the literal-array form — use a broadcast join")
    // trailing sentence punctuation joins the regex's host class
    // ('see https://bad.org.' captures 'bad.org.') — strip edge dots so
    // the dot-boundary suffixes line up with the blocklist entries
    val hosts = transform(urlDomains(lower(text)),
      h => regexp_replace(h, "^[.]+|[.]+$", ""))
    // every dot-boundary suffix of every hostname in the text
    val suffixes = flatten(transform(hosts, h =>
      transform(sequence(lit(1), size(split(h, "[.]"))), i =>
        array_join(slice(split(h, "[.]"), i, lit(1000)), "."))))
    arrays_overlap(suffixes, array(blocklist.map(d => lit(d.toLowerCase)): _*))
  }

  /** HTML -> text extraction, the first transform a web crawl sees.
    * Per-row codegen'd regex chain, no UDFs, no shuffle:
    *
    *   1. `<script>`/`<style>` blocks removed WITH their contents
    *      (case-insensitive, dot-matches-newline, non-greedy);
    *   2. comments (`<!-- -->`) removed;
    *   3. remaining tags stripped to a space (so `a<br>b` keeps its word
    *      boundary);
    *   4. the six ubiquitous entities decoded — `&amp;` LAST, so
    *      `&amp;lt;` correctly yields the literal `&lt;` instead of
    *      double-decoding to `<`;
    *   5. whitespace runs collapsed to one space, ends trimmed.
    *
    * Patterns avoid `\s` (Java and RE2 disagree on vertical tab), so the
    * SQL oracle applies byte-identical rules. Not a sanitizer — a
    * malformed-markup EXTRACTOR: unclosed tags lose to the next `>`,
    * which is the standard crawl-pipeline trade. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, v)) =>
      // entity strings carry no regex/replacement metacharacters, so the
      // regex replace IS a literal replace (the oracle uses replace())
      regexp_replace(c, e, v)
    }
    trim(regexp_replace(decoded, "[ \t\r\n]+", " "))
  }

  /** Tracking params dropped by [[canonicalizeUrl]] — the ubiquitous
    * click-attribution keys that make one page look like many URLs.
    * Java-regex/RE2-identical (no backrefs, no lookaround) so the SQL
    * oracle applies the same pattern. */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="

  /** Canonicalize an absolute http(s) URL so that trivially-distinct
    * spellings of the same page collapse to one key — THE prerequisite
    * for URL-level dedup of a crawl frontier, where `HTTP://Site.com/a/`
    * and `http://site.com/a?utm_source=feed` are the same fetch. Rules
    * (each a pure per-row string expression, whole-stage codegen, no
    * UDFs, no shuffle):
    *
    *   1. fragment stripped (`#...` never reaches the server);
    *   2. scheme and host lowercased (case-insensitive per RFC 3986 —
    *      path case is PRESERVED, it is significant);
    *   3. default port dropped (`:80` for http, `:443` for https; any
    *      other port kept);
    *   4. trailing slashes trimmed from the path;
    *   5. tracking query params removed ([[TrackingParamRe]]), the rest
    *      sorted byte-wise and rejoined — param order never
    *      distinguishes pages; an emptied query drops its `?`.
    *
    * Inputs without a `scheme://` prefix are returned unchanged —
    * canonicalization of garbage would merge UNRELATED keys, the one
    * failure mode a dedup key must never have. */
  def canonicalizeUrl(url: Column): Column = {
    val big = lit(1 << 30)
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // span arithmetic MUST use the RAW extract: lower() can change string
    // LENGTH (Turkish U+0130 lowercases to two chars), and an offset from
    // the lowered copy would slice the path off by one — corrupting the
    // key and merging unrelated URLs
    val rawAuth = regexp_extract(rest, "^([^/?]*)", 1)
    // userinfo (anything up to the first '@') is CASE-SENSITIVE per RFC
    // 3986 — only scheme and host case-fold — so it is carried unchanged
    val userPart = regexp_extract(rawAuth, "^([^@]*@)", 1)
    val hostPort = lower(rawAuth.substr(length(userPart) + 1, big))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQuery = rest.substr(length(rawAuth) + 1, big)
    val rawPath = regexp_extract(pathQuery, "^([^?]*)", 1)
    val path = regexp_replace(rawPath, "/+$", "")
    val query = pathQuery.substr(length(rawPath) + 2, big)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe)))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), userPart, host, path, queryPart))
  }

  /** Top-k characteristic terms per document by tf-idf — the keyword
    * extraction a corpus-exploration pass runs ("what is each document
    * about") and the weighting behind sparse retrieval mixes.
    *
    * Scoring uses the inverse-document-frequency weighting in EXACT
    * integer arithmetic: `score_micro = (tf * 1_000_000) div df`. Ranking
    * by a float idf (`tf * ln(N/df)`) is not reproducible across engines —
    * `ln` is not correctly-rounded in general, and a one-ulp difference
    * can flip near-tied ranks — whereas integer div is bit-identical
    * everywhere, so the output is hash-checkable against the SQL oracle
    * (docs/ORACLE.md rules). The ordering it induces (tf up, df down) is
    * the same monotone tradeoff as classic tf-idf; ties break on the term
    * string.
    *
    * Shuffle profile: tf aggregate keyed by (doc, term) with map-side
    * combine; document frequency derived FROM the tf aggregate (tf has
    * exactly one row per (doc, term), so counting rows per term there
    * equals counting distinct docs per term) as a COUNT window
    * partitioned by term — not a groupBy + self-join: the join form
    * evaluates the tf subtree twice (DataFrame plans get no
    * common-subexpression reuse, so the scan + explode + tf exchange are
    * physically duplicated — the r11 plan regression on this line),
    * whereas the window reads the single tf relation once behind one
    * term exchange, the same shuffle the join would have paid; then the
    * rank window partitioned by document (parallel, state bounded by a
    * doc's distinct terms). Returns (id, term, rank, score_micro). */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = Spread(df).select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score_micro").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("score_micro", expr("(tf * 1000000) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("rank"), col("score_micro"))
  }

  /** Per-document out-of-vocabulary rate against a bounded vocabulary —
    * the coverage check run before committing to a tokenizer/vocab: the
    * vocab is broadcast (bounded by construction: it IS a top-k), tokens
    * explode map-side, and one doc-keyed aggregate folds them back. The
    * rate is integer ppm (cross-engine exact). Returns
    * (id, n_tokens, n_oov, oov_ppm). */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, vocabCol: String): DataFrame = {
    // explode_outer keeps null-text docs in the report (as n_tokens = 0,
    // oov_ppm = null via the div-by-zero null) — a coverage check that
    // silently drops uncovered docs isn't one
    val toks = df.select(col(idCol), explode_outer(tokens(col(textCol))).as("__tok"))
    val v = vocab.select(col(vocabCol).as("__tok")).distinct()
      .withColumn("__in", lit(1))
    toks.join(broadcast(v), Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__tok")).as("n_tokens"),
        sum(when(col("__tok").isNotNull && col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      // explicit CASE: ANSI div throws on a zero divisor (null-text docs)
      .withColumn("oov_ppm",
        expr("CASE WHEN n_tokens = 0 THEN NULL ELSE n_oov * 1000000 div n_tokens END"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) — the
    * MOSS local-fingerprinting scheme: hash every k-gram, slide a window
    * of `w` consecutive hashes, select each window's RIGHTMOST minimal
    * hash. Guarantees every shared substring of length >= k + w - 1
    * contributes at least one shared fingerprint, while keeping ~2/(w+1)
    * of the grams — position-robust partial-overlap detection (quotes,
    * plagiarism, template reuse) that whole-document hashing misses.
    *
    * Pure per-row expressions, zero shuffle: gram hashes are md5 hex
    * prefixes (fixed-length lowercase hex compares numerically in any
    * engine — the cross-engine trick the samplers use), window minima are
    * one fold per window, O(m * w) per row. Cross-doc matching joins
    * `fp_hashes` through the standard (hash -> id) bucket-join skeleton
    * ([[Multimodal.videoNearDupPairs]]' shape).
    *
    * Output: (id, n_grams, fp_positions ASC, fp_hashes sorted distinct).
    * Documents shorter than k + w - 1 chars carry no fingerprints. */
  def winnowFingerprints(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8, w: Int = 5): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    // The whole pass (gram md5s + window-minimum selection) is the ONE
    // native [[graft.functions.WinnowFingerprint]] expression. The SQL
    // formulation paid three ways: interpreted HOF overhead per window
    // step, a fresh MessageDigest per md5() call, and — when the hash
    // array was a plain alias — CollapseProject inlining it into every
    // lambda-body element_at (alias uses inside lambdas are invisible to
    // its use-counter), recomputing the array per element access.
    // Spread (grow-only): O(m*w) per row must not run at the scan's
    // row-group parallelism; pre-spread callers pass through untouched.
    Spread(df).select(col(idCol).as("id"), lower(normalize(col(textCol))).as("__t"))
      .withColumn("__m", (length(col("__t")) - (k - 1)).cast("int"))
      .withColumn("__fp",
        graft.functions.WinnowFunctions.winnow_fingerprint(col("__t"), k, w))
      .select(col("id"),
        greatest(col("__m").cast("long"), lit(0L)).as("n_grams"),
        expr("array_sort(transform(__fp, x -> cast(x.p as bigint)))").as("fp_positions"),
        expr("array_sort(array_distinct(transform(__fp, x -> x.h)))").as("fp_hashes"))
  }

  /** Deflate compression ratio in ppm — the "does this text look like
    * language or like noise/boilerplate" signal production crawls cut on
    * (highly repetitive boilerplate compresses far below prose; random
    * bytes do not compress at all). `ratio_ppm = floor(1e6 *
    * compressed_len / raw_len)` with deflate level 6 over UTF-8 bytes;
    * null for empty text.
    *
    * mapPartitions, one `Deflater` REUSED per partition (reset between
    * rows — allocating a native zlib stream per row measurably dominates
    * for short docs); zero shuffles. Deterministic for a given JDK's
    * deflate implementation, which is why this is a FILTER signal with
    * spec-pinned orderings, not a DuckDB-oracle column: two engines'
    * deflate outputs are not bit-comparable the way md5 is. */
  def compressionRatio(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("raw_len", LongType),
      StructField("deflate_len", LongType),
      StructField("ratio_ppm", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](8192)
        rows.map { r =>
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (raw.isEmpty) Row(r.getLong(0), 0L, null, null)
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var compressed = 0L
            while (!deflater.finished()) compressed += deflater.deflate(buf)
            Row(r.getLong(0), raw.length.toLong, compressed,
              1000000L * compressed / raw.length)
          }
        }
      }(enc)
  }

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
