package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document- and line-level quality filtering — the rule sets a crawl
  * pipeline cuts on before training (Gopher's document heuristics, C4's
  * line heuristics; both published rule lists).
  *
  * Everything is a narrow per-row projection/filter over codegen'd
  * `org.apache.spark.sql.functions` — no UDFs, no shuffle, linear in
  * input splits at any corpus size. Ratios are rounded at fixed precision
  * and thresholds compared on the rounded values, so the keep/drop verdict
  * is bit-identical across engines (docs/ORACLE.md rules).
  */
object Quality {

  import TextAnalysis.{normalize, tokens}

  /** Gopher-style document quality rules (word count, mean word length,
    * symbol-to-word ratio, alphabetic-word fraction, stopword presence),
    * each reported as its measured value plus a final `keep` verdict.
    * Defaults follow the published rule list; bounds are parameters so a
    * pipeline can tighten them per corpus.
    *
    * Output: (id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    * stop_hits, keep).
    */
  def gopherRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwordHits: Long = 2): DataFrame = {
    val t = col(textCol)
    val out = df
      .withColumn("__toks", tokens(t))
      .withColumn("n_words", size(col("__toks")).cast("long"))
      // mean characters per word over the normalized text (spaces removed)
      .withColumn("mean_word_len",
        round(length(regexp_replace(normalize(t), " ", "")) /
          col("n_words").cast("double"), 4))
      // '#' and '...' occurrences per word (the Gopher symbol rule);
      // regexp_count is leftmost non-overlapping in both engines
      .withColumn("symbol_ratio",
        round((regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))) /
          col("n_words").cast("double"), 6))
      // fraction of words containing at least one (lowercased) letter
      .withColumn("alpha_frac",
        round(size(filter(col("__toks"), w => w.rlike("[a-z]"))) /
          col("n_words").cast("double"), 6))
      .withColumn("stop_hits", TextAnalysis.stopwordCount(t, "en").cast("long"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("alpha_frac") >= minAlphaFrac &&
          col("stop_hits") >= minStopwordHits)
    out.select(col(idCol), col("n_words"), col("mean_word_len"),
      col("symbol_ratio"), col("alpha_frac"), col("stop_hits"), col("keep"))
  }

  /** C4-style line cleaning: a line survives iff it ends in terminal
    * punctuation, has at least `minLineWords` words, and contains neither
    * a "lorem ipsum" marker nor a curly brace (the code/boilerplate
    * tells). The document is reassembled from surviving lines in order.
    *
    * Unlike [[Dedup.dropBoilerplateLines]] (corpus-wide line frequency —
    * needs an aggregate), this is a pure per-row transform: line split,
    * filter, rejoin, all inside one projection.
    *
    * Output: (id, kept_lines, dropped_lines, clean_text).
    */
  def c4CleanLines(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLineWords: Int = 5): DataFrame = {
    // CRLF-safe: crawl text commonly carries \r\n, and a trailing \r
    // would defeat the terminal-punctuation test on every line
    val lines = split(col(textCol), "\\r?\\n")
    def keepLine(l: Column): Column =
      l.rlike("[.!?]$") &&
        size(split(l, " ")) >= minLineWords &&
        !l.contains("lorem ipsum") &&
        !l.contains("{")
    val kept = filter(lines, keepLine _)
    df.withColumn("__lines", lines)
      .withColumn("__kept", kept)
      .select(col(idCol),
        size(col("__kept")).cast("long").as("kept_lines"),
        (size(col("__lines")) - size(col("__kept"))).cast("long").as("dropped_lines"),
        array_join(col("__kept"), "\n").as("clean_text"))
  }

  /** Bigram-coherence score: the ppm fraction of a document's DISTINCT
    * adjacent-token bigrams that occur in at least `minDocs` documents
    * corpus-wide — an LM-free fluency proxy (CCNet ranks by LM
    * perplexity; this is the statistical cousin that needs no model):
    * fluent prose is built from word transitions other fluent prose also
    * uses, while gibberish, OCR damage, and word-salad spam produce
    * transitions nothing else contains. Integer-ppm output, cross-engine
    * exact.
    *
    * Shuffle profile (the [[Dedup.dropBoilerplateLines]] shape): ONE
    * exchange of the per-doc-distinct bigram relation keyed by a
    * fixed-width md5 of the bigram — a COUNT WINDOW both counts each
    * bigram's document frequency and tags the rows in place (the
    * aggregate-then-join-back form would shuffle the same relation on
    * the same key twice) — then the per-doc aggregate. Nothing
    * broadcasts; a pathologically hot bigram ("of the") makes one big
    * window partition that Spark's external buffer spills.
    *
    * Returns (id, n_bigrams, n_common, coherence_ppm); docs with < 2
    * tokens report 0 bigrams and a NULL rate. */
  def bigramCoherence(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val toks = tokens(col(textCol))
    // slice-then-index (the Bpe.pairCounts guard): sequence() DESCENDS
    // when start > stop, so short docs must become empty arrays by
    // construction, not by indexing luck
    val bigrams = array_distinct(transform(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      (x, i) => concat(x, lit(" "), element_at(toks, i + 2))))
    val exploded = Spread(df).select(col(idCol).as("id"), explode_outer(bigrams).as("bg"))
      .withColumn("bh", md5(col("bg"))).drop("bg")
    val tagged = exploded.withColumn("n", count(col("bh")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("bh"))))
    tagged.groupBy(col("id")).agg(
        count(col("bh")).as("n_bigrams"),
        sum(when(col("bh").isNotNull && col("n") >= minDocs, 1L).otherwise(0L))
          .as("n_common"))
      // explicit CASE: ANSI div throws on the zero divisor of short docs
      .withColumn("coherence_ppm", expr(
        "CASE WHEN n_bigrams = 0 THEN NULL ELSE n_common * 1000000 div n_bigrams END"))
  }

  /** Corpus-level COLLOCATION mining — phrase discovery for vocabulary and
    * tokenizer work: adjacent-bigram LIFT over the whole corpus,
    *
    *   lift = P(w1 w2) / (P(w1) P(w2)) = n12 * N^2 / (B * n1 * n2),
    *
    * the PMI test without the log, reported in exact integer ppm via
    * DECIMAL(38,0) floor division so two engines agree bit for bit (a
    * float log's summation/rounding would not). lift_e6 >> 1e6 marks a
    * collocation ("new york"); ~1e6 marks independence.
    *
    * Shuffle profile: one token-keyed aggregate (unigrams), one
    * pair-keyed aggregate (bigrams, pruned by `minCount` BEFORE any
    * join), then keyed joins of the COUNT tables only — the corpus rows
    * never join anything; the two scalar totals broadcast. DECIMAL(38)
    * headroom bounds exactness to ~1e9-token corpora (6 + 3x9 digits
    * comfortably inside 38); past that, mine per shard and merge.
    * Returns (w1, w2, n12, lift_e6) for pairs at or above `minCount`. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // tokenize ONCE (eager localCheckpoint, the d2 signature pattern):
    // both the unigram and the bigram aggregate read the materialized
    // token arrays instead of re-running normalize+split over the corpus.
    // Spread first: the tokenize pass AND both downstream explode+partial-
    // aggregate stages inherit this frame's partitioning.
    val tokRows = Spread(df).select(tokens(col(textCol)).as("__toks")).localCheckpoint(true)
    val toks = col("__toks")
    // slice-then-index (the bigramCoherence guard): short docs yield
    // empty bigram arrays by construction
    val bigramsArr = transform(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      (x, i) => struct(x.as("w1"), element_at(toks, i + 2).as("w2")))
    val pairsRows = tokRows.select(explode(bigramsArr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = tokRows.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val pairCounts = pairsRows.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minCount)
    val nTotal = uni.agg(sum(col("n")).as("N"))
    val bTotal = pairsRows.agg(count(lit(1)).as("B"))
    pairCounts
      .join(uni.select(col("w").as("w1"), col("n").as("n1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n2")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(bTotal))
      .withColumn("lift_e6", expr(
        """CAST(1000000 AS DECIMAL(38,0)) * n12 * N * N div
          |  (CAST(B AS DECIMAL(38,0)) * n1 * n2)""".stripMargin))
      .select(col("w1"), col("w2"), col("n12"),
        col("lift_e6").cast("long").as("lift_e6"))
  }

  /** Language-model quality scoring (the CCNet recipe shape: score each
    * candidate document under an n-gram LM trained on reference text, cut
    * on the score). The LM is a Laplace-smoothed bigram model counted from
    * the `trainPred` slice of the corpus; every other document is scored
    * by its mean smoothed bigram probability,
    * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`, reported in exact
    * integer micros (`p_micro = (c12+1) * 1e6 div (c1+V)`) so the score —
    * unlike a float log-perplexity, whose summation order is
    * engine-dependent — is bit-identical across engines. Higher = more
    * train-like; a real pipeline thresholds `avg_p_micro` (or buckets it
    * per language, as CCNet does per-perplexity-tercile).
    *
    * Shuffle profile at scale: two map-side-combined aggregates over the
    * train slice build the LM (bigram counts, context counts); the
    * vocabulary size joins in as a broadcast single row; scoring is two
    * keyed joins of the candidate bigram stream against the LM relations —
    * no driver-side state, no assumption the LM fits in memory (AQE
    * broadcasts the LM sides only when they are actually small).
    *
    * Returns one row per NON-train document: (id, n_bigrams, sum_p_micro,
    * avg_p_micro); docs with < 2 tokens report 0 bigrams and NULL scores.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      trainPred: Column): DataFrame = {
    val base = Spread(df).select(col(idCol).as("id"), trainPred.as("__train"),
      tokens(col(textCol)).as("__toks"))
    // (w1, w2) pairs; explode_outer keeps <2-token docs as one null row
    // (slice-then-index: sequence() DESCENDS when start > stop)
    val exploded = base.select(col("id"), col("__train"), col("__toks"),
        posexplode_outer(slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0)))))
      .select(col("id"), col("__train"), col("col").as("w1"),
        element_at(col("__toks"), col("pos") + 2).as("w2"))
    val train = exploded.filter(col("__train") && col("w1").isNotNull)
    val c12 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val vocab = base.filter(col("__train"))
      .select(explode(col("__toks")).as("__tok"))
      .agg(countDistinct(col("__tok")).as("__v"))
    val scored = exploded.filter(!col("__train"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__p_micro", when(col("w1").isNotNull, expr(
        "(coalesce(__c12, 0) + 1) * 1000000 div (coalesce(__c1, 0) + __v)")))
    scored.groupBy(col("id")).agg(
        count(col("w1")).as("n_bigrams"),
        sum(col("__p_micro")).as("sum_p_micro"))
      .withColumn("avg_p_micro", expr(
        "CASE WHEN n_bigrams = 0 THEN NULL ELSE sum_p_micro div n_bigrams END"))
  }
}
