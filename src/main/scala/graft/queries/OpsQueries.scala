package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Decontaminate, Dedup, Mixture, Multimodal, Quality, Similarity, TextAnalysis}

/** Training-data pipeline operators as oracle-checked queries over the
  * `documents` / `embeddings` tables.
  *
  * Near-dup corpora are seeded inside the query (documents UNION slightly
  * modified / duplicated copies) so dedup operators have guaranteed
  * positives at every scale factor, with identical seeding in the SQL
  * oracle. All hashing is md5 (bit-identical across engines); Jaccard
  * thresholds compare exact rationals; cosine thresholds sit far from the
  * data's natural similarity range (max observed natural cosine ~0.51 vs
  * thresholds at 0.9).
  */
object OpsQueries {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents + near-dup copies (doc_id%2=0 -> +100000 with one extra
    * token) + exact copies (doc_id%3=0 -> +200000). */
  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), concat(col("text"), lit(" extra")).as("text")))
      .unionAll(d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  private val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  /** embeddings + exact copies of every 5th vector. */
  private def embCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    e.unionAll(e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  private val embCorpusSql =
    """ecorpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 5 = 0)""".stripMargin

  /** DuckDB: distinct char-4-gram shingles of corpus (mirrors
    * Dedup.shingles; note range() is exclusive where sequence() is
    * inclusive, hence the +1). */
  private val gramsSql =
    """grams AS (
      |  SELECT DISTINCT doc_id AS id, g AS gram FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, greatest(len(text) - 2, 1) + 1), i -> substr(text, i, 4))) AS g
      |    FROM corpus))""".stripMargin

  /** DuckDB: distinct word-3-shingles (mirrors Dedup.wordShingles; list
    * slicing is 1-based inclusive in both engines here). `def`: refers to
    * toksSql which initializes later in the object. */
  private def wordGramsSql =
    s"""grams AS (
       |  SELECT DISTINCT doc_id AS id, g AS gram FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      range(1, greatest(len(toks) - 2, 1) + 1),
       |      i -> array_to_string(toks[i:i+2], ' '))) AS g
       |    FROM (SELECT doc_id, $toksSql AS toks FROM corpus)))""".stripMargin

  // normalized text in DuckDB ('g' flag: replace ALL whitespace runs)
  private val normSql = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
  private val toksSql = s"string_split(lower($normSql), ' ')"

  /** Shared duplication injection for t16/t17 (the stats and excision
    * forms MUST test the same input): shared boilerplate into every 3rd
    * doc, a self-repeat (the doc's own first 8 tokens) into every 7th. */
  private def dupInjected(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          lit(" please subscribe to our channel and hit the bell icon")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" "), concat_ws(" ", slice(col("__toks"), 1, 8)))).otherwise(lit(""))
      ).as("text"))

  /** The same injection as a DuckDB CTE (used by both t16/t17 oracles). */
  private val dupInjSql =
    s"""inj AS (SELECT doc_id, text ||
       |  CASE WHEN doc_id % 3 = 0
       |       THEN ' please subscribe to our channel and hit the bell icon' ELSE '' END ||
       |  CASE WHEN doc_id % 7 = 0
       |       THEN ' ' || array_to_string(($toksSql)[1:8], ' ') ELSE '' END AS text
       |FROM documents)""".stripMargin

  /** BM25 over `documents` in DuckDB: the same rational-idf integer
    * formula as TextIndex (scaladoc derivation), HUGEINT intermediates,
    * `//` floor division, the same 1e12 idf cap. Shared by b1 (direct)
    * and b2 (the persisted index, whose disjoint build+append batches
    * merge back to exactly `documents`). */
  private def bm25Sql(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, COALESCE(len($toksSql), 0) AS dl,
       |         COALESCE(list_filter($toksSql, t -> t IN ($inList)), []) AS hits
       |  FROM documents),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM base),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       |       FROM (SELECT doc_id, dl, unnest(hits) AS term FROM base)
       |       GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |parts AS (
       |  SELECT doc_id,
       |    (CAST(22000000 AS HUGEINT) * tf * total_tokens) //
       |      (CAST(10 AS HUGEINT) * tf * total_tokens
       |       + CAST(3 AS HUGEINT) * total_tokens
       |       + CAST(9 AS HUGEINT) * dl * n_docs) AS tf_e6,
       |    least((CAST(1000000 AS HUGEINT) * (2 * (n_docs - df) + 1)) //
       |            (CAST(2 AS HUGEINT) * df + 1),
       |          CAST(1000000000000 AS HUGEINT)) AS idf_e6
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       |       CAST(sum(tf_e6 * idf_e6 // 1000000) AS BIGINT) AS score_e6
       |FROM parts GROUP BY doc_id
       |ORDER BY score_e6 DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: fingerprint group -> keeper + multiplicity
    "d1_exact_dedup" -> ((s, dir) =>
      Dedup.exact(corpus(s, dir), "doc_id", "text")),

    // MinHash + LSH near-dup: shingle -> sign -> band -> bucket join -> verify
    "d2_minhash_pairs" -> ((s, dir) =>
      Dedup.minHashNearDupPairs(corpus(s, dir), "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.5, maxBucketSize = 100)),

    // d11's scale path: DIRECTED containment verdicts over the d2 LSH
    // candidates (same signatures, bands, caps; containment_ge verify in
    // both orientations)
    "d12_containment_lsh" -> ((s, dir) =>
      Dedup.minHashContainmentPairs(corpus(s, dir), "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.9, maxBucketSize = 100)),

    // dedup clusters: connected components over the exact-Jaccard pairs
    // (bounded to a 500-doc slice — the whole corpus at sf<=0.01 — since
    // the pair stage is the d4 quadratic baseline run a second time)
    "d6_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairsBroadcast(
        corpus(s, dir).filter(col("doc_id") % 100000 < 500),
        "doc_id", "text", n = 4, threshold = 0.6)
      Dedup.clusterPairs(pairs)
    }),

    // SimHash 32-bit fingerprints
    "d3_simhash" -> ((s, dir) =>
      Dedup.simHash(tbl(s, dir, "documents"), "doc_id", "text")),

    // exact n-gram Jaccard pairs via the adaptive dispatcher: the
    // broadcast nested-loop arm when the hashed gram sets fit 64 MiB
    // (this deterministic slice does — doc_id < 1000: the whole corpus
    // at sf<=0.01, a fixed 1000-doc slice above), the PPJoin prefix
    // arm beyond the budget. Identical exact pairs either way; the
    // sub-quadratic APPROXIMATE variant is d2 (MinHash+LSH).
    "d4_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairsExact(
        corpus(s, dir).filter(col("doc_id") % 100000 < 1000),
        "doc_id", "text", n = 4, threshold = 0.6)),

    // directed containment pairs (contained -> container): asymmetric
    // overlap that Jaccard is blind to; same adaptive dispatch as d4
    // (broadcast under the byte budget, prefix filter above it)
    "d11_containment" -> ((s, dir) =>
      Dedup.containmentPairsExact(
        corpus(s, dir).filter(col("doc_id") % 100000 < 1000),
        "doc_id", "text", n = 4, threshold = 0.9)),

    // exact embedding cosine near-dup via the adaptive dispatcher:
    // broadcast brute force under 100k rows, the tiled O(n^2/tiles^2)-
    // per-task join above it; approximate paths are s2 (LSH) / s3 (IVF)
    "d5_embed_neardup" -> ((s, dir) =>
      Similarity.nearDupPairsExact(embCorpus(s, dir), "vec_id", "embedding",
        threshold = 0.9)),

    // SCALE-ARM TWINS of d4/d11/d5: the same exact semantics forced down
    // the shuffle-partitioned arm a 100 TB corpus would take (prefix
    // filter / tiled join — budget 0 disables the broadcast arm), checked
    // against the SAME oracle SQL (slice rewritten to match). The
    // broadcast twins prove the small-corpus constant factor; these prove
    // the unbounded-corpus plan emits identical pairs under the driver's
    // hash gate. Slice is 250 docs, not d4/d11's 1000: the synthetic
    // corpus's dense vocabulary defeats prefix pruning by design
    // (candidates ~ all pairs), so the twins pin CORRECTNESS of the arm,
    // not its Zipfian-corpus constant factor.
    "d4p_jaccard_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPairsExact(
        corpus(s, dir).filter(col("doc_id") % 100000 < 250),
        "doc_id", "text", n = 4, threshold = 0.6, broadcastBytesMax = 0L)),

    "d11p_containment_prefix" -> ((s, dir) =>
      Dedup.containmentPairsExact(
        corpus(s, dir).filter(col("doc_id") % 100000 < 250),
        "doc_id", "text", n = 4, threshold = 0.9, broadcastBytesMax = 0L)),

    "d5t_embed_tiled" -> ((s, dir) =>
      Similarity.nearDupPairsTiled(embCorpus(s, dir), "vec_id", "embedding",
        threshold = 0.9, tiles = 8)),

    // brute-force ANN top-3 for 10 query vectors
    "s1_ann_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // contrastive hard-negative mining: per anchor, the top-3 most-
    // similar DIFFERENT-label vectors under the mislabel cap (sim < 0.98
    // excludes near-identical cross-label rows as probable label noise)
    "s10_hard_negatives" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.hardNegatives(e.filter(col("vec_id") % 97 === 0), e,
          "vec_id", "embedding", "label", k = 3, maxSim = 0.98)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // hyperplane-LSH bucket assignment (the ANN scale path)
    "s2_ann_lsh_buckets" -> ((s, dir) =>
      Similarity.hyperplaneBuckets(tbl(s, dir, "embeddings"), "embedding", planes = 8)
        .select(col("vec_id"), col("bucket"))),

    // IVF cell assignment (the centroid-partitioned ANN scale path):
    // every 50th vector serves as a deterministic centroid
    "s3_ann_ivf_cells" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.ivfCells(e, "vec_id", "embedding",
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding")
    }),

    // product-quantization encode: 64-dim vectors -> 4 subspace codes
    // against a deterministic 16-entry codebook (the first 16 vectors);
    // micro-rounded L2 argmin is reconstructed exactly in DuckDB
    "s6_pq_encode" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.pqEncode(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 16), "vec_id", "embedding", m = 4)
    }),

    // PQ ADC search: rank neighbors by summed query-to-centroid distances
    // over the corpus's integer codes — the corpus floats are never read
    // at query time; integer-exact in both engines
    "s7_pq_search" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val cb = e.filter(col("vec_id") < 16)
      val codes = Similarity.pqEncode(e, "vec_id", "embedding",
        cb, "vec_id", "embedding", m = 4)
      Similarity.pqSearch(e.filter(col("vec_id") % 200 === 0), "vec_id", "embedding",
        codes, "vec_id", cb, "vec_id", "embedding", m = 4, k = 5)
    }),

    // SemDeDup: IVF-cell assignment + within-cell cosine >= 0.99 drop of
    // higher ids; the planted exact copies (vec_id%5 -> +100000) land in
    // their twin's cell and vanish, natural pairs (max cosine ~0.51) all
    // survive
    "d7_semdedup" -> ((s, dir) =>
      Similarity.semanticDedup(embCorpus(s, dir), "vec_id", "embedding",
        tbl(s, dir, "embeddings").filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", tau = 0.99)),

    // text analysis family
    "t1_langid" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))),
    "t2_quality" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.qualityScore(col("text"), col("n_chars")).as("quality"))),
    "t3_tokens" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).cast("long").as("re_tokens"))),
    "t4_fingerprint" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))),

    // vocabulary: top tokens by frequency (deterministic tie-break).
    // orderBy().limit() plans TakeOrderedAndProject — fully parallel
    // partial top-k, no single-partition window over the whole vocab
    // (which at 100 TB is 10^7+ rows through one task); the rank window
    // then runs over just the 20 survivors, partitioned by a constant so
    // no global-window plan appears at all
    "t5_vocab" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(20)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("cnt").desc, col("tok").asc)
      top.withColumn("rank", row_number().over(w).cast("long"))
    }),

    // document-length histogram (50-char buckets)
    "t6_length_hist" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .groupBy(expr("n_chars div 50").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))),

    // repetition/boilerplate signals (Gopher/C4-style filters), one
    // narrow per-row projection — mode counts via sorted-array run folds
    "t7_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(tbl(s, dir, "documents"))),

    // PII detect + redact over a corpus with deterministically injected
    // emails/phones/IPs (so every scale factor has guaranteed positives);
    // the redacted text itself is hash-checked via md5
    "t8_pii" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com now"))).otherwise(""),
        when(col("doc_id") % 5 === 0, lit(" call +1 555 123 4567")).otherwise(""),
        when(col("doc_id") % 7 === 0, concat(lit(" node 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".17 up"))).otherwise("")
      ).as("text"))
      injected.select(col("doc_id"),
        TextAnalysis.emailCount(col("text")).cast("long").as("emails"),
        TextAnalysis.phoneCount(col("text")).cast("long").as("phones"),
        TextAnalysis.ipv4Count(col("text")).cast("long").as("ips"),
        md5(TextAnalysis.redactPii(col("text"))).as("redacted_md5"))
    }),

    // source-domain histogram over deterministically injected URLs (the
    // crawl-mix analysis a pipeline weighs domains by)
    "t9_domains" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 2 === 0, concat(lit(" see https://site"),
          (col("doc_id") % 5).cast("string"), lit(".example.com/page now"))).otherwise(""),
        when(col("doc_id") % 7 === 0, lit(" and http://mirror.example.org too")).otherwise("")
      ).as("text"))
      injected.select(col("doc_id"),
        explode(TextAnalysis.urlDomains(col("text"))).as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_refs"), countDistinct(col("doc_id")).as("n_docs"))
    }),

    // train/test decontamination: corpus docs sharing an n-gram with a
    // benchmark slice are flagged (GPT-3-style overlap rule, n=8 here so
    // the synthetic docs produce hits). Test side = every 25th doc's
    // leading 12 tokens, mimicking short benchmark prompts
    "t10_decontaminate" -> ((s, dir) => {
      val corpus = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val test = corpus.filter(col("doc_id") % 25 === 0)
        .select(concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 12)).as("text"))
      Decontaminate.flaggedByNgramOverlap(corpus, "doc_id", "text", test, "text", n = 8)
    }),

    // deterministic train/val/test split: hash-threshold assignment,
    // reproducible row-for-row across runs/engines/cluster sizes
    "p1_hash_split" -> ((s, dir) =>
      graft.ops.Sampling.assignSplit(
        tbl(s, dir, "documents").select(col("doc_id")), "doc_id")),

    // deterministic global shuffle + sharding (training export order):
    // shard and in-shard position are pure functions of (seed, doc_id)
    "p5_shards" -> ((s, dir) =>
      graft.ops.Sampling.shuffleShards(
        tbl(s, dir, "documents").select(col("doc_id")), "doc_id", nShards = 8)),

    // stratified deterministic mixture: per-language keep rates
    "p2_stratified_sample" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSampleByHash(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 0.5, "fr" -> 0.25), defaultRate = 0.1)),

    // domain balancing: at most 30 docs per language, chosen by the md5
    // draw — survivor set is a pure function of (seed, id), oracle picks
    // the identical rows via the identical draw order
    "p7_domain_cap" -> ((s, dir) =>
      graft.ops.Sampling.capPerGroup(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", cap = 30)),

    // exactly-100 deterministic sample (the n smallest draws) — plans as
    // TakeOrderedAndProject: per-partition heaps, no global sort
    "p8_fixed_sample" -> ((s, dir) =>
      graft.ops.Sampling.fixedSample(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", n = 100)),

    // URL canonicalization for crawl-frontier dedup: synthetic URLs are
    // derived from doc_id exercising every rule (case, default ports,
    // trailing slash, tracking params, param order, fragments); the full
    // canonical string is hash-checked against the oracle applying the
    // same rules in SQL
    "t24_url_canon" -> ((s, dir) => {
      val u = tbl(s, dir, "documents").select(col("doc_id"), concat(
        when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("https")), lit("://"),
        lit("WWW.Example"), (col("doc_id") % 7).cast("string"), lit(".com"),
        when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
        lit("/Path/"), (col("doc_id") % 5).cast("string"),
        when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&b="), (col("doc_id") % 4).cast("string"), lit("&a=1"),
        when(col("doc_id") % 4 === 0, lit("&fbclid=xyz")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#section-2")).otherwise(lit(""))).as("url"))
      u.select(col("doc_id"), col("url"),
        TextAnalysis.canonicalizeUrl(col("url")).as("canon_url"))
    }),

    // line-level (paragraph) dedup, CCNet-style: the corpus is given line
    // structure deterministically (10-token body lines + boilerplate lines
    // injected into every 2nd/3rd doc), then lines appearing >= 5 times
    // corpus-wide are dropped and each doc is reassembled in order — the
    // boilerplate removal exact-document dedup can't do. The cleaned text
    // itself is hash-checked
    "t11_line_dedup" -> ((s, dir) => {
      val lined = tbl(s, dir, "documents")
        .withColumn("__toks", TextAnalysis.tokens(col("text")))
        .withColumn("__body", concat_ws("\n", expr(
          """transform(sequence(1, greatest(cast(ceil(size(__toks) / 10.0) as int), 1)),
            |          i -> concat_ws(' ', slice(__toks, (i - 1) * 10 + 1, 10)))""".stripMargin)))
        .select(col("doc_id"), concat(col("__body"),
          when(col("doc_id") % 2 === 0,
            lit("\nsubscribe to our newsletter today")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            lit("\nall rights reserved example corp")).otherwise(lit(""))).as("text"))
      Dedup.dropBoilerplateLines(lined, "doc_id", "text", minCount = 5)
        .select(col("id").as("doc_id"), col("kept_lines"), col("dropped_lines"),
          md5(col("clean_text")).as("clean_md5"))
    }),

    // Unicode NFC normalization via the codegen'd native expression:
    // decomposed accent sequences are injected deterministically, and the
    // normalized text is hash-checked against DuckDB's nfc_normalize —
    // two independent UAX #15 implementations agreeing byte-for-byte
    "t12_nfc" -> ((s, dir) => {
      import graft.functions.UnicodeFunctions
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" cafe\u0301 visit")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(" u\u0308ber angstro\u030Am")).otherwise(lit(""))
      ).as("text"))
      injected.select(col("doc_id"),
        (col("text") =!= UnicodeFunctions.nfc(col("text"))).as("changed"),
        md5(UnicodeFunctions.nfc(col("text"))).as("nfc_md5"))
    }),

    // per-doc top-3 characteristic terms by integer-scaled tf-idf (exact
    // cross-engine ordering; see TextAnalysis.tfIdfTopTerms)
    "t13_tfidf" -> ((s, dir) =>
      TextAnalysis.tfIdfTopTerms(tbl(s, dir, "documents"), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")),

    // Gopher-style document quality rules: per-rule measured values + the
    // final keep verdict, all per-row (zero-exchange). Symbol runs are
    // injected into every 6th doc so the symbol/alpha/mean-length rules
    // exercise both verdicts at every scale factor
    "t14_gopher" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 6 === 0, lit(" # # # # # # # #")).otherwise(lit(""))
      ).as("text"))
      Quality.gopherRules(injected)
    }),

    // C4-style line cleaning: docs get deterministic line structure
    // (10-token lines, terminal '.' on alternating lines) plus injected
    // boilerplate/code/short lines; surviving lines are reassembled and
    // the cleaned text hash-checked. Pure per-row HOF transform
    "t15_c4_clean" -> ((s, dir) => {
      val lined = tbl(s, dir, "documents")
        .withColumn("__toks", TextAnalysis.tokens(col("text")))
        .withColumn("__body", concat_ws("\n", expr(
          """transform(sequence(1, greatest(cast(ceil(size(__toks) / 10.0) as int), 1)),
            |  i -> concat(concat_ws(' ', slice(__toks, (i - 1) * 10 + 1, 10)),
            |              IF((doc_id + i) % 2 = 0, '.', '')))""".stripMargin)))
        .select(col("doc_id"), concat(col("__body"),
          when(col("doc_id") % 4 === 0,
            lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("\nif (x) { return y; }")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            lit("\nclick here")).otherwise(lit(""))).as("text"))
      Quality.c4CleanLines(lined, "doc_id", "text", minLineWords = 5)
        .select(col("doc_id"), col("kept_lines"), col("dropped_lines"),
          md5(col("clean_text")).as("clean_md5"))
    }),

    // domain-mixture planner: target mixture in ppm vs measured per-source
    // token counts -> largest mixture-consistent total + per-domain
    // sampling rates, in exact integer arithmetic
    "p4_domain_mix" -> ((s, dir) =>
      Mixture.domainMixturePlan(tbl(s, dir, "documents"), "source",
        TextAnalysis.tokenCount(col("text")),
        weightsPpm = Map("src0" -> 200000L, "src1" -> 100000L),
        defaultPpm = 30000L)),

    // temperature-flattened (T=2) mixture weights: sqrt(share) boosts the
    // small domains; floor(sqrt(integer)) is correctly rounded IEEE, so
    // the weights are bit-identical across engines
    "p9_temperature" -> ((s, dir) =>
      Mixture.temperatureWeights(tbl(s, dir, "documents"), "source",
        TextAnalysis.tokenCount(col("text")))),

    // one k-means (Lloyd) centroid-update step over the IVF assignment —
    // the training loop behind s3's cells; elementwise means in exact
    // integer micro-space so the result is order-independent
    "s4_kmeans_update" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.kmeansUpdate(e, "vec_id", "embedding",
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding")
    }),

    // exact duplicated-substring windows (the published training-data
    // dedup rule): cross-doc AND within-doc duplication both have
    // positives via the shared dupInjected corpus
    "t16_substring_dup" -> ((s, dir) =>
      Dedup.duplicatedNgramStats(dupInjected(s, dir), "doc_id", "text",
        n = 8, minCount = 2).withColumnRenamed("id", "doc_id")),

    // symmetric int8 embedding quantization: codes hash-checked via md5,
    // scale and mean reconstruction error as rounded integers
    "s5_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(tbl(s, dir, "embeddings"), "vec_id", "embedding")),

    // binary sign quantization + Hamming top-k: 32 dims packed per code
    // word, distance = fused XOR+popcount (codegen'd VecHamming) — the
    // 16x-smaller first stage of binary rerank-then-refine ANN
    "s9_hamming_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.hammingTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 3)
    }),

    // Count-Min sketch: every counter is md5-derived, so the DuckDB
    // oracle rebuilds the exact sketch and the exact estimates — true
    // count vs CMS estimate for the 10 most frequent tokens
    "t18_cms" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val sketch = graft.ops.Sketch.countMin(toks, "tok", depth = 4, cellHexChars = 3)
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("tok").asc).limit(10)
      top.join(
        graft.ops.Sketch.countMinEstimate(sketch, top.select(col("tok")), "tok",
          depth = 4, cellHexChars = 3),
        Seq("tok"))
    }),

    // HyperLogLog distinct-count sketch: every register is md5-derived,
    // so the DuckDB oracle rebuilds the exact register table AND the
    // exact integer-arithmetic estimate; true distinct count alongside
    "t19_hll" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val est = graft.ops.Sketch.hllEstimate(
        graft.ops.Sketch.hyperLogLog(toks, "tok", regHexChars = 2), regHexChars = 2)
      est.crossJoin(toks.agg(count_distinct(col("tok")).cast("long").as("true_distinct")))
    }),

    // round-robin curriculum interleave across languages: position is
    // computed two-phase (per-domain window + bounded-count arithmetic),
    // never a global window — the oracle's row_number() over everything
    // must agree exactly
    "p6_interleave" -> ((s, dir) =>
      graft.ops.Mixture.roundRobinInterleave(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang")),

    // context-window trim to 32 tokens; the surviving text is hash-checked
    "t21_truncate" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        least(TextAnalysis.tokenCount(col("text")), lit(32)).cast("long").as("n_kept"),
        md5(TextAnalysis.truncateTokens(col("text"), 32)).as("trunc_md5"))),

    // out-of-vocabulary rate vs the corpus's own top-20 vocabulary (the
    // synthetic corpus has ~31 distinct tokens, so real OOV mass exists)
    // incremental MATERIALIZED VIEW maintenance as an oracle-checked
    // query: create an aggregate view, then append + tombstone + upsert
    // the base and refresh — the view is maintained from the changelog
    // delta only (never recomputed), and must equal the oracle's direct
    // aggregate of the final base state
    "mv1_refresh" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, MaterializedView}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-mv-wh").toString)
      val rows = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"),
        round(col("s_acctbal") * 100, 0).cast("long").as("bal_cents"))
      IceWrite.create(s, catalog, "t_mv_base",
        rows.filter(col("s_suppkey") % 3 =!= 0).repartition(2))
      MaterializedView.create(s, catalog, "t_mv", "t_mv_base",
        Seq("s_nationkey"), Seq(MaterializedView.Agg("bal_sum", "bal_cents")))
      IceWrite.append(s, catalog, "t_mv_base", rows.filter(col("s_suppkey") % 3 === 0))
      IceWrite.deleteWhere(s, catalog, "t_mv_base", col("s_suppkey") % 5 === 0)
      IceWrite.upsert(s, catalog, "t_mv_base",
        rows.filter(col("s_suppkey") % 7 === 1)
          .withColumn("bal_cents", col("bal_cents") + 11L),
        keys = Seq("s_suppkey"))
      MaterializedView.refresh(s, catalog, "t_mv")
      IceRead.table(s, catalog, "t_mv")
        .select(col("s_nationkey"), col(MaterializedView.CountCol), col("bal_sum"))
    }),

    // table CHECK constraints enforced on write: create a constrained
    // table, attempt a violating batch (rejected ATOMICALLY, one data
    // pass — counts observed during the write, nothing committed), then
    // land a clean batch; result = the rejected batch's per-constraint
    // violation report + the final row count witnessing the rejection.
    // NULL-passes-CHECK (ANSI) is witnessed too: null-balance rows are
    // NOT bal_nonneg violations (but die with their rejected batch)
    "v1_constraints" -> ((s, dir) => {
      import graft.meta.{Constraints, IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-ck-wh").toString)
      val rows = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"),
        round(col("s_acctbal") * 100, 0).cast("long").as("bal_cents"))
      val clean = rows.filter(col("bal_cents") >= 0 && col("s_suppkey") % 4 =!= 3)
      IceWrite.create(s, catalog, "t_ck", clean.filter(col("s_suppkey") % 2 === 0))
      Constraints.addCheck(s, catalog, "t_ck", "bal_nonneg", "bal_cents >= 0")
      Constraints.addNotNull(s, catalog, "t_ck", "s_name")
      val dirty = rows.filter(col("bal_cents") < 0 || col("s_suppkey") % 4 === 3)
        .withColumn("bal_cents",
          when(col("s_suppkey") % 4 === 3, lit(null)).otherwise(col("bal_cents")))
        .withColumn("s_name",
          when(col("s_suppkey") % 8 === 3, lit(null)).otherwise(col("s_name")))
        .unionAll(s.range(1).select(lit(999999L).as("s_suppkey"),
          lit("seeded-violator").as("s_name"), lit(-1L).as("bal_cents")))
      val report = Constraints.violationReport(
        dirty, Constraints.checks(catalog.loadTable("t_ck")))
      try { Constraints.checkedAppend(s, catalog, "t_ck", dirty); () }
      catch { case _: Constraints.ConstraintViolationException => () }
      Constraints.checkedAppend(s, catalog, "t_ck",
        clean.filter(col("s_suppkey") % 2 === 1))
      val rowsAfter = IceRead.table(s, catalog, "t_ck").count()
      report.withColumn("rows_after", lit(rowsAfter))
    }),

    // write-audit-publish: stage an upsert + a delete on an "audit"
    // branch, capture main's row count BEFORE publish (branch isolation
    // witness — it must equal the original table), fast-forward main,
    // and read the published state
    "q_wap" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-wap-wh").toString)
      val src = tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      IceWrite.create(s, catalog, "t_wap", src)
      IceWrite.createBranch(catalog, "t_wap", "audit")
      IceWrite.upsert(s, catalog, "t_wap",
        src.filter(col("s_suppkey") % 4 === 0)
          .withColumn("s_name", concat(lit("W-"), col("s_name"))),
        keys = Seq("s_suppkey"), branch = "audit")
      IceWrite.deleteWhere(s, catalog, "t_wap",
        col("s_suppkey") % 6 === 0, branch = "audit")
      val prePublishRows = IceRead.table(s, catalog, "t_wap").count()
      IceWrite.publishBranch(catalog, "t_wap", "audit")
      IceRead.table(s, catalog, "t_wap")
        .withColumn("pre_publish_rows", lit(prePublishRows))
    }),

    // ICEBERG REST CATALOG LOOP as an oracle-checked query: supplier
    // lands in a graft table with MOR deletes, is SERVED over the public
    // Iceberg REST read surface (IcebergRestServe), attached back through
    // the spec client into a second catalog, and read with a filter. The
    // in-query require proves the attach pruned files on the foreign
    // table (imported zone maps, zero footer reads). Then the WRITE-BACK
    // leg: the spec client appends a parquet file through the REST commit
    // endpoint (IcebergRestCommit: load, client-written manifests,
    // requirements + add-snapshot POST) and the serving engine's read
    // picks the rows up — switch-engines in BOTH directions, one oracle.
    "q_rest_loop" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, IcebergRestCommit, IcebergRestImport,
        IcebergRestServe, LocalCatalog}
      val src = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-rest-src").toString)
      val base = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      // two RANGE-disjoint files so the imported bounds can discriminate
      val cut = base.agg(max(col("s_suppkey"))).head.getLong(0) / 2
      IceWrite.create(s, src, "t_rest", base.filter(col("s_suppkey") <= cut))
      IceWrite.append(s, src, "t_rest", base.filter(col("s_suppkey") > cut))
      IceWrite.deleteWhere(s, src, "t_rest", col("s_suppkey") % 9 === 0)
      // ANALYZE persists theta sketches — served metadata must then carry
      // the spec `statistics` list so external CBOs see cardinalities
      graft.meta.NdvStats.analyze(s, src, "t_rest")
      val srv = new IcebergRestServe(src, namespace = "wh", prefix = "p")
      try {
        val dst = LocalCatalog(
          java.nio.file.Files.createTempDirectory("q-rest-dst").toString)
        val attached = IcebergRestImport.importTable(dst, "t_back", srv.uri,
          Seq("wh"), "t_rest")
        require(attached.properties.contains("stats.s_suppkey.ndv"),
          "served statistics did not reach the attach client as stats.<col>.ndv")
        val probe = IceRead.table(s, dst, "t_back")
          .filter(col("s_suppkey") <= cut)
        probe.collect()
        val (total, kept) = graft.exec.GraftScan.pruneStats(probe)
        require(total >= 2 && kept < total,
          s"attached table did not prune via imported bounds: $kept of $total")

        // write-back: the spec client appends shifted copies of every
        // 5th supplier through the commit endpoint
        val staging = java.nio.file.Files.createTempDirectory("q-rest-wb").toString
        val extra = base.filter(col("s_suppkey") % 5 === 0)
          .select((col("s_suppkey") + 1000000L).as("s_suppkey"), col("s_name"))
        val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
          s, IceWrite.withFieldIds(extra, src.loadTable("t_rest").schema),
          java.nio.file.Paths.get(staging, "wb.parquet"))
        IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "t_rest",
          Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
        // FOREIGN DELETE leg: the spec client then removes every supplier
        // with s_suppkey % 7 = 2 through a row-delta commit (an
        // equality-delete parquet it wrote itself) — the graft MOR read
        // below must apply a delete this engine never planned
        val tMeta = src.loadTable("t_rest")
        val delKeys = base.filter(col("s_suppkey") % 7 === 2).select("s_suppkey")
        val (pd, pdSz, pdN, _) = graft.testkit.FileGenerator.writeSingleParquet(
          s, IceWrite.withFieldIds(delKeys, tMeta.schema),
          java.nio.file.Paths.get(staging, "fdel.parquet"))
        IcebergRestCommit.commitDelta(srv.uri, Seq("wh"), "t_rest", Nil,
          Seq(IcebergRestCommit.AddedDeleteFile(pd, pdSz, pdN, "equality",
            equalityFieldIds = Seq(tMeta.fieldByName("s_suppkey").get.id))), staging)
        IceRead.table(s, src, "t_rest")
          .filter(col("s_suppkey") <= cut || col("s_suppkey") >= 1000000L)
      } finally srv.stop()
    }),

    // FOREIGN COMPACTOR over REST as an oracle-checked query: a MOR
    // supplier table is served; a spec client commits a REPLACE (the
    // reference's RewriteFiles shape) — every live file + its deletes out,
    // one rewritten data file in at the STARTING sequence number — then a
    // foreign equality-delete lands on top. The starting-seq rule is what
    // makes the later delete outrank the rewritten rows; in-query requires
    // pin the single-file manifest and the pinned sequence, and the final
    // graft MOR read is what DuckDB hash-checks.
    "q_rest_replace" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, IcebergRestCommit, IcebergRestServe,
        LocalCatalog}
      val src = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-rest-rw").toString)
      val base = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      val cut = base.agg(max(col("s_suppkey"))).head.getLong(0) / 2
      IceWrite.create(s, src, "t_rw", base.filter(col("s_suppkey") <= cut))
      IceWrite.append(s, src, "t_rw", base.filter(col("s_suppkey") > cut))
      IceWrite.deleteWhere(s, src, "t_rw", col("s_suppkey") % 9 === 0)
      val head = src.loadTable("t_rw")
      val startingSeq = head.currentSnapshot.get.sequenceNumber
      val removed = head.currentSnapshot.get.manifest.map(_.path).distinct
      val srv = new IcebergRestServe(src, namespace = "wh", prefix = "p")
      try {
        val staging = java.nio.file.Files.createTempDirectory("q-rest-rw-st").toString
        val live = IceRead.table(s, src, "t_rw")
        val (cp, cpSz, cpN, _) = graft.testkit.FileGenerator.writeSingleParquet(
          s, IceWrite.withFieldIds(live, head.schema),
          java.nio.file.Paths.get(staging, "compacted.parquet"))
        IcebergRestCommit.replaceFiles(srv.uri, Seq("wh"), "t_rw",
          removed, Seq(IcebergRestCommit.AddedFile(cp, cpSz, cpN)), staging)
        val after = src.loadTable("t_rw")
        val m = after.currentSnapshot.get.manifest
        require(m.size == 1 && m.head.path == cp,
          s"replace must leave exactly the rewritten file: $m")
        require(m.head.sequenceNumber == startingSeq,
          s"starting-seq rule violated: ${m.head.sequenceNumber} != $startingSeq")
        require(after.currentSnapshot.get.summary("operation") == "replace")
        // the foreign DELETE after the rewrite: eq-delete on s_suppkey
        val delKeys = base.filter(col("s_suppkey") % 7 === 3).select("s_suppkey")
        val (pd, pdSz, pdN, _) = graft.testkit.FileGenerator.writeSingleParquet(
          s, IceWrite.withFieldIds(delKeys, after.schema),
          java.nio.file.Paths.get(staging, "post-del.parquet"))
        IcebergRestCommit.commitDelta(srv.uri, Seq("wh"), "t_rw", Nil,
          Seq(IcebergRestCommit.AddedDeleteFile(pd, pdSz, pdN, "equality",
            equalityFieldIds = Seq(after.fieldByName("s_suppkey").get.id))), staging)
        IceRead.table(s, src, "t_rw")
      } finally srv.stop()
    }),

    // SERVE-UNDER-COMMIT as an oracle-checked query (the round-10
    // concurrent-dispatch line): while a background foreign writer lands
    // three row-delta commits (each validated server-side with real
    // footer I/O), a reader fleet keeps planning and loading the same
    // table. The dispatch is concurrent — commits serialize per entry,
    // readers never wait on them — so this line's bench time tracks
    // serve throughput under mixed load. The final MOR read (all three
    // deltas applied) is what DuckDB hash-checks.
    "q_plan_under_commit" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, IcebergRestCommit, IcebergRestServe,
        LocalCatalog}
      val cat = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-puc").toString)
      val base = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      IceWrite.create(s, cat, "t_puc", base)
      val head = cat.loadTable("t_puc")
      val keyId = head.fieldByName("s_suppkey").get.id
      val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
      try {
        val staging = java.nio.file.Files.createTempDirectory("q-puc-st").toString
        // stage the delete-key parquet up front so the writer thread does
        // pure REST commits (manifest write + server-side validation)
        val dels = Seq((11L, 0L), (13L, 1L), (17L, 2L)).zipWithIndex.map {
          case ((m, r), i) =>
            val keys = base.filter(col("s_suppkey") % m === r).select("s_suppkey")
            val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
              s, IceWrite.withFieldIds(keys, head.schema),
              java.nio.file.Paths.get(staging, s"del$i.parquet"))
            IcebergRestCommit.AddedDeleteFile(p, sz, n, "equality",
              equalityFieldIds = Seq(keyId))
        }
        @volatile var writerErr: Option[Throwable] = None
        val writer = new Thread(() => {
          try dels.foreach(d => IcebergRestCommit.commitDelta(
            srv.uri, Seq("wh"), "t_puc", Nil, Seq(d), staging))
          catch { case e: Throwable => writerErr = Some(e) }
        })
        writer.start()
        val http = java.net.http.HttpClient.newHttpClient()
        var plans = 0
        while (writer.isAlive || plans < 3) {
          val plan = http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(
              s"${srv.uri}/v1/p/namespaces/wh/tables/t_puc/plan"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          require(plan.statusCode == 200, s"plan under commit: ${plan.body}")
          val load = http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(
              s"${srv.uri}/v1/p/namespaces/wh/tables/t_puc")).GET().build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          require(load.statusCode == 200, s"load under commit: ${load.body}")
          plans += 1
        }
        writer.join()
        writerErr.foreach(throw _)
        require(plans >= 3, s"reader fleet issued only $plans plan/load rounds")
        IceRead.table(s, cat, "t_puc")
      } finally srv.stop()
    }),

    // CATALOG VIEWS as an oracle-checked query: a versioned SQL view is
    // created through the front door (CREATE VIEW, then CREATE OR REPLACE
    // appending version 2), exported as public Iceberg VIEW-SPEC v1
    // metadata, imported into a second catalog, and the IMPORTED view's
    // rows are what DuckDB hash-checks. Reads substitute the analyzed
    // plan of the stored SQL, so the aggregation runs exactly as if typed
    // inline — a view costs nothing at scale that its SELECT doesn't.
    "q_view_sql" -> ((s, dir) => {
      import graft.meta.{GraftSql, IceWrite, IcebergExport, IcebergImport, LocalCatalog}
      val cat = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-view-wh").toString)
      GraftSql.register("qview", cat)
      IceWrite.create(s, cat, "sup", tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey")))
      s.sql("CREATE VIEW qview.v AS SELECT s_nationkey, count(*) AS suppliers " +
        "FROM qview.sup GROUP BY s_nationkey")
      s.sql("CREATE OR REPLACE VIEW qview.v AS " +
        "SELECT s_nationkey, CAST(count(*) AS BIGINT) AS suppliers, " +
        "CAST(sum(s_suppkey) AS BIGINT) AS key_sum " +
        "FROM qview.sup WHERE s_suppkey % 3 <> 0 GROUP BY s_nationkey")
      val path = IcebergExport.exportIcebergViewMetadata(cat, "v")
      val dst = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-view-dst").toString)
      val back = IcebergImport.importIcebergViewMetadata(dst, "v2", path)
      require(graft.meta.Views.versions(back).map(_._1) == Seq(1, 2),
        "view versions did not survive the spec round trip")
      GraftSql.register("qviewd", dst)
      s.sql("SELECT * FROM qviewd.v2")
    }),

    // REST TABLE LIFECYCLE as an oracle-checked query: a spec client
    // CREATES a table in the graft catalog through the public REST
    // catalog's CreateTableRequest (the schema/sort-order JSON is parsed
    // by the same machinery as an attach), REST-appends the nation rows
    // below the cut as a client-written parquet commit, the NATIVE engine
    // appends the rest, and the MOR read over the REST-created table
    // hash-matches DuckDB over the same slices. In-query requires pin the
    // created schema/sort/properties and that DELETE removes the table —
    // the full switch-engines lifecycle (create, write both ways, drop)
    // in one oracle.
    "q_rest_create" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, IcebergRestCommit, IcebergRestServe,
        LocalCatalog, SortField}
      val cat = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-rest-create").toString)
      val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
      try {
        val http = java.net.http.HttpClient.newHttpClient()
        def post(path: String, body: String) =
          http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"${srv.uri}$path"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
        val created = post("/v1/p/namespaces/wh/tables",
          """{"name": "t_created",
            |  "schema": {"type": "struct", "fields": [
            |    {"id": 1, "name": "n_nationkey", "required": true, "type": "int"},
            |    {"id": 2, "name": "n_name", "required": false, "type": "string"}]},
            |  "write-order": {"fields": [
            |    {"transform": "identity", "source-id": 1,
            |     "direction": "asc", "null-order": "nulls-first"}]},
            |  "properties": {"owner": "rest-client"}}""".stripMargin)
        require(created.statusCode() == 200,
          s"REST create failed: ${created.statusCode()} ${created.body()}")
        val meta = cat.loadTable("t_created")
        require(meta.schema.map(_.name) == Seq("n_nationkey", "n_name") &&
          meta.sortOrder == Seq(SortField("n_nationkey")) &&
          meta.properties.get("owner").contains("rest-client"),
          s"REST create mapped the request wrong: $meta")

        val base = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        // the spec client writes the LOW slice through the commit endpoint
        val staging = java.nio.file.Files.createTempDirectory("q-rest-create-st").toString
        val (p1, sz1, n1, _) = graft.testkit.FileGenerator.writeSingleParquet(
          s, IceWrite.withFieldIds(base.filter(col("n_nationkey") < 13), meta.schema),
          java.nio.file.Paths.get(staging, "low.parquet"))
        IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "t_created",
          Seq(IcebergRestCommit.AddedFile(p1, sz1, n1)), staging)
        // the native engine writes the HIGH slice
        IceWrite.append(s, cat, "t_created", base.filter(col("n_nationkey") >= 13))
        // materialize BEFORE the drop below deletes the table's files
        val rows = IceRead.table(s, cat, "t_created").collect().toSeq
          .map(r => (r.getInt(0), r.getString(1)))

        // DROP over REST removes the table from every route
        val del = http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/t_created"))
          .DELETE().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
        require(del.statusCode() == 204 && !cat.tableExists("t_created"),
          s"REST drop failed: ${del.statusCode()}")
        import s.implicits._
        rows.toDF("n_nationkey", "n_name")
      } finally srv.stop()
    }),

    // NDV STATISTICS INTEROP as an oracle-checked query: nation lands in
    // a graft table, per-column theta sketches ride the Iceberg export as
    // Puffin apache-datasketches-theta-v1 blobs (the statistics list
    // external CBOs read), and the IMPORTED table's stats.<col>.ndv
    // properties are emitted as rows. Nation's cardinalities sit far
    // below the sketch nominal, so the estimates are EXACT by
    // construction and DuckDB replays them as count(DISTINCT ...) — the
    // whole export->import stats loop is hash-checked.
    "q_ndv_stats" -> ((s, dir) => {
      import graft.meta.{IceWrite, IcebergExport, IcebergImport, LocalCatalog, NdvStats}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-ndv-wh").toString)
      IceWrite.create(s, catalog, "t_q_ndv", tbl(s, dir, "nation"))
      val sketches = NdvStats.compute(s, catalog, "t_q_ndv")
      val jsonPath = IcebergExport.exportIcebergMetadata(catalog, "t_q_ndv",
        ndvSketches = sketches)
      val dst = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-ndv-dst").toString)
      val back = IcebergImport.importIcebergMetadata(dst, "t_q_ndv2", jsonPath)
      val rows = back.properties.toSeq.collect {
        case (k, v) if k.startsWith("stats.") && k.endsWith(".ndv") =>
          (k.stripPrefix("stats.").stripSuffix(".ndv"), v.toLong)
      }.sortBy(_._1)
      require(rows.nonEmpty, "import carried no ndv statistics")
      import s.implicits._
      rows.toDF("col_name", "ndv")
    }),

    // THETA SKETCHES THROUGH SQL: theta_sketch is a registered aggregate
    // (TypedImperativeAggregate — the scan stays codegen'd, partials ship
    // one bounded sketch per partition) and theta_estimate decodes the
    // blob; both cardinalities sit far below the sketch nominal, so the
    // estimates are EXACT and DuckDB replays them as count(DISTINCT ...)
    "q_theta_sql" -> ((s, dir) => {
      graft.functions.GraftExtensions.register(s)
      tbl(s, dir, "orders").createOrReplaceTempView("q_theta_orders")
      s.sql("""SELECT theta_estimate(theta_sketch(o_custkey)) AS ndv_cust,
              |       theta_estimate(theta_sketch(o_orderstatus)) AS ndv_status
              |FROM q_theta_orders""".stripMargin)
    }),

    // ICEBERG V3 INTEROP as an oracle-checked query: supplier lands in a
    // format-v3 graft table, deletion vectors tombstone s_suppkey % 7 = 0
    // (Puffin deletion-vector-v1 blobs), the table exports AS
    // format-version 3 — DV manifest entries carrying blob coordinates
    // (referenced_data_file/content_offset/content_size_in_bytes), row
    // lineage, next-row-id — and attaches into a SECOND catalog. In-query
    // requires prove the attach carried real DV entries and a consistent
    // row-id space; the MOR read over the attached table hash-matches
    // DuckDB. This is the v3 switch-engines path the v2 loop (q_rest_loop)
    // cannot carry.
    "q_v3_attach" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, IcebergExport, IcebergImport, LocalCatalog}
      val src = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-v3-src").toString)
      val base = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      IceWrite.create(s, src, "t_v3", base, formatVersion = 3)
      IceWrite.deleteWhereDv(s, src, "t_v3", col("s_suppkey") % 7 === 0)
      val jsonPath = IcebergExport.exportIcebergMetadata(src, "t_v3")
      val dst = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-v3-dst").toString)
      val back = IcebergImport.importIcebergMetadata(dst, "t_v3b", jsonPath)
      require(back.formatVersion == 3 &&
        back.currentSnapshot.get.manifest.exists(_.isDeletionVector),
        "v3 attach lost the deletion vectors")
      // row lineage survived: every surviving row has a distinct id below
      // the imported next-row-id cursor
      val ids = IceRead.tableWithRowIds(s, dst, "t_v3b")
        .agg(count(lit(1)).as("n"), countDistinct(col("_row_id")).as("d"),
          max(col("_row_id")).as("mx")).head
      require(ids.getLong(0) == ids.getLong(1) && ids.getLong(2) < back.nextRowId,
        s"v3 attach lost row lineage: $ids vs next-row-id ${back.nextRowId}")
      IceRead.table(s, dst, "t_v3b")
    }),

    // write-audit-publish PURELY through SQL (q_wap's twin): stage an
    // append under spark.wap.id (the snapshot commits unpublished),
    // prove main is untouched while staged (in-query require), locate
    // the staged snapshot via the snapshots metadata table, publish with
    // CALL cherrypick_snapshot — Iceberg's procedure names, so WAP
    // runbooks port verbatim. The oracle replays base+staged rows and
    // the pre-publish count relationally.
    // PARTITIONS METADATA TABLE as an oracle-checked query: orders lands
    // identity-partitioned by o_orderstatus, and graft.t.partitions plus
    // SHOW PARTITIONS answer per-partition totals from the MANIFEST alone
    // (driver-side aggregation, zero scan jobs at any table size). The
    // in-query require pins SHOW PARTITIONS against the same grouping;
    // DuckDB replays the per-partition row totals relationally.
    "q_meta_partitions" -> ((s, dir) => {
      import graft.meta.{GraftSql, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-mpart-wh").toString)
      GraftSql.register("qpm", catalog)
      tbl(s, dir, "orders").createOrReplaceTempView("q_pm_orders")
      s.sql("CREATE TABLE qpm.t (o_orderkey BIGINT, o_orderstatus STRING) " +
        "PARTITIONED BY (o_orderstatus)")
      s.sql("INSERT INTO qpm.t SELECT o_orderkey, o_orderstatus FROM q_pm_orders")
      val shown = s.sql("SHOW PARTITIONS qpm.t").collect()
        .map(_.getString(0).stripPrefix("o_orderstatus=")).sorted.toSeq
      val q = s.sql("SELECT partition['o_orderstatus'] AS o_orderstatus, " +
        "record_count AS rows FROM qpm.t.partitions")
      require(q.collect().map(_.getString(0)).sorted.toSeq == shown,
        "SHOW PARTITIONS disagrees with the partitions metadata table")
      q
    }),

    "q_wap_sql" -> ((s, dir) => {
      import graft.meta.{GraftSql, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-wapsql-wh").toString)
      GraftSql.register("qwap", catalog)
      tbl(s, dir, "supplier").createOrReplaceTempView("q_wap_supplier")
      s.sql("""CREATE TABLE qwap.t (s_suppkey BIGINT, s_name STRING)
              |TBLPROPERTIES ('write.wap.enabled' = 'true')""".stripMargin)
      s.sql("INSERT INTO qwap.t SELECT s_suppkey, s_name FROM q_wap_supplier")
      val baseRows = s.sql("SELECT count(*) FROM qwap.t").head.getLong(0)
      s.conf.set("spark.wap.id", "audit-7")
      try s.sql("""INSERT INTO qwap.t
                  |SELECT s_suppkey + 1000000, s_name FROM q_wap_supplier
                  |WHERE s_suppkey % 3 = 0""".stripMargin)
      finally s.conf.unset("spark.wap.id")
      val prePublish = s.sql("SELECT count(*) FROM qwap.t").head.getLong(0)
      require(prePublish == baseRows,
        s"staged snapshot leaked into main: $prePublish != $baseRows")
      val stagedId = s.sql(
        "SELECT snapshot_id FROM qwap.t.snapshots WHERE summary['wap.id'] = 'audit-7'")
        .head.getLong(0)
      s.sql(s"CALL qwap.system.cherrypick_snapshot('t', $stagedId)")
      s.sql("SELECT s_suppkey, s_name FROM qwap.t")
        .withColumn("pre_publish_rows", lit(prePublish))
    }),

    // z-order (Morton) clustering key: bit-interleave two integer bucket
    // columns with the codegen'd shift/or tree (bit i of column j lands
    // at key bit i*ncols+j); the oracle unrolls the identical bit
    // arithmetic, so the layout key every zorder(a,b) compaction sorts by
    // is hash-checked end to end
    "z1_zorder" -> ((s, dir) => {
      import graft.functions.ZOrder
      tbl(s, dir, "supplier").select(col("s_suppkey"),
        ZOrder.interleaved(Seq(
          col("s_nationkey").cast("long"),
          (col("s_suppkey") % 256).cast("long")), bits = 8).as("zval"))
    }),

    // overlapping sliding-window chunking (the RAG chunker): 64-token
    // windows advancing by 48 (16-token overlap); chunk text compared
    // verbatim against the oracle's identical 1-based list slices
    "p11_chunk_overlap" -> ((s, dir) =>
      graft.ops.Packing.chunkOverlapping(tbl(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 64, stride = 48)
        .withColumnRenamed("id", "doc_id")),

    // winnow-fingerprint overlap pairs (t37's scale path): the seeded
    // near-dup corpus guarantees high-overlap positives; the oracle
    // replays selection + the capped hash join + integer overlap ppm
    "d13_winnow_pairs" -> ((s, dir) =>
      // k=12 grams: 8-char grams are common English fragments whose
      // medium-hot buckets (under the cap but shared by hundreds of
      // docs) explode the pair join quadratically at corpus scale;
      // longer grams make fingerprints selective, and the tighter cap
      // drops the generic-phrase tail outright
      Dedup.winnowNearDupPairs(corpus(s, dir), "doc_id", "text",
        k = 12, minOverlapPpm = 500000L, maxBucketSize = 64)),

    // substring-level decontamination: test snippets are literal
    // substrings of every 25th doc, so contamination exists by
    // construction. k=20 grams + 4 hits: the synthetic corpus shares
    // short template phrases across MOST docs (k=12 flagged 90% of it);
    // 24-char guaranteed runs isolate the truly contaminated sources
    "t38_winnow_decontam" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val test = docs.filter(col("doc_id") % 25 === 0)
        .select(expr("substring(text, 11, 120)").as("snippet"))
      Decontaminate.flaggedByWinnowOverlap(docs, "doc_id", "text",
        test, "snippet", k = 20, w = 5, minHits = 4)
    }),

    // winnowing fingerprints (MOSS): per-doc selected-position count and
    // position checksum; the oracle replays gram hashing, the rightmost-
    // window-minimum fold, and the dedup in DuckDB list ops
    "t37_winnow" -> ((s, dir) =>
      TextAnalysis.winnowFingerprints(tbl(s, dir, "documents"))
        .select(col("id").as("doc_id"), col("n_grams"),
          size(col("fp_positions")).cast("long").as("n_selected"),
          expr("aggregate(fp_positions, 0L, (a, p) -> a + p)").as("pos_sum"))),

    // edit distance (record-linkage string similarity): names mutated
    // arithmetically (char drop / suffix append / reversal) so distances
    // derive from the same DP both engines implement — exact integers
    "t36_edit_distance" -> ((s, dir) =>
      tbl(s, dir, "supplier").select(col("s_suppkey"),
        expr("""CASE CAST(s_suppkey % 3 AS INT)
                |  WHEN 0 THEN substring(s_name, 2)
                |  WHEN 1 THEN concat(s_name, 'xy')
                |  ELSE reverse(s_name) END""".stripMargin).as("mutated"))
        .join(tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name")), "s_suppkey")
        .select(col("s_suppkey"),
          levenshtein(col("s_name"), col("mutated")).cast("long").as("dist"))),

    // k-core peeling: a 6-clique and an 8-cycle survive the 2-core; a
    // pendant star, a 3-node tail, and the bridge endpoints peel away.
    // Spark peels to a FIXPOINT; the oracle unrolls 5 peel rounds (>= the
    // construction's peel depth of 3) over the same edge list
    "g3_kcore" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Graph.kCore(kCoreEdges.toDF("src", "dst"), "src", "dst", k = 2)
    }),

    // hilbert clustering key (z-order's locality-tighter twin): the
    // codegen'd per-row rotation loop, hash-checked against a DuckDB
    // RECURSIVE CTE replaying the identical xy2d state machine one bit
    // level per iteration — same integer ops, same rotation cases
    "z2_hilbert" -> ((s, dir) => {
      import graft.functions.HilbertCurve
      tbl(s, dir, "supplier").select(col("s_suppkey"),
        HilbertCurve.hilbertD2(
          (col("s_suppkey") % 256).cast("long"),
          ((col("s_suppkey") * 7 + col("s_nationkey")) % 256).cast("long"),
          bits = 8).as("hval"))
    }),

    // EXACT heavy hitters (frequent tokens above N/k) via Misra-Gries
    // candidate pruning + an exact candidate-only count: the MG stage is
    // pure pruning, so the answer is deterministic and the oracle is a
    // plain GROUP BY ... HAVING over all tokens
    "h1_heavy_hitters" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      graft.ops.Sketch.heavyHitters(toks, "tok", 50)
    }),

    // PageRank over a deterministic domain link graph (the crawl-frontier
    // prioritizer): nodes/edges derive from doc ids, so both engines build
    // the identical graph; 3 rounds of the integer floor-division formula
    // replay exactly via unrolled CTEs — including dangling-mass handling,
    // since several dst-only domains have no out-edges
    "g1_pagerank" -> ((s, dir) => {
      val edges = tbl(s, dir, "documents").select(
        concat(lit("d"), (col("doc_id") % 23).cast("string")).as("src"),
        concat(lit("d"), ((col("doc_id") * 7 + 3) % 29).cast("string")).as("dst"))
      graft.ops.Graph.pageRank(edges, "src", "dst", 3)
    }),

    // per-node triangle counts over a denser synthetic link graph:
    // degree-oriented wedge generation (Suri-Vassilvitskii), each triangle
    // found once at its lowest-(degree, id) apex
    "g2_triangles" -> ((s, dir) => {
      val edges = tbl(s, dir, "documents").select(
        concat(lit("d"), (col("doc_id") % 17).cast("string")).as("src"),
        concat(lit("d"), ((col("doc_id") * 5 + 2) % 19).cast("string")).as("dst"))
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
    }),

    // trained hashed-token classifier (the fastText-shaped corpus filter):
    // train on 2/3 of the docs with label = (lang == 'en'), score the held
    // out third — Laplace weights, floor averaging, and the prior fallback
    // are all integer-ppm, replayed exactly by the oracle
    "c1_classifier" -> ((s, dir) => {
      val labeled = tbl(s, dir, "documents")
        .withColumn("label", (col("lang") === "en").cast("int"))
      val model = graft.ops.Classifier.train(
        labeled.filter(col("doc_id") % 3 =!= 0), "text", "label")
      graft.ops.Classifier.score(
        labeled.filter(col("doc_id") % 3 === 0), "doc_id", "text", model)
    }),

    "t22_oov" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(20)
      TextAnalysis.oovRate(d, "doc_id", "text", vocab, "tok")
    }),

    // fixed-bin quantile histogram: 256 bins over order totals; the p50/
    // p90/p99 bin selections and upper-edge values are integer-exact in
    // both engines
    "t20_quantile" -> ((s, dir) => {
      val hist = graft.ops.Sketch.quantileHistogram(
        tbl(s, dir, "orders"), "o_totalprice", lo = 0.0, hi = 600000.0, nBins = 256)
      graft.ops.Sketch.quantileEstimate(hist, Seq(500000L, 900000L, 990000L),
        lo = 0.0, hi = 600000.0, nBins = 256)
    }),

    // per-language doc-length quantiles from ONE grouped histogram pass
    "t23_group_quantile" -> ((s, dir) => {
      val hist = graft.ops.Sketch.quantileHistogramBy(
        tbl(s, dir, "documents"), "lang", "n_chars", lo = 0.0, hi = 2000.0, nBins = 128)
      graft.ops.Sketch.quantileEstimateBy(hist, "lang", Seq(500000L, 900000L),
        lo = 0.0, hi = 2000.0, nBins = 128)
    }),

    // the cross-RUN incremental dedup as an oracle query: two batches run
    // against a real persisted index inside the query (batch 1 carries
    // copies of batch-0 content under new ids), and the per-batch
    // emissions are reconstructed relationally — batch-0 keepers, then
    // batch-1 keepers anti-joined on batch-0 fingerprints
    "i1_incremental_exact" -> ((s, dir) => {
      import graft.meta.LocalCatalog
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-i1-wh").toString)
      val d = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val b0 = d.filter(col("doc_id") % 3 =!= 0)
      val b1 = d.filter(col("doc_id") % 3 === 0)
        .unionAll(b0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val out0 = graft.ops.Dedup.incrementalExact(s, catalog, "i1_idx", b0,
        "doc_id", "text", 0L)
      val out1 = graft.ops.Dedup.incrementalExact(s, catalog, "i1_idx", b1,
        "doc_id", "text", 1L)
      out0.select(lit(0L).as("batch_id"), col("doc_id"))
        .unionAll(out1.select(lit(1L).as("batch_id"), col("doc_id")))
    }),

    // the cross-RUN NEAR-dup index as an oracle query: batch 1 carries
    // near-copies (one extra token) of batch-0 survivors under new ids;
    // the oracle replays the whole stack relationally — signatures,
    // banding, capped bucket joins (batch AND index side), exact-Jaccard
    // verify, within-batch connected components, and the cross-run anti
    // join
    "i2_incremental_minhash" -> ((s, dir) => {
      import graft.meta.LocalCatalog
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-i2-wh").toString)
      val d = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val b0 = d.filter(col("doc_id") % 3 =!= 0)
      val b1 = d.filter(col("doc_id") % 3 === 0)
        .unionAll(b0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(col("text"), lit(" extra")).as("text")))
      val out0 = graft.ops.Dedup.incrementalMinHash(s, catalog, "i2_idx", b0,
        "doc_id", "text", 0L)
      val out1 = graft.ops.Dedup.incrementalMinHash(s, catalog, "i2_idx", b1,
        "doc_id", "text", 1L)
      out0.select(lit(0L).as("batch_id"), col("doc_id"))
        .unionAll(out1.select(lit(1L).as("batch_id"), col("doc_id")))
    }),

    // HTML -> text extraction: deterministic markup (script/style blocks
    // with stray '<' inside, a multi-line comment, entities incl. the
    // &amp;lt; double-decode trap) wrapped around every document; the
    // full cleaned string is hash-checked against the oracle applying
    // the same rules
    "t25_html_strip" -> ((s, dir) => {
      val h = tbl(s, dir, "documents").select(col("doc_id"), concat(
        lit("<html><HEAD><title>T</title>"),
        when(col("doc_id") % 2 === 0,
          lit("<script type=\"text/js\">var x = 1 < 2;</script>")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          lit("<style>p { color: red }</style>")).otherwise(lit("")),
        lit("</HEAD><body><p>"), col("text"),
        lit("</p><!-- hidden\ncomment -->"),
        when(col("doc_id") % 4 === 0,
          lit("<b>bold &amp;lt; x</b> &quot;q&#39;s&quot; &nbsp;end")).otherwise(lit("")),
        lit("<br>tail</body></html>")).as("html"))
      h.select(col("doc_id"), TextAnalysis.stripHtml(col("html")).as("clean_text"))
    }),

    // the PERSISTED IVF+PQ index end to end: build (trainIters=0, so the
    // deterministic md5-draw seeds ARE the centroids and every stage is
    // SQL-expressible) -> catalog tables -> multi-probe serve from
    // integer codes alone. The oracle replays seed selection, cell
    // assignment, PQ encode, 2-probe candidate generation, and ADC
    // ranking relationally
    "s8_ann_index" -> ((s, dir) => {
      import graft.meta.LocalCatalog
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-ann-wh").toString)
      val e = tbl(s, dir, "embeddings")
      graft.ops.AnnIndex.build(s, catalog, "annq", e, "vec_id", "embedding",
        nCells = 8, m = 4, trainIters = 0)
      graft.ops.AnnIndex.search(s, catalog, "annq",
        e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        k = 5, nprobe = 2)
    }),

    // SEMANTIC decontamination: corpus embeddings within cosine 0.9 of
    // any test-set embedding (the test set = planted copies of every
    // 20th corpus vector; natural cosines top out ~0.51, far from the
    // threshold, so exactly the planted sources flag)
    "d9_semantic_decontam" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Decontaminate.flaggedByEmbeddingSimilarity(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") % 20 === 0).select(col("embedding")),
        "embedding", tau = 0.9)
    }),

    // domain-suffix BLOCKLIST verdicts: per-row codegen'd dot-boundary
    // suffix matching against a literal blocklist — subdomains of a
    // blocked domain are blocked, lookalike substrings are not
    // (notexample.com survives example.com). Injection gives every
    // residue class a URL so all four verdict shapes appear at any SF.
    "t31_domain_blocklist" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" https://a.b.example.com/x")) // subdomain -> blocked
          .when(col("doc_id") % 4 === 1, lit(" http://notexample.com/y")) // lookalike -> kept
          // sentence-final period joins the regex's host class — the edge
          // strip must still block (and case-fold)
          .when(col("doc_id") % 4 === 2, lit(" go to https://BAD.org."))
          .otherwise(lit(" no urls here"))).as("text"))
      injected.select(col("doc_id"),
        TextAnalysis.blockedByDomain(col("text"), Seq("example.com", "bad.org"))
          .as("blocked"))
    }),

    // cross-table FUZZY JOIN (record linkage): corpus docs vs a perturbed
    // reference set — band rows of the two sides meet in a keyed
    // (band, bh) equi-join, never a self-join or cross product; exact
    // Jaccard verify against both shingle sets. The oracle replays
    // signatures, per-side bucket caps, the cross-band join, and the
    // verify relationally.
    "d10_fuzzy_join" -> ((s, dir) => {
      val left = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val right = tbl(s, dir, "documents").filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("ref_id"),
          concat(col("text"), lit(" reference copy")).as("text"))
      Dedup.minHashJoin(left, right, "doc_id", "text", "ref_id", "text",
        n = 3, k = 16, rowsPerBand = 4, threshold = 0.5, maxBucketSize = 100)
    }),

    // bigram-coherence quality score (LM-free fluency proxy): ppm of
    // each doc's distinct adjacent bigrams occurring in >= 2 docs. A
    // unique gibberish tail injected into every 2nd doc guarantees rare
    // bigrams at every scale factor; the natural small-vocab corpus
    // supplies the common ones
    "t27_bigram_coherence" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" zqx"), col("doc_id"), lit(" wqj"), col("doc_id")))
          .otherwise(lit(""))).as("text"))
      Quality.bigramCoherence(injected, "doc_id", "text", minDocs = 2)
        .withColumnRenamed("id", "doc_id")
    }),

    // Luhn-validated card detection: valid and checksum-failing test PANs
    // (plain and space-grouped) injected arithmetically; the checksum is
    // a per-row HOF fold replayed digit-for-digit by the oracle
    "t30_cards" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" card 4111111111111111"))
          .when(col("doc_id") % 4 === 1, lit(" card 4111111111111112"))
          .when(col("doc_id") % 4 === 2, lit(" card 4012 8888 8888 1881"))
          .otherwise(lit(""))).as("text"))
      TextAnalysis.cardStats(injected, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // corpus-level COLLOCATION mining: adjacent-bigram lift in exact
    // integer ppm (the PMI test without the float log). An injected
    // always-adjacent pair guarantees a high-lift collocation at every
    // SF; the oracle replays counts, totals, and the DECIMAL/HUGEINT
    // floor division.
    // character-diversity (Rényi-2 collision) quality signal in exact
    // integer ppm — the entropy-family filter without cross-engine logs;
    // low-diversity positives injected as repeated-char padding
    "t34_char_diversity" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 7 === 0,
            repeat(lit("a"), ((col("doc_id") % 30) * 20).cast("int")))
            .otherwise(lit(""))).as("text"))
        .filter(length(col("text")) > 0)
      TextAnalysis.charDiversity(injected, "doc_id", "text", prefixLen = 512)
    }),

    // weighted deterministic Bernoulli sample (heavier docs likelier),
    // integer-exact inclusion test — no float division on either engine
    "p10_weighted_sample" -> ((s, dir) =>
      graft.ops.Sampling.weightedSample(
        tbl(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", expected = 200)
        .select(col("doc_id"), col("n_chars").as("weight"))),

    "t33_collocations" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit(" zqalpha zqbeta")).otherwise(lit("")))
        .as("text"))
      Quality.collocations(injected, "text", minCount = 5L)
    }),

    // IBAN detection with the ISO 7064 mod-97 checksum: a valid spaced
    // DE IBAN, the same IBAN with one flipped digit (candidate but
    // invalid), and a valid contiguous GB IBAN — the checksum, not the
    // regex, separates them. The oracle replays the rotation and the
    // char-by-char mod-97 fold with DuckDB list_reduce.
    "t32_iban" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" pay DE89 3704 0044 0532 0130 00 thanks"))
          .when(col("doc_id") % 4 === 1, lit(" pay DE89 3704 0044 0532 0130 01 thanks"))
          .when(col("doc_id") % 4 === 2, lit(" acct GB82WEST12345698765432 ok"))
          .otherwise(lit(""))).as("text"))
      TextAnalysis.ibanStats(injected, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Unicode script histogram + dominant script: non-Latin runs injected
    // arithmetically (repeat counts from doc_id) so every script class and
    // dominance flips exercise at every scale factor; pure per-row
    // codegen'd regexp counts, zero exchanges
    "t29_script" -> ((s, dir) => {
      val injected = tbl(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 5 === 0,
          repeat(lit("中"), ((col("doc_id") % 40) * 30).cast("int")))
          .when(col("doc_id") % 5 === 1,
            repeat(lit("ж"), ((col("doc_id") % 60) * 20).cast("int")))
          .when(col("doc_id") % 5 === 2,
            repeat(lit("ش"), ((col("doc_id") % 50) * 25).cast("int")))
          .otherwise(lit(""))).as("text"))
      TextAnalysis.scriptProfile(injected, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // CCNet-shaped LM quality scoring: Laplace bigram model trained on
    // the doc_id % 3 != 0 two-thirds, held-out third scored by mean
    // smoothed bigram probability in exact integer micros
    "t28_lm_score" -> ((s, dir) =>
      Quality.bigramLmScore(tbl(s, dir, "documents"), "doc_id", "text",
          col("doc_id") % 3 =!= 0)
        .withColumnRenamed("id", "doc_id")),

    // BM25 top-k retrieval directly over the corpus: integer-exact
    // rational-idf scoring (TextIndex scaladoc derivation), only
    // query-term occurrences ever shuffle, global top-k via
    // TakeOrderedAndProject
    "b1_bm25" -> ((s, dir) =>
      graft.ops.TextIndex.bm25TopK(tbl(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge", "customer"), k = 15)
        .withColumnRenamed("id", "doc_id")),

    // the PERSISTED inverted index end to end: build on two-thirds of the
    // corpus, append the rest (upsert keyed (term, doc_id)), then serve
    // BM25 from postings + doc-length tables alone — document text is
    // never read at query time. The oracle reconstructs the merged index
    // relationally (disjoint ids, so upsert == union) and replays the
    // same integer scoring
    "b2_text_index" -> ((s, dir) => {
      import graft.meta.LocalCatalog
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-ti-wh").toString)
      val d = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.ops.TextIndex.build(s, catalog, "tiq",
        d.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
      graft.ops.TextIndex.append(s, catalog, "tiq",
        d.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      graft.ops.TextIndex.searchBm25(s, catalog, "tiq",
        Seq("stream", "join", "batch"), k = 12)
        .withColumnRenamed("id", "doc_id")
    }),

    // exact phrase search from the POSITIONAL index: injected phrase
    // markers (3 occurrences in every 20th doc, 1 in every other 10th)
    // guarantee a deterministic n_matches ranking at every scale factor;
    // the oracle rebuilds per-term position lists and replays the
    // consecutive-position chain count
    "b3_phrase_search" -> ((s, dir) => {
      import graft.meta.LocalCatalog
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-b3-wh").toString)
      val d = tbl(s, dir, "documents").select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 20 === 0,
          lit(" zqphrase yqmarker zqphrase yqmarker zqphrase yqmarker"))
          .when(col("doc_id") % 10 === 0, lit(" zqphrase yqmarker"))
          .otherwise(lit(""))).as("text"))
      graft.ops.TextIndex.build(s, catalog, "b3q", d, "doc_id", "text")
      graft.ops.TextIndex.searchPhrase(s, catalog, "b3q",
        Seq("zqphrase", "yqmarker"), k = 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // quality-biased dedup keeper selection: near-dup pairs on the d6
    // slice -> star-rounds connected components (the web-scale CC gets
    // its own oracle here) -> keep the longest member per cluster (ties
    // -> lowest id), unclustered docs survive untouched
    "d8_keep_best" -> ((s, dir) => {
      val sliced = corpus(s, dir).filter(col("doc_id") % 100000 < 500)
        .withColumn("n_toks", TextAnalysis.tokenCount(col("text")).cast("long"))
      val pairs = Dedup.ngramJaccardPairsBroadcast(sliced, "doc_id", "text",
        n = 4, threshold = 0.6)
      Dedup.keepBestPerCluster(sliced, "doc_id", "n_toks",
          Dedup.clusterPairsStar(pairs))
        .select(col("doc_id"), col("n_toks"))
    }),

    // BPE tokenizer training's first round: weighted adjacent-codepoint
    // pair counts over the word-frequency table (vocabulary-bounded, not
    // corpus-bounded), top-20 by count
    "t26_bpe_pairs" -> ((s, dir) =>
      graft.ops.Bpe.pairCounts(
          graft.ops.Bpe.vocabulary(tbl(s, dir, "documents"), "text"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(20)),

    // bloom-filter join pruning: the filter (distinct md5 bit positions of
    // the BUILDING customers) gates the orders scan before the exact semi
    // join; n_candidates oracle-checks the bloom itself (the exact same
    // bits pass in DuckDB), n_matched/sum_cents check the final join
    "r3_bloom_join" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val bits = graft.ops.Sketch.bloomBits(cust, "c_custkey", k = 3, bitHexChars = 3)
      val cand = graft.ops.Sketch.bloomPrune(
        tbl(s, dir, "orders"), "o_custkey", bits, k = 3)
      val matched = cand.join(cust, cand("o_custkey") === cust("c_custkey"), "left_semi")
      cand.agg(count(lit(1)).as("n_candidates")).crossJoin(
        matched.agg(count(lit(1)).as("n_matched"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("sum_cents")))
    }),

    // interval-overlap form of the range join: supplier bands vs customer
    // bands, each overlapping pair emitted exactly once (the
    // overlap-start-bucket trick), aggregated per supplier
    "r2_interval_overlap" -> ((s, dir) => {
      val sup = tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal").as("slo"),
          (col("s_acctbal") + 800.0).as("shi"))
      val cust = tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal").as("clo"),
          (col("c_acctbal") + 500.0).as("chi"))
      val joined = graft.ops.RangeJoin.intervalOverlap(
        sup, "slo", "shi", cust, "clo", "chi", bucketWidth = 500.0)
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_overlap"))
      tbl(s, dir, "supplier").select(col("s_suppkey"))
        .join(joined, Seq("s_suppkey"), "left")
        .select(col("s_suppkey"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
    }),

    // bucketized range join (point-in-interval as an EQUI-join on bucket
    // ids — not Catalyst's nested-loop fallback): customers counted into
    // supplier account-balance bands; zero-match intervals kept via the
    // left join in the aggregate
    "r1_range_join" -> ((s, dir) => {
      val sup = tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal").as("lo"),
          (col("s_acctbal") + 1000.0).as("hi"))
      val cust = tbl(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val joined = graft.ops.RangeJoin.pointInInterval(
        cust, "c_acctbal", sup, "lo", "hi", bucketWidth = 500.0)
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_cust"))
      sup.select(col("s_suppkey")).join(joined, Seq("s_suppkey"), "left")
        .select(col("s_suppkey"), coalesce(col("n_cust"), lit(0L)).as("n_cust"))
    }),

    // span EXCISION under the same duplicated-window rule and injections
    // as t16 (shared dupInjected corpus): covered tokens are cut and the
    // surviving text hash-checked — so the position bookkeeping (not just
    // the counts) is oracle-verified
    "t17_substring_excise" -> ((s, dir) =>
      Dedup.exciseDuplicatedNgrams(dupInjected(s, dir), "doc_id", "text",
        n = 8, minCount = 2)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))),

    // GPT-style concat-and-chunk sequence packing: every doc's chunk span
    // in the concatenated 256-token-chunk stream, via the two-phase
    // (bucketed) prefix sum — no single-partition window over data rows
    "p3_pack_chunks" -> ((s, dir) =>
      graft.ops.Packing.packChunks(
        tbl(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks")),
        "doc_id", "n_toks", chunkTokens = 256, bucketSize = 64)
        .withColumnRenamed("id", "doc_id")),

    // MOR write semantics as an oracle-checked query: create a real table
    // from `supplier`, atomically UPSERT modified + inserted rows, then
    // DELETE WHERE — the DuckDB oracle reconstructs the same final state
    // relationally, so equality-delete sequencing, the single-snapshot
    // upsert, and position-tombstone deletes are all hash-checked
    "q_upsert_mor" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-upsert-wh").toString)
      val src = tbl(s, dir, "supplier")
      IceWrite.create(s, catalog, "t_q_upsert", src)
      val changed = src.filter(col("s_suppkey") % 3 === 0)
        .withColumn("s_name", upper(col("s_name")))
        .withColumn("s_nationkey", (col("s_nationkey") + 100).cast("int"))
      val inserted = src.filter(col("s_suppkey") % 10 === 0)
        .withColumn("s_suppkey", col("s_suppkey") + 1000000)
      IceWrite.upsert(s, catalog, "t_q_upsert",
        changed.unionAll(inserted), keys = Seq("s_suppkey"))
      IceWrite.deleteWhere(s, catalog, "t_q_upsert", col("s_suppkey") % 7 === 0)
      IceRead.table(s, catalog, "t_q_upsert")
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("s_nationkey"))
    }),

    // SQL FRONT DOOR as an oracle-checked query: a real table is created
    // from `customer` and registered under a SQL catalog name, a slice
    // is appended back through `INSERT INTO ... SELECT` READING THE SAME
    // front-door relation (snapshot isolation: the source resolves the
    // pre-insert snapshot), and the final statement aggregates the table
    // while a scalar subquery time-travels to the create snapshot — SQL
    // resolution, write path, and `snapshot_id_` suffix all hash-checked
    "q_sql_frontdoor" -> ((s, dir) => {
      import graft.meta.{GraftSql, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-sql-wh").toString)
      GraftSql.register("qsql", catalog)
      IceWrite.create(s, catalog, "t_q_sql", tbl(s, dir, "customer"))
      s.sql("""INSERT INTO qsql.t_q_sql
              |SELECT c_custkey + 1000000, upper(c_name), c_nationkey,
              |       c_acctbal, c_mktsegment
              |FROM qsql.t_q_sql WHERE c_custkey % 10 = 0""".stripMargin)
      s.sql("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
              |       CAST(sum(c_nationkey) AS BIGINT) AS sum_nk,
              |       (SELECT CAST(count(*) AS BIGINT)
              |        FROM qsql.t_q_sql.snapshot_id_1) AS base_rows
              |FROM qsql.t_q_sql GROUP BY c_mktsegment""".stripMargin)
    }),

    // SQL DML as an oracle-checked query: the whole lifecycle — CTAS,
    // UPDATE (one-snapshot tombstones+copies), DELETE (MOR tombstones),
    // MERGE (one-snapshot equality-delete upsert with insert-of-unmatched,
    // including keys the DELETE removed, which MERGE must re-insert via
    // its NOT MATCHED branch) — runs through spark.sql against the front
    // door, and DuckDB reconstructs the final state relationally
    "q_sql_dml" -> ((s, dir) => {
      import graft.meta.{GraftSql, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-sqldml-wh").toString)
      GraftSql.register("qsqld", catalog)
      tbl(s, dir, "supplier").createOrReplaceTempView("q_sqldml_supplier")
      s.sql("""CREATE TABLE qsqld.t AS
              |SELECT s_suppkey, s_name, s_nationkey FROM q_sqldml_supplier""".stripMargin)
      s.sql("UPDATE qsqld.t SET s_name = upper(s_name) WHERE s_suppkey % 3 = 0")
      s.sql("DELETE FROM qsqld.t WHERE s_suppkey % 7 = 0")
      s.sql("""SELECT s_suppkey, s_name, s_nationkey FROM q_sqldml_supplier
              |WHERE s_suppkey % 5 = 0
              |UNION ALL
              |SELECT s_suppkey + 1000000, s_name, s_nationkey FROM q_sqldml_supplier
              |WHERE s_suppkey % 10 = 0""".stripMargin)
        .createOrReplaceTempView("q_sqldml_src")
      s.sql("""MERGE INTO qsqld.t AS t USING q_sqldml_src AS s
              |ON t.s_suppkey = s.s_suppkey
              |WHEN MATCHED THEN UPDATE SET s_nationkey = s.s_nationkey + 100
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
              |FROM qsqld.t""".stripMargin)
    }),

    // SQL SCHEMA EVOLUTION as an oracle-checked query: CTAS, ADD COLUMNS
    // with a DEFAULT (v3-style initial-default: PRE-EXISTING rows read it
    // per-file without rewrite), ALTER COLUMN TYPE widening, then an
    // INSERT exceeding the old type's range — DuckDB reconstructs the
    // final state relationally, so the default plumbing and the widened
    // reads are hash-checked
    "q_sql_evolution" -> ((s, dir) => {
      import graft.meta.{GraftSql, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-sqlev-wh").toString)
      GraftSql.register("qsqle", catalog)
      tbl(s, dir, "supplier").createOrReplaceTempView("q_sqlev_supplier")
      s.sql("""CREATE TABLE qsqle.t AS
              |SELECT s_suppkey, s_name, CAST(s_nationkey AS INT) AS nk
              |FROM q_sqlev_supplier""".stripMargin)
      s.sql("ALTER TABLE qsqle.t ADD COLUMNS " +
        "(category STRING DEFAULT 'unknown', score DOUBLE)")
      s.sql("ALTER TABLE qsqle.t ALTER COLUMN nk TYPE BIGINT")
      s.sql("""INSERT INTO qsqle.t
              |SELECT s_suppkey + 1000000, s_name, CAST(3000000000 + s_nationkey AS BIGINT),
              |       'new', CAST(s_nationkey AS DOUBLE)
              |FROM q_sqlev_supplier WHERE s_suppkey % 4 = 0""".stripMargin)
      s.sql("SELECT s_suppkey, s_name, nk, category, score FROM qsqle.t")
    }),

    // SQL PARTITION-SPEC EVOLUTION as an oracle-checked query: the
    // bucket-outgrowth migration every bucketed table eventually runs —
    // bucket[2] -> bucket[4] via ALTER TABLE ... REPLACE PARTITION FIELD
    // (extension grammar), more data under the new spec, then the healing
    // compaction. In-query requires prove the old spec was RECORDED as
    // history (multi-spec export fidelity), the heal cleared every
    // marker, and the healed files span all 4 buckets; the oracle proves
    // the rows rode through untouched (evolution is content-invariant).
    "q_sql_spec_evolve" -> ((s, dir) => {
      import graft.meta.{GraftSql, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-specev-wh").toString)
      GraftSql.register("qspev", catalog)
      tbl(s, dir, "supplier").createOrReplaceTempView("q_spev_supplier")
      s.sql("""CREATE TABLE qspev.t (s_suppkey BIGINT, s_name STRING)
              |PARTITIONED BY (bucket(2, s_suppkey))""".stripMargin)
      s.sql("""INSERT INTO qspev.t
              |SELECT s_suppkey, s_name FROM q_spev_supplier
              |WHERE s_suppkey % 2 = 0""".stripMargin)
      s.sql("ALTER TABLE qspev.t REPLACE PARTITION FIELD " +
        "bucket(2, s_suppkey) WITH bucket(4, s_suppkey)")
      val evolved = catalog.loadTable("t")
      require(evolved.partitionSpec == Seq(PartitionField("s_suppkey", "bucket[4]")),
        s"spec not evolved: ${evolved.partitionSpec}")
      require(evolved.historicalSpecs.values.toSeq
        .contains(Seq(PartitionField("s_suppkey", "bucket[2]"))),
        "superseded spec definition not recorded")
      s.sql("""INSERT INTO qspev.t
              |SELECT s_suppkey, s_name FROM q_spev_supplier
              |WHERE s_suppkey % 2 = 1""".stripMargin)
      s.sql("CALL qspev.system.rewrite_data_files('t')")
      val healed = catalog.loadTable("t").currentSnapshot.get.manifest
        .filter(_.content == graft.meta.FileContent.Data)
      require(healed.forall(_.specId == 0), "heal left marker-bearing files")
      require(healed.flatMap(_.partitionValues.get("s_suppkey")).toSet
        == Set("0", "1", "2", "3"),
        s"healed files do not span bucket[4]: ${healed.flatMap(_.partitionValues.get("s_suppkey"))}")
      s.sql("SELECT s_suppkey, s_name FROM qspev.t")
    }),

    // v3 ROW LINEAGE as an oracle-checked query: a single sorted data
    // file makes the inherited id assignment deterministic (row N of the
    // file = rank N in s_suppkey order), deleteWhere tombstones a seventh
    // of the rows, and compaction REWRITES the survivors — the in-query
    // require proves the post-compaction ids equal the pre-compaction
    // ids row for row (materialized `_row_id`). The oracle replays the
    // id as rank-1 over the full table, filtered.
    "q_row_lineage" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-lineage-wh").toString)
      val src = tbl(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
        .repartition(1).sortWithinPartitions("s_suppkey")
      IceWrite.create(s, catalog, "t_q_lin", src, formatVersion = 3)
      IceWrite.deleteWhere(s, catalog, "t_q_lin", col("s_suppkey") % 7 === 0)
      val before = IceRead.tableWithRowIds(s, catalog, "t_q_lin")
        .select(col("s_suppkey"), col("_row_id")).collect().toSet
      new graft.compaction.Compaction(catalog, "t_q_lin", s).compact()
      val afterDf = IceRead.tableWithRowIds(s, catalog, "t_q_lin")
        .select(col("s_suppkey"), col("_row_id").as("row_id"),
          col("_last_updated_seq").as("last_seq"))
      require(afterDf.select(col("s_suppkey"), col("row_id")).collect().toSet
        .map((r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))) ==
        before.map((r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))),
        "compaction re-identified rows")
      afterDf
    }),

    // CDC table MIRRORING as an oracle-checked query: source gets a
    // create + upsert + delete, then TableSync.mirror replays the
    // changelog into a SECOND catalog; the result reads the MIRROR, and
    // the in-query require pins that every source snapshot was applied.
    // The oracle reconstructs the source's final state relationally —
    // which the mirror must equal.
    "q_sync_mirror" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, TableSync}
      val src = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-sync-src").toString)
      val dst = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-sync-dst").toString)
      val base = tbl(s, dir, "supplier").select(
        col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("long").as("s_nationkey"))
      IceWrite.create(s, src, "t_q_sync", base)
      IceWrite.upsert(s, src, "t_q_sync",
        base.filter(col("s_suppkey") % 3 === 0)
          .withColumn("s_name", upper(col("s_name"))), keys = Seq("s_suppkey"))
      IceWrite.deleteWhere(s, src, "t_q_sync", col("s_suppkey") % 7 === 0)
      val ck = java.nio.file.Files.createTempDirectory("q-sync-ck").resolve("ck")
      val applied = TableSync.mirror(s, src, "t_q_sync", dst, "t_q_sync_m",
        Seq("s_suppkey"), ck.toString)
      require(applied == 3, s"mirror applied $applied snapshots, expected 3")
      IceRead.table(s, dst, "t_q_sync_m")
    }),

    // PARTITION-LEVEL ops as one oracle-checked query: create a table
    // partitioned by l_returnflag, DROP partition R metadata-only (the
    // in-query requires prove no manifest entry survives and the
    // untouched partitions keep their exact file paths — nothing was
    // rewritten), then dynamically OVERWRITE partition A with shifted
    // quantities. The oracle replays both ops relationally: N untouched,
    // A shifted, R gone.
    "q_partition_ops" -> ((s, dir) => {
      import graft.meta.{FileContent, IceRead, IceWrite, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-part-wh").toString)
      val src = tbl(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("l_orderkey"),
        col("l_linenumber").cast("int").as("l_linenumber"),
        col("l_returnflag").cast("string").as("l_returnflag"),
        col("l_quantity").cast("double").as("l_quantity"))
      IceWrite.create(s, catalog, "t_q_part", src,
        partitionSpec = Seq(PartitionField("l_returnflag")))
      IceWrite.dropPartitions(catalog, "t_q_part", Map("l_returnflag" -> "R"))
      val afterDrop = catalog.loadTable("t_q_part").currentSnapshot.get.manifest
      require(!afterDrop.exists(_.partitionValues.get("l_returnflag").contains("R")),
        "dropPartitions left an R entry in the manifest")
      val keptPaths = afterDrop.filter(_.content == FileContent.Data).map(_.path).toSet
      IceWrite.overwritePartitions(s, catalog, "t_q_part",
        src.filter(col("l_returnflag") === "A")
          .withColumn("l_quantity", col("l_quantity") + 5))
      val after = catalog.loadTable("t_q_part").currentSnapshot.get.manifest
        .filter(_.content == FileContent.Data)
      val untouched = after.filterNot(
        _.partitionValues.get("l_returnflag").contains("A")).map(_.path).toSet
      require(untouched.subsetOf(keptPaths),
        "overwritePartitions rewrote files outside the A partition")
      IceRead.table(s, catalog, "t_q_part").select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        (col("l_quantity") * 100).cast("long").as("qty_c100"))
    }),

    // add_files MIGRATION as an oracle-checked query: two lineitem slices
    // land on disk as PLAIN parquet (no field ids) — one registered via
    // importParquetTable, the other via addFiles into the now-existing
    // table. The in-query requires prove ZERO rewrite happened (the
    // registered manifest paths ARE the foreign files, marked
    // name-matched) and that the record counts came from footers alone
    // (manifest-only fastCount). A deleteWhere then proves tombstones
    // land inside imported files; the oracle replays both slices and the
    // delete relationally.
    "q_add_files" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-addf-wh").toString)
      val src = tbl(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("l_orderkey"),
        col("l_partkey").cast("long").as("l_partkey"),
        col("l_linenumber").cast("int").as("l_linenumber"))
      val ext = java.nio.file.Files.createTempDirectory("q-addf-src")
      src.filter(col("l_orderkey") % 4 === 0)
        .repartition(2).write.parquet(s"$ext/a")
      src.filter(col("l_orderkey") % 4 === 1)
        .repartition(2).write.parquet(s"$ext/b")
      def parquets(d: String): Seq[String] =
        scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(d))) { w =>
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet")).map(_.toString).toSeq.sorted
        }
      IceWrite.importParquetTable(s, catalog, "t_q_addf", s"$ext/a")
      IceWrite.addFiles(s, catalog, "t_q_addf", parquets(s"$ext/b"))
      val entries = catalog.loadTable("t_q_addf").currentSnapshot.get.manifest
      require(entries.map(_.path).sorted == (parquets(s"$ext/a") ++ parquets(s"$ext/b")).sorted,
        "add_files rewrote data: registered paths differ from the foreign files")
      require(entries.forall(_.nameMatched), "imported entries must be name-matched")
      val fast = IceRead.fastCount(catalog, "t_q_addf")
      require(fast.contains(src.filter(col("l_orderkey") % 4 <= 1).count()),
        s"manifest-only count $fast disagrees with the imported slices")
      IceWrite.deleteWhere(s, catalog, "t_q_addf", col("l_linenumber") === 3)
      IceRead.table(s, catalog, "t_q_addf")
    }),

    // equality->position delete CONVERSION as an oracle-checked query:
    // an upsert leaves eq-delete files; convertEqualityDeletes
    // materializes their kill set as position tombstones (the in-query
    // require proves no eq file survives), and the MOR read must be
    // unchanged — reconstructed relationally by the oracle
    // persisted per-file BLOOM-FILTER index as an oracle-checked query:
    // 4 range-disjoint files, index on c_custkey, point lookup — the
    // in-query requires prove real file skipping happened (a strict
    // subset of files survives the probe) while the result matches the
    // plain filter; the tombstone shows the pruned MOR read still
    // applies deletes
    "q_bloom_point" -> ((s, dir) => {
      import graft.meta.{BloomIndex, IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-bloom-wh").toString)
      val src = tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      IceWrite.create(s, catalog, "t_q_bloom",
        src.repartitionByRange(4, col("c_custkey")))
      BloomIndex.build(s, catalog, "t_q_bloom", "c_custkey")
      IceWrite.deleteWhere(s, catalog, "t_q_bloom", col("c_custkey") === 138L)
      val meta = catalog.loadTable("t_q_bloom")
      val snap = meta.currentSnapshot.get
      val all = snap.manifest.count(_.content == graft.meta.FileContent.Data)
      val kept = BloomIndex.mayContainFiles(meta, snap, "c_custkey", "137").get.size
      require(kept < all, s"bloom probe pruned nothing: $kept of $all files kept")
      BloomIndex.tablePoint(s, catalog, "t_q_bloom", "c_custkey", "137")
        .unionAll(BloomIndex.tablePoint(s, catalog, "t_q_bloom", "c_custkey", "138"))
    }),

    "q_convert_eq" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-conv-wh").toString)
      val src = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      IceWrite.create(s, catalog, "t_q_conv", src.repartition(3))
      IceWrite.upsert(s, catalog, "t_q_conv",
        src.filter(col("s_suppkey") % 3 === 0)
          .withColumn("s_name", upper(col("s_name"))),
        keys = Seq("s_suppkey"))
      graft.compaction.Maintenance.convertEqualityDeletes(s, catalog, "t_q_conv")
      val eqLeft = catalog.loadTable("t_q_conv").currentSnapshot.get.manifest
        .count(_.content == graft.meta.FileContent.EqualityDeletes)
      require(eqLeft == 0, s"conversion left $eqLeft equality-delete files")
      IceRead.table(s, catalog, "t_q_conv").select(col("s_suppkey"), col("s_name"))
    }),

    // Iceberg v3 DELETION VECTORS as an oracle-checked query: tombstone a
    // quarter of the rows (parquet pos deletes), convert them to Puffin
    // bitmap DVs, then tombstone more rows AFTER conversion — the read
    // must apply the codegen'd DV probe AND the fresh parquet tombstones
    // together; the in-query requires prove the conversion really swapped
    // the file formats (no plain pos file left, >=1 DV present)
    "q_dv" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-dv-wh").toString)
      val src = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      IceWrite.create(s, catalog, "t_q_dv", src.repartition(3))
      IceWrite.deleteWhere(s, catalog, "t_q_dv", col("s_suppkey") % 4 === 0)
      graft.compaction.Maintenance.convertPositionDeletesToDVs(s, catalog, "t_q_dv")
      val manifest = catalog.loadTable("t_q_dv").currentSnapshot.get.manifest
      require(!manifest.exists(f =>
        f.content == graft.meta.FileContent.PositionDeletes && !f.isDeletionVector),
        "conversion left parquet position-delete files")
      require(manifest.exists(_.isDeletionVector), "conversion produced no DVs")
      IceWrite.deleteWhere(s, catalog, "t_q_dv", col("s_suppkey") % 4 === 1)
      IceRead.table(s, catalog, "t_q_dv").select(col("s_suppkey"), col("s_name"))
    }),

    // MANIFEST-LEVEL FILE SKIPPING as an oracle-checked query: lineitem
    // lands in a graft table partitioned by l_returnflag (identity) in
    // three disjoint l_orderkey ranges (3 commits x 3 partitions -> a
    // file grid with tight zone maps); the read filters to one flag and
    // the low range, so the GraftFileIndex must drop >=2/3 of the files
    // at PLAN time — partition constants kill the other flags, zone maps
    // kill the other ranges. The in-query require turns the skipping
    // itself into a checked invariant; the oracle checks the surviving
    // rows against the same filter over raw lineitem. At 100 TB this is
    // the difference between opening 10^6 footers and opening only the
    // overlapping ones.
    "q_prune_scan" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-prune-wh").toString)
      val src = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      val cut = src.agg(max(col("l_orderkey"))).head.getLong(0) / 3
      IceWrite.create(s, catalog, "t_q_prune",
        src.filter(col("l_orderkey") <= cut),
        partitionSpec = Seq(PartitionField("l_returnflag")))
      IceWrite.append(s, catalog, "t_q_prune",
        src.filter(col("l_orderkey") > cut && col("l_orderkey") <= cut * 2))
      IceWrite.append(s, catalog, "t_q_prune",
        src.filter(col("l_orderkey") > cut * 2))
      val q = IceRead.table(s, catalog, "t_q_prune")
        .filter(col("l_returnflag") === "A" && col("l_orderkey") <= cut)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
      q.collect()
      val (totalFiles, keptFiles) = graft.exec.GraftScan.pruneStats(q)
      require(totalFiles >= 9 && keptFiles * 3 <= totalFiles,
        s"file skipping did not engage: kept $keptFiles of $totalFiles files")
      q
    }),

    // TRUNCATE-TRANSFORM FILE SKIPPING as an oracle-checked query: part
    // lands in a graft table partitioned by truncate[3] on p_name (the
    // URL/prefix-key layout of corpus curation — 8 distinct prefixes in
    // this corpus), and the read filters to one prefix. Truncate values
    // are order-preserving literals, so the prefix predicate must drop
    // the other prefixes' files at PLAN time (the prefix-interval
    // machinery — the same [p, increment(p)) logic as StartsWith on zone
    // maps, applied to the stored partition value). The in-query require
    // proves >=3/4 of files skipped; the oracle replays the filter over
    // raw part.
    "q_truncate_prune" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-trunc-wh").toString)
      val src = tbl(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
      IceWrite.create(s, catalog, "t_q_trunc", src,
        partitionSpec = Seq(PartitionField("p_name", "truncate[3]")))
      val q = IceRead.table(s, catalog, "t_q_trunc")
        .filter(col("p_name").startsWith("red"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("p_size").cast("long")).as("sum_size"))
      q.collect()
      val (totalFiles, keptFiles) = graft.exec.GraftScan.pruneStats(q)
      require(totalFiles >= 8 && keptFiles * 4 <= totalFiles,
        s"truncate pruning did not engage: kept $keptFiles of $totalFiles files")
      q
    }),

    // METADATA-ONLY COUNT as an oracle-checked query: count(*) over a
    // deleteless graft table must answer from manifest record counts —
    // the in-query require proves NO scan ran (no FileSourceScanExec in
    // the executed plan); the oracle recounts supplier relationally. At
    // 10^6 files the scan alternative opens a million footers to add up
    // numbers the manifest already holds.
    "q_meta_count" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-mcount-wh").toString)
      val src = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      IceWrite.create(s, catalog, "t_q_mcount", src.filter(col("s_suppkey") % 2 === 0))
      IceWrite.append(s, catalog, "t_q_mcount", src.filter(col("s_suppkey") % 2 =!= 0))
      val q = IceRead.table(s, catalog, "t_q_mcount")
        .agg(count(lit(1)).as("n_rows"))
      q.collect()
      // collect-ALL traversal incl. subqueries: a collectFirst would stop
      // at the first stage wrapper and could pass vacuously with a scan
      // hiding in a sibling stage
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        (p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(qs.plan)
          case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        } ++ p.subqueries.map(scans)).contains(true)
      require(!scans(q.queryExecution.executedPlan),
        "metadata-only count ran a scan:\n" + q.queryExecution.executedPlan)
      q
    }),

    // PARTITION-GROUPED METADATA AGGREGATES as an oracle-checked query:
    // "rows per partition" — THE operational query on any partitioned
    // table — folds count/min/max per identity-partition tuple straight
    // from the manifest. The in-query require proves NO scan ran; the
    // oracle replays the grouping relationally. At 10^6 files this
    // answers from metadata the cluster already holds instead of
    // launching a million-task job.
    "q_meta_group" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-mgroup-wh").toString)
      val src = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      IceWrite.create(s, catalog, "t_q_mgroup", src.filter(col("s_suppkey") % 2 === 0),
        partitionSpec = Seq(PartitionField("s_nationkey")))
      IceWrite.append(s, catalog, "t_q_mgroup", src.filter(col("s_suppkey") % 2 =!= 0))
      val q = IceRead.table(s, catalog, "t_q_mgroup")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("s_suppkey")).as("mn_key"),
          max(col("s_suppkey")).as("mx_key"))
      q.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        (p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(qs.plan)
          case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        } ++ p.subqueries.map(scans)).contains(true)
      require(!scans(q.queryExecution.executedPlan),
        "grouped metadata aggregate ran a scan:\n" + q.queryExecution.executedPlan)
      q
    }),

    // DYNAMIC PARTITION PRUNING as an oracle-checked query: customer
    // lands in a graft table identity-partitioned by c_nationkey (the
    // file index serves it as a real Spark partition column), nation is
    // the filtered dim of a star join keyed on it. Spark must insert a
    // DPP subquery (runtime file pruning through the reused broadcast)
    // and the scan must touch only the surviving nations' files — both
    // proven by in-query requires; the oracle replays the join
    // relationally. This is THE fact-dim shape at 100 TB: the dim filter
    // decides which fact partitions exist in the plan at runtime.
    "q_dpp_star" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-dpp-wh").toString)
      val cust = tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      IceWrite.create(s, catalog, "t_q_dpp", cust,
        partitionSpec = Seq(PartitionField("c_nationkey")))
      val dim = tbl(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
        .select(col("n_nationkey"), col("n_name"))
      val q = IceRead.table(s, catalog, "t_q_dpp")
        .join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        "no dynamic-partition-pruning subquery in the star-join plan:\n" + plan)
      def scanInfo(p: org.apache.spark.sql.execution.SparkPlan): Seq[(Long, Int)] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scanInfo(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => scanInfo(qs.plan)
          case sc: org.apache.spark.sql.execution.FileSourceScanExec
              if sc.relation.location.isInstanceOf[graft.exec.GraftFileIndex] =>
            Seq((sc.metrics.get("numFiles").map(_.value).getOrElse(0L),
              sc.relation.location.asInstanceOf[graft.exec.GraftFileIndex].lastPrune._1))
        }.flatten ++ p.subqueries.flatMap(scanInfo)
      val (scanned, total) = scanInfo(q.queryExecution.executedPlan)
        .foldLeft((0L, 0)) { case ((s0, t0), (s1, t1)) => (s0 + s1, t0 + t1) }
      require(total >= 10 && scanned * 2 <= total,
        s"DPP did not reduce scanned files ($scanned of $total)")
      q
    }),

    // COPY-ON-WRITE row-level semantics as an oracle-checked query:
    // create from supplier, MOR-tombstone every 7th key, COW-UPDATE
    // every 3rd (affected files rewritten THROUGH the MOR view —
    // tombstoned rows must not resurrect, field ids must survive the
    // projection), then COW-PURGE every 5th (physical erasure); the
    // oracle reconstructs the final state relationally
    "q_cow_update" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      import graft.compaction.RowRewrite
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-cow-wh").toString)
      val src = tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      IceWrite.create(s, catalog, "t_q_cow", src.repartition(4))
      IceWrite.deleteWhere(s, catalog, "t_q_cow", col("s_suppkey") % 7 === 0)
      RowRewrite.updateWhere(s, catalog, "t_q_cow",
        col("s_suppkey") % 3 === 0,
        Map("s_name" -> upper(col("s_name")),
          "s_acctbal" -> (col("s_acctbal") + 1000.0)))
      RowRewrite.purgeWhere(s, catalog, "t_q_cow", col("s_suppkey") % 5 === 0)
      IceRead.table(s, catalog, "t_q_cow")
        .select(col("s_suppkey"), col("s_name"),
          round(col("s_acctbal") * 100, 0).cast("long").as("acctbal_cents"))
    }),

    // incremental changelog read as an oracle-checked query: build a real
    // table through create -> append -> upsert -> deleteWhere -> COMPACT,
    // then read the full changelog. The DuckDB oracle reconstructs every
    // per-snapshot insert/delete relationally — so delete attribution
    // (live-rows-only), same-snapshot upsert semantics, AND compaction's
    // changelog invisibility (the replace snapshot contributes nothing)
    // are all hash-checked
    "q_changes" -> ((s, dir) => {
      import graft.meta.{Changelog, IceWrite, LocalCatalog}
      import graft.compaction.Compaction
      import graft.selection.{FullCompactionConfig, PlanningParams}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-changes-wh").toString)
      val src = tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      IceWrite.create(s, catalog, "t_q_changes",
        src.filter(col("s_suppkey") % 2 === 0))                       // snapshot 1
      IceWrite.append(s, catalog, "t_q_changes",
        src.filter(col("s_suppkey") % 2 === 1))                       // snapshot 2
      val changed = src.filter(col("s_suppkey") % 3 === 0)
        .withColumn("s_name", upper(col("s_name")))
        .withColumn("s_nationkey", (col("s_nationkey") + 100).cast("int"))
      val inserted = src.filter(col("s_suppkey") % 10 === 0)
        .withColumn("s_suppkey", col("s_suppkey") + 1000000)
      IceWrite.upsert(s, catalog, "t_q_changes",
        changed.unionAll(inserted), keys = Seq("s_suppkey"))          // snapshot 3
      IceWrite.deleteWhere(s, catalog, "t_q_changes",
        col("s_suppkey") % 5 === 0)                                   // snapshot 4
      new Compaction(catalog, "t_q_changes", s,
        config = FullCompactionConfig(PlanningParams(maxOutputParallelism = 1)))
        .compact()                                                    // snapshot 5: replace
      val head = catalog.loadTable("t_q_changes").currentSnapshot.get.snapshotId
      Changelog.changesBetween(s, catalog, "t_q_changes", 0L, head)
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("s_nationkey"),
          col(Changelog.ChangeTypeCol), col(Changelog.SnapshotIdCol))
    }),

    // snapshot rollback + time travel as one oracle-checked query:
    // create -> append -> ROLLBACK to snapshot 1 -> append again, then
    // read the head (rollback's parent chain: snap 1 + the new append —
    // snap 2's rows must NOT appear) unioned with a time-travel read AT
    // snapshot 2 (which must still see them: rollback moves the ref,
    // deletes nothing)
    "q_time_travel" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-tt-wh").toString)
      val src = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      IceWrite.create(s, catalog, "t_q_tt",
        src.filter(col("s_suppkey") % 2 === 0))                       // snapshot 1
      IceWrite.append(s, catalog, "t_q_tt",
        src.filter(col("s_suppkey") % 2 === 1))                       // snapshot 2
      val snap2 = catalog.loadTable("t_q_tt").currentSnapshot.get.snapshotId
      IceWrite.rollbackTo(catalog, "t_q_tt", snap2 - 1)
      IceWrite.append(s, catalog, "t_q_tt",
        src.filter(col("s_suppkey") % 5 === 0)
          .withColumn("s_suppkey", col("s_suppkey") + 500000))        // snapshot 3
      IceRead.table(s, catalog, "t_q_tt").withColumn("view", lit("head"))
        .unionAll(
          IceRead.tableAt(s, catalog, "t_q_tt", snap2).withColumn("view", lit("asof2")))
    }),

    // full MERGE INTO as an oracle-checked query: conditional update
    // (only rows with t.s_nationkey < 15), conditional delete (source rows
    // with suppkey % 9 = 0), whole-row-source update values with one
    // target-referencing SET expression, and not-matched inserts — all
    // committed as ONE snapshot; the DuckDB oracle reconstructs the final
    // state relationally, so clause precedence (delete over update),
    // untouched-row fall-through, and single-snapshot sequencing are
    // hash-checked
    "q_merge" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-merge-wh").toString)
      val src = tbl(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      IceWrite.create(s, catalog, "t_q_merge", src)
      val source = src
        .filter(col("s_suppkey") % 4 === 0 || col("s_suppkey") % 9 === 0)
        .withColumn("s_name", concat(lit("M-"), col("s_name")))
        .unionAll(src.filter(col("s_suppkey") % 10 === 0)
          .withColumn("s_suppkey", col("s_suppkey") + 1000000))
      IceWrite.merge(s, catalog, "t_q_merge", source, keys = Seq("s_suppkey"),
        matchedUpdateWhen = col("t.s_nationkey") < 15,
        matchedDeleteWhen = col("s.s_suppkey") % 9 === 0,
        updateSet = Map(
          "s_nationkey" -> (col("t.s_nationkey") + lit(500)).cast("int")),
        // WHEN NOT MATCHED BY SOURCE DELETE: retention sweep of target
        // rows the feed no longer carries (here: high nation keys)
        notMatchedBySourceDeleteWhen = col("t.s_nationkey") >= 23)
      IceRead.table(s, catalog, "t_q_merge")
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("s_nationkey"))
    }),

    // day-partitioned retention through the REAL table format: create a
    // day(ts)-partitioned table (Iceberg time transform, UTC literals),
    // drop the oldest day METADATA-ONLY, and aggregate what survives —
    // the oracle reconstructs the same retention relationally, so the
    // time-transform fan-out, the value-addressed drop, and the MOR view
    // after it are all hash-checked
    "q_day_retention" -> ((s, dir) => {
      import graft.meta.{IceRead, IceWrite, LocalCatalog, PartitionField}
      val catalog = LocalCatalog(
        java.nio.file.Files.createTempDirectory("q-day-ret-wh").toString)
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"))
      IceWrite.create(s, catalog, "t_q_dayret", ev,
        partitionSpec = Seq(PartitionField("ts", "day")))
      val minDay = ev.agg(min(date_format(col("ts"), "yyyy-MM-dd"))).head().getString(0)
      IceWrite.dropPartitions(catalog, "t_q_dayret", Map("ts" -> minDay))
      IceRead.table(s, catalog, "t_q_dayret")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_id"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // multimodal plumbing: binary payload + typed metadata + digest
    "m1_multimodal" -> ((s, dir) =>
      Multimodal.asMedia(tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("media_id"), col("meta.n_bytes").as("byte_len"),
          sha2(col("payload"), 256).as("sha"))),

    // multimodal feature extraction through the REAL magic-byte dispatch
    // (decodeBytes): text payloads carry no codec magic, so every row must
    // take the byte-stat fallback branch — the emitted modality tag (0)
    // is hash-checked by the oracle, pinning the dispatch itself
    "m2_media_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(tbl(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(s, media)
        .select(col("media_id"),
          element_at(col("features"), 1).cast("long").as("modality_tag"),
          element_at(col("features"), 2).as("feat_len"),
          round(element_at(col("features"), 3), 4).as("feat_avg"))
    }),

    // REAL audio decode: deterministic PCM WAV payloads (pure-Scala RIFF
    // encoder) decoded distributed via javax.sound.sampled; the oracle
    // recomputes every feature analytically from the same fixed sample
    // arrays, so the encode -> decode round trip crosses two independent
    // implementations and the values are hash-checked
    // REAL video decode: AVI containers assembled from constants (frames
    // are real ImageIO-encoded JPEGs); the oracle recomputes the container
    // metadata analytically from the same constants, so the RIFF parser
    // and the header arithmetic are hash-checked (frame pixels are
    // spec-checked separately — JPEG decode is not SQL-expressible)
    "m4_avi_video" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val rows: Seq[org.apache.spark.sql.Row] =
        aviFixtures.map { case (id, w, h, uspf, nFrames) =>
          org.apache.spark.sql.Row(id, Multimodal.aviBytes(w, h, uspf,
            Seq.fill(nFrames)(jpegBytes(w, h, 0x808080))))
        } :+ org.apache.spark.sql.Row(4L, "definitely not a video".getBytes("UTF-8"))
      val media = s.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
      Multimodal.extractVideoFeatures(s, media.repartition(4))
        .drop("first_frame_luma") // pixel feature: spec-checked, not oracle-expressible
    }),

    // WARC crawl-archive round trip: documents grouped 50-per-archive
    // and encoded as real WARC/1.0 containers (every even archive
    // gzipped — the concatenated-member .warc.gz shape), parsed back
    // distributed; uri/content-length/body hash are oracle-derived
    // analytically from the same rows, so the header arithmetic, byte
    // accounting, and gzip chaining are all hash-checked
    // REAL image perceptual hashing: deterministic 9x8 gray BMPs (pixel
    // luma is pure arithmetic in (x, y, doc_id)) are ImageIO-encoded and
    // REAL-decoded executor-side, then dHashed; docs sharing doc_id % 7
    // get identical images, so the per-hash group size exposes the image
    // near-dup structure. The oracle replays the bit arithmetic straight
    // from the pixel formula — the encode/decode round trip and the hash
    // cross two independent implementations
    "m6_image_dhash" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
        StructType(Seq(StructField("media_id", LongType),
          StructField("payload", BinaryType))))
      val media = tbl(s, dir, "documents").select(col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            Row(id, Multimodal.grayBmpBytes(9, 8,
              (x, y) => ((17 * x + 31 * y + (id % 7) * 40) % 256).toInt))
          }
        }(enc)
      Multimodal.imageDHashes(s, media)
        .withColumn("n_same", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("dhash_lo"), col("dhash_hi"))))
        .withColumnRenamed("media_id", "doc_id")
    }),

    "m5_warc" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
        StructType(Seq(StructField("file_id", LongType),
          StructField("payload", BinaryType))))
      val files = tbl(s, dir, "documents")
        .select(expr("doc_id div 50").as("file_id"), col("doc_id"),
          coalesce(col("text"), lit("")).as("text"))
        .groupBy(col("file_id"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
        .mapPartitions { rows =>
          rows.map { r =>
            val fid = r.getLong(0)
            val recs = r.getSeq[Row](1).map { rr =>
              (s"http://example.com/doc/${rr.getLong(0)}", "text/plain",
                rr.getString(1).getBytes("UTF-8"))
            }
            val bytes = graft.sources.Warc.warcBytes(recs)
            Row(fid, if (fid % 2 == 0) graft.sources.Warc.gzip(bytes) else bytes)
          }
        }(enc)
      graft.sources.Warc.parse(s, files)
        .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("content_length"), md5(col("body")).as("body_md5"))
    }),

    "m3_wav_audio" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val rows: Seq[org.apache.spark.sql.Row] =
        wavFixtures.map { case (id, rate, ch, samples) =>
          org.apache.spark.sql.Row(id, Multimodal.wavBytes(rate, ch, samples))
        } :+ org.apache.spark.sql.Row(4L, "definitely not a wav".getBytes("UTF-8"))
      val media = s.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
      Multimodal.extractAudioFeatures(s, media.repartition(4))
    }),

    // signal-level audio gates (zero-crossing rate, near-silence
    // fraction, peak) over REAL javax.sound decode: DC never crosses,
    // zeros are all-silent, the alternating square crosses every pair
    // (zc_e6 = 1e6 exactly); garbage bytes -> nulls. Integer-exact, so
    // the oracle derives every row from the sample constants.
    "m7_audio_signal" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      val rows: Seq[org.apache.spark.sql.Row] =
        wavSignalFixtures.map { case (id, rate, ch, samples) =>
          org.apache.spark.sql.Row(id, Multimodal.wavBytes(rate, ch, samples))
        } :+ org.apache.spark.sql.Row(4L, "definitely not a wav".getBytes("UTF-8"))
      val media = s.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
      Multimodal.audioSignalStats(s, media.repartition(3))
    }),

    // VIDEO near-dup via shared frame fingerprints: four AVIs built from
    // deterministic 9x8 step-pattern BMP frames (pattern p -> exactly one
    // dHash bit per row, so distinct patterns give distinct fingerprints
    // by construction). A shares 2 of 4 frames with B (overlap 500000 on
    // the smaller side), D is an exact copy of A (1e6), C shares nothing,
    // garbage bytes decode to no frames and pair with nothing — expected
    // pairs derive analytically from which patterns each video contains.
    "m8_video_neardup" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      def frame(p: Int) = Multimodal.grayBmpBytes(9, 8,
        (x, y) => if (x <= (y + p) % 8) 0 else 255)
      def avi(ps: Seq[Int]) = Multimodal.aviBytes(9, 8, 40000, ps.map(frame))
      val rows: Seq[org.apache.spark.sql.Row] = Seq(
        org.apache.spark.sql.Row(1L, avi(Seq(0, 1, 2, 3))),
        org.apache.spark.sql.Row(2L, avi(Seq(2, 3, 4, 5))),
        org.apache.spark.sql.Row(3L, avi(Seq(6, 7))),
        org.apache.spark.sql.Row(4L, avi(Seq(0, 1, 2, 3))),
        org.apache.spark.sql.Row(9L, "not a video".getBytes("UTF-8")))
      val media = s.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
      Multimodal.videoNearDupPairs(s, media.repartition(3), minOverlapPpm = 400000L)
    }),

    // AUDIO near-dup via banded Hamming LSH over envelope-delta
    // fingerprints: tracks built by walking a CHOSEN 64-bit pattern into
    // per-window square-wave amplitudes (mean |amp| of a ±A window is A
    // exactly, so the fingerprint equals the pattern by construction).
    // Track 2 is track 1 at half volume (even amplitudes halve exactly ->
    // identical delta signs, hamming 0), track 3 flips bits 5 and 40
    // (bands 1/3 still agree -> candidate found, hamming 2), track 4 is
    // the complement (no shared band), garbage bytes carry no code.
    "m9_audio_neardup" -> ((s, dir) => {
      import scala.jdk.CollectionConverters._
      def track(bits: Long, scaleDiv: Int): Array[Byte] = {
        val amps = new Array[Int](65)
        amps(0) = 16384
        for (w <- 0 until 64)
          amps(w + 1) = amps(w) + (if (((bits >> w) & 1L) == 1L) 128 else -128)
        val samples = amps.flatMap { a =>
          val h = a / scaleDiv
          Array.fill(8)(Array(h.toShort, (-h).toShort)).flatten
        }
        Multimodal.wavBytes(8000, 1, samples)
      }
      val base = 0x5A5AC3C3A5A53C3CL
      val rows: Seq[org.apache.spark.sql.Row] = Seq(
        org.apache.spark.sql.Row(1L, track(base, 1)),
        org.apache.spark.sql.Row(2L, track(base, 2)),
        org.apache.spark.sql.Row(3L, track(base ^ ((1L << 5) | (1L << 40)), 1)),
        org.apache.spark.sql.Row(4L, track(~base, 1)),
        org.apache.spark.sql.Row(9L, "not audio at all".getBytes("UTF-8")))
      val media = s.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
      Multimodal.audioNearDupPairs(s, media.repartition(3), maxHamming = 3)
    })
  )

  /** m4 fixtures: (id, width, height, microSecPerFrame, nFrames) —
    * constants, so the oracle derives width/height/n_frames/fps_e3
    * without parsing RIFF. 40 ms -> 25 fps, 33,333 µs -> ~30.0003 fps,
    * 16,667 µs -> ~59.999 fps. */
  /** DuckDB winnow fingerprint chain (w = 5): per-doc distinct selected
    * hashes of `src`(doc_id, text) as CTE `${pfx}fpe`(doc_id, fh). */
  private def winnowFpeSql(src: String, pfx: String, k: Int): String =
    s"""${pfx}norm AS (SELECT doc_id, lower($normSql) AS t FROM $src),
       |${pfx}g AS (SELECT doc_id, t, CAST(len(t) - ${k - 1} AS INT) AS m FROM ${pfx}norm),
       |${pfx}hs AS (SELECT doc_id, m,
       |  CASE WHEN m < 1 THEN [] ELSE
       |    list_transform(range(1, m + 1),
       |      i -> substr(md5(substr(t, CAST(i AS INT), $k)), 1, 16)) END AS h
       |  FROM ${pfx}g),
       |${pfx}sel AS (SELECT doc_id, m, h,
       |  CASE WHEN m - 4 < 1 THEN [] ELSE
       |    list_distinct(list_transform(range(1, m - 3),
       |      j -> CAST(substr(
       |        list_reduce(
       |          list_prepend('g|0', list_transform(range(j, j + 5),
       |            i -> h[CAST(i AS INT)] || '|' || i)),
       |          (a, x) -> CASE WHEN substr(x, 1, 16) <= substr(a, 1, 16)
       |                         THEN x ELSE a END),
       |        18) AS BIGINT))) END AS ps
       |  FROM ${pfx}hs),
       |${pfx}fpe AS (SELECT DISTINCT doc_id, h[CAST(p AS INT)] AS fh
       |        FROM (SELECT doc_id, h, unnest(ps) AS p FROM ${pfx}sel))""".stripMargin

  /** g3 edge list — ONE source of truth for both engines: a 6-clique
    * (nodes 0-5), an 8-cycle (10-17), a pendant star on the clique
    * (30-35), a 3-node tail off the cycle (20-22), and a clique-cycle
    * bridge (5, 10). The 2-core is exactly the clique + cycle + bridge;
    * peel depth is 3 (tail), so the oracle's 5 unrolled rounds reach the
    * fixpoint. */
  private[queries] val kCoreEdges: Seq[(Long, Long)] =
    (for { i <- 0L until 6L; j <- (i + 1) until 6L } yield (i, j)) ++
      (0L until 8L).map(i => (10L + i, 10L + (i + 1) % 8)) ++
      (0L until 6L).map(i => (30L + i, i)) ++
      Seq((17L, 20L), (20L, 21L), (21L, 22L), (5L, 10L))

  private def kCoreEdgesSql: String =
    kCoreEdges.map { case (u, v) => s"($u, $v)" }.mkString(", ")

  /** One unrolled peel round for the g3 oracle. */
  private def kCorePeelRoundSql(prev: String, cur: String, k: Int): String =
    s"""d_$cur AS (SELECT node, count(*) AS deg FROM (
       |  SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev) t GROUP BY 1),
       |$cur AS (SELECT u, v FROM $prev
       |  WHERE u IN (SELECT node FROM d_$cur WHERE deg >= $k)
       |    AND v IN (SELECT node FROM d_$cur WHERE deg >= $k))""".stripMargin

  private def aviFixtures: Seq[(Long, Int, Int, Int, Int)] = Seq(
    (1L, 32, 24, 40000, 3),
    (2L, 64, 48, 33333, 1),
    (3L, 16, 16, 16667, 5))

  /** A real JPEG via ImageIO (solid color) for AVI frame fixtures. */
  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** m3 fixtures: (id, rate, channels, 16-bit samples) — constants, so the
    * oracle can derive the expected features without decoding audio.
    * DC at 16384 -> rms exactly 0.5; a quantized 100 Hz sine at 0.25 FS;
    * stereo silence. */
  private def wavFixtures: Seq[(Long, Int, Int, Array[Short])] = Seq(
    (1L, 8000, 1, Array.fill[Short](8000)(16384)),
    (2L, 16000, 1, Array.tabulate[Short](16000)(k =>
      math.round(0.25 * 32767 * math.sin(2 * math.Pi * 100 * k / 16000)).toShort)),
    (3L, 44100, 2, Array.fill[Short](2 * 4410)(0)))

  /** The analytically derived m3 feature rows (id, rate, channels,
    * duration_ms, rms_e6) — same arithmetic as the decoder's contract,
    * computed from the sample constants, never from WAV bytes. */
  private def wavExpected: Seq[(Long, Int, Int, Long, Long)] =
    wavFixtures.map { case (id, rate, ch, samples) =>
      val frames = samples.length / ch
      val rms = math.sqrt(samples.map { v => val x = v / 32768.0; x * x }.sum / samples.length)
      (id, rate, ch, math.round(1000.0 * frames / rate), math.round(rms * 1e6))
    }

  /** m7 fixtures: the m3 WAVs plus a +-1000 alternating square (every
    * pair crosses zero -> zc_e6 exactly 1e6) — constants, so the signal
    * stats derive analytically. */
  private def wavSignalFixtures: Seq[(Long, Int, Int, Array[Short])] =
    wavFixtures :+ ((5L, 8000, 1,
      Array.tabulate[Short](100)(k => if (k % 2 == 0) 1000 else -1000)))

  /** Analytic (id, zc_e6, silence_e6, peak_e6): the audioSignalStats
    * integer contract replayed from the sample constants. */
  private def wavSignalExpected: Seq[(Long, Long, Long, Long)] =
    wavSignalFixtures.map { case (id, _, ch, samples) =>
      val frames = samples.length / ch
      var crossings = 0L
      for (i <- ch until samples.length)
        if ((samples(i - ch) < 0) != (samples(i) < 0)) crossings += 1
      val silent = samples.count(v => math.abs(v.toInt) <= 327).toLong
      val maxAbs = if (samples.isEmpty) 0L else samples.map(v => math.abs(v.toLong)).max
      val pairs = if (frames < 2) 0L else (frames - 1).toLong * ch
      (id,
        if (pairs == 0) 0L else 1000000L * crossings / pairs,
        if (samples.isEmpty) 0L else 1000000L * silent / samples.length,
        1000000L * maxAbs / 32768)
    }

  // ------------------------------------------------------------- oracles --

  /** Parameterized replay of Dedup.minHashSignatures (4 lanes per md5)
    * for an arbitrary gram CTE — shared by d2 (self) and d10 (cross). */
  private def minhashSigSqlFor(grams: String, sig: String): String = {
    val hs = (0 until 4).map(s => s"md5('$s:' || gram) AS h$s").mkString(", ")
    val mhs = (0 until 16).map(j =>
      s"min(substr(h${j / 4}, ${(j % 4) * 8 + 1}, 8)) AS mh$j").mkString(", ")
    s"${sig}_h AS (SELECT id, $hs FROM $grams), " +
      s"$sig AS (SELECT id, $mhs FROM ${sig}_h GROUP BY id)"
  }
  private val minhashSigSql: String = minhashSigSqlFor("grams", "sig")

  private def bandsSqlFor(sig: String, bands: String): String = {
    val bs = (0 until 4).map { b =>
      val cols = (b * 4 until (b + 1) * 4).map(j => s"mh$j").mkString(" || ")
      s"SELECT id, $b AS band, md5($cols) AS bh FROM $sig"
    }
    s"$bands AS (${bs.mkString(" UNION ALL ")})"
  }
  private val bandsSql: String = bandsSqlFor("sig", "bands")

  /** Distinct word-3-shingles of an (id, text) CTE — the wordGramsSql
    * shape over an arbitrary source. */
  private def wordGramsSqlFor(src: String, grams: String): String =
    s"""$grams AS (
       |  SELECT DISTINCT id, g AS gram FROM (
       |    SELECT id, unnest(list_transform(
       |      range(1, greatest(len(toks) - 2, 1) + 1),
       |      i -> array_to_string(toks[i:i+2], ' '))) AS g
       |    FROM (SELECT id, $toksSql AS toks FROM $src)))""".stripMargin

  /** Per-side hot-bucket cap replay (lshCandidatePairs' window filter). */
  private def cappedBandsSqlFor(bands: String, sized: String, cap: Int): String =
    s"""$sized AS (
       |  SELECT b.* FROM $bands b
       |  JOIN (SELECT band, bh, count(*) AS n FROM $bands GROUP BY 1, 2) z
       |    ON b.band = z.band AND b.bh = z.bh
       |  WHERE z.n <= $cap)""".stripMargin

  private val oraclesBase: Map[String, String] = Map(
    "d1_exact_dedup" ->
      s"""WITH $corpusSql
         |SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
         |  min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_dups
         |FROM corpus GROUP BY 1""".stripMargin,

    "d2_minhash_pairs" ->
      s"""WITH $corpusSql,
         |$wordGramsSql,
         |$minhashSigSql,
         |$bandsSql,
         |sized AS (
         |  SELECT b.* FROM bands b
         |  JOIN (SELECT band, bh, count(*) AS n FROM bands GROUP BY 1,2) z
         |    ON b.band = z.band AND b.bh = z.bh
         |  WHERE z.n <= 100),
         |cand AS (
         |  SELECT DISTINCT a.id AS id1, b.id AS id2
         |  FROM sized a JOIN sized b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
         |sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
         |common AS (
         |  SELECT c.id1, c.id2, count(*) AS c
         |  FROM cand c
         |  JOIN grams g1 ON g1.id = c.id1
         |  JOIN grams g2 ON g2.id = c.id2 AND g2.gram = g1.gram
         |  GROUP BY c.id1, c.id2)
         |SELECT id1, id2 FROM common
         |JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
         |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5""".stripMargin,

    "d12_containment_lsh" ->
      s"""WITH $corpusSql,
         |$wordGramsSql,
         |$minhashSigSql,
         |$bandsSql,
         |sized AS (
         |  SELECT b.* FROM bands b
         |  JOIN (SELECT band, bh, count(*) AS n FROM bands GROUP BY 1,2) z
         |    ON b.band = z.band AND b.bh = z.bh
         |  WHERE z.n <= 100),
         |cand AS (
         |  SELECT DISTINCT a.id AS id1, b.id AS id2
         |  FROM sized a JOIN sized b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
         |dir AS (SELECT id1, id2 FROM cand UNION ALL SELECT id2, id1 FROM cand),
         |sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
         |common AS (
         |  SELECT d.id1, d.id2, count(*) AS c
         |  FROM dir d
         |  JOIN grams g1 ON g1.id = d.id1
         |  JOIN grams g2 ON g2.id = d.id2 AND g2.gram = g1.gram
         |  GROUP BY d.id1, d.id2)
         |SELECT id1, id2 FROM common
         |JOIN sizes s1 ON s1.id = id1
         |WHERE s1.n > 0 AND CAST(c AS DOUBLE) / s1.n >= 0.9""".stripMargin,

    "d10_fuzzy_join" ->
      s"""WITH lft AS (SELECT doc_id AS id, text FROM documents),
         |rgt AS (SELECT doc_id AS id, text || ' reference copy' AS text
         |        FROM documents WHERE doc_id % 4 = 0),
         |${wordGramsSqlFor("lft", "grams_l")},
         |${wordGramsSqlFor("rgt", "grams_r")},
         |${minhashSigSqlFor("grams_l", "sig_l")},
         |${minhashSigSqlFor("grams_r", "sig_r")},
         |${bandsSqlFor("sig_l", "bands_l")},
         |${bandsSqlFor("sig_r", "bands_r")},
         |${cappedBandsSqlFor("bands_l", "sized_l", 100)},
         |${cappedBandsSqlFor("bands_r", "sized_r", 100)},
         |cand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id
         |         FROM sized_l l JOIN sized_r r ON l.band = r.band AND l.bh = r.bh),
         |sizes_l AS (SELECT id, count(*) AS n FROM grams_l GROUP BY id),
         |sizes_r AS (SELECT id, count(*) AS n FROM grams_r GROUP BY id),
         |common AS (SELECT c.left_id, c.right_id, count(*) AS c
         |  FROM cand c JOIN grams_l g1 ON g1.id = c.left_id
         |  JOIN grams_r g2 ON g2.id = c.right_id AND g2.gram = g1.gram
         |  GROUP BY 1, 2)
         |SELECT left_id, right_id FROM common
         |JOIN sizes_l s1 ON s1.id = left_id JOIN sizes_r s2 ON s2.id = right_id
         |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5""".stripMargin,

    "d6_dedup_clusters" ->
      s"""WITH ${corpusSql.replace("corpus AS (", "corpus0 AS (")},
         |corpus AS (SELECT * FROM corpus0 WHERE doc_id % 100000 < 500),
         |$gramsSql,
         |sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
         |common AS (
         |  SELECT a.id AS id1, b.id AS id2, count(*) AS c
         |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
         |  WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION SELECT id2, id1 FROM pairs),
         |reach AS (
         |  WITH RECURSIVE r(id, label) AS (
         |    SELECT src, src FROM edges
         |    UNION
         |    SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.id)
         |  SELECT * FROM r)
         |SELECT id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin,

    "d3_simhash" -> {
      val aggs = (1 to 32).map(i =>
        s"sum(CASE WHEN substr(h, $i, 1) >= '8' THEN 1 ELSE -1 END) AS s$i").mkString(", ")
      val bits = (1 to 32).map(i => s"CASE WHEN s$i >= 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""WITH toks AS (
         |  SELECT doc_id AS id, md5(unnest($toksSql)) AS h FROM documents),
         |sums AS (SELECT id, $aggs FROM toks GROUP BY id)
         |SELECT id, $bits AS simhash FROM sums""".stripMargin
    },

    "d4_ngram_jaccard" ->
      s"""WITH ${corpusSql.replace(
        "corpus AS (",
        "corpus0 AS (")},
         |corpus AS (SELECT * FROM corpus0 WHERE doc_id % 100000 < 1000),
         |$gramsSql,
         |sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
         |common AS (
         |  SELECT a.id AS id1, b.id AS id2, count(*) AS c
         |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id1, id2 FROM common
         |JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
         |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6""".stripMargin,

    "d11_containment" ->
      s"""WITH ${corpusSql.replace(
        "corpus AS (",
        "corpus0 AS (")},
         |corpus AS (SELECT * FROM corpus0 WHERE doc_id % 100000 < 1000),
         |$gramsSql,
         |sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
         |common AS (
         |  SELECT a.id AS id1, b.id AS id2, count(*) AS c
         |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id <> b.id
         |  GROUP BY 1, 2)
         |SELECT id1, id2 FROM common
         |JOIN sizes s1 ON s1.id = id1
         |WHERE s1.n > 0 AND CAST(c AS DOUBLE) / s1.n >= 0.9""".stripMargin,

    "d5_embed_neardup" ->
      s"""WITH $embCorpusSql,
         |pairs AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
         |  FROM ecorpus a JOIN ecorpus b ON a.vec_id < b.vec_id)
         |SELECT DISTINCT id1, id2 FROM pairs WHERE sim >= 0.9""".stripMargin,

    "s1_ann_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3""".stripMargin,

    "s10_hard_negatives" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id % 97 = 0 AND q.vec_id <> c.vec_id AND q.label <> c.label),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored WHERE sim < 0.98)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3""".stripMargin,

    "s2_ann_lsh_buckets" -> {
      // embeddings are fixed 64-dim; list_sum over a per-plane signed copy
      val bits = (0 until 8).map { p =>
        s"""CASE WHEN round(list_sum(list_transform(range(1, 65), i ->
           |  e.embedding[i]::DOUBLE *
           |  CASE WHEN substr(md5('$p:' || CAST(i AS VARCHAR)), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END)), 6)
           |  >= 0 THEN '1' ELSE '0' END""".stripMargin
      }.mkString(" || ")
      s"SELECT e.vec_id, $bits AS bucket FROM embeddings e"
    },

    "s3_ann_ivf_cells" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]), 6) AS sim
        |  FROM embeddings e CROSS JOIN cents c),
        |ranked AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
        |  FROM scored)
        |SELECT vec_id, CAST(cid AS BIGINT) AS cell_id FROM ranked WHERE rn = 1""".stripMargin,

    // the oracle replays the identical subspace slicing, the identical
    // left-to-right L2 fold, the identical micro-rounding, and the
    // identical lowest-id tie-break
    "s6_pq_encode" ->
      """WITH sub AS (
        |  SELECT vec_id, j,
        |    list_transform(range(1, 17), i -> embedding[j * 16 + i]::DOUBLE) AS sv
        |  FROM embeddings, unnest([0, 1, 2, 3]) AS u(j)),
        |cbsub AS (
        |  SELECT vec_id AS cid, j,
        |    list_transform(range(1, 17), i -> embedding[j * 16 + i]::DOUBLE) AS cv
        |  FROM embeddings, unnest([0, 1, 2, 3]) AS u(j) WHERE vec_id < 16),
        |sc AS (
        |  SELECT vec_id, s.j, cid,
        |    CAST(round(list_sum(list_transform(range(1, 17),
        |      i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) * 1000000.0, 0) AS BIGINT) AS d
        |  FROM sub s JOIN cbsub c ON s.j = c.j),
        |mn AS (SELECT vec_id, j, min(d) AS md FROM sc GROUP BY 1, 2),
        |code AS (
        |  SELECT sc.vec_id, sc.j, CAST(min(cid) AS BIGINT) AS code
        |  FROM sc JOIN mn ON sc.vec_id = mn.vec_id AND sc.j = mn.j AND sc.d = mn.md
        |  GROUP BY 1, 2)
        |SELECT vec_id,
        |  max(CASE WHEN j = 0 THEN code END) AS code_0,
        |  max(CASE WHEN j = 1 THEN code END) AS code_1,
        |  max(CASE WHEN j = 2 THEN code END) AS code_2,
        |  max(CASE WHEN j = 3 THEN code END) AS code_3
        |FROM code GROUP BY 1""".stripMargin,

    // the oracle re-derives the codes (s6's CTEs), the query-side
    // distance table, and the identical ADC sum + ranking
    "s7_pq_search" ->
      """WITH sub AS (
        |  SELECT vec_id, j,
        |    list_transform(range(1, 17), i -> embedding[j * 16 + i]::DOUBLE) AS sv
        |  FROM embeddings, unnest([0, 1, 2, 3]) AS u(j)),
        |cbsub AS (
        |  SELECT vec_id AS cid, j,
        |    list_transform(range(1, 17), i -> embedding[j * 16 + i]::DOUBLE) AS cv
        |  FROM embeddings, unnest([0, 1, 2, 3]) AS u(j) WHERE vec_id < 16),
        |sc AS (
        |  SELECT vec_id, s.j, cid,
        |    CAST(round(list_sum(list_transform(range(1, 17),
        |      i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) * 1000000.0, 0) AS BIGINT) AS d
        |  FROM sub s JOIN cbsub c ON s.j = c.j),
        |mn AS (SELECT vec_id, j, min(d) AS md FROM sc GROUP BY 1, 2),
        |code AS (
        |  SELECT sc.vec_id, sc.j, CAST(min(cid) AS BIGINT) AS code
        |  FROM sc JOIN mn ON sc.vec_id = mn.vec_id AND sc.j = mn.j AND sc.d = mn.md
        |  GROUP BY 1, 2),
        |adc AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.d) AS BIGINT) AS adc_e6
        |  FROM code c
        |  JOIN (SELECT vec_id AS query_id, j, cid, d FROM sc WHERE vec_id % 200 = 0) q
        |    ON q.j = c.j AND q.cid = c.code
        |  WHERE q.query_id <> c.vec_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, rank, adc_e6 FROM (
        |  SELECT query_id, neighbor_id, adc_e6,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_e6 ASC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM adc)
        |WHERE rank <= 5""".stripMargin,

    // identical cell assignment as s3's oracle, then the NOT EXISTS form
    // of "a lower-id same-cell neighbor at cosine >= 0.99"
    "d7_semdedup" ->
      s"""WITH $embCorpusSql,
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT e.vec_id, c.cid,
         |    round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]), 6) AS sim
         |  FROM ecorpus e CROSS JOIN cents c),
         |cells AS (
         |  SELECT vec_id, cid AS cell_id FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
         |    FROM scored) WHERE rn = 1),
         |v AS (SELECT e.vec_id, cell_id, embedding FROM ecorpus e JOIN cells USING (vec_id))
         |SELECT a.vec_id, CAST(a.cell_id AS BIGINT) AS cell_id FROM v a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM v b WHERE b.cell_id = a.cell_id AND b.vec_id < a.vec_id
         |    AND round(list_cosine_similarity(
         |          a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.99)""".stripMargin,

    "t1_langid" -> {
      def cnt(words: Seq[String]) =
        s"len(list_filter($toksSql, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
      val en = cnt(Seq("the", "a", "of", "and", "to", "is", "in"))
      val fr = cnt(Seq("le", "la", "les", "et", "de", "un", "une"))
      val es = cnt(Seq("el", "los", "y", "que", "en", "un", "una"))
      val de = cnt(Seq("der", "die", "das", "und", "ein", "nicht"))
      val cjk = "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))"
      s"""SELECT doc_id,
         |  CASE WHEN $cjk > 0 THEN 'zh'
         |       WHEN $de > 0 AND $de >= $fr AND $de >= $es AND $de >= $en THEN 'de'
         |       WHEN $fr > 0 AND $fr >= $es AND $fr >= $en THEN 'fr'
         |       WHEN $es > 0 AND $es >= $en THEN 'es'
         |       ELSE 'en' END AS pred_lang
         |FROM documents""".stripMargin
    },

    "t2_quality" -> {
      val punct = "round(len(regexp_extract_all(text, '[.,;:!?]')) / greatest(len(text), 1), 4)"
      val nTok = s"len($toksSql)"
      val stop = s"len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','is','in')))"
      s"""SELECT doc_id,
         |  $punct AS punct_ratio,
         |  round($stop / CAST(greatest($nTok, 1) AS DOUBLE), 4) AS stopword_ratio,
         |  round(least(n_chars / 500.0, 1.0) * 0.3 + (1.0 - $punct) * 0.4 +
         |        least($nTok / 100.0, 1.0) * 0.3, 4) AS quality
         |FROM documents""".stripMargin
    },

    "t3_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS re_tokens
         |FROM documents""".stripMargin,

    "t4_fingerprint" ->
      s"""SELECT doc_id, md5(lower($normSql)) AS fingerprint FROM documents""".stripMargin,

    "t5_vocab" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
         |counted AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok)
         |SELECT tok, cnt, rank FROM (
         |  SELECT tok, cnt,
         |    CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank
         |  FROM counted) t WHERE rank <= 20""".stripMargin,

    "t6_length_hist" ->
      """SELECT n_chars // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1""".stripMargin,

    "q_upsert_mor" ->
      """WITH up AS (
        |  SELECT s_suppkey, upper(s_name) AS s_name, s_nationkey + 100 AS s_nationkey
        |  FROM supplier WHERE s_suppkey % 3 = 0),
        |ins AS (
        |  SELECT s_suppkey + 1000000 AS s_suppkey, s_name, s_nationkey
        |  FROM supplier WHERE s_suppkey % 10 = 0),
        |final0 AS (
        |  SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_suppkey % 3 <> 0
        |  UNION ALL SELECT * FROM up
        |  UNION ALL SELECT * FROM ins)
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |FROM final0 WHERE s_suppkey % 7 <> 0""".stripMargin,

    "q_sql_evolution" ->
      """SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS nk,
        |       'unknown' AS category, CAST(NULL AS DOUBLE) AS score
        |FROM supplier
        |UNION ALL
        |SELECT s_suppkey + 1000000, s_name,
        |       CAST(3000000000 + s_nationkey AS BIGINT), 'new',
        |       CAST(s_nationkey AS DOUBLE)
        |FROM supplier WHERE s_suppkey % 4 = 0""".stripMargin,

    "q_sql_spec_evolve" ->
      "SELECT s_suppkey, s_name FROM supplier",

    "q_sql_dml" ->
      """WITH upd AS (
        |  SELECT s_suppkey,
        |         CASE WHEN s_suppkey % 3 = 0 THEN upper(s_name) ELSE s_name END AS s_name,
        |         s_nationkey
        |  FROM supplier),
        |del AS (SELECT * FROM upd WHERE s_suppkey % 7 <> 0),
        |src AS (
        |  SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_suppkey % 5 = 0
        |  UNION ALL
        |  SELECT s_suppkey + 1000000 AS s_suppkey, s_name, s_nationkey FROM supplier
        |  WHERE s_suppkey % 10 = 0),
        |merged AS (
        |  SELECT d.s_suppkey, d.s_name,
        |         CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_nationkey + 100
        |              ELSE d.s_nationkey END AS s_nationkey
        |  FROM del d LEFT JOIN src s ON d.s_suppkey = s.s_suppkey
        |  UNION ALL
        |  SELECT s.s_suppkey, s.s_name, s.s_nationkey
        |  FROM src s LEFT JOIN del d ON s.s_suppkey = d.s_suppkey
        |  WHERE d.s_suppkey IS NULL)
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |FROM merged""".stripMargin,

    "q_sql_frontdoor" ->
      """WITH t AS (
        |  SELECT * FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, upper(c_name), c_nationkey,
        |         c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sum(c_nationkey) AS BIGINT) AS sum_nk,
        |       (SELECT CAST(count(*) AS BIGINT) FROM customer) AS base_rows
        |FROM t GROUP BY c_mktsegment""".stripMargin,

    "q_row_lineage" ->
      """WITH ranked AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
        |         row_number() OVER (ORDER BY s_suppkey) - 1 AS row_id
        |  FROM supplier)
        |SELECT s_suppkey, CAST(row_id AS BIGINT) AS row_id,
        |       CAST(1 AS BIGINT) AS last_seq
        |FROM ranked WHERE s_suppkey % 7 <> 0""".stripMargin,

    "q_sync_mirror" ->
      """WITH final0 AS (
        |  SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |  FROM supplier WHERE s_suppkey % 3 <> 0
        |  UNION ALL
        |  SELECT s_suppkey, upper(s_name), CAST(s_nationkey AS BIGINT)
        |  FROM supplier WHERE s_suppkey % 3 = 0)
        |SELECT s_suppkey, s_name, s_nationkey
        |FROM final0 WHERE s_suppkey % 7 <> 0""".stripMargin,

    "q_partition_ops" ->
      """WITH base AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
        |         l_returnflag, CAST(l_quantity AS DOUBLE) AS l_quantity
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_returnflag,
        |       CAST(l_quantity * 100 AS BIGINT) AS qty_c100
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |  FROM base WHERE l_returnflag = 'N'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity + 5
        |  FROM base WHERE l_returnflag = 'A')""".stripMargin,

    "q_add_files" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  CAST(l_partkey AS BIGINT) AS l_partkey,
        |  CAST(l_linenumber AS INTEGER) AS l_linenumber
        |FROM lineitem
        |WHERE l_orderkey % 4 IN (0, 1) AND l_linenumber <> 3""".stripMargin,

    "t7_repetition" ->
      s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS tok,
         |             unnest(range(1, len(toks) + 1)) AS p FROM base),
         |wc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, max(c) AS maxc,
         |               count(*) AS nd FROM wc GROUP BY 1),
         |runs AS (SELECT doc_id, tok,
         |    p - row_number() OVER (PARTITION BY doc_id, tok ORDER BY p) AS isl FROM t),
         |runl AS (SELECT doc_id, max(c) AS mr FROM (
         |    SELECT doc_id, tok, isl, count(*) AS c FROM runs GROUP BY 1, 2, 3)
         |  GROUP BY 1),
         |bg AS (SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(toks) - 1, 0) + 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bgram FROM base),
         |bgc AS (SELECT doc_id, bgram, count(*) AS c FROM bg GROUP BY 1, 2),
         |bga AS (SELECT doc_id, max(c) AS maxbg, sum(c) AS nbg FROM bgc GROUP BY 1)
         |SELECT a.doc_id,
         |  round((a.n - a.nd) / CAST(a.n AS DOUBLE), 6) AS dup_word_frac,
         |  round(a.maxc / CAST(a.n AS DOUBLE), 6) AS top_word_frac,
         |  coalesce(round(b.maxbg / CAST(b.nbg AS DOUBLE), 6), 0.0) AS top_bigram_frac,
         |  CAST(r.mr AS BIGINT) AS max_run_len
         |FROM agg a JOIN runl r ON r.doc_id = a.doc_id
         |LEFT JOIN bga b ON b.doc_id = a.doc_id""".stripMargin,

    "t8_pii" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+\\d[\\d ]{6,}\\d"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      s"""WITH pii AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 3 = 0
         |       THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
         |  CASE WHEN doc_id % 5 = 0 THEN ' call +1 555 123 4567' ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0
         |       THEN ' node 10.0.' || (doc_id % 256) || '.17 up' ELSE '' END AS t
         |FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS emails,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS phones,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'),
         |    '$ip', '<IP>', 'g')) AS redacted_md5
         |FROM pii""".stripMargin
    },

    "t31_domain_blocklist" ->
      """WITH inj AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 4 = 0 THEN ' https://a.b.example.com/x'
        |       WHEN doc_id % 4 = 1 THEN ' http://notexample.com/y'
        |       WHEN doc_id % 4 = 2 THEN ' go to https://BAD.org.'
        |       ELSE ' no urls here' END AS t
        |FROM documents),
        |h AS (SELECT doc_id,
        |  list_transform(regexp_extract_all(lower(t), 'https?://([a-z0-9.-]+)', 1),
        |    h0 -> regexp_replace(h0, '^\.+|\.+$', '', 'g')) AS hosts FROM inj),
        |sfx AS (SELECT doc_id, flatten(list_transform(hosts, h2 ->
        |    list_transform(range(1, len(string_split(h2, '.')) + 1),
        |      i -> array_to_string(string_split(h2, '.')[i:], '.')))) AS sufs
        |  FROM h)
        |SELECT doc_id, list_has_any(sufs, ['example.com', 'bad.org']) AS blocked
        |FROM sfx""".stripMargin,

    "t9_domains" ->
      """WITH inj AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 2 = 0
        |       THEN ' see https://site' || (doc_id % 5) || '.example.com/page now' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' and http://mirror.example.org too' ELSE '' END AS t
        |FROM documents),
        |d AS (SELECT doc_id,
        |  unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain FROM inj)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_refs,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM d GROUP BY 1""".stripMargin,

    "t10_decontaminate" ->
      s"""WITH test AS (
         |  SELECT array_to_string(($toksSql)[1:12], ' ') AS ttext
         |  FROM documents WHERE doc_id % 25 = 0),
         |tg AS (SELECT DISTINCT g AS gram FROM (
         |  SELECT unnest(list_transform(
         |    range(1, greatest(len(toks) - 7, 1) + 1),
         |    i -> array_to_string(toks[i:i+7], ' '))) AS g
         |  FROM (SELECT string_split(lower(regexp_replace(trim(ttext), '\\s+', ' ', 'g')), ' ') AS toks
         |        FROM test))),
         |cg AS (SELECT DISTINCT doc_id AS id, g AS gram FROM (
         |  SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(toks) - 7, 1) + 1),
         |    i -> array_to_string(toks[i:i+7], ' '))) AS g
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)))
         |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM cg JOIN tg USING (gram) GROUP BY 1""".stripMargin,

    "p1_hash_split" -> {
      val t80 = graft.ops.Sampling.rateThreshold(0.8)
      val t90 = graft.ops.Sampling.rateThreshold(0.9)
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5('split:' || doc_id), 1, 8) < '$t80' THEN 'train'
         |       WHEN substr(md5('split:' || doc_id), 1, 8) < '$t90' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    // identical equal-width hex-range shard assignment and identical
    // (draw, doc_id) permutation order
    "p5_shards" -> {
      val cases = (0 until 7).map { i =>
        val t = graft.ops.Sampling.rateThreshold((i + 1).toDouble / 8)
        s"WHEN draw < '$t' THEN $i"
      }.mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, substr(md5('shard:' || doc_id), 1, 8) AS draw FROM documents),
         |sh AS (SELECT doc_id, draw,
         |  CAST(CASE $cases ELSE 7 END AS BIGINT) AS shard FROM d)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY draw, doc_id) AS BIGINT)
         |    AS shard_pos
         |FROM sh""".stripMargin
    },

    "p2_stratified_sample" -> {
      val en = graft.ops.Sampling.rateThreshold(0.5)
      val fr = graft.ops.Sampling.rateThreshold(0.25)
      val other = graft.ops.Sampling.rateThreshold(0.1)
      s"""SELECT doc_id, lang FROM documents
         |WHERE substr(md5('strata:' || doc_id), 1, 8) <
         |  CASE lang WHEN 'en' THEN '$en' WHEN 'fr' THEN '$fr' ELSE '$other' END""".stripMargin
    },

    // identical draw, identical per-group rank order
    "p7_domain_cap" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY substr(md5('cap:' || doc_id), 1, 8), doc_id) <= 30""".stripMargin,

    // the 100 smallest draws — selection is order-insensitive (set compare)
    "p8_fixed_sample" ->
      """SELECT doc_id, lang FROM documents
        |ORDER BY substr(md5('fixed:' || doc_id), 1, 8), doc_id LIMIT 100""".stripMargin,

    // the same five canonicalization rules applied in SQL: fragment strip,
    // scheme/host lowercase, default-port drop, trailing-slash trim,
    // tracking-param removal + byte-wise param sort
    "t24_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
        |    'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.com' ||
        |    (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) ||
        |    '/Path/' || CAST(doc_id % 5 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
        |    '?utm_source=feed&b=' || CAST(doc_id % 4 AS VARCHAR) || '&a=1' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '&fbclid=xyz' ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nofrag FROM u),
        |s2 AS (SELECT doc_id, url,
        |  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM s1),
        |s3 AS (SELECT doc_id, url, scheme, rest,
        |  regexp_extract(rest, '^([^/?]*)', 1) AS rawauth FROM s2),
        |s3b AS (SELECT doc_id, url, scheme, rest, rawauth,
        |  regexp_extract(rawauth, '^([^@]*@)', 1) AS userpart FROM s3),
        |s3c AS (SELECT doc_id, url, scheme, rest, rawauth, userpart,
        |  lower(substr(rawauth, length(userpart) + 1)) AS hostport FROM s3b),
        |s4 AS (SELECT doc_id, url, scheme, userpart,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |       ELSE hostport END AS host,
        |  substr(rest, length(rawauth) + 1) AS pathquery FROM s3c),
        |s5 AS (SELECT doc_id, url, scheme, userpart, host, pathquery,
        |  regexp_extract(pathquery, '^([^?]*)', 1) AS rawpath FROM s4),
        |s6 AS (SELECT doc_id, url, scheme, userpart, host,
        |  regexp_replace(rawpath, '/+$', '') AS path,
        |  list_sort(list_filter(string_split(substr(pathquery, length(rawpath) + 2), '&'),
        |    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)='))) AS params
        |  FROM s5)
        |SELECT doc_id, url,
        |  scheme || '://' || userpart || host || path ||
        |  CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS canon_url
        |FROM s6""".stripMargin,

    // line structure injection mirrors the Spark query: 10-token body
    // lines + boilerplate appended to every 2nd/3rd doc; counting keys on
    // md5(line) exactly as Dedup.dropBoilerplateLines does
    "t11_line_dedup" ->
      s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |lined AS (SELECT doc_id,
         |  array_to_string(list_transform(
         |    range(1, greatest(CAST(ceil(len(toks) / 10.0) AS INT), 1) + 1),
         |    i -> array_to_string(toks[(i - 1) * 10 + 1:(i - 1) * 10 + 10], ' ')), chr(10))
         |  || CASE WHEN doc_id % 2 = 0
         |          THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END
         |  || CASE WHEN doc_id % 3 = 0
         |          THEN chr(10) || 'all rights reserved example corp' ELSE '' END AS text
         |  FROM base),
         |lines AS (
         |  SELECT doc_id, ord, l[ord] AS line
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM lined),
         |       unnest(range(1, len(l) + 1)) AS u(ord)),
         |counts AS (SELECT md5(line) AS lh, count(*) AS n FROM lines GROUP BY 1)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
         |  CAST(sum(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_lines,
         |  md5(coalesce(string_agg(CASE WHEN n < 5 THEN line END, chr(10) ORDER BY ord), ''))
         |    AS clean_md5
         |FROM lines JOIN counts ON md5(line) = counts.lh
         |GROUP BY doc_id""".stripMargin,

    // chr(769/776/778) = combining acute / diaeresis / ring above — the
    // same decomposed sequences the Spark query injects
    "t12_nfc" ->
      """WITH injected AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 4 = 0
        |          THEN ' cafe' || chr(769) || ' visit' ELSE '' END
        |  || CASE WHEN doc_id % 6 = 0
        |          THEN ' u' || chr(776) || 'ber angstro' || chr(778) || 'm' ELSE '' END AS text
        |FROM documents)
        |SELECT doc_id, text != nfc_normalize(text) AS changed,
        |       md5(nfc_normalize(text)) AS nfc_md5
        |FROM injected""".stripMargin,

    "t13_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term, tf * 1000000 // df AS score_micro,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY tf * 1000000 // df DESC, term ASC) AS rank
         |  FROM tf JOIN dfreq USING (term))
         |SELECT doc_id, term, CAST(rank AS BIGINT) AS rank, score_micro
         |FROM scored WHERE rank <= 3""".stripMargin,

    // metric columns are computed (rounded) in a CTE so the keep verdict
    // provably compares the same rounded values the output reports
    "t14_gopher" -> {
      val inj = s"""inj AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 6 = 0 THEN ' # # # # # # # #' ELSE '' END AS text
         |FROM documents)""".stripMargin
      s"""WITH $inj,
         |t AS (SELECT doc_id, text, $toksSql AS toks,
         |  len(replace($normSql, ' ', '')) AS n_nospace FROM inj),
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  round(n_nospace / CAST(len(toks) AS DOUBLE), 4) AS mean_word_len,
         |  round((len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')))
         |        / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
         |  round(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
         |        / CAST(len(toks) AS DOUBLE), 6) AS alpha_frac,
         |  CAST(len(list_filter(toks, w -> w IN ('the','a','of','and','to','is','in'))) AS BIGINT) AS stop_hits
         |FROM t)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
         |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
         |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
         |FROM m""".stripMargin
    },

    // line structure + injections mirror the Spark query exactly; the
    // C4 keep-rule is the same lambda over split lines
    "t15_c4_clean" ->
      s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |lined AS (SELECT doc_id,
         |  array_to_string(list_transform(
         |    range(1, greatest(CAST(ceil(len(toks) / 10.0) AS INT), 1) + 1),
         |    i -> array_to_string(toks[(i - 1) * 10 + 1:(i - 1) * 10 + 10], ' ')
         |         || CASE WHEN (doc_id + i) % 2 = 0 THEN '.' ELSE '' END), chr(10))
         |  || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'if (x) { return y; }' ELSE '' END
         |  || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'click here' ELSE '' END AS text
         |  FROM base),
         |cleaned AS (SELECT doc_id,
         |  list_filter(string_split(text, chr(10)), l ->
         |    regexp_matches(l, '[.!?]${"$"}') AND len(string_split(l, ' ')) >= 5
         |    AND NOT contains(l, 'lorem ipsum') AND NOT contains(l, '{')) AS kept,
         |  len(string_split(text, chr(10))) AS n_lines
         |  FROM lined)
         |SELECT doc_id, CAST(len(kept) AS BIGINT) AS kept_lines,
         |  CAST(n_lines - len(kept) AS BIGINT) AS dropped_lines,
         |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
         |FROM cleaned""".stripMargin,

    // same ppm integer arithmetic: cap = min(n*1e6 // w), rate = w*cap // n
    "p4_domain_mix" ->
      s"""WITH tok AS (SELECT source, len($toksSql) AS n FROM documents),
         |agg AS (SELECT source AS domain, CAST(sum(n) AS BIGINT) AS n_tokens
         |        FROM tok GROUP BY 1),
         |w AS (SELECT domain, n_tokens,
         |  CAST(CASE domain WHEN 'src0' THEN 200000 WHEN 'src1' THEN 100000
         |       ELSE 30000 END AS BIGINT) AS weight_ppm FROM agg),
         |cap AS (SELECT min(n_tokens * 1000000 // weight_ppm) AS c FROM w
         |        WHERE weight_ppm > 0)
         |SELECT domain, n_tokens, weight_ppm,
         |  CAST(least(1000000, weight_ppm * cap.c // n_tokens) AS BIGINT) AS rate_ppm,
         |  CAST(n_tokens * least(1000000, weight_ppm * cap.c // n_tokens) // 1000000 AS BIGINT)
         |    AS take_tokens
         |FROM w, cap""".stripMargin,

    "p9_temperature" ->
      s"""WITH tok AS (SELECT source, len($toksSql) AS n FROM documents),
         |agg AS (SELECT source AS domain, CAST(sum(n) AS BIGINT) AS n_tokens
         |        FROM tok GROUP BY 1),
         |sh AS (SELECT domain, n_tokens,
         |         n_tokens * 1000000 // (SELECT sum(n_tokens) FROM agg) AS share_ppm
         |       FROM agg),
         |w AS (SELECT *, CAST(floor(sqrt(share_ppm * 1000000)) AS BIGINT) AS wr FROM sh)
         |SELECT domain, n_tokens, CAST(share_ppm AS BIGINT) AS share_ppm,
         |  CAST(wr * 1000000 // (SELECT sum(wr) FROM w) AS BIGINT) AS weight_ppm
         |FROM w""".stripMargin,

    // the window-hash count mirrors duplicatedNgramStats: md5 per window,
    // a count window over the hash, then the per-doc aggregate
    "t16_substring_dup" ->
      s"""WITH $dupInjSql,
         |base AS (SELECT doc_id, $toksSql AS toks FROM inj),
         |g AS (SELECT doc_id, md5(w) AS gh FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) < 8 THEN []
         |    ELSE list_transform(range(1, len(toks) - 7 + 1),
         |           i -> array_to_string(toks[i:i+7], ' ')) END) AS w
         |  FROM base)),
         |tagged AS (SELECT doc_id, count(*) OVER (PARTITION BY gh) AS cnt FROM g),
         |stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
         |  FROM tagged GROUP BY 1)
         |SELECT b.doc_id,
         |  coalesce(n_grams, 0) AS n_grams,
         |  coalesce(dup_grams, 0) AS dup_grams,
         |  CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
         |       ELSE round(dup_grams / CAST(n_grams AS DOUBLE), 6) END AS dup_frac
         |FROM (SELECT doc_id FROM base) b LEFT JOIN stats USING (doc_id)""".stripMargin,

    // excision mirror: 1-based token index j dies if a duplicated window
    // start d (1-based) satisfies j BETWEEN d AND d+7 — same set as the
    // Spark side's 0-based arithmetic
    "t17_substring_excise" ->
      s"""WITH $dupInjSql,
         |base AS (SELECT doc_id, $toksSql AS toks FROM inj),
         |g AS (SELECT doc_id, p, md5(w) AS gh FROM (
         |  SELECT doc_id, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS p,
         |    unnest(CASE WHEN len(toks) < 8 THEN []
         |      ELSE list_transform(range(1, len(toks) - 7 + 1),
         |             i -> array_to_string(toks[i:i+7], ' ')) END) AS w
         |  FROM base)),
         |tagged AS (SELECT doc_id, p, count(*) OVER (PARTITION BY gh) AS cnt FROM g),
         |dups AS (SELECT doc_id, list(p) AS dp FROM tagged WHERE cnt >= 2 GROUP BY 1),
         |cut AS (SELECT b.doc_id, toks,
         |  list_filter(list_transform(range(1, len(toks) + 1),
         |    j -> CASE WHEN len(list_filter(coalesce(dp, []),
         |                  d -> j >= d AND j <= d + 7)) = 0
         |         THEN toks[j] END), x -> x IS NOT NULL) AS kept
         |  FROM base b LEFT JOIN dups ON b.doc_id = dups.doc_id)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
         |FROM cut""".stripMargin,

    // the oracle rebuilds the identical sketch (same md5 cells) and the
    // identical min-over-rows estimates
    "t18_cms" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
         |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt FROM toks
         |        GROUP BY 1 ORDER BY true_cnt DESC, tok ASC LIMIT 10),
         |cells AS (SELECT tok, r, substr(md5(r || ':' || tok), 1, 3) AS cell
         |          FROM toks, unnest([0, 1, 2, 3]) AS u(r)),
         |sk AS (SELECT r, cell, count(*) AS cnt FROM cells GROUP BY 1, 2),
         |kc AS (SELECT t.tok, u.r, substr(md5(u.r || ':' || t.tok), 1, 3) AS cell
         |       FROM top t, unnest([0, 1, 2, 3]) AS u(r)),
         |est AS (SELECT kc.tok, min(coalesce(sk.cnt, 0)) AS e
         |        FROM kc LEFT JOIN sk ON sk.r = kc.r AND sk.cell = kc.cell
         |        GROUP BY 1)
         |SELECT top.tok, true_cnt, CAST(e AS BIGINT) AS cms_est
         |FROM top JOIN est ON est.tok = top.tok""".stripMargin,

    // the oracle rebuilds the identical registers (md5 prefix -> max of
    // 1 + leading-zero bits of the 60-bit hex tail) and the identical
    // floor-division estimate
    "t19_hll" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
         |rr AS (SELECT substr(md5(tok), 1, 2) AS reg,
         |  ltrim(substr(md5(tok), 3, 15), '0') AS st FROM toks),
         |rho AS (SELECT reg, CASE WHEN len(st) = 0 THEN 61
         |  ELSE (15 - len(st)) * 4 + 1 +
         |    CASE WHEN substr(st, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
         |         WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
         |         WHEN substr(st, 1, 1) IN ('2','3') THEN 2 ELSE 3 END END AS rho
         |  FROM rr),
         |sk AS (SELECT reg, max(rho) AS rho FROM rho GROUP BY 1),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS used_regs,
         |  CAST(sum(1::BIGINT << CAST(32 - least(rho, 32) AS INT)) AS BIGINT) AS s
         |  FROM sk),
         |d AS (SELECT CAST(256 AS BIGINT) AS m, used_regs,
         |  s + (256 - used_regs) * 4294967296 AS denom_scaled FROM agg)
         |SELECT m, used_regs, denom_scaled,
         |  (${graft.ops.Sketch.hllAlphaE6(2)} * (281474976710656 // denom_scaled)) // 1000000
         |    AS hll_est,
         |  (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks) AS true_distinct
         |FROM d""".stripMargin,

    // the oracle computes the position the lazy way — one global
    // row_number over (rn, lang) — which the two-phase arithmetic must
    // reproduce exactly
    "p6_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, lang, substr(md5('interleave:' || doc_id), 1, 8) AS draw
        |  FROM documents),
        |rn AS (SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS BIGINT) AS rn
        |  FROM r)
        |SELECT doc_id, lang, rn,
        |  CAST(row_number() OVER (ORDER BY rn, lang) AS BIGINT) AS position
        |FROM rn""".stripMargin,

    "t21_truncate" ->
      s"""SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(least(len(toks), 32) AS BIGINT) AS n_kept,
         |  md5(coalesce(array_to_string(toks[1:32], ' '), '')) AS trunc_md5
         |FROM (SELECT doc_id, $toksSql AS toks FROM documents)""".stripMargin,

    // the final LEFT JOIN from documents keeps null-text docs in the
    // report (n_tokens 0, null ppm) exactly as the Spark side's
    // explode_outer contract does
    "mv1_refresh" ->
      """WITH final_base AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(round(s_acctbal * 100, 0) AS BIGINT) +
        |      CASE WHEN s_suppkey % 7 = 1 THEN 11 ELSE 0 END AS bal_cents
        |  FROM supplier
        |  WHERE s_suppkey % 5 <> 0 OR s_suppkey % 7 = 1)
        |SELECT s_nationkey,
        |       CAST(count(*) AS BIGINT) AS mv_count,
        |       CAST(sum(bal_cents) AS BIGINT) AS bal_sum
        |FROM final_base GROUP BY 1""".stripMargin,

    // the violating batch is fully rejected, so rows_after counts only
    // the clean split; the report mirrors ANSI CHECK (NULL passes: the
    // %4=3 null-balance rows are not bal_nonneg violations) plus the one
    // seeded violator row
    "v1_constraints" ->
      """WITH rows0 AS (
        |  SELECT s_suppkey, s_name,
        |         CAST(round(s_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |  FROM supplier),
        |dirty AS (
        |  SELECT s_suppkey,
        |         CASE WHEN s_suppkey % 8 = 3 THEN NULL ELSE s_name END AS s_name,
        |         CASE WHEN s_suppkey % 4 = 3 THEN NULL ELSE bal_cents END AS bal_cents
        |  FROM rows0 WHERE bal_cents < 0 OR s_suppkey % 4 = 3
        |  UNION ALL
        |  SELECT 999999, 'seeded-violator', -1),
        |rep AS (
        |  SELECT 'bal_nonneg' AS check_name,
        |         CAST(sum(CASE WHEN bal_cents < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM dirty
        |  UNION ALL
        |  SELECT 's_name_not_null',
        |         CAST(sum(CASE WHEN s_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM dirty),
        |cnt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS rows_after
        |  FROM rows0 WHERE bal_cents >= 0 AND s_suppkey % 4 <> 3)
        |SELECT check_name, n_violations, rows_after FROM rep CROSS JOIN cnt""".stripMargin,

    "q_wap" ->
      """WITH base AS (
        |  SELECT s_suppkey, s_name, s_nationkey FROM supplier),
        |final AS (
        |  SELECT s_suppkey,
        |         CASE WHEN s_suppkey % 4 = 0 THEN 'W-' || s_name ELSE s_name END AS s_name,
        |         s_nationkey
        |  FROM base WHERE s_suppkey % 6 <> 0)
        |SELECT f.*,
        |       (SELECT CAST(count(*) AS BIGINT) FROM base) AS pre_publish_rows
        |FROM final f""".stripMargin,

    "q_rest_loop" ->
      """WITH cut AS (SELECT CAST(floor(max(s_suppkey) / 2) AS BIGINT) AS c FROM supplier)
        |SELECT s_suppkey, s_name FROM supplier, cut
        |WHERE s_suppkey % 9 <> 0 AND s_suppkey % 7 <> 2 AND s_suppkey <= c
        |UNION ALL
        |SELECT s_suppkey + 1000000 AS s_suppkey, s_name FROM supplier
        |WHERE s_suppkey % 5 = 0""".stripMargin,

    "q_rest_replace" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey % 9 <> 0 AND s_suppkey % 7 <> 3""".stripMargin,

    "q_plan_under_commit" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey % 11 <> 0 AND s_suppkey % 13 <> 1 AND s_suppkey % 17 <> 2"""
        .stripMargin,

    "q_view_sql" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS suppliers,
        |       CAST(sum(s_suppkey) AS BIGINT) AS key_sum
        |FROM supplier WHERE s_suppkey % 3 <> 0 GROUP BY s_nationkey""".stripMargin,

    "q_rest_create" ->
      "SELECT n_nationkey, n_name FROM nation",

    "q_ndv_stats" ->
      """SELECT 'n_name' AS col_name, CAST(count(DISTINCT n_name) AS BIGINT) AS ndv FROM nation
        |UNION ALL
        |SELECT 'n_nationkey', CAST(count(DISTINCT n_nationkey) AS BIGINT) FROM nation
        |UNION ALL
        |SELECT 'n_regionkey', CAST(count(DISTINCT n_regionkey) AS BIGINT) FROM nation""".stripMargin,

    "q_theta_sql" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_cust,
        |       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status
        |FROM orders""".stripMargin,

    "q_v3_attach" ->
      "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey % 7 <> 0",

    "q_meta_partitions" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS rows
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_wap_sql" ->
      """SELECT u.s_suppkey, u.s_name,
        |       (SELECT CAST(count(*) AS BIGINT) FROM supplier) AS pre_publish_rows
        |FROM (
        |  SELECT s_suppkey, s_name FROM supplier
        |  UNION ALL
        |  SELECT s_suppkey + 1000000, s_name FROM supplier WHERE s_suppkey % 3 = 0
        |) u""".stripMargin,

    // 8-bit interleave of (s_nationkey, s_suppkey % 256): bit i of column
    // j -> key bit i*2+j, unrolled as 16 shift/mask terms
    "z1_zorder" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((s_nationkey >> $i) & 1) << ${2 * i})",
        s"((((s_suppkey % 256) >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"SELECT s_suppkey, CAST($terms AS BIGINT) AS zval FROM supplier"
    },

    "t38_winnow_decontam" ->
      s"""WITH tsrc AS (SELECT row_number() OVER () AS doc_id,
         |  substr(text, 11, 120) AS text FROM documents WHERE doc_id % 25 = 0),
         |csrc AS (SELECT doc_id, text FROM documents),
         |${winnowFpeSql("tsrc", "t_", 20)},
         |${winnowFpeSql("csrc", "c_", 20)},
         |th AS (SELECT DISTINCT fh FROM t_fpe)
         |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM c_fpe c JOIN th ON c.fh = th.fh
         |GROUP BY 1 HAVING count(*) >= 4""".stripMargin,

    "p11_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |w AS (SELECT doc_id, toks,
         |  1 + CAST(ceil(greatest(n - 64, 0) / 48.0) AS INT) AS nw FROM n),
         |c AS (SELECT doc_id, toks,
         |  unnest(range(0, nw)) AS j FROM w)
         |SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
         |  CAST(len(toks[CAST(j * 48 + 1 AS INT):CAST(j * 48 + 64 AS INT)]) AS BIGINT)
         |    AS n_tokens,
         |  array_to_string(toks[CAST(j * 48 + 1 AS INT):CAST(j * 48 + 64 AS INT)], ' ')
         |    AS chunk_text
         |FROM c""".stripMargin,

    "d13_winnow_pairs" ->
      s"""WITH $corpusSql,
         |${winnowFpeSql("corpus", "", 12)},
         |sizes AS (SELECT doc_id, count(*) AS n FROM fpe GROUP BY 1),
         |capped AS (
         |  SELECT f.* FROM fpe f
         |  JOIN (SELECT fh, count(*) AS c FROM fpe GROUP BY 1) z ON f.fh = z.fh
         |  WHERE z.c <= 64),
         |shared AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
         |  FROM capped a JOIN capped b ON a.fh = b.fh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2,
         |  CAST(1000000 * c // least(s1.n, s2.n) AS BIGINT) AS overlap_ppm
         |FROM shared
         |JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
         |WHERE 1000000 * c // least(s1.n, s2.n) >= 500000""".stripMargin,

    "t37_winnow" ->
      s"""WITH ${winnowFpeSql("documents", "", 8)}
         |SELECT doc_id, CAST(greatest(m, 0) AS BIGINT) AS n_grams,
         |  CAST(len(ps) AS BIGINT) AS n_selected,
         |  CAST(coalesce(list_sum(ps), 0) AS BIGINT) AS pos_sum
         |FROM sel""".stripMargin,

    "t36_edit_distance" ->
      """SELECT s_suppkey, CAST(levenshtein(s_name,
        |  CASE CAST(s_suppkey % 3 AS INT)
        |    WHEN 0 THEN substr(s_name, 2)
        |    WHEN 1 THEN s_name || 'xy'
        |    ELSE reverse(s_name) END) AS BIGINT) AS dist
        |FROM supplier""".stripMargin,

    "g3_kcore" ->
      s"""WITH e0 AS (
         |  SELECT least(u, v) AS u, greatest(u, v) AS v
         |  FROM (VALUES $kCoreEdgesSql) t(u, v) GROUP BY 1, 2),
         |${kCorePeelRoundSql("e0", "e1", 2)},
         |${kCorePeelRoundSql("e1", "e2", 2)},
         |${kCorePeelRoundSql("e2", "e3", 2)},
         |${kCorePeelRoundSql("e3", "e4", 2)},
         |${kCorePeelRoundSql("e4", "e5", 2)}
         |SELECT CAST(node AS VARCHAR) AS node, CAST(count(*) AS BIGINT) AS deg
         |FROM (SELECT u AS node FROM e5 UNION ALL SELECT v FROM e5) t
         |GROUP BY 1""".stripMargin,

    "z2_hilbert" ->
      """WITH RECURSIVE pts AS (
        |  SELECT s_suppkey, CAST(s_suppkey % 256 AS BIGINT) AS x0,
        |         CAST((s_suppkey * 7 + s_nationkey) % 256 AS BIGINT) AS y0
        |  FROM supplier),
        |it AS (
        |  SELECT s_suppkey, 7 AS i, x0 AS x, y0 AS y, CAST(0 AS BIGINT) AS d FROM pts
        |  UNION ALL
        |  SELECT s_suppkey, i - 1,
        |    CASE WHEN (y & (1::BIGINT << i)) = 0 THEN
        |      CASE WHEN (x & (1::BIGINT << i)) != 0 THEN (1::BIGINT << i) - 1 - y ELSE y END
        |    ELSE x END,
        |    CASE WHEN (y & (1::BIGINT << i)) = 0 THEN
        |      CASE WHEN (x & (1::BIGINT << i)) != 0 THEN (1::BIGINT << i) - 1 - x ELSE x END
        |    ELSE y END,
        |    d + (1::BIGINT << i) * (1::BIGINT << i) *
        |      xor(3 * (CASE WHEN (x & (1::BIGINT << i)) != 0 THEN 1::BIGINT ELSE 0 END),
        |          CASE WHEN (y & (1::BIGINT << i)) != 0 THEN 1::BIGINT ELSE 0 END)
        |  FROM it WHERE i >= 0)
        |SELECT s_suppkey, d AS hval FROM it WHERE i = -1""".stripMargin,

    "h1_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT tok FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |  WHERE tok <> ''),
         |n AS (SELECT count(*) AS total FROM t)
         |SELECT tok AS item, CAST(count(*) AS BIGINT) AS cnt
         |FROM t CROSS JOIN n
         |GROUP BY tok, n.total
         |HAVING count(*) * 50 > n.total""".stripMargin,

    "g1_pagerank" -> {
      // one CTE per round, identical integer arithmetic to Graph.pageRank
      def round(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT n.node,
           |    (15 * p.base + 85 * (COALESCE(c.contrib, 0) + d.dang // p.n)) // 100 AS r
           |  FROM nodes n
           |  CROSS JOIN params p
           |  CROSS JOIN (SELECT COALESCE(sum(r), 0) AS dang FROM $prev
           |              WHERE node NOT IN (SELECT node FROM outdeg)) d
           |  LEFT JOIN (SELECT e.dst AS node, sum(pr.r // o.deg) AS contrib
           |             FROM e JOIN $prev pr ON pr.node = e.src
           |             JOIN outdeg o ON o.node = e.src
           |             GROUP BY 1) c ON c.node = n.node)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT 'd' || (doc_id % 23) AS src,
         |                  'd' || ((doc_id * 7 + 3) % 29) AS dst
         |  FROM documents),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |outdeg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |params AS (SELECT count(*) AS n, 1000000000000 // count(*) AS base FROM nodes),
         |r0 AS (SELECT node, (SELECT base FROM params) AS r FROM nodes),
         |${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")}
         |SELECT node, CAST(r AS BIGINT) AS rank_u12 FROM r3""".stripMargin
    },

    // canonical x<y<z triple join finds each triangle once; per-node
    // counts attribute it to all three corners
    "g2_triangles" ->
      """WITH e0 AS (SELECT 'd' || (doc_id % 17) AS a,
        |                   'd' || ((doc_id * 5 + 2) % 19) AS b FROM documents),
        |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        |        FROM e0 WHERE a <> b),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |        FROM und e1
        |        JOIN und e2 ON e2.u = e1.v
        |        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nodes AS (SELECT u AS node FROM und UNION SELECT v FROM und),
        |per AS (SELECT node, count(*) AS n_tri FROM (
        |          SELECT x AS node FROM tri
        |          UNION ALL SELECT y FROM tri
        |          UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT n.node, CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri
        |FROM nodes n LEFT JOIN per p USING (node)""".stripMargin,

    "c1_classifier" ->
      s"""WITH train AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lbl, text
         |  FROM documents WHERE doc_id % 3 <> 0),
         |ttoks AS (
         |  SELECT lbl, unnest($toksSql) AS tok FROM train),
         |w AS (
         |  SELECT substr(md5(tok), 1, 3) AS bucket,
         |         (1000000 * (sum(lbl) + 1)) // (count(*) + 2) AS w_ppm
         |  FROM ttoks WHERE tok <> '' GROUP BY 1),
         |prior AS (
         |  SELECT (1000000 * (sum(lbl) + 1)) // (count(*) + 2) AS prior_ppm
         |  FROM train),
         |test AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         |stoks AS (
         |  SELECT doc_id, substr(md5(tok), 1, 3) AS bucket
         |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM test)
         |  WHERE tok <> ''),
         |scored AS (
         |  SELECT doc_id,
         |         sum(COALESCE(w.w_ppm, p.prior_ppm)) // count(*) AS s_ppm
         |  FROM stoks LEFT JOIN w USING (bucket) CROSS JOIN prior p
         |  GROUP BY doc_id)
         |SELECT t.doc_id,
         |       CAST(COALESCE(sc.s_ppm, p.prior_ppm) AS BIGINT) AS score_ppm,
         |       CAST(COALESCE(sc.s_ppm, p.prior_ppm) >= 500000 AS INT) AS label
         |FROM test t LEFT JOIN scored sc USING (doc_id) CROSS JOIN prior p""".stripMargin,

    "t22_oov" ->
s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |vocab AS (
         |  SELECT tok FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
         |                   ORDER BY cnt DESC, tok ASC LIMIT 20)),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(n_tokens, 0) AS n_tokens, coalesce(n_oov, 0) AS n_oov,
         |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN NULL
         |       ELSE CAST((n_oov * 1000000) // n_tokens AS BIGINT) END AS oov_ppm
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,

    // identical clamped binning, identical ceil-target bin selection,
    // identical upper-edge micro arithmetic
    "t20_quantile" ->
      """WITH h AS (
        |  SELECT CAST(least(greatest(floor(o_totalprice / 2343.75), 0), 255) AS BIGINT)
        |    AS bin, count(*) AS cnt
        |  FROM orders GROUP BY 1),
        |c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |t AS (SELECT sum(cnt) AS total FROM h),
        |q AS (SELECT CAST(unnest([500000, 900000, 990000]) AS BIGINT) AS q_ppm),
        |tgt AS (SELECT q_ppm, (q_ppm * total + 999999) // 1000000 AS target FROM q, t),
        |sel AS (SELECT q_ppm, min(bin) AS bin
        |        FROM tgt JOIN c ON c.cum >= tgt.target GROUP BY 1)
        |SELECT q_ppm, bin,
        |  CAST(round((bin + 1) * 2343.75 * 1000000.0, 0) AS BIGINT) AS upper_e6
        |FROM sel""".stripMargin,

    // same per-group binning, cumulative targets, and upper-edge math
    "t23_group_quantile" ->
      """WITH h AS (
        |  SELECT lang,
        |    CAST(least(greatest(floor(n_chars / 15.625), 0), 127) AS BIGINT) AS bin,
        |    count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT lang, bin, sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum
        |      FROM h),
        |t AS (SELECT lang, sum(cnt) AS total FROM h GROUP BY 1),
        |q AS (SELECT CAST(unnest([500000, 900000]) AS BIGINT) AS q_ppm),
        |tgt AS (SELECT lang, q_ppm, (q_ppm * total + 999999) // 1000000 AS target
        |        FROM t, q),
        |sel AS (SELECT tgt.lang, q_ppm, min(bin) AS bin
        |        FROM tgt JOIN c ON c.lang = tgt.lang AND c.cum >= tgt.target
        |        GROUP BY 1, 2)
        |SELECT lang, q_ppm, bin,
        |  CAST(round((bin + 1) * 15.625 * 1000000.0, 0) AS BIGINT) AS upper_e6
        |FROM sel""".stripMargin,

    // the d2 pipeline with a batch column threaded through every stage,
    // then: per-batch components (recursive CTE) pick min-id keepers,
    // batch-1 keepers anti-join the capped index bands + exact verify
    "i2_incremental_minhash" -> {
      val hs = (0 until 4).map(x => s"md5('$x:' || gram) AS h$x").mkString(", ")
      val mhs = (0 until 16).map(j =>
        s"min(substr(h${j / 4}, ${(j % 4) * 8 + 1}, 8)) AS mh$j").mkString(", ")
      val bandSel = (0 until 4).map { bd =>
        val cols = (bd * 4 until (bd + 1) * 4).map(j => s"mh$j").mkString(" || ")
        s"SELECT b, id, $bd AS band, md5($cols) AS bh FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH all0 AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |all1 AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' extra' FROM all0 WHERE doc_id % 5 = 0),
         |bcorpus AS (
         |  SELECT 0 AS b, doc_id, text FROM all0
         |  UNION ALL SELECT 1, doc_id, text FROM all1),
         |grams AS (
         |  SELECT DISTINCT b, doc_id AS id, g AS gram FROM (
         |    SELECT b, doc_id, unnest(list_transform(
         |      range(1, greatest(len(toks) - 2, 1) + 1),
         |      i -> array_to_string(toks[i:i+2], ' '))) AS g
         |    FROM (SELECT b, doc_id, $toksSql AS toks FROM bcorpus))),
         |hashed AS (SELECT b, id, $hs FROM grams),
         |sig AS (SELECT b, id, $mhs FROM hashed GROUP BY b, id),
         |bands AS ($bandSel),
         |sizedw AS (
         |  SELECT x.* FROM bands x
         |  JOIN (SELECT b, band, bh, count(*) AS n FROM bands GROUP BY 1,2,3) z
         |    ON x.b = z.b AND x.band = z.band AND x.bh = z.bh
         |  WHERE z.n <= 100),
         |candw AS (
         |  SELECT DISTINCT a.b, a.id AS id1, c.id AS id2
         |  FROM sizedw a JOIN sizedw c
         |    ON a.b = c.b AND a.band = c.band AND a.bh = c.bh AND a.id < c.id),
         |sizes AS (SELECT b, id, count(*) AS n FROM grams GROUP BY 1, 2),
         |common AS (
         |  SELECT c.b, c.id1, c.id2, count(*) AS c
         |  FROM candw c
         |  JOIN grams g1 ON g1.b = c.b AND g1.id = c.id1
         |  JOIN grams g2 ON g2.b = c.b AND g2.id = c.id2 AND g2.gram = g1.gram
         |  GROUP BY 1, 2, 3),
         |pairsw AS (
         |  SELECT common.b, id1, id2 FROM common
         |  JOIN sizes s1 ON s1.b = common.b AND s1.id = id1
         |  JOIN sizes s2 ON s2.b = common.b AND s2.id = id2
         |  WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5),
         |edges AS (
         |  SELECT b, id1 AS src, id2 AS dst FROM pairsw
         |  UNION SELECT b, id2, id1 FROM pairsw),
         |reach AS (
         |  WITH RECURSIVE r(b, id, label) AS (
         |    SELECT b, src, src FROM edges
         |    UNION
         |    SELECT e.b, e.src, r.label FROM edges e JOIN r ON r.b = e.b AND e.dst = r.id)
         |  SELECT * FROM r),
         |dominated AS (
         |  SELECT b, id FROM (SELECT b, id, min(label) AS lbl FROM reach GROUP BY 1, 2)
         |  WHERE lbl < id),
         |keep0 AS (SELECT doc_id AS id FROM all0
         |          EXCEPT SELECT id FROM dominated WHERE b = 0),
         |keep1 AS (SELECT doc_id AS id FROM all1
         |          EXCEPT SELECT id FROM dominated WHERE b = 1),
         |idxb AS (SELECT band, bh, id AS old_id FROM bands
         |         WHERE b = 0 AND id IN (SELECT id FROM keep0)),
         |idxcap AS (
         |  SELECT i.* FROM idxb i
         |  JOIN (SELECT band, bh, count(*) AS n FROM idxb GROUP BY 1, 2) z
         |    ON i.band = z.band AND i.bh = z.bh
         |  WHERE z.n <= 100),
         |kb1 AS (SELECT band, bh, id FROM bands
         |        WHERE b = 1 AND id IN (SELECT id FROM keep1)),
         |candx AS (
         |  SELECT DISTINCT k.id, i.old_id FROM kb1 k
         |  JOIN idxcap i ON k.band = i.band AND k.bh = i.bh),
         |commonx AS (
         |  SELECT cx.id, cx.old_id, count(*) AS c
         |  FROM candx cx
         |  JOIN grams g1 ON g1.b = 1 AND g1.id = cx.id
         |  JOIN grams g2 ON g2.b = 0 AND g2.id = cx.old_id AND g2.gram = g1.gram
         |  GROUP BY 1, 2),
         |matched AS (
         |  SELECT DISTINCT commonx.id FROM commonx
         |  JOIN sizes s1 ON s1.b = 1 AND s1.id = commonx.id
         |  JOIN sizes s2 ON s2.b = 0 AND s2.id = commonx.old_id
         |  WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5),
         |final1 AS (SELECT id FROM keep1 EXCEPT SELECT id FROM matched)
         |SELECT CAST(0 AS BIGINT) AS batch_id, id AS doc_id FROM keep0
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), id FROM final1""".stripMargin
    },

    // same fingerprint, same min-id keeper rule, same anti join on the
    // prior batch's committed fingerprints
    "i1_incremental_exact" ->
      """WITH d AS (
        |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |b0 AS (SELECT doc_id, fp FROM d WHERE doc_id % 3 <> 0),
        |b1 AS (
        |  SELECT doc_id, fp FROM d WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, fp FROM b0 WHERE doc_id % 5 = 0),
        |k0 AS (SELECT fp, min(doc_id) AS doc_id FROM b0 GROUP BY 1),
        |k1 AS (SELECT fp, min(doc_id) AS doc_id FROM b1 GROUP BY 1),
        |k1n AS (SELECT k1.fp, k1.doc_id FROM k1 LEFT JOIN k0 USING (fp)
        |        WHERE k0.fp IS NULL)
        |SELECT CAST(0 AS BIGINT) AS batch_id, doc_id FROM k0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT) AS batch_id, doc_id FROM k1n""".stripMargin,

    // identical strip pipeline: block removal -> comment -> tags ->
    // entity decode (&amp; last) -> whitespace collapse. Control chars in
    // the whitespace class are spelled chr() so no engine-specific string
    // escaping is involved
    "t25_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><HEAD><title>T</title>' ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN '<script type="text/js">var x = 1 < 2;</script>' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN '<style>p { color: red }</style>' ELSE '' END ||
        |    '</HEAD><body><p>' || text ||
        |    '</p><!-- hidden' || chr(10) || 'comment -->' ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN '<b>bold &amp;lt; x</b> &quot;q&#39;s&quot; &nbsp;end' ELSE '' END ||
        |    '<br>tail</body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id,
        |  regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id,
        |  regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |    '&nbsp;', ' '), '&amp;', '&') AS t
        |  FROM s4)
        |SELECT doc_id,
        |  trim(regexp_replace(t, '[ ' || chr(9) || chr(13) || chr(10) || ']+', ' ', 'g'))
        |    AS clean_text
        |FROM s5""".stripMargin,

    // seed draw, cell argmax, subspace codes, 2-probe candidates, and
    // ADC rank all replayed relationally on the base table
    "s8_ann_index" ->
      """WITH ord AS (
        |  SELECT vec_id, embedding, substr(md5('annseed:' || vec_id), 1, 8) AS draw
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |seeds AS (
        |  SELECT CAST(row_number() OVER (ORDER BY draw, vec_id) - 1 AS BIGINT) AS cid,
        |         embedding AS cvec
        |  FROM (SELECT * FROM ord ORDER BY draw, vec_id LIMIT 8)),
        |cells AS (
        |  SELECT vec_id, cid AS cell_id FROM (
        |    SELECT e.vec_id, s.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_cosine_similarity(e.embedding::DOUBLE[], s.cvec::DOUBLE[]), 6) DESC,
        |        s.cid ASC) AS rn
        |    FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
        |sub AS (
        |  SELECT vec_id, j,
        |    list_transform(range(1, 17), i -> embedding[j * 16 + i]::DOUBLE) AS sv
        |  FROM embeddings, unnest([0, 1, 2, 3]) AS u(j)),
        |cbsub AS (
        |  SELECT cid, j,
        |    list_transform(range(1, 17), i -> cvec[j * 16 + i]::DOUBLE) AS cv
        |  FROM seeds, unnest([0, 1, 2, 3]) AS u(j)),
        |sc AS (
        |  SELECT vec_id, s.j, cid,
        |    CAST(round(list_sum(list_transform(range(1, 17),
        |      i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) * 1000000.0, 0) AS BIGINT) AS d
        |  FROM sub s JOIN cbsub c ON s.j = c.j),
        |mn AS (SELECT vec_id, j, min(d) AS md FROM sc GROUP BY 1, 2),
        |code AS (
        |  SELECT sc.vec_id, sc.j, CAST(min(cid) AS BIGINT) AS code
        |  FROM sc JOIN mn ON sc.vec_id = mn.vec_id AND sc.j = mn.j AND sc.d = mn.md
        |  GROUP BY 1, 2),
        |probes AS (
        |  SELECT vec_id AS query_id, cid AS cell_id FROM (
        |    SELECT e.vec_id, s.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_cosine_similarity(e.embedding::DOUBLE[], s.cvec::DOUBLE[]), 6) DESC,
        |        s.cid ASC) AS rn
        |    FROM embeddings e CROSS JOIN seeds s WHERE e.vec_id % 100 = 0) WHERE rn <= 2),
        |cand AS (
        |  SELECT p.query_id, c.vec_id AS neighbor_id
        |  FROM probes p JOIN cells c ON c.cell_id = p.cell_id),
        |adc AS (
        |  SELECT ca.query_id, ca.neighbor_id, CAST(sum(q.d) AS BIGINT) AS adc_e6
        |  FROM cand ca
        |  JOIN code co ON co.vec_id = ca.neighbor_id
        |  JOIN sc q ON q.vec_id = ca.query_id AND q.j = co.j AND q.cid = co.code
        |  WHERE ca.query_id <> ca.neighbor_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, rank, adc_e6 FROM (
        |  SELECT query_id, neighbor_id, adc_e6,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_e6 ASC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM adc)
        |WHERE rank <= 5""".stripMargin,

    // the WARC bodies are the documents' UTF-8 bytes, so length and md5
    // derive analytically (strlen counts bytes in DuckDB; md5 of VARCHAR
    // hashes its UTF-8 encoding — the exact bytes the container carried)
    // replay the dHash bit arithmetic from the pixel formula: bit y*8+x
    // set when the right neighbor is brighter; halves keep values inside
    // nonnegative int64
    "m6_image_dhash" ->
      """WITH grid AS (SELECT t1.range AS x, t2.range AS y
        |              FROM range(0, 8) t1, range(0, 8) t2),
        |px AS (SELECT d.doc_id, g.x, g.y,
        |         (17 * g.x + 31 * g.y + (d.doc_id % 7) * 40) % 256 AS p0,
        |         (17 * (g.x + 1) + 31 * g.y + (d.doc_id % 7) * 40) % 256 AS p1
        |       FROM documents d CROSS JOIN grid g),
        |h AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND y * 8 + x < 32
        |              THEN CAST(round(pow(2, y * 8 + x)) AS BIGINT) ELSE 0 END) AS BIGINT) AS dhash_lo,
        |        CAST(sum(CASE WHEN p1 > p0 AND y * 8 + x >= 32
        |              THEN CAST(round(pow(2, y * 8 + x - 32)) AS BIGINT) ELSE 0 END) AS BIGINT) AS dhash_hi
        |      FROM px GROUP BY 1)
        |SELECT doc_id, dhash_lo, dhash_hi,
        |  CAST(count(*) OVER (PARTITION BY dhash_lo, dhash_hi) AS BIGINT) AS n_same
        |FROM h""".stripMargin,

    "m5_warc" ->
      """SELECT doc_id,
        |       CAST(strlen(COALESCE(text, '')) AS BIGINT) AS content_length,
        |       md5(COALESCE(text, '')) AS body_md5
        |FROM documents""".stripMargin,

    // the lookup for 137 survives; 138 was tombstoned after the index
    // build, so the pruned MOR read must drop it
    "q_bloom_point" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer WHERE c_custkey = 137""".stripMargin,

    "q_convert_eq" ->
      """SELECT s_suppkey,
        |  CASE WHEN s_suppkey % 3 = 0 THEN upper(s_name) ELSE s_name END AS s_name
        |FROM supplier""".stripMargin,

    "q_dv" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey % 4 <> 0 AND s_suppkey % 4 <> 1""".stripMargin,

    "q_prune_scan" ->
      """WITH cut AS (SELECT CAST(floor(max(l_orderkey) / 3) AS BIGINT) AS c FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem, cut
        |WHERE l_returnflag = 'A' AND l_orderkey <= c
        |GROUP BY 1""".stripMargin,

    "q_truncate_prune" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
        |FROM part WHERE p_name LIKE 'red%'""".stripMargin,

    "q_meta_count" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM supplier",

    "q_meta_group" ->
      """SELECT s_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(s_suppkey) AS BIGINT) AS mn_key,
        |  CAST(max(s_suppkey) AS BIGINT) AS mx_key
        |FROM supplier GROUP BY 1""".stripMargin,

    "q_dpp_star" ->
      """SELECT n_name,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_7')
        |GROUP BY 1""".stripMargin,

    "q_cow_update" ->
      """SELECT s_suppkey,
        |  CASE WHEN s_suppkey % 3 = 0 THEN upper(s_name) ELSE s_name END AS s_name,
        |  CAST(round((s_acctbal +
        |    CASE WHEN s_suppkey % 3 = 0 THEN 1000.0 ELSE 0.0 END) * 100, 0) AS BIGINT)
        |    AS acctbal_cents
        |FROM supplier
        |WHERE s_suppkey % 7 <> 0 AND s_suppkey % 5 <> 0""".stripMargin,

    "d9_semantic_decontam" ->
      """WITH test AS (SELECT embedding FROM embeddings WHERE vec_id % 20 = 0),
        |hits AS (
        |  SELECT c.vec_id,
        |    round(list_cosine_similarity(c.embedding::DOUBLE[], t.embedding::DOUBLE[]), 6) AS cos
        |  FROM embeddings c CROSS JOIN test t)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits, max(cos) AS max_cos
        |FROM hits WHERE cos >= 0.9 GROUP BY 1""".stripMargin,

    // the oracle counts document frequency over the per-doc-DISTINCT
    // bigram relation (grouping by the raw bigram where Spark windows
    // over its md5 — same equivalence classes), then left-joins so
    // short/null docs report 0 bigrams and a NULL rate
    "t27_bigram_coherence" ->
      s"""WITH inj AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 2 = 0
         |         THEN ' zqx' || doc_id || ' wqj' || doc_id ELSE '' END AS text
         |  FROM documents),
         |base AS (SELECT doc_id, $toksSql AS toks FROM inj),
         |bg AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM base)),
         |dfreq AS (SELECT bg, count(*) AS df FROM bg GROUP BY 1),
         |per AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |               CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |        FROM bg b JOIN dfreq f USING (bg) GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       CAST(COALESCE(p.n_common, 0) AS BIGINT) AS n_common,
         |       CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN NULL
         |            ELSE p.n_common * 1000000 // p.n_bigrams END AS coherence_ppm
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,

    "t30_cards" ->
      """WITH inj AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' card 4111111111111111'
        |         WHEN doc_id % 4 = 1 THEN ' card 4111111111111112'
        |         WHEN doc_id % 4 = 2 THEN ' card 4012 8888 8888 1881'
        |         ELSE '' END AS text FROM documents),
        |c AS (SELECT doc_id,
        |        regexp_extract_all(text, '\b\d(?:[ -]?\d){12,18}\b') AS cands
        |      FROM inj),
        |d AS (SELECT doc_id, cands,
        |        list_transform(cands, x -> regexp_replace(x, '[^0-9]', '', 'g')) AS digs
        |      FROM c)
        |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
        |  CAST(len(list_filter(digs, dd ->
        |    list_sum(list_transform(range(1, len(dd) + 1), i ->
        |      CASE WHEN (len(dd) - i) % 2 = 1
        |           THEN CASE WHEN (ascii(substr(dd, i, 1)) - 48) * 2 > 9
        |                THEN (ascii(substr(dd, i, 1)) - 48) * 2 - 9
        |                ELSE (ascii(substr(dd, i, 1)) - 48) * 2 END
        |           ELSE ascii(substr(dd, i, 1)) - 48 END)) % 10 = 0)) AS BIGINT) AS n_valid
        |FROM d""".stripMargin,

    "t33_collocations" ->
      s"""WITH inj AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' zqalpha zqbeta' ELSE '' END AS text
         |  FROM documents),
         |t AS (SELECT $toksSql AS toks FROM inj),
         |uni AS (SELECT unnest(toks) AS w FROM t),
         |uc AS (SELECT w, count(*) AS n FROM uni GROUP BY 1),
         |bgr AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM (
         |    SELECT toks, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i FROM t)),
         |pc AS (SELECT w1, w2, count(*) AS n12 FROM bgr GROUP BY 1, 2
         |       HAVING count(*) >= 5),
         |tot AS (SELECT (SELECT CAST(sum(n) AS HUGEINT) FROM uc) AS nn,
         |               (SELECT CAST(count(*) AS HUGEINT) FROM bgr) AS bb)
         |SELECT pc.w1, pc.w2, CAST(n12 AS BIGINT) AS n12,
         |  CAST(CAST(1000000 AS HUGEINT) * n12 * nn * nn //
         |       (bb * u1.n * u2.n) AS BIGINT) AS lift_e6
         |FROM pc
         |JOIN uc u1 ON u1.w = pc.w1
         |JOIN uc u2 ON u2.w = pc.w2
         |CROSS JOIN tot""".stripMargin,

    "t34_char_diversity" ->
      """WITH inj AS (SELECT doc_id,
        |  text || CASE WHEN doc_id % 7 = 0
        |    THEN repeat('a', CAST((doc_id % 30) * 20 AS INT)) ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id, substr(text, 1, 512) AS pre FROM inj WHERE len(text) > 0),
        |c AS (SELECT doc_id, CAST(len(pre) AS BIGINT) AS n,
        |  string_split(pre, '') AS chars FROM p),
        |f AS (SELECT doc_id, n, chars,
        |  list_transform(list_distinct(chars),
        |    ch -> CAST(len(list_filter(chars, x -> x = ch)) AS BIGINT)) AS cnts
        |  FROM c)
        |SELECT doc_id, n AS n_chars, CAST(len(cnts) AS BIGINT) AS distinct_chars,
        |  CAST(list_sum(list_transform(cnts, x -> x * x)) * 1000000 // (n * n) AS BIGINT)
        |    AS collision_ppm,
        |  CAST(list_max(cnts) * 1000000 // n AS BIGINT) AS mode_ppm
        |FROM f""".stripMargin,

    "p10_weighted_sample" ->
      """WITH w AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents),
        |d AS (SELECT doc_id, n_chars,
        |  CAST(list_reduce(list_prepend('0',
        |      string_split(substr(md5('wsample:' || doc_id), 1, 8), '')),
        |    (a, c) -> CAST(CAST(a AS BIGINT) * 16 +
        |      strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS draw
        |  FROM documents)
        |SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS weight
        |FROM d, w WHERE d.draw * w.tw < 200 * d.n_chars * 4294967296""".stripMargin,

    "t32_iban" ->
      """WITH inj AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' pay DE89 3704 0044 0532 0130 00 thanks'
        |         WHEN doc_id % 4 = 1 THEN ' pay DE89 3704 0044 0532 0130 01 thanks'
        |         WHEN doc_id % 4 = 2 THEN ' acct GB82WEST12345698765432 ok'
        |         ELSE '' END AS text FROM documents),
        |c AS (SELECT doc_id, regexp_extract_all(text,
        |        '\b[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]{4}){2,7}(?: ?[A-Z0-9]{1,3})?\b') AS cands
        |      FROM inj),
        |d AS (SELECT doc_id, cands,
        |        list_transform(cands, x -> replace(x, ' ', '')) AS strs
        |      FROM c)
        |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
        |  CAST(len(list_filter(strs, s -> len(s) BETWEEN 15 AND 34 AND
        |    CAST(list_reduce(['0'] || string_split(array_to_string(
        |      list_transform(string_split(substr(s, 5, len(s) - 4) || substr(s, 1, 4), ''),
        |        ch -> CASE WHEN ch BETWEEN '0' AND '9' THEN ch
        |                   ELSE CAST(ascii(ch) - 55 AS VARCHAR) END), ''), ''),
        |      (a, ch) -> CAST((CAST(a AS BIGINT) * 10 + CAST(ch AS BIGINT)) % 97 AS VARCHAR))
        |      AS BIGINT) = 1)) AS BIGINT) AS n_valid
        |FROM d""".stripMargin,

    "t29_script" -> {
      val cls = graft.ops.TextAnalysis.ScriptRanges.toMap
      def n(k: String) =
        s"CAST(len(regexp_extract_all(text, '[${cls(k)}]')) AS BIGINT)"
      s"""WITH inj AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 0 THEN repeat('中', CAST((doc_id % 40) * 30 AS INT))
         |         WHEN doc_id % 5 = 1 THEN repeat('ж', CAST((doc_id % 60) * 20 AS INT))
         |         WHEN doc_id % 5 = 2 THEN repeat('ش', CAST((doc_id % 50) * 25 AS INT))
         |         ELSE '' END AS text FROM documents),
         |c AS (SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
         |  ${n("latin")} AS n_latin, ${n("digit")} AS n_digit,
         |  ${n("cjk")} AS n_cjk, ${n("cyrillic")} AS n_cyrillic,
         |  ${n("arabic")} AS n_arabic
         |  FROM inj)
         |SELECT doc_id, n_chars, n_latin, n_digit, n_cjk, n_cyrillic, n_arabic,
         |  n_chars - n_latin - n_digit - n_cjk - n_cyrillic - n_arabic AS n_other,
         |  CASE WHEN greatest(n_latin, n_digit, n_cjk, n_cyrillic, n_arabic) = 0 THEN 'none'
         |       WHEN n_arabic = greatest(n_latin, n_digit, n_cjk, n_cyrillic, n_arabic) THEN 'arabic'
         |       WHEN n_cjk = greatest(n_latin, n_digit, n_cjk, n_cyrillic, n_arabic) THEN 'cjk'
         |       WHEN n_cyrillic = greatest(n_latin, n_digit, n_cjk, n_cyrillic, n_arabic) THEN 'cyrillic'
         |       WHEN n_digit = greatest(n_latin, n_digit, n_cjk, n_cyrillic, n_arabic) THEN 'digit'
         |       ELSE 'latin' END AS dominant
         |FROM c""".stripMargin
    },

    "t28_lm_score" ->
      s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM base)),
         |tr AS (SELECT * FROM bg WHERE doc_id % 3 <> 0),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tr GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM tr GROUP BY 1),
         |v AS (SELECT count(DISTINCT tok) AS v FROM
         |        (SELECT unnest(toks) AS tok FROM base WHERE doc_id % 3 <> 0)),
         |sc AS (SELECT b.doc_id,
         |         (COALESCE(c12.c12, 0) + 1) * 1000000 // (COALESCE(c1.c1, 0) + v.v) AS p_micro
         |       FROM bg b LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v
         |       WHERE b.doc_id % 3 = 0),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |               CAST(sum(p_micro) AS BIGINT) AS sum_p_micro
         |        FROM sc GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       p.sum_p_micro,
         |       CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN NULL
         |            ELSE p.sum_p_micro // p.n_bigrams END AS avg_p_micro
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
         |LEFT JOIN per p USING (doc_id)""".stripMargin,

    "b1_bm25" -> bm25Sql(Seq("spark", "window", "merge", "customer"), 15),

    "b2_text_index" -> bm25Sql(Seq("stream", "join", "batch"), 12),

    // per-term position lists (the parallel unnests zip elementwise),
    // then the consecutive-position chain count
    "b3_phrase_search" ->
      s"""WITH inj AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 20 = 0
         |         THEN ' zqphrase yqmarker zqphrase yqmarker zqphrase yqmarker'
         |         WHEN doc_id % 10 = 0 THEN ' zqphrase yqmarker'
         |         ELSE '' END AS text
         |  FROM documents),
         |base AS (SELECT doc_id, $toksSql AS toks FROM inj),
         |toks AS (SELECT doc_id, unnest(toks) AS term,
         |                unnest(range(1, len(toks) + 1)) AS pos FROM base),
         |p1 AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM toks
         |       WHERE term = 'zqphrase' GROUP BY 1),
         |p2 AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM toks
         |       WHERE term = 'yqmarker' GROUP BY 1),
         |m AS (SELECT p1.doc_id,
         |        CAST(len(list_filter(p1.ps, p -> list_contains(p2.ps, p + 1))) AS BIGINT)
         |          AS n_matches
         |      FROM p1 JOIN p2 USING (doc_id))
         |SELECT doc_id, n_matches FROM m WHERE n_matches > 0
         |ORDER BY n_matches DESC, doc_id ASC LIMIT 20""".stripMargin,

    // d6's recursive-CTE components + the keeper rank: longest member
    // (NULLS LAST ties Spark's desc_nulls_last), ties -> lowest id;
    // survivors = corpus minus rank>1 cluster members
    "d8_keep_best" ->
      s"""WITH ${corpusSql.replace("corpus AS (", "corpus0 AS (")},
         |corpus AS (SELECT * FROM corpus0 WHERE doc_id % 100000 < 500),
         |$gramsSql,
         |sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
         |common AS (
         |  SELECT a.id AS id1, b.id AS id2, count(*) AS c
         |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
         |  WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION SELECT id2, id1 FROM pairs),
         |reach AS (
         |  WITH RECURSIVE r(id, label) AS (
         |    SELECT src, src FROM edges
         |    UNION
         |    SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.id)
         |  SELECT * FROM r),
         |clusters AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
         |scoredocs AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks FROM corpus),
         |ranked AS (
         |  SELECT c.id, row_number() OVER (PARTITION BY c.cluster_id
         |    ORDER BY d.n_toks DESC NULLS LAST, c.id ASC) AS rk
         |  FROM clusters c JOIN scoredocs d ON d.doc_id = c.id)
         |SELECT doc_id, n_toks FROM scoredocs
         |WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rk > 1)""".stripMargin,

    // word-frequency table -> weighted adjacent-codepoint pairs; substr
    // and len are codepoint-addressed in both engines, range() end is
    // exclusive so i runs 1..len-1 (1-codepoint words yield no pairs,
    // matching the Spark slice-then-index form)
    "t26_bpe_pairs" ->
      s"""WITH words AS (
         |  SELECT term, count(*) AS n FROM (
         |    SELECT t AS term FROM (
         |      SELECT unnest($toksSql) AS t FROM documents)
         |    WHERE len(t) > 0)
         |  GROUP BY 1),
         |pairs AS (
         |  SELECT substr(term, i, 1) AS lhs, substr(term, i + 1, 1) AS rhs, n
         |  FROM (SELECT term, n, unnest(range(1, len(term))) AS i FROM words))
         |SELECT lhs, rhs, CAST(sum(n) AS BIGINT) AS cnt
         |FROM pairs GROUP BY 1, 2
         |ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 20""".stripMargin,

    // the oracle sets the identical bloom bits and applies the identical
    // all-k-present pass test, then the exact join
    "r3_bloom_join" ->
      """WITH bkeys AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |bits AS (SELECT DISTINCT substr(md5(concat(i, ':', c_custkey)), 1, 3) AS bit
        |         FROM bkeys, unnest([0, 1, 2]) AS u(i)),
        |cand AS (SELECT o_custkey, o_totalprice FROM orders
        |  WHERE substr(md5(concat('0:', o_custkey)), 1, 3) IN (SELECT bit FROM bits)
        |    AND substr(md5(concat('1:', o_custkey)), 1, 3) IN (SELECT bit FROM bits)
        |    AND substr(md5(concat('2:', o_custkey)), 1, 3) IN (SELECT bit FROM bits)),
        |m AS (SELECT * FROM cand WHERE o_custkey IN (SELECT c_custkey FROM bkeys))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
        |  CAST(count(*) AS BIGINT) AS n_matched,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM m""".stripMargin,

    "r2_interval_overlap" ->
      """SELECT s.s_suppkey,
        |  CAST(count(c.c_custkey) AS BIGINT) AS n_overlap
        |FROM supplier s
        |LEFT JOIN customer c
        |  ON s.s_acctbal <= c.c_acctbal + 500.0
        | AND c.c_acctbal <= s.s_acctbal + 800.0
        |GROUP BY 1""".stripMargin,

    // the oracle does the range join declaratively; the Spark side must
    // produce identical counts from its bucketized equi-join form
    "r1_range_join" ->
      """SELECT s.s_suppkey,
        |  CAST(count(c.c_custkey) AS BIGINT) AS n_cust
        |FROM supplier s
        |LEFT JOIN customer c
        |  ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal <= s.s_acctbal + 1000.0
        |GROUP BY 1""".stripMargin,

    // same quantization arithmetic: q = round(x*127/mx), reconstruction
    // error folded left-to-right, scale/err as rounded integers
    "s5_quantize_int8" ->
      """WITH v AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id, embedding, mx,
        |  CASE WHEN mx = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(embedding,
        |              x -> CAST(round(x::DOUBLE * 127.0 / mx, 0) AS BIGINT)) END AS codes
        |  FROM v)
        |SELECT vec_id,
        |  CAST(round(mx / 127.0 * 1000000000.0, 0) AS BIGINT) AS scale_e9,
        |  md5(array_to_string(list_transform(codes, c -> CAST(c AS VARCHAR)), ',')) AS q_md5,
        |  CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(round(list_sum(list_transform(range(1, len(embedding) + 1),
        |              i -> abs(embedding[i]::DOUBLE - codes[i] * mx / 127.0)))
        |            / len(embedding) * 1000000.0, 0) AS BIGINT) END AS err_e6
        |FROM q""".stripMargin,

    // same packing: bit b of word w set iff dim 32w+b > 0 (32 dims per
    // word keeps every value a small positive BIGINT in both engines);
    // distance = summed bit_count(xor) over aligned words
    "s9_hamming_topk" ->
      """WITH codes AS (
        |  SELECT vec_id,
        |    list_transform(range(0, (len(embedding) + 31) // 32),
        |      w -> CAST(list_sum(list_transform(range(0, 32),
        |             b -> CASE WHEN w * 32 + b < len(embedding)
        |                        AND embedding[CAST(w * 32 + b + 1 AS INTEGER)] > 0
        |                   THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS codes
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(range(1, len(q.codes) + 1),
        |      i -> bit_count(xor(q.codes[CAST(i AS INTEGER)],
        |                         c.codes[CAST(i AS INTEGER)])))) AS BIGINT) AS dist
        |  FROM codes q JOIN codes c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, dist
        |FROM ranked WHERE rank <= 3""".stripMargin,

    // the assignment CTEs are s3's oracle verbatim; the update step sums
    // offset micro-ints (positive, so // truncation == floor in both
    // engines) — parallel unnest zips value with its 0-based dim
    "s4_kmeans_update" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]), 6) AS sim
        |  FROM embeddings e CROSS JOIN cents c),
        |ranked AS (
        |  SELECT vec_id, embedding, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
        |  FROM scored),
        |cells AS (SELECT cid AS cell_id, embedding FROM ranked WHERE rn = 1),
        |ex AS (SELECT cell_id,
        |  unnest(range(0, len(embedding))) AS dim,
        |  unnest(embedding) AS x FROM cells),
        |agg AS (SELECT cell_id, dim,
        |  sum(CAST(round((x::DOUBLE + 2.0) * 1000000.0, 0) AS BIGINT)) AS s,
        |  count(*) AS n FROM ex GROUP BY 1, 2)
        |SELECT CAST(cell_id AS BIGINT) AS cell_id, CAST(dim AS BIGINT) AS dim,
        |  CAST(s // n - 2000000 AS BIGINT) AS mean_micro,
        |  CAST(n AS BIGINT) AS n_members
        |FROM agg""".stripMargin,

    // single-window prefix sum: the ORACLE may do the naive global cumsum
    // (DuckDB, one node); the Spark side must produce identical offsets
    // from its two-phase bucketed form
    "p3_pack_chunks" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n FROM documents),
         |c AS (SELECT doc_id, n,
         |  sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS off FROM t)
         |SELECT doc_id, n AS n_tokens,
         |       CAST(off // 256 AS BIGINT) AS first_chunk,
         |       CAST((off + greatest(n, 1) - 1) // 256 AS BIGINT) AS last_chunk
         |FROM c""".stripMargin,

    // changelog reconstruction: snapshot ids are deterministic (1..4 data
    // commits, 5 = the replace, which must contribute NOTHING)
    "q_changes" ->
      """WITH s0 AS (SELECT s_suppkey, s_name, s_nationkey FROM supplier),
        |up AS (
        |  SELECT s_suppkey, upper(s_name) AS s_name, s_nationkey + 100 AS s_nationkey
        |  FROM s0 WHERE s_suppkey % 3 = 0),
        |ins AS (
        |  SELECT s_suppkey + 1000000 AS s_suppkey, s_name, s_nationkey
        |  FROM s0 WHERE s_suppkey % 10 = 0),
        |state3 AS (
        |  SELECT * FROM s0 WHERE s_suppkey % 3 <> 0
        |  UNION ALL SELECT * FROM up
        |  UNION ALL SELECT * FROM ins)
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |       'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_snapshot_id
        |FROM s0 WHERE s_suppkey % 2 = 0
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT), 'insert', 2
        |FROM s0 WHERE s_suppkey % 2 = 1
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT), 'insert', 3 FROM up
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT), 'insert', 3 FROM ins
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT), 'delete', 3
        |FROM s0 WHERE s_suppkey % 3 = 0
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT), 'delete', 4
        |FROM state3 WHERE s_suppkey % 5 = 0""".stripMargin,

    // head = snapshot 1 rows + the post-rollback append; asof2 = all of
    // supplier (snapshot 2 had evens + odds)
    "q_time_travel" ->
      """WITH src AS (SELECT s_suppkey, s_name FROM supplier)
        |SELECT s_suppkey, s_name, 'head' AS view FROM src WHERE s_suppkey % 2 = 0
        |UNION ALL
        |SELECT s_suppkey + 500000, s_name, 'head' FROM src WHERE s_suppkey % 5 = 0
        |UNION ALL
        |SELECT s_suppkey, s_name, 'asof2' FROM src""".stripMargin,

    // day-partitioned retention reconstructed relationally: drop the
    // oldest day, aggregate the rest
    "q_day_retention" ->
      """WITH d AS (SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS day
        |           FROM events),
        |m AS (SELECT min(day) AS min_day FROM d)
        |SELECT day, count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS sum_id,
        |       count(DISTINCT user_id) AS n_users
        |FROM d, m WHERE day <> min_day GROUP BY day""".stripMargin,

    // MERGE final state, reconstructed relationally: delete wins over
    // update; matched rows failing both conditions stay untouched
    "q_merge" ->
      """WITH src AS (SELECT s_suppkey, s_name, s_nationkey FROM supplier),
        |updated AS (
        |  SELECT s_suppkey, 'M-' || s_name AS s_name, s_nationkey + 500 AS s_nationkey
        |  FROM src
        |  WHERE s_suppkey % 4 = 0 AND s_suppkey % 9 <> 0 AND s_nationkey < 15),
        |kept AS (
        |  SELECT s_suppkey, s_name, s_nationkey FROM src
        |  WHERE NOT (s_suppkey % 9 = 0)
        |    AND NOT (s_suppkey % 4 = 0 AND s_suppkey % 9 <> 0 AND s_nationkey < 15)
        |    AND NOT (s_suppkey % 4 <> 0 AND s_suppkey % 9 <> 0 AND s_nationkey >= 23)),
        |ins AS (
        |  SELECT s_suppkey + 1000000 AS s_suppkey, s_name, s_nationkey
        |  FROM src WHERE s_suppkey % 10 = 0)
        |SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |FROM (SELECT * FROM kept UNION ALL SELECT * FROM updated
        |      UNION ALL SELECT * FROM ins)""".stripMargin,

    "m1_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  sha256(text) AS sha
        |FROM documents""".stripMargin,

    // the fallback branch's features ARE oracle-expressible: tag 0 (text
    // bytes carry no codec magic), feat_len = payload byte length,
    // feat_avg = mean byte value, recomputed in DuckDB from
    // hex(encode(text)) nibble pairs — so the dispatch AND the whole
    // mapPartitions decode pipeline (schema, batching, row plumbing) get
    // an independent hash-checked verdict, not just a row count; the
    // codec branches are pinned per modality by MediaDispatchSpec
    "m2_media_features" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS h,
        |                  octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(0 AS BIGINT) AS modality_tag,
        |  CAST(n AS DOUBLE) AS feat_len,
        |  CASE WHEN n = 0 THEN 0.0 ELSE
        |    round(CAST(list_sum(list_transform(range(0, n), i ->
        |      (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 +
        |      (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1))) AS DOUBLE) / n, 4)
        |  END AS feat_avg
        |FROM m""".stripMargin,

    // the WAV features are fully determined by the fixture constants: the
    // oracle is the analytic recomputation (wavExpected) as literal rows —
    // Spark's side decodes real RIFF bytes with javax.sound.sampled, so a
    // header-layout or sample-decode bug breaks the hash match
    "m4_avi_video" -> {
      val vals = aviFixtures.map { case (id, w, h, uspf, n) =>
        s"($id, $w, $h, $n, ${math.round(1e9 / uspf)})"
      }.mkString(",\n  ")
      s"""SELECT CAST(media_id AS BIGINT) AS media_id,
         |  CAST(width AS INTEGER) AS width,
         |  CAST(height AS INTEGER) AS height,
         |  CAST(n_frames AS BIGINT) AS n_frames,
         |  CAST(fps_e3 AS BIGINT) AS fps_e3
         |FROM (VALUES
         |  $vals,
         |  (4, NULL, NULL, NULL, NULL))
         |  t(media_id, width, height, n_frames, fps_e3)""".stripMargin
    },

    "m8_video_neardup" ->
      """SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
        |  CAST(overlap_ppm AS BIGINT) AS overlap_ppm
        |FROM (VALUES (1, 2, 500000), (1, 4, 1000000), (2, 4, 500000))
        |  t(id1, id2, overlap_ppm)""".stripMargin,

    "m9_audio_neardup" ->
      """SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
        |  CAST(hamming AS BIGINT) AS hamming
        |FROM (VALUES (1, 2, 0), (1, 3, 2), (2, 3, 2))
        |  t(id1, id2, hamming)""".stripMargin,

    "m7_audio_signal" -> {
      val vals = wavSignalExpected.map { case (id, zc, sil, pk) =>
        s"($id, $zc, $sil, $pk)"
      }.mkString(",\n  ")
      s"""SELECT CAST(media_id AS BIGINT) AS media_id,
         |  CAST(zc_e6 AS BIGINT) AS zc_e6,
         |  CAST(silence_e6 AS BIGINT) AS silence_e6,
         |  CAST(peak_e6 AS BIGINT) AS peak_e6
         |FROM (VALUES
         |  $vals,
         |  (4, NULL, NULL, NULL))
         |  t(media_id, zc_e6, silence_e6, peak_e6)""".stripMargin
    },

    "m3_wav_audio" -> {
      val vals = wavExpected.map { case (id, r, c, d, rms) =>
        s"($id, $r, $c, $d, $rms)"
      }.mkString(",\n  ")
      s"""SELECT CAST(media_id AS BIGINT) AS media_id,
         |  CAST(sample_rate AS INTEGER) AS sample_rate,
         |  CAST(channels AS INTEGER) AS channels,
         |  CAST(duration_ms AS BIGINT) AS duration_ms,
         |  CAST(rms_e6 AS BIGINT) AS rms_e6
         |FROM (VALUES
         |  $vals,
         |  (4, NULL, NULL, NULL, NULL))
         |  t(media_id, sample_rate, channels, duration_ms, rms_e6)""".stripMargin
    }
  )

  /** The scale-arm twins share their broadcast twins' oracle SQL —
    * identical exact semantics, different physical arm — with the
    * Jaccard/containment slice narrowed to the twins' 250 docs. */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "d4p_jaccard_prefix" ->
      oraclesBase("d4_ngram_jaccard").replace("% 100000 < 1000", "% 100000 < 250"),
    "d11p_containment_prefix" ->
      oraclesBase("d11_containment").replace("% 100000 < 1000", "% 100000 < 250"),
    "d5t_embed_tiled" -> oraclesBase("d5_embed_neardup"))
}
