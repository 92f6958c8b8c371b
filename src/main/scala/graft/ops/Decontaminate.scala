package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Train/test decontamination — the n-gram-overlap filter every serious
  * training-data pipeline runs before a model sees the corpus (the
  * GPT-3/PaLM-style "13-gram overlap with any benchmark doc" rule,
  * parameterized here).
  *
  * Scale shape: the TEST side (benchmarks) is small by nature — its
  * distinct n-grams broadcast. The corpus explodes its n-grams into a
  * stream that BROADCAST-hash-joins the test grams (no corpus shuffle;
  * non-matching grams die inside the join), and only the matching hits —
  * a tiny relation — shuffle once for the per-document count. At 100 TB
  * the corpus is never exchanged.
  */
object Decontaminate {

  /** Distinct word n-grams of a corpus, one row per (id, gram). */
  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.wordShingles(df, idCol, textCol, n)

  /** Documents of `corpus` sharing at least `minHits` distinct n-grams
    * with ANY test document. Returns (doc_id, n_hits) for flagged docs —
    * anti-join the corpus against it to decontaminate. */
  def flaggedByNgramOverlap(
      corpus: DataFrame, idCol: String, textCol: String,
      test: DataFrame, testTextCol: String,
      n: Int = 13, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, "minHits must be >= 1")
    // distinct test grams; constructed ids are irrelevant — only the set
    val testGrams = test.select(col(testTextCol).as("__t"))
      .select(TextAnalysis.tokens(col("__t")).as("__toks"))
      .select(explode(graft.functions.ShingleFunctions.word_ngrams(col("__toks"), n))
        .as("gram")).distinct()
    grams(corpus, idCol, textCol, n)
      .join(broadcast(testGrams), Seq("gram"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("id").as(idCol), col("n_hits"))
  }

  /** The decontaminated corpus: rows of `corpus` NOT flagged. */
  def removeContaminated(
      corpus: DataFrame, idCol: String, textCol: String,
      test: DataFrame, testTextCol: String,
      n: Int = 13, minHits: Int = 1): DataFrame =
    corpus.join(
      flaggedByNgramOverlap(corpus, idCol, textCol, test, testTextCol, n, minHits)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** SUBSTRING-level decontamination via winnow fingerprints: corpus
    * documents sharing at least `minHits` winnowed fingerprints with ANY
    * test document. The winnowing guarantee turns this into a character-
    * run rule: any shared run of >= k + w - 1 characters contributes a
    * shared fingerprint — catching contamination the word-n-gram rule
    * misses (tokenization changes, punctuation/casing drift inside the
    * run, partial sentences), at ~2/(w+1) of the gram volume.
    *
    * Scale shape mirrors [[flaggedByNgramOverlap]]: the test side's
    * fingerprints are small by nature and BROADCAST; the corpus is
    * fingerprinted per-row ([[TextAnalysis.winnowFingerprints]] — one
    * native pass) and left-semi joins through the broadcast, so nothing
    * corpus-sized shuffles. Returns (idCol, n_hits) for flagged docs. */
  def flaggedByWinnowOverlap(
      corpus: DataFrame, idCol: String, textCol: String,
      test: DataFrame, testTextCol: String,
      k: Int = 12, w: Int = 5, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, "minHits must be >= 1")
    val testFp = TextAnalysis
      .winnowFingerprints(test.select(monotonically_increasing_id().as("__tid"),
        col(testTextCol).as("__t")), "__tid", "__t", k, w)
      .select(explode(col("fp_hashes")).as("h")).distinct()
    // winnowFingerprints spreads itself (grow-only [[Spread]]) — no
    // unconditional repartition that would shrink a wide corpus at scale
    TextAnalysis.winnowFingerprints(corpus, idCol, textCol, k, w)
      .select(col("id"), explode(col("fp_hashes")).as("h"))
      .join(broadcast(testFp), Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("id").as(idCol), col("n_hits"))
  }

  /** SEMANTIC decontamination: corpus documents whose embedding lies
    * within cosine >= tau of ANY test-set embedding — the contamination
    * the n-gram rule structurally misses (paraphrase, translation,
    * reformatted copies). SemDeDup's geometry pointed across datasets
    * instead of within one.
    *
    * Scale shape mirrors [[flaggedByNgramOverlap]]: the test side is
    * small by nature and broadcasts with norms precomputed; the corpus
    * scans once and never shuffles at full width — the broadcast
    * nested-loop join emits only the (doc, test) hits past tau (each
    * pair costs one fused `VecDot` loop), and the per-doc fold
    * aggregates a relation bounded by contamination volume, not corpus
    * size. Zero-norm and null embeddings are excluded before the join on
    * BOTH sides (cosine is undefined for them, and under ANSI the
    * division would throw rather than produce a comparable NaN) — an
    * unembeddable document cannot be flagged by an embedding rule.
    *
    * Returns (idCol, n_hits, max_cos) for flagged docs; compose with an
    * anti join (or [[removeSemanticContaminated]]) to decontaminate. */
  def flaggedByEmbeddingSimilarity(
      corpus: DataFrame, idCol: String, vecCol: String,
      test: DataFrame, testVecCol: String, tau: Double): DataFrame = {
    // each corpus row pays |test| fused VecDot loops inside the broadcast
    // NLJ — spread (grow-only) so the stream side isn't pinned to the
    // scan's row-group parallelism
    val c = Spread(corpus).select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", Similarity.norm(col("__v")))
      .filter(col("__n").isNotNull && col("__n") > 0)
    val t = test.select(col(testVecCol).as("__tv"))
      .withColumn("__tn", Similarity.norm(col("__tv")))
      .filter(col("__tn").isNotNull && col("__tn") > 0)
    c.crossJoin(broadcast(t))
      .withColumn("__cos",
        round(Similarity.dot(col("__v"), col("__tv")) / (col("__n") * col("__tn")), 6))
      .filter(col("__cos") >= tau)
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_hits"), max(col("__cos")).as("max_cos"))
      .select(col("__id").as(idCol), col("n_hits"), col("max_cos"))
  }

  /** The semantically-decontaminated corpus: rows NOT flagged by
    * [[flaggedByEmbeddingSimilarity]]. */
  def removeSemanticContaminated(
      corpus: DataFrame, idCol: String, vecCol: String,
      test: DataFrame, testVecCol: String, tau: Double): DataFrame =
    corpus.join(
      flaggedByEmbeddingSimilarity(corpus, idCol, vecCol, test, testVecCol, tau)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
