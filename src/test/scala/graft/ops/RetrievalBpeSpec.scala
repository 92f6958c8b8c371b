package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.LocalCatalog

/** BM25 retrieval (direct + persisted inverted index), quality-biased
  * dedup keeper selection, and BPE tokenizer training. */
class RetrievalBpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs() = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana banana"),
    (4L, null: String),
    (5L, "durian")).toDF("doc_id", "text")

  // hand-computed against the scaladoc formula: N=5, T=10 (null text
  // counts as dl=0 toward the corpus stats), df(apple)=df(banana)=2 so
  // idf_e6 = 7_000_000 div 5 = 1_400_000
  private val expectedTop = Seq(
    (1L, 2L, 2849933L), // apple tf2/dl3 -> 1687670, banana tf1 -> 1162263
    (3L, 1L, 2019670L), // banana tf4/dl4: 1442622 * 14 div 10
    (2L, 1L, 1400000L)) // apple tf1/dl2: tf_e6 exactly 1e6

  test("bm25TopK matches the hand-computed integer formula, ranks and breaks ties by id") {
    val got = TextIndex.bm25TopK(docs(), "doc_id", "text",
      Seq("apple", "banana"), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectedTop)
  }

  test("bm25TopK: docs matching no term are absent; k truncates after ordering") {
    val got = TextIndex.bm25TopK(docs(), "doc_id", "text",
      Seq("apple", "banana"), k = 2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L)) // 5/durian and 4/null never appear
  }

  test("persisted index serves the same result as the direct scorer; replayed append converges") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-spec-wh").toString)
    val d = docs()
    TextIndex.build(spark, catalog, "ti", d.filter(col("doc_id") <= 2), "doc_id", "text")
    TextIndex.append(spark, catalog, "ti", d.filter(col("doc_id") > 2), "doc_id", "text")
    val direct = TextIndex.bm25TopK(d, "doc_id", "text", Seq("apple", "banana"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val served = TextIndex.searchBm25(spark, catalog, "ti", Seq("apple", "banana"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served == direct && served == expectedTop)
    // replay the append: upserts keyed (term, doc_id) / doc_id commit
    // identical rows, so the served ranking must not change
    TextIndex.append(spark, catalog, "ti", d.filter(col("doc_id") > 2), "doc_id", "text")
    val replayed = TextIndex.searchBm25(spark, catalog, "ti", Seq("apple", "banana"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(replayed == served)
  }

  test("searchBm25 pushes the term filter into the postings scan") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-push-wh").toString)
    TextIndex.build(spark, catalog, "tip", docs(), "doc_id", "text")
    val plan = TextIndex.searchBm25(spark, catalog, "tip", Seq("apple"), 3)
      .queryExecution.executedPlan.toString
    // a single term folds In -> EqualTo; either way the term predicate
    // must reach the parquet scan (file skipping on the term-clustered
    // postings layout depends on it)
    assert(plan.contains("EqualTo(term,apple)") || plan.contains("In(term"),
      s"expected a pushed term filter on the postings scan:\n$plan")
  }

  test("indexSink: a stream lands as a continuously-served inverted index") {
    import graft.testkit.FileGenerator
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-sink-wh").toString)
    val srcDir = java.nio.file.Files.createTempDirectory("ti-sink-src")
    val schema = docs().schema
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream
      .foreachBatch(TextIndex.indexSink(catalog, "tis", "doc_id", "text"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ti-sink-ck").toString)
      .start()
    try {
      FileGenerator.writeSingleParquet(spark,
        docs().filter(col("doc_id") <= 2), srcDir.resolve("b0.parquet"))
      q.processAllAvailable()
      FileGenerator.writeSingleParquet(spark,
        docs().filter(col("doc_id") > 2), srcDir.resolve("b1.parquet"))
      q.processAllAvailable()
      val served = TextIndex.searchBm25(spark, catalog, "tis", Seq("apple", "banana"), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(served == expectedTop)
    } finally q.stop()
  }

  test("the index is just tables: compacting the postings table leaves served scores unchanged") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-comp-wh").toString)
    val d = docs()
    // many small appends -> many small postings files
    TextIndex.build(spark, catalog, "tic", d.filter(col("doc_id") === 1), "doc_id", "text")
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      TextIndex.append(spark, catalog, "tic",
        d.filter(col("doc_id") === id), "doc_id", "text")
    }
    val before = TextIndex.searchBm25(spark, catalog, "tic", Seq("apple", "banana"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(before == expectedTop)
    // append now auto-maintains (IndexAutoMaintainSpec): the five
    // single-doc commits have already folded down instead of leaving
    // five fragments; an explicit full compaction on top is a safe no-op
    val filesBefore = catalog.loadTable(TextIndex.postingsTable("tic"))
      .currentSnapshot.get.manifest.count(_.content == graft.meta.FileContent.Data)
    assert(filesBefore < 5,
      s"auto-maintained appends should stay folded, got $filesBefore files")
    new graft.compaction.Compaction(catalog, TextIndex.postingsTable("tic"), spark).compact()
    val filesAfter = catalog.loadTable(TextIndex.postingsTable("tic"))
      .currentSnapshot.get.manifest.count(_.content == graft.meta.FileContent.Data)
    assert(filesAfter <= filesBefore,
      s"compaction should never grow the $filesBefore postings files, got $filesAfter")
    val after = TextIndex.searchBm25(spark, catalog, "tic", Seq("apple", "banana"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after == before)
  }

  test("keepBestPerCluster keeps the top scorer per cluster (ties -> lowest id), nulls last, unclustered survive") {
    val d = Seq(
      (1L, Some(5L)), (2L, Some(9L)), (3L, Some(9L)), // cluster 1: 2 and 3 tie -> 2
      (4L, None: Option[Long]), (5L, Some(7L)),       // cluster 4: null ranks below 7 -> 5
      (6L, Some(1L)))                                 // unclustered -> survives
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "cluster_id")
    val got = Dedup.keepBestPerCluster(d, "doc_id", "score", clusters)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 5L, 6L))
  }

  test("phrase search: consecutive positions, repeated terms, single-term degeneration, AND-mode") {
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-phrase-wh").toString)
    TextIndex.build(spark, catalog, "tph", docs(), "doc_id", "text")
    def phrase(ts: String*) =
      TextIndex.searchPhrase(spark, catalog, "tph", ts, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1 = "apple banana apple": one "apple banana", one "banana apple"
    assert(phrase("apple", "banana") == Seq((1L, 1L)))
    assert(phrase("banana", "apple") == Seq((1L, 1L)))
    // doc 3 = "banana banana banana banana": the repeated-term chain
    // finds 3 overlapping starts (1,2,3); doc 1 contributes none
    assert(phrase("banana", "banana") == Seq((3L, 3L)))
    // single term degenerates to tf ranking: apple tf2 in doc 1, tf1 in doc 2
    assert(phrase("apple") == Seq((1L, 2L), (2L, 1L)))
    // no doc contains this chain
    assert(phrase("cherry", "apple").isEmpty)
    // AND-mode BM25: only doc 2 has BOTH apple and cherry
    val and = TextIndex.searchBm25(spark, catalog, "tph",
      Seq("apple", "cherry"), k = 10, requireAll = true)
      .collect().map(_.getLong(0)).toSeq
    assert(and == Seq(2L))
    val andDirect = TextIndex.bm25TopK(docs(), "doc_id", "text",
      Seq("apple", "cherry"), k = 10, requireAll = true)
      .collect().map(_.getLong(0)).toSeq
    assert(andDirect == Seq(2L))
  }

  test("empty-string query terms are rejected; empty-text docs write no postings") {
    intercept[IllegalArgumentException] {
      TextIndex.bm25TopK(docs(), "doc_id", "text", Seq("apple", ""), 1)
    }
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("ti-empty-wh").toString)
    val withEmpty = docs().unionAll(Seq((6L, "")).toDF("doc_id", "text"))
    TextIndex.build(spark, catalog, "tie", withEmpty, "doc_id", "text")
    val emptyTerms = graft.meta.IceRead.table(spark, catalog, TextIndex.postingsTable("tie"))
      .filter(length(col("term")) === 0).count()
    assert(emptyTerms == 0L, "empty-text docs must not write postings under the empty term")
    // the doc still counts toward corpus stats (dl row exists)
    assert(graft.meta.IceRead.table(spark, catalog, TextIndex.docsTable("tie"))
      .filter(col("doc_id") === 6L).count() == 1L)
  }

  test("keepBestPerCluster survives duplicated cluster labels") {
    val d = Seq((1L, 5L), (2L, 9L), (3L, 1L)).toDF("doc_id", "score")
    // label for the keeper (2) appears twice — e.g. a unionAll of CC runs
    val clusters = Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val got = Dedup.keepBestPerCluster(d, "doc_id", "score", clusters)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), "the duplicated label must not anti-join the keeper away")
  }

  test("vocabulary counts words and splits codepoint symbols; empty tokens dropped") {
    val d = Seq((1L, "aa bb aa"), (2L, ""), (3L, null: String)).toDF("doc_id", "text")
    val got = Bpe.vocabulary(d, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSet
    assert(got == Set(("aa", 2L, Seq("a", "a")), ("bb", 1L, Seq("b", "b"))))
  }

  test("pairCounts weights pairs by word frequency; 1-symbol words yield none") {
    val vocab = Seq(
      (2L, Seq("a", "a")),
      (1L, Seq("b", "b")),
      (7L, Seq("x"))).toDF("n", "symbols")
    val got = Bpe.pairCounts(vocab).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "a") -> 2L, ("b", "b") -> 1L))
  }

  test("mergeOnce is greedy left-to-right: aaa under (a,a) -> [aa, a], never chains") {
    val d = Seq(Tuple1(Seq("a", "a", "a"))).toDF("symbols")
    val got = d.select(Bpe.mergeOnce(col("symbols"), "a", "a")).collect()
      .head.getSeq[String](0)
    assert(got == Seq("aa", "a"))
  }

  test("train learns the classic low/lower/lowest merges in order; applyMerges tokenizes with them") {
    val corpus = Seq((1L, "low lower lowest"), (2L, "low low"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", nMerges = 3, minCount = 2L)
    // round 1: (l,o) and (o,w) both count 5 -> lexicographic lhs wins;
    // round 2: (lo,w)=5; round 3: (low,e)=2
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    val toks = Bpe.applyMerges(
        Seq((1L, "low lowest")).toDF("doc_id", "text"), "text", "toks", merges)
      .select(col("toks")).collect().head.getSeq[String](0)
    assert(toks == Seq("low", "lowe", "s", "t"))
  }

  test("train stops early when no pair reaches minCount") {
    val corpus = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(Bpe.train(corpus, "text", nMerges = 5, minCount = 2L).isEmpty)
  }
}
