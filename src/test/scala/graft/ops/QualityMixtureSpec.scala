package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Quality filters (Gopher rules, C4 line cleaning), the domain-mixture
  * planner, and the k-means centroid update. */
class QualityMixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("gopherRules measures and gates each rule") {
    val fifty = (1 to 48).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // 50 words incl "the ... a": inside every bound -> keep
      (1L, s"the $fifty a"),
      // 6 words: fails the word-count rule only
      (2L, "the cat sat on a mat"),
      // symbol-heavy: '#' per word above 0.1
      (3L, s"the $fifty a # # # # # # # #"),
      // numeric words: alpha fraction below 0.8
      (4L, "the " + (1 to 48).map(_.toString).mkString(" ") + " a"),
      // no stopwords at all
      (5L, (1 to 50).map(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Quality.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1).getBoolean(6))
    assert(!out(2).getBoolean(6) && out(2).getLong(1) == 6)
    // doc 2 exact metrics: 15 chars / 6 words, 2 stopword hits
    assert(out(2).getDouble(2) == 2.5)
    assert(out(2).getLong(5) == 2L)
    assert(!out(3).getBoolean(6) && out(3).getDouble(3) > 0.1)
    assert(!out(4).getBoolean(6) && out(4).getDouble(4) < 0.8)
    assert(!out(5).getBoolean(6) && out(5).getLong(5) == 0L)
  }

  test("gopherRules is a zero-exchange per-row plan") {
    val docs = Seq((1L, "the a of x")).toDF("doc_id", "text")
    val plan = Quality.gopherRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRules must not shuffle:\n$plan")
  }

  test("c4CleanLines keeps only punctuated, long, clean lines — in order") {
    val text = Seq(
      "one two three four five.",   // keep
      "short.",                     // < 5 words
      "no terminal punct here at",  // no [.!?] ending
      "this has lorem ipsum inside the text.", // marker
      "if (x) { return y; }",       // brace (and no terminal punct)
      "six seven eight nine ten eleven!" // keep
    ).mkString("\n")
    val out = Quality.c4CleanLines(Seq((7L, text)).toDF("doc_id", "text")).head
    assert(out.getLong(1) == 2L) // kept
    assert(out.getLong(2) == 4L) // dropped
    assert(out.getString(3) ==
      "one two three four five.\nsix seven eight nine ten eleven!")
  }

  test("c4CleanLines handles CRLF line endings (crawl text)") {
    val text = "one two three four five.\r\nshort.\r\nsix seven eight nine ten!"
    val out = Quality.c4CleanLines(Seq((1L, text)).toDF("doc_id", "text")).head
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L)
    assert(out.getString(3) ==
      "one two three four five.\nsix seven eight nine ten!")
  }

  test("c4CleanLines on a fully-dropped doc yields empty text, and no shuffle") {
    val df = Seq((1L, "no punctuation at all here")).toDF("doc_id", "text")
    val out = Quality.c4CleanLines(df)
    assert(out.head.getString(3) == "" && out.head.getLong(1) == 0L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4CleanLines must not shuffle:\n$plan")
  }

  test("domainMixturePlan: binding domain caps the mixture; integer math exact") {
    // a: 1000 tokens at 50%, b: 300 at 30%, c: 200 at default 20%.
    // cap = min(1000*1e6/5e5, 300*1e6/3e5, 200*1e6/2e5) = 1000 total:
    // b and c both bind; a is sampled at half
    val rows = Seq(("a", 1000L), ("b", 300L), ("c", 200L)).toDF("domain", "n")
    val out = Mixture.domainMixturePlan(rows, "domain", col("n"),
      weightsPpm = Map("a" -> 500000L, "b" -> 300000L), defaultPpm = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((1000L, 500000L, 500000L, 500L)))
    assert(out("b") == ((300L, 300000L, 1000000L, 300L)))
    assert(out("c") == ((200L, 200000L, 1000000L, 200L)))
  }

  test("temperatureWeights: sqrt flattening boosts the small domain, integer-exact") {
    // a: 90 of 100 tokens (share 900000), b: 10 (share 100000)
    // w = isqrt(share * 1e6): a 948683, b 316227 -> weights 750000 / 249999
    val rows = Seq(("a", 90L), ("b", 10L)).toDF("domain", "n")
    val out = Mixture.temperatureWeights(rows, "domain", col("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((90L, 900000L, 750000L)))
    assert(out("b") == ((10L, 100000L, 249999L)))
    // flattening: b's weight (25%) far above its raw share (10%)
  }

  test("domainMixturePlan: zero-weight domains get rate 0 and never bind") {
    val rows = Seq(("keep", 100L), ("drop", 5L)).toDF("domain", "n")
    val out = Mixture.domainMixturePlan(rows, "domain", col("n"),
      weightsPpm = Map("keep" -> 1000000L), defaultPpm = 0L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // had 'drop' bound the cap, keep's rate would be 50000, not full rate
    assert(out("keep") == ((1000000L, 100L)))
    assert(out("drop") == ((0L, 0L)))
  }

  test("kmeansUpdate: exact micro-space means per cell and dimension") {
    val cents = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val pts = Seq(
      (10L, Seq(0.9f, 0.1f)), // -> cell 1
      (11L, Seq(0.8f, 0.2f)), // -> cell 1
      (12L, Seq(0.1f, 0.9f))  // -> cell 2
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansUpdate(pts, "vec_id", "embedding",
      cents, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // cell 1 dim 0: (2900000 + 2800000) div 2 - 2e6 = 850000
    assert(out((1L, 0L)) == ((850000L, 2L)))
    assert(out((1L, 1L)) == ((150000L, 2L)))
    assert(out((2L, 0L)) == ((100000L, 1L)))
    assert(out((2L, 1L)) == ((900000L, 1L)))
  }

  test("kmeansUpdate means are invariant under repartitioning (order-free sums)") {
    val cents = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val pts = (1 to 97).map(i => (i.toLong, Seq(i / 100.0f, (97 - i) / 300.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.kmeansUpdate(pts.repartition(1), "vec_id", "embedding",
      cents, "vec_id", "embedding").collect().toSet
    val b = Similarity.kmeansUpdate(pts.repartition(13), "vec_id", "embedding",
      cents, "vec_id", "embedding").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("roundRobinInterleave: two-phase position equals the naive global window") {
    // skewed domains: a=7, b=3, c=1 rows
    val rows = ((1 to 7).map(i => (i.toLong, "a")) ++
      (10 to 12).map(i => (i.toLong, "b")) ++ Seq((20L, "c"))).toDF("id", "dom")
    val got = Mixture.roundRobinInterleave(rows, "id", "dom")
    val cols = got.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // position is a permutation of 1..11
    assert(cols.map(_._4).sorted.toSeq == (1L to 11L).toSeq)
    // naive check: sort by (rn, dom) and compare assigned positions
    val naive = cols.sortBy(t => (t._3, t._2)).zipWithIndex
      .map { case ((id, _, _, _), i) => id -> (i + 1L) }.toMap
    cols.foreach { case (id, _, _, pos) => assert(naive(id) == pos, s"id=$id") }
    // round 1 (positions 1..3) covers all three domains
    assert(cols.filter(_._4 <= 3).map(_._2).toSet == Set("a", "b", "c"))
    // the order is invariant to input partitioning
    val again = Mixture.roundRobinInterleave(rows.repartition(7), "id", "dom")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    cols.foreach { case (id, _, _, pos) => assert(again(id) == pos) }
  }

  test("truncateTokens trims to the budget; oovRate counts misses in ppm") {
    val d = Seq((1L, "the cat sat"), (2L, "the the the"), (3L, "zz qq")).toDF("id", "text")
    val trunc = d.select($"id", TextAnalysis.truncateTokens($"text", 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(trunc == Map(1L -> "the cat", 2L -> "the the", 3L -> "zz qq"))
    val vocab = Seq("the", "cat").toDF("tok")
    val oov = TextAnalysis.oovRate(d, "id", "text", vocab, "tok")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(oov(1L) == ((3L, 1L, 333333L))) // "sat" misses
    assert(oov(2L) == ((3L, 0L, 0L)))
    assert(oov(3L) == ((2L, 2L, 1000000L)))
  }

  test("bigramCoherence: shared transitions score, unique ones don't, short/null docs report NULL") {
    val d = Seq((1L, "a b c"), (2L, "a b x"), (3L, "q"), (4L, null: String))
      .toDF("id", "text")
    val got = Quality.bigramCoherence(d, "id", "text", minDocs = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // "a b" appears in docs 1 and 2 (common); "b c"/"b x" are unique
    assert(got(1L) == ((2L, 1L, 500000L)))
    assert(got(2L) == ((2L, 1L, 500000L)))
    assert(got(3L) == ((0L, 0L, -1L))) // 1 token -> no bigrams -> NULL rate
    assert(got(4L) == ((0L, 0L, -1L)))
    // repeated bigram within ONE doc is distinct-counted: still unique
    val rep = Seq((1L, "z y z y"), (2L, "unrelated words here")).toDF("id", "text")
    val r1 = Quality.bigramCoherence(rep, "id", "text", minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(r1(1L) == 0L) // "z y" twice in doc 1 is one doc, not two
  }

  test("bigramLmScore: exact Laplace micros, unseen contexts smoothed, short docs NULL") {
    // train = even ids: "a b a b" + "c c"
    //   c12: (a,b)=2 (b,a)=1 (c,c)=1;  c1: a=2 b=1 c=1;  V=|{a,b,c}|=3
    val d = Seq((1L, "a b c"), (2L, "a b a b"), (3L, "z"), (4L, "c c"),
      (5L, "q q")).toDF("id", "text")
    val got = Quality.bigramLmScore(d, "id", "text", col("id") % 2 === 0)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // only held-out docs appear
    assert(got.keySet == Set(1L, 3L, 5L))
    // doc 1: (a,b) -> (2+1)*1e6 div (2+3) = 600000; (b,c) -> 1e6 div 4 = 250000
    assert(got(1L) == ((2L, 850000L, 425000L)))
    // doc 3: one token -> no bigrams, NULL scores
    assert(got(3L) == ((0L, -1L, -1L)))
    // doc 5: fully unseen context -> 1e6 div (0+3) = 333333
    assert(got(5L) == ((1L, 333333L, 333333L)))
  }
  test("collocations: hand-computed integer lift, minCount pruning, short-doc guard") {
    // unigrams: x=10 y=10 solo=5 p=1 q=1 -> N=27; bigrams: (x,y)x5 (y,x)x5
    // (p,q)x1 -> B=11. lift(x,y) = 5 * 27^2 / (11 * 10 * 10) = 3645/1100
    val docs = (
      (1 to 5).map(i => (i.toLong, "x y")) ++
      (6 to 10).map(i => (i.toLong, "y x")) ++
      (11 to 15).map(i => (i.toLong, "solo")) ++   // single token: no bigram
      Seq((16L, "p q"))                            // below minCount
    ).toDF("doc_id", "text")
    val got = Quality.collocations(docs, "text", minCount = 5L)
      .as[(String, String, Long, Long)].collect().toSet
    val lift = 1000000L * 5 * 27 * 27 / (11L * 10 * 10)
    assert(got == Set(("x", "y", 5L, lift), ("y", "x", 5L, lift)))
    assert(lift == 3313636L) // 3645000000 / 1100, floor
  }
}
