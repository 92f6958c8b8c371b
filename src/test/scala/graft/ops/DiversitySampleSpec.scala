package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Exact-value pins for charDiversity and the weightedSample contract. */
class DiversitySampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("charDiversity: exact values on crafted strings") {
    val docs = Seq(
      (1L, "aaaa"),       // 1 distinct char: collision 1.0, mode 1.0
      (2L, "abab"),       // 2 chars x2: collision (4+4)/16 = 0.5
      (3L, "abcd"),       // all distinct: collision 4/16 = 0.25
      (4L, "x"),          // single char: n=1, collision 1/1
      (5L, "aab")         // counts 2,1: (4+1)/9
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((4L, 1L, 1000000L, 1000000L)))
    assert(got(2L) == ((4L, 2L, 500000L, 500000L)))
    assert(got(3L) == ((4L, 4L, 250000L, 250000L)))
    assert(got(4L) == ((1L, 1L, 1000000L, 1000000L)))
    assert(got(5L) == ((3L, 2L, 555555L, 666666L))) // floor(5e6/9), floor(2e6/3)
  }

  test("charDiversity: prefix cap bounds the scored window") {
    val docs = Seq((1L, "ab" * 600)).toDF("doc_id", "text") // 1200 chars
    val row = TextAnalysis.charDiversity(docs, "doc_id", "text", prefixLen = 512)
      .collect().head
    assert(row.getLong(1) == 512L)    // n_chars capped
    assert(row.getLong(2) == 2L)
    assert(row.getLong(3) == 500000L) // two equal halves
  }

  test("charDiversity: repeated-char padding drives collision_ppm up") {
    val docs = Seq(
      (1L, "a normal english sentence with usual diversity of characters"),
      (2L, "a normal english sentence" + ("a" * 300))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got(2L) > got(1L) * 3) // padding at least triples collision
  }

  test("winnowFingerprints: the winnowing guarantee and edge cases hold") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"AAAA unrelated prefix text. $shared and more trailing content here"),
      (2L, s"totally different beginning!! $shared with another ending entirely"),
      (3L, "no overlap with anything else at all in this one, none whatsoever"),
      (4L, "short"), // < k + w - 1 chars -> no fingerprints
      (5L, "")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Long](2), r.getSeq[String](3))).toMap

    // guarantee: docs 1 and 2 share a 51-char substring >= k + w - 1 = 12,
    // so they MUST share at least one selected fingerprint hash
    val common = fp(1L)._3.toSet.intersect(fp(2L)._3.toSet)
    assert(common.nonEmpty, "winnowing guarantee violated on a shared substring")
    // doc 3 shares nothing beyond coincidence with doc 1's selection
    assert(fp(3L)._3.toSet.intersect(fp(1L)._3.toSet).isEmpty)

    // density: ~2/(w+1) of grams selected — loose band check
    val (n1, ps1, _) = fp(1L)
    assert(ps1.nonEmpty && ps1.length < n1, s"selected ${ps1.length} of $n1")
    // positions are ascending distinct and within range
    assert(ps1 == ps1.sorted && ps1.distinct == ps1 && ps1.forall(p => p >= 1 && p <= n1))

    // too-short and empty docs carry no fingerprints, no crash
    assert(fp(4L)._2.isEmpty && fp(5L)._2.isEmpty)

    // determinism: same input -> identical selection
    val again = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(again(1L) == ps1)
  }

  test("weightedSample: deterministic, weight-monotone in expectation, exact on rerun") {
    val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) 900L else 100L))
    val df = rows.toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", expected = 400)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(df, "id", "w", expected = 400)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // exact determinism
    val heavy = s1.count(_ % 2 == 0)
    val light = s1.size - heavy
    // heavy rows are 9x likelier; with 400 expected the split should be
    // ~360/40 — assert a loose 4x dominance (binomial noise safe)
    assert(heavy > light * 4, s"heavy=$heavy light=$light")
    // expected size honored within wide tolerance
    assert(s1.size > 200 && s1.size < 700, s"size=${s1.size}")
  }

  test("compressionRatio: repetition compresses, noise does not, orderings hold") {
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(2000)((rnd.nextInt(94) + 33).toChar).mkString
    val docs = Seq(
      (1L, "spam " * 400),                  // highly repetitive
      (2L, ("the quick brown fox jumps over the lazy dog. " * 5) +
        "A perfectly ordinary english paragraph follows with varied words, " +
        "clauses, and punctuation marks that compress moderately well."),
      (3L, noise),                          // near-incompressible
      (4L, "")                              // empty -> nulls
    ).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val spamR = got(1L).get; val proseR = got(2L).get; val noiseR = got(3L).get
    assert(spamR < proseR && proseR < noiseR, s"$spamR / $proseR / $noiseR")
    assert(spamR < 100000L, s"repetition should compress >10x, got $spamR ppm")
    assert(noiseR > 700000L, s"noise should stay near raw size, got $noiseR ppm")
    assert(got(4L).isEmpty)

    // deterministic: a rerun reproduces identical lengths
    val again = TextAnalysis.compressionRatio(docs)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(again == got)
  }

  test("weightedSample: overflow envelope fails loudly, never wraps silently") {
    // sum(w) over 2^31 must raise, not corrupt the draw comparison
    val big = Seq((1L, 3000000000L), (2L, 10L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(big, "id", "w", expected = 5).count()
    }
    assert(e.getMessage.contains("overflow envelope") ||
      e.getCause != null && e.getCause.getMessage.contains("overflow envelope"))
  }

  test("weightedSample: a different seed draws a different set") {
    val df = (1L to 500L).map(i => (i, 10L)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 100, seed = "s1")
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df, "id", "w", 100, seed = "s2")
      .select("id").as[Long].collect().toSet
    assert(a != b)
  }
}
