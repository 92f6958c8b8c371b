package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** WordNgrams / XxHash64SortedSet replace interpreted HOF chains in the
  * MinHash signature stage — their outputs must be BIT-identical to the
  * SQL formulations (array_distinct(transform(sequence, slice, concat_ws))
  * and array_sort(array_distinct(transform(xxhash64)))), or every LSH
  * pair decision drifts from the oracle. Property-pin both, including the
  * degenerate shapes (empty token array, fewer tokens than the window,
  * duplicate windows, unicode, empty-string tokens). */
class ShingleExpressionsSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val tokGen: Gen[Seq[String]] = Gen.listOf(Gen.oneOf(
    "the", "quick", "brown", "fox", "", "naïve", "東京", "a b", "x"))

  test("word_ngrams matches the transform/slice/concat_ws SQL form") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 5, 13)) {
      val df = samples(tokGen, 150).map(Tuple1(_)).toDF("__toks")
      val sql = expr(
        s"array_distinct(transform(sequence(1, greatest(size(__toks) - ${n - 1}, 1)), i -> concat_ws(' ', slice(__toks, i, $n))))")
      val diff = df.select(
        sql.as("want"),
        ShingleFunctions.word_ngrams(col("__toks"), n).as("got"))
        .filter(col("want") =!= col("got"))
      assert(diff.isEmpty, s"n=$n: ${diff.take(3).mkString("; ")}")
    }
  }

  test("xxhash64_sorted_set matches array_sort(array_distinct(transform(xxhash64)))") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = samples(tokGen, 200).map(Tuple1(_)).toDF("g")
    val diff = df.select(
      expr("array_sort(array_distinct(transform(g, x -> xxhash64(x))))").as("want"),
      ShingleFunctions.xxhash64_sorted_set(col("g")).as("got"))
      .filter(col("want") =!= col("got"))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("null input arrays yield null; empty arrays yield the degenerate window") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((Some(Seq.empty[String])), (None: Option[Seq[String]])).toDF("t")
    val got = df.select(
      ShingleFunctions.word_ngrams(col("t"), 3).as("g"),
      ShingleFunctions.xxhash64_sorted_set(
        ShingleFunctions.word_ngrams(col("t"), 3)).as("h")).collect()
    assert(got(0).getSeq[String](0) == Seq("")) // concat_ws over nothing
    assert(got(0).getSeq[Long](1).size == 1)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("char_ngram_hash_set matches the substring/xxhash64 SQL form") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
      "a", "b", "ç", "東", "𐍈", " ", "xy")).map(_.mkString)
    for (n <- Seq(2, 4, 7)) {
      val df = samples(textGen, 200).map(Tuple1(_)).toDF("t")
      val sql = expr(
        s"array_sort(array_distinct(transform(array_distinct(transform(sequence(1, greatest(length(t) - ${n - 2}, 1)), i -> substring(t, i, $n))), g -> xxhash64(g))))")
      val diff = df.select(sql.as("want"),
        ShingleFunctions.char_ngram_hash_set(col("t"), n).as("got"))
        .filter(col("want") =!= col("got"))
      assert(diff.isEmpty, s"n=$n: ${diff.take(3).mkString("; ")}")
    }
  }

  test("winnow_fingerprint byte-slice rewrite matches a per-gram string reference") {
    // the old formulation, inline: every k-code-point gram as its own
    // String -> md5 -> 16 lowercase hex chars, window minima with the
    // later-position tie rule
    def ref(text: String, k: Int, w: Int): Seq[(Int, String)] = {
      val cps = text.codePoints().toArray
      val m = cps.length - k + 1
      if (m < w) return Seq.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 until m).map { i =>
        val d = md.digest(new String(cps, i, k)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        d.take(8).map(b => f"${b & 0xff}%02x").mkString
      }
      val seen = scala.collection.mutable.LinkedHashSet[Int]()
      for (j <- 0 to m - w) {
        var bestP = j
        for (x <- j + 1 until j + w)
          if (hs(x).compareTo(hs(bestP)) <= 0) bestP = x
        seen.add(bestP)
      }
      seen.toSeq.map(p => (p + 1, hs(p)))
    }
    val spark = SparkTestBase.spark
    import spark.implicits._
    val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
      "a", "b", "ç", "東", "𐍈", " ", "lorem")).map(_.mkString)
    val texts = samples(textGen, 120) ++ Seq("", "ab", "the quick brown fox" * 10)
    for ((k, w) <- Seq((8, 5), (3, 2))) {
      val got = texts.map(Tuple1(_)).toDF("t")
        .select(WinnowFunctions.winnow_fingerprint(col("t"), k, w).as("fp"))
        .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
          .map(r => (r.getInt(0), r.getString(1))))
      texts.zip(got).foreach { case (t, g) =>
        assert(g == ref(t, k, w), s"k=$k w=$w text=${t.take(40)}")
      }
    }
  }

  test("minHashSignatureSets is unchanged by the native rewrite (golden relational form)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different text with other words entirely here"),
      (4L, ""), (5L, "one"), (6L, "naïve 東京 unicode words naïve 東京")
    ).toDF("doc_id", "text")
    val sig = graft.ops.Dedup.minHashSignatureSets(docs, "doc_id", "text", n = 3, k = 16)
    // relational form: explode + distinct + md5 lane minima, the original
    // (and oracle-side) formulation
    val grams = graft.ops.Dedup.wordShingles(docs, "doc_id", "text", n = 3)
    val want = graft.ops.Dedup.minHashSignatures(grams, k = 16)
    val mhCols = (0 until 16).map(j => col(s"mh$j"))
    val gotSig = sig.select(col("id") +: mhCols: _*)
    val wantSig = want.select(col("id") +: mhCols: _*)
    assert(gotSig.exceptAll(wantSig).isEmpty && wantSig.exceptAll(gotSig).isEmpty)
    // identical docs 1/2 still produce identical gsets; doc 3 differs
    val gs = sig.select(col("id"), col("gset")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(gs(1L) == gs(2L) && gs(1L) != gs(3L))
  }
}
