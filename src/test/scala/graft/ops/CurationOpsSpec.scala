package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.UnicodeFunctions

/** Line-level dedup, sequence packing, tf-idf, and Unicode normalization —
  * the round-3 curation additions. */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ------------------------------------------------------- line dedup --

  test("dropBoilerplateLines removes corpus-frequent lines, keeps order") {
    // 'footer' appears in 3 docs (>= minCount 3); 'alpha'/'beta' unique-ish
    val docs = Seq(
      (1L, "alpha one\nfooter\nbeta two"),
      (2L, "footer\ngamma three"),
      (3L, "delta four\nfooter"),
      (4L, "epsilon five")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "doc_id", "text", minCount = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "alpha one\nbeta two")))
    assert(out(2L) == ((1L, 1L, "gamma three")))
    assert(out(3L) == ((1L, 1L, "delta four")))
    assert(out(4L) == ((1L, 0L, "epsilon five")))
  }

  test("dropBoilerplateLines: a doc of only boilerplate reassembles empty") {
    val docs = Seq(
      (1L, "x\nx"), (2L, "x"), (3L, "x\ny")).toDF("doc_id", "text")
    // 'x' appears 4 times across the corpus -> dropped everywhere
    val out = Dedup.dropBoilerplateLines(docs, "doc_id", "text", minCount = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, 2L, "")))
    assert(out(2L) == ((0L, 1L, "")))
    assert(out(3L) == ((1L, 1L, "y")))
  }

  // --------------------------------------------------- sequence packing --

  test("packChunks offsets equal the naive global prefix sum") {
    // non-contiguous ids across several buckets (bucketSize = 8)
    val rows = Seq(3L -> 100L, 5L -> 50L, 11L -> 300L, 17L -> 1L, 18L -> 0L,
      40L -> 700L, 41L -> 256L, 90L -> 10L)
    val df = rows.toDF("doc_id", "n")
    val out = Packing.packChunks(df, "doc_id", "n", chunkTokens = 256, bucketSize = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // naive reference: running offset in doc_id order
    var off = 0L
    rows.sortBy(_._1).foreach { case (id, n) =>
      val first = off / 256
      val last = (off + math.max(n, 1) - 1) / 256
      assert(out(id) == ((n, first, last)), s"doc $id")
      off += n
    }
  }

  test("packChunks spans: a doc straddles the right number of chunks") {
    val df = Seq(1L -> 100L, 2L -> 500L, 3L -> 256L).toDF("doc_id", "n")
    val out = Packing.packChunks(df, "doc_id", "n", chunkTokens = 256, bucketSize = 2)
    // doc 2: offsets [100, 600) -> chunks 0..2; doc 3: [600, 856) -> 2..3
    val m = out.collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((0L, 0L)))
    assert(m(2L) == ((0L, 2L)))
    assert(m(3L) == ((2L, 3L)))
    val occ = Packing.chunkOccupancy(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(occ == Map(0L -> 2L, 1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("chunkOverlapping: windows overlap by chunk-stride, cover every token") {
    // 10 tokens, chunk 4, stride 3 -> 1 + ceil(6/3) = 3 windows at
    // 1, 4, 7; the last reaches token 10, so coverage is complete
    // without any extra tail window
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.chunkOverlapping(df, "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10")))
    // every token appears in at least one chunk; consecutive chunks share
    // chunkTokens - stride = 1 token
    val toks = out.flatMap(_._3.split(" ")).toSet
    assert(toks == (1 to 10).map(i => s"t$i").toSet)

    // non-divisible case: n=11 -> windows at 1,4,7,10; the last is a
    // SHORT 2-token tail even though the doc is longer than C
    val odd = Packing.chunkOverlapping(
      Seq((3L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("chunk_idx").collect().map(r => (r.getLong(2), r.getString(3)))
    assert(odd.last == ((2L, "t10 t11")), s"got ${odd.toSeq}")
    assert(odd.flatMap(_._2.split(" ")).toSet == (1 to 11).map(i => s"t$i").toSet)

    // short doc: exactly one whole-doc chunk
    val one = Packing.chunkOverlapping(
      Seq((2L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 64, 48).collect()
    assert(one.length == 1 && one.head.getString(3) == "a b c")
  }

  // -------------------------------------------------------------- tf-idf --

  test("tfIdfTopTerms ranks by exact integer score with term tie-break") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana shared shared"),
      (3L, "cherry shared")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), (r.getString(1), r.getLong(3)))).toMap
    // doc 1: apple tf=2 df=1 -> 2_000_000; banana tf=1 df=2 -> 500_000
    assert(out((1L, 1L)) == (("apple", 2000000L)))
    assert(out((1L, 2L)) == (("banana", 500000L)))
    // doc 2: shared tf=2 df=3 -> 666_666; banana tf=1 df=2 -> 500_000
    assert(out((2L, 1L)) == (("shared", 666666L)))
    assert(out((2L, 2L)) == (("banana", 500000L)))
    // doc 3: cherry tf=1 df=1 -> 1_000_000; shared tf=1 df=3 -> 333_333
    assert(out((3L, 1L)) == (("cherry", 1000000L)))
    assert(out((3L, 2L)) == (("shared", 333333L)))
  }

  // ------------------------------------------------ unicode normalization --

  test("nfc composes combining marks; already-normalized text is unchanged") {
    val df = Seq(
      (1L, "café"),          // e + combining acute -> é
      (2L, "café"),           // already NFC
      (3L, "über"),          // u + diaeresis -> ü
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.select($"id", UnicodeFunctions.nfc($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "café")
    assert(out(2L) == "café")
    assert(out(3L) == "über")
    assert(out(4L) == "plain ascii")
    assert(out(5L) == null)
  }

  test("nfkc additionally folds compatibility forms (ligature, fullwidth)") {
    val df = Seq((1L, "ﬁle"), (2L, "ＡBC")).toDF("id", "s") // ﬁle, ＡBC
    val out = df.select($"id", UnicodeFunctions.nfkc($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "file")
    assert(out(2L) == "ABC")
    // NFC must NOT fold compatibility characters
    val nfc = df.select($"id", UnicodeFunctions.nfc($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == "ﬁle")
  }

  test("unicode normalize: interpreted eval matches the codegen path") {
    val inputs = Seq("café", "café", "åb̈c", "", "😀 ok")
    val df = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val gen = df.select($"id", UnicodeFunctions.nfc($"s").as("n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    inputs.zipWithIndex.foreach { case (s, i) =>
      val interp = graft.functions.UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)), "NFC")
        .eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      assert(gen(i.toLong) == interp, s"mismatch for input $i")
      assert(interp == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  test("unicode normalize rejects non-string input and unknown forms") {
    intercept[IllegalArgumentException] {
      UnicodeFunctions.normalize(lit("x"), "NFX")
    }
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(UnicodeFunctions.nfc($"i")).collect()
    }
    assert(err.getMessage.contains("string") || err.getMessage.toLowerCase.contains("type"))
  }

  test("cardStats: Luhn separates real PANs from digit runs; 20-digit runs never match") {
    val d = Seq(
      (1L, "pay 4111111111111111 now"),          // valid test PAN
      (2L, "ref 4111111111111112 thanks"),       // fails the checksum
      (3L, "grouped 4012 8888 8888 1881 card"),  // valid, space-separated
      (4L, "order 12345678901234567890 id"),     // 20 digits: no boundary fits
      (5L, "cards 4111111111111111 and 5500 0000 0000 0004 both"), // two valid
      (6L, "no numbers at all"),
      (7L, null: String)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cardStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((1L, 0L)))
    assert(got(3L) == ((1L, 1L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((2L, 2L)))
    assert(got(6L) == ((0L, 0L)))
    assert(got(7L) == ((0L, 0L)))
  }

  test("blockedByDomain: suffix match, subdomains, lookalikes, case fold") {
    val d = Seq(
      (1L, "see https://a.b.example.com/x ok"),   // subdomain -> blocked
      (2L, "see http://notexample.com/y ok"),     // lookalike substring -> kept
      (3L, "see https://BAD.ORG ok"),             // case-insensitive -> blocked
      (4L, "see https://example.com ok"),         // exact -> blocked
      (5L, "no urls at all"),
      (6L, "https://example.com.evil.net phish"), // blocked domain as NON-suffix -> kept
      (7L, "read https://bad.org. now")           // sentence-final dot -> still blocked
    ).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextAnalysis.blockedByDomain(col("text"), Seq("example.com", "bad.org")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> false, 6L -> false, 7L -> true))
  }

  test("ibanStats: mod-97 separates valid IBANs from near-misses") {
    val d = Seq(
      (1L, "pay DE89 3704 0044 0532 0130 00 thanks"), // valid, spaced
      (2L, "pay DE89 3704 0044 0532 0130 01 thanks"), // one digit off -> invalid
      (3L, "acct GB82WEST12345698765432 ok"),         // valid, contiguous
      (4L, "ref AB12 3456 only"),                     // too short: not even a candidate
      (5L, "nothing financial here"),
      (6L, null: String)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ibanStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((1L, 0L)))
    assert(got(3L) == ((1L, 1L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((0L, 0L)))
    assert(got(6L) == ((0L, 0L)))
  }

  test("scriptProfile: exact per-script counts, tie order, none on script-free text") {
    val d = Seq(
      (1L, "abc 123 中文 жж"),   // latin 3, digit 3, cjk 2, cyr 2, other 3 spaces
      (2L, "中中中 abc"),         // cjk dominates
      (3L, "!!! ..."),            // no script chars at all
      (4L, "ab 中中"),            // 2-2 tie: cjk wins over latin
      (5L, null: String)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getString(8)))).toMap
    // latin/digit tie at 3 breaks toward digit (fixed tie order)
    assert(got(1L) == ((13L, 3L, 3L, 2L, 2L, 0L, 3L, "digit")))
    assert(got(2L) == ((7L, 3L, 0L, 3L, 0L, 0L, 1L, "cjk")))
    assert(got(3L) == ((7L, 0L, 0L, 0L, 0L, 0L, 7L, "none")))
    assert(got(4L) == ((5L, 2L, 0L, 2L, 0L, 0L, 1L, "cjk")))
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, "none")))
  }
}
