package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** TermPostings replaces the inverted-index build's posexplode +
  * groupBy(term, doc_id) + sort_array(collect_list(pos + 1)) stage with a
  * per-row projection — the exploded row set must be IDENTICAL to the
  * relational form (same term filter, tf, ascending 1-based positions),
  * or the persisted postings (and every BM25/phrase result served from
  * them) drift from the oracle's relational reconstruction. */
class TermPostingsSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val tokGen: Gen[Seq[String]] = Gen.listOf(Gen.oneOf(
    "the", "quick", "brown", "the", "fox", "", "naïve", "東京", "a b", "x"))

  test("term_postings matches the posexplode + groupBy + collect_list form") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = samples(tokGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "__toks")
    val want = docs
      .select(col("doc_id"), posexplode(col("__toks")).as(Seq("pos", "term")))
      .filter(char_length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list((col("pos") + 1).cast("long"))).as("positions"))
    val got = docs
      .select(col("doc_id"),
        explode(PostingsFunctions.term_postings(col("__toks"))).as("__p"))
      .select(col("__p.term").as("term"), col("doc_id"),
        col("__p.tf").as("tf"), col("__p.positions").as("positions"))
    assert(got.exceptAll(want.select(got.columns.map(col): _*)).isEmpty &&
      want.select(got.columns.map(col): _*).exceptAll(got).isEmpty,
      "row sets differ")
  }

  test("null array, empty array, and all-empty tokens yield no postings") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None: Option[Seq[String]]),
      (3L, Some(Seq("", "", "")))).toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      explode(PostingsFunctions.term_postings(col("t"))).as("__p"))
    assert(out.isEmpty)
  }

  test("null tokens are skipped like the char_length filter skips them") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1L, Seq[String](null, "a", null, "a", "b"))).toDF("doc_id", "t")
    val got = df.select(explode(PostingsFunctions.term_postings(col("t"))).as("p"))
      .select(col("p.term"), col("p.tf"), col("p.positions"))
      .orderBy(col("term")).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSeq ==
      Seq(("a", 2L, Seq(2L, 4L)), ("b", 1L, Seq(5L))))
  }
}
