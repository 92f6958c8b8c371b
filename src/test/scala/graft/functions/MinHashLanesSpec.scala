package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Parity of the native MinHashLanes expression against the HOF
  * formulation it replaced: same md5 family, same lane split, same
  * byte-lexicographic minima, same degenerate cases. */
class MinHashLanesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** the previous interpreted formulation, kept here as the reference. */
  private def hofLanes(seeds: Int) = {
    val perSeed = (0 until seeds).map { s =>
      expr(
        s"""aggregate(transform(__grams, g -> md5(concat('$s:', g))),
           |  named_struct('m0', '~', 'm1', '~', 'm2', '~', 'm3', '~'),
           |  (a, h) -> named_struct(
           |    'm0', least(a.m0, substring(h, 1, 8)),
           |    'm1', least(a.m1, substring(h, 9, 8)),
           |    'm2', least(a.m2, substring(h, 17, 8)),
           |    'm3', least(a.m3, substring(h, 25, 8))))""".stripMargin)
    }
    flatten(array(perSeed.map(f =>
      array(f.getField("m0"), f.getField("m1"), f.getField("m2"), f.getField("m3"))): _*))
  }

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("native lanes == HOF lanes on random gram arrays (incl. unicode)") {
    val gram = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("héllo wörld", "日本語 テスト", "a b", "", "~~~", "0:x"))
    val rows = samples(Gen.listOfN(10, gram), 60).zipWithIndex
      .map { case (gs, i) => (i.toLong, gs) }
    val df = rows.toDF("id", "__grams")
    val out = df.select(col("id"),
        MinHashFunctions.min_hash_lanes(col("__grams"), 4).as("native"),
        hofLanes(4).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"row ${r.getLong(0)}")
    }
  }

  test("degenerate cases: empty array -> identities; null array -> null") {
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "__grams")
    val out = df.select(col("id"),
        MinHashFunctions.min_hash_lanes(col("__grams"), 2).as("lanes"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(1L).get == Seq.fill(8)("~"))
    assert(out(2L).isEmpty)
  }

  test("the d2 signature surface is unchanged (spot-check one known gram)") {
    // md5("0:the quick fox") first 8 hex chars, computed independently
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("0:the quick fox".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val lanes = Seq((1L, Seq("the quick fox"))).toDF("id", "__grams")
      .select(MinHashFunctions.min_hash_lanes(col("__grams"), 1))
      .head.getSeq[String](0)
    assert(lanes == Seq(h.substring(0, 8), h.substring(8, 16),
      h.substring(16, 24), h.substring(24, 32)))
  }
}
