package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property-based cross-checks tying the curation operators together on
  * randomized corpora (seeded scalacheck samples — never flaky):
  * stats/excision consistency, quantization error bounds, mixture
  * feasibility. */
class CurationPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** small-vocabulary corpora so duplicated windows actually occur. */
  private def corpus(seed: Int): Seq[(Long, String)] = {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = samples(Gen.listOfN(14, Gen.chooseNum(0, vocab.size - 1)), 30)
    docs.zipWithIndex.map { case (idxs, i) =>
      ((seed * 100 + i).toLong, idxs.map(vocab).mkString(" "))
    }
  }

  test("excision and stats agree: a doc loses tokens iff it has duplicated windows") {
    val df = corpus(1).toDF("doc_id", "text")
    val stats = Dedup.duplicatedNgramStats(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val excised = Dedup.exciseDuplicatedNgrams(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats.keySet == excised.keySet)
    for ((id, dupGrams) <- stats) {
      val (nTok, nKept) = excised(id)
      assert((dupGrams > 0) == (nKept < nTok),
        s"doc $id: dup_grams=$dupGrams but kept $nKept of $nTok")
    }
    // the small vocabulary guarantees both outcomes appear
    assert(stats.values.exists(_ > 0) && stats.values.exists(_ == 0))
  }

  test("quantization error is bounded by half a quantization step everywhere") {
    val vecs = samples(Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f)), 50)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val out = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding").collect()
    out.foreach { r =>
      val scaleE9 = r.getLong(1); val errE6 = r.getLong(3)
      // mean |err| <= scale/2 (+1 micro slack for the two roundings)
      assert(errE6 <= scaleE9 / 2000 + 1,
        s"vec ${r.getLong(0)}: err_e6=$errE6 exceeds half-step of scale_e9=$scaleE9")
    }
  }

  test("mixture plans are always feasible: takes within supply and mixture-consistent") {
    val gens = Gen.zip(Gen.listOfN(6, Gen.chooseNum(1L, 100000L)),
      Gen.listOfN(6, Gen.chooseNum(0L, 500000L)))
    for ((sizes, ppms) <- samples(gens, 30)) {
      val rows = sizes.zipWithIndex.map { case (s, i) => (s"d$i", s) }
      val weights = ppms.zipWithIndex.map { case (w, i) => s"d$i" -> w }.toMap
      val out = Mixture.domainMixturePlan(rows.toDF("domain", "n"), "domain",
        col("n"), weights, defaultPpm = 0L).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      for ((_, (n, w, rate, take)) <- out) {
        assert(take >= 0 && take <= n, s"take $take outside [0, $n]")
        assert(rate >= 0 && rate <= 1000000L)
        if (w == 0) assert(rate == 0L && take == 0L)
      }
      // mixture consistency: every positive-weight domain's take tracks
      // w * cap within integer-floor slack
      val pos = out.filter(_._2._2 > 0)
      if (pos.nonEmpty) {
        val caps = pos.map { case (_, (n, w, _, _)) => n * 1000000L / w }
        val cap = caps.min
        for ((d, (n, w, rate, take)) <- pos) {
          val ideal = w.toDouble * cap / 1000000.0
          assert(take <= ideal + 1, s"$d over-takes: $take > $ideal")
          // rate saturates only when the domain cannot supply its share
          if (rate == 1000000L) assert(ideal >= n - 1e-6 || take == n)
        }
      }
    }
  }
}
