package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Product-quantization encode and SemDeDup semantic deduplication. */
class PqSemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("pqEncode against a self-codebook returns each vector's own id in every subspace") {
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 2f),
      1L -> Seq(0f, 5f, 7f, 0f),
      2L -> Seq(-3f, 1f, 2f, 2f))
    val got = Similarity.pqEncode(corpus, "vec_id", "embedding",
      corpus, "vec_id", "embedding", m = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(0L -> ((0L, 0L)), 1L -> ((1L, 1L)), 2L -> ((2L, 2L))))
  }

  test("pqEncode chooses per-subspace independently, ties to the lowest codebook id") {
    val codebook = vecs(
      0L -> Seq(0f, 0f, 9f, 9f),
      1L -> Seq(5f, 5f, 0f, 0f),
      2L -> Seq(5f, 5f, 0f, 0f)) // duplicate of 1: ties must resolve to 1
    val corpus = vecs(
      10L -> Seq(0.1f, 0f, 0.2f, 0f), // sub0 near cb0, sub1 near cb1 (and cb2)
      11L -> Seq(4.9f, 5f, 8.8f, 9f)) // sub0 near cb1 (tie with cb2 -> 1), sub1 near cb0
    val got = Similarity.pqEncode(corpus, "vec_id", "embedding",
      codebook, "vec_id", "embedding", m = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(10L -> ((0L, 1L)), 11L -> ((1L, 0L))))
  }

  test("pqEncode is partitioning-invariant and rejects a non-dividing m") {
    val corpus = vecs((0L to 30L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat - 5f)): _*)
    val cb = corpus.filter(col("vec_id") < 4)
    val a = Similarity.pqEncode(corpus, "vec_id", "embedding", cb, "vec_id", "embedding", m = 4)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val b = Similarity.pqEncode(corpus.repartition(13), "vec_id", "embedding",
      cb, "vec_id", "embedding", m = 4)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(a == b && a.size == 31)
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(corpus, "vec_id", "embedding", cb, "vec_id", "embedding", m = 3)
    }
  }

  test("pqSearch over a self-coded corpus ranks by true subspace distance") {
    // corpus == codebook: every vector's codes are its own id, so the ADC
    // total IS the exact (micro-rounded) L2 between query and neighbor
    val corpus = vecs(
      0L -> Seq(0f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(5f, 5f, 5f, 5f),
      3L -> Seq(1f, 1f, 0f, 0f))
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding",
      corpus, "vec_id", "embedding", m = 2)
    val got = Similarity.pqSearch(
      vecs(0L -> Seq(0f, 0f, 0f, 0f)), "vec_id", "embedding",
      codes, "vec_id", corpus, "vec_id", "embedding", m = 2, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // distances from origin: 1 -> 1.0, 3 -> 2.0, 2 -> 100.0 (all e6)
    assert(got.toSeq.sortBy(_._2) == Seq(
      (1L, 1L, 1000000L), (3L, 2L, 2000000L), (2L, 3L, 100000000L)))
  }

  test("pqSearch skips vectors whose codes are null (unencodable at encode time)") {
    val cb = vecs(0L -> Seq(0f, 0f), 1L -> Seq(9f, 9f))
    val corpus = Seq(
      (10L, Option(Seq(0.1f, 0f))),
      (11L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding",
      cb, "vec_id", "embedding", m = 1)
    val got = Similarity.pqSearch(vecs(99L -> Seq(0f, 0f)), "vec_id", "embedding",
      codes, "vec_id", cb, "vec_id", "embedding", m = 1, k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(10L), "null-coded vector must not appear among neighbors")
  }

  test("pqSearch: a null or dimension-mismatched query returns no rows, not phantom ranks") {
    val cb = vecs(0L -> Seq(0f, 0f), 1L -> Seq(9f, 9f))
    val corpus = vecs(10L -> Seq(0.1f, 0f), 11L -> Seq(8f, 9f))
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding",
      cb, "vec_id", "embedding", m = 1)
    val badQueries = Seq(
      (98L, Option.empty[Seq[Float]]),
      (99L, Option(Seq(1f, 2f, 3f, 4f)))).toDF("vec_id", "embedding")
    val got = Similarity.pqSearch(badQueries, "vec_id", "embedding",
      codes, "vec_id", cb, "vec_id", "embedding", m = 1, k = 5)
    assert(got.isEmpty, "garbage queries must not rank neighbors (null sorts first!)")
  }

  test("semanticDedup drops the higher-id twin and keeps everything else") {
    val corpus = vecs(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      7L -> Seq(1f, 0f, 0f, 0f),     // exact copy of 1 -> dropped
      8L -> Seq(0.9f, 0.1f, 0f, 0f), // cosine vs 1 ~ 0.994 -> dropped at tau=.99
      9L -> Seq(0.5f, 0.5f, 0f, 0f)) // cosine vs everything <= .71 -> kept
    val cents = vecs(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f))
    val kept = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      cents, "vec_id", "embedding", tau = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 9L))
    // tau above any pair similarity keeps the whole corpus
    val all = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      cents, "vec_id", "embedding", tau = 1.1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 7L, 8L, 9L))
  }

  test("semanticDedup returns each vector's cell and never compares across cells") {
    // 3 and 4 are identical but pushed to DIFFERENT cells by construction
    // impossible for identical vectors — so use near-identical vectors that
    // straddle the two centroids: each survives in its own cell
    val corpus = vecs(
      3L -> Seq(1f, 0.99f, 0f, 0f),
      4L -> Seq(0.99f, 1f, 0f, 0f))
    val cents = vecs(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f))
    val rows = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      cents, "vec_id", "embedding", tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cosine(3,4) ~ 0.9999 but they sit in cells 0 and 1 -> both kept
    assert(rows == Map(3L -> 0L, 4L -> 1L))
  }

  test("semantic decontamination flags cosine hits against the test set; null/zero vectors never flag") {
    import graft.ops.Decontaminate
    val corpus = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
        org.apache.spark.sql.Row(2L, Seq(0.97f, 0.243f, 0.0f, 0.0f)), // cos ~0.97 vs test
        org.apache.spark.sql.Row(3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),    // orthogonal
        org.apache.spark.sql.Row(4L, null),
        org.apache.spark.sql.Row(5L, Seq(0.0f, 0.0f, 0.0f, 0.0f))),   // zero norm
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val test = vecs(100L -> Seq(1f, 0f, 0f, 0f)).select($"embedding")
    val got = Decontaminate.flaggedByEmbeddingSimilarity(
        corpus, "vec_id", "embedding", test, "embedding", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.map(_._1) == Set(1L, 2L))
    assert(got.find(_._1 == 1L).get._3 == 1.0)
    // the anti-join wrapper keeps everything else, including the
    // null/zero rows (unflaggable is not removable)
    val kept = Decontaminate.removeSemanticContaminated(
        corpus, "vec_id", "embedding", test, "embedding", tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }
}
