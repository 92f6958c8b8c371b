package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SortedContainmentGe's verdict IS directed pair membership for
  * d11/containment dedup — property-check interpreted eval against plain
  * set arithmetic, codegen against interpreted on a DataFrame, and pin
  * the asymmetry + empty-set contract. */
class ContainmentGeSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val setGen: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 60L)).map(_.distinct.sorted.toArray)

  private def refContainGe(a: Array[Long], b: Array[Long], t: Double): Boolean = {
    if (a.isEmpty) return false
    val c = a.toSet.intersect(b.toSet).size
    c.toDouble / a.length >= t
  }

  test("interpreted eval matches the set-arithmetic reference") {
    val lit = (a: Array[Long]) => Literal.create(ArrayData.toArrayData(a), ArrayType(LongType, false))
    for {
      (a, b) <- samples(Gen.zip(setGen, setGen))
      t <- Seq(0.0, 0.3, 0.5, 0.9, 1.0)
    } {
      val got = SortedContainmentGe(lit(a), lit(b), t).eval(null)
      assert(got == refContainGe(a, b, t), s"a=${a.toSeq} b=${b.toSeq} t=$t")
    }
  }

  test("codegen path on a DataFrame matches the reference, and is asymmetric") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val pairs = samples(Gen.zip(setGen, setGen), 150)
      .map { case (a, b) => (a.toSeq, b.toSeq) }
    val df = pairs.toDF("a", "b")
    val got = df.select(
      SetFunctions.containment_ge(col("a"), col("b"), 0.9).as("ab"),
      SetFunctions.containment_ge(col("b"), col("a"), 0.9).as("ba"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val want = pairs.map { case (a, b) =>
      (refContainGe(a.toArray, b.toArray, 0.9), refContainGe(b.toArray, a.toArray, 0.9))
    }
    assert(got.toSeq == want)
    // the measure is genuinely directed: some sampled pair differs by side
    assert(got.exists(p => p._1 != p._2))
  }

  test("positional early exit cannot flip a boundary pair: exhaustive c sweep at exact-ratio thresholds") {
    // sets with intersection EXACTLY c, thresholds at the pair's own
    // double ratio and one ulp around it — adversarial for the `need`
    // bound that lets the merge loop exit early
    val lit = (a: Array[Long]) => Literal.create(ArrayData.toArrayData(a), ArrayType(LongType, false))
    for {
      n1 <- 1 to 12
      n2 <- 1 to 12
      c <- 0 to math.min(n1, n2)
    } {
      val a = (0L until c).toArray ++ (100L until (100L + n1 - c)).toArray
      val b = (0L until c).toArray ++ (200L until (200L + n2 - c)).toArray
      val ratio = c.toDouble / n1
      for (t <- Seq(ratio, Math.nextUp(ratio), Math.nextDown(ratio), ratio - 0.01, ratio + 0.01)
             if t >= 0.0 && t <= 1.0) {
        val got = SortedContainmentGe(lit(a), lit(b), t).eval(null)
        assert(got == refContainGe(a, b, t),
          s"n1=$n1 n2=$n2 c=$c t=$t ratio=$ratio")
      }
    }
  }

  test("subset scores 1.0 regardless of container size; empty left is false") {
    val lit = (a: Array[Long]) => Literal.create(ArrayData.toArrayData(a), ArrayType(LongType, false))
    val small = Array(3L, 7L, 9L)
    val big = (0L to 1000L).toArray
    assert(SortedContainmentGe(lit(small), lit(big), 1.0).eval(null) == true)
    // Jaccard on the same pair is tiny — the asymmetric measure sees it
    assert(SortedJaccardGe(lit(small), lit(big), 0.1).eval(null) == false)
    assert(SortedContainmentGe(lit(Array.empty[Long]), lit(big), 0.0).eval(null) == false)
    assert(SortedContainmentGe(lit(small), lit(Array.empty[Long]), 0.5).eval(null) == false)
  }

  test("containmentPairs finds the seeded contained doc, directed") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      // doc 2 contains doc 1's text verbatim inside a longer document
      (2L, "PREFIX material here. the quick brown fox jumps over the lazy dog near the river bank today. SUFFIX trailing content extends this document further."),
      (3L, "completely unrelated text about compilers and type systems")
    ).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.containmentPairs(docs, "doc_id", "text", n = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // 1 contained in 2
    assert(!pairs.contains((2L, 1L))) // 2 not contained in 1
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
