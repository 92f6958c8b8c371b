package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SortedJaccardGe is load-bearing for d4/d6 correctness: its verdict IS
  * pair membership. Property-check the interpreted eval against a plain
  * Scala set computation, and the codegen path against the
  * array_intersect formulation on a DataFrame. */
class JaccardGeSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val setGen: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 60L)).map(_.distinct.sorted.toArray)

  private def refJaccardGe(a: Array[Long], b: Array[Long], t: Double): Boolean = {
    val c = a.toSet.intersect(b.toSet).size
    c.toDouble / (a.length + b.length - c) >= t
  }

  test("interpreted eval matches the set-arithmetic reference") {
    val lit = (a: Array[Long]) => Literal.create(ArrayData.toArrayData(a), ArrayType(LongType, false))
    for {
      (a, b) <- samples(Gen.zip(setGen, setGen))
      if a.nonEmpty || b.nonEmpty
      t <- Seq(0.0, 0.3, 0.5, 0.6, 1.0)
    } {
      val got = SortedJaccardGe(lit(a), lit(b), t).eval(null)
      assert(got == refJaccardGe(a, b, t), s"a=${a.toSeq} b=${b.toSeq} t=$t")
    }
  }

  test("codegen path agrees with array_intersect on a DataFrame") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rows = samples(Gen.zip(setGen, setGen), 300)
      .collect { case (a, b) if a.nonEmpty && b.nonEmpty => (a.toSeq, b.toSeq) }
    val df = rows.toDF("a", "b")
    val c = size(array_intersect($"a", $"b")).cast("double")
    val expected = df.withColumn("ok", c / (size($"a") + size($"b") - c) >= 0.5)
    val got = df.withColumn("ok", SetFunctions.jaccard_ge($"a", $"b", 0.5))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("positional early exit cannot flip a boundary pair: exhaustive c sweep at exact-ratio thresholds") {
    // for every (n1, n2, c) shape, build sets with intersection EXACTLY c
    // (shared prefix 0..c-1, then disjoint tails) and test thresholds AT
    // the pair's own double ratio and one ulp around it — the adversarial
    // inputs for the `need` bound that lets the merge loop exit early
    val lit = (a: Array[Long]) => Literal.create(ArrayData.toArrayData(a), ArrayType(LongType, false))
    for {
      n1 <- 1 to 12
      n2 <- 1 to 12
      c <- 0 to math.min(n1, n2)
    } {
      val a = (0L until c).toArray ++ (100L until (100L + n1 - c)).toArray
      val b = (0L until c).toArray ++ (200L until (200L + n2 - c)).toArray
      val ratio = c.toDouble / (n1 + n2 - c)
      for (t <- Seq(ratio, Math.nextUp(ratio), Math.nextDown(ratio), ratio - 0.01, ratio + 0.01)
             if t >= 0.0 && t <= 1.0) {
        val got = SortedJaccardGe(lit(a), lit(b), t).eval(null)
        assert(got == refJaccardGe(a, b, t),
          s"n1=$n1 n2=$n2 c=$c t=$t ratio=$ratio")
      }
    }
  }

  test("null inputs yield null") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(SetFunctions.jaccard_ge($"a", $"b", 0.5)).head.isNullAt(0))
  }
}
