package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact heavy hitters: Misra-Gries pruning soundness (candidate superset)
  * and exactness/partition-independence of the final answer.
  */
class HeavyHitterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Zipf-ish deterministic stream: item i appears ~1000/i times. */
  private def stream: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i")) ++
      (1 to 500).map(i => s"rare$i")

  test("exact answer equals the naive GROUP BY ... HAVING, any partitioning") {
    val naive = {
      val n = stream.size
      stream.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 20 > n }.toMap
    }
    for (parts <- Seq(1, 3, 8)) {
      val df = stream.toDF("item").repartition(parts)
      val got = Sketch.heavyHitters(df, "item", 20)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == naive, s"mismatch at $parts partitions")
    }
  }

  test("Misra-Gries candidates are a superset of the true heavy hitters, and bounded") {
    val df = stream.toDF("item").repartition(4)
    val candidates = Sketch.misraGriesCandidates(df, "item", 20)
      .collect().map(_.getString(0)).toSet
    val n = stream.size
    val truth = stream.groupBy(identity).collect {
      case (x, occ) if occ.size * 20 > n => x
    }.toSet
    assert(truth.subsetOf(candidates), s"missing: ${truth -- candidates}")
    assert(candidates.size <= 20 * 4, "at most k candidates per partition")
  }

  test("candidate pass broadcasts; full domain never shuffles into the count") {
    val df = stream.toDF("item")
    val plan = Sketch.heavyHitters(df, "item", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected the broadcast candidate semi join:\n$plan")
  }

  test("degenerate cases: uniform data below threshold, and tiny k") {
    val uniform = (1 to 100).map(i => s"u$i").toDF("item")
    assert(Sketch.heavyHitters(uniform, "item", 50).isEmpty)
    // k=2: only a strict-majority item qualifies
    val majority = (Seq.fill(60)("yes") ++ Seq.fill(40)("no")).toDF("item")
    val got = Sketch.heavyHitters(majority, "item", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("yes" -> 60L))
  }
}
