package graft.exec

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins q14's join strategy at BENCH-scale stats (sf0.1): the position-
  * delete anti join must stay a BroadcastHashJoin with zero data-side
  * shuffle when the delete side's plan-time size estimate is under
  * [[Mor.BroadcastDeleteBytesMax]]. Plan-only (nothing executes), so the
  * full sf0.1 lineitem scan is free here — this is the spec ruling the
  * stat-based gate out as the cause if the q14 bench line drifts. */
class Q14BenchScalePlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf01 = "/root/testdata/sf0.1"

  test("q14 shape at sf0.1 stats: broadcast anti join, no data-side shuffle") {
    val data = spark.read.parquet(s"$sf01/lineitem.parquet").select(
      col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("l_partkey"),
      concat(lit("f"), (col("l_orderkey") % 7).cast("string")).as(Mor.FilePathCol),
      (col("l_orderkey") * 10 + col("l_linenumber")).as(Mor.PosCol),
      (lit(3) + col("l_orderkey") % 5).as(Mor.SeqNumCol))
    val dels = data.filter(col("l_partkey") % 13 === 0)
      .select(col(Mor.FilePathCol), col(Mor.PosCol))

    // the gate must see a sub-threshold estimate for the sf0.1 delete side
    val est = dels.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est <= Mor.BroadcastDeleteBytesMax,
      s"delete-side estimate $est exceeds the gate at sf0.1 — the gate WOULD flip q14")

    val plan = Mor.applyPositionDeletes(data, dels)
      .select(col("l_orderkey"), col("l_linenumber"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"q14 must broadcast the delete side at sf0.1 stats:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange hashpartitioning"),
      s"q14 data side must not shuffle at sf0.1 stats:\n$plan")
  }
}
