package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("backward as-of: latest prior value, inclusive ties, null before first") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 7L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 900.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out("a").isEmpty)          // ts=5: nothing at or before
    assert(out("b").contains(100.0))  // ts=10: tie is inclusive (<=)
    assert(out("c").contains(150.0))  // ts=20: latest prior is 15
    assert(out("d").isEmpty)          // k=2 ts=7: right row is at 9 (after)
  }

  test("left rows and columns are fully preserved") {
    val left = Seq((1L, 1L, "x")).toDF("k", "ts", "payload")
    val right = Seq((9L, 1L, 5.0)).toDF("k", "ts", "v") // different key
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "ts", "payload", "asof_v"))
    assert(out.count() == 1 && out.head.isNullAt(3))
  }
}
