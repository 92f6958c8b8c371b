package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VectorFunctions

/** Binary sign quantization + Hamming top-k ([[Similarity.binarySignCodes]],
  * [[Similarity.hammingTopK]], [[graft.functions.VecHamming]]). */
class HammingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("binarySignCodes packs bit d%32 of word d/32, set iff dim > 0") {
    // dims 0 and 3 positive -> bits 0 and 3 of word 0 = 1 + 8
    val one = vecs(0L -> Seq(1f, -1f, 0f, 2f))
    val r = Similarity.binarySignCodes(one, "vec_id", "embedding").collect()(0)
    assert(r.getLong(1) == 4L)
    assert(r.getSeq[Long](2) == Seq(9L))

    // 33 dims: dim 32 lands in word 1 bit 0; dim 31 is word 0 bit 31
    val long = vecs(1L -> (Seq.fill(31)(-1f) ++ Seq(3f, 5f)))
    val r2 = Similarity.binarySignCodes(long, "vec_id", "embedding").collect()(0)
    assert(r2.getLong(1) == 33L)
    assert(r2.getSeq[Long](2) == Seq(1L << 31, 1L))
  }

  test("vec_hamming equals the HOF aggregate(zip_with(bit_count(xor))) form") {
    val df = Seq(
      (Seq(9L, 1L), Seq(9L, 1L)),
      (Seq(9L, 1L), Seq(8L, 3L)),
      (Seq(0L, 0L), Seq(0xffffffffL, 1L << 31)),
      (Seq(Long.MaxValue, -1L), Seq(0L, 1L))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.vec_hamming(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y)), 0, (acc, d) -> acc + d)")
        .as("hof")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 2, 33, 63 + 63))
  }

  test("vec_hamming is NULL on length mismatch or null elements, like the HOF form") {
    val df = Seq(
      (Seq(1L, 2L), Seq(1L)),
      (Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(df.select(VectorFunctions.vec_hamming(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
    val withNull = spark.sql("SELECT array(1L, NULL) AS a, array(1L, 2L) AS b")
    assert(withNull.select(VectorFunctions.vec_hamming(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("hammingTopK ranks by (distance, neighbor id) and broadcasts the query side") {
    // 0 matches query signs exactly; 1 flips one dim; 2 flips three
    val corpus = vecs(
      0L -> Seq(1f, -1f, 1f, -1f),
      1L -> Seq(1f, -1f, 1f, 1f),
      2L -> Seq(-1f, 1f, -1f, -1f),
      9L -> Seq(1f, -1f, 1f, -1f))
    val queries = vecs(9L -> Seq(1f, -1f, 1f, -1f))
    val got = Similarity.hammingTopK(queries, corpus, "vec_id", "embedding", k = 3)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((9L, 0L, 1L, 0L), (9L, 1L, 2L, 1L), (9L, 2L, 3L, 3L)))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side should broadcast:\n$plan")
  }

  test("hammingTopK agrees with exact sign-flip counts on 64-dim fixture vectors") {
    // deterministic +-1 vectors: vector v's dim d is positive iff
    // (v * 31 + d * 7) % 3 != 0 — re-derived below for the expectation
    def sign(v: Long, d: Int): Float = if ((v * 31 + d * 7) % 3 != 0) 1f else -1f
    val rows = (0L until 20L).map(v => v -> (0 until 64).map(d => sign(v, d)))
    val df = vecs(rows: _*)
    val got = Similarity.hammingTopK(df.filter(col("vec_id") < 2), df,
      "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    def dist(a: Long, b: Long): Long =
      (0 until 64).count(d => (sign(a, d) > 0) != (sign(b, d) > 0)).toLong
    got.foreach { case ((q, n), d) => assert(d == dist(q, n), s"pair ($q, $n)") }
  }
}
