package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PageRank: checked against an independent in-memory reference that uses
  * the exact same integer floor-division formula, plus structural
  * properties (dangling handling, sink attraction, determinism).
  */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference implementation over Scala maps. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = Graph.RankScale / n
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / out(src) }.sum
      }
      r = nodes.map(u =>
        u -> (15 * base + 85 * (contrib.getOrElse(u, 0L) + dangling / n)) / 100).toMap
    }
    r
  }

  private val g = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
    ("e", "e"), ("b", "f") // f is dangling (no out-edges)
  )

  test("matches the integer reference formula exactly, every iteration count") {
    for (k <- Seq(1, 3, 7)) {
      val got = Graph.pageRank(g.toDF("s", "d"), "s", "d", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == refPageRank(g, k), s"mismatch at $k iterations")
    }
  }

  test("parallel edges collapse; rank mass stays within rounding of the total") {
    val dup = g ++ g ++ Seq(("a", "b"))
    val got = Graph.pageRank(dup.toDF("s", "d"), "s", "d", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(g, 3), "duplicate edges must not change ranks")
    val total = got.values.sum
    // floor divisions only lose mass, bounded by ~1 unit per div per node
    assert(total <= Graph.RankScale && total > Graft.tolerance(Graph.RankScale),
      s"mass $total out of range")
  }

  test("a sink pair attracts rank; uniform start breaks toward in-degree") {
    // star into 'hub': everyone links hub, hub links nobody (dangling)
    val star = Seq(("u1", "hub"), ("u2", "hub"), ("u3", "hub"), ("u4", "hub"))
    val ranks = Graph.pageRank(star.toDF("s", "d"), "s", "d", 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("hub") > ranks("u1") * 3, s"hub must dominate: $ranks")
    assert(Seq("u1", "u2", "u3", "u4").map(ranks).distinct.size == 1,
      "symmetric leaves must tie exactly")
  }

  test("degrees: out/in over the deduplicated edge set") {
    val d = Graph.degrees(g.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d("a") == ((2L, 1L)))
    assert(d("c") == ((1L, 3L)))
    assert(d("f") == ((0L, 1L)))
    assert(d("e") == ((1L, 1L))) // self-loop counts both ways
  }

  test("triangleCounts: square with a diagonal, dups/reversals/self-loops ignored") {
    // a-b-c-d-a plus diagonal a-c: triangles (a,b,c) and (a,c,d); edge x-y
    // is triangle-free; b-a reverses an existing edge, e-e is a self-loop
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("b", "a"), ("x", "y"), ("e", "e")).toDF("s", "d")
    val got = Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 2L, "d" -> 1L,
      "x" -> 0L, "y" -> 0L))
    // K4: every node in C(3,3)=3 triangles, 4 triangles total
    val k4 = (for { u <- Seq("p", "q", "r", "s"); v <- Seq("p", "q", "r", "s") if u < v }
      yield (u, v)).toDF("s", "d")
    val k = Graph.triangleCounts(k4, "s", "d")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(k.values.toSeq == Seq.fill(4)(3L))
  }

  test("kCore: peels tails and pendants, keeps cycles/cliques; deep chain terminates") {
    // triangle (a,b,c) + tail c-t1-t2-t3: 2-core = the triangle alone
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "t1"), ("t1", "t2"), ("t2", "t3")).toDF("s", "d")
    val core2 = Graph.kCore(edges, "s", "d", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core2 == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // 3-core of the same graph is empty (triangle degrees are 2)
    assert(Graph.kCore(edges, "s", "d", k = 3).isEmpty)
    // K4 survives its own 3-core with degree 3 everywhere
    val k4 = (for { u <- Seq("p", "q", "r", "s"); v <- Seq("p", "q", "r", "s") if u < v }
      yield (u, v)).toDF("s", "d")
    val core3 = Graph.kCore(k4, "s", "d", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core3 == Map("p" -> 3L, "q" -> 3L, "r" -> 3L, "s" -> 3L))
    // a 30-node path peels one end per round off its anchor — the
    // deep-chain case the per-round localCheckpoint must survive
    val path = (0 until 29).map(i => (s"n$i", s"n${i + 1}")) :+ (("n0", "n29"))
    val cyc = Graph.kCore(path.toDF("s", "d"), "s", "d", k = 2)
    assert(cyc.count() == 30) // closing edge makes it a cycle: all survive
    val open = (0 until 29).map(i => (s"n$i", s"n${i + 1}"))
    assert(Graph.kCore(open.toDF("s", "d"), "s", "d", k = 2).isEmpty)
  }
}

/** Tolerance helper kept out of the test bodies. */
private object Graft {
  def tolerance(scale: Long): Long = scale - scale / 1000 // 0.1 % floor-loss envelope
}
