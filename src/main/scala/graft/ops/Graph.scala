package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation — PageRank over the domain
  * graph is the classic crawl-frontier prioritizer / spam-domain
  * downweighter. LLM-pipeline extension beyond the reference engine's
  * scope, like [[Dedup]]/[[TextAnalysis]].
  *
  * Design for 100 TB:
  *  - each iteration is ONE shuffle: contributions aggregate keyed by
  *    destination (map-side combinable); the damping mix is per-row
  *    arithmetic; the dangling-mass term is a 1-row aggregate broadcast
  *    by crossJoin;
  *  - the plan tree is kept O(1) across iterations with a per-round
  *    `localCheckpoint` (the [[Dedup.clusterPairs]] pattern) — without it
  *    the lineage doubles per round and Catalyst analysis blows up;
  *  - all arithmetic is integer floor division at a fixed 1e12 total-mass
  *    scale — bit-reproducible across engines and runs, no float drift.
  *
  * Semantics: standard damped PageRank with dangling-mass redistribution,
  * on the DEDUPLICATED edge set (parallel edges collapse; self-loops
  * count like any edge). With total mass S = 1e12 and n nodes:
  * {{{
  *   r0(u)   = S div n
  *   r_k(u)  = (15 * (S div n) + 85 * (contrib(u) + dangling div n)) div 100
  *   contrib(u) = sum over in-edges (v,u) of (r_{k-1}(v) div outdeg(v))
  *   dangling   = sum of r_{k-1}(v) over v with outdeg 0
  * }}}
  * Ranks are reported in micro-of-million units (`rank_u12`).
  */
object Graph {

  /** Total rank mass: 1e12 keeps 6+ significant digits for graphs up to
    * ~1M nodes while every intermediate stays far inside int64. */
  val RankScale: Long = 1000000000000L

  /** Damped PageRank; returns (node, rank_u12). Deterministic given the
    * edge set. `iterations` is fixed-count (the curation use case ranks a
    * bounded-round approximation; convergence checks would add a per-round
    * driver action for no ranking benefit). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one edge")
    val base = RankScale / n // S div n, exact

    var rank = nodes.select(col("node"), lit(base).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val withDeg = rank.join(outdeg, Seq("node"), "left")
      // dangling mass: ranks of nodes with no out-edges (1 row, broadcast)
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val contrib = e
        .join(withDeg.filter(col("deg").isNotNull)
          .withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("CAST(r AS DECIMAL(38,0)) div deg").cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), expr(
          s"CAST(15 * $base + 85 * (COALESCE(contrib, 0) + " +
            s"CAST(dang AS DECIMAL(38,0)) div $n) AS DECIMAL(38,0)) div 100")
          .cast("long").as("r"))
        .localCheckpoint(true)
    }
    rank.select(col("node"), col("r").as("rank_u12"))
  }

  /** In/out degree per node over the deduplicated edge set — the cheap
    * companion diagnostic (hub/authority shape, dangling counts). */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Per-node triangle counts over the undirected, deduplicated edge set
    * (a link-graph cohesion signal: spam farms and boilerplate nav cliques
    * are triangle-dense, organic link neighborhoods are not).
    *
    * Degree orientation (each undirected edge directed from its
    * lower-(degree, id) endpoint) bounds wedge generation by
    * sum(out_deg^2) with out_deg <= sqrt(2m) — the MapReduce triangle
    * algorithm of Suri & Vassilvitskii (WWW'11) — so a high-degree hub
    * never enumerates its neighbor pairs. Three shuffles total: degree
    * aggregate, wedge self-join keyed on the apex, closing join keyed on
    * the canonical pair. Each triangle is found exactly once (its apex is
    * its lowest-(degree, id) vertex).
    *
    * Returns (node, n_tri) for every node in the edge set, 0 for
    * triangle-free nodes. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val und = e0.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(true)
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val lowerFirst = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .withColumn("__uFirst",
        col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")))
    val oriented = lowerFirst.select(
        when(col("__uFirst"), col("u")).otherwise(col("v")).as("src"),
        when(col("__uFirst"), col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint(true)
    // wedges at each apex; (b, c) kept in canonical lexicographic order so
    // the closing join matches und's (u < v) form directly
    val wedges = oriented.select(col("src"), col("dst").as("b"))
      .join(oriented.select(col("src"), col("dst").as("c")), Seq("src"))
      .filter(col("b") < col("c"))
    val tri = wedges.join(und, col("b") === col("u") && col("c") === col("v"))
      .select(col("src").as("x"), col("b").as("y"), col("c").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.select(col("node")).join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** The k-core of the undirected graph: the maximal subgraph in which
    * every node keeps degree >= k — the standard "dense cohesive
    * neighborhood" extractor (spam-farm / link-ring detection on a web
    * graph; the fluff of leaf pages and one-link chains peels away).
    *
    * Iterative peeling to a FIXPOINT: drop nodes of degree < k, recompute
    * degrees on the surviving edges, repeat until no node drops. Each
    * round is one degree aggregate + two semi joins keyed on node ids
    * (high cardinality, even partitioning); the surviving edge set is
    * eagerly `localCheckpoint`ed per round so the plan tree stays O(1)
    * like [[Dedup.clusterPairs]] — round count is bounded by the peel
    * depth (<= the degeneracy ordering length, shallow on web-shaped
    * graphs), never materializing anything node-history-sized.
    *
    * Returns (node, deg) for the surviving nodes with their degree INSIDE
    * the core (all >= k); empty when no k-core exists. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e0 = edges.select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    var und = e0.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(true)
    var done = false
    var edgeCount = und.count() // carried across rounds: one count job per round
    while (!done) {
      val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node")).localCheckpoint(true)
      val pruned = und
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val prunedCount = pruned.count()
      // this round's edge set is materialized — release the superseded
      // round's blocks (and the keep set, consumed by the joins above) so
      // a deep peel doesn't pin O(peelDepth x edges) in the block manager
      graft.util.Blocks.release(und)
      graft.util.Blocks.release(keep)
      done = prunedCount == edgeCount
      edgeCount = prunedCount
      und = pruned
    }
    und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
  }
}
