package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The LSH hot-bucket caps are skew-IMMUNE: the over-cap key list comes
  * from a grouped count (partial aggregation absorbs a mega-hot key
  * map-side) and is applied as a broadcast ANTI join, so no task ever
  * buffers a whole hot bucket the way a `count().over(Window)` cap would.
  * These specs pin (1) semantics — identical survivors to the window
  * formulation, (2) the plan — no Window node anywhere on a cap path, a
  * broadcast anti join present, and (3) the skew contract — a planted
  * mega-hot bucket is dropped whole without a window shuffle.
  */
class HotBucketCapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dropHotBuckets matches the window-cap formulation exactly") {
    val rows = (1 to 500).map(i => (i.toLong, s"b${i % 7}")) ++ // 7 buckets ~71 rows each
      (1000 to 1300).map(i => (i.toLong, "hot"))                 // one 301-row hot bucket
    val df = rows.toDF("id", "bh")
    val viaGroup = Dedup.dropHotBuckets(df, Seq("bh"), cap = 100)
    val viaWindow = df.withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bh"))))
      .filter(col("__n") <= 100).drop("__n")
    assert(viaGroup.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaGroup).isEmpty)
    assert(viaGroup.filter(col("bh") === "hot").isEmpty, "hot bucket must be dropped whole")
    assert(viaGroup.count() === 500L)
  }

  test("cap path plans: no Window; anti join only when hot buckets exist") {
    // 52 buckets of ~4 rows under cap=10: NO over-cap bucket exists, so
    // the cap must cost NOTHING in the plan — no Window, no anti join
    // (the r11 form always planned the anti join and paid a histogram
    // checkpoint + count probe per call even when there was nothing to drop)
    val bands = (1 to 200).map(i => (i.toLong, i % 4, s"h${i % 13}"))
      .toDF("id", "band", "bh")
    val plan = Dedup.lshCandidatePairs(bands, maxBucketSize = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"cap must not plan a window:\n$plan")
    assert(!plan.contains("LeftAnti"),
      s"no hot bucket -> the cap must vanish from the plan:\n$plan")
    // planted hot bucket: the anti join appears, broadcast, and its build
    // side is the driver-collected key list (a local relation, not a
    // distributed subtree with its own checkpoint blocks)
    val hot = (1 to 40).map(i => (i.toLong, 0, "same")) ++
      (100 to 120).map(i => (i.toLong, 1, s"h$i"))
    val hotPlan = Dedup.lshCandidatePairs(hot.toDF("id", "band", "bh"), maxBucketSize = 10)
      .queryExecution.executedPlan.toString
    assert(!hotPlan.contains("Window"), s"cap must not plan a window:\n$hotPlan")
    assert(hotPlan.contains("LeftAnti") && hotPlan.contains("LocalTableScan"),
      s"hot bucket -> broadcast anti join against the collected key list:\n$hotPlan")
  }

  test("planted mega-hot bucket: bounded candidates, hot rows never pair") {
    // 2000 docs sharing ONE band hash (the license-header scenario) plus a
    // healthy tail; the cap must kill the hot bucket pre-join so the pair
    // count stays at the tail's contribution, not 2000^2/2
    val hot = (1 to 2000).map(i => (i.toLong, 0, "same"))
    val tail = (10000 to 10009).map(i => (i.toLong, 0, "tailbucket"))
    val bands = (hot ++ tail).toDF("id", "band", "bh")
    val pairs = Dedup.lshCandidatePairs(bands, maxBucketSize = 100)
    assert(pairs.count() === 45L) // C(10,2) from the tail bucket only
    assert(pairs.filter(col("id1") <= 2000).isEmpty)
  }

  test("winnow pair cap and cross-table join cap share the skew-immune form") {
    val docs = (1 to 30).map(i =>
      (i.toLong, s"the quick brown fox $i jumps over the lazy dog number $i end")).toDF("doc_id", "text")
    val wPlan = Dedup.winnowNearDupPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!wPlan.contains("Window"), s"winnow cap must not plan a window:\n$wPlan")
    val jPlan = Dedup.minHashJoin(docs, docs, "doc_id", "text", "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!jPlan.contains("Window"), s"fuzzy-join cap must not plan a window:\n$jPlan")
  }

  test("winnowCapReport flags a selectivity collapse before pairs silently vanish") {
    // healthy corpus: distinct texts with seeded near-dups — low drop ppm,
    // pairs flow
    val healthy = (1L to 120L)
      .map(i => (i, s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i"))
      .toDF("doc_id", "text")
    val seeded = healthy.unionAll(healthy.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text")))
    val okRow = Dedup.winnowCapReport(seeded, "doc_id", "text",
      k = 12, maxBucketSize = 64).head
    assert(okRow.getAs[Long]("dropped_occurrence_ppm") < 100000L,
      s"healthy corpus must not be near the cap cliff: $okRow")
    assert(Dedup.winnowNearDupPairs(seeded, "doc_id", "text",
      k = 12, minOverlapPpm = 500000L, maxBucketSize = 64).count() >= 60)

    // collapsed selectivity (the sf1-anchor failure shape): every doc
    // shares one boilerplate text, so every gram bucket holds the whole
    // corpus — the pair stage answers ZERO, and the report says WHY
    val collapsed = (1L to 200L).map(i => (i, "the same boilerplate " * 8))
      .toDF("doc_id", "text")
    val badRow = Dedup.winnowCapReport(collapsed, "doc_id", "text",
      k = 12, maxBucketSize = 64).head
    assert(badRow.getAs[Long]("dropped_occurrence_ppm") > 900000L,
      s"a collapsed corpus must read as cap-saturated: $badRow")
    assert(badRow.getAs[Long]("over_cap_buckets") > 0)
    assert(Dedup.winnowNearDupPairs(collapsed, "doc_id", "text",
      k = 12, minOverlapPpm = 500000L, maxBucketSize = 64).count() == 0,
      "the cap drops everything — exactly what the report predicts")
  }

  test("scaledWinnowCap: identity at/below the tuned size, ceil-linear above") {
    assert(Dedup.scaledWinnowCap(5000, 5000, 64) === 64)
    assert(Dedup.scaledWinnowCap(100, 5000, 64) === 64) // never below the tuned cap
    assert(Dedup.scaledWinnowCap(50000, 5000, 64) === 640) // the sf1 anchor's 10x
    assert(Dedup.scaledWinnowCap(5001, 5000, 64) === 65) // ceil: never tightens
    assert(Dedup.scaledWinnowCap(Long.MaxValue / 2, 1, 64) === Int.MaxValue)
    // the cap IS a document-frequency threshold: cap(n)/n >= baseCap/baseDocs
    for (n <- Seq(5001L, 7919L, 50000L, 1000000L))
      assert(Dedup.scaledWinnowCap(n, 5000, 64).toLong * 5000 >= 64L * n)
  }

  test("scaled cap recovers recall the fixed cap loses at 2x volume") {
    // 16 identical docs: every gram bucket holds all 16. A cap tuned to 8
    // at an 8-doc corpus drops every bucket at 16 docs (the anchor's
    // zero-recall collapse in miniature); the scaled cap (8 * 16/8 = 16)
    // keeps them, and every doc pairs with every other.
    val t = "the winnowing guarantee makes shared runs fingerprintable end"
    val docs = (1L to 16L).map(i => (i, t)).toDF("doc_id", "text")
    val fixed = Dedup.winnowNearDupPairs(docs, "doc_id", "text",
      k = 8, w = 5, minOverlapPpm = 500000L, maxBucketSize = 8)
    assert(fixed.isEmpty, "over-cap buckets are dropped whole at the fixed cap")
    val scaled = Dedup.winnowNearDupPairs(docs, "doc_id", "text",
      k = 8, w = 5, minOverlapPpm = 500000L,
      maxBucketSize = Dedup.scaledWinnowCap(16, 8, 8))
    assert(scaled.count() === 120L) // C(16,2)
  }
}
