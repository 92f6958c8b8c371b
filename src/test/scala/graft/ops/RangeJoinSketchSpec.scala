package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketized range join vs the naive nested loop, and the Count-Min
  * sketch's estimate/size/merge properties. */
class RangeJoinSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("bucketized range join == naive nested loop on random data") {
    val pts = samples(Gen.chooseNum(-100.0, 100.0), 200).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
    val ivs = samples(Gen.zip(Gen.chooseNum(-100.0, 90.0), Gen.chooseNum(0.0, 25.0)), 60)
      .zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
      .toDF("iid", "lo", "hi")
    val naive = RangeJoin.pointInIntervalNaive(pts, "v", ivs, "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", bucketWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive && naive.nonEmpty)
  }

  test("range join bounds are inclusive on both ends") {
    val pts = Seq((1L, 5.0), (2L, 10.0), (3L, 4.999), (4L, 10.001)).toDF("pid", "v")
    val ivs = Seq((9L, 5.0, 10.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 3.0)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("bucketized plan is an equi-join; the naive plan is the nested-loop trap") {
    val pts = Seq((1L, 5.0)).toDF("pid", "v")
    val ivs = Seq((9L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val bucketedPlan = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("BroadcastNestedLoop") &&
      !bucketedPlan.contains("CartesianProduct"), bucketedPlan)
    val naivePlan = RangeJoin.pointInIntervalNaive(pts, "v", ivs, "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoop") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("interval overlap == naive condition join; each pair exactly once") {
    val as = samples(Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0.0, 30.0)), 50)
      .zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
      .toDF("aid", "alo", "ahi")
    val bs = samples(Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0.0, 20.0)), 40)
      .zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
      .toDF("bid", "blo", "bhi")
    val naive = as.join(bs, as("alo") <= bs("bhi") && bs("blo") <= as("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bucketed = RangeJoin.intervalOverlap(as, "alo", "ahi", bs, "blo", "bhi", 7.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: exactly-once emission, no distinct pass needed
    assert(bucketed.sorted.toSeq == naive.sorted.toSeq && naive.nonEmpty)
  }

  test("CMS never under-estimates, and is exact for a key with no collisions") {
    val words = samples(Gen.oneOf("a", "b", "c", "d", "e", "f"), 500)
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("i", "tok")
    val sketch = Sketch.countMin(words, "tok")
    val truth = words.groupBy("tok").agg(count(lit(1)).as("n"))
    val est = Sketch.countMinEstimate(sketch, truth, "tok")
    val rows = truth.join(est, Seq("tok")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (tok, n, e) => assert(e >= n, s"$tok under-estimated: $e < $n") }
    // 6 distinct keys in 4 x 4096 cells: collisions are impossible at
    // depth 4 unless md5 collides on 3-hex prefixes in EVERY row — then
    // estimates are exact
    rows.foreach { case (tok, n, e) => assert(e == n, s"$tok: $e != $n") }
  }

  test("CMS counters are partitioning-invariant and the sketch is bounded") {
    val words = (1 to 1000).map(i => (i.toLong, s"w${i % 37}")).toDF("i", "tok")
    val a = Sketch.countMin(words.repartition(1), "tok").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = Sketch.countMin(words.repartition(13), "tok").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a == b && a.nonEmpty)
    assert(a.size <= 4 * 4096)
    // totals per hash row equal the stream length (counter conservation)
    (0 until 4).foreach { r =>
      assert(a.collect { case ((`r`, _), c) => c }.sum == 1000L)
    }
  }

  test("streaming CMS deltas: batches accumulate, a REPLAYED batch does not double-count") {
    import graft.meta.LocalCatalog
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("cms-wh").toString)
    val sink = Sketch.streamingCountMin(spark, catalog, "cms_log", "tok")
    val b1 = Seq("a", "b", "a").toDF("tok")
    val b2 = Seq("b", "c").toDF("tok")
    sink(b1, 0L)
    sink(b2, 1L)
    sink(b2, 1L) // replay of batch 1 — upsert keyed by batch_id absorbs it
    val live = Sketch.readCountMin(spark, catalog, "cms_log")
    val expected = Sketch.countMin(b1.unionAll(b2), "tok").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = live.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // and the estimates over the streamed sketch match the batch sketch
    val est = Sketch.countMinEstimate(live, Seq("a", "b", "c", "zz").toDF("tok"), "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") == 2L && est("b") == 2L && est("c") == 1L && est("zz") == 0L)
  }

  test("estimating an unseen key yields 0") {
    val words = Seq((1L, "seen")).toDF("i", "tok")
    val sketch = Sketch.countMin(words, "tok")
    val est = Sketch.countMinEstimate(sketch,
      Seq(("unseen-key-zzz", 1)).toDF("tok", "x"), "tok")
    assert(est.head().getLong(1) == 0L)
  }

  test("HLL sketch is bounded, duplicate-blind, partitioning-invariant, and merges by max") {
    val items = (1 to 5000).map(i => s"item-${i % 700}").toDF("x")
    val sk = Sketch.hyperLogLog(items, "x")
    val rows = sk.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size <= 256)
    // duplicates land on identical (reg, rho): distinct input -> same sketch
    val distinctSk = Sketch.hyperLogLog(items.distinct(), "x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == distinctSk)
    val repart = Sketch.hyperLogLog(items.repartition(17), "x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == repart)
    // mergeability: sketch(A union B) == max-merge of sketch(A), sketch(B)
    val a = items.filter(col("x") < "item-4")
    val b = items.filter(col("x") >= "item-4")
    val merged = Sketch.hyperLogLog(a, "x").unionAll(Sketch.hyperLogLog(b, "x"))
      .groupBy("reg").agg(max("rho").as("rho")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == rows)
  }

  test("HLL corrected estimate lands within tolerance across cardinality regimes") {
    // m=256 -> theoretical standard error 1.04/sqrt(256) ~ 6.5%; the md5
    // hash makes each run deterministic, so a 7% bound is a real check
    for (n <- Seq(150, 2000, 30000)) {
      val items = (1 to n).map(i => s"u$i-${i * 2654435761L}").toDF("x")
      val est = Sketch.hllCountDistinct(items, "x")
      assert(math.abs(est - n) <= math.max(0.07 * n, 8.0),
        s"n=$n est=$est (off by ${math.abs(est - n).toDouble / n})")
    }
  }

  test("quantile histogram: exact bin math, clamping, and additive merge") {
    val vals = (0 until 10).map(i => (i.toLong, i.toDouble)).toDF("i", "v")
    val hist = Sketch.quantileHistogram(vals, "v", lo = 0.0, hi = 10.0, nBins = 10)
    assert(hist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      (0L to 9L).map(_ -> 1L).toMap)
    val byQ = Sketch.quantileEstimate(hist, Seq(500000L, 1000000L), 0.0, 10.0, 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // p50 of 10 rows: target=5, first cum>=5 is bin 4, upper edge 5.0
    assert(byQ(500000L) == ((4L, 5000000L)))
    // p100: last occupied bin
    assert(byQ(1000000L) == ((9L, 10000000L)))
    // out-of-range values clamp to the edge bins
    val wild = Seq((1L, -5.0), (2L, 99.0)).toDF("i", "v")
    val clamped = Sketch.quantileHistogram(wild, "v", 0.0, 10.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clamped == Map(0L -> 1L, 9L -> 1L))
    // merge = adding bin counters across splits
    val a = Sketch.quantileHistogram(vals.filter($"v" < 5), "v", 0.0, 10.0, 10)
    val b = Sketch.quantileHistogram(vals.filter($"v" >= 5), "v", 0.0, 10.0, 10)
    val merged = a.unionAll(b).groupBy("bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == hist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("grouped quantile histogram equals the per-group ungrouped computation") {
    val vals = (0 until 60).map(i => (if (i % 3 == 0) "a" else "b", (i % 20).toDouble))
      .toDF("g", "v")
    val grouped = Sketch.quantileEstimateBy(
      Sketch.quantileHistogramBy(vals, "g", "v", 0.0, 20.0, 20),
      "g", Seq(500000L, 900000L), 0.0, 20.0, 20)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("a", "b")) {
      val single = Sketch.quantileEstimate(
        Sketch.quantileHistogram(vals.filter($"g" === g), "v", 0.0, 20.0, 20),
        Seq(500000L, 900000L), 0.0, 20.0, 20)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      for (q <- Seq(500000L, 900000L))
        assert(grouped((g, q)) == single(q), s"group $g q $q")
    }
  }

  test("streaming HLL deltas: batches accumulate by max, a REPLAYED batch is absorbed") {
    import graft.meta.LocalCatalog
    val catalog = LocalCatalog(
      java.nio.file.Files.createTempDirectory("hll-wh").toString)
    val sink = Sketch.streamingHyperLogLog(spark, catalog, "hll_log", "tok")
    val b1 = (1 to 300).map(i => s"a$i").toDF("tok")
    val b2 = (200 to 500).map(i => s"a$i").toDF("tok") // overlaps b1
    sink(b1, 0L)
    sink(b2, 1L)
    sink(b2, 1L) // replay — upsert keyed by (batch_id, reg) absorbs it
    val live = Sketch.readHyperLogLog(spark, catalog, "hll_log").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketch.hyperLogLog(b1.unionAll(b2), "tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(live == direct)
  }

  test("bloom prune never drops a true match and does prune non-matches") {
    val build = (1 to 200).map(i => i * 7L).toDF("k")
    val probe = (1 to 5000).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
    val bits = Sketch.bloomBits(build, "k")
    assert(bits.count() <= 4096 && bits.count() <= 3 * 200)
    val cand = Sketch.bloomPrune(probe, "k", bits)
    val candKeys = cand.select("k").collect().map(_.getLong(0)).toSet
    val trueKeys = probe.join(build, Seq("k"), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(candKeys), "false negative: bloom dropped a true match")
    // 600ish bits of 4096 set -> fp rate ~0.3%: pruning must bite hard
    assert(candKeys.size < 5000 / 2, s"bloom barely pruned: ${candKeys.size}")
    // payload column untouched
    assert(cand.columns.toSeq == Seq("k", "payload"))
  }

  test("bloom prune plan: broadcast semi joins only, probe side never shuffled") {
    val build = (1 to 50).map(_.toLong).toDF("k")
    val probe = (1 to 100).map(i => (i.toLong, i)).toDF("k", "v")
    val plan = Sketch.bloomPrune(probe, "k", Sketch.bloomBits(build, "k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"), plan)
    // the only exchanges are the bounded bit-set build (distinct + broadcast),
    // never a hash-partitioning of the probe relation
    assert(!plan.contains("hashpartitioning(k"), plan)
  }
}
