package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch, relationally: approximate frequency counting whose
  * state is a FIXED-SIZE table of counters, however large the stream.
  *
  * The sketch is `depth` hash rows of `16^cellHexChars` cells; an item's
  * cell in row r is the first `cellHexChars` hex chars of `md5("r:item")`
  * (md5 so the DuckDB oracle reproduces every counter exactly). Point
  * estimates are `min` over rows of the landed cell's counter —
  * over-estimates only, with the usual (ε, δ) bounds from width/depth.
  *
  * Scale shape: building the sketch is ONE aggregate whose output
  * cardinality is capped at `depth * width` rows regardless of input
  * size — partial aggregation collapses each partition to at most that
  * many counters before the (tiny) shuffle, which is precisely why CMS
  * works as a distributed one-pass: counter matrices merge by addition,
  * and map-side combine IS that merge. Estimation broadcasts the
  * bounded sketch.
  */
object Sketch {

  private def cellCols(itemCol: String, depth: Int, cellHexChars: Int) =
    (0 until depth).map { r =>
      substring(md5(concat(lit(s"$r:"), col(itemCol))), 1, cellHexChars)
    }

  /** Build the sketch: one row per (hash row, cell) with its counter.
    * At most `depth * 16^cellHexChars` rows — bounded, broadcastable. */
  def countMin(items: DataFrame, itemCol: String,
      depth: Int = 4, cellHexChars: Int = 3): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(cellHexChars >= 1 && cellHexChars <= 8,
      s"cellHexChars must be in [1,8], got $cellHexChars")
    items
      .select(posexplode(array(cellCols(itemCol, depth, cellHexChars): _*))
        .as(Seq("r", "cell")))
      .groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each key against a built sketch:
    * min over hash rows of the landed counter (0 if a cell is empty —
    * the key was never seen). The sketch side is broadcast: its size is
    * bounded by construction. Returns keys + `cms_est`. */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, cellHexChars: Int = 3): DataFrame =
    keys
      .select(col(keyCol), posexplode(array(cellCols(keyCol, depth, cellHexChars): _*))
        .as(Seq("r", "cell")))
      .join(broadcast(sketch), Seq("r", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** Streaming CMS maintenance as a `foreachBatch` sink: each
    * micro-batch's bounded sketch lands as a DELTA keyed by
    * (batch_id, r, cell) — an atomic upsert, so a REPLAYED batch
    * overwrites its own rows instead of double-counting (the
    * read-modify-write merge a naive implementation does is not
    * idempotent; this is). The live sketch is the fold of all deltas
    * ([[readCountMin]]); compaction keeps the delta log physically small.
    *
    * {{{
    * stream.writeStream
    *   .foreachBatch(Sketch.streamingCountMin(spark, catalog, "cms", "tok"))
    * }}}
    */
  def streamingCountMin(spark: org.apache.spark.sql.SparkSession,
      catalog: graft.meta.Catalog, table: String, itemCol: String,
      depth: Int = 4, cellHexChars: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val delta = countMin(batch, itemCol, depth, cellHexChars)
        .withColumn("batch_id", lit(batchId))
        .select(col("batch_id"), col("r"), col("cell"), col("cnt"))
      if (!catalog.tableExists(table))
        graft.meta.IceWrite.create(spark, catalog, table, delta)
      else
        graft.meta.IceWrite.upsert(spark, catalog, table, delta,
          keys = Seq("batch_id", "r", "cell"))
    }

  /** The live sketch from the delta log: counters merge by addition
    * (the CMS mergeability property), so this is one bounded aggregate. */
  def readCountMin(spark: org.apache.spark.sql.SparkSession,
      catalog: graft.meta.Catalog, table: String): DataFrame =
    graft.meta.IceRead.table(spark, catalog, table)
      .groupBy(col("r"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  // ------------------------------------------------------------------
  // HyperLogLog — approximate COUNT DISTINCT whose state is one register
  // per md5 prefix, however large the input.
  //
  // Register: the first `regHexChars` hex chars of md5(item); value: the
  // max over items of rho = 1 + leading-zero BITS of the next 15 hex
  // chars (a 60-bit tail). Duplicates land on identical (reg, rho), so
  // the sketch depends only on the distinct set — no distinct pass is
  // ever run. Like the CMS above, the build is ONE aggregate whose
  // output is capped at 16^regHexChars rows: partial aggregation
  // collapses each partition to its register maxima before the (tiny)
  // shuffle, and max IS the HLL merge, which is what makes the sketch a
  // one-pass distributed counter at 100 TB.
  //
  // rho is derived with hex-string arithmetic (ltrim zeros + a 16-case
  // digit table) rather than integer bit tricks so the DuckDB oracle
  // reproduces every register exactly.
  // ------------------------------------------------------------------

  private val TailHexChars = 15

  /** rho = 1 + leading-zero bits of the 60-bit tail of md5(item).
    * (regexp_replace, not two-arg ltrim — the latter signature is
    * deprecated in Spark 4; the oracle's DuckDB ltrim is unaffected.) */
  private def rhoCol(item: Column, regHexChars: Int): Column = {
    val tail = substring(md5(item), regHexChars + 1, TailHexChars)
    val stripped = regexp_replace(tail, "^0+", "")
    val zeroChars = lit(TailHexChars) - length(stripped)
    // leading-zero bits within the first nonzero hex digit
    val lzBits = when(substring(stripped, 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(substring(stripped, 1, 1).isin("4", "5", "6", "7"), 1)
      .when(substring(stripped, 1, 1).isin("2", "3"), 2)
      .otherwise(3) // "1"
    when(length(stripped) === 0, lit(4 * TailHexChars + 1))
      .otherwise(zeroChars * 4 + lzBits + 1)
  }

  /** Build the HLL sketch: (reg, rho) with rho the register maximum.
    * At most `16^regHexChars` rows — bounded, broadcastable, mergeable
    * by a further `groupBy(reg).max(rho)`. */
  def hyperLogLog(items: DataFrame, itemCol: String, regHexChars: Int = 2): DataFrame = {
    require(regHexChars >= 1 && regHexChars <= 3,
      s"regHexChars must be in [1,3], got $regHexChars")
    items
      // a null item has no identity to count — and would otherwise emit a
      // phantom (null, null) register that inflates used_regs while its
      // null rho is skipped by the sum, biasing the estimate high
      .filter(col(itemCol).isNotNull)
      .select(substring(md5(col(itemCol)), 1, regHexChars).as("reg"),
        rhoCol(col(itemCol), regHexChars).as("rho"))
      .groupBy(col("reg"))
      .agg(max(col("rho")).cast("long").as("rho"))
  }

  /** HLL registers per GROUP, one pass: (group, reg, rho) — at most
    * |groups| * 16^regHexChars rows. The fused form behind multi-column
    * ANALYZE: every column's sketch rides the same scan. */
  def hyperLogLogBy(items: DataFrame, groupCol: String, itemCol: String,
      regHexChars: Int = 2): DataFrame = {
    require(regHexChars >= 1 && regHexChars <= 3,
      s"regHexChars must be in [1,3], got $regHexChars")
    items
      .filter(col(itemCol).isNotNull)
      .select(col(groupCol),
        substring(md5(col(itemCol)), 1, regHexChars).as("reg"),
        rhoCol(col(itemCol), regHexChars).as("rho"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).cast("long").as("rho"))
  }

  /** Bias-corrected estimate from a collected register list (driver-side
    * companion to [[hyperLogLogBy]]): raw harmonic estimate with the
    * linear-counting switch, same arithmetic as [[hllEstimate]] +
    * [[hllCountDistinct]]. */
  def hllEstimateFromRegisters(rhos: Seq[Long], regHexChars: Int = 2): Long = {
    val m = 1L << (4 * regHexChars)
    val used = rhos.size
    val s = rhos.map(r => 1L << (32 - math.min(r, 32L)).toInt).sum
    val denom = s + (m - used) * (1L << 32)
    val raw = hllAlphaE6(regHexChars) * ((m * m * (1L << 32)) / denom) / 1000000
    val zeros = m - used
    if (raw <= (2.5 * m).toLong && zeros > 0) math.round(m * math.log(m.toDouble / zeros))
    else raw
  }

  /** alpha_m (the HLL bias constant 0.7213 / (1 + 1.079/m)) in micro
    * units — exposed so the DuckDB oracle can interpolate the SAME
    * integer literal. */
  def hllAlphaE6(regHexChars: Int): Long = {
    val m = 1L << (4 * regHexChars)
    math.round(0.7213 / (1.0 + 1.079 / m) * 1e6)
  }

  /** The raw HLL estimate from a built sketch, in EXACT integer
    * arithmetic so the oracle reconstructs it bit-for-bit: the harmonic
    * denominator sum(2^-rho) is scaled by 2^32 (rho capped at 32 — terms
    * below 2^-32 are noise at any real cardinality), every register
    * absent from the sketch contributes 2^32 (rho = 0), and the estimate
    * is alpha_e6 * (m^2 * 2^32 div denom) div 1e6 with floor division
    * throughout. Returns one row: (m, used_regs, denom_scaled, hll_est).
    *
    * This is the uncorrected estimator — biased high below ~2.5m
    * distinct values, where [[hllCountDistinct]] applies the standard
    * linear-counting correction (driver-side, on the bounded sketch). */
  def hllEstimate(sketch: DataFrame, regHexChars: Int = 2): DataFrame = {
    require(regHexChars >= 1 && regHexChars <= 3,
      s"regHexChars must be in [1,3], got $regHexChars")
    val m = 1L << (4 * regHexChars)
    val num = m * m * (1L << 32) // <= 2^56 for regHexChars <= 3
    sketch
      .agg(count(lit(1)).as("used_regs"),
        coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - least(rho, 32) AS INT))")),
          lit(0L)).as("__s"))
      .select(lit(m).as("m"), col("used_regs"),
        (col("__s") + (lit(m) - col("used_regs")) * lit(1L << 32)).as("denom_scaled"))
      .select(col("m"), col("used_regs"), col("denom_scaled"),
        expr(s"(${hllAlphaE6(regHexChars)} * ($num div denom_scaled)) div 1000000")
          .as("hll_est"))
  }

  /** Bias-corrected distinct-count estimate: the raw HLL estimate, with
    * Flajolet's linear-counting switch (m * ln(m/V) when the raw estimate
    * is under 2.5m and empty registers remain). Driver-side float math on
    * the bounded sketch — the cross-engine-exact path is [[hllEstimate]]. */
  def hllCountDistinct(items: DataFrame, itemCol: String, regHexChars: Int = 2): Long =
    hllEstimateFromRegisters(
      hyperLogLog(items, itemCol, regHexChars).collect().map(_.getLong(1)).toSeq,
      regHexChars)

  /** Streaming HLL maintenance, same contract as [[streamingCountMin]]:
    * each micro-batch's bounded register table lands as a DELTA keyed by
    * (batch_id, reg) via atomic upsert, so a replayed batch overwrites
    * its own rows — idempotent where a read-modify-write max would not
    * be. The live sketch is one bounded max-fold ([[readHyperLogLog]]). */
  def streamingHyperLogLog(spark: org.apache.spark.sql.SparkSession,
      catalog: graft.meta.Catalog, table: String, itemCol: String,
      regHexChars: Int = 2): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val delta = hyperLogLog(batch, itemCol, regHexChars)
        .withColumn("batch_id", lit(batchId))
        .select(col("batch_id"), col("reg"), col("rho"))
      if (!catalog.tableExists(table))
        graft.meta.IceWrite.create(spark, catalog, table, delta)
      else
        graft.meta.IceWrite.upsert(spark, catalog, table, delta,
          keys = Seq("batch_id", "reg"))
    }

  /** The live HLL from the delta log: registers merge by max (the HLL
    * mergeability property) — one bounded aggregate, ready for
    * [[hllEstimate]]. */
  def readHyperLogLog(spark: org.apache.spark.sql.SparkSession,
      catalog: graft.meta.Catalog, table: String): DataFrame =
    graft.meta.IceRead.table(spark, catalog, table)
      .groupBy(col("reg"))
      .agg(max(col("rho")).as("rho"))

  // ------------------------------------------------------------------
  // Quantile histogram — distributed quantiles whose state is a FIXED
  // set of bin counters over a declared value range: the third bounded
  // one-pass sketch (with CMS and HLL above), and like them the partial
  // aggregation IS the merge (bin counters add). Estimates report a
  // bin's UPPER edge, so the error is bounded by one bin width — honest
  // sketch semantics with no float interpolation, which keeps every
  // number integer-exact across engines.
  // ------------------------------------------------------------------

  /** Build the histogram: (bin, cnt), at most `nBins` rows. Values are
    * clamped into [lo, hi) — out-of-range rows land in the edge bins (a
    * declared-range sketch, like every fixed-bin quantile structure). */
  def quantileHistogram(items: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame =
    // the ungrouped histogram IS the grouped one under a constant key —
    // one implementation of the binning so the two can never drift
    quantileHistogramBy(items.withColumn("__qh_g", lit(0)), "__qh_g", valueCol,
      lo, hi, nBins)
      .select(col("bin"), col("cnt"))

  /** Per-GROUP quantile histograms, one pass: (group, bin, cnt) — at
    * most |groups| * nBins rows. The grouped companion of
    * [[quantileHistogram]], same clamped binning and null exclusion. */
  def quantileHistogramBy(items: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 65536, s"nBins must be in [1,65536], got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / nBins
    items
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        least(greatest(floor((col(valueCol).cast("double") - lo) / width), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("long").as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantile estimates from a grouped histogram: same
    * ceil-target upper-edge arithmetic as [[quantileEstimate]], one row
    * per (group, q_ppm). Bounded input (|groups| * nBins), bounded
    * windows (keyed by group). */
  def quantileEstimateBy(hist: DataFrame, groupCol: String, qsPpm: Seq[Long],
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 0 && q <= 1000000),
      s"quantiles must be ppm in [0, 1e6], got $qsPpm")
    val width = (hi - lo) / nBins
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bin"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val total = hist.groupBy(col(groupCol)).agg(sum(col("cnt")).as("total"))
    total
      .crossJoin(qsPpm.toDF("q_ppm"))
      .withColumn("__target", expr("(q_ppm * total + 999999) div 1000000"))
      .join(cum, Seq(groupCol))
      .filter(col("cum") >= col("__target"))
      .groupBy(col(groupCol), col("q_ppm"))
      .agg(min(col("bin")).as("bin"))
      .select(col(groupCol), col("q_ppm"), col("bin"),
        round((lit(lo) + (col("bin") + 1) * lit(width)) * 1e6, 0).cast("long").as("upper_e6"))
  }

  /** Estimate quantiles from a built histogram: for each q (in ppm), the
    * first bin whose cumulative count reaches ceil(q * total) — reported
    * as (q_ppm, bin, upper_e6), the bin's upper edge in micro units.
    * Everything downstream of the histogram is bounded (nBins rows), so
    * the cumulative window and the tiny q cross join never see data. */
  def quantileEstimate(hist: DataFrame, qsPpm: Seq[Long],
      lo: Double, hi: Double, nBins: Int): DataFrame =
    // same ceil-target/upper-edge arithmetic as the grouped form, by
    // CONSTRUCTION: delegate under a constant group key (inputs stay
    // bounded — the group window sees nBins rows either way)
    quantileEstimateBy(hist.withColumn("__qh_g", lit(0)), "__qh_g", qsPpm,
      lo, hi, nBins)
      .select(col("q_ppm"), col("bin"), col("upper_e6"))

  // ------------------------------------------------------------------
  // Bloom filter — a relational pre-join prune: the filter is the
  // DISTINCT set of bit positions hit by k md5 hashes per build key (at
  // most 16^bitHexChars rows — bounded and broadcastable regardless of
  // key count), and the probe side passes when ALL k of its positions
  // are present. Sound (a true match always passes: its k positions were
  // set by the matching build key), not complete (false positives pass
  // at rate ~fill^k) — so it PRECEDES an exact join, it never replaces
  // one. This is the runtime-filter pattern for joins whose build side
  // is too large to ship as an IN-list but whose bit set is tiny.
  //
  // Hash choice: md5-per-probe is ORACLE PARITY, not a recommendation —
  // DuckDB has md5 but no xxhash64, and the cross-engine hash-match is
  // what the driver gate checks. A production variant should swap the
  // k MessageDigest invocations per probe row for xxhash64 (codegen'd,
  // no digest allocation); the filter's soundness argument is
  // hash-agnostic.
  // ------------------------------------------------------------------

  private def bloomBitCol(key: Column, i: Int, bitHexChars: Int): Column =
    substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, bitHexChars)

  /** Build: the distinct bit positions set by `keys`. One bounded
    * distinct-aggregate (partial agg collapses each partition to its
    * local bit set — the map-side combine IS the bloom OR-merge). */
  def bloomBits(keys: DataFrame, keyCol: String, k: Int = 3, bitHexChars: Int = 3): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1,8], got $k")
    // 5 hex chars = 2^20 bits max: the bit set stays broadcastable by
    // construction (the whole point of the prune); a wider filter would
    // silently turn the "tiny" side into a driver-OOM broadcast
    require(bitHexChars >= 1 && bitHexChars <= 5,
      s"bitHexChars must be in [1,5], got $bitHexChars")
    keys
      .select(explode(array((0 until k).map(i =>
        bloomBitCol(col(keyCol), i, bitHexChars)): _*)).as("bit"))
      .distinct()
  }

  /** Prune `probe` to rows passing the filter: k chained broadcast LEFT
    * SEMI joins, one per hash — the probe side is never shuffled and
    * never widened; rows failing any hash drop at the first miss.
    *
    * The bit width is DERIVED from the bits table (they are fixed-width
    * hex by construction), so a build/probe width mismatch — which would
    * silently drop every probe row, true matches included — cannot
    * happen. `k` must not EXCEED the k the filter was built with
    * (positions never set would fail every row); a smaller k stays sound,
    * it just passes more false positives. An empty filter drops
    * everything — correct: an empty build side has no matches. */
  def bloomPrune(probe: DataFrame, keyCol: String, bits: DataFrame,
      k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1,8], got $k")
    val bitHexChars = bits.select(length(col("bit")).as("__w")).take(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    (0 until k).foldLeft(probe) { (df, i) =>
      df.join(broadcast(bits),
        bloomBitCol(df.col(keyCol), i, bitHexChars) === bits.col("bit"), "left_semi")
    }
  }

  // ---- exact heavy hitters (Misra-Gries-pruned two-pass) ----

  /** Per-partition Misra-Gries candidate survivors for threshold `k`.
    * Pigeonhole guarantee: any item with GLOBAL count > N/k must exceed
    * N_p/k in at least one partition p (N = Σ N_p), and Misra-Gries with
    * k counters retains every such item — so the union of per-partition
    * survivors is a superset of the true heavy hitters. At most k items
    * survive per partition: the candidate set is bounded by k × partitions
    * however large the data. */
  private[ops] def misraGriesCandidates(items: DataFrame, itemCol: String,
      k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        for (x <- it) {
          if (counters.contains(x)) counters(x) += 1
          else if (counters.size < k) counters(x) = 1
          else {
            // decrement-all step; drop zeroed counters
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.mapValuesInPlace((_, v) => v - 1)
            counters.foreach { case (key, v) => if (v <= 0) dead += key }
            dead.foreach(counters.remove)
          }
        }
        counters.keysIterator
      }
      .toDF("item").distinct()
  }

  /** EXACT frequent items: every item with count strictly greater than
    * N/k (the classic "frequent elements" guarantee), with its exact
    * count. Two passes, neither shuffling the full domain:
    *
    *  1. per-partition Misra-Gries (k counters each, zero shuffle) yields
    *     a bounded candidate superset;
    *  2. a broadcast semi join keeps only candidate rows, and ONE
    *     aggregate counts exactly those — the shuffle carries candidate
    *     rows only, never the full item domain.
    *
    * The MG stage is pure pruning: the final `count * k > N` filter is
    * exact, so results are deterministic and independent of partitioning
    * (the oracle is a plain GROUP BY ... HAVING). */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k must be in [2, 100000], got $k")
    val rows = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    val n = rows.count()
    val candidates = misraGriesCandidates(items, itemCol, k)
    rows.join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      // integer threshold without division: cnt > N/k <=> cnt * k > N
      .filter(col("cnt") * lit(k) > lit(n))
  }
}
