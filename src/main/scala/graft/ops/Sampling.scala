package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines — the operations that turn a cleaned corpus into train/val/
  * test sets and data mixtures.
  *
  * Everything here is HASH-based and per-row: membership depends only on
  * (seed, id), never on partitioning, row order, or cluster size — so
  * splits are reproducible across runs and engines, stable under
  * repartitioning, and a re-run over a grown corpus keeps every previously
  * assigned row in its split (the property random() sampling lacks).
  * No shuffle anywhere: each operator is a narrow projection/filter that
  * scales linearly with input splits.
  *
  * Cross-engine determinism trick: rather than converting md5 hex to a
  * number (engines disagree on hex-parse builtins), thresholds are
  * compared as fixed-width lowercase-hex STRINGS — lexicographic order on
  * fixed-length lowercase hex equals numeric order, and md5 prints
  * lowercase hex in every engine. A rate r maps to the 8-hex-char
  * threshold `floor(r * 16^8)`.
  */
object Sampling {

  /** The first 8 md5 hex chars of `seed:id` — a uniform draw in [0, 16^8)
    * as a fixed-width hex string. */
  def hashDraw(idCol: Column, seed: String): Column =
    substring(md5(concat(lit(seed), lit(":"), idCol.cast("string"))), 1, 8)

  /** `floor(rate * 16^8)` as 8 lowercase hex chars — the comparison
    * threshold for [[hashDraw]]. rate is clamped to [0, 1]. rate >= 1
    * returns "g", which sorts above EVERY 8-hex draw, so a full-rate
    * sample keeps all rows (the max hex threshold "ffffffff" would
    * exclude draws equal to it — rate 1.0 must be the identity). */
  def rateThreshold(rate: Double): String = {
    if (rate >= 1.0) return "g"
    val clamped = math.max(0.0, rate)
    val v = math.min((clamped * 4294967296.0).toLong, 4294967295L)
    f"$v%08x"
  }

  /** Deterministic Bernoulli sample: keeps rows whose draw falls under
    * `rate`. Same (seed, id) -> same verdict, forever. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
      seed: String = "sample"): DataFrame =
    df.filter(hashDraw(col(idCol), seed) < lit(rateThreshold(rate)))

  /** Train/val/test (or any n-way) assignment from cumulative weight
    * thresholds: `splits` are (name, weight) with weights summing to ~1;
    * every row gets exactly one split label, rows never migrate when the
    * corpus grows. Returns df + `split` column. */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
      seed: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplit needs at least one split")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val draw = hashDraw(col(idCol), seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // last split takes everything left so rounding can't drop a row
    val assigned = splits.init.zip(cum.init).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cumRate)) =>
        acc.when(draw < lit(rateThreshold(cumRate)), name)
    }.otherwise(splits.last._1)
    df.withColumn("split", assigned)
  }

  /** Shard id from equal-width ranges of the 8-hex draw space: shard i
    * covers draws in [threshold(i/n), threshold((i+1)/n)) — uniform in
    * expectation, and expressed as string-range tests so no hex->int
    * parse is needed (see the object Scaladoc). */
  def shardOf(idCol: Column, nShards: Int, seed: String = "shard"): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val draw = hashDraw(idCol, seed)
    (0 until nShards - 1).foldLeft(when(lit(false), 0L)) { (acc, i) =>
      acc.when(draw < lit(rateThreshold((i + 1).toDouble / nShards)), i.toLong)
    }.otherwise(lit((nShards - 1).toLong))
  }

  /** Deterministic global shuffle + sharding for training export: every
    * row gets a `shard` and a dense 1-based `shard_pos`, both pure
    * functions of (seed, id) and the corpus content — the training order
    * is reproducible bit-for-bit across runs, engines, and partitionings,
    * unlike `orderBy(rand())`. The permutation is the md5 draw order
    * (ties -> id order).
    *
    * Scale shape: one exchange keyed by shard; each shard's positions are
    * then a within-partition sort. Parallelism equals nShards by design —
    * it matches the writer's (each shard IS one output stream); at real
    * scale you run thousands of shards, not 8. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: String = "shard"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(hashDraw(col(idCol), seed), col(idCol))
    df.withColumn("shard", shardOf(col(idCol), nShards, seed))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** Materialize the shards: one directory per shard, rows inside each
    * file in shard_pos order — the layout a training loader streams
    * sequentially. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      seed: String = "shard"): Unit =
    shuffleShards(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Per-group cap: keep at most `cap` rows per group, chosen by the
    * deterministic md5 draw (ties -> id) — domain balancing for a crawl
    * corpus where a handful of hosts dominate. One exchange keyed by the
    * group; the rank window streams each group in draw order, and the
    * survivor set is a pure function of (seed, id, group membership):
    * adding docs to a full group only ever swaps survivors whose draw is
    * displaced, never reshuffles the whole group. Skewed groups sort
    * spill-safely (external sort) — the cap filter drops the tail before
    * anything downstream sees it. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, cap: Int,
      seed: String = "cap"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashDraw(col(idCol), seed).asc, col(idCol).asc)
    df.withColumn("__cap_rk", row_number().over(w))
      .filter(col("__cap_rk") <= cap)
      .drop("__cap_rk")
  }

  /** Exactly-n deterministic sample: the n smallest md5 draws (ties ->
    * id). Plans as TakeOrderedAndProject — every partition keeps a local
    * n-row heap and the driver merges heaps, so there is no global sort
    * and no full shuffle; n rows cross the wire per partition, period.
    * Same (seed, corpus) -> same n rows, on any partitioning. */
  def fixedSample(df: DataFrame, idCol: String, n: Int,
      seed: String = "fixed"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    df.orderBy(hashDraw(col(idCol), seed).asc, col(idCol).asc).limit(n)
  }

  /** Weighted deterministic Bernoulli sample: row i is kept with
    * probability `min(1, expected * w_i / W)` where W = sum of weights —
    * the standard expected-size-`expected` weighted draw (heavier rows
    * proportionally likelier), made reproducible and cross-engine exact.
    *
    * The draw is the first 8 md5 hex chars of `seed:id` read as an
    * integer in [0, 2^32); inclusion is the INTEGER comparison
    * `draw * W < expected * w * 2^32` — no float division anywhere, so
    * the kept set is bit-identical in any engine with md5 (DuckDB oracle:
    * same nibble arithmetic via a list_reduce fold). One tiny broadcast
    * (the 1-row weight total) + a narrow filter; no shuffle of the data.
    *
    * Overflow envelope, ENFORCED in the plan: both comparison sides live
    * in a long iff `W < 2^31` and `expected * max_w < 2^31`. Exceeding
    * either fails the job loudly (`assert_true` over the broadcast 1-row
    * totals — no silent wraparound-corrupted sample). That bound is far
    * beyond any per-table sampling pass this library plans (W is a
    * weight SUM, e.g. total corpus chars; shard first past it). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      expected: Int, seed: String = "wsample"): DataFrame = {
    require(expected >= 1, s"expected must be >= 1, got $expected")
    val draw = conv(substring(md5(concat(lit(seed), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val totals = df.agg(sum(col(weightCol).cast("long")).as("__W"),
      max(col(weightCol).cast("long")).as("__maxw"))
    val lim = 1L << 31
    df.crossJoin(broadcast(totals))
      .withColumn("__ovf", assert_true(
        col("__W") < lim && lit(expected.toLong) * col("__maxw") < lim,
        lit(s"weightedSample overflow envelope exceeded: need sum(w) < 2^31 " +
          s"and expected * max(w) < 2^31 — shard the input first")))
      .filter(col("__ovf").isNull &&
        draw * col("__W") <
        lit(expected.toLong) * col(weightCol).cast("long") * lit(4294967296L))
      .drop("__W", "__maxw", "__ovf")
  }

  /** Stratified deterministic sampling: per-stratum keep rates (a data
    * mixture — "50% of en, 10% of everything else"). Strata absent from
    * `rates` fall back to `defaultRate`. One narrow filter, no shuffle;
    * the mixture is exact in expectation and reproducible row-for-row. */
  def stratifiedSampleByHash(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: String = "strata"): DataFrame = {
    val draw = hashDraw(col(idCol), seed)
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(when(lit(false), "")) {
      case (acc, (stratum, rate)) =>
        acc.when(col(strataCol) === stratum, rateThreshold(rate))
    }.otherwise(rateThreshold(defaultRate))
    df.filter(draw < threshold)
  }
}
