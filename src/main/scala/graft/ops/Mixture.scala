package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture planning: given a target domain mixture (the DoReMi /
  * Pile-style "20% web, 10% code, ..." recipe) and the measured token
  * counts per domain, compute the largest total corpus that satisfies the
  * mixture and the per-domain sampling rate that realizes it.
  *
  * All mixture math is exact integer arithmetic in parts-per-million
  * (floats ranked by `ln`/division are not reproducible across engines;
  * integer div is bit-identical everywhere — docs/ORACLE.md):
  *
  *   cap       = min over domains of (n_tokens * 1e6 div weight_ppm)
  *               (the largest mixture-consistent total: the binding
  *                domain is the one that runs out first)
  *   rate_ppm  = min(1e6, weight_ppm * cap div n_tokens)
  *   take      = n_tokens * rate_ppm div 1e6
  *
  * Plan shape at 100 TB: one hash aggregate keyed by domain (map-side
  * combine; domain cardinality is tiny), a single-row scalar aggregate
  * for the cap, and a broadcast of that one row back across the domain
  * rows. No data-sized shuffle anywhere; the expensive part is the token
  * count, which is the map-side of the first aggregate.
  */
object Mixture {

  /** Per-domain sampling plan for a target mixture.
    *
    * @param weightsPpm target mixture weights in parts-per-million; only
    *                   the RATIOS matter (they need not sum to 1e6)
    * @param defaultPpm weight for domains absent from `weightsPpm`; 0
    *                   excludes a domain entirely (rate 0, and it does not
    *                   bind the cap)
    * @param tokenExpr  per-row token contribution (e.g. a token count
    *                   column or expression)
    *
    * Output: (domain, n_tokens, weight_ppm, rate_ppm, take_tokens),
    * one row per domain.
    */
  def domainMixturePlan(df: DataFrame, domainCol: String, tokenExpr: Column,
      weightsPpm: Map[String, Long], defaultPpm: Long = 0L): DataFrame = {
    require((weightsPpm.values ++ Seq(defaultPpm)).forall(_ >= 0),
      "mixture weights must be non-negative")
    val weight = weightsPpm.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (d, w)) =>
        acc.when(col("domain") === d, lit(w))
      }.otherwise(lit(defaultPpm))
    val perDomain = df
      .groupBy(col(domainCol).as("domain"))
      .agg(sum(tokenExpr.cast("long")).as("n_tokens"))
      .withColumn("weight_ppm", weight)
    // the binding constraint: a single scalar row, broadcast back.
    // All products run in DECIMAL(38,0): a 100 TB corpus is ~2e13 tokens,
    // and n_tokens * 1e6 (or weight_ppm * cap) would wrap a Long silently
    // under non-ANSI Spark — decimal keeps the ppm math exact to 38
    // digits and floor() of a positive decimal ratio equals integer div
    val cap = perDomain.filter(col("weight_ppm") > 0)
      .agg(min(expr(
        "CAST(floor(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 / weight_ppm) AS BIGINT)"))
        .as("__cap"))
    perDomain.crossJoin(broadcast(cap))
      .withColumn("rate_ppm",
        when(col("weight_ppm") === 0, lit(0L)).otherwise(
          least(lit(1000000L), expr(
            "CAST(floor(CAST(weight_ppm AS DECIMAL(38,0)) * __cap / n_tokens) AS BIGINT)"))))
      .select(col("domain"), col("n_tokens"), col("weight_ppm"),
        col("rate_ppm"),
        expr("CAST(floor(CAST(n_tokens AS DECIMAL(38,0)) * rate_ppm / 1000000) AS BIGINT)")
          .as("take_tokens"))
  }

  /** Temperature-flattened mixture weights (the mT5/XLM-R multilingual
    * recipe at T=2): sampling weight proportional to sqrt(share) boosts
    * small domains without letting a head domain drown the mixture.
    *
    * The math stays integer-exact where it can and deterministic where it
    * can't: share_ppm = c_i * 1e6 div total (integer), raw weight
    * w_i = floor(sqrt(share_ppm * 1e6)) — IEEE-754 sqrt is correctly
    * rounded, so floor(sqrt(integer)) is bit-identical in every engine —
    * and weight_ppm = w_i * 1e6 div sum(w). One domain-keyed aggregate
    * (map-side combined), a single-row scalar aggregate, one broadcast
    * back; the output can feed [[domainMixturePlan]]'s weights.
    *
    * Returns (domain, n_tokens, share_ppm, weight_ppm). */
  def temperatureWeights(df: DataFrame, domainCol: String,
      tokenExpr: Column): DataFrame = {
    val perDomain = df
      .groupBy(col(domainCol).as("domain"))
      .agg(sum(tokenExpr.cast("long")).as("n_tokens"))
    val tot = perDomain.agg(sum(col("n_tokens")).as("__tot"))
    val shared = perDomain.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr(
        "CAST(floor(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 / __tot) AS BIGINT)"))
      .withColumn("__w", expr("CAST(floor(sqrt(share_ppm * 1000000)) AS BIGINT)"))
    val wTot = shared.agg(sum(col("__w")).as("__wtot"))
    shared.crossJoin(broadcast(wTot))
      .select(col("domain"), col("n_tokens"), col("share_ppm"),
        expr("CAST(floor(CAST(__w AS DECIMAL(38,0)) * 1000000 / __wtot) AS BIGINT)")
          .as("weight_ppm"))
  }

  /** Round-robin interleave across domains — the curriculum ordering a
    * mixture is consumed in: position 1..|D| is one doc from each domain,
    * then the next |D|, until domains run dry. Within a domain the order
    * is the deterministic md5 draw (a seeded shuffle).
    *
    * The global position is computed WITHOUT a global window (the
    * single-task trap at scale): docs sorted by (rn, domain) means a
    * row's position is
    *
    *   sum over domains d of min(count(d), rn - 1)     (earlier rounds)
    *   + |{d < domain : count(d) >= rn}|               (this round)
    *   + 1
    *
    * Both terms are per-row expressions over the (tiny, driver-collected)
    * domain-count table — the same bounded-metadata pattern as the
    * mixture cap and the IVF centroid literals. One domain-keyed window
    * exchange is the only shuffle. Domain cardinality must be small:
    * `maxDomains` (default 500) bounds the per-row expression TREE the
    * counts expand into — thousands of reduced Add/When nodes would
    * overflow Catalyst's recursive planning long before the collect
    * itself hurt. NULL domains are rejected loudly: SQL null compares as
    * neither < nor >= anything, which would silently assign duplicate
    * positions.
    *
    * Returns df + (rn, position). */
  def roundRobinInterleave(df: DataFrame, idCol: String, domainCol: String,
      seed: String = "interleave", maxDomains: Int = 500): DataFrame = {
    val countRows = df.groupBy(col(domainCol)).agg(count(lit(1)).as("cnt"))
      .limit(maxDomains + 1).collect()
    require(countRows.length <= maxDomains,
      s"roundRobinInterleave: more than $maxDomains domains — not a mixture key")
    require(!countRows.exists(_.isNullAt(0)),
      "roundRobinInterleave: null domain values — fill or filter them first")
    val counts = countRows.map(r => (String.valueOf(r.get(0)), r.getLong(1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(Sampling.hashDraw(col(idCol), seed), col(idCol))
    val rn = col("rn")
    // foldLeft from lit(0L): an empty input stays an empty DataFrame
    // instead of crashing an empty reduce
    val earlierRounds = counts.foldLeft(lit(0L): Column) { case (acc, (_, c)) =>
      acc + least(lit(c), rn - 1)
    }
    val thisRound = counts.foldLeft(lit(0L): Column) { case (acc, (d, c)) =>
      acc + when(lit(d) < col(domainCol).cast("string") && lit(c) >= rn, 1L).otherwise(0L)
    }
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("position", (earlierRounds + thisRound + 1).cast("long"))
  }
}
