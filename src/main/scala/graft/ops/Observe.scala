package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline observability via Spark's `observe`:
  * the metrics are computed DURING the action that consumes the frame
  * (accumulator-style, inside the same tasks), so a 100 TB curation run
  * reports per-stage row/token/drop counts without a single extra scan,
  * `count()`, or cache. This is the difference between instrumenting a
  * pipeline and doubling its cost.
  *
  * Usage:
  * {{{
  * val (gated, m) = Observe.docStats(Quality.gopherRules(docs), "gopher")
  * gated.write.parquet(out)            // the one real action
  * m.get("rows")                       // populated by that action
  * }}}
  *
  * `Observation.get` blocks until the action completes; each Observation
  * is single-use (one per stage per run), matching Spark's contract.
  */
object Observe {

  /** Row count only — the universal stage meter. */
  def counted(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, count(lit(1)).as("rows")), obs)
  }

  /** Arbitrary per-stage aggregates (must be observe-legal: aggregates
    * over the frame, no distinct). */
  def metrics(df: DataFrame, name: String, first: Column, rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }

  /** Document-corpus stage stats: rows, total whitespace tokens, total
    * characters — the numbers every curation stage reports. */
  def docStats(df: DataFrame, name: String, textCol: String = "text"): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs,
      count(lit(1)).as("rows"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("tokens"),
      sum(length(col(textCol)).cast("long")).as("chars")), obs)
  }

  /** Keep/drop accounting for a boolean-gated stage (e.g. the Gopher
    * verdict): counts both verdicts in one pass over the SAME frame, so
    * the filter that follows costs nothing extra to account for. */
  def gateStats(df: DataFrame, name: String, keepCol: String = "keep"): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs,
      sum(when(col(keepCol), 1L).otherwise(0L)).as("kept"),
      sum(when(col(keepCol), 0L).otherwise(1L)).as("dropped")), obs)
  }
}
