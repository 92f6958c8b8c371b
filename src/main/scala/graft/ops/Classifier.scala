package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality/label classifier over hashed bag-of-tokens features —
  * the fastText-shaped linear scorer every production corpus filter runs
  * (quality classification, language ID, toxicity gates). LLM-pipeline
  * extension beyond the reference engine's scope, like [[Dedup]]/[[TextAnalysis]].
  *
  * Design for 100 TB:
  *  - training is ONE aggregate pass: explode tokens -> hash-bucket ->
  *    per-bucket label counts (map-side combinable) -> closed-form
  *    Laplace-smoothed weights. No gradient loop, no driver iteration;
  *  - the model is BOUNDED BY CONSTRUCTION: at most `16^hexChars + 1`
  *    weight rows regardless of corpus size (hashing trick), so the
  *    scoring join broadcasts safely;
  *  - scoring is explode -> broadcast join -> one doc-keyed aggregate:
  *    a single shuffle keyed by doc id, map-side combinable;
  *  - all arithmetic is integer ppm (floor division) — deterministic and
  *    replayable bit-for-bit in any engine, no float ranking.
  *
  * The score is the per-occurrence average of the per-bucket smoothed
  * positive-class probability (an averaged naive-Bayes-style vote),
  * in ppm. Token-free docs fall back to the corpus prior.
  */
object Classifier {

  /** Upper bound on hash width: 16^5 + 1 = ~1M weight rows, the most a
    * scoring broadcast should carry. */
  val MaxHexChars = 5

  /** The bucket key reserved for the corpus prior row. */
  val PriorBucket = ""

  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** Hash bucket of a token: first `hexChars` hex chars of its md5 —
    * 16^hexChars buckets, stable across engines and runs. */
  def tokenBucket(token: Column, hexChars: Int): Column =
    substring(md5(token), 1, hexChars)

  /** Trains the model: one row per occupied hash bucket with the
    * Laplace-smoothed positive-class rate in ppm,
    * `w = (1e6 * (pos + 1)) div (pos + neg + 2)`, plus one prior row
    * (bucket = [[PriorBucket]]) with the document-level positive rate.
    *
    * @param labelCol 0/1 integer label column.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= MaxHexChars,
      s"hexChars must be in [1, $MaxHexChars], got $hexChars")
    val lbl = col(labelCol).cast("long")
    val tokenRows = df
      .select(lbl.as("__label"), explode(toks(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
    // `div` on DECIMAL(38,0), not `floor(a / b)`: Spark decimal `/` is
    // scale-6 HALF_UP and can exceed the true floor by 1 near integer
    // boundaries (the TextIndex idf lesson); div is exact at any count
    val wExpr = expr(
      "(CAST(1000000 AS DECIMAL(38,0)) * (__pos + 1)) div (__n + 2)")
      .cast("long").as("w_ppm")
    val weights = tokenRows
      .groupBy(tokenBucket(col("__tok"), hexChars).as("bucket"))
      .agg(sum(col("__label")).as("__pos"), count(lit(1)).as("__n"))
      .select(col("bucket"), wExpr)
    val prior = df
      .agg(sum(lbl).as("__pos"), count(lit(1)).as("__n"))
      .select(lit(PriorBucket).as("bucket"), wExpr)
    weights.unionAll(prior)
  }

  /** Scores documents against a trained model: per-doc ppm score (the
    * floor-average of matched bucket weights over all token occurrences;
    * unmatched buckets contribute the prior — unseen vocabulary must not
    * silently drop) and the thresholded 0/1 label.
    *
    * The weight side is bounded (<= 16^hexChars + 1 rows) and broadcast;
    * the corpus never shuffles except the one doc-keyed aggregate. */
  def score(df: DataFrame, idCol: String, textCol: String, model: DataFrame,
      hexChars: Int = 3, thresholdPpm: Long = 500000L): DataFrame = {
    require(hexChars >= 1 && hexChars <= MaxHexChars,
      s"hexChars must be in [1, $MaxHexChars], got $hexChars")
    val prior = model.filter(col("bucket") === PriorBucket)
      .select(col("w_ppm").as("prior_ppm"))
    val buckets = model.filter(col("bucket") =!= PriorBucket)
    val tokenRows = df
      .select(col(idCol), explode(toks(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol), tokenBucket(col("__tok"), hexChars).as("bucket"))
    val perDoc = tokenRows
      .join(broadcast(buckets), Seq("bucket"), "left")
      .crossJoin(broadcast(prior))
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w_ppm"), col("prior_ppm"))).as("__wsum"),
        count(lit(1)).as("__ntok"))
      .select(col(idCol),
        expr("CAST(__wsum AS DECIMAL(38,0)) div __ntok").cast("long").as("score_ppm"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .select(col(idCol),
        coalesce(col("score_ppm"), col("prior_ppm")).as("score_ppm"))
      .withColumn("label", (col("score_ppm") >= thresholdPpm).cast("int"))
  }
}
