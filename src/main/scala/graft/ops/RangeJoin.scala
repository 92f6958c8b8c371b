package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins that scale.
  *
  * Catalyst plans a plain `v BETWEEN lo AND hi` join condition as a
  * broadcast nested loop (or cartesian) — every point against every
  * interval, O(|P| * |I|), the classic range-join trap. The bucketized
  * form here recovers an EQUI-join: intervals explode to the fixed-width
  * buckets they overlap, points map to their single bucket, the join runs
  * on the bucket key (hash-partitioned, map-side prunable), and the exact
  * `BETWEEN` filter runs only within bucket-colocated candidates. Each
  * (point, interval) pair meets exactly once — a point lives in exactly
  * one bucket — so no dedup pass is needed.
  *
  * Cost model: the interval side inflates by `(hi - lo) / bucketWidth + 1`
  * rows; pick `bucketWidth` near the median interval length so inflation
  * stays O(1) while bucket populations stay small. Degenerate long
  * intervals inflate linearly — cap them upstream or split the regime the
  * way `Dedup.minHashNearDupPairs` gates its verify stage.
  */
object RangeJoin {

  /** Naive baseline: the BETWEEN condition handed straight to Catalyst
    * (broadcast nested loop). Correctness anchor and small-side tool. */
  def pointInIntervalNaive(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.join(intervals,
      points(pointCol) >= intervals(loCol) && points(pointCol) <= intervals(hiCol))

  /** Bucketized point-in-interval join: returns the inner join of
    * `points` and `intervals` on `lo <= point <= hi`, planned as an
    * equi-join on bucket ids. Output columns: all of `points`', then all
    * of `intervals`'. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("__bucket", explode(expr(
      s"sequence(CAST(floor($loCol / ${bucketWidth}D) AS BIGINT), " +
        s"CAST(floor($hiCol / ${bucketWidth}D) AS BIGINT))")))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
