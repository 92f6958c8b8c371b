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

  /** Bucketized interval-OVERLAP join: inner join of `a` and `b` on
    * `a.lo <= b.hi AND b.lo <= a.hi`, as a bucket equi-join. Two
    * overlapping intervals can share MANY buckets; instead of a distinct
    * pass, each pair is emitted exactly once by the canonical trick:
    * only the bucket containing `greatest(a.lo, b.lo)` — the start of
    * the overlap, which lies in exactly one bucket — reports the pair. */
  def intervalOverlap(a: DataFrame, aLoCol: String, aHiCol: String,
      b: DataFrame, bLoCol: String, bHiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def expand(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket", explode(expr(
        s"sequence(CAST(floor($lo / ${bucketWidth}D) AS BIGINT), " +
          s"CAST(floor($hi / ${bucketWidth}D) AS BIGINT))")))
    expand(a, aLoCol, aHiCol).join(expand(b, bLoCol, bHiCol), Seq("__bucket"))
      .filter(col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol))
      .filter(col("__bucket") ===
        floor(greatest(col(aLoCol), col(bLoCol)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
