package graft.ops

import org.apache.spark.sql.DataFrame
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
}
