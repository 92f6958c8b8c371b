package graft.ops

import org.apache.spark.sql.DataFrame

/** Grow-only parallelism floor for per-row compute-heavy projections.
  *
  * Spark's scan parallelism is bounded by parquet row-group layout: a
  * corpus delivered as few files with one row group each arrives as that
  * many partitions, and every narrow (shuffle-free) projection downstream
  * — gram hashing, MinHash signatures, tokenization, winnow
  * fingerprints, media decoding — inherits it. For byte-light but
  * CPU-heavy rows that serializes the whole stage on a handful of cores
  * while the rest of the cluster idles (measured here: 1-3 running tasks
  * on local[32] for every dedup/text line, thread-dump verified).
  *
  * One cheap round-robin exchange of the raw rows first buys
  * full-cluster parallelism for everything after it. GROW-ONLY: an input
  * already at or above `defaultParallelism` partitions (the normal case
  * for a large corpus at scale) passes through untouched, so this never
  * SHRINKS a big job's parallelism and never adds an exchange where the
  * scan is already wide. The same pattern [[Dedup.winnowNearDupPairs]]
  * documented per-site, made reusable.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
