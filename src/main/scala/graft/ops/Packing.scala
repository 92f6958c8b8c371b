package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data export: concatenate all documents in
  * a deterministic order and split the token stream into fixed-length
  * chunks (the GPT-style "concat and chunk" batcher). Each document's
  * placement is fully described by its global token offset, which is a
  * prefix sum over the document order.
  *
  * The naive prefix sum — `sum(n) over (order by id)` with no partition —
  * plans a SINGLE-partition window: every row of a 100 TB corpus through
  * one task. This implementation is the scalable two-phase form:
  *
  *   1. bucket documents by `id div bucketSize`; within each bucket the
  *      running sum is a window PARTITIONED by bucket (parallel, bounded
  *      state);
  *   2. per-bucket totals (one small aggregate — |corpus|/bucketSize rows)
  *      get their own exclusive prefix via a window over just those
  *      totals, then join back. That tiny window is single-partition, but
  *      over thousands of rows, not trillions — the same shape Spark's own
  *      `zipWithIndex` uses (per-partition counts to the driver).
  *
  * The join back on `bucket` broadcasts (the totals frame is tiny by
  * construction), so the whole operator costs one narrow aggregate + one
  * broadcast join + one partitioned window — no global sort, no
  * single-partition pass over data rows.
  */
object Packing {

  /** Assign every document its chunk span in the concatenated token
    * stream: (id, n_tokens, first_chunk, last_chunk). Documents are laid
    * out in ascending id order; chunk c covers token offsets
    * [c*chunkTokens, (c+1)*chunkTokens). A document straddles
    * `last_chunk - first_chunk + 1` chunks.
    *
    * `idCol` must be unique non-null (it defines the layout order).
    * Zero-token documents get the degenerate span (first == last) at
    * their offset. */
  def packChunks(df: DataFrame, idCol: String, nTokensCol: String,
      chunkTokens: Long, bucketSize: Long = 1L << 20): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val base = df.select(col(idCol).as("id"), col(nTokensCol).cast("long").as("n"))
      .withColumn("bucket", expr(s"id div $bucketSize"))
    // phase 1: per-bucket totals -> exclusive prefix over the tiny frame
    val totals = base.groupBy(col("bucket")).agg(sum(col("n")).as("btotal"))
    val bucketPrefix = totals.withColumn("boffset",
      coalesce(sum(col("btotal")).over(
        Window.partitionBy(lit(0)).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boffset"))
    // phase 2: within-bucket exclusive running sum (parallel windows)
    val intra = base.withColumn("ioffset",
      coalesce(sum(col("n")).over(
        Window.partitionBy(col("bucket")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    intra.join(broadcast(bucketPrefix), Seq("bucket"))
      .select(col("id"), col("n").as("n_tokens"),
        expr(s"(ioffset + boffset) div $chunkTokens").as("first_chunk"),
        expr(s"(ioffset + boffset + greatest(n, 1) - 1) div $chunkTokens").as("last_chunk"))
  }

  /** Overlapping sliding-window chunking (the RAG/embedding chunker, as
    * opposed to [[packChunks]]' disjoint training batcher): each document
    * splits into windows of `chunkTokens` tokens advancing by `stride`
    * (< chunkTokens ⇒ consecutive chunks overlap by chunkTokens - stride
    * tokens, preserving context across boundaries). Per-row expression +
    * one posexplode — rows multiply inside the task, no shuffle, no
    * driver loop. Window count `1 + ceil(max(n - C, 0) / S)` covers
    * every token by construction (the last window ends at or past token
    * n); the LAST window is shorter than C whenever `(n - C) % S != 0`
    * (and for documents shorter than C) — consumers needing fixed-length
    * chunks must pad or drop the tail themselves.
    * Output: (id, chunk_idx from 0, n_tokens, chunk_text single-spaced). */
  def chunkOverlapping(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // number of windows: 1 + ceil(max(n - chunkTokens, 0) / stride)
      .withColumn("__w", expr(
        s"1 + cast(ceil(greatest(__n - $chunkTokens, 0) / $stride.0D) as int)"))
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, __w - 1), j -> slice(__toks, j * $stride + 1, $chunkTokens))"))
        .as(Seq("chunk_idx", "__chunk")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Chunk occupancy summary: how many documents touch each chunk and how
    * many chunk boundaries cut through a document — the packing-efficiency
    * stats an export job reports. One explode over per-doc spans (spans
    * are short: len/chunkTokens + 1) + one aggregate. */
  def chunkOccupancy(packed: DataFrame): DataFrame =
    packed.select(explode(expr("sequence(first_chunk, last_chunk)")).as("chunk"))
      .groupBy(col("chunk")).agg(count(lit(1)).as("n_docs"))
}
