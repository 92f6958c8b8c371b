package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming pipeline over the `events` stream table.
  *
  * The reference engine is bounded-batch only (Boundedness::Bounded,
  * iceberg_file_task_scan.rs:228); streaming is part of the training-data
  * pipeline extension surface. Everything here follows the standard
  * Spark shape: `readStream -> transform -> writeStream`, watermarks for
  * late data, `flatMapGroupsWithState` for custom session state. The same
  * transforms run identically on a batch DataFrame (used by the batch
  * oracle query `q_stream_window`).
  */
object EventPipeline {

  final case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long, total_value: Double)
  private final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** 5-minute tumbling-window counts per event type. `ts` is epoch nanos
    * (the events table's physical type); works identically on batch and
    * streaming frames. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_sec", timestamp_seconds(col("ts") / lit(1000000000L)))
      .withWatermark("ts_sec", "10 minutes")
      .groupBy(window(col("ts_sec"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))

  /** Gap-based sessionization with explicit state:
    * a session closes after `gapNanos` of user inactivity. Streaming uses
    * event-time timeouts via `flatMapGroupsWithState`. */
  def sessionize(events: Dataset[Event], gapNanos: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // batch-mode semantics: fold the user's events in ts order,
          // emitting a session per inactivity gap
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur: Option[SessionState] = state.getOption
          for (e <- sorted) {
            cur match {
              case Some(s) if e.ts - s.last <= gapNanos =>
                cur = Some(SessionState(s.start, e.ts, s.n + 1, s.total + e.value))
              case Some(s) =>
                out += Session(userId, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
            }
          }
          // close the trailing session in batch mode; a streaming run
          // would keep it in state and emit on timeout
          cur.foreach(s => out += Session(userId, s.start, s.last, s.n, s.total))
          state.remove()
          out.iterator
      }
  }

  /** Streaming funnel: per-user ordered stage progression with explicit
    * state — the streaming face of the batch `q_funnel` query. Stage k is
    * reached at the earliest event of `stageTypes(k)` at-or-after the
    * time stage k-1 was reached; one `FunnelStage(user, stage, ts)` row
    * is emitted the FIRST time a user reaches each stage (append-safe:
    * stage membership never retracts), so `count by stage` over the
    * output is the funnel.
    *
    * State per user is k longs (earliest completion per stage) — O(users
    * x stages), not event history. Exactness contract: each micro-batch
    * is folded in (ts, event_id) order, so a single batch reproduces the
    * batch query exactly; across batches, events arriving out of
    * event-time order may lower a stage's completion time after later
    * stages were evaluated — the standard in-order-replay caveat every
    * bounded-state streaming funnel carries (the alternative is keeping
    * full per-user event history). */
  def funnel(events: Dataset[Event], stageTypes: Seq[String]): Dataset[FunnelStage] = {
    require(stageTypes.nonEmpty, "funnel needs at least one stage")
    import events.sparkSession.implicits._
    val k = stageTypes.size
    val types = stageTypes.toIndexedSeq
    events.filter(e => types.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          val before = state.getOption.map(_.reached.clone())
            .getOrElse(Array.fill(k)(-1L))
          val reached = before.clone()
          // fold to a FIXPOINT within the batch (at most k passes): a
          // stage-k event tied on ts with the stage-(k-1) completion can
          // sort before it and must be revisited — the batch query's
          // `ts >= t_{k-1}` is inclusive, so one pass would miss it
          var changed = true
          while (changed) {
            changed = false
            for (e <- sorted) {
              val s = types.indexOf(e.event_type)
              val prevOk = s == 0 || (reached(s - 1) >= 0 && e.ts >= reached(s - 1))
              if (prevOk && (reached(s) < 0 || e.ts < reached(s))) {
                reached(s) = e.ts
                changed = true
              }
            }
          }
          state.update(FunnelState(reached))
          // emit each stage the FIRST batch it is reached, with its
          // settled (post-fixpoint) timestamp
          (0 until k).iterator.collect {
            case s if before(s) < 0 && reached(s) >= 0 =>
              FunnelStage(userId, s + 1L, reached(s))
          }
      }
  }

  final case class FunnelStage(user_id: Long, stage: Long, reached_ts: Long)
  final case class FunnelState(reached: Array[Long])

  /** Streaming ingest dedup: drop events whose content fingerprint was
    * already seen within the watermark horizon — the streaming face of
    * `Dedup.exact` for an at-least-once ingest pipeline (retries and
    * replays produce duplicate events; this bounds the dedup state to the
    * watermark window instead of growing forever, which is the only shape
    * that survives an unbounded stream). Works identically on batch
    * frames, where `dropDuplicates` sees the whole input. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    // fingerprint the JSON of a struct, NOT concat_ws: a separator-joined
    // concat leaves field boundaries ambiguous and concat_ws silently
    // SKIPS nulls, so two distinct events (one with a null field) could
    // fingerprint identically and one be silently dropped; to_json keeps
    // field names, delimiters, and explicit nulls in the hashed text
    val keyed = events
      .withColumn("ts_sec", timestamp_seconds(col("ts") / lit(1000000000L)))
      .withColumn("fingerprint",
        md5(to_json(struct(
            col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")),
          Map("ignoreNullFields" -> "false"))))
    if (keyed.isStreaming)
      keyed.withWatermark("ts_sec", watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else keyed.dropDuplicates("fingerprint")
  }

  /** Streaming entry: parquet source dir -> windowed counts -> memory sink;
    * returns the started query (caller drives processAllAvailable). */
  def streamWindowedCounts(spark: SparkSession, sourceDir: String, queryName: String) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    windowedCounts(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
  }
}
