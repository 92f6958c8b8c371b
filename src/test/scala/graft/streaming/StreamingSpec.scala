package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def events = {
    // ts -> epoch-nanos bigint whatever precision the file stores (the
    // pipeline's shared time domain; see CoreQueries.normalizeTsNanos)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.queries.CoreQueries.normalizeTsNanos(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
  }

  test("streaming windowed counts match the batch computation") {
    // readStream needs a directory source
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    // write the NORMALIZED frame (ts as nano long), not the raw file — the
    // stream source reads with EventPipeline.eventSchema's ts: LONG
    graft.testkit.FileGenerator.writeSingleParquet(spark,
      events.select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props"),
      dir.resolve("events.parquet"))
    val q = EventPipeline.streamWindowedCounts(spark, dir.toString, "stream_out")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out")
        .select($"window.start".as("ws"), $"event_type", $"n", $"total_value")
      val batch = EventPipeline.windowedCounts(events)
        .select($"window.start".as("ws"), $"event_type", $"n", $"total_value")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      assert(batch.count() > 0)
    } finally q.stop()
  }

  test("streaming dedup drops a replayed micro-batch; batch mode agrees") {
    val slice = events.filter($"event_id" < 500)
    val nUnique = slice.count()

    // batch face: an exact replay (union of the slice with itself) dedups
    // back to the unique set
    assert(EventPipeline.dedupEvents(slice.unionAll(slice)).count() == nUnique)

    // streaming face: deliver the same file twice as two micro-batches —
    // an at-least-once source replay; state + watermark drop every dup
    val dir = java.nio.file.Files.createTempDirectory("events-dedup")
    graft.testkit.FileGenerator.writeSingleParquet(spark, slice, dir.resolve("tmp.parquet"))
    val schema = slice.schema
    val q = EventPipeline.dedupEvents(
        spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      java.nio.file.Files.copy(dir.resolve("tmp.parquet"), dir.resolve("a.parquet"))
      q.processAllAvailable()
      java.nio.file.Files.copy(dir.resolve("tmp.parquet"), dir.resolve("b.parquet"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == nUnique)
      assert(spark.table("dedup_out").select($"event_id").distinct().count() == nUnique)
    } finally q.stop()
  }

  test("streaming funnel matches the batch funnel query; in-order replay accumulates") {
    import EventPipeline.Event
    // batch face over the real events table: one batch == exact q_funnel
    val evDs = events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val stages = Seq("view", "click", "purchase")
    val got = EventPipeline.funnel(evDs, stages)
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // independent batch computation (the q_funnel shape)
    val v = events.filter($"event_type" === "view").groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = events.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" >= $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = events.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" >= $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    assert(got.getOrElse(1L, 0L) == v.count())
    assert(got.getOrElse(2L, 0L) == c.count())
    assert(got.getOrElse(3L, 0L) == p.count())
    assert(got.getOrElse(1L, 0L) >= got.getOrElse(3L, 0L), "funnel never widens")

    // streaming face: two in-order micro-batches; a user whose stages
    // span the batch boundary still progresses (state carries t1)
    val dir = java.nio.file.Files.createTempDirectory("events-funnel")
    val b1 = Seq(Event(1L, 1000L, 7L, "view", 0.0), Event(2L, 2000L, 7L, "click", 0.0),
      Event(3L, 1500L, 8L, "view", 0.0)).toDF()
    val b2 = Seq(Event(4L, 3000L, 7L, "purchase", 0.0), Event(5L, 2500L, 8L, "click", 0.0),
      // pre-view purchase for user 8: must NOT count (no click-then-purchase order)
      Event(6L, 100L, 9L, "purchase", 0.0)).toDF()
    val schema = b1.schema
    graft.testkit.FileGenerator.writeSingleParquet(spark, b1, dir.resolve("a.parquet"))
    val q = EventPipeline.funnel(
        spark.readStream.schema(schema).parquet(dir.toString).as[Event], stages)
      .writeStream.outputMode("append").format("memory").queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      graft.testkit.FileGenerator.writeSingleParquet(spark, b2, dir.resolve("b.parquet"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((7L, 1L, 1000L), (7L, 2L, 2000L), (7L, 3L, 3000L),
        (8L, 1L, 1500L), (8L, 2L, 2500L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming CDC upsert: re-delivered keys converge to the latest row") {
    import graft.meta.{IceRead, IceWrite, LocalCatalog}
    val catalog = LocalCatalog(java.nio.file.Files.createTempDirectory("cdc-wh").toString)
    val srcDir = java.nio.file.Files.createTempDirectory("cdc-src")
    IceWrite.create(spark, catalog, "cdc",
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver"))

    val schema = Seq((1L, "x", 1L)).toDF("id", "v", "ver").schema
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.foreachBatch(IceWrite.streamingUpsert(catalog, "cdc", Seq("id"), "ver"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-ck").toString)
      .start()
    try {
      // batch 1: update id=2, insert id=3
      graft.testkit.FileGenerator.writeSingleParquet(spark,
        Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ver"), srcDir.resolve("b1.parquet"))
      q.processAllAvailable()
      // batch 2: update id=3 again, insert id=4 — AND a self-conflicting
      // batch for id=4: two rows in ONE micro-batch, the higher `ver`
      // must win deterministically (not an arbitrary dropDuplicates pick)
      graft.testkit.FileGenerator.writeSingleParquet(spark,
        Seq((3L, "c3", 3L), (4L, "stale", 2L), (4L, "d", 3L)).toDF("id", "v", "ver"),
        srcDir.resolve("b2.parquet"))
      q.processAllAvailable()

      val out = IceRead.table(spark, catalog, "cdc")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c3", 3L), (4L, "d", 3L)))
      // each micro-batch = one atomic snapshot
      assert(catalog.loadTable("cdc").snapshots.size == 3)
    } finally q.stop()
  }

  test("stream-stream join with watermarks matches the batch join") {
    val slice = events.filter($"event_id" < 2000)
      .withColumn("ts_sec", timestamp_seconds($"ts" / lit(1000000000L)))
    // enrich click-like events with the same user's purchase-like events
    // inside a bounded time band — the canonical watermarked
    // stream-stream inner join
    def joinShape(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) = {
      val a = l.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts_sec".as("click_ts"))
      val b = r.filter($"event_type" === "purchase")
        .select($"user_id".as("u2"), $"event_id".as("purchase_id"), $"ts_sec".as("purchase_ts"))
      a.join(b, $"user_id" === $"u2" &&
        $"purchase_ts" >= $"click_ts" && $"purchase_ts" <= $"click_ts" + expr("INTERVAL 10 MINUTES"))
        .select($"user_id", $"click_id", $"purchase_id")
    }
    val batch = joinShape(slice, slice)

    val dir = java.nio.file.Files.createTempDirectory("ss-join")
    graft.testkit.FileGenerator.writeSingleParquet(spark,
      slice.select($"event_id", $"ts", $"user_id", $"event_type", $"value"),
      dir.resolve("events.parquet"))
    val schema = slice.select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts_sec", timestamp_seconds($"ts" / lit(1000000000L)))
      .withWatermark("ts_sec", "30 minutes")
    val q = joinShape(stream, stream)
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
      assert(batch.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming ingestion into the table format: one snapshot per micro-batch") {
    import graft.meta.{IceRead, IceWrite, LocalCatalog, SchemaField, TableMetadata}
    val catalog = LocalCatalog(java.nio.file.Files.createTempDirectory("ing-wh").toString)
    val srcDir = java.nio.file.Files.createTempDirectory("events-src")

    // create the (empty-schema) table first from a static read
    val full = events
    catalog.createTable(TableMetadata(
      name = "ev", location = "", schema = SchemaField.fromNames(full.columns.toSeq)))

    val schema = full.schema
    val stream = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.foreachBatch(IceWrite.streamingAppend(catalog, "ev"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ing-ck").toString)
      .start()
    try {
      // batch 1: first half
      java.nio.file.Files.createDirectories(srcDir.resolve("b1"))
      graft.testkit.FileGenerator.writeSingleParquet(spark,
        full.filter($"event_id" < 500), srcDir.resolve("b1").resolve("p.parquet"))
      java.nio.file.Files.move(srcDir.resolve("b1").resolve("p.parquet"), srcDir.resolve("b1.parquet"))
      stream.processAllAvailable()
      val n1 = IceRead.table(spark, catalog, "ev").count()
      assert(n1 == full.filter($"event_id" < 500).count())

      // batch 2: second half -> a second snapshot
      java.nio.file.Files.createDirectories(srcDir.resolve("b2"))
      graft.testkit.FileGenerator.writeSingleParquet(spark,
        full.filter($"event_id" >= 500), srcDir.resolve("b2").resolve("p.parquet"))
      java.nio.file.Files.move(srcDir.resolve("b2").resolve("p.parquet"), srcDir.resolve("b2.parquet"))
      stream.processAllAvailable()
      assert(IceRead.table(spark, catalog, "ev").count() == full.count())
      assert(catalog.loadTable("ev").snapshots.size == 2)
    } finally stream.stop()
  }

  test("sessionization: gap splits sessions, totals preserved") {
    import EventPipeline.Event
    val gap = 60L * 1000000000L // 1 minute in nanos
    val data = Seq(
      Event(1, 0L, 7L, "a", 1.0),
      Event(2, 30L * 1000000000L, 7L, "a", 2.0),     // same session (30s gap)
      Event(3, 200L * 1000000000L, 7L, "b", 3.0),    // new session (170s gap)
      Event(4, 0L, 8L, "a", 5.0)                     // other user
    ).toDS()
    val sessions = EventPipeline.sessionize(data, gap).collect().sortBy(s => (s.user_id, s.start_ts))
    assert(sessions.length == 3)
    val s1 = sessions(0)
    assert(s1.user_id == 7 && s1.n_events == 2 && s1.total_value == 3.0)
    val s2 = sessions(1)
    assert(s2.user_id == 7 && s2.n_events == 1 && s2.total_value == 3.0)
    assert(sessions(2).user_id == 8)
  }

  test("sessionization on real events: every event lands in exactly one session") {
    import EventPipeline.Event
    val ds = events.select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val gap = 3600L * 1000000000L // 1 hour
    val sessions = EventPipeline.sessionize(ds, gap)
    assert(sessions.agg(sum($"n_events")).head.getLong(0) == ds.count())
  }

  test("exactlyOnceAppend: a replayed epoch is fenced, not double-ingested") {
    import graft.meta.{IceRead, IceWrite, LocalCatalog}
    val catalog = LocalCatalog(java.nio.file.Files.createTempDirectory("eo-wh").toString)
    val sink = IceWrite.exactlyOnceAppend(catalog, "eo", "s1")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink(b0, 0L)
    assert(IceRead.table(spark, catalog, "eo").count() == 2)
    // the crash-after-commit scenario: foreachBatch re-delivers epoch 0
    sink(b0, 0L)
    assert(IceRead.table(spark, catalog, "eo").count() == 2,
      "replayed epoch must not double-append")
    sink(Seq((3L, "c")).toDF("id", "v"), 1L)
    assert(IceRead.table(spark, catalog, "eo").count() == 3)
    // a SECOND sink id fences independently into the same table
    val sink2 = IceWrite.exactlyOnceAppend(catalog, "eo", "s2")
    sink2(Seq((9L, "z")).toDF("id", "v"), 0L)
    sink2(Seq((9L, "z")).toDF("id", "v"), 0L)
    assert(IceRead.table(spark, catalog, "eo").count() == 4)
    assert(catalog.loadTable("eo").properties("stream.s1.batch-id") == "1")
    assert(catalog.loadTable("eo").properties("stream.s2.batch-id") == "0")
  }

  test("exactlyOnceAppend drives a real stream end to end") {
    import graft.meta.{IceRead, IceWrite, LocalCatalog}
    val catalog = LocalCatalog(java.nio.file.Files.createTempDirectory("eos-wh").toString)
    val srcDir = java.nio.file.Files.createTempDirectory("eos-src")
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.foreachBatch(IceWrite.exactlyOnceAppend(catalog, "eos"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("eos-ck").toString)
      .start()
    try {
      graft.testkit.FileGenerator.writeSingleParquet(spark,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), srcDir.resolve("b0.parquet"))
      q.processAllAvailable()
      graft.testkit.FileGenerator.writeSingleParquet(spark,
        Seq((3L, "c")).toDF("id", "v"), srcDir.resolve("b1.parquet"))
      q.processAllAvailable()
      assert(IceRead.table(spark, catalog, "eos")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }
}
