package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The REST metrics endpoint PERSISTS (round 10): posted spec scan
  * reports land under the table's `metadata/metrics/` with bounded
  * retention, read back through SQL as the `metrics` metadata table, and
  * count into the serve registry — mirroring the reference's recorded
  * metrics registry (core/src/common/metrics.rs:24-52). */
class RestMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private def post(uri: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("scan reports persist, serve back over SQL, and retention bounds them") {
    val cat = LocalCatalog(Files.createTempDirectory("rest-mx-wh").toString)
    IceWrite.create(spark, cat, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val snapId = cat.loadTable("t").currentSnapshotId.get
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p",
      metricsRetention = 5)
    try {
      val report =
        s"""{"report-type": "scan-report", "table-name": "t",
           | "snapshot-id": $snapId, "schema-id": 0,
           | "filter": {"type": "eq", "term": "id", "value": 1},
           | "projected-field-names": ["id", "v"],
           | "metrics": {
           |   "total-planning-duration": {"count": 1, "time-unit": "nanoseconds",
           |     "total-duration": 17000000},
           |   "result-data-files": {"unit": "count", "value": 2},
           |   "skipped-data-files": {"unit": "count", "value": 7}},
           | "metadata": {"engine-name": "probe"}}""".stripMargin
      val r = post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/metrics", report)
      assert(r.statusCode() == 204, r.body())
      assert(srv.metrics.counter("reports_received").get == 1L)
      assert(srv.metrics.counter("reports_scan-report").get == 1L)

      // read back through SQL: the metrics metadata table
      GraftSql.register("mx", cat)
      val row = spark.sql("SELECT * FROM mx.t.metrics").head
      assert(row.getAs[String]("report_type") == "scan-report")
      assert(row.getAs[Long]("snapshot_id") == snapId)
      assert(row.getAs[String]("filter").contains("\"eq\""))
      assert(row.getSeq[String](row.fieldIndex("projected_field_names")).toSeq
        == Seq("id", "v"))
      val m = row.getAs[Map[String, Double]]("metrics")
      assert(m("result-data-files.value") == 2.0)
      assert(m("skipped-data-files.value") == 7.0)
      assert(m("total-planning-duration.total-duration") == 17000000.0)
      assert(row.getAs[Map[String, String]]("metadata") == Map("engine-name" -> "probe"))
      assert(row.getAs[Long]("received_at_ms") > 0L)

      // retention: newest 5 survive a burst of 9 more
      (1 to 9).foreach { i =>
        assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/metrics",
          s"""{"report-type": "commit-report", "sequence-number": $i,
             | "metrics": {"added-data-files": {"unit": "count", "value": $i}}}"""
            .stripMargin).statusCode() == 204)
      }
      val n = spark.sql("SELECT count(*) FROM mx.t.metrics").head.getLong(0)
      assert(n == 5L, s"retention must bound stored reports, got $n")
      assert(srv.metrics.counter("reports_received").get == 10L)
      assert(srv.metrics.counter("reports_commit-report").get == 9L)

      // malformed JSON answers 400; a missing table still 404s
      assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/metrics",
        "{not json").statusCode() == 400)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables/nope/metrics",
        "{}").statusCode() == 404)
      GraftSql.unregister("mx")
    } finally srv.stop()
  }

  test("registry aggregation: N posted reports roll into per-table distributions") {
    val cat = LocalCatalog(Files.createTempDirectory("rest-agg-wh").toString)
    IceWrite.create(spark, cat, "t", Seq((1L, "a")).toDF("id", "v"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      // 12 scan reports: planning durations 2^i ms (in nanoseconds, the
      // spec's wire unit), result files i, bytes i MiB
      val durationsMs = (1 to 12).map(i => math.pow(2.0, i.toDouble))
      durationsMs.zipWithIndex.foreach { case (ms, i) =>
        val r = post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/metrics",
          s"""{"report-type": "scan-report", "metrics": {
             | "total-planning-duration": {"count": 1,
             |   "time-unit": "nanoseconds", "total-duration": ${(ms * 1e6).toLong}},
             | "result-data-files": {"unit": "count", "value": ${i + 1}},
             | "total-file-size-in-bytes": {"unit": "bytes",
             |   "value": ${(i + 1) * 1024L * 1024L}}}}""".stripMargin)
        assert(r.statusCode() == 204, r.body())
      }
      // 3 commit reports, durations given in MILLISECONDS directly
      (1 to 3).foreach { i =>
        assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/metrics",
          s"""{"report-type": "commit-report", "metrics": {
             | "total-duration": {"count": 1, "time-unit": "milliseconds",
             |   "total-duration": ${i * 100}},
             | "added-data-files": {"unit": "count", "value": $i}}}"""
            .stripMargin).statusCode() == 204)
      }

      val hists = srv.metrics.histogramSnapshots
      val plan = hists("scan_planning_ms:t")
      assert(plan.count == 12 && math.abs(plan.sum - durationsMs.sum) < 1.0,
        s"planning distribution: count=${plan.count} sum=${plan.sum}")
      // the 1ms x4^8 envelope: bounds 1,4,16,...; durations 2..4096 ms ->
      // cumulative counts must be monotone and end at 12
      assert(plan.cumulativeCounts.last == 12)
      assert(plan.cumulativeCounts == plan.cumulativeCounts.sorted)
      // le=16ms holds durations 2,4,8,16 -> 4 observations
      val le16 = plan.bounds.indexWhere(_ >= 16.0)
      assert(plan.cumulativeCounts(le16) == 4, s"${plan.cumulativeCounts}")
      val files = hists("scan_result_files:t")
      assert(files.count == 12 && files.sum == (1 to 12).sum.toDouble)
      val bytes = hists("scan_result_bytes:t")
      assert(bytes.count == 12)
      val cdur = hists("commit_duration_ms:t")
      assert(cdur.count == 3 && cdur.sum == 600.0)
      assert(hists("commit_added_files:t").count == 3)
      // per-TABLE keying: no cross-table histogram exists
      assert(!hists.keys.exists(k => k.endsWith(":nope")))

      // RESTART RECOVERY: a fresh server over the same catalog rebuilds
      // the distributions from the persisted reports
      val srv2 = new IcebergRestServe(cat, namespace = "wh", prefix = "p2")
      try {
        assert(srv2.metrics.histogramSnapshots.get("scan_planning_ms:t").isEmpty)
        val replayed = srv2.rollupPersistedReports()
        assert(replayed == 15, s"replayed $replayed of 15 persisted reports")
        val plan2 = srv2.metrics.histogramSnapshots("scan_planning_ms:t")
        assert(plan2.count == plan.count && plan2.cumulativeCounts == plan.cumulativeCounts,
          "rebuilt distribution must equal the live one")
        assert(srv2.metrics.histogramSnapshots("commit_duration_ms:t").sum == 600.0)
      } finally srv2.stop()
    } finally srv.stop()
  }
}
