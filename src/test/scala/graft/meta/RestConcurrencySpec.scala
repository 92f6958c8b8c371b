package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The REST serve dispatch is CONCURRENT (round 10): readers — loads,
  * plans, listings — run in parallel and take no lock, mutations
  * serialize per catalog entry, and a slow foreign commit (its footer
  * validation is real I/O) must not head-of-line-block the reader fleet
  * the preplan sharding was built for. Proven with `slowfs://` delete
  * files whose every `open` sleeps, not with wall-clock guesses. */
class RestConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private def get(uri: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(uri: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("rest-conc-wh").toString)

  test("a slow foreign commit does not block readers (bounded latency under commit)") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slowfs.impl", classOf[graft.testkit.SlowLocalFileSystem].getName)
    hc.set("fs.AbstractFileSystem.slowfs.impl",
      classOf[graft.testkit.SlowLocalAfs].getName)
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t",
      (1L to 40L).map(i => (i, s"n$i")).toDF("id", "name"))
    val schema = cat.loadTable("t").schema
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val staging = Files.createTempDirectory("rest-conc-st").toString
      // 8 equality-delete files, each addressed through slowfs:// — the
      // server's pre-commit footer validation opens every one
      val deletes = (0 until 8).map { i =>
        val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
          spark, IceWrite.withFieldIds(Seq(Tuple1(i + 1L)).toDF("id"), schema),
          java.nio.file.Paths.get(staging, s"eq$i.parquet"))
        IcebergRestCommit.AddedDeleteFile(s"slowfs://$p", sz, n, "equality",
          equalityFieldIds = Seq(1))
      }
      // warm the serve cache so reader timings measure dispatch, not the
      // first-load metadata export
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/t").statusCode() == 200)

      graft.testkit.SlowFsLatency.openDelayMs = 400L // 8 opens >= 3.2s in-commit
      val pool = Executors.newSingleThreadExecutor()
      val commitStarted = new CountDownLatch(1)
      val commit = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          commitStarted.countDown()
          IcebergRestCommit.commitDelta(srv.uri, Seq("wh"), "t",
            Nil, deletes, staging)
        }
      })
      try {
        commitStarted.await(5, TimeUnit.SECONDS)
        Thread.sleep(250) // let the commit reach its slow validation I/O
        // the reader fleet: loads, plans, listings — all must answer
        // while the commit is still validating
        val t0 = System.nanoTime()
        (1 to 4).foreach { _ =>
          assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/t").statusCode() == 200)
          assert(post(s"${srv.uri}/v1/p/namespaces/wh/tables/t/plan", "{}")
            .statusCode() == 200)
          assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables").statusCode() == 200)
        }
        val readSecs = (System.nanoTime() - t0) / 1e9
        assert(!commit.isDone,
          s"the slow commit must still be validating while readers answer " +
            s"(reads took ${readSecs}s)")
        val snap = commit.get(60, TimeUnit.SECONDS)
        assert(cat.loadTable("t").currentSnapshotId.contains(snap))
      } finally {
        graft.testkit.SlowFsLatency.openDelayMs = 0L
        pool.shutdown()
      }
      // the commit itself landed correctly: 8 single-key eq-deletes
      assert(IceRead.table(spark, cat, "t").count() == 32L)
    } finally srv.stop()
  }

  test("concurrent REST commits on one table: every writer lands via 409+retry") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "c",
      (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    val schema = cat.loadTable("c").schema
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val staging = Files.createTempDirectory("rest-conc-w").toString
      val pool = Executors.newFixedThreadPool(4)
      val tasks = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            val (p, sz, n, _) = graft.testkit.FileGenerator.writeSingleParquet(
              spark, IceWrite.withFieldIds(
                Seq((100L + w, s"w$w")).toDF("id", "name"), schema),
              java.nio.file.Paths.get(staging, s"w$w.parquet"))
            // appendFiles retries internally on 409 (spec discipline)
            IcebergRestCommit.appendFiles(srv.uri, Seq("wh"), "c",
              Seq(IcebergRestCommit.AddedFile(p, sz, n)), staging, maxRetries = 10)
          }
        })
      }
      tasks.foreach(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(IceRead.table(spark, cat, "c").count() == 14L,
        "all four concurrent appends must land")
      assert(cat.loadTable("c").snapshots.size == 5, "one snapshot per append")
    } finally srv.stop()
  }
}
