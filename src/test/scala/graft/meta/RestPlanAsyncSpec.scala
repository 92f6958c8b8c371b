package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 async scan planning: an unsharded ad-hoc `plan` over a big
  * snapshot answers `submitted` + plan-id; the client polls, PAGES the
  * completed result (each page self-contained with its own delete-files),
  * or cancels with DELETE. The paged union must equal the synchronous
  * sharded union exactly — same invariant as preplan. */
class RestPlanAsyncSpec extends AnyFunSuite {
  private val http = HttpClient.newHttpClient()
  private def get(uri: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(uri: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def delete(uri: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(uri)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())

  /** 2500 synthetic data entries + one global pos-delete, so pages must
    * carry delete references. */
  private def bigServer(): (LocalCatalog, IcebergRestServe) = {
    val cat = LocalCatalog(Files.createTempDirectory("rest-async-wh").toString)
    val m0 = cat.createTable(TableMetadata("big", location = "",
      schema = Seq(SchemaField(1, "id", "BIGINT"))))
    val del = FileEntry("/del/d0.parquet", 50L, FileContent.PositionDeletes, 5L, 2L)
    val entries = (0 until 2500).map(i => FileEntry(s"/data/f$i.parquet", 100L,
      FileContent.Data, 10L, 1L,
      columnStats = Map("id" -> (s"${i * 10}", s"${i * 10 + 9}")))) :+ del
    cat.commit(m0, m0.copy(snapshots = Seq(Snapshot(1L, None, 2L, 0L, entries)),
      currentSnapshotId = Some(1L), refs = Map("main" -> 1L),
      lastSequenceNumber = 2L))
    (cat, new IcebergRestServe(cat, namespace = "wh", prefix = "p"))
  }

  private def pollCompleted(srv: IcebergRestServe, pid: String): JValue = {
    var j: JValue = JNothing
    var polls = 0
    while ({
      j = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/$pid").body())
      (j \ "plan-status") == JString("submitted")
    }) { polls += 1; assert(polls < 200, "plan never completed"); Thread.sleep(25) }
    j
  }

  test("submitted -> poll -> paged fetch; paged union == sharded union") {
    val (_, srv) = bigServer()
    try {
      val sub = JsonMethods.parse(post(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan", "{}").body())
      assert((sub \ "plan-status") == JString("submitted"), sub)
      val pid = (sub \ "plan-id").asInstanceOf[JString].s
      val first = pollCompleted(srv, pid)
      assert((first \ "plan-status") == JString("completed"))

      // walk the pages: each bounded, each self-contained, union exact
      var token: Option[String] = Some("0")
      var pages = 0
      val seen = Seq.newBuilder[String]
      while (token.nonEmpty) {
        val j = JsonMethods.parse(get(
          s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/$pid" +
            s"?pageToken=${token.get}").body())
        val tasks = (j \ "file-scan-tasks").asInstanceOf[JArray].arr
        assert(tasks.size <= IcebergRestServe.PlanPageSize)
        // page-local delete references resolve inside THIS page
        val dels = (j \ "delete-files").asInstanceOf[JArray].arr
        assert(dels.size == 1, "the global pos-delete rides every page")
        tasks.foreach { t =>
          (t \ "delete-file-references") match {
            case JArray(refs) => refs.foreach(r =>
              assert(r.asInstanceOf[JInt].num.toInt < dels.size))
            case _ => fail("every data file here has the global delete")
          }
        }
        seen ++= tasks.map(t => (t \ "data-file" \ "file-path").asInstanceOf[JString].s)
        pages += 1
        token = (j \ "next-page-token") match {
          case JString(t) => Some(t); case _ => None
        }
        assert(pages <= 5, "token chain must terminate")
      }
      assert(pages == 3, s"2500/1000 needs 3 pages, got $pages")
      val paged = seen.result()
      assert(paged.size == 2500 && paged.distinct.size == 2500)

      // the invariant: paged async union == synchronous preplan-shard union
      val pre = JsonMethods.parse(post(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/preplan", "{}").body())
      val shardTasks = (pre \ "plan-tasks").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JString].s)
      val sharded = shardTasks.flatMap { task =>
        val j = JsonMethods.parse(post(
          s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan",
          s"""{"plan-task": "$task"}""").body())
        assert((j \ "plan-status") == JString("completed"),
          "shard tokens stay synchronous")
        (j \ "file-scan-tasks").asInstanceOf[JArray].arr
          .map(t => (t \ "data-file" \ "file-path").asInstanceOf[JString].s)
      }
      assert(sharded.toSet == paged.toSet, "async paged == sharded union")
    } finally srv.stop()
  }

  test("cancellation wins and is idempotent; unknown plan ids 404") {
    val (_, srv) = bigServer()
    try {
      val sub = JsonMethods.parse(post(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan", "{}").body())
      val pid = (sub \ "plan-id").asInstanceOf[JString].s
      assert(delete(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/$pid").statusCode() == 204)
      // cancelled stays cancelled even if the worker completes after
      Thread.sleep(150)
      val st = JsonMethods.parse(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/$pid").body())
      assert((st \ "plan-status") == JString("cancelled"), st)
      assert((st \ "file-scan-tasks") == JNothing, "cancelled serves no results")
      assert(delete(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/$pid").statusCode() == 204)
      // unknown ids 404 on both verbs
      assert(get(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/nope").statusCode() == 404)
      assert(delete(
        s"${srv.uri}/v1/p/namespaces/wh/tables/big/plan/nope").statusCode() == 404)
    } finally srv.stop()
  }

  test("small tables still answer completed inline (no async detour)") {
    val cat = LocalCatalog(Files.createTempDirectory("rest-async-sm").toString)
    val m0 = cat.createTable(TableMetadata("small", location = "",
      schema = Seq(SchemaField(1, "id", "BIGINT"))))
    val entries = (0 until 5).map(i => FileEntry(s"/data/s$i.parquet", 100L,
      FileContent.Data, 10L, 1L))
    cat.commit(m0, m0.copy(snapshots = Seq(Snapshot(1L, None, 1L, 0L, entries)),
      currentSnapshotId = Some(1L), refs = Map("main" -> 1L),
      lastSequenceNumber = 1L))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val j = JsonMethods.parse(post(
        s"${srv.uri}/v1/p/namespaces/wh/tables/small/plan", "{}").body())
      assert((j \ "plan-status") == JString("completed"))
      assert((j \ "file-scan-tasks").asInstanceOf[JArray].arr.size == 5)
    } finally srv.stop()
  }
}
