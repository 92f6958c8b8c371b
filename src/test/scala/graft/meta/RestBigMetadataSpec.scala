package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 big-metadata serving. The served LoadTableResult is already
  * small at any manifest size (the export references spec manifest
  * FILES, never inlining entries) — the responses that DO grow with the
  * table are the plan pages (1000 rendered file-scan-tasks each), so
  * gzip `Content-Encoding` is proven there; the opt-in
  * metadata-location-only load shape answers bytes proportional to
  * nothing but the path. */
class RestBigMetadataSpec extends AnyFunSuite {
  private val http = HttpClient.newHttpClient()

  private def gunzip(b: Array[Byte]): String =
    new String(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)).readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)

  test("gzip plan pages + location-only load at the 100k-entry fixture") {
    val cat = LocalCatalog(Files.createTempDirectory("rest-big-wh").toString)
    val m0 = cat.createTable(TableMetadata("big", location = "",
      schema = Seq(SchemaField(1, "id", "BIGINT"))))
    val entries = (0 until 100000).map(i => FileEntry(s"/data/f$i.parquet", 100L,
      FileContent.Data, 10L, 1L,
      columnStats = Map("id" -> (s"${i * 10}", s"${i * 10 + 9}"))))
    cat.commit(m0, m0.copy(snapshots = Seq(Snapshot(1L, None, 1L, 0L, entries)),
      currentSnapshotId = Some(1L), refs = Map("main" -> 1L),
      lastSequenceNumber = 1L))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      val base = s"${srv.uri}/v1/p/namespaces/wh/tables/big"
      // async plan over 100k files, then fetch one page both ways
      val sub = JsonMethods.parse(http.send(HttpRequest.newBuilder(
        URI.create(s"$base/plan"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build(),
        HttpResponse.BodyHandlers.ofString()).body())
      assert((sub \ "plan-status") == JString("submitted"), sub)
      val pid = (sub \ "plan-id").asInstanceOf[JString].s
      var status = "submitted"
      var polls = 0
      while (status == "submitted") {
        status = (JsonMethods.parse(http.send(HttpRequest.newBuilder(
          URI.create(s"$base/plan/$pid")).GET().build(),
          HttpResponse.BodyHandlers.ofString()).body()) \ "plan-status")
          .asInstanceOf[JString].s
        polls += 1; assert(polls < 400, "plan never completed"); Thread.sleep(25)
      }
      assert(status == "completed")
      val pageUri = URI.create(s"$base/plan/$pid?pageToken=0")
      val plain = http.send(HttpRequest.newBuilder(pageUri).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(plain.headers().firstValue("Content-Encoding").isEmpty)
      assert(plain.body().length > 100000, "a 1000-task page is real data")
      val gz = http.send(HttpRequest.newBuilder(pageUri)
        .header("Accept-Encoding", "gzip").GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(gz.statusCode() == 200)
      assert(gz.headers().firstValue("Content-Encoding").orElse("") == "gzip")
      assert(gunzip(gz.body()) == plain.body(), "gzip must carry the identical body")
      assert(gz.body().length < plain.body().length / 4,
        s"plan JSON must compress hard: ${gz.body().length} vs ${plain.body().length}")

      // the location-only shape: bytes independent of manifest size, the
      // named file real and complete
      val lo = http.send(HttpRequest.newBuilder(
        URI.create(s"$base?metadata-location-only=true")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(lo.statusCode() == 200, lo.body())
      assert(lo.body().length < 4096,
        s"location-only body must stay tiny, got ${lo.body().length}")
      val j = JsonMethods.parse(lo.body())
      assert((j \ "metadata") == JNothing, "no embedded metadata")
      val loc = (j \ "metadata-location").asInstanceOf[JString].s
      assert(loc.endsWith(".metadata.json") && MetaIO.exists(loc))
      val full = JsonMethods.parse(MetaIO.readString(loc))
      assert((full \ "snapshots").asInstanceOf[JArray].arr.nonEmpty,
        "the named file carries the full metadata")
      // repeated location-only loads hit the cache (same body); the full
      // load still serves the embedded metadata
      val lo2 = http.send(HttpRequest.newBuilder(
        URI.create(s"$base?metadata-location-only=true")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(lo2.body() == lo.body())
      val fullLoad = JsonMethods.parse(http.send(
        HttpRequest.newBuilder(URI.create(base)).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body())
      assert((fullLoad \ "metadata" \ "table-uuid") != JNothing)
    } finally srv.stop()
  }
}
