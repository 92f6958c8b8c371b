package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-10 serve auth + namespace-properties surface:
  *
  *  - `POST /v1/oauth/tokens` — the spec's OAuth2 client-credentials
  *    grant, the bootstrap a stock client performs before first contact
  *    (reference harness: integration-tests/src/bin/README.md:52);
  *  - storage-credential VENDING on LoadTableResult — object-store
  *    warehouses hand access configuration to clients with the table;
  *  - namespace `properties` on create / GET / the spec's update
  *    endpoint. */
class RestAuthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private def get(uri: String, token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(uri)).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def post(uri: String, body: String,
      contentType: String = "application/json",
      token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def freshCatalog() =
    LocalCatalog(Files.createTempDirectory("rest-auth-wh").toString)

  test("OAuth2 client-credentials: bootstrap, bad secret 401, token-gated routes") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t", Seq((1L, "a")).toDF("id", "v"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p",
      oauthClients = Map("svc" -> "s3cret"))
    try {
      // without a token every route refuses
      assert(get(s"${srv.uri}/v1/config").statusCode() == 401)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/t").statusCode() == 401)
      // a bad secret answers the OAuth invalid_client 401
      val bad = post(s"${srv.uri}/v1/oauth/tokens",
        "grant_type=client_credentials&client_id=svc&client_secret=wrong",
        "application/x-www-form-urlencoded")
      assert(bad.statusCode() == 401, bad.body())
      assert((JsonMethods.parse(bad.body()) \ "error") == JString("invalid_client"))
      // an unsupported grant answers 400
      assert(post(s"${srv.uri}/v1/oauth/tokens",
        "grant_type=password&client_id=svc&client_secret=s3cret",
        "application/x-www-form-urlencoded").statusCode() == 400)
      // the real bootstrap: token, then the full read surface works
      val tok = IcebergRestImport.fetchOauthToken(srv.uri, "svc", "s3cret")
      assert(get(s"${srv.uri}/v1/config", Some(tok)).statusCode() == 200)
      val dst = freshCatalog()
      val back = IcebergRestImport.importTable(dst, "t2", srv.uri,
        Seq("wh"), "t", authToken = Some(tok))
      assert(back.schema.map(_.name) == Seq("id", "v"))
      assert(IceRead.table(spark, dst, "t2").count() == 1L)
      // a made-up token is refused
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/t",
        Some("forged")).statusCode() == 401)
    } finally srv.stop()
  }

  test("token endpoint answers 404 on a server with no OAuth registry") {
    val srv = new IcebergRestServe(freshCatalog(), namespace = "wh", prefix = "p")
    try assert(post(s"${srv.uri}/v1/oauth/tokens",
      "grant_type=client_credentials&client_id=a&client_secret=b",
      "application/x-www-form-urlencoded").statusCode() == 404)
    finally srv.stop()
  }

  test("storage credentials vend with the table: mocks3 data readable from vended config alone") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[graft.testkit.MockS3FileSystem].getName)
    hc.set("fs.AbstractFileSystem.mocks3.impl",
      classOf[graft.testkit.MockS3Afs].getName)
    val s3srv = new RestCatalog.Server(
      "mocks3://" + Files.createTempDirectory("rest-auth-s3").toString)
    val cat = new RestCatalog.Client(s3srv.uri)
    IceWrite.create(spark, cat, "t", (1L to 30L).map(i => (i, s"n$i")).toDF("id", "v"))
    val vended = Map(
      "fs.mocks3.impl" -> classOf[graft.testkit.MockS3FileSystem].getName,
      "fs.AbstractFileSystem.mocks3.impl" ->
        classOf[graft.testkit.MockS3Afs].getName)
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p",
      oauthClients = Map("svc" -> "pw"), storageCredentials = vended)
    try {
      val tok = IcebergRestImport.fetchOauthToken(srv.uri, "svc", "pw")
      val ltr = JsonMethods.parse(
        get(s"${srv.uri}/v1/p/namespaces/wh/tables/t", Some(tok)).body())
      val creds = (ltr \ "storage-credentials").asInstanceOf[JArray].arr
      assert(creds.size == 1)
      val prefix = (creds.head \ "prefix").asInstanceOf[JString].s
      assert(prefix.startsWith("mocks3:/"), prefix)
      val cfg = (creds.head \ "config").asInstanceOf[JObject].obj
        .collect { case (k, JString(v)) => k -> v }.toMap
      assert(cfg == vended)
      assert((ltr \ "config") == (creds.head \ "config"),
        "the io config mirrors the vended stanza")
      // the proof: a FRESH Hadoop configuration carrying ONLY the vended
      // stanza reaches the table's storage
      val fresh = new org.apache.hadoop.conf.Configuration()
      assert(fresh.get("fs.mocks3.impl") == null, "fresh conf must not know mocks3")
      cfg.foreach { case (k, v) => fresh.set(k, v) }
      val fs = new org.apache.hadoop.fs.Path(prefix).getFileSystem(fresh)
      val data = fs.listStatus(new org.apache.hadoop.fs.Path(prefix, "data"))
      assert(data.nonEmpty, "vended credentials must reach the data files")
    } finally { srv.stop(); s3srv.stop() }
  }

  test("namespace properties: create, GET, spec update endpoint, refusals") {
    val cat = freshCatalog()
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      assert(post(s"${srv.uri}/v1/p/namespaces",
        """{"namespace": ["wh", "team"], "properties": {"owner": "core", "tier": "gold"}}""")
        .statusCode() == 200)
      val got = JsonMethods.parse(get(s"${srv.uri}/v1/p/namespaces/wh%1Fteam").body())
      assert((got \ "properties" \ "owner") == JString("core"))
      assert((got \ "properties" \ "tier") == JString("gold"))
      // the spec update endpoint: updates + removals, triple response
      val upd = post(s"${srv.uri}/v1/p/namespaces/wh%1Fteam/properties",
        """{"removals": ["tier", "ghost"], "updates": {"owner": "infra", "region": "eu"}}""")
      assert(upd.statusCode() == 200, upd.body())
      val tri = JsonMethods.parse(upd.body())
      assert((tri \ "updated") == JArray(List(JString("owner"), JString("region"))))
      assert((tri \ "removed") == JArray(List(JString("tier"))))
      assert((tri \ "missing") == JArray(List(JString("ghost"))))
      val after = JsonMethods.parse(get(s"${srv.uri}/v1/p/namespaces/wh%1Fteam").body())
      assert((after \ "properties") == JObject(List(
        "owner" -> JString("infra"), "region" -> JString("eu"))))
      // refusals: key in both lists, reserved key, nonexistent namespace
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fteam/properties",
        """{"removals": ["x"], "updates": {"x": "1"}}""").statusCode() == 400)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fteam/properties",
        """{"updates": {"graft.internal": "1"}}""").statusCode() == 400)
      assert(post(s"${srv.uri}/v1/p/namespaces/wh%1Fnope/properties",
        """{"updates": {"a": "1"}}""").statusCode() == 404)
      assert(post(s"${srv.uri}/v1/p/namespaces",
        """{"namespace": ["wh", "bad"], "properties": {"graft.x": "1"}}""")
        .statusCode() == 400)
      // drop clears properties; a recreate starts empty
      assert(http.send(HttpRequest.newBuilder(URI.create(
        s"${srv.uri}/v1/p/namespaces/wh%1Fteam")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() == 204)
      assert(post(s"${srv.uri}/v1/p/namespaces",
        """{"namespace": ["wh", "team"]}""").statusCode() == 200)
      assert((JsonMethods.parse(get(s"${srv.uri}/v1/p/namespaces/wh%1Fteam").body())
        \ "properties") == JObject(Nil))
    } finally srv.stop()
  }
}
