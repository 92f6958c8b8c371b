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

  test("expiry matrix: token TTL, expiring vends, credentials endpoint, rotation") {
    val cat = freshCatalog()
    IceWrite.create(spark, cat, "t", Seq((1L, "a")).toDF("id", "v"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p",
      oauthClients = Map("svc" -> "pw"),
      storageCredentials = Map("s3.access-key-id" -> "vended-ak"),
      credentialTtlMs = 700L, tokenTtlMs = 2000L)
    try {
      // --- OAuth TTL: a token outlived by the job stops authorizing;
      // OauthSession re-runs the grant transparently (the TTL is whole
      // seconds: expires_in is an RFC-6749 seconds field)
      val oauth = new OauthSession(srv.uri, "svc", "pw", refreshSkewMs = 150L)
      val t0 = oauth.token()
      assert(oauth.token() eq t0, "inside the TTL the session reuses its token")
      assert(get(s"${srv.uri}/v1/config", Some(t0)).statusCode() == 200)
      Thread.sleep(2300)
      assert(get(s"${srv.uri}/v1/config", Some(t0)).statusCode() == 401,
        "an expired token must stop authorizing")
      val t1 = oauth.token()
      assert(t1 != t0, "the session must have re-authed")
      assert(get(s"${srv.uri}/v1/config", Some(t1)).statusCode() == 200)

      // --- expiring vends: every load carries a fresh session token +
      // expiry stamp; distinct loads are distinct vends
      def loadCfg(): Map[String, String] = {
        val ltr = JsonMethods.parse(get(
          s"${srv.uri}/v1/p/namespaces/wh/tables/t", Some(oauth.token())).body())
        (ltr \ "config").asInstanceOf[JObject].obj
          .collect { case (k, JString(v)) => k -> v }.toMap
      }
      val c1 = loadCfg(); val c2 = loadCfg()
      assert(c1("s3.access-key-id") == "vended-ak")
      val tok1 = c1("s3.session-token"); val tok2 = c2("s3.session-token")
      assert(tok1 != tok2, "each vend mints its own session token")
      val stamp = c1("s3.session-token-expires-at-ms").toLong
      assert(stamp > System.currentTimeMillis() &&
        stamp <= System.currentTimeMillis() + 700L)
      assert(srv.validSessionToken(tok1) && srv.validSessionToken(tok2))

      // --- the credentials endpoint is a fresh vend too, and 404s right
      val viaEndpoint = IcebergRestImport.fetchCredentials(
        srv.uri, Seq("wh"), "t", Some(oauth.token()), Some("p"))
      assert(viaEndpoint("s3.access-key-id") == "vended-ak")
      assert(viaEndpoint.contains("s3.session-token"))
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/nope/credentials",
        Some(oauth.token())).statusCode() == 404)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/t/credentials")
        .statusCode() == 401, "the credentials endpoint is auth-gated")

      // --- natural expiry: past the stamp the token stops validating
      Thread.sleep(800)
      assert(!srv.validSessionToken(tok1), "past its stamp a vend is dead")

      // --- CredentialSession refreshes on the stamp without being told
      val sess = new CredentialSession(srv.uri, Seq("wh"), "t",
        () => Some(oauth.token()), Some("p"), refreshSkewMs = 100L)
      val v1 = sess.config()("s3.session-token")
      assert(sess.config()("s3.session-token") == v1, "cached inside the TTL")
      Thread.sleep(800)
      val v2 = sess.config()("s3.session-token")
      assert(v2 != v1, "past the stamp the session re-vends")
      assert(srv.validSessionToken(v2) && !srv.validSessionToken(v1))

      // --- forced rotation kills EVERY outstanding vend at once
      val v3 = sess.config()("s3.session-token")
      srv.rotateCredentials()
      assert(!srv.validSessionToken(v3))
      sess.invalidate()
      assert(srv.validSessionToken(sess.config()("s3.session-token")))
    } finally srv.stop()
  }

  test("mocks3 E2E: a long job survives token expiry AND forced credential rotation") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[graft.testkit.MockS3FileSystem].getName)
    hc.set("fs.AbstractFileSystem.mocks3.impl",
      classOf[graft.testkit.MockS3Afs].getName)
    val s3srv = new RestCatalog.Server(
      "mocks3://" + Files.createTempDirectory("rest-rot-s3").toString)
    val cat = new RestCatalog.Client(s3srv.uri)
    IceWrite.create(spark, cat, "t", (1L to 40L).map(i => (i, s"n$i")).toDF("id", "v"))
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p",
      oauthClients = Map("job" -> "pw"),
      storageCredentials = Map(
        "fs.mocks3.impl" -> classOf[graft.testkit.MockS3FileSystem].getName),
      // a LONG vend TTL isolates the forced-rotation path: the session
      // never refreshes on the stamp mid-test, so recovery below is
      // attributable to withRefresh alone (stamp-driven refresh is the
      // expiry-matrix test's subject)
      credentialTtlMs = 60000L, tokenTtlMs = 2000L)
    val gate = graft.testkit.MockS3CredentialGate
    try {
      val oauth = new OauthSession(srv.uri, "job", "pw", refreshSkewMs = 200L)
      val sess = new CredentialSession(srv.uri, Seq("wh"), "t",
        () => Some(oauth.token()), Some("p"), refreshSkewMs = 300L)
      val dst = freshCatalog()
      IcebergRestImport.importTable(dst, "t", srv.uri, Seq("wh"), "t",
        authToken = Some(oauth.token()), prefix = Some("p"))

      // from here the store honors ONLY this server's live vends, and the
      // job's storage client presents whatever the session currently holds
      gate.scope = s3srv.warehouse.stripPrefix("mocks3://")
      gate.validator = Some(srv.validSessionToken)
      gate.presented = () => sess.config().getOrElse("s3.session-token", "")

      // count() answers from manifest metadata without touching storage
      // (the metadata-aggregate optimization), so the job's reads SUM a
      // column — every probe below genuinely opens parquet on mocks3
      def readSum(): Long =
        sess.withRefresh(_ => IceRead.table(spark, dst, "t")
          .agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0))
      assert(readSum() == 820L) // 1+...+40

      // PHASE 1 — outlive the OAuth token: the next catalog round trip
      // must re-auth (an expired raw token is refused, the session's is not)
      val stale = oauth.token()
      Thread.sleep(2300)
      assert(get(s"${srv.uri}/v1/p/namespaces/wh/tables/t",
        Some(stale)).statusCode() == 401)
      assert(IcebergRestImport.refreshTable(dst, "t",
        authToken = Some(oauth.token())).refreshed == false)
      assert(readSum() == 820L)

      // PHASE 2 — append mid-job (writes present credentials too), then
      // FORCE a rotation: the held vend dies before its stamp
      IceWrite.append(spark, cat, "t", (41L to 50L).map(i => (i, s"n$i")).toDF("id", "v"))
      srv.rotateCredentials()
      val denied = intercept[Exception](IceRead.table(spark, dst, "t")
        .agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0))
      assert(CredentialSession.looksLikeAccessDenial(denied),
        s"rotation must surface as an access denial, got: ${denied.getMessage}")
      // ...and the SAME work through the session recovers by re-vending:
      // the refresh needs a server-side metadata EXPORT (a gated mocks3
      // write under the job's presented credential), so the whole
      // refresh-then-read runs under withRefresh
      val recovered = sess.withRefresh { _ =>
        IcebergRestImport.refreshTable(dst, "t",
          authToken = Some(oauth.token()))
        IceRead.table(spark, dst, "t")
          .agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      }
      assert(recovered == 1275L) // 1+...+50

      // PHASE 3 — steady state after all the turbulence
      IceWrite.append(spark, cat, "t", (51L to 55L).map(i => (i, s"n$i")).toDF("id", "v"))
      assert(IcebergRestImport.refreshTable(dst, "t",
        authToken = Some(oauth.token())).refreshed)
      assert(readSum() == 1540L) // 1+...+55
    } finally {
      gate.reset()
      srv.stop(); s3srv.stop()
    }
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
