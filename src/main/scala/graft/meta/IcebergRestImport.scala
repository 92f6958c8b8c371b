package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Attach tables from a spec-compliant **Iceberg REST catalog** (the
  * public Iceberg REST OpenAPI — the catalog type the reference consumes
  * through iceberg-rs, and what Nessie/Polaris/Unity/Gravitino serve).
  * One `GET /v1/{prefix}/namespaces/{ns}/tables/{t}` returns a
  * LoadTableResult whose `metadata` field IS the table-metadata JSON, so
  * the whole import reuses [[IcebergImport]] — data files stay in place,
  * attaching costs one HTTP round trip plus one metadata read per
  * manifest, regardless of table size.
  *
  * This is a READ-side attach (import once, then graft owns its copy),
  * not a live two-way catalog binding: the source of truth for commits
  * stays whichever engine talks to the REST service. Namespace levels
  * join with the spec's `%1F` unit separator; `authToken` rides as an
  * OAuth bearer header. The optional `GET /v1/config` handshake resolves
  * a server-assigned prefix, as the spec requires of clients. */
object IcebergRestImport {

  private val http = HttpClient.newHttpClient()

  private def get(uri: String, authToken: Option[String]): String = {
    val b = HttpRequest.newBuilder(URI.create(uri)).GET()
      .header("Accept", "application/json")
    authToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"Iceberg REST GET $uri failed: HTTP ${resp.statusCode()} ${resp.body().take(300)}")
    resp.body()
  }

  /** The server-assigned route prefix from `GET /v1/config` ("" when the
    * server declares none or does not serve the endpoint). */
  def resolvePrefix(uri: String, authToken: Option[String] = None): String =
    try {
      JsonMethods.parse(get(s"${uri.stripSuffix("/")}/v1/config", authToken)) \
          "overrides" \ "prefix" match {
        case JString(p) => p.stripPrefix("/").stripSuffix("/")
        case _ => ""
      }
    } catch { case _: Exception => "" } // config endpoint optional in practice

  /** Fetches LoadTableResult for `namespace.table` and registers it into
    * `catalog` as `name` via [[IcebergImport.importIcebergMetadataJson]].
    * `namespace` levels (e.g. Seq("prod","events")) join with the spec's
    * unit separator. Everything the file-based import supports (spec
    * evolution, deletes, zone-map bounds, NDV statistics) applies. */
  def importTable(catalog: Catalog, name: String, uri: String,
      namespace: Seq[String], table: String,
      authToken: Option[String] = None,
      /** pass a known prefix to skip the config handshake; None resolves
        * via `GET /v1/config`. */
      prefix: Option[String] = None): TableMetadata = {
    require(namespace.nonEmpty, "importTable: empty namespace")
    val base = uri.stripSuffix("/")
    val pfx = prefix.getOrElse(resolvePrefix(uri, authToken)) match {
      case "" => ""
      case p => s"/$p"
    }
    // multipart namespaces join with the spec's 0x1F unit separator
    // (percent-encodes to %1F); URLEncoder form-encodes spaces as '+',
    // which URL paths must not carry
    def enc(s: String) = java.net.URLEncoder.encode(
      s, java.nio.charset.StandardCharsets.UTF_8).replace("+", "%20")
    val ns = enc(namespace.mkString("\u001f"))
    val t = enc(table)
    val body = JsonMethods.parse(get(s"$base/v1$pfx/namespaces/$ns/tables/$t", authToken))
    val metadata = body \ "metadata" match {
      case JNothing | JNull =>
        // spec allows metadata-location-only responses; fall back to
        // reading the metadata file directly (reachable warehouses only)
        body \ "metadata-location" match {
          case JString(loc) => JsonMethods.parse(MetaIO.readString(loc))
          case _ => sys.error(
            s"LoadTableResult for $table carries neither metadata nor metadata-location")
        }
      case m => m
    }
    IcebergImport.importIcebergMetadataJson(catalog, name, metadata)
  }
}
