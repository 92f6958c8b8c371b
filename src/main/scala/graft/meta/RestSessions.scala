package graft.meta

/** Client-side AUTH + CREDENTIAL lifecycle for LONG jobs against a REST
  * catalog. Both halves of the round-11 lifecycle item:
  *
  *  - [[OauthSession]] — the OAuth2 bearer token from
  *    `POST /v1/oauth/tokens` carries an `expires_in`; a job that
  *    outlives it gets 401s mid-flight. The session re-runs the
  *    client-credentials grant before expiry (skew-early) so every
  *    `token()` read is live. Callers pass `Some(session.token())` as
  *    each REST call's `authToken` instead of a static string.
  *  - [[CredentialSession]] — vended storage credentials carry
  *    `s3.session-token-expires-at-ms`; the session re-fetches from the
  *    spec's `GET .../tables/{table}/credentials` endpoint when the
  *    stamp nears, and [[CredentialSession.withRefresh]] handles the
  *    out-of-band case (server-side rotation BEFORE the stamp) by
  *    re-vending once on an access-denial and retrying.
  *
  * Thread-safe; one instance serves a whole job. */
final class OauthSession(uri: String, clientId: String, clientSecret: String,
    /** Refresh this long BEFORE expiry: a token applied at the last
      * millisecond still has network + queue time to survive. */
    refreshSkewMs: Long = 30000L) {
  @volatile private var cached: Option[(String, Long)] = None

  /** A bearer token valid for at least [[refreshSkewMs]] more ms (unless
    * the server's whole TTL is shorter — then fresh-as-possible). */
  def token(): String = {
    val now = System.currentTimeMillis()
    cached match {
      case Some((t, exp)) if exp - refreshSkewMs > now => t
      case _ => synchronized {
        val now2 = System.currentTimeMillis()
        cached match {
          case Some((t, exp)) if exp - refreshSkewMs > now2 => t
          case _ =>
            val (t, expiresInSec) =
              IcebergRestImport.fetchOauthTokenWithExpiry(uri, clientId, clientSecret)
            cached = Some((t, now2 + expiresInSec * 1000))
            t
        }
      }
    }
  }

  /** Drops the cached token (e.g. after an unexpected 401: the server
    * restarted and lost its issued-token table) — the next [[token]]
    * re-runs the grant. */
  def invalidate(): Unit = cached = None
}

/** See [[OauthSession]]. `authToken` is read per refresh so an expiring
  * OAuth session composes: `new CredentialSession(..., () => Some(oauth.token()))`. */
final class CredentialSession(uri: String, namespace: Seq[String], table: String,
    authToken: () => Option[String] = () => None,
    prefix: Option[String] = None,
    refreshSkewMs: Long = 5000L) {
  @volatile private var cached: Option[Map[String, String]] = None

  private def expiresAt(conf: Map[String, String]): Option[Long] =
    conf.get("s3.session-token-expires-at-ms").flatMap(_.toLongOption)

  /** The current storage access configuration, re-vended from the
    * credentials endpoint when the expiry stamp nears. Configurations
    * without a stamp (static vends) fetch once and never refresh. */
  def config(): Map[String, String] = {
    val now = System.currentTimeMillis()
    cached match {
      case Some(c) if expiresAt(c).forall(_ - refreshSkewMs > now) => c
      case _ => synchronized {
        val now2 = System.currentTimeMillis()
        cached match {
          case Some(c) if expiresAt(c).forall(_ - refreshSkewMs > now2) => c
          case _ =>
            val fresh = IcebergRestImport.fetchCredentials(
              uri, namespace, table, authToken(), prefix)
            cached = Some(fresh)
            fresh
        }
      }
    }
  }

  /** Drops the cached vend — the next [[config]] re-fetches. */
  def invalidate(): Unit = cached = None

  /** Runs `f` under the current vend; if the storage layer denies access
    * (the server rotated credentials BEFORE the advertised stamp — the
    * stamp can only promise expiry, not survival), re-vends ONCE and
    * retries. Anything that is not an access denial propagates
    * unchanged, first time. */
  def withRefresh[T](f: Map[String, String] => T): T =
    try f(config())
    catch {
      case e: Exception if CredentialSession.looksLikeAccessDenial(e) =>
        invalidate()
        f(config())
    }
}

object CredentialSession {
  /** Storage access-denial shapes, across the cause chain AND message
    * text (Spark wraps executor-side IOExceptions into SparkException
    * with the original message embedded): Hadoop's
    * AccessControlException, NIO's AccessDeniedException (what S3A maps
    * S3 403s to), and the S3 error-code string itself. */
  private[meta] def looksLikeAccessDenial(e: Throwable): Boolean = {
    var cur: Throwable = e
    var depth = 0
    while (cur != null && depth < 10) {
      cur match {
        case _: org.apache.hadoop.security.AccessControlException => return true
        case _: java.nio.file.AccessDeniedException => return true
        case _ =>
      }
      val m = Option(cur.getMessage).getOrElse("")
      if (m.contains("AccessDenied") || m.contains("AccessControlException") ||
          m.contains("session token invalid"))
        return true
      cur = cur.getCause
      depth += 1
    }
    false
  }
}
