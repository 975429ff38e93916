package graft.source

/** OAuth2 application-only (client_credentials) transport: the token
  * dance the reference's PRAW client performs internally
  * (script.py:32-36 constructs a client from client_id/client_secret/
  * user_agent only — the script grant with no user password, i.e. the
  * read-only application token).
  *
  * Flow (the day-one contract for the real API, which serves data
  * endpoints only to bearer tokens):
  *
  *  1. POST `grant_type=client_credentials` (form-encoded) to the
  *     access-token endpoint with `Authorization: Basic
  *     base64(id:secret)` — a non-200 or token-less response fails
  *     fast (retrying a bad credential burns the rate budget);
  *  2. cache the token until `expires_in` minus a [[OAuthTransport
  *     .TokenSkewSec]] safety margin (clock injected for specs);
  *  3. every API request carries `Authorization: bearer <token>` and
  *     the configured `User-Agent`;
  *  4. on 401, invalidate and re-fetch the token ONCE, then retry the
  *     request — a second 401 fails fast (the credential, not the
  *     token, is bad);
  *  5. 429/5xx retry with the same backoff policy as
  *     [[AuthedTransport]] (`Retry-After` wins when present).
  *
  * Both raw transports are injected (`rawGet` for API calls, `rawPost`
  * for the token endpoint) so specs pin the whole flow against canned
  * handlers; [[HttpApiSource.live]] binds [[JdkHttpTransport]] for
  * both when `auth=oauth` is configured.
  */
final class OAuthTransport(
    rawGet: (String, Map[String, String], Map[String, String]) => HttpResponse,
    rawPost: (String, Map[String, String], Map[String, String]) => HttpResponse,
    cfg: LiveConfig,
    sleep: Long => Unit = Thread.sleep,
    now: () => Long = System.currentTimeMillis)
  extends ((String, Map[String, String]) => String) {

  private val Retryable = Set(429, 500, 502, 503, 504)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  @volatile private var cachedToken: String = null
  @volatile private var expiresAtMs: Long = 0L

  private[source] def basicHeaders: Map[String, String] = Map(
    "Authorization" -> ("Basic " + java.util.Base64.getEncoder.encodeToString(
      s"${cfg.clientId}:${cfg.clientSecret}".getBytes("UTF-8"))),
    "User-Agent" -> cfg.userAgent)

  private[source] def invalidate(): Unit = synchronized {
    cachedToken = null
  }

  /** The current bearer token, fetching/refreshing when absent or
    * within the skew window of expiry.
    */
  private[source] def token(): String = synchronized {
    if (cachedToken == null || now() >= expiresAtMs) {
      val resp = rawPost(cfg.tokenUrl,
        Map("grant_type" -> "client_credentials"), basicHeaders)
      if (resp.status != 200)
        throw new java.io.IOException(
          s"token fetch failed: HTTP ${resp.status} from ${cfg.tokenUrl}")
      val node = mapper.readTree(resp.body)
      val tok = node.path("access_token").asText(null)
      if (tok == null || tok.isEmpty)
        throw new java.io.IOException(
          s"token response from ${cfg.tokenUrl} carries no access_token")
      val ttlSec = node.path("expires_in").asLong(3600L)
      cachedToken = tok
      expiresAtMs = now() +
        math.max(0L, ttlSec - OAuthTransport.TokenSkewSec) * 1000L
    }
    cachedToken
  }

  override def apply(url: String, params: Map[String, String]): String = {
    var attempt = 0
    var refreshed = false
    while (true) {
      val resp = rawGet(url, params, Map(
        "Authorization" -> s"bearer ${token()}",
        "User-Agent" -> cfg.userAgent))
      if (resp.status == 200) return resp.body
      if (resp.status == 401 && !refreshed) {
        invalidate() // stale/revoked token: one fresh fetch, then retry
        refreshed = true
      } else if (!Retryable(resp.status) || attempt >= cfg.maxRetries) {
        throw new java.io.IOException(
          s"HTTP ${resp.status} for $url (attempt ${attempt + 1})")
      } else {
        val retryAfterMs = resp.headers.collectFirst {
          case (k, v) if k.equalsIgnoreCase("Retry-After") => v
        }.flatMap(_.toLongOption).map(_ * 1000L)
        sleep(retryAfterMs.getOrElse(
          math.min(cfg.maxBackoffMs, cfg.baseBackoffMs << attempt)))
        attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object OAuthTransport {

  /** Seconds before nominal expiry at which the token is refreshed —
    * a request issued just under the wire must not ride a token that
    * dies in flight.
    */
  val TokenSkewSec = 60L
}
