package graft.source

/** Live-API configuration: the credential/options seam a user needs on
  * day one to point the connector at the real service (the reference
  * loads the same three credentials from .env — script.py:331-333 —
  * and rate-steps its fetch loop — script.py:150,317).
  *
  * Resolution order per field: DSv2 option (`client_id`,
  * `client_secret`, `user_agent`) → environment variable
  * (`REDDIT_CLIENT_ID`, `REDDIT_CLIENT_SECRET`, `REDDIT_USER_AGENT`)
  * → default (user_agent only; the two credentials have no default —
  * both absent ⇒ no live config, the offline dump binding). The env
  * reader is injected so specs never depend on ambient machine state.
  */
final case class LiveConfig(
    clientId: String,
    clientSecret: String,
    userAgent: String,
    maxRetries: Int,
    baseBackoffMs: Long,
    maxBackoffMs: Long,
    authMode: String = "basic",
    tokenUrl: String = LiveConfig.DefaultTokenUrl)

object LiveConfig {

  val DefaultUserAgent = "graft/0.1"

  /** The public OAuth2 access-token endpoint (overridable per-options
    * for specs and proxies). The reference's PRAW client performs this
    * token dance internally (script.py:32-36).
    */
  val DefaultTokenUrl = "https://www.reddit.com/api/v1/access_token"

  def fromOptions(opts: Map[String, String],
      env: String => Option[String] = k => sys.env.get(k)): Option[LiveConfig] = {
    def resolve(opt: String, envKey: String): Option[String] =
      opts.get(opt).orElse(env(envKey))
    val auth = opts.getOrElse("auth", "basic")
    require(auth == "basic" || auth == "oauth",
      s"auth must be 'basic' or 'oauth', got '$auth'")
    for {
      id <- resolve("client_id", "REDDIT_CLIENT_ID")
      secret <- resolve("client_secret", "REDDIT_CLIENT_SECRET")
    } yield LiveConfig(
      clientId = id,
      clientSecret = secret,
      userAgent = resolve("user_agent", "REDDIT_USER_AGENT")
        .getOrElse(DefaultUserAgent),
      maxRetries = opts.getOrElse("max_retries", "5").toInt,
      baseBackoffMs = opts.getOrElse("backoff_ms", "1000").toLong,
      maxBackoffMs = opts.getOrElse("max_backoff_ms", "60000").toLong,
      authMode = auth,
      tokenUrl = opts.getOrElse("token_url", DefaultTokenUrl))
  }
}

/** Minimal HTTP response shape for the raw transport seam. */
final case class HttpResponse(status: Int, body: String,
    headers: Map[String, String] = Map.empty)

/** Authenticating, retrying transport adapter: wraps a raw
  * header-aware transport `(url, params, headers) → HttpResponse`
  * into the `(url, params) → body` function [[HttpApiSource]]
  * consumes — so auth and retry policy are one composable layer, not
  * source-code changes.
  *
  * Documented policy (the day-one contract):
  *  - every request carries `Authorization: Basic base64(id:secret)`
  *    and `User-Agent` from [[LiveConfig]];
  *  - retry ONLY on 429/500/502/503/504, up to `maxRetries` times;
  *  - back off `min(maxBackoffMs, baseBackoffMs·2^attempt)` between
  *    tries, but a server `Retry-After: <seconds>` header wins when
  *    present (the polite-client rule the public API documents);
  *  - any other non-200 (401/403/404…) fails fast — retrying a bad
  *    credential only burns the rate budget.
  *
  * The sleeper is injected so the spec asserts the exact backoff
  * schedule without waiting on a clock. The raw transport defaults to
  * [[JdkHttpTransport]] in [[HttpApiSource.live]] (the JDK's own
  * `java.net.http.HttpClient` — no dependency needed); specs inject
  * canned-response fakes, and `Dsv2SourceSpec` also exercises the
  * real transport against a loopback server. `Retry-After` is looked
  * up case-insensitively: HTTP/2 lowercases header names.
  */
final class AuthedTransport(
    raw: (String, Map[String, String], Map[String, String]) => HttpResponse,
    cfg: LiveConfig,
    sleep: Long => Unit = Thread.sleep)
  extends ((String, Map[String, String]) => String) {

  private val Retryable = Set(429, 500, 502, 503, 504)

  private[source] def authHeaders: Map[String, String] = Map(
    "Authorization" -> ("Basic " + java.util.Base64.getEncoder.encodeToString(
      s"${cfg.clientId}:${cfg.clientSecret}".getBytes("UTF-8"))),
    "User-Agent" -> cfg.userAgent)

  override def apply(url: String, params: Map[String, String]): String = {
    var attempt = 0
    while (true) {
      val resp = raw(url, params, authHeaders)
      if (resp.status == 200) return resp.body
      if (!Retryable(resp.status) || attempt >= cfg.maxRetries)
        throw new java.io.IOException(
          s"HTTP ${resp.status} for $url (attempt ${attempt + 1})")
      val retryAfterMs = resp.headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Retry-After") => v
      }.flatMap(_.toLongOption).map(_ * 1000L)
      sleep(retryAfterMs.getOrElse(
        math.min(cfg.maxBackoffMs, cfg.baseBackoffMs << attempt)))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
