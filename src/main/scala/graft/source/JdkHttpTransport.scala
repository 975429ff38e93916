package graft.source

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse => JHttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import scala.jdk.CollectionConverters._

/** The default raw transport: `java.net.http.HttpClient` (in the JDK
  * since 11 — zero new dependencies), shaped to the
  * `(url, params, headers) => HttpResponse` seam [[AuthedTransport]]
  * wraps. This is what makes the live binding work out of the box
  * (reference script.py:32-36 constructs its client the same way);
  * specs keep injecting canned fakes, and `Dsv2SourceSpec` exercises
  * THIS transport end-to-end against a loopback `HttpServer`.
  *
  * Notes:
  *  - params are query-encoded with URLEncoder (UTF-8) and appended,
  *    preserving any query already present in `url`;
  *  - response header names are LOWERCASED before the map is built:
  *    HTTP/2 delivers them lowercase and HTTP/1.1 mixed-case, and
  *    [[AuthedTransport]]'s `Retry-After` handling must see one
  *    spelling (lookups there are lowercase-normalized too);
  *  - one shared client per JVM: connection pooling is the point of
  *    the class, and the driver-side fetch loop is sequential anyway.
  */
object JdkHttpTransport
    extends ((String, Map[String, String], Map[String, String]) => HttpResponse) {

  /** Per-request timeout — generous because the listing endpoint is
    * paginated (small responses) but rate-limited (long tail).
    */
  val RequestTimeout: Duration = Duration.ofSeconds(30)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(RequestTimeout)
    .build()

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  private[graft] def withQuery(url: String,
      params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val sep = if (url.contains("?")) "&" else "?"
      // sorted for a deterministic wire shape (spec-pinnable URLs)
      url + sep + params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    }

  override def apply(url: String, params: Map[String, String],
      headers: Map[String, String]): HttpResponse =
    send(HttpRequest.newBuilder(URI.create(withQuery(url, params)))
      .timeout(RequestTimeout)
      .GET(), headers)

  /** Form-encoded POST — the access-token endpoint's wire shape
    * ([[OAuthTransport]] is the only caller; the listing API is
    * GET-only).
    */
  def post(url: String, form: Map[String, String],
      headers: Map[String, String]): HttpResponse = {
    val body = form.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    send(HttpRequest.newBuilder(URI.create(url))
      .timeout(RequestTimeout)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)), headers)
  }

  private def send(builder: HttpRequest.Builder,
      headers: Map[String, String]): HttpResponse = {
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = client.send(builder.build(),
      JHttpResponse.BodyHandlers.ofString(UTF_8))
    val hdrs = resp.headers().map().asScala.iterator.collect {
      case (name, values) if !values.isEmpty =>
        name.toLowerCase(java.util.Locale.ROOT) -> values.get(0)
    }.toMap
    HttpResponse(resp.statusCode(), resp.body(), hdrs)
  }
}
