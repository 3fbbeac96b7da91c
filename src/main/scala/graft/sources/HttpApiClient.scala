package graft.sources

/** Live HTTP transport behind the [[PagedSource.fetchAll]] seam —
  * the reference's WooCommerce client semantics
  * (`src/etl/extract/wc_client.py:10-49`) on `java.net.http`:
  *
  *   - credentials are REQUIRED at construction (wc_client raises
  *     "Woo credentials missing" when env vars are absent, :15-16);
  *   - auth rides the QUERY STRING (`consumer_key`/`consumer_secret`
  *     params — wc_client's `query_string_auth=True`, chosen there
  *     because WAF'd hosts block Basic Auth, :19-28);
  *   - one fixed request timeout (the reference's `timeout=60`);
  *   - status >= 400 raises with status + body (S2, :31-33) as a typed
  *     [[HttpStatusException]] so retry policies can classify it.
  *
  * The class closes ONLY the transport seam: page iteration composes
  * through [[PagedSource.fetchAll]] (short-page stop, per-page retry)
  * exactly as with the parquet fixture client, and the decoded pages
  * hand to Spark under an EXPLICIT schema
  * (`spark.read.schema(...).json(ds)`) — never inference, the engine's
  * standing DDL rule. At cluster scale the same client runs inside the
  * DSv2 partition readers (one page-range per task,
  * [[graft.sources.v2.PagedOrdersProvider]]); nothing here is
  * driver-bound.
  */
final class HttpApiClient(
    baseUrl: String, consumerKey: String, consumerSecret: String,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(60)) {
  require(baseUrl.trim.nonEmpty && consumerKey.nonEmpty && consumerSecret.nonEmpty,
    "Woo credentials missing: set base URL, consumer key, consumer secret")
  private val base = baseUrl.trim.stripSuffix("/") + "/"
  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout).build()

  /** GET `path` with query params + query-string auth; >= 400 raises. */
  def get(path: String, params: Map[String, String] = Map.empty): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val q = (params.toSeq.sortBy(_._1) ++ Seq(
      "consumer_key" -> consumerKey, "consumer_secret" -> consumerSecret))
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val uri = java.net.URI.create(base + path.stripPrefix("/") + "?" + q)
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(timeout).GET().build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400) throw new HttpStatusException(
      resp.statusCode(),
      s"GET $path failed ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  /** One page, as the reference's paged loop frames it (`page` /
    * `per_page` query params, wc_client.py:41-44): the response's
    * top-level JSON array split into per-item object strings — the
    * `Seq[T]` shape [[PagedSource.fetchAll]]'s short-page stop counts,
    * ready for a schema-explicit Spark JSON decode. */
  def getPage(path: String, page: Int, perPage: Int,
      params: Map[String, String] = Map.empty): Seq[String] =
    HttpApiClient.splitJsonArray(get(path,
      params + ("page" -> page.toString, "per_page" -> perPage.toString)))
}

/** Typed >= 400 failure — carries the status so retry policies can
  * classify transient (5xx) from permanent (4xx). */
final class HttpStatusException(val status: Int, msg: String)
  extends RuntimeException(msg)

object HttpApiClient {

  /** Retry classifier for HTTP fetches: 5xx, transport failures
    * (connect/read timeouts), and the two RETRYABLE 4xx statuses — 429
    * Too Many Requests and 408 Request Timeout, the canonical
    * rate-limit/timeout answers a long paged scan WILL hit, where the
    * fixed backoff is exactly the right response. Every other 4xx
    * propagates immediately — a 401 never heals and re-hammering an
    * auth-rejecting API is hostile.
    * Compose as `RetryPolicy(retryOn = HttpApiClient.transientOnly)`. */
  val transientOnly: Throwable => Boolean = {
    case h: HttpStatusException =>
      h.status >= 500 || h.status == 429 || h.status == 408
    case _ => true
  }

  /** Split a top-level JSON array into its element strings with one
    * structural scan (brace depth + string/escape state) — no JSON
    * library in the engine, same zero-dependency rule as the manifest
    * codec. Elements are returned verbatim (objects, arrays, or
    * scalars), trimmed. */
  def splitJsonArray(body: String): Seq[String] = {
    val s = body.trim
    require(s.startsWith("[") && s.endsWith("]"),
      s"expected a top-level JSON array, got: ${s.take(40)}")
    val inner = s.substring(1, s.length - 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = 0
    var i = 0
    // a completed top-level value may only be followed by ',' or the end:
    // without this, a proxy-mangled body like [{"a":1}{"a":2}] (missing
    // comma) balanced out and returned ONE non-JSON mega-element that the
    // downstream PERMISSIVE json reader turned into a silent corrupt row
    var closedV = false
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (esc) esc = false
      else if (inStr) {
        if (c == '\\') esc = true
        else if (c == '"') {
          inStr = false
          if (depth == 0) closedV = true
        }
      } else if (closedV && !c.isWhitespace && c != ',') {
        throw new IllegalArgumentException(
          "malformed JSON array: expected ',' or end after a top-level " +
            s"element, got '$c' at offset $i")
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) closedV = true
        case ',' if depth == 0 =>
          val e = inner.substring(start, i).trim
          if (e.nonEmpty) out += e
          start = i + 1
          closedV = false
        case _ => ()
      }
      i += 1
    }
    require(depth == 0 && !inStr,
      "malformed JSON array: unbalanced structure at end of body")
    val last = inner.substring(start).trim
    if (last.nonEmpty) out += last
    out.toSeq
  }
}
