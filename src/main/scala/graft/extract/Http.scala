package graft.extract

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse => JdkResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Minimal HTTP plumbing for the driver-side connector layer
  * (/root/reference/src/extractors/base_client.py). All of this is plain
  * Scala — no Spark primitive exists (or should) for rate limiting or
  * response caching; Spark enters only at the JSON→DataFrame parse.
  */
final case class HttpResponse(
    status: Int,
    headers: Map[String, String],
    body: String) {
  def header(name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
}

/** Pluggable transport: production uses [[JdkHttpTransport]]; tests
  * script canned responses (mirrors the reference's mock of
  * `session.get`, tests/test_base_client.py:87-138).
  * Connection-level failures surface as `java.io.IOException`.
  */
trait HttpTransport {
  def get(url: String, params: Map[String, String]): HttpResponse

  /** JSON POST (the USASpending example source,
    * validate_federal_awards.py:94). Optional — scripted test
    * transports that never POST keep the default.
    */
  def post(url: String, jsonBody: String): HttpResponse =
    throw new UnsupportedOperationException(s"POST not supported: $url")
}

/** java.net.http transport with the reference's 30 s timeout and headers
  * (base_client.py:79-82,193).
  */
final class JdkHttpTransport(userAgent: String) extends HttpTransport {
  private val client = HttpClient.newBuilder()
    // follow redirects like the reference's requests session (the JDK
    // default is Redirect.NEVER, which would cache 3xx stub bodies)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30)).build()

  def get(url: String, params: Map[String, String]): HttpResponse = {
    val qs = params.map { case (k, v) =>
      URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
        URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")
    val full = if (qs.isEmpty) url else s"$url?$qs"
    val req = HttpRequest.newBuilder(java.net.URI.create(full))
      .timeout(Duration.ofSeconds(30))
      .header("User-Agent", userAgent)
      .header("Accept", "application/json")
      .GET().build()
    val resp = client.send(req, JdkResponse.BodyHandlers.ofString())
    toResponse(resp)
  }

  override def post(url: String, jsonBody: String): HttpResponse = {
    val req = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(Duration.ofSeconds(30))
      .header("User-Agent", userAgent)
      .header("Accept", "application/json")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(jsonBody))
      .build()
    toResponse(client.send(req, JdkResponse.BodyHandlers.ofString()))
  }

  private def toResponse(resp: JdkResponse[String]): HttpResponse = {
    val hs = resp.headers().map().asScala.toMap.collect {
      case (k, vs) if !vs.isEmpty => k -> vs.get(0)
    }
    HttpResponse(resp.statusCode(), hs, resp.body())
  }
}

/** Thread-safe token bucket: `ratePerMinute`/60 tokens refilled per
  * second, callers block until a whole token is available
  * (base_client.py:88-93,109-126). Clock and sleeper are injectable so
  * tests run without wall-clock time.
  */
final class TokenBucket(
    ratePerMinute: Int,
    nanoClock: () => Long = () => System.nanoTime(),
    sleepMillis: Long => Unit = Thread.sleep) {

  private val maxTokens = ratePerMinute.toDouble
  private val refillPerSec = ratePerMinute / 60.0
  private var tokens = maxTokens
  private var lastRefill = nanoClock()

  def acquire(): Unit = {
    while (!tryAcquire()) sleepMillis(50)
  }

  private def tryAcquire(): Boolean = synchronized {
    val now = nanoClock()
    val elapsedSec = (now - lastRefill) / 1e9
    tokens = math.min(maxTokens, tokens + elapsedSec * refillPerSec)
    lastRefill = now
    if (tokens >= 1.0) { tokens -= 1.0; true } else false
  }

  /** Visible for tests. */
  def available: Double = synchronized(tokens)
}

/** In-memory response cache with lazy TTL expiry, MD5-keyed on
  * url + canonically-sorted params (base_client.py:95-96,130-149).
  */
final class TtlCache[V](
    ttlSeconds: Int,
    millisClock: () => Long = () => System.currentTimeMillis()) {

  private val store = TrieMap.empty[String, (V, Long)]

  def get(key: String): Option[V] = store.get(key) match {
    case Some((v, expiry)) =>
      if (millisClock() > expiry) { store.remove(key); None } else Some(v)
    case None => None
  }

  def put(key: String, value: V): Unit =
    store.put(key, (value, millisClock() + ttlSeconds * 1000L))

  def size: Int = store.size
}

object TtlCache {
  /** Deterministic key: md5 of url + "|" + params rendered as a sorted
    * JSON object (base_client.py:130-134 `json.dumps(sort_keys=True)`).
    * Keys/values are JSON-escaped so the encoding is injective — two
    * different param maps can never render to the same string (a quote
    * or backslash in a value would otherwise let crafted params collide
    * on one cache key).
    */
  def cacheKey(url: String, params: Map[String, String]): String = {
    val normalized = params.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ": " + jsonStr(v) }
      .mkString("{", ", ", "}")
    md5Hex(url + "|" + normalized)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
