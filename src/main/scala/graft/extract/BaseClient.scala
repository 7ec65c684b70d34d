package graft.extract

import graft.core.ExtractionResult
import org.apache.spark.sql.DataFrame

/** Connector SPI with rate limiting, caching, retries, and telemetry —
  * the Spark re-expression of /root/reference/src/extractors/
  * base_client.py:50-305. HTTP runs on the driver; page bodies feed the
  * per-source Spark parsers (`from_json` + `explode`), so the cluster
  * does the parsing work. At true 100 TB-ingest scale the same parsers
  * are reusable from a DataSource V2 reader that fetches pages inside
  * partitions; for the reference's page-bounded APIs driver-side fetch
  * is the right shape.
  *
  * Retry semantics (base_client.py:185-245): `maxRetries + 1` attempts;
  * 429 sleeps `Retry-After` (default 5 s) and retries; other 4xx raise
  * immediately (no retry); 5xx and connection errors back off
  * `2^attempt + U(0,1)` seconds.
  */
abstract class BaseClient(
    val cacheTtlSeconds: Int = 300,
    transport: HttpTransport = null,
    sleepMillis: Long => Unit = Thread.sleep,
    jitter: () => Double = () => scala.util.Random.nextDouble()) {

  def sourceName: String
  def baseUrl: String
  def rateLimit: Int

  /** Run the extraction. `params` mirrors the reference's **kwargs —
    * concrete clients pull typed values with their own defaults.
    */
  def extract(params: Map[String, Any] = Map.empty): ExtractionResult

  // -- plumbing ------------------------------------------------------- //

  private lazy val http: HttpTransport =
    Option(transport).getOrElse(
      new JdkHttpTransport(s"graft-engine/$sourceName"))
  // lazy: rateLimit is abstract — a subclass implementing it as a val
  // is uninitialized (0) during this constructor; defer until first use
  private lazy val bucket = new TokenBucket(math.max(1, rateLimit))
  private val cache = new TtlCache[String](cacheTtlSeconds)

  // Telemetry (base_client.py:98-101,292-304). Driver-side counters.
  @volatile var apiCalls: Int = 0
  @volatile var cacheHits: Int = 0
  @volatile var errorCount: Int = 0
  private val timings = scala.collection.mutable.ArrayBuffer.empty[Double]

  def resetTelemetry(): Unit = synchronized {
    apiCalls = 0; cacheHits = 0; errorCount = 0; timings.clear()
  }

  def telemetry: Map[String, Any] = synchronized {
    Map(
      "source" -> sourceName,
      "api_calls" -> apiCalls,
      "cache_hits" -> cacheHits,
      "errors" -> errorCount,
      "avg_latency" ->
        (if (timings.isEmpty) 0.0 else timings.sum / timings.size))
  }

  final class HttpStatusException(val status: Int, url: String)
    extends RuntimeException(s"HTTP $status for $url")

  /** GET returning the raw JSON body (the Spark parsers take strings).
    * Cache → token wait → transport → status triage, exactly the
    * reference's order (base_client.py:153-245).
    */
  def getJson(
      path: String,
      params: Map[String, String] = Map.empty,
      maxRetries: Int = 3,
      useCache: Boolean = true): String = {
    val url = if (path.startsWith("/")) baseUrl + path else path
    val key = TtlCache.cacheKey(url, params)

    if (useCache) cache.get(key) match {
      case Some(body) => synchronized { cacheHits += 1 }; return body
      case None =>
    }

    var lastError: Throwable = null
    var attempt = 0
    while (attempt <= maxRetries) {
      bucket.acquire()
      synchronized { apiCalls += 1 }
      val start = System.nanoTime()
      try {
        val resp = http.get(url, params)
        synchronized { timings += (System.nanoTime() - start) / 1e9 }

        if (resp.status == 429) {
          val retryAfter = resp.header("Retry-After")
            .flatMap(_.toIntOption).getOrElse(5)
          sleepMillis(retryAfter * 1000L)
          lastError = new HttpStatusException(429, url)
        } else if (resp.status >= 400 && resp.status < 500) {
          synchronized { errorCount += 1 }
          throw new HttpStatusException(resp.status, url)
        } else if (resp.status >= 500) {
          lastError = new HttpStatusException(resp.status, url)
          backoff(attempt)
        } else {
          if (useCache) cache.put(key, resp.body)
          return resp.body
        }
      } catch {
        case e: HttpStatusException => throw e // 4xx: no retry
        case e: java.io.IOException =>
          synchronized {
            timings += (System.nanoTime() - start) / 1e9
            errorCount += 1
          }
          lastError = e
          if (attempt < maxRetries) backoff(attempt)
      }
      attempt += 1
    }
    synchronized { errorCount += 1 }
    throw lastError
  }

  private def backoff(attempt: Int): Unit =
    sleepMillis(((math.pow(2, attempt) + jitter()) * 1000).toLong)

  // -- result builders (base_client.py:249-288) ----------------------- //

  protected def buildResult(
      data: DataFrame,
      startedNanos: Long,
      metadata: Map[String, Any] = Map.empty): ExtractionResult =
    ExtractionResult(
      source = sourceName,
      success = true,
      data = Some(data),
      rowCount = data.count(),
      durationSeconds = (System.nanoTime() - startedNanos) / 1e9,
      apiCalls = apiCalls,
      cacheHits = cacheHits,
      metadata = metadata)

  protected def buildError(
      error: String, startedNanos: Long): ExtractionResult =
    ExtractionResult(
      source = sourceName,
      success = false,
      data = None,
      rowCount = 0L,
      durationSeconds = (System.nanoTime() - startedNanos) / 1e9,
      apiCalls = apiCalls,
      cacheHits = cacheHits,
      errors = Seq(error))
}
