package graft.extract

import graft.core.ExtractionResult
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/tests/test_base_client.py:87-181 (retry
  * triage + telemetry) against a scripted transport.
  */
object BaseClientSpec {
  /** Plays back a fixed sequence of responses/failures. */
  final class ScriptedTransport(script: Seq[() => HttpResponse])
    extends HttpTransport {
    var calls: Int = 0
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    def get(url: String, params: Map[String, String]): HttpResponse = {
      seen += ((url, params))
      val r = script(math.min(calls, script.size - 1))
      calls += 1
      r()
    }
  }

  def ok(body: String) = () => HttpResponse(200, Map.empty, body)
  def status(code: Int, headers: Map[String, String] = Map.empty) =
    () => HttpResponse(code, headers, "")
  def connFail = () => throw new java.io.IOException("connection refused")

  final class TestClient(
      val transport: ScriptedTransport,
      sleeps: scala.collection.mutable.ArrayBuffer[Long])
    extends BaseClient(
      transport = transport,
      sleepMillis = sleeps += _,
      jitter = () => 0.5) {
    def sourceName = "test"
    def baseUrl = "http://api.test"
    def rateLimit = 6000 // effectively unlimited for tests
    def extract(params: Map[String, Any]): ExtractionResult =
      throw new UnsupportedOperationException
  }

  def client(script: Seq[() => HttpResponse])
    : (TestClient, ScriptedTransport, scala.collection.mutable.ArrayBuffer[Long]) = {
    val t = new ScriptedTransport(script)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    (new TestClient(t, sleeps), t, sleeps)
  }
}

class BaseClientSpec extends AnyFunSuite {
  import BaseClientSpec._

  test("success returns body and counts one api call") {
    val (c, t, _) = client(Seq(ok("""{"a":1}""")))
    assert(c.getJson("/x") == """{"a":1}""")
    assert(c.apiCalls == 1 && t.calls == 1)
  }

  test("5xx retries with exponential backoff then succeeds") {
    val (c, t, sleeps) = client(Seq(status(500), status(503), ok("fine")))
    assert(c.getJson("/x") == "fine")
    assert(t.calls == 3)
    // backoff = (2^attempt + 0.5) * 1000 ms
    assert(sleeps.toSeq == Seq(1500L, 2500L))
  }

  test("5xx exhausts retries and raises the last error") {
    val (c, t, _) = client(Seq(status(500)))
    val e = intercept[c.HttpStatusException](c.getJson("/x"))
    assert(e.status == 500)
    assert(t.calls == 4) // maxRetries=3 → 4 attempts
    assert(c.errorCount == 1)
  }

  test("4xx raises immediately without retry") {
    val (c, t, _) = client(Seq(status(404)))
    val e = intercept[c.HttpStatusException](c.getJson("/x"))
    assert(e.status == 404)
    assert(t.calls == 1)
    assert(c.errorCount == 1)
  }

  test("429 honors Retry-After then retries") {
    val (c, t, sleeps) = client(Seq(
      status(429, Map("Retry-After" -> "7")), ok("done")))
    assert(c.getJson("/x") == "done")
    assert(t.calls == 2)
    assert(sleeps.head == 7000L)
  }

  test("429 without Retry-After defaults to 5s") {
    val (c, _, sleeps) = client(Seq(status(429), ok("done")))
    c.getJson("/x")
    assert(sleeps.head == 5000L)
  }

  test("connection errors retry with backoff") {
    val (c, t, _) = client(Seq(connFail, ok("recovered")))
    assert(c.getJson("/x") == "recovered")
    assert(t.calls == 2)
    assert(c.errorCount == 1)
  }

  test("connection errors exhaust retries and raise") {
    val (c, t, _) = client(Seq(connFail))
    intercept[java.io.IOException](c.getJson("/x"))
    assert(t.calls == 4)
  }

  test("second identical request is served from cache") {
    val (c, t, _) = client(Seq(ok("cached")))
    c.getJson("/x", Map("p" -> "1"))
    assert(c.getJson("/x", Map("p" -> "1")) == "cached")
    assert(t.calls == 1)
    assert(c.cacheHits == 1 && c.apiCalls == 1)
  }

  test("use_cache=false always hits the network") {
    val (c, t, _) = client(Seq(ok("a"), ok("b")))
    assert(c.getJson("/x", useCache = false) == "a")
    assert(c.getJson("/x", useCache = false) == "b")
    assert(t.calls == 2)
  }

  test("different params miss the cache") {
    val (c, t, _) = client(Seq(ok("a"), ok("b")))
    c.getJson("/x", Map("p" -> "1"))
    c.getJson("/x", Map("p" -> "2"))
    assert(t.calls == 2 && c.cacheHits == 0)
  }

  test("telemetry reports calls, hits, errors, latency") {
    val (c, _, _) = client(Seq(ok("x")))
    c.getJson("/x")
    c.getJson("/x")
    val t = c.telemetry
    assert(t("source") == "test")
    assert(t("api_calls") == 1)
    assert(t("cache_hits") == 1)
    assert(t("errors") == 0)
    assert(t("avg_latency").asInstanceOf[Double] >= 0.0)
    c.resetTelemetry()
    assert(c.telemetry("api_calls") == 0)
  }

  test("absolute URLs bypass baseUrl prefixing") {
    val (c, t, _) = client(Seq(ok("x")))
    c.getJson("http://other.host/y")
    assert(t.seen.head._1 == "http://other.host/y")
  }
}
