package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/tests/test_base_client.py:27-84 (rate
  * limiter + cache), without wall-clock time.
  */
class HttpSpec extends AnyFunSuite {

  test("token bucket starts full and consumes without blocking") {
    var slept = 0
    val clock = () => 0L
    val b = new TokenBucket(60, clock, _ => slept += 1)
    (1 to 60).foreach(_ => b.acquire())
    assert(slept == 0)
    assert(b.available < 1.0)
  }

  test("token bucket blocks when empty and refills over time") {
    var now = 0L
    var sleeps = 0
    val b = new TokenBucket(60, () => now, _ => { sleeps += 1; now += 1000000000L })
    (1 to 60).foreach(_ => b.acquire()) // drain
    b.acquire() // needs a refill: 60/min = 1 token per simulated second
    assert(sleeps >= 1)
  }

  test("token bucket never exceeds max capacity") {
    var now = 0L
    val b = new TokenBucket(60, () => now, _ => ())
    now = 3600L * 1000000000L // an hour later
    b.acquire()
    assert(b.available <= 60.0)
  }

  test("cache stores and returns values before expiry") {
    var now = 0L
    val c = new TtlCache[String](300, () => now)
    c.put("k", "v")
    assert(c.get("k").contains("v"))
    now = 299 * 1000L
    assert(c.get("k").contains("v"))
  }

  test("cache expires entries lazily after TTL") {
    var now = 0L
    val c = new TtlCache[String](300, () => now)
    c.put("k", "v")
    now = 301 * 1000L
    assert(c.get("k").isEmpty)
    assert(c.size == 0) // expired entry removed on read
  }

  test("cache keys are deterministic and param-order independent") {
    val a = TtlCache.cacheKey("http://x/q", Map("b" -> "2", "a" -> "1"))
    val b = TtlCache.cacheKey("http://x/q", Map("a" -> "1", "b" -> "2"))
    assert(a == b)
    assert(a.length == 32)
    val c = TtlCache.cacheKey("http://x/q", Map("a" -> "1", "b" -> "3"))
    assert(a != c)
  }

  test("cache keys escape quotes/backslashes — crafted params cannot " +
      "collide (ADVICE r02)") {
    // without escaping, both maps render to the same pseudo-JSON string
    val a = TtlCache.cacheKey("http://x/q", Map("a" -> "1\", \"b\": \"2"))
    val b = TtlCache.cacheKey("http://x/q", Map("a" -> "1", "b" -> "2"))
    assert(a != b)
    val c = TtlCache.cacheKey("http://x/q", Map("a\\" -> "v"))
    val d = TtlCache.cacheKey("http://x/q", Map("a" -> "\\v"))
    assert(c != d)
  }
}
