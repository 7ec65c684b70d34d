package graft.pipeline

import graft.SparkSpec
import graft.core.ExtractionResult
import graft.extract.BaseClient
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mirrors /root/reference/tests/test_collector.py. */
object CollectorSpec {
  final class StubClient(
      name: String,
      rows: Long,
      fail: Boolean = false,
      explode: Boolean = false)
    extends BaseClient(transport = (_, _) => graft.extract.HttpResponse(200, Map.empty, "{}")) {
    def sourceName: String = name
    def baseUrl: String = "http://stub"
    def rateLimit: Int = 60
    var lastParams: Map[String, Any] = Map.empty
    def extract(params: Map[String, Any]): ExtractionResult = {
      lastParams = params
      apiCalls += 1
      if (explode) throw new RuntimeException(s"$name blew up")
      if (fail) buildError("deliberate failure", System.nanoTime())
      else ExtractionResult(name, success = true, data = None,
        rowCount = rows, durationSeconds = 0.0, apiCalls = apiCalls)
    }
  }
}

class CollectorSpec extends SparkSpec {
  import CollectorSpec._

  test("registration preserves insertion order (test_collector.py:15-28)") {
    val c = new MultiSourceCollector()
      .register(new StubClient("alpha", 1))
      .register(new StubClient("beta", 2))
    assert(c.sources == Seq("alpha", "beta"))
  }

  test("collect routes kwargs to the named source (test_collector.py:34-46)") {
    val stub = new StubClient("alpha", 5)
    val c = new MultiSourceCollector().register(stub)
    val res = c.collect("alpha", Map("max_results" -> 7))
    assert(res.success && res.rowCount == 5)
    assert(stub.lastParams("max_results") == 7)
  }

  test("collect of unknown source throws (test_collector.py:48-52)") {
    intercept[NoSuchElementException] {
      new MultiSourceCollector().collect("nope")
    }
  }

  test("collectAll isolates errors per source (test_collector.py:68-84)") {
    val c = new MultiSourceCollector()
      .register(new StubClient("good", 3))
      .register(new StubClient("bad", 0, explode = true))
      .register(new StubClient("also_good", 4))
    val out = c.collectAll()
    assert(out("good").success)
    assert(!out("bad").success)
    assert(out("bad").errors.head.contains("blew up"))
    assert(out("also_good").success) // later sources still ran
  }

  test("collectAll routes per-source params") {
    val a = new StubClient("a", 1)
    val b = new StubClient("b", 1)
    val c = new MultiSourceCollector().register(a).register(b)
    c.collectAll(Map("a" -> Map("x" -> 1)))
    assert(a.lastParams == Map("x" -> 1))
    assert(b.lastParams.isEmpty)
  }

  test("collectAllParallel isolates errors and returns all sources") {
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val c = new MultiSourceCollector()
      .register(new StubClient("good", 3))
      .register(new StubClient("bad", 0, explode = true))
      .register(new StubClient("also_good", 4))
    val out = c.collectAllParallel()
    assert(out.size == 3)
    assert(out("good").success)
    assert(!out("bad").success)
    assert(out("also_good").success)
  }

  test("telemetry aggregates across clients (test_collector.py:96-109)") {
    val a = new StubClient("a", 1)
    val b = new StubClient("b", 1)
    val c = new MultiSourceCollector().register(a).register(b)
    c.collectAll()
    val t = c.telemetry
    val totals = t("totals").asInstanceOf[Map[String, Any]]
    assert(totals("api_calls") == 2)
    assert(totals("errors") == 0)
    val per = t("per_source").asInstanceOf[Map[String, Any]]
    assert(per.keySet == Set("a", "b"))
  }

  test("mergeResults joins frames on a shared key (test_collector.py:112-125)") {
    val quakes = df(
      StructType(Seq(
        StructField("country_code", StringType),
        StructField("magnitude", DoubleType))),
      Seq(Row("US", 6.2), Row("JP", 5.1), Row("CL", 4.8)))
    val weather = df(
      StructType(Seq(
        StructField("country_code", StringType),
        StructField("temperature_max", DoubleType))),
      Seq(Row("US", 20.0), Row("JP", 18.0), Row("CL", 25.0)))
    val merged = MultiSourceCollector.mergeResults(
      quakes, weather, "country_code", "country_code")
    assert(merged.count() == 3)
    assert(merged.columns.contains("magnitude"))
    assert(merged.columns.contains("temperature_max"))
  }

  test("ExtractionResult.toDict excludes the DataFrame payload (test_collector.py:131-148)") {
    val res = ExtractionResult("s", success = true,
      data = Some(cleanDf), rowCount = 5, durationSeconds = 0.1)
    val d = res.toDict
    assert(!d.values.exists(_.isInstanceOf[org.apache.spark.sql.DataFrame]))
    assert(d("row_count") == 5L)
    assert(res.toJson.contains("\"source\": \"s\""))
  }
}
