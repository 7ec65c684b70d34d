package graft.extract

import graft.SparkSpec
import graft.extract.BaseClientSpec.{ScriptedTransport, ok}

/** Mirrors /root/reference/tests/test_clients.py against canned JSON
  * fixtures (conftest.py:14-87; FIXTURES.md §A).
  */
object ClientsSpec {
  def geoFeature(id: String, mag: Double, place: String, time: Long,
      lon: Double, lat: Double, depth: Double): String =
    s"""{"id":"$id","type":"Feature",
        "properties":{"mag":$mag,"place":"$place","time":$time,
                      "type":"earthquake","status":"reviewed"},
        "geometry":{"type":"Point","coordinates":[$lon,$lat,$depth]}}"""

  /** conftest.py:14-58 — 3 earthquakes. */
  val mockGeojson: String =
    s"""{"type":"FeatureCollection","metadata":{"generated":1700000000000,"count":3},
        "features":[
          ${geoFeature("us7000l1aa", 6.2, "100km SSW of Tokyo, Japan", 1704067200000L, 139.69, 35.68, 10.0)},
          ${geoFeature("us7000l1bb", 5.1, "near the coast of Chile", 1704070800000L, -71.62, -33.05, 25.5)},
          ${geoFeature("us7000l1cc", 4.8, "Alaska Peninsula", 1704074400000L, -158.51, 56.21, 40.2)}
        ]}"""

  val emptyGeojson =
    """{"type":"FeatureCollection","metadata":{"generated":0,"count":0},"features":[]}"""

  /** conftest.py:61-74 — 3-day parallel arrays. */
  val mockWeather: String =
    """{"latitude":40.71,"longitude":-74.01,
       "daily":{"time":["2024-01-01","2024-01-02","2024-01-03"],
                "temperature_2m_max":[5.2,6.1,4.8],
                "temperature_2m_min":[-1.0,0.5,-2.3],
                "precipitation_sum":[0.0,2.5,1.2],
                "wind_speed_10m_max":[15.3,20.1,12.7]}}"""

  /** conftest.py:77-87 — [metadata, data] envelope with 3 GDP rows. */
  val mockWorldbank: String =
    """[{"page":1,"pages":1,"per_page":100,"total":3},
       [{"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita (current US$)"},
         "country":{"id":"US","value":"United States"},
         "countryiso3code":"USA","date":"2023","value":81695.19},
        {"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita (current US$)"},
         "country":{"id":"US","value":"United States"},
         "countryiso3code":"USA","date":"2022","value":77246.67},
        {"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita (current US$)"},
         "country":{"id":"GB","value":"United Kingdom"},
         "countryiso3code":"GBR","date":"2023","value":null}]]"""
}

class ClientsSpec extends SparkSpec {
  import ClientsSpec._

  // -- USGS (test_clients.py:14-59) ----------------------------------- //

  test("usgs parse flattens GeoJSON features into 9 columns") {
    val out = UsgsSource.parse(spark, Seq(mockGeojson))
    assert(out.columns.toSeq == Seq("id", "magnitude", "place", "time",
      "latitude", "longitude", "depth", "type", "status"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("id") == "us7000l1aa")
    assert(rows(0).getAs[Double]("magnitude") == 6.2)
    assert(rows(0).getAs[Double]("latitude") == 35.68)
    assert(rows(0).getAs[Double]("longitude") == 139.69)
    assert(rows(0).getAs[Double]("depth") == 10.0)
    assert(rows(0).getAs[java.sql.Timestamp]("time").toInstant
      .toString == "2024-01-01T00:00:00Z")
  }

  test("usgs parse of empty features yields empty frame with schema") {
    val out = UsgsSource.parse(spark, Seq(emptyGeojson))
    assert(out.count() == 0)
    assert(out.schema == UsgsSource.outputSchema)
    assert(UsgsSource.parse(spark, Nil).schema == UsgsSource.outputSchema)
  }

  test("usgs extract paginates until short page (test_clients.py:27-38)") {
    // page size 2 for the test; first page full (2), second short (1) → stop
    val page1 = s"""{"type":"FeatureCollection","features":[
      ${geoFeature("a", 5.0, "p1", 1L, 1, 1, 1)},
      ${geoFeature("b", 5.0, "p1", 2L, 1, 1, 1)}]}"""
    val page2 = s"""{"type":"FeatureCollection","features":[
      ${geoFeature("c", 5.0, "p2", 3L, 1, 1, 1)}]}"""
    val t = new ScriptedTransport(Seq(ok(page1), ok(page2)))
    val c = new UsgsClient(spark, t, _ => ()) {
      override protected def pageSize = 2
    }
    val res = c.extract(Map("max_results" -> 10))
    assert(res.success)
    assert(res.rowCount == 3)
    assert(t.calls == 2)
    // 1-based offset advanced by page sizes
    assert(t.seen.map(_._2("offset")) == Seq("1", "3"))
  }

  test("usgs extract stops at max_results cap") {
    val page = s"""{"type":"FeatureCollection","features":[
      ${geoFeature("a", 5.0, "p", 1L, 1, 1, 1)},
      ${geoFeature("b", 5.0, "p", 2L, 1, 1, 1)}]}"""
    val t = new ScriptedTransport(Seq(ok(page), ok(page), ok(page)))
    val c = new UsgsClient(spark, t, _ => ()) {
      override protected def pageSize = 2
    }
    val res = c.extract(Map("max_results" -> 4))
    assert(res.rowCount == 4)
    assert(t.calls == 2)
  }

  test("usgs extract stops on empty page") {
    val t = new ScriptedTransport(Seq(ok(emptyGeojson)))
    val c = new UsgsClient(spark, t, _ => ())
    val res = c.extract()
    assert(res.success && res.rowCount == 0)
    assert(t.calls == 1)
  }

  test("usgs extract returns error result on transport failure") {
    val t = new ScriptedTransport(Seq(BaseClientSpec.status(404)))
    val c = new UsgsClient(spark, t, _ => ())
    val res = c.extract()
    assert(!res.success)
    assert(res.errors.nonEmpty)
    assert(res.data.isEmpty)
  }

  // -- Open-Meteo (test_clients.py:65-114) ---------------------------- //

  test("open-meteo parse turns parallel arrays into rows") {
    val out = OpenMeteoSource.parse(spark, "New York", mockWeather)
    assert(out.columns.toSeq == Seq("location", "date", "temperature_max",
      "temperature_min", "precipitation", "wind_speed_max"))
    val rows = out.orderBy("date").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("location") == "New York")
    assert(rows(0).getAs[Double]("temperature_max") == 5.2)
    assert(rows(1).getAs[Double]("precipitation") == 2.5)
    assert(rows(2).getAs[java.sql.Date]("date").toString == "2024-01-03")
  }

  test("open-meteo parse yields null column for missing variable") {
    val noWind =
      """{"latitude":40.71,"longitude":-74.01,
         "daily":{"time":["2024-01-01","2024-01-02","2024-01-03"],
                  "temperature_2m_max":[5.2,6.1,4.8],
                  "temperature_2m_min":[-1.0,0.5,-2.3],
                  "precipitation_sum":[0.0,2.5,1.2]}}"""
    val out = OpenMeteoSource.parse(spark, "X", noWind)
    assert(out.count() == 3)
    assert(out.where(org.apache.spark.sql.functions
      .col("wind_speed_max").isNull).count() == 3)
  }

  test("open-meteo extract concatenates locations (test_clients.py:81-94)") {
    val t = new ScriptedTransport(Seq(ok(mockWeather), ok(mockWeather)))
    val c = new OpenMeteoClient(spark, t, _ => ())
    val res = c.extract(Map(
      "locations" -> Seq((40.71, -74.01, "NY"), (51.51, -0.13, "London"))))
    assert(res.success)
    assert(res.rowCount == 6)
    assert(res.data.get.select("location").distinct().count() == 2)
  }

  test("open-meteo extract returns error result on exception") {
    val t = new ScriptedTransport(Seq(BaseClientSpec.connFail))
    val c = new OpenMeteoClient(spark, t, _ => ())
    assert(!c.extract().success)
  }

  // -- World Bank (test_clients.py:120-166) --------------------------- //

  test("world bank parse flattens the [metadata, data] envelope") {
    val out = WorldBankSource.parse(spark, Seq(mockWorldbank))
    assert(out.columns.toSeq == Seq("country_code", "country_name",
      "indicator_code", "indicator_name", "year", "value"))
    val rows = out.orderBy("country_code", "year").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("country_code") == "GBR")
    assert(rows(0).isNullAt(rows(0).fieldIndex("value"))) // null GDP
    assert(rows(1).getAs[Int]("year") == 2022)
    assert(rows(2).getAs[Double]("value") == 81695.19)
  }

  test("world bank parse coerces bad numerics to null") {
    val bad = mockWorldbank.replace("81695.19", "\"not-a-number\"")
    val out = WorldBankSource.parse(spark, Seq(bad))
    assert(out.where(org.apache.spark.sql.functions
      .col("value").isNull).count() == 2)
  }

  test("world bank extract pages by metadata.pages, one loop per indicator") {
    val page1 = mockWorldbank.replace("\"pages\":1", "\"pages\":2")
    val t = new ScriptedTransport(Seq(
      ok(page1), ok(mockWorldbank), // indicator 1: 2 pages
      ok(mockWorldbank)))           // indicator 2: 1 page
    val c = new WorldBankClient(spark, t, _ => ())
    val res = c.extract(Map(
      "countries" -> Seq("US", "GB"),
      "indicators" -> Seq("NY.GDP.PCAP.CD", "SP.POP.TOTL")))
    assert(res.success)
    assert(t.calls == 3)
    assert(res.rowCount == 9)
    assert(t.seen.map(_._2("page")) == Seq("1", "2", "1"))
    assert(t.seen.head._1.contains("/country/US;GB/indicator/NY.GDP.PCAP.CD"))
  }

  test("world bank extract stops on null data page (test_clients.py:148-156)") {
    val t = new ScriptedTransport(Seq(ok("""[{"page":1,"pages":9},null]""")))
    val c = new WorldBankClient(spark, t, _ => ())
    val res = c.extract(Map("indicators" -> Seq("X")))
    assert(res.success)
    assert(res.rowCount == 0)
    assert(t.calls == 1)
  }
}
