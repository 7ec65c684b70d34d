package graft.pipeline

import graft.SparkSpec
import graft.extract.{OpenMeteoSource, UsgsSource, WorldBankSource}
import graft.operators.Analytics
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end composition mirroring
  * /root/reference/examples/multi_source_pipeline.py:100-146 — three
  * parsed sources flow through latest-per-group, group-mean, and regex
  * faceting into one country-profile join. The whole pipeline is ONE
  * lazy Catalyst plan: no per-stage materialization (the Spark
  * improvement over the reference's eager assembly).
  */
class PipelineIntegrationSpec extends SparkSpec {

  private val wbJson =
    """[{"page":1,"pages":1,"per_page":100,"total":4},
       [{"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita"},
         "country":{"id":"US","value":"United States"},
         "countryiso3code":"USA","date":"2023","value":81695.19},
        {"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita"},
         "country":{"id":"US","value":"United States"},
         "countryiso3code":"USA","date":"2022","value":77246.67},
        {"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita"},
         "country":{"id":"GB","value":"United Kingdom"},
         "countryiso3code":"GBR","date":"2023","value":48866.97},
        {"indicator":{"id":"NY.GDP.PCAP.CD","value":"GDP per capita"},
         "country":{"id":"GB","value":"United Kingdom"},
         "countryiso3code":"GBR","date":"2022","value":45850.43}]]"""

  private val nyWeather =
    """{"latitude":40.71,"longitude":-74.01,
       "daily":{"time":["2024-01-01","2024-01-02"],
                "temperature_2m_max":[5.0,7.0],
                "temperature_2m_min":[-1.0,1.0],
                "precipitation_sum":[0.0,2.0],
                "wind_speed_10m_max":[10.0,20.0]}}"""

  private val quakeJson =
    """{"type":"FeatureCollection","metadata":{"generated":1,"count":2},
       "features":[
        {"id":"q1","type":"Feature",
         "properties":{"mag":5.0,"place":"10km N of Ridgecrest, CA","time":1704067200000,
                       "type":"earthquake","status":"reviewed"},
         "geometry":{"type":"Point","coordinates":[-117.6,35.6,8.0]}},
        {"id":"q2","type":"Feature",
         "properties":{"mag":4.6,"place":"offshore, CA","time":1704070800000,
                       "type":"earthquake","status":"reviewed"},
         "geometry":{"type":"Point","coordinates":[-118.2,34.1,12.0]}}]}"""

  test("three-source country profile assembles through one lazy plan") {
    // 1. latest GDP per country (A2 latest-per-group)
    val wb = WorldBankSource.parse(spark, Seq(wbJson))
    val wbLatest = Analytics.latestPerGroup(
      wb.na.drop(Seq("value")), Seq("country_code"),
      Seq(col("year").desc))

    // 2. average temperature per location (A1 group-mean)
    val weather = OpenMeteoSource.parse(spark, "New York", nyWeather)
    val weatherAvg = weather.groupBy("location")
      .agg(avg("temperature_max").as("avg_temp_max"))

    // 3. earthquake region facets (A3 + P7 regex capture)
    val quakes = UsgsSource.parse(spark, Seq(quakeJson))
    val quakeRegions = Analytics.facetCounts(
      quakes, regexp_extract(col("place"), ",\\s*(.+)$", 1), 10)

    // 4. profile assembly: city→country mapping + three-way join
    val cityMap = df(
      StructType(Seq(
        StructField("location", StringType),
        StructField("country_code", StringType))),
      Seq(Row("New York", "USA")))
    val profile = Analytics.mergeResults(
        wbLatest,
        Analytics.mergeResults(weatherAvg, cityMap, "location", "location"),
        "country_code", "country_code")
      .select("country_code", "year", "value", "avg_temp_max")

    val rows = profile.collect()
    assert(rows.length == 1)
    val us = rows.head
    assert(us.getAs[String]("country_code") == "USA")
    assert(us.getAs[Int]("year") == 2023)
    assert(us.getAs[Double]("value") == 81695.19)
    assert(us.getAs[Double]("avg_temp_max") == 6.0)

    // quake facets independent check: CA region counted twice
    val regions = quakeRegions.collect()
    assert(regions.head.getAs[Long]("count") == 2L)
    assert(regions.head.getAs[String]("facet") == "CA")
  }

  test("error isolation keeps the pipeline alive when one source fails") {
    import graft.pipeline.CollectorSpec.StubClient
    val collector = new MultiSourceCollector()
      .register(new StubClient("world_bank", 4))
      .register(new StubClient("open_meteo", 0, explode = true))
      .register(new StubClient("usgs", 2))
    val results = collector.collectAll()
    assert(results("world_bank").success)
    assert(!results("open_meteo").success)
    assert(results("usgs").success)
    assert(results.values.count(_.success) == 2)
  }
}
