package graft.transform

import graft.SparkSpec
import graft.extract.OpenMeteoSource
import graft.functions.Fx
import graft.quality.{CompletenessRule, DataValidator, RangeRule, UniquenessRule}
import org.apache.spark.sql.functions._

/** The reference's flagship end-to-end path (weather vertical,
  * README.md:140 `fact_hourly_weather`): source parse → dimensional
  * modeling (surrogate/date keys, date dimension) → star-schema build →
  * referential integrity → quality validation. One lazy plan feeds the
  * whole pipeline.
  */
class StarPipelineIntegrationSpec extends SparkSpec {

  private val weatherJson =
    """{"latitude":40.71,"longitude":-74.01,
       "daily":{"time":["2024-01-06","2024-01-07","2024-01-08"],
                "temperature_2m_max":[5.2,6.1,4.8],
                "temperature_2m_min":[-1.0,0.5,-2.3],
                "precipitation_sum":[0.0,2.5,1.2],
                "wind_speed_10m_max":[15.3,20.1,12.7]}}"""

  test("weather source flows into a validated star schema") {
    val weather = OpenMeteoSource.parse(spark, "New York", weatherJson)

    // dimensions: location (surrogate-keyed) + generated date dimension
    val dimLocation = weather.select("location").distinct()
      .withColumn("location_sk", Fx.surrogateKey(col("location")))
    val dimDate = Fx.dateDimension(weather, "date")

    // fact: measures keyed by surrogate + date key
    val fact = weather
      .withColumn("location_sk", Fx.surrogateKey(col("location")))
      .withColumn("date_key", Fx.dateKey(col("date")))
      .select("location_sk", "date_key", "temperature_max",
        "temperature_min", "precipitation", "wind_speed_max")

    val out = java.nio.file.Files.createTempDirectory("graft_weather").toString
    val builder = new StarSchemaBuilder(out, "weather_pipeline")
      .addDimension(SchemaDefinition("dim_location", "dimension",
        naturalKeys = Seq("location")))
      .addDimension(SchemaDefinition("dim_date", "dimension",
        naturalKeys = Seq("date")))
      .addFact(SchemaDefinition("fact_daily_weather", "fact",
        measures = Seq("temperature_max", "temperature_min",
          "precipitation", "wind_speed_max"),
        dimensionKeys = Seq("location_sk", "date_key")))

    val res = builder.build(Map(
      "dim_location" -> dimLocation,
      "dim_date" -> dimDate,
      "fact_daily_weather" -> fact))

    assert(res.success)
    assert(res.tablesCreated ==
      Seq("dim_location", "dim_date", "fact_daily_weather"))
    assert(res.rowsByTable("fact_daily_weather") == 3L)
    assert(res.totalRows == 7L) // 1 location + 3 dates + 3 fact rows

    // referential integrity: no orphan fact keys against either dim
    assert(builder.validateReferentialIntegrity(
      fact, dimLocation, "location_sk", "location_sk") == 0L)
    val dimDateKeyed = dimDate.withColumn("date_key", Fx.dateKey(col("date")))
    assert(builder.validateReferentialIntegrity(
      fact, dimDateKeyed, "date_key", "date_key") == 0L)

    // quality gate on the written fact table
    val written = spark.read.parquet(res.outputPaths("fact_daily_weather"))
    val report = new DataValidator("fact_daily_weather")
      .addRule(CompletenessRule(Seq("location_sk", "date_key")))
      .addRule(UniquenessRule(Seq("location_sk", "date_key")))
      .addRule(RangeRule("temperature_max", Some(-60), Some(60)))
      .validate(written)
    assert(report.passed)
    assert(report.rowCount == 3L)
  }
}
