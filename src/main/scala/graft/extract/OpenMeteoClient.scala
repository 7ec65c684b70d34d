package graft.extract

import graft.core.ExtractionResult
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Open-Meteo historical weather source
  * (/root/reference/src/extractors/open_meteo.py:30-136).
  *
  * The API returns parallel arrays under `daily` — one `time` array plus
  * one array per requested variable. The Spark parse `posexplode`s the
  * time array and indexes each variable array with `element_at`, so a
  * variable missing from the response yields a null column, matching the
  * reference's `daily.get(var, [None] * n)` (open_meteo.py:130-132).
  */
object OpenMeteoSource {

  /** API name → output column renames (open_meteo.py:122-127). */
  val columnMap: Map[String, String] = Map(
    "temperature_2m_max" -> "temperature_max",
    "temperature_2m_min" -> "temperature_min",
    "precipitation_sum" -> "precipitation",
    "wind_speed_10m_max" -> "wind_speed_max")

  val defaultVariables: Seq[String] = Seq(
    "temperature_2m_max", "temperature_2m_min",
    "precipitation_sum", "wind_speed_10m_max")

  def pageSchema(variables: Seq[String]): StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("daily", StructType(
      StructField("time", ArrayType(StringType)) +:
        variables.map(v => StructField(v, ArrayType(DoubleType)))))))

  /** Pure parse of one location's response (open_meteo.py:104-136). */
  def parse(
      spark: SparkSession,
      locationName: String,
      page: String,
      variables: Seq[String] = defaultVariables): DataFrame = {
    import spark.implicits._
    val varCols: Seq[Column] = variables.map { v =>
      element_at(col("daily").getField(v), col("pos") + 1)
        .as(columnMap.getOrElse(v, v))
    }
    spark.createDataset(Seq(page)).toDF("json")
      .select(from_json(col("json"), pageSchema(variables)).as("p"))
      .select(col("p.daily").as("daily"))
      .where(col("daily").isNotNull && col("daily.time").isNotNull)
      .select(col("daily"),
        posexplode(col("daily.time")).as(Seq("pos", "date_str")))
      .select(
        (lit(locationName).as("location") +:
          to_date(col("date_str")).as("date") +:
          varCols): _*)
  }
}

class OpenMeteoClient(
    spark: SparkSession,
    transport: HttpTransport = null,
    sleepMillis: Long => Unit = Thread.sleep)
  extends BaseClient(transport = transport, sleepMillis = sleepMillis) {

  def sourceName: String = "open_meteo"
  def baseUrl: String = "https://archive-api.open-meteo.com/v1"
  def rateLimit: Int = 60

  private val defaultLocations: Seq[(Double, Double, String)] = Seq(
    (40.71, -74.01, "New York"),
    (51.51, -0.13, "London"),
    (35.68, 139.69, "Tokyo"))

  def extract(params: Map[String, Any] = Map.empty): ExtractionResult = {
    val started = System.nanoTime()
    resetTelemetry()
    val locations = params.get("locations")
      .map(_.asInstanceOf[Seq[(Double, Double, String)]])
      .getOrElse(defaultLocations)
    val startDate = params.getOrElse("start_date", "2024-01-01").toString
    val endDate = params.getOrElse("end_date", "2024-12-31").toString
    val variables = params.get("variables")
      .map(_.asInstanceOf[Seq[String]])
      .getOrElse(OpenMeteoSource.defaultVariables)

    try {
      val frames = locations.map { case (lat, lon, name) =>
        val body = getJson("/archive", Map(
          "latitude" -> lat.toString,
          "longitude" -> lon.toString,
          "start_date" -> startDate,
          "end_date" -> endDate,
          "daily" -> variables.mkString(","),
          "timezone" -> "UTC"))
        OpenMeteoSource.parse(spark, name, body, variables)
      }
      // pd.concat of per-location frames (open_meteo.py:85-88) —
      // identical schemas here, unionByName tolerates future drift.
      val combined = Analytics.unionAll(frames)
      buildResult(combined, started)
    } catch {
      case e: Exception => buildError(String.valueOf(e.getMessage), started)
    }
  }
}
