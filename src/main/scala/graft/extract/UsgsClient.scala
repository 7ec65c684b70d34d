package graft.extract

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.ExtractionResult
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** USGS earthquake GeoJSON source
  * (/root/reference/src/extractors/usgs.py:30-136).
  *
  * Offset pagination (1-based, page size 500, cap `max_results`, stop on
  * empty or short page) runs on the driver; the GeoJSON pages are parsed
  * INTO rows by Spark (`from_json` → `explode(features)`), so flattening
  * scales with the cluster, not the driver.
  */
object UsgsSource {

  /** GeoJSON page schema (usgs.py:110-133; FIXTURES.md A1). */
  val pageSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("metadata", StructType(Seq(
      StructField("generated", LongType),
      StructField("count", IntegerType)))),
    StructField("features", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType),
      StructField("properties", StructType(Seq(
        StructField("mag", DoubleType),
        StructField("place", StringType),
        StructField("time", LongType),
        StructField("type", StringType),
        StructField("status", StringType)))),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(DoubleType)))))))))))

  /** Flat output schema — the reference's explicit empty-frame columns
    * (usgs.py:112-118) are its de facto schema.
    */
  val outputSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("magnitude", DoubleType),
    StructField("place", StringType),
    StructField("time", TimestampType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("depth", DoubleType),
    StructField("type", StringType),
    StructField("status", StringType)))

  /** Pure parse: GeoJSON page bodies → flat earthquake rows
    * (usgs.py:110-136). `element_at` is 1-based and null-safe — the
    * reference's length-guarded `coords[i]` accesses come free.
    */
  def parse(spark: SparkSession, pages: Seq[String]): DataFrame = {
    if (pages.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outputSchema)
    import spark.implicits._
    spark.createDataset(pages).toDF("json")
      .select(from_json(col("json"), pageSchema).as("g"))
      .select(explode(col("g.features")).as("f"))
      .select(
        col("f.id").as("id"),
        col("f.properties.mag").as("magnitude"),
        col("f.properties.place").as("place"),
        timestamp_millis(col("f.properties.time")).as("time"),
        element_at(col("f.geometry.coordinates"), 2).as("latitude"),
        element_at(col("f.geometry.coordinates"), 1).as("longitude"),
        element_at(col("f.geometry.coordinates"), 3).as("depth"),
        col("f.properties.type").as("type"),
        col("f.properties.status").as("status"))
  }
}

class UsgsClient(
    spark: SparkSession,
    transport: HttpTransport = null,
    sleepMillis: Long => Unit = Thread.sleep)
  extends BaseClient(transport = transport, sleepMillis = sleepMillis) {

  def sourceName: String = "usgs"
  def baseUrl: String = "https://earthquake.usgs.gov/fdsnws/event/1"
  def rateLimit: Int = 60
  protected def pageSize: Int = 500 // usgs.py:37

  private val mapper = new ObjectMapper()

  def extract(params: Map[String, Any] = Map.empty): ExtractionResult = {
    val started = System.nanoTime()
    resetTelemetry()
    val startDate = params.getOrElse("start_date", "2025-01-01").toString
    val endDate = params.getOrElse("end_date", "2025-12-31").toString
    val minMagnitude = params.getOrElse("min_magnitude", 4.5).toString
    val maxResults = params.get("max_results")
      .map(_.toString.toInt).getOrElse(2000)

    try {
      val pages = paginate(startDate, endDate, minMagnitude, maxResults)
      buildResult(UsgsSource.parse(spark, pages), started)
    } catch {
      case e: Exception => buildError(String.valueOf(e.getMessage), started)
    }
  }

  /** Offset pagination (usgs.py:72-108): 1-based offset, stop on empty
    * page, short page, or cap. Page bodies are returned raw; only the
    * feature COUNT is probed driver-side (Jackson) to drive the loop.
    */
  private def paginate(
      startDate: String, endDate: String,
      minMagnitude: String, maxResults: Int): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var fetched = 0
    var offset = 1
    var done = false
    while (!done && fetched < maxResults) {
      val limit = math.min(pageSize, maxResults - fetched)
      val body = getJson("/query", Map(
        "format" -> "geojson",
        "starttime" -> startDate,
        "endtime" -> endDate,
        "minmagnitude" -> minMagnitude,
        "limit" -> limit.toString,
        "offset" -> offset.toString,
        "orderby" -> "magnitude"))
      val n = {
        val features = mapper.readTree(body).path("features")
        if (features.isArray) features.size() else 0
      }
      if (n == 0) done = true
      else {
        pages += body
        fetched += n
        offset += n
        if (n < limit) done = true // short page = exhausted (usgs.py:105)
      }
    }
    pages.toSeq
  }
}
