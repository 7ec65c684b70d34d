package graft.extract

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.ExtractionResult
import graft.operators.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** World Bank indicators source
  * (/root/reference/src/extractors/world_bank.py:30-153).
  *
  * Responses are a `[metadata, data]` two-element envelope; page-number
  * pagination is driven by `metadata.pages`. The Spark parse pulls the
  * data array out of the envelope with `get_json_object($[1])`, then
  * `from_json` + `explode` flattens the nested country/indicator
  * objects. Numeric coercion (`pd.to_numeric(errors="coerce")`,
  * world_bank.py:152) is a non-ANSI cast to double.
  */
object WorldBankSource {

  val recordSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("indicator", StructType(Seq(
      StructField("id", StringType), StructField("value", StringType)))),
    StructField("country", StructType(Seq(
      StructField("id", StringType), StructField("value", StringType)))),
    StructField("countryiso3code", StringType),
    StructField("date", StringType),
    StructField("value", StringType))))

  val outputSchema: StructType = StructType(Seq(
    StructField("country_code", StringType),
    StructField("country_name", StringType),
    StructField("indicator_code", StringType),
    StructField("indicator_name", StringType),
    StructField("year", IntegerType),
    StructField("value", DoubleType)))

  /** Pure parse: `[metadata, data]` page bodies → indicator rows
    * (world_bank.py:127-153).
    */
  def parse(spark: SparkSession, pages: Seq[String]): DataFrame = {
    if (pages.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outputSchema)
    import spark.implicits._
    spark.createDataset(pages).toDF("json")
      // $[1] = the data array of the envelope (world_bank.py:116)
      .select(from_json(
        get_json_object(col("json"), "$[1]"), recordSchema).as("recs"))
      .where(col("recs").isNotNull)
      .select(explode(col("recs")).as("r"))
      .select(
        // countryiso3code, falling back to country.id (world_bank.py:140).
        // Intentional divergence: the reference's dict.get falls back
        // only when the KEY is absent, so a present-but-JSON-null value
        // stays null there; from_json can't distinguish absent from
        // null, so we coalesce in both cases — strictly more complete
        // output for records that carry an explicit null iso3 code.
        coalesce(col("r.countryiso3code"), col("r.country.id"))
          .as("country_code"),
        col("r.country.value").as("country_name"),
        col("r.indicator.id").as("indicator_code"),
        col("r.indicator.value").as("indicator_name"),
        // int(rec["date"]) if date else None — non-ANSI cast coerces
        // empty/invalid to null (world_bank.py:147)
        col("r.date").cast(IntegerType).as("year"),
        col("r.value").cast(DoubleType).as("value"))
  }
}

class WorldBankClient(
    spark: SparkSession,
    transport: HttpTransport = null,
    sleepMillis: Long => Unit = Thread.sleep)
  extends BaseClient(transport = transport, sleepMillis = sleepMillis) {

  def sourceName: String = "world_bank"
  def baseUrl: String = "https://api.worldbank.org/v2"
  def rateLimit: Int = 60

  private val mapper = new ObjectMapper()

  private val defaultCountries = Seq(
    "US", "GB", "JP", "DE", "FR", "CA", "AU", "BR", "IN", "CN")
  private val defaultIndicators = Seq("NY.GDP.PCAP.CD", "SP.POP.TOTL")

  def extract(params: Map[String, Any] = Map.empty): ExtractionResult = {
    val started = System.nanoTime()
    resetTelemetry()
    val countries = params.get("countries")
      .map(_.asInstanceOf[Seq[String]]).getOrElse(defaultCountries)
    val indicators = params.get("indicators")
      .map(_.asInstanceOf[Seq[String]]).getOrElse(defaultIndicators)
    val startYear = params.get("start_year")
      .map(_.toString.toInt).getOrElse(2018)
    val endYear = params.get("end_year")
      .map(_.toString.toInt).getOrElse(2023)

    try {
      val countryStr = countries.mkString(";")
      // Per-indicator page loop (world_bank.py:75-81); frames concat
      val frames = indicators.map { ind =>
        WorldBankSource.parse(spark,
          fetchIndicator(countryStr, ind, startYear, endYear))
      }
      buildResult(Analytics.unionAll(frames), started)
    } catch {
      case e: Exception => buildError(String.valueOf(e.getMessage), started)
    }
  }

  /** Page-number pagination driven by `metadata.pages`
    * (world_bank.py:88-125). Stops on a malformed envelope or null data.
    */
  private def fetchIndicator(
      countryStr: String, indicator: String,
      startYear: Int, endYear: Int): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = 1
    var done = false
    while (!done) {
      val body = getJson(s"/country/$countryStr/indicator/$indicator", Map(
        "format" -> "json",
        "date" -> s"$startYear:$endYear",
        "per_page" -> "100",
        "page" -> page.toString))
      val root = mapper.readTree(body)
      if (!root.isArray || root.size() < 2 || root.get(1).isNull) done = true
      else {
        pages += body
        val totalPages = root.get(0).path("pages").asInt(1)
        if (page >= totalPages) done = true else page += 1
      }
    }
    pages.toSeq
  }
}
