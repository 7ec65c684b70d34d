package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two example-pipeline sources as pure JSON→DataFrame
  * parsers (the HTTP fetch is a one-call GET/POST through the standard
  * transport; all parse logic lives here and is testable offline).
  */
object ExampleSources {

  /** SEC company-tickers parse
    * (/root/reference/examples/validate_sec_filings.py:40-68).
    *
    * The file is a dict-of-dicts `{"0": {cik_str, ticker, title}, ...}`
    * — parsed as a map column and exploded via `map_values`, with
    * `cik` zero-padded to the 10-digit SEC standard.
    */
  def parseSecTickers(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    val entry = StructType(Seq(
      StructField("cik_str", LongType),
      StructField("ticker", StringType),
      StructField("title", StringType)))
    spark.createDataset(Seq(body)).toDF("json")
      .select(from_json(col("json"), MapType(StringType, entry)).as("m"))
      .select(explode(map_values(col("m"))).as("r"))
      .select(
        lpad(col("r.cik_str").cast("string"), 10, "0").as("cik"),
        col("r.ticker").as("ticker"),
        col("r.title").as("company_name"))
  }

  /** USASpending award-search parse
    * (/root/reference/examples/validate_federal_awards.py:34-92).
    *
    * Response rows live under `results[]` with display-name keys; the
    * parse renames to snake_case and coerces the amount to double
    * (null on failure — `to_numeric(errors="coerce")`).
    */
  def parseFederalAwards(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    val result = StructType(Seq(
      StructField("Award ID", StringType),
      StructField("Recipient Name", StringType),
      StructField("Award Amount", StringType),
      StructField("Awarding Agency", StringType),
      StructField("Start Date", StringType),
      StructField("End Date", StringType),
      StructField("Award Type", StringType),
      StructField("Description", StringType)))
    val schema = StructType(Seq(
      StructField("results", ArrayType(result))))
    spark.createDataset(Seq(body)).toDF("json")
      .select(from_json(col("json"), schema).as("p"))
      .where(col("p.results").isNotNull)
      .select(explode(col("p.results")).as("r"))
      .select(
        col("r.`Award ID`").as("award_id"),
        col("r.`Recipient Name`").as("recipient_name"),
        col("r.`Award Amount`").cast("double").as("award_amount"),
        col("r.`Awarding Agency`").as("awarding_agency"),
        col("r.`Start Date`").as("start_date"),
        col("r.`End Date`").as("end_date"),
        col("r.`Award Type`").as("award_type"),
        col("r.`Description`").as("description"))
  }
}
