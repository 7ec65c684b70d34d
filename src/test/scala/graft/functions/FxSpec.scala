package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FxSpec extends SparkSpec {

  private def one(cols: (String, Any)*) = {
    val schema = StructType(cols.map {
      case (n, _: String) => StructField(n, StringType)
      case (n, _: Int) => StructField(n, IntegerType)
      case (n, null) => StructField(n, StringType)
      case (n, _) => StructField(n, StringType)
    })
    df(schema, Seq(Row(cols.map(_._2): _*)))
  }

  test("surrogate key = md5(parts joined by |)[0:12], deterministic") {
    val d = one("a" -> "AAPL", "b" -> "2024-01-15")
    val k = d.select(Fx.surrogateKey(col("a"), col("b")).as("k"))
      .head().getString(0)
    // md5("AAPL|2024-01-15") first 12 hex — matches reference
    // base_transformer.py:53-56 byte-for-byte.
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("AAPL|2024-01-15".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    assert(k == expected)
    assert(k.length == 12)
  }

  test("surrogate key renders null as the string 'None' (Python str(None))") {
    val d = one("a" -> "x", "b" -> null)
    val k = d.select(Fx.surrogateKey(col("a"), col("b")).as("k"))
      .head().getString(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("x|None".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    assert(k == expected)
  }

  test("dateKey yields int yyyyMMdd") {
    val d = spark.sql("SELECT DATE'2024-03-07' AS d")
    assert(d.select(Fx.dateKey(col("d"))).head().getInt(0) == 20240307)
  }

  test("date dimension attributes match Python semantics") {
    val d = spark.sql("SELECT DATE'2024-01-06' AS dt") // a Saturday
    val row = d.select(Fx.dateAttributes(col("dt")).map {
      case (n, c) => c.as(n)
    }: _*).head()
    assert(row.getAs[Int]("date_key") == 20240106)
    assert(row.getAs[Int]("year") == 2024)
    assert(row.getAs[Int]("quarter") == 1)
    assert(row.getAs[Int]("month") == 1)
    assert(row.getAs[String]("month_name") == "January")
    assert(row.getAs[String]("day_of_week") == "Saturday")
    assert(row.getAs[Int]("day_of_year") == 6)
    assert(row.getAs[Boolean]("is_weekend"))
  }

  test("dateDimension builds one row per distinct non-null date") {
    val d = df(
      StructType(Seq(StructField("when", StringType, nullable = true))),
      Seq(Row("2024-01-01"), Row("2024-01-01"), Row("2024-01-02"), Row(null)))
    val dim = Fx.dateDimension(d, "when")
    assert(dim.count() == 2)
    assert(dim.columns.toSeq == Seq("date", "date_key", "year", "quarter",
      "month", "month_name", "day_of_week", "day_of_year", "is_weekend"))
  }

  test("isoDate parses the first 10 chars of any stringable value") {
    val d = one("v" -> "2024-05-06T12:34:56Z")
    assert(d.select(Fx.isoDate(col("v")).cast("string")).head()
      .getString(0) == "2024-05-06")
  }

  test("coerceDouble yields null on unparseable (to_numeric coerce)") {
    val d = df(
      StructType(Seq(StructField("v", StringType))),
      Seq(Row("1.5"), Row("oops")))
    val out = d.select(Fx.coerceDouble(col("v")).as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1.5), None))
  }

  test("zeroPad pads CIK to 10 (validate_sec_filings.py:65)") {
    val d = one("cik" -> 320193)
    assert(d.select(Fx.zeroPad(col("cik"), 10)).head()
      .getString(0) == "0000320193")
  }

  test("epochMillisToTimestamp is UTC") {
    val d = spark.sql("SELECT CAST(1704067200000 AS BIGINT) AS ms")
    assert(d.select(Fx.epochMillisToTimestamp(col("ms")).cast("string"))
      .head().getString(0) == "2024-01-01 00:00:00")
  }
}
