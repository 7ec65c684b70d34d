package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure `Column` combinators for the engine's dimensional-modeling and
  * coercion semantics. Everything here is codegen-friendly built-ins —
  * no UDFs — so it stays inside whole-stage codegen at any scale.
  *
  * Semantics mirror /root/reference/src/transformers/base_transformer.py.
  */
object Fx {

  /** Deterministic surrogate key: first 12 hex chars of
    * md5(parts joined by "|"), with nulls rendered as the string "None"
    * (base_transformer.py:53-56 — Python's `str(None)`; `concat_ws`
    * would silently skip nulls, which breaks byte-fidelity).
    */
  def surrogateKey(parts: Column*): Column = {
    val rendered = parts.map(p => coalesce(p.cast("string"), lit("None")))
    substring(md5(concat_ws("|", rendered: _*)), 1, 12)
  }

  /** Integer date key YYYYMMDD (base_transformer.py:58-61). */
  def dateKey(date: Column): Column =
    date_format(date, "yyyyMMdd").cast("int")

  /** Calendar attributes for a date column (base_transformer.py:63-80).
    * Month/day names pinned to the English locale via Spark's `date_format`
    * (session-locale independent); is_weekend follows Python's
    * `weekday() >= 5` = Saturday/Sunday (Spark dayofweek: Sun=1, Sat=7).
    */
  def dateAttributes(date: Column): Seq[(String, Column)] = Seq(
    "date_key" -> dateKey(date),
    "year" -> year(date),
    "quarter" -> quarter(date),
    "month" -> month(date),
    "month_name" -> date_format(date, "MMMM"),
    "day_of_week" -> date_format(date, "EEEE"),
    "day_of_year" -> dayofyear(date),
    "is_weekend" -> dayofweek(date).isin(1, 7))

  /** Date dimension: one row per distinct date with calendar attributes
    * (base_transformer.py:63-80). Distinct first — at 100 TB the distinct
    * collapses billions of rows to a few thousand dates before the
    * (cheap) attribute projection.
    */
  def dateDimension(df: DataFrame, dateCol: String): DataFrame = {
    val d = to_date(col(dateCol))
    val base = df.select(d.as("date")).where(col("date").isNotNull)
      .distinct()
    dateAttributes(col("date")).foldLeft(base) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }.orderBy("date")
  }

  /** Parse ISO date from the first 10 chars of any stringable value
    * (base_transformer.py:60,65,68 `strptime(str(d)[:10], "%Y-%m-%d")`).
    */
  def isoDate(c: Column): Column =
    to_date(substring(c.cast("string"), 1, 10), "yyyy-MM-dd")

  /** Numeric coercion with null-on-failure — the reference's
    * `pd.to_numeric(errors="coerce")` (world_bank.py:152). Requires
    * `spark.sql.ansi.enabled=false` (set by [[graft.core.Sessions]]);
    * under ANSI use `try_cast` instead.
    */
  def coerceDouble(c: Column): Column = c.cast("double")

  /** Epoch-milliseconds → UTC timestamp (usgs.py:128). */
  def epochMillisToTimestamp(c: Column): Column = timestamp_millis(c)

  /** Epoch-nanosecond long → microsecond timestamp (Spark reads Parquet
    * TIMESTAMP(NANOS) as long under spark.sql.legacy.parquet.nanosAsLong;
    * Spark timestamps are microsecond precision, so truncate).
    */
  def nanosToTimestamp(c: Column): Column =
    // decimal integer division keeps exactness (a double round-trip of an
    // epoch-nanos long can be off by ~256ns)
    timestamp_micros(floor(c.cast("decimal(20,0)") / lit(1000)).cast("long"))

  /** Zero-pad left to a fixed width (validate_sec_filings.py:65). */
  def zeroPad(c: Column, width: Int): Column =
    lpad(c.cast("string"), width, "0")
}
