package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.ljungBox]] — the alternating-series extreme, the
  * white-noise quiet read, agreement with a hand-built statistic off
  * the exposed ACF, and the q328 plant on the real corpus.
  */
class LjungBoxSpec extends SparkSpec {

  private def eventsAt(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("event_type", StringType),
      StructField("ts", TimestampType))),
    rows.map { case (g, hr) =>
      Row(g, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
          .plusHours(hr.toInt).format(
            java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:mm:ss")))) })

  test("a strict 3-vs-1 hourly alternation over 48 hours fires; a " +
      "constant series reads null (zero variance)") {
    val alt = (0L until 48L).flatMap(h =>
      Seq.fill(if (h % 2 == 0) 3 else 1)(("alt", h)))
    val const = (0L until 48L).flatMap(h =>
      Seq.fill(2)(("const", h)))
    val out = Analytics.ljungBox(eventsAt(alt ++ const: _*),
      "ts", "event_type", 3600L, 6).collect()
    val byG = out.map(r => r.getString(0) -> r).toMap
    assert(byG("alt").getInt(4) == 1)
    assert(byG("alt").getDouble(3) > 12.59)
    assert(byG("const").isNullAt(3) &&
      byG("const").getInt(4) == 0)
  }

  test("the statistic agrees with n(n+2)*sum(r_k^2/(n-k)) computed " +
      "from the exposed ACF within the nano-floor") {
    val rows = (0L until 40L).flatMap(h =>
      Seq.fill(((h * 7 + 3) % 5 + 1).toInt)(("g", h)))
    val lbRow = Analytics.ljungBox(eventsAt(rows: _*),
      "ts", "event_type", 3600L, 6).head()
    val acf = Analytics.autocorrelation(eventsAt(rows: _*),
      "ts", "event_type", 3600L, 6).collect()
    val n = lbRow.getLong(1).toDouble
    val hand = n * (n + 2.0) * acf.map { r =>
      val rk = r.getDouble(4)
      rk * rk / (n - r.getInt(1)) }.sum
    // the ACF's r is ROUNDED to 6dp, so agreement is approximate
    assert(math.abs(lbRow.getDouble(3) - hand) < 0.01,
      s"${lbRow.getDouble(3)} vs $hand")
  }

  test("q328 on the real corpus: the tripled-even-hour purchase " +
      "plant fires and tops the board") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .ljungBoxQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("purchase").getInt(4) == 1)
      val lbs = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(lbs("purchase") == lbs.values.max,
        s"purchase must top the board: $lbs")
    }
  }
}
