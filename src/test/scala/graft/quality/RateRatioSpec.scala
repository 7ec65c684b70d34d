package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Drift.rateRatio]] — closed forms, one-sided/empty-group
  * handling, and the planted q298 error-rate collapse that the
  * value-conditioned alarms are blind to.
  */
class RateRatioSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("id", LongType))),
    rows.map { case (g, i) => Row(g, i) })

  private def mk(g: String, n: Int) =
    (1 to n).map(i => (g, i.toLong))

  test("closed form: 100 vs 64 gives z = -36/sqrt(164), " +
      "rate_ratio 0.64, and a CI excluding 1") {
    val out = Drift.rateRatio(
      side(mk("g", 100): _*), side(mk("g", 64): _*), Seq("g")).head()
    assert(out.getLong(1) == 100L && out.getLong(2) == 64L)
    assert(out.getDouble(3) == 0.64)
    val z = -36.0 / math.sqrt(164.0)
    assert(out.getDouble(6) ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(out.getDouble(5) < 1.0) // ci_hi below 1
    assert(out.getInt(7) == 1)
  }

  test("balanced counts: z small, ratio ~1, no alarm") {
    val out = Drift.rateRatio(
      side(mk("g", 50): _*), side(mk("g", 52): _*), Seq("g")).head()
    assert(out.getDouble(3) == 1.04 && out.getInt(7) == 0)
  }

  test("a group present on only one side still alarms on z but " +
      "reports null ratio (nothing to divide)") {
    val out = Drift.rateRatio(
      side(mk("gone", 30): _*), side(mk("new", 30): _*), Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("gone").getLong(2) == 0L && out("gone").isNullAt(3))
    assert(out("gone").getInt(7) == 1) // -30/sqrt(30) decisive
    assert(out("new").getLong(1) == 0L && out("new").getInt(7) == 1)
  }

  test("q298 on the real corpus: the 60% error collapse is the only " +
      "rate alarm — the axis the value tests cannot see") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .rateDriftQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("error").getInt(7) == 1)
      assert(byG("error").getDouble(6) < -1.96)
      byG.filterKeys(_ != "error").values.foreach { r =>
        assert(r.getInt(7) == 0, s"false alarm: ${r.getString(0)}")
      }
    }
  }
}
