package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.durbinWatson]] — hand-computed d on alternating and
  * trending series, the detrend contract (a pure linear ramp reads
  * as white), degenerate guards, and the q309 plant separation on
  * the real corpus (oscillation fires, ramp does not).
  */
class DurbinWatsonSpec extends SparkSpec {

  private def seriesDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("bx", LongType),
      StructField("y", LongType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  private def dw(rows: (String, Long, Long)*) =
    Analytics.durbinWatson(seriesDf(rows: _*), Seq("g"),
      col("bx"), col("y"))

  test("perfect alternation around a flat trend: d -> 4 (negative " +
      "lag-1 autocorrelation), rho1 -> -1") {
    val rows = (0L until 8L).map(i =>
      ("g", i, if (i % 2 == 0) 100L else -100L))
    val out = dw(rows: _*).head()
    assert(out.getDouble(3) > 3.5, s"d = ${out.getDouble(3)}")
    assert(out.getDouble(4) < -0.75)
    assert(out.getInt(5) == 1)
  }

  test("a pure linear ramp detrends to ~zero residuals with no " +
      "autocorrelation signal left: null d (se2 = 0 after the " +
      "micro-floor) or d in the quiet band") {
    val rows = (0L until 10L).map(i => ("g", i, 1000L + 250L * i))
    val out = dw(rows: _*).head()
    // exact fit -> residuals all floor to the same value -> se2 can
    // quantize to 0 -> d null and flag 0
    assert(out.isNullAt(3) || out.getInt(5) == 0)
    assert(out.getInt(5) == 0)
  }

  test("two-block regime {low x5, high x5}: the block survives the " +
      "detrend enough to read positive autocorrelation (d < 1.5)") {
    val rows = (0L until 10L).map(i =>
      ("g", i, if (i < 5) 100L else 10000L))
    // within each block add alternating noise so residuals are not
    // degenerate
    val noisy = rows.zipWithIndex.map { case ((g, b, y), i) =>
      (g, b, y + (if (i % 2 == 0) 37L else -37L)) }
    val out = dw(noisy: _*).head()
    assert(!out.isNullAt(3) && out.getDouble(3) < 1.5)
    assert(out.getInt(5) == 1)
  }

  test("fewer than 3 buckets is guarded to null") {
    val out = dw(("g", 0L, 5L), ("g", 1L, 9L)).head()
    assert(out.isNullAt(3) && out.getInt(5) == 0)
  }

  test("q309 on the real corpus: purchase's regime oscillation " +
      "fires; view's linear ramp detrends to quiet") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .durbinWatsonQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("purchase").getInt(5) == 1)
      assert(byG("purchase").getDouble(3) < 1.2)
      assert(byG("view").getInt(5) == 0,
        s"view dw=${byG("view").getDouble(3)} should be quiet")
    }
  }
}
