package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Drift.welchT]] — hand-computed t and Welch–Satterthwaite df,
  * the equal-variance reduction, the unequal-variance case where
  * Welch df drops below n−2, degenerate guards, and the q305 dual
  * plant on the real corpus.
  */
class WelchTSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  private def wt(base: Seq[(String, Long)], cur: Seq[(String, Long)]) =
    Drift.welchT(side(base: _*), side(cur: _*), col("x"), Seq("g"))

  test("hand-computed: base {1,2,3}, cur {4,6,8} -> t = 4/sqrt(5/3), " +
      "Satterthwaite df from the two per-side variances") {
    val out = wt(Seq(("g", 1L), ("g", 2L), ("g", 3L)),
      Seq(("g", 4L), ("g", 6L), ("g", 8L))).head()
    // s2b = 1, s2c = 4; vb = 1/3, vc = 4/3; t = (6-2)/sqrt(5/3)
    val t = 4.0 / math.sqrt(5.0 / 3.0)
    val v = 5.0 / 3.0
    val dfW = v * v / ((1.0 / 9.0) / 2.0 + (16.0 / 9.0) / 2.0)
    assert(out.getDouble(5) ==
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(out.getDouble(6) ==
      BigDecimal(dfW).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(out.getInt(7) == 1)
  }

  test("equal per-side variances: Welch df equals the pooled n-2") {
    val out = wt(Seq(("g", 1L), ("g", 3L)), Seq(("g", 11L), ("g", 13L)))
      .head()
    assert(out.getDouble(6) == 2.0)
  }

  test("groups on one side only are absent; constant sides give " +
      "null t (zero variance)") {
    val out = wt(Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L)),
      Seq(("a", 5L), ("a", 5L)))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "a")
    assert(rows.head.isNullAt(5) && rows.head.getInt(7) == 0)
  }

  test("q305 on the real corpus: the URGENT location plant fires; " +
      "2-HIGH's mean-preserving variance widening stays quiet") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .welchTQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("1-URGENT").getInt(7) == 1)
      assert(byG("2-HIGH").getInt(7) == 0)
      // the variance plant is VISIBLE in the df: Welch df for 2-HIGH
      // drops well below the near-balanced ~n-2 of the clean groups
      val dfHigh = byG("2-HIGH").getDouble(6)
      val dfClean = byG("3-MEDIUM").getDouble(6)
      assert(dfHigh < dfClean * 0.75,
        s"expected unequal-variance df shrink: $dfHigh vs $dfClean")
    }
  }
}
