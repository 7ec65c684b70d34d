package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.seasonalMannKendall]] — the cycle-cancellation
  * contract (a pure periodic pattern contributes ZERO), additivity of
  * within-season statistics, and the planted q302 growth-through-
  * cycle detection on the real corpus.
  */
class SeasonalMkSpec extends SparkSpec {

  private def seriesDf(rows: (String, Long, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("se", LongType),
      StructField("bx", LongType),
      StructField("y", LongType))),
    rows.map { case (g, s, b, y) => Row(g, s, b, y) })

  private def smk(rows: (String, Long, Long, Long)*) =
    Analytics.seasonalMannKendall(seriesDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("se"),
      org.apache.spark.sql.functions.col("bx"),
      org.apache.spark.sql.functions.col("y"))

  test("a pure cycle contributes zero: constant-within-season " +
      "values give S = 0 even though plain MK would see the swings") {
    // seasons 0/1 alternate values 10/90 over 6 buckets
    val rows = (0L to 5L).map(b => ("g", b % 2, b,
      if (b % 2 == 0) 10L else 90L))
    val out = smk(rows: _*).head()
    assert(out.getLong(3) == 0L) // s_stat
    // each season's 3 equal values are fully tied: var_num = 0
    assert(out.getLong(4) == 0L && out.isNullAt(5))
  }

  test("within-season growth through a cycle is detected: the " +
      "cycle offsets cancel and S sums the seasonal trends") {
    // two seasons, each strictly increasing across 4 weeks
    val rows = (0L to 7L).map { b =>
      val base = if (b % 2 == 0) 0L else 1000L
      ("g", b % 2, b, base + b * 10L)
    }
    val out = smk(rows: _*).head()
    // each season: 4 points strictly increasing -> S_s = 6; total 12
    assert(out.getLong(3) == 12L)
    // var_num = 2 * 4*3*13 = 312
    assert(out.getLong(4) == 312L)
    assert(out.getInt(6) == 1)
  }

  test("variance numerators add across seasons with per-season tie " +
      "correction") {
    // season 0: {1,1,2} (tie pair), season 1: {5,6}
    val out = smk(("g", 0L, 0L, 1L), ("g", 0L, 2L, 1L),
      ("g", 0L, 4L, 2L), ("g", 1L, 1L, 5L), ("g", 1L, 3L, 6L))
      .head()
    // season0 var_num = 3*2*11 - 2*1*9 = 48; season1 = 2*1*9 = 18
    assert(out.getLong(4) == 66L)
    assert(out.getLong(1) == 2L && out.getLong(2) == 5L)
  }

  test("q302 on the real corpus: the purchase growth is flagged " +
      "THROUGH the painted weekly cycle") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .seasonalMkQ(spark, "/root/testdata/sf0.001").collect()
      val p = rows.find(_.getString(0) == "purchase").get
      assert(p.getLong(1) == 7L) // seven seasons
      assert(p.getDouble(5) > 1.96 && p.getInt(6) == 1)
    }
  }
}
