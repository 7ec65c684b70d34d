package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Drift.seasonalDecompose]] — exact recovery of a constructed
  * trend+seasonal series, the additive identity y = trend + seasonal
  * + residual, edge-null and gap contracts, and the q318 compound
  * plant on the real corpus.
  */
class SeasonalDecomposeSpec extends SparkSpec {

  private def series(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("b", LongType),
      StructField("y", LongType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  private def sd(period: Int, rows: (String, Long, Long)*) =
    Drift.seasonalDecompose(series(rows: _*), Seq("g"), col("b"),
      col("y"), period)

  test("exact recovery: linear trend + pure period-3 pattern " +
      "decomposes with zero residual in the interior") {
    // y = 100*b + s(b%3) with s = {0, 30, -30}: MA-3 of y at b is
    // 100*b exactly (the seasonal sums to 0 over any full period)
    val s = Map(0L -> 0L, 1L -> 30L, 2L -> -30L)
    val rows = (0L until 12L).map(b => ("g", b, 100L * b + s(b % 3)))
    val out = sd(3, rows: _*).orderBy("bucket").collect()
    out.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) == 100L * r.getLong(1), "trend off")
      assert(r.getLong(5) == 0L, s"residual ${r.getLong(5)} != 0")
      assert(r.getLong(4) == s(r.getLong(1) % 3L))
    }
    // edges (first and last bucket) have no centered window
    assert(out.head.isNullAt(3) && out.last.isNullAt(3))
  }

  test("additive identity: value = trend + seasonal + residual " +
      "wherever all three are defined") {
    val rows = (0L until 20L).map(b =>
      ("g", b, 1000L + 7L * b + (b % 7L) * 13L + (b * b % 5L)))
    val out = sd(7, rows: _*).collect()
    out.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(2) ==
        r.getLong(3) + r.getLong(4) + r.getLong(5))
    }
  }

  test("a gap in the series nulls the trend across the broken " +
      "window (consecutive-span guard, not just row count)") {
    val rows = ((0L until 10L) ++ (13L until 23L))
      .map(b => ("g", b, 100L))
    val out = sd(3, rows: _*).collect()
      .map(r => r.getLong(1) -> r.isNullAt(3)).toMap
    // bucket 9's window is {8,9,13}: 3 rows but span 5 -> null
    assert(out(9L), "gapped window must null the trend")
    assert(!out(8L), "intact interior window must keep its trend")
  }

  test("even periods are rejected (centered window needs symmetry)") {
    intercept[IllegalArgumentException] {
      sd(4, ("g", 0L, 1L))
    }
  }

  test("q318 on the real corpus: view's phase-5 seasonal cell " +
      "dominates every other phase, and clean types carry no " +
      "comparable spike") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .seasonalDecomposeQ(spark, "/root/testdata/sf0.001").collect()
      val view = rows.filter(r =>
        r.getString(0) == "view" && !r.isNullAt(4))
      val byPhase = view.groupBy(_.getLong(1) % 7L)
        .mapValues(_.head.getLong(4))
      val spike = byPhase(5L)
      byPhase.filterKeys(_ != 5L).values.foreach { v =>
        assert(spike > v + (spike.abs / 2L).max(1L),
          s"phase-5 $spike should dominate $v")
      }
      rows.filter(!_.isNullAt(2)).foreach { r =>
        if (!r.isNullAt(3))
          assert(r.getLong(2) ==
            r.getLong(3) + r.getLong(4) + r.getLong(5))
      }
    }
  }
}
