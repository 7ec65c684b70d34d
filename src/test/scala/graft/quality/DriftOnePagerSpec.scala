package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Drift.driftOnePager]] — every axis of the one-pager must equal
  * its STANDALONE operator on the same data (the composition derives
  * from one shared count frame; this pins that the derivation is the
  * same math), plus the three-plant flag matrix on the real corpus
  * (q299).
  */
class DriftOnePagerSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  private val baseRows: Seq[(String, Long)] =
    (1 to 40).map(i => ("g", 100L + (i % 13) * 7L)) ++
      (1 to 30).map(i => ("h", 50L + (i % 7) * 11L))
  private val curRows: Seq[(String, Long)] =
    (1 to 35).map(i => ("g", 130L + (i % 11) * 9L)) ++
      (1 to 18).map(i => ("h", 48L + (i % 9) * 13L))

  test("each axis equals its standalone operator on the same data — " +
      "the shared-frame derivation is the same math") {
    graft.core.CacheScope.withScope {
      val b = side(baseRows: _*); val c = side(curRows: _*)
      val page = Drift.driftOnePager(b, c, col("x"), Seq("g"))
        .collect().map(r => r.getString(0) -> r).toMap
      val panel = Drift.driftPanel(b, c, "x", Seq("g"))
        .collect().map(r => r.getString(0) -> r).toMap
      val eff = Drift.cohensD(b, c, col("x"), Seq("g"))
        .collect().map(r => r.getString(0) -> r).toMap
      val bf = Drift.brownForsythe(b, c, col("x"), Seq("g"))
        .collect().map(r => r.getString(0) -> r).toMap
      val rate = Drift.rateRatio(b, c, Seq("g"))
        .collect().map(r => r.getString(0) -> r).toMap
      Seq("g", "h").foreach { k =>
        val p = page(k)
        // panel: ks_d, cvm_t, mw_z (panel emits them unrounded;
        // one-pager rounds to 6)
        def r6(v: Double) = BigDecimal(v)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(p.getAs[Double]("ks_d") ==
          r6(panel(k).getAs[Double]("ks_d")), s"$k ks")
        assert(p.getAs[Double]("cvm_t") ==
          r6(panel(k).getAs[Double]("cvm_t")), s"$k cvm")
        assert(p.getAs[Double]("mw_z") ==
          panel(k).getAs[Double]("mw_z"), s"$k mw")
        assert(p.getAs[Double]("d") == eff(k).getAs[Double]("d"),
          s"$k d")
        assert(p.getAs[Double]("bf_f") == bf(k).getAs[Double]("f"),
          s"$k bf")
        assert(p.getAs[Double]("rate_z") ==
          rate(k).getAs[Double]("z"), s"$k rate")
      }
    }
  }

  test("the standing-store path equals the raw path row-for-row: " +
      "shard-merged counts are the same sufficient statistic " +
      "(q301's contract)") {
    graft.core.CacheScope.withScope {
      import org.apache.spark.sql.functions.{count => cnt, lit, sum}
      val b = side(baseRows: _*); val c = side(curRows: _*)
      val raw = Drift.driftOnePager(b, c, col("x"), Seq("g"))
        .orderBy("g").collect().toSeq
      val bc = b.groupBy("g", "x").agg(cnt(lit(1)).as("n"))
      // current side as two arbitrary shard halves, merged additively
      val s1 = c.where(col("x") % 2 === 0)
        .groupBy("g", "x").agg(cnt(lit(1)).as("n"))
      val s2 = c.where(col("x") % 2 === 1)
        .groupBy("g", "x").agg(cnt(lit(1)).as("n"))
      val cc = s1.unionByName(s2).groupBy("g", "x")
        .agg(sum(col("n")).as("n"))
      val store = Drift.driftOnePagerFromCounts(bc, cc, "x", "n",
        Seq("g")).orderBy("g").collect().toSeq
      assert(store == raw)
    }
  }

  test("q299 on the real corpus (sf0.001): each plant fires exactly " +
      "its own axis — variance (mean-preserved, d stays quiet) on " +
      "2-HIGH, rate-only on 5-LOW, clean rows all-zero") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .driftOnePagerQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      val high = byG("2-HIGH")
      assert(high.getAs[Int]("var_drifted") == 1)
      assert(high.getAs[Int]("d_material") == 0,
        "the widening preserves the mean; d must stay quiet")
      val low = byG("5-LOW")
      assert(low.getAs[Int]("rate_drifted") == 1)
      assert(low.getAs[Int]("var_drifted") == 0 &&
        low.getAs[Int]("ks_drifted") == 0)
      Seq("3-MEDIUM", "4-NOT SPECIFIED").foreach { k =>
        val r = byG(k)
        Seq("ks_drifted", "cvm_drifted", "mw_drifted", "d_material",
          "var_drifted", "rate_drifted").foreach { f =>
          assert(r.getAs[Int](f) == 0, s"$k $f false alarm")
        }
      }
    }
  }
}
