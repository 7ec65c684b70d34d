package graft.quality

import graft.SparkSpec
import graft.registry.AnalyticsRegistry
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.functions._

/** The composed drift panel (q277): each statistic equals its
  * standalone test, and the plan proves all three read ONE shared
  * per-(group, value) count pass.
  */
class DriftPanelSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def flatTree(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => flatTree(a.executedPlan)
    case q: QueryStageExec => q +: flatTree(q.plan)
    case c: InMemoryTableScanExec =>
      c +: flatTree(c.relation.cachedPlan)
    case other => Seq(other)
  }.flatten

  test("panel columns equal the standalone KS / CvM / MW tests on the " +
      "same split") {
    graft.core.CacheScope.withScope {
      val panel = AnalyticsRegistry.driftPanelQ(spark, sfDir)
        .collect().map(r => r.getString(0) -> r).toMap
      // q261 is the SAME split and shift as the panel; q164 uses a
      // weaker (x1.05) shift, so recompute KS at x1.10 directly
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val base = o.where(col("o_orderkey") % 2 === 1)
      val cur = o.where(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice",
          when(col("o_orderpriority") === "1-URGENT",
            col("o_totalprice") * 1.10).otherwise(col("o_totalprice")))
      val ks = Drift.ksTest(base, cur, "o_totalprice",
        Seq("o_orderpriority")).collect()
        .map(r => r.getString(0) -> r).toMap
      val cvm = Drift.cvmTest(base, cur, "o_totalprice",
        Seq("o_orderpriority")).collect()
        .map(r => r.getString(0) -> r).toMap
      val mw = Drift.mannWhitneyU(base, cur, "o_totalprice",
        Seq("o_orderpriority")).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(panel.keySet == ks.keySet)
      panel.foreach { case (g, p) =>
        assert(p.getLong(1) == ks(g).getLong(1), s"$g n_base")
        assert(p.getDouble(3) ==
          BigDecimal(ks(g).getDouble(4)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble, s"$g ks_d")
        assert((p.getInt(4) == 1) == ks(g).getBoolean(6), s"$g ks flag")
        assert(p.getDouble(5) == cvm(g).getDouble(3), s"$g cvm_t")
        assert((p.getInt(6) == 1) == cvm(g).getBoolean(4), s"$g cvm flag")
        assert(p.getDouble(7) == mw(g).getDouble(5), s"$g mw_z")
        assert((p.getInt(8) == 1) == mw(g).getBoolean(6), s"$g mw flag")
      }
      // (whether the planted shift crosses each test's significance
      // threshold is SF-dependent and owned by the q164/q261/q237
      // specs — the panel's contract is statistic equality)
    }
  }

  test("plan: ONE shared count pass — the three test legs all read " +
      "the same cached per-(group, value) frame, and orders is " +
      "scanned exactly twice (base leg + current leg) inside it") {
    graft.core.CacheScope.withScope {
      val out = AnalyticsRegistry.driftPanelQ(spark, sfDir)
      assert(out.count() > 0)
      val nodes = flatTree(out.queryExecution.executedPlan)
      val perScans = nodes.collect {
        case c: InMemoryTableScanExec
            if c.relation.cachedPlan.schema.fieldNames
              .contains("__cb") => c
      }
      assert(perScans.size == 3,
        s"expected 3 reads of the shared count frame, got ${perScans.size}")
      assert(perScans.map(c =>
        System.identityHashCode(c.relation.cachedPlan)).toSet.size == 1,
        "the test legs read DIFFERENT cached count frames")
      val fileScans = nodes
        .collect { case f: FileSourceScanExec => f }
        .map(System.identityHashCode).toSet
      assert(fileScans.size == 2,
        s"orders scanned ${fileScans.size} times (expected 2: " +
          "base + current legs of the one shared pass)")
    }
  }
}
