package graft.dedup

import graft.SparkSpec
import graft.registry.DedupRegistry
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.functions._

/** The composed near-dup monitor suite (q273): the three standing
  * reports must equal their standalone counterparts, and the plan must
  * prove the LSH band→verify pass ran once — one cached verified-pairs
  * plan feeding every report leg.
  */
class MonitorSuiteSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def flatTree(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => flatTree(a.executedPlan)
    case q: QueryStageExec => q +: flatTree(q.plan)
    case c: InMemoryTableScanExec =>
      c +: flatTree(c.relation.cachedPlan)
    case other => Seq(other)
  }.flatten

  test("each report leg equals its standalone query: histogram = q83, " +
      "matrix = q267 minus the max column, curve = q24 pairs bucketed") {
    graft.core.CacheScope.withScope {
      val out = DedupRegistry.dedupMonitorSuiteQ(spark, sfDir)
        .collect().toSeq.groupBy(_.getString(0))

      val hist = DedupRegistry.nearDupClusterHistogram(spark, sfDir)
        .collect().map(r => Row("cluster_histogram",
          r.getLong(0).toString, "", r.getLong(1),
          r.getLong(3).toDouble)).toSeq
      assert(out.getOrElse("cluster_histogram", Nil) === hist)

      val mat = DedupRegistry.sourceDupMatrixQ(spark, sfDir)
        .collect().map(r => Row("source_matrix",
          r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(out.getOrElse("source_matrix", Nil) === mat)

      val pairs = Dedup.minhashLshPairs(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", n = 3, numHashes = 16, bands = 4,
        threshold = 0.8)
      val curve = pairs
        .select(col("id_b"), col("jaccard"),
          explode(sequence(lit(80), lit(95), lit(5))).as("t"))
        .where(col("jaccard") >= col("t").cast("double") / 100.0)
        .groupBy("t")
        .agg(count(lit(1)).as("n"), countDistinct(col("id_b")).as("f"))
        .orderBy("t").collect()
        .map(r => Row("threshold_curve", r.getInt(0).toString, "",
          r.getLong(1), r.getLong(2).toDouble)).toSeq
      // string sort on t_centi: "80" < "85" < "90" < "95" — int order
      assert(out.getOrElse("threshold_curve", Nil) === curve)
    }
  }

  test("plan: ONE banding pass — every InMemoryTableScan of the " +
      "verified-pairs schema shares a single cached plan, and the " +
      "report legs add only the two pruned source-label scans") {
    graft.core.CacheScope.withScope {
      val out = DedupRegistry.dedupMonitorSuiteQ(spark, sfDir)
      assert(out.count() > 0)
      val nodes = flatTree(out.queryExecution.executedPlan)
      val pairScans = nodes.collect {
        case c: InMemoryTableScanExec
            if c.relation.cachedPlan.schema.fieldNames.toSeq ==
              Seq("id_a", "id_b", "jaccard") => c
      }
      // matrix leg + curve leg both read the pairs frame (the
      // histogram leg reads the CC labels, lineage-truncated)
      assert(pairScans.size == 2,
        s"expected 2 pairs-cache reads, got ${pairScans.size}")
      val cachedPlans = pairScans
        .map(c => System.identityHashCode(c.relation.cachedPlan)).toSet
      assert(cachedPlans.size == 1,
        "the report legs read DIFFERENT cached pairs plans — the " +
          "banding pass is not shared")
      // the only documents scans OUTSIDE the shared cached chain are
      // the two (doc_id, source) label joins; everything text-shaped
      // lives inside the one cached pass
      val outerScans = flatTree(out.queryExecution.executedPlan)
        .takeWhile(_ => true) // full tree, identity-deduped below
        .collect { case f: FileSourceScanExec => f }
      val outside = outerScans.filterNot(f =>
        flatTree(pairScans.head.relation.cachedPlan)
          .exists(_ eq f))
      val pruned = outside.map(_.schema.fieldNames.toSeq).distinct
      assert(pruned == Seq(Seq("doc_id", "source")),
        s"unexpected uncached scans: $pruned — a report leg is " +
          "re-reading document text outside the shared pass")
    }
  }
}
