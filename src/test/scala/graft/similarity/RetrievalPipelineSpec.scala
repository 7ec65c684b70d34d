package graft.similarity

import graft.SparkSpec
import graft.registry.SimilarityRegistry
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** The composed retrieval pipeline (q175): end-to-end behavior plus
  * the scan-count pin that proves the chunk frame is built once.
  */
class RetrievalPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def flatTree(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => flatTree(a.executedPlan)
    case q: QueryStageExec => q +: flatTree(q.plan)
    case c: InMemoryTableScanExec =>
      c +: flatTree(c.relation.cachedPlan)
    case other => Seq(other)
  }.flatten

  test("per-query MMR invariants hold end to end: five ranks, rank 1 " +
      "is the relevance leader, objective non-increasing, diverse " +
      "documents in every answer set") {
    graft.core.CacheScope.withScope {
      val rows = SimilarityRegistry.retrievalPipelineQ(spark, sfDir)
        .collect()
      val byQuery = rows.groupBy(_.getLong(0))
      assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
      byQuery.foreach { case (q, rs) =>
        val sorted = rs.sortBy(_.getInt(1))
        assert(sorted.map(_.getInt(1)).toSeq === (1 to 5),
          s"query $q ranks")
        // round 1 maximizes 0.7·rel with mc = 0: its rel bounds every
        // later pick's rel
        assert(sorted.head.getDouble(5) ===
          rs.map(_.getDouble(5)).max, s"query $q rank-1 rel")
        // the selection objective can only fall: pools shrink and the
        // max-cos penalty only grows
        val objs = sorted.map(_.getLong(6))
        assert(objs.zip(objs.tail).forall { case (a, b) => b <= a },
          s"query $q objective not monotone: ${objs.mkString(",")}")
        // MMR's purpose: the answer set spans documents, it is not one
        // document's chunk list (the corpus plants near-duplicates, so
        // pure relevance WOULD crowd; note the own-doc chunk may
        // legitimately be demoted behind its planted near-dup)
        assert(rs.map(_.getLong(3)).distinct.length >= 3,
          s"query $q answers collapsed onto too few docs")
        // surrogate key decomposes consistently
        rs.foreach { r =>
          assert(r.getLong(2) ===
            (r.getLong(3) + 1) * 1000 + r.getInt(4))
        }
      }
    }
  }

  test("plan: the documents parquet is scanned exactly twice in the " +
      "whole candidate chain — once into the persisted chunk frame " +
      "every stage shares (dense train/index, BM25, vector join), " +
      "once for the pruned query leg — never re-executed per stage") {
    graft.core.CacheScope.withScope {
      // the candidate stage is the last point before mmrRerankByQuery
      // truncates lineage with localCheckpoint, so every upstream scan
      // is still visible in its executed plan
      val out = SimilarityRegistry.retrievalCandidates(spark, sfDir)
      assert(out.count() > 0)
      val scans = flatTree(out.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty, "expected parquet scans")
      val distinct = scans.map(System.identityHashCode).toSet
      assert(distinct.size == 2,
        s"retrieval candidates scan documents ${distinct.size} times " +
          "(expected 2: shared chunk frame + query leg)")
    }
  }
}
