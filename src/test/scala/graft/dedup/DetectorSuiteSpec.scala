package graft.dedup

import graft.SparkSpec
import graft.registry.DedupRegistry
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** The composed detector-audit suite (q363): every audit leg must
  * equal its standalone query (q280/q282/q284/q303/q311), and the
  * plan must prove the expensive generators ran once — ONE shingle
  * scan, ONE signature build, one cached three-flag frame feeding
  * all five legs.
  */
class DetectorSuiteSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def flatTree(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => flatTree(a.executedPlan)
    case q: QueryStageExec => q +: flatTree(q.plan)
    case c: InMemoryTableScanExec =>
      c +: flatTree(c.relation.cachedPlan)
    case other => Seq(other)
  }.flatten

  private def identityDistinct[A <: AnyRef](xs: Seq[A]): Seq[A] =
    xs.foldLeft(Vector.empty[A]) { (acc, x) =>
      if (acc.exists(_ eq x)) acc else acc :+ x
    }

  /** Suite rows keyed (report, key_a, key_b) → (n, metric). */
  private def suiteMap(rows: Seq[Row])
      : Map[(String, String, String), (Option[Long], Option[Double])] =
    rows.map { r =>
      (r.getString(0), r.getString(1), r.getString(2)) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))),
         (if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    }.toMap

  test("every melted leg equals its standalone audit: q280 capture–" +
      "recapture, q282 queue, q284 McNemar, q303 Cochran's Q, " +
      "q311 Fleiss' κ") {
    graft.core.CacheScope.withScope {
      val out = suiteMap(
        DedupRegistry.detectorAuditSuiteQ(spark, sfDir).collect().toSeq)

      val cap = DedupRegistry.dedupCaptureRecaptureQ(spark, sfDir)
        .collect()(0)
      for (c <- Seq("n_minhash", "n_simhash", "n_overlap",
          "chapman_total"))
        assert(out(("capture_recapture", c, ""))._1
          === Some(cap.getAs[Long](c)), c)
      for (c <- Seq("recall_minhash", "recall_simhash"))
        assert(out(("capture_recapture", c, ""))._2
          === Some(cap.getAs[Double](c)), c)

      val queue = DedupRegistry.detectorDisagreementQ(spark, sfDir)
        .collect().toSeq
      val queueRows = out.filter(_._1._1 == "queue")
      assert(queueRows.size === queue.size)
      queue.foreach { r =>
        val key = ("queue", r.getString(0),
          s"${r.getLong(1)}:${r.getLong(2)}")
        val (n, m) = out(key)
        assert(m === (if (r.isNullAt(3)) None
          else Some(r.getDouble(3))), s"$key jaccard")
        assert(n === (if (r.isNullAt(4)) None
          else Some(r.getInt(4).toLong)), s"$key hamming")
      }

      val mc = DedupRegistry.mcnemarDetectorsQ(spark, sfDir)
        .collect()(0)
      for (c <- Seq("n_both", "n_minhash_only", "n_simhash_only"))
        assert(out(("mcnemar", c, ""))._1 === Some(mc.getAs[Long](c)), c)
      assert(out(("mcnemar", "differs", ""))._1
        === Some(mc.getAs[Int]("differs").toLong))
      for (c <- Seq("chi2", "chi2_cc"))
        assert(out(("mcnemar", c, ""))._2 === (if (mc.isNullAt(
          mc.fieldIndex(c))) None else Some(mc.getAs[Double](c))), c)

      val cq = DedupRegistry.cochranQDetectorsQ(spark, sfDir)
        .collect()(0)
      for (c <- Seq("n_items", "g_by_minhash", "g_by_simhash",
          "g_by_bbit"))
        assert(out(("cochran_q", c, ""))._1
          === Some(cq.getAs[Long](c)), c)
      assert(out(("cochran_q", "dof", ""))._1
        === Some(cq.getAs[Int]("dof").toLong))
      assert(out(("cochran_q", "differs", ""))._1
        === Some(cq.getAs[Int]("differs").toLong))
      assert(out(("cochran_q", "q", ""))._2 === (if (cq.isNullAt(
        cq.fieldIndex("q"))) None else Some(cq.getAs[Double]("q"))))

      val fk = DedupRegistry.fleissKappaDetectorsQ(spark, sfDir)
        .collect()(0)
      assert(out(("fleiss_kappa", "n_items", ""))._1
        === Some(fk.getAs[Long]("n_items")))
      assert(out(("fleiss_kappa", "n_raters", ""))._1
        === Some(fk.getAs[Int]("n_raters").toLong))
      assert(out(("fleiss_kappa", "substantial", ""))._1
        === Some(fk.getAs[Int]("substantial").toLong))
      for (c <- Seq("p_flag", "p_bar", "p_e", "kappa"))
        assert(out(("fleiss_kappa", c, ""))._2 === (if (fk.isNullAt(
          fk.fieldIndex(c))) None else Some(fk.getAs[Double](c))), c)
    }
  }

  test("plan: ONE shingle scan and ONE signature build — two text " +
      "scans total (shingle + simhash token), one cached signature " +
      "plan, one cached flags plan feeding all five legs") {
    graft.core.CacheScope.withScope {
      val out = DedupRegistry.detectorAuditSuiteQ(spark, sfDir)
      assert(out.count() > 0)
      val nodes = flatTree(out.queryExecution.executedPlan)

      // the only text-bearing file scans anywhere in the tree
      // (recursing through every cache) are the ONE shingle scan and
      // the ONE simhash token scan — identity-distinct, because the
      // same cached plan visited from many readers is the same scan
      val textScans = identityDistinct(nodes.collect {
        case f: FileSourceScanExec
            if f.schema.fieldNames.contains("text") => f
      })
      assert(textScans.size == 2,
        s"expected 2 distinct text scans (shingle + simhash token), " +
          s"got ${textScans.size}")

      // ONE signature build: every cached-signature read shares one
      // physical cached plan (banding + both b-bit legs)
      val sigScans = nodes.collect {
        case c: InMemoryTableScanExec
            if c.relation.cachedPlan.schema.fieldNames.toSeq ==
              ("doc_id" +: (0 until 16).map(i => s"h$i")) => c
      }
      assert(sigScans.nonEmpty, "no cached signature reads found")
      assert(sigScans.map(c =>
          System.identityHashCode(c.relation.cachedPlan)).toSet.size
          == 1,
        "signature reads hit DIFFERENT cached plans — the signature " +
          "build is not shared")

      // one cached flags frame feeds all five audit legs
      val flagsSchema = Seq("id_a", "id_b", "__j", "__h",
        "by_minhash", "by_simhash", "by_bbit")
      val flagScans = nodes.collect {
        case c: InMemoryTableScanExec
            if c.relation.cachedPlan.schema.fieldNames.toSeq ==
              flagsSchema => c
      }
      assert(flagScans.size >= 5,
        s"expected >= 5 flags-cache reads (one per audit leg), " +
          s"got ${flagScans.size}")
      assert(flagScans.map(c =>
          System.identityHashCode(c.relation.cachedPlan)).toSet.size
          == 1,
        "audit legs read DIFFERENT cached flags plans")
    }
  }
}
