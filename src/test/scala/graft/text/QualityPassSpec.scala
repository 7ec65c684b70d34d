package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[TextAnalysis.qualityPass]] — the fused single-scan corpus-prep
  * pass (collapse + repetition signals + self-trained LM score).
  */
class QualityPassSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("text", StringType)))

  private def docs(rows: (Int, String)*) =
    df(schema, rows.map { case (i, t) => Row(i, t) })

  private def assertParity(d: org.apache.spark.sql.DataFrame): Unit =
    graft.core.CacheScope.withScope {
      val fused = TextAnalysis.qualityPass(d, "id", "text")
      val want = TextAnalysis.collapseRepeats(d, "id", "text")
        .join(TextAnalysis.repetitionSignals(d, "id", "text"),
          Seq("id"), "left")
        .join(TextAnalysis.unigramLmScoreSelf(d, "id", "text")
          .select(col("id"), col("lm_score")), Seq("id"), "left")
      def m(x: org.apache.spark.sql.DataFrame) = x.collect().map { r =>
        r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]),
          Option(r.get(7)).map(_.asInstanceOf[Double]))
      }.toMap
      val (fm, wm) = (m(fused.select("id", "text", "n_tokens",
        "n_removed", "n_bigrams", "dup_bigram_frac", "top_bigram_frac",
        "lm_score")), m(want.select("id", "text", "n_tokens",
        "n_removed", "n_bigrams", "dup_bigram_frac", "top_bigram_frac",
        "lm_score")))
      assert(fm.keySet == wm.keySet)
      fm.foreach { case (id, f) =>
        val w = wm(id)
        assert(f._1 == w._1 && f._2 == w._2 && f._3 == w._3 &&
          f._4 == w._4 && f._5 == w._5 && f._6 == w._6, s"id $id")
        (f._7, w._7) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"lm_score id $id: $a vs $b")
          case (a, b) => assert(a == b, s"lm_score id $id")
        }
      }
    }

  test("fused pass equals collapseRepeats ⋈ repetitionSignals ⋈ " +
      "unigramLmScoreSelf column-for-column, including null/short-doc " +
      "edges") {
    assertParity(docs(
      (1, "the cat cat cat sat on the mat the cat sat again"),
      (2, "spark spark spark spark spark"),
      (3, "word"),         // 1 token: no bigrams, has lm_score
      (4, ""),             // 0 tokens: null lm_score
      (5, null),           // null text
      (6, "alpha beta alpha beta alpha beta gamma")))
  }

  test("fused pass matches the three separate operators on the real " +
      "documents table") {
    assertParity(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("int").as("id"), col("text")))
  }

  test("withBigramLm adds bigramLmScoreSelf's score as a fourth fused " +
      "column and leaves the original three signals untouched") {
    graft.core.CacheScope.withScope {
      val d = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("int").as("id"), col("text"))
      val full = TextAnalysis.qualityPass(d, "id", "text",
        withBigramLm = true)
      assert(full.columns.last == "bigram_lm_score")
      // base columns: byte-equal to the three-signal pass
      val base = TextAnalysis.qualityPass(d, "id", "text")
      def m(x: org.apache.spark.sql.DataFrame) =
        x.select("id", "text", "n_tokens", "n_removed", "n_bigrams",
            "dup_bigram_frac", "top_bigram_frac")
          .collect().map(r => r.getInt(0) -> r.toSeq.tail).toMap
      assert(m(full) == m(base))
      // fourth column: bigramLmScoreSelf row-for-row (1e-9 — the only
      // divergence channel is per-doc float summation order)
      val want = TextAnalysis.bigramLmScoreSelf(d, "id", "text")
        .collect()
        .map(r => r.getInt(0) ->
          Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
      val got = full.collect()
        .map(r => r.getInt(0) ->
          Option(r.get(8)).map(_.asInstanceOf[Double])).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, g) =>
        (g, want(id)) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"id $id: $a vs $b")
          case (a, b) => assert(a == b, s"id $id")
        }
      }
    }
  }

  test("plan: ONE scan of the documents parquet feeds the whole fused " +
      "pass — collapse, repetition signals, and the self-trained LM " +
      "all hang off the same cached tokenization (bigram leg included)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def flatTree(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => flatTree(a.executedPlan)
      case q: QueryStageExec => q +: flatTree(q.plan)
      case c: InMemoryTableScanExec =>
        c +: flatTree(c.relation.cachedPlan)
      case other => Seq(other)
    }.flatten
    def assertOneScan(withBigram: Boolean): Unit =
      graft.core.CacheScope.withScope {
        val d = spark.read
          .parquet("/root/testdata/sf0.001/documents.parquet")
          .select(col("doc_id").as("id"), col("text"))
        val out = TextAnalysis.qualityPass(d, "id", "text",
          withBigramLm = withBigram)
        assert(out.count() > 0)
        val scans = flatTree(out.queryExecution.executedPlan)
          .collect { case f: FileSourceScanExec => f }
        assert(scans.nonEmpty, "expected a parquet scan")
        // several cached consumers reach the SAME scan instance;
        // distinct identities count physical scans of the table
        val distinctScans = scans.map(System.identityHashCode).toSet
        assert(distinctScans.size == 1,
          s"fused pass (bigram=$withBigram) scans documents " +
            s"${distinctScans.size} times")
      }
    assertOneScan(withBigram = false)
    assertOneScan(withBigram = true)
  }
}
