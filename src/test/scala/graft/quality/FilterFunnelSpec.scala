package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Filter-cascade ablation ([[Funnel.filterFunnel]]). */
class FilterFunnelSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("len", IntegerType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  // flags per row for (len >= 10, score >= 0.5):
  //   r1: (T, T)  survives everything
  //   r2: (F, T)  fails only len
  //   r3: (T, F)  fails only score
  //   r4: (F, F)  fails both
  //   r5: (null, T) -> null predicate counts as REJECTED (fails len)
  private def rows = df(schema, Seq(
    Row(1, 20, 0.9: java.lang.Double),
    Row(2, 5, 0.8: java.lang.Double),
    Row(3, 15, 0.1: java.lang.Double),
    Row(4, 3, 0.2: java.lang.Double),
    Row(5, null, 0.7: java.lang.Double)))

  private def funnel = Funnel.filterFunnel(rows, Seq(
    "min_len" -> (col("len") >= 10),
    "min_score" -> (col("score") >= 0.5)))

  test("cascade counts: n_in chains through survivors, n_out of the " +
      "last stage is the surviving corpus") {
    val out = funnel.orderBy("stage").collect()
    assert(out.map(_.getAs[String]("filter")).toSeq ==
      Seq("min_len", "min_score"))
    val s1 = out(0)
    assert(s1.getAs[Long]("n_in") == 5L)
    assert(s1.getAs[Long]("n_rejected") == 3L) // r2, r4, r5(null)
    assert(s1.getAs[Long]("n_out") == 2L)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_in") == 2L) // r1, r3 reached stage 2
    assert(s2.getAs[Long]("n_rejected") == 1L) // r3
    assert(s2.getAs[Long]("n_out") == 1L) // r1 survives all
    assert(s2.getAs[Double]("reject_frac") == 0.5)
  }

  test("sole-reject counts rows failing ONLY that filter — the " +
      "filter's marginal value, cascade-order-independent") {
    val out = funnel.orderBy("stage").collect()
    // only-len failures: r2, r5; only-score: r3 (r4 fails both)
    assert(out(0).getAs[Long]("n_sole_reject") == 2L)
    assert(out(1).getAs[Long]("n_sole_reject") == 1L)
  }

  test("a fully shadowed filter reports n_sole_reject 0") {
    val out = Funnel.filterFunnel(rows, Seq(
        "strict" -> (col("len") >= 10),
        "loose" -> (col("len") >= 5))) // rejects only a subset
      .orderBy("stage").collect()
    assert(out(1).getAs[Long]("n_sole_reject") == 0L)
  }

  test("empty input yields zero counts and null reject_frac, not " +
      "nulls or a crash") {
    val out = Funnel.filterFunnel(rows.where(lit(false)), Seq(
        "any" -> (col("len") >= 0))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_in") == 0L)
    assert(out.head.getAs[Long]("n_rejected") == 0L)
    assert(out.head.isNullAt(out.head.fieldIndex("reject_frac")))
  }

  test("plan shape: one scan, no join — the k-stage funnel never " +
      "re-reads the corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("funnel_spec").toString
    try {
      rows.write.mode("overwrite").parquet(dir)
      val onDisk = spark.read.parquet(dir)
      val plan = Funnel.filterFunnel(onDisk, Seq(
          "a" -> (col("len") >= 10),
          "b" -> (col("score") >= 0.5),
          "c" -> (col("len") >= 0)))
        .queryExecution.executedPlan.toString
      assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
      assert(!plan.contains("Join"), plan)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
