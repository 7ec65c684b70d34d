package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.conformalCoverage]] — closed-form q̂ selection, the
  * finite-sample k (NOT the naive quantile), degenerate small
  * calibrations, and the coverage direction.
  */
class ConformalSpec extends SparkSpec {

  import spark.implicits._

  private def df(vals: Seq[Long], g: String = "g") =
    vals.map((g, _)).toDF("g", "v")

  test("closed-form q_hat: the ceil((n+1)(1-alpha)) smallest " +
      "residual, not the naive quantile") {
    // calibration 1..10 → pred = 55 div 10 = 5; residuals sorted:
    // 0,1,1,2,2,3,3,4,4,5; n=10, alpha=0.1 → k = ceil(11·0.9) = 10
    // → q_hat = the 10th smallest = 5 (naive p90 would give 4)
    val out = Analytics.conformalCoverage(
      df((1L to 10L)), df(Seq(3L, 11L)), col("v"), Seq("g"))
      .collect()(0)
    assert(out.getAs[Long]("n_cal") === 10L)
    assert(out.getAs[Long]("pred") === 5L)
    assert(out.getAs[Long]("q_hat") === 5L)
    // test residuals |3−5|=2 ≤ 5 and |11−5|=6 > 5 → coverage 0.5
    assert(out.getAs[Double]("coverage") === 0.5)
    assert(out.getAs[Int]("degenerate") === 0)
  }

  test("a small calibration set is degenerate (infinite band), " +
      "not silently clamped") {
    // n=2 → k = ceil(3·0.9) = 3 > 2
    val out = Analytics.conformalCoverage(
      df(Seq(1L, 2L)), df(Seq(1L)), col("v"), Seq("g"))
      .collect()(0)
    assert(out.getAs[Int]("degenerate") === 1)
    assert(out.isNullAt(out.fieldIndex("q_hat")))
    assert(out.isNullAt(out.fieldIndex("coverage")))
  }

  test("coverage meets the guarantee on an exchangeable split and " +
      "alpha widens monotonically") {
    val vals = (1L to 200L).map(i => (i * 7919) % 1000)
    val cal = df(vals.zipWithIndex.filter(_._2 % 2 == 0).map(_._1))
    val tst = df(vals.zipWithIndex.filter(_._2 % 2 == 1).map(_._1))
    val at10 = Analytics.conformalCoverage(cal, tst, col("v"),
      Seq("g"), alphaMilli = 100).collect()(0)
    assert(at10.getAs[Double]("coverage") >= 0.85) // ≥ 1−α − slack
    val at50 = Analytics.conformalCoverage(cal, tst, col("v"),
      Seq("g"), alphaMilli = 500).collect()(0)
    assert(at50.getAs[Long]("q_hat") < at10.getAs[Long]("q_hat"))
    assert(at50.getAs[Double]("coverage") <=
      at10.getAs[Double]("coverage"))
  }

  test("groups are independent and test-only groups are absent") {
    val cal = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L),
      ("a", 50L), ("a", 60L), ("a", 70L), ("a", 80L), ("a", 90L),
      ("b", 5L), ("b", 6L), ("b", 7L), ("b", 8L), ("b", 9L),
      ("b", 10L), ("b", 11L), ("b", 12L), ("b", 13L))
      .toDF("g", "v")
    val tst = Seq(("a", 50L), ("b", 9L), ("c", 1L)).toDF("g", "v")
    val out = Analytics.conformalCoverage(cal, tst, col("v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("a", "b"))
    // b's residual spread is far tighter than a's
    assert(out("b").getAs[Long]("q_hat") < out("a").getAs[Long]("q_hat"))
    assert(out("a").getAs[Double]("coverage") === 1.0)
  }
}
