package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.srmCheck]] — the sample-ratio-mismatch gate: exact χ²
  * against the designed allocation, zero-traffic arms participate,
  * and the hand-computed reference matches to the micro digit.
  */
class SrmSpec extends SparkSpec {

  import spark.implicits._

  private val fifty = Seq("0" -> 1L, "1" -> 1L)

  test("a balanced 50/50 split scores ~0 and passes") {
    val df = (1 to 400).map(i => ("g", (i % 2).toString))
      .toDF("g", "arm")
    val rows = Analytics.srmCheck(df, Seq("g"), col("arm"), fifty,
      criticalValue = 3.841).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Double]("srm_chi2") == 0.0))
    assert(rows.forall(!_.getAs[Boolean]("mismatch")))
    assert(rows.forall(_.getAs[Double]("expected_arm") == 200.0))
  }

  test("hand-computed reference: 240 vs 160 on a 50/50 design " +
      "reads χ² = 16 exactly") {
    // (240-200)²/200 + (160-200)²/200 = 8 + 8 = 16
    val df = ((1 to 240).map(_ => ("g", "0")) ++
      (1 to 160).map(_ => ("g", "1"))).toDF("g", "arm")
    val r = Analytics.srmCheck(df, Seq("g"), col("arm"), fifty,
      criticalValue = 3.841).collect()(0)
    assert(r.getAs[Double]("srm_chi2") == 16.0)
    assert(r.getAs[Boolean]("mismatch"))
    assert(r.getAs[Long]("df") == 1L)
  }

  test("a zero-traffic arm still participates — the loudest SRM") {
    val df = (1 to 100).map(_ => ("g", "0")).toDF("g", "arm")
    val rows = Analytics.srmCheck(df, Seq("g"), col("arm"), fifty,
      criticalValue = 3.841).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(rows("1").getAs[Long]("n_arm") == 0L)
    // χ² = (100-50)²/50 + (0-50)²/50 = 100
    assert(rows("1").getAs[Double]("srm_chi2") == 100.0)
    assert(rows("1").getAs[Boolean]("mismatch"))
  }

  test("unequal designed weights: a true 90/10 rollout passes") {
    val df = ((1 to 900).map(_ => ("g", "ctl")) ++
      (1 to 100).map(_ => ("g", "trt"))).toDF("g", "arm")
    val rows = Analytics.srmCheck(df, Seq("g"), col("arm"),
      Seq("ctl" -> 9L, "trt" -> 1L), criticalValue = 3.841).collect()
    assert(rows.forall(_.getAs[Double]("srm_chi2") == 0.0))
    assert(rows.forall(!_.getAs[Boolean]("mismatch")))
  }

  test("undesigned arm labels in the data are ignored, and groups " +
      "are independent") {
    val df = ((1 to 50).map(_ => ("a", "0")) ++
      (1 to 50).map(_ => ("a", "1")) ++
      (1 to 5).map(_ => ("a", "debug")) ++
      (1 to 80).map(_ => ("b", "0")) ++
      (1 to 20).map(_ => ("b", "1"))).toDF("g", "arm")
    val rows = Analytics.srmCheck(df, Seq("g"), col("arm"), fifty,
      criticalValue = 3.841).collect()
    val byG = rows.groupBy(_.getAs[String]("g"))
    assert(byG("a").forall(!_.getAs[Boolean]("mismatch")))
    assert(byG("b").forall(_.getAs[Boolean]("mismatch")))
    assert(rows.forall(_.getAs[String]("arm") != "debug"))
  }
}
