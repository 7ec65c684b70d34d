package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.averagePrecision]] and
  * [[Analytics.thresholdScorecard]] — naive-reference equality for
  * AP (the sklearn step convention, ties collapsed), the
  * rare-positive separation from AUC that motivates it, and the
  * exact-argmax operating-point contract.
  */
class PrCurveSpec extends SparkSpec {

  import spark.implicits._

  private def ap(rows: Seq[(Double, Boolean)]): Double = {
    val df = rows.map { case (s, y) => ("g", s, y) }
      .toDF("g", "s", "y")
    Analytics.averagePrecision(df, "g", col("s"), col("y"))
      .collect()(0).getAs[Double]("avg_precision")
  }

  /** Naive AP over distinct scores descending. */
  private def naive(rows: Seq[(Double, Boolean)]): Double = {
    val p = rows.count(_._2)
    val byScore = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var tp = 0L; var fp = 0L; var s = BigDecimal(0)
    for ((_, grp) <- byScore) {
      val np = grp.count(_._2); val nn = grp.size - np
      tp += np; fp += nn
      // mirror the micro-quantized integral division
      s += BigDecimal((BigInt(np) * tp * 1000000) / (tp + fp))
    }
    (s / 1000000 / p).toDouble
  }

  test("matches the naive step reference, with tied scores") {
    val rows = Seq((0.9, true), (0.8, false), (0.8, true),
      (0.7, true), (0.5, false), (0.5, false), (0.3, true))
    assert(math.abs(ap(rows) - naive(rows)) < 1e-6)
  }

  test("a perfect ranking scores AP = 1; a worst ranking scores " +
      "the tail prevalence") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false),
      (0.1, false))
    assert(ap(perfect) == 1.0)
    val worst = Seq((0.9, false), (0.8, false), (0.2, true),
      (0.1, true))
    assert(ap(worst) < 0.45)
  }

  test("AP separates what AUC blurs: polluted top ranks under " +
      "heavy imbalance") {
    // 2 positives, 98 negatives; model A puts both on top, model B
    // buries them mid-list — AUC still looks decent for B, AP tanks
    val a = Seq((1.0, true), (0.99, true)) ++
      (1 to 98).map(i => (0.9 - i * 0.001, false))
    val b = (1 to 49).map(i => (1.0 - i * 0.001, false)) ++
      Seq((0.5, true), (0.49, true)) ++
      (1 to 49).map(i => (0.4 - i * 0.001, false))
    assert(ap(a) == 1.0)
    assert(ap(b) < 0.05, s"got ${ap(b)}")
  }

  test("thresholdScorecard picks the exact max-F1 and max-J cuts " +
      "with the full confusion matrix") {
    // scores 4,3,2,1 with labels +,+,-,+: F1 by threshold:
    //  t=4: tp1 fp0 fn2 -> f1 = 2/4 = .5
    //  t=3: tp2 fp0 fn1 -> f1 = 4/5 = .8
    //  t=2: tp2 fp1 fn1 -> f1 = 4/6 ≈ .667
    //  t=1: tp3 fp1 fn0 -> f1 = 6/7 ≈ .857  <- max F1
    // J·PN (P=3, N=1): t=3: 2·1+1·3-3 = 2; t=1: 3·1+0·3-3 = 0 -> max J at t=3
    val df = Seq(("g", 4.0, true), ("g", 3.0, true),
      ("g", 2.0, false), ("g", 1.0, true)).toDF("g", "s", "y")
    val rows = Analytics.thresholdScorecard(df, "g", col("s"),
      col("y")).collect()
      .map(r => r.getAs[String]("criterion") -> r).toMap
    val f1 = rows("max_f1")
    assert(f1.getAs[Double]("threshold") == 1.0)
    assert(f1.getAs[Long]("tp") == 3L && f1.getAs[Long]("fp") == 1L)
    assert(math.abs(f1.getAs[Double]("f1") - 6.0 / 7) < 1e-6)
    val j = rows("max_j")
    assert(j.getAs[Double]("threshold") == 3.0)
    assert(math.abs(j.getAs[Double]("youden_j") - 2.0 / 3) < 1e-6)
    assert(math.abs(j.getAs[Double]("recall") - 2.0 / 3) < 1e-6)
  }

  test("scorecard ties break toward the higher threshold, " +
      "deterministically") {
    // two thresholds with identical F1: equal-score steps
    val df = Seq(("g", 2.0, true), ("g", 1.0, false))
      .toDF("g", "s", "y")
    val r = Analytics.thresholdScorecard(df, "g", col("s"), col("y"))
      .collect().map(r => r.getAs[String]("criterion") -> r).toMap
    // max F1 = 1.0 at t=2 only; J also at t=2
    assert(r("max_f1").getAs[Double]("threshold") == 2.0)
    assert(r("max_f1").getAs[Double]("mcc") == 1.0)
  }
}
