package graft.operators

import graft.SparkSpec
import graft.quality.Privacy
import graft.sampling.Sampling
import org.apache.spark.sql.functions._

/** [[Analytics.weibullFit]], [[Sampling.ratioEstimator]],
  * [[Privacy.tClosenessReport]] — parameter recovery on synthetic
  * Weibull draws, the Cochran ratio-expansion identity, and the
  * ordered-EMD disclosure contract.
  */
class WeibullRatioTclSpec extends SparkSpec {

  import spark.implicits._

  test("weibullFit recovers shape and scale from clean Weibull " +
      "quantile draws") {
    // t_i = η·(−ln(1−u_i))^(1/k) at equally spaced u — exact
    // Weibull(k=2, η=1000) order statistics (integerized)
    val k = 2.0; val eta = 1000.0
    val times = (1 to 200).map { i =>
      val u = (i - 0.5) / 200.0
      ("g", math.round(eta * math.pow(-math.log1p(-u), 1.0 / k)))
    }
    val r = Analytics.weibullFit(times.toDF("g", "t"), Seq("g"),
      col("t")).collect()(0)
    assert(r.getAs[Long]("n_fail") == 200L)
    assert(math.abs(r.getAs[Double]("shape") - k) < 0.1,
      s"shape ${r.getAs[Double]("shape")}")
    assert(math.abs(r.getAs[Double]("scale") - eta) < 30.0,
      s"scale ${r.getAs[Double]("scale")}")
  }

  test("weibullFit: exponential data reads shape ≈ 1; tied times " +
      "don't break the rank fan-out") {
    // every quantile drawn TWICE — 150 distinct times, 300 failures,
    // so each rank block fans out to two consecutive ranks
    val times = (1 to 150).flatMap { i =>
      val u = (i - 0.5) / 150.0
      val t = math.max(1L, math.round(-5000.0 * math.log1p(-u)))
      Seq(("g", t), ("g", t))
    }
    val r = Analytics.weibullFit(times.toDF("g", "t"), Seq("g"),
      col("t")).collect()(0)
    assert(r.getAs[Long]("n_fail") == 300L)
    assert(math.abs(r.getAs[Double]("shape") - 1.0) < 0.15,
      s"shape ${r.getAs[Double]("shape")}")
  }

  test("weibullFit: non-positive times are excluded and tiny " +
      "domains yield nulls") {
    val df = Seq(("g", 0L), ("g", -5L), ("g", 10L), ("g", 10L))
      .toDF("g", "t")
    val r = Analytics.weibullFit(df, Seq("g"), col("t")).collect()(0)
    assert(r.getAs[Long]("n_fail") == 2L)
    assert(r.isNullAt(r.fieldIndex("shape")))
  }

  test("ratioEstimator: on a perfectly proportional y = 3x the " +
      "expansion is exact with zero variance") {
    val rows = (1 to 100).map(i =>
      ("g", i % 5 == 0, i.toLong, 3L * i))
    val r = Sampling.ratioEstimator(rows.toDF("g", "in", "x", "y"),
      Seq("g"), col("in"), col("x"), col("y")).collect()(0)
    assert(r.getAs[Double]("ratio") == 3.0)
    assert(r.getAs[Double]("y_hat") == 3.0 * 5050.0)
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.getAs[Long]("n_pop") == 100L)
    assert(r.getAs[Long]("n_sample") == 20L)
  }

  test("ratioEstimator: noise around the ratio shows up in se, " +
      "and an unsampled group reports nulls") {
    val noisy = (1 to 100).map(i => ("g", i % 4 == 0, i.toLong,
      3L * i + (if (i % 2 == 0) 40L else -40L)))
    val empty = (1 to 10).map(i => ("h", false, i.toLong, 0L))
    val rows = Sampling.ratioEstimator(
      (noisy ++ empty).toDF("g", "in", "x", "y"),
      Seq("g"), col("in"), col("x"), col("y")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("g").getAs[Double]("se") > 0.0)
    assert(rows("h").getAs[Long]("n_sample") == 0L)
    assert(rows("h").isNullAt(rows("h").fieldIndex("ratio")))
  }

  test("tClosenessReport: a class matching the global distribution " +
      "scores 0; a top-bucket-only class scores the max gap and " +
      "violates") {
    // two uniform classes anchor the global; class c concentrates
    // at the top value
    val a = for (v <- 1 to 4; _ <- 1 to 8) yield ("a", v.toLong)
    val b = for (v <- 1 to 4; _ <- 1 to 8) yield ("b", v.toLong)
    val c = Seq.fill(32)(("c", 4L))
    val df = (a ++ b ++ c).toDF("q", "v")
    val rows = Privacy.tClosenessReport(df, Seq("q"), col("v"),
      t = 0.2).collect().map(r => r.getString(0) -> r).toMap
    val emdA = rows("a").getAs[Double]("emd")
    val emdC = rows("c").getAs[Double]("emd")
    assert(emdC > emdA)
    // class c: cum-share gaps 16/96, 32/96, 48/96 vs its 0,0,0
    // -> Σ|gap|/(m−1) = ((512+1024+1536)/(32·96))/3 = 1/3
    assert(math.abs(emdC - 1.0 / 3) < 1e-6)
    // class a: gaps 1/12 cumulative thirds -> 1/6, under the bar
    assert(math.abs(emdA - 1.0 / 6) < 1e-6)
    assert(rows("c").getAs[Int]("violates") == 1)
    assert(rows("a").getAs[Int]("violates") == 0)
  }

  test("tClosenessReport: classes missing middle values still " +
      "accumulate the global share there") {
    // class b has only values {1, 3}: the gap at v=2 must count
    val a = for (v <- 1 to 3; _ <- 1 to 6) yield ("a", v.toLong)
    val b = Seq.fill(6)(("b", 1L)) ++ Seq.fill(6)(("b", 3L))
    val rows = Privacy.tClosenessReport((a ++ b).toDF("q", "v"),
      Seq("q"), col("v"), t = 0.5).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("b").getAs[Double]("emd") > 0.0)
    assert(rows("b").getAs[Long]("class_size") == 12L)
  }
}
