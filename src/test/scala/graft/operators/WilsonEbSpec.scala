package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.wilsonRates]] against the closed form, and
  * [[Analytics.ebShrinkRates]] shrinkage direction/magnitude and
  * degenerate-prior fallbacks.
  */
class WilsonEbSpec extends SparkSpec {

  import spark.implicits._

  private def wilson(s: Long, n: Long, z: Double): (Double, Double) = {
    val p = s.toDouble / n
    val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = p + z2 / (2.0 * n)
    val half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    ((center - half) / denom, (center + half) / denom)
  }

  test("wilsonRates matches the closed form; edge rates keep " +
      "non-degenerate width; bounds stay inside [0, 1]") {
    val df = Seq.fill(8)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(5)(("b", true)) ++ // p = 1 edge
      Seq.fill(7)(("c", false)) // p = 0 edge
    val out = Analytics.wilsonRates(df.toDF("g", "ok"), Seq("g"),
        col("ok"), z = 1.96)
      .orderBy("g").collect()
    val a = out(0) // (g, n, successes, rate, wilson_lo, wilson_hi)
    val (lo, hi) = wilson(8, 10, 1.96)
    assert(a.getDouble(3) === 0.8)
    assert(math.abs(a.getDouble(4) - lo) < 1e-6)
    assert(math.abs(a.getDouble(5) - hi) < 1e-6)
    // p = 1: Wald width would be 0; Wilson lower bound is well below 1
    val b = out(1)
    assert(b.getDouble(3) === 1.0 && b.getDouble(4) < 0.9 &&
      b.getDouble(5) <= 1.0)
    val c = out(2)
    assert(c.getDouble(3) === 0.0 && c.getDouble(5) > 0.1 &&
      c.getDouble(4) >= 0.0)
  }

  test("ebShrinkRates pulls small samples toward the prior mean more " +
      "than large ones; ordering between a 2/2 and a 95/100 flips") {
    // many mid-sized groups around 0.5 establish the prior; then one
    // tiny perfect group and one large strong group
    val base = (1 to 20).flatMap { g =>
      Seq.fill(50)((s"g$g", true)) ++ Seq.fill(50)((s"g$g", false))
    }
    val tiny = Seq.fill(2)(("tiny", true))
    val big = Seq.fill(95)(("big", true)) ++ Seq.fill(5)(("big", false))
    val out = Analytics.ebShrinkRates(
        (base ++ tiny ++ big).toDF("g", "ok"), "g", col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val (tinyRaw, tinyShrunk) = out("tiny")
    val (bigRaw, bigShrunk) = out("big")
    assert(tinyRaw === 1.0 && bigRaw === 0.95)
    // raw ranking: tiny wins; shrunk ranking: big wins
    assert(tinyRaw > bigRaw && bigShrunk > tinyShrunk)
    // both shrink TOWARD the prior mean, tiny much harder
    assert(tinyRaw - tinyShrunk > bigRaw - bigShrunk)
  }

  test("degenerate priors yield null shrunk rates and zero strength") {
    // all groups at the same rate -> v = 0 -> no prior
    val df = (1 to 4).flatMap(g =>
      Seq((s"g$g", true), (s"g$g", false))).toDF("g", "ok")
    val out = Analytics.ebShrinkRates(df, "g", col("ok")).collect()
    assert(out.forall(_.isNullAt(4)))
    assert(out.forall(_.getDouble(6) === 0.0))
  }
}
