package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.mantelHaenszel]] — hand-computed MH odds ratio and CMH
  * χ² against the classical formulas, the Simpson's-paradox case the
  * operator exists for, and degenerate strata.
  */
class MantelHaenszelSpec extends SparkSpec {

  import spark.implicits._

  /** Expand per-stratum (a, b, c, d) counts into unit rows. */
  private def expand(strata: Seq[(String, Long, Long, Long, Long)]) =
    strata.flatMap { case (s, a, b, c, d) =>
      Seq.fill(a.toInt)((s, true, true)) ++
        Seq.fill(b.toInt)((s, true, false)) ++
        Seq.fill(c.toInt)((s, false, true)) ++
        Seq.fill(d.toInt)((s, false, false))
    }.toDF("s", "e", "o")

  private def run(strata: Seq[(String, Long, Long, Long, Long)]) =
    Analytics.mantelHaenszel(expand(strata), "s", col("e"), col("o"))
      .collect().map(r => r.getString(0) -> r).toMap

  /** Classical reference with exact rational sums (no micro floor —
    * tolerance absorbs the ≤1e-6-per-stratum quantization).
    */
  private def ref(strata: Seq[(String, Long, Long, Long, Long)]) = {
    val terms = strata.map { case (_, a, b, c, d) =>
      val n = (a + b + c + d).toDouble
      (a * d / n, b * c / n, (a + b) * (a + c) / n,
        (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)),
        a.toDouble)
    }
    val or = terms.map(_._1).sum / terms.map(_._2).sum
    val num = terms.map(_._5).sum - terms.map(_._3).sum
    val chi2 = num * num / terms.map(_._4).sum
    (or, chi2)
  }

  test("hand-computed two-stratum MH odds ratio and CMH chi2 match " +
      "the classical formulas") {
    val strata = Seq(("s1", 12L, 5L, 8L, 10L), ("s2", 7L, 9L, 3L, 11L))
    val (wantOr, wantChi2) = ref(strata)
    val tot = run(strata)("__total__")
    assert(math.abs(tot.getAs[Double]("or_mh") - wantOr) < 1e-4)
    assert(math.abs(tot.getAs[Double]("cmh_chi2") - wantChi2) < 1e-3)
    assert(tot.getAs[Long]("a") === 19L)
  }

  test("Simpson's paradox: both strata read OR < 1, the naive pooled " +
      "table reads OR > 1, and MH sides with the strata") {
    // classic construction: exposure concentrates in the
    // high-outcome stratum
    val strata = Seq(
      ("low", 10L, 90L, 20L, 120L), // OR = (10·120)/(90·20) = 0.67
      ("high", 80L, 20L, 90L, 15L)) // OR = (80·15)/(20·90) = 0.67
    val out = run(strata)
    assert(out("low").getAs[Double]("odds_ratio") < 1.0)
    assert(out("high").getAs[Double]("odds_ratio") < 1.0)
    // pooled: a=90 b=110 c=110 d=135 → OR = 90·135/(110·110) > 1? no:
    // 12150/12100 = 1.004 — crosses 1 where both strata sit at 0.67
    val (a, b, c, d) = (90.0, 110.0, 110.0, 135.0)
    assert(a * d / (b * c) > 1.0)
    assert(out("__total__").getAs[Double]("or_mh") < 1.0)
  }

  test("a single-row stratum contributes zero variance (n-1 guard) " +
      "and zero-margin strata contribute nothing") {
    val strata = Seq(
      ("ok", 12L, 5L, 8L, 10L),
      ("tiny", 1L, 0L, 0L, 0L), // n = 1: vmu guard
      ("empty_out", 0L, 9L, 0L, 11L)) // c1 = 0: all terms 0
    val tot = run(strata)("__total__")
    val (wantOr, _) = ref(Seq(("ok", 12L, 5L, 8L, 10L)))
    assert(math.abs(tot.getAs[Double]("or_mh") - wantOr) < 1e-4)
    assert(!tot.isNullAt(tot.fieldIndex("cmh_chi2")))
  }

  test("per-stratum odds_ratio is null when b·c = 0; __total__ " +
      "carries the pooled counts") {
    val out = run(Seq(("s", 3L, 0L, 2L, 4L)))
    assert(out("s").isNullAt(out("s").fieldIndex("odds_ratio")))
    assert(out("__total__").getAs[Long]("d") === 4L)
  }
}
