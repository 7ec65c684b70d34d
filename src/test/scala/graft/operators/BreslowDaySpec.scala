package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Analytics.breslowDay]] — the homogeneity-of-odds-ratios
  * contract: identical strata score (near) zero, a planted reversed
  * stratum fires, expected counts respect the margin box, degenerate
  * strata drop out of the df.
  */
class BreslowDaySpec extends SparkSpec {

  import spark.implicits._

  /** Expand per-cell 2×2×K counts into unit rows. */
  private def table(cells: Seq[(String, Boolean, Boolean, Int)])
      : DataFrame =
    cells.flatMap { case (s, e, o, n) => Seq.fill(n)((s, e, o)) }
      .toDF("s", "e", "o")

  private def run(cells: Seq[(String, Boolean, Boolean, Int)],
      crit: Double = 3.841) =
    Analytics.breslowDay(table(cells), "s", col("e"), col("o"), crit)
      .collect().map(r => r.getString(0) -> r).toMap

  test("identical strata: expected_a equals a, X² = 0, quiet") {
    val one = Seq(("x", true, true, 30), ("x", true, false, 20),
      ("x", false, true, 15), ("x", false, false, 35))
    val rows = run(one ++ one.map { case (_, e, o, n) =>
      ("y", e, o, n) })
    val tot = rows("__total__")
    assert(math.abs(tot.getAs[Double]("bd_chi2")) < 1e-4)
    assert(!tot.getAs[Boolean]("heterogeneous"))
    assert(tot.getAs[Long]("df") == 1L)
    // ψ̂ equals each stratum's OR, so the quadratic root is a itself
    assert(math.abs(rows("x").getAs[Double]("expected_a") - 30.0)
      < 1e-3)
    assert(math.abs(rows("x").getAs[Double]("odds_ratio") - 3.5)
      < 1e-6)
  }

  test("a reversed stratum fires: OR 4 against OR 1/4") {
    val rows = run(Seq(
      ("x", true, true, 40), ("x", true, false, 10),
      ("x", false, true, 25), ("x", false, false, 25),
      ("y", true, true, 10), ("y", true, false, 40),
      ("y", false, true, 25), ("y", false, false, 25)))
    val tot = rows("__total__")
    assert(tot.getAs[Double]("bd_chi2") > 3.841,
      s"chi2 ${tot.getAs[Double]("bd_chi2")}")
    assert(tot.getAs[Boolean]("heterogeneous"))
    // Tarone's correction is a small non-negative subtraction
    val t = tot.getAs[Double]("bd_chi2_tarone")
    assert(t <= tot.getAs[Double]("bd_chi2") + 1e-9 && t > 0)
  }

  test("expected_a stays inside the margin box [lo, hi]") {
    val rows = run(Seq(
      ("x", true, true, 5), ("x", true, false, 45),
      ("x", false, true, 40), ("x", false, false, 10),
      ("y", true, true, 20), ("y", true, false, 30),
      ("y", false, true, 20), ("y", false, false, 30)))
    for (k <- Seq("x", "y")) {
      val r = rows(k)
      val ea = r.getAs[Double]("expected_a")
      val n1 = r.getAs[Long]("a") + r.getAs[Long]("b")
      val m1 = r.getAs[Long]("a") + r.getAs[Long]("c")
      val n2 = r.getAs[Long]("c") + r.getAs[Long]("d")
      assert(ea >= math.max(0L, m1 - n2) - 1e-6 &&
        ea <= math.min(n1, m1) + 1e-6, s"$k ea=$ea")
    }
  }

  test("a degenerate stratum (zero margin) is excluded from df") {
    val rows = run(Seq(
      ("x", true, true, 30), ("x", true, false, 20),
      ("x", false, true, 15), ("x", false, false, 35),
      ("y", true, true, 25), ("y", true, false, 25),
      ("y", false, true, 20), ("y", false, false, 30),
      // stratum z: nobody unexposed — no OR to compare
      ("z", true, true, 10), ("z", true, false, 10)))
    val tot = rows("__total__")
    assert(tot.getAs[Long]("df") == 1L)
    assert(rows("z").isNullAt(rows("z").fieldIndex("expected_a")))
  }
}
