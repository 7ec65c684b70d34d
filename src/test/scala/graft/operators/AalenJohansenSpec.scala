package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.aalenJohansen]] — hand-computed CIFs, the
  * cif1 + cif2 + survival ≡ 1 identity, the single-cause reduction to
  * 1 − KM, and censoring-vs-competing discrimination. CIFs are exact
  * nano longs (Σ of once-floored terms), so hand values carry a
  * ≤ 1-nano-per-step floor residue.
  */
class AalenJohansenSpec extends SparkSpec {

  private def frame(rows: (String, Long, Int)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("t", LongType),
      StructField("k", IntegerType))),
    rows.map { case (g, t, k) => Row(g, t, k) })

  private def run(rows: (String, Long, Int)*) =
    Analytics.aalenJohansen(frame(rows: _*), "g", col("t"), col("k"))
      .collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_at_risk"), r.getAs[Double]("survival"),
          r.getAs[Long]("cif1_nano") / 1e9,
          r.getAs[Long]("cif2_nano") / 1e9)))
      .toMap

  private def close(a: Double, b: Double, steps: Int = 10) =
    math.abs(a - b) <= steps * 1e-9

  test("hand-computed two-cause curve") {
    // t=1: n=5, d1=1 -> S=4/5, cif1=1/5
    // t=2: n=4, d2=1 -> S=4/5*3/4=3/5, cif2=(4/5)(1/4)=1/5
    // t=3: n=3, c=1  -> unchanged
    // t=4: n=2, d1=1 -> cif1=1/5+(3/5)(1/2)=1/2, S=3/10
    val out = run(("g", 1L, 1), ("g", 2L, 2), ("g", 3L, 0),
      ("g", 4L, 1), ("g", 5L, 0))
    assert(out(1L)._1 == 5L && out(1L)._2 == 0.8)
    assert(close(out(1L)._3, 0.2) && out(1L)._4 == 0.0)
    assert(out(2L)._2 == 0.6)
    assert(close(out(2L)._3, 0.2) && close(out(2L)._4, 0.2))
    assert(out(3L)._2 == 0.6)
    assert(close(out(3L)._3, 0.2) && close(out(3L)._4, 0.2))
    assert(out(4L)._1 == 2L && out(4L)._2 == 0.3)
    assert(close(out(4L)._3, 0.5) && close(out(4L)._4, 0.2))
    assert(close(out(5L)._3, 0.5) && close(out(5L)._4, 0.2))
  }

  test("cif1 + cif2 + survival = 1 at every step (to floor residue) " +
      "on a larger mixed fixture") {
    val rows = (1 to 60).map(i =>
      ("g", (i * 7 % 13).toLong, i % 3))
    val out = run(rows: _*)
    out.values.foreach { case (_, s, c1, c2) =>
      assert(math.abs(s + c1 + c2 - 1.0) < 2e-6) }
  }

  test("with no cause-2 events, cif1 = 1 - KM survival (to floor " +
      "residue), cross-checked against the kaplanMeier operator") {
    val rows = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1),
      ("g", 4L, 1), ("g", 5L, 0), ("g", 6L, 1))
    val aj = run(rows: _*)
    val km = Analytics.kaplanMeier(frame(rows: _*), "g", col("t"),
        col("k") === 1).collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("survival"))
      .toMap
    aj.foreach { case (t, (_, s, c1, c2)) =>
      assert(c2 == 0.0)
      assert(math.abs(s - km(t)) < 2e-6, s"t=$t")
      assert(math.abs(c1 - (1.0 - km(t))) < 2e-6, s"t=$t")
    }
  }

  test("treating cause 2 as censoring (the 1-KM mistake) would " +
      "overstate cause-1 incidence; Aalen-Johansen does not") {
    // heavy competing risk: 4 early cause-2 exits, one late cause-1
    val rows = Seq(("g", 1L, 2), ("g", 1L, 2), ("g", 2L, 2),
      ("g", 2L, 2), ("g", 5L, 1))
    val out = run(rows: _*)
    // AJ: S(5-) = (3/5)*(1/3) = 1/5 -> cif1(5) = 0.2
    assert(close(out(5L)._3, 0.2))
    // naive 1-KM censoring cause 2 would read 1.0 (the only at-risk
    // subject fails) — the estimator must NOT read 1.0
    assert(out(5L)._3 < 0.99)
  }
}
