package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.effectiveSampleSize]] — Kish closed forms, the
  * equal-weight identity, degenerate and zero-weight contracts.
  */
class EffectiveSampleSizeSpec extends SparkSpec {

  import spark.implicits._

  private def run(ws: Seq[Long]) =
    Sampling.effectiveSampleSize(
      ws.map(("g", _)).toDF("g", "w"), Seq("g"), col("w")).head()

  test("equal weights: ess = n and deff = 1 exactly") {
    val r = run(Seq.fill(7)(42L))
    assert(r.getAs[Long]("n") === 7L)
    assert(r.getAs[Double]("ess") === 7.0)
    assert(r.getAs[Double]("deff") === 1.0)
  }

  test("Kish closed form on a hand computation") {
    // w = 1, 3: ess = 16/10 = 1.6, deff = 2·10/16 = 1.25
    val r = run(Seq(1L, 3L))
    assert(r.getAs[Double]("ess") === 1.6)
    assert(r.getAs[Double]("deff") === 1.25)
  }

  test("one dominant weight collapses ess toward 1") {
    val r = run(Seq(1000000L) ++ Seq.fill(99)(1L))
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("ess") < 1.001)
  }

  test("zero weights participate in n but add no information; " +
      "all-zero groups yield null ess") {
    val r = run(Seq(5L, 5L, 0L))
    // ess = 100/50 = 2 — the zero-weight row is worth nothing
    assert(r.getAs[Double]("ess") === 2.0)
    val z = run(Seq(0L, 0L))
    assert(z.isNullAt(z.fieldIndex("ess")))
    assert(z.isNullAt(z.fieldIndex("deff")))
    // negative weights drop
    val neg = Sampling.effectiveSampleSize(
      Seq(("g", 5L), ("g", -1L)).toDF("g", "w"), Seq("g"), col("w"))
      .head()
    assert(neg.getAs[Long]("n") === 1L)
  }
}
