package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.quantileRegPinball]] — exact-line recovery (loss 0),
  * a naive-double-loop argmin replication, intercept monotonicity in
  * τ, and the τ=50 order-statistic intercept.
  */
class QuantileRegSpec extends SparkSpec {

  private def frame(rows: (Long, Long)*) = df(
    StructType(Seq(
      StructField("x", LongType),
      StructField("y", LongType))),
    rows.map { case (x, y) => Row(x, y) })

  private def run(taus: Seq[Int], slopes: Seq[Long],
      rows: (Long, Long)*) =
    Analytics.quantileRegPinball(frame(rows: _*), col("x"), col("y"),
      taus, slopes)

  /** Independent reference: brute-force the same grid with BigInt
    * arithmetic and an explicit sort for the intercept order
    * statistic.
    */
  private def naive(rows: Seq[(Long, Long)], tau: Int,
      slopes: Seq[Long]): (Long, Long, BigInt) = {
    val scored = slopes.map { b =>
      val r = rows.map { case (x, y) => y * 1000000L - b * x }.sorted
      val k = (tau * r.size + 99) / 100
      val a = r(k - 1)
      val loss = r.map { u =>
        val d = BigInt(u) - BigInt(a)
        if (d >= 0) BigInt(tau) * d else BigInt(tau - 100) * d
      }.sum
      (b, a, loss)
    }
    scored.minBy { case (b, _, l) => (l, b) }
  }

  test("an exact line y = 5x + 7 in the grid recovers slope 5, " +
      "intercept 7, loss 0 at every tau") {
    val rows = (0L to 20L).map(x => (x, 5L * x + 7L))
    val out = run(Seq(10, 50, 90), Seq(4000000L, 5000000L, 6000000L),
      rows: _*).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("slope_micro") == 5000000L)
      assert(r.getAs[Long]("intercept_cents") == 7L)
      assert(r.getAs[Double]("avg_loss") == 0.0)
    }
  }

  test("argmin over a 5-slope grid matches the naive BigInt " +
      "replication at tau = 30") {
    val rows = Seq((0L, 10L), (1L, 22L), (2L, 19L), (3L, 40L),
      (4L, 35L), (5L, 61L), (6L, 44L), (7L, 80L))
    val slopes = Seq(-2000000L, 0L, 5000000L, 8000000L, 12000000L)
    val r = run(Seq(30), slopes, rows: _*).collect()(0)
    val (b, a, loss) = naive(rows, 30, slopes)
    assert(r.getAs[Long]("slope_micro") == b)
    assert(r.getAs[Long]("intercept_cents") == a / 1000000L)
    val expected = math.rint(
      loss.toDouble / (rows.size.toDouble * 1e8) * 1e6) / 1e6
    assert(r.getAs[Double]("avg_loss") == expected)
  }

  test("intercepts are monotone in tau for a fixed slope") {
    val rows = (1L to 40L).map(i => (0L, i * i))
    val out = run(Seq(10, 50, 90), Seq(0L), rows: _*).collect()
      .map(r => r.getAs[Int]("tau_pct") -> r.getAs[Long]("intercept_cents"))
      .toMap
    assert(out(10) <= out(50) && out(50) <= out(90))
    // tau=50 on n=40: k = ceil(20) = 20 -> the 20th smallest = 400
    assert(out(50) == 400L)
  }
}
