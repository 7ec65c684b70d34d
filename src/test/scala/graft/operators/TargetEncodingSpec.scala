package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** q182's closed-form leave-one-out mean. The DuckDB oracle replays
  * the SAME closed form, so oracle equality alone cannot catch a
  * derivation error — this spec proves the algebra against the
  * definitional row-wise computation.
  */
class TargetEncodingSpec extends AnyFunSuite {

  private val m = 20L

  /** Definitional LOO mean: average over rows of
    * (S − yᵢ + m·G)/(n − 1 + m), in double like the engine's final
    * division.
    */
  private def direct(ys: Seq[Long], g: Long): Double = {
    val s = ys.sum
    val n = ys.length
    ys.map(y => (s - y + m * g).toDouble / (n - 1 + m)).sum / n
  }

  /** q182's closed form: (n·(S+m·G) − S) / (n·(n−1+m)). */
  private def closed(ys: Seq[Long], g: Long): Double = {
    val s = ys.sum
    val n = ys.length.toLong
    (n * (s + m * g) - s).toDouble / (n * (n - 1 + m)).toDouble
  }

  test("closed form equals the definitional row-wise LOO mean") {
    val cases = Seq(
      Seq(100L, 250L, 375L, 4000L, 12L),
      Seq(7L), // n = 1: LOO degenerates to the prior
      Seq(5L, 5L),
      (1L to 97L).map(i => i * i * 13L % 100003L))
    for (ys <- cases; g <- Seq(0L, 50L, 123456L)) {
      val d = direct(ys, g)
      val c = closed(ys, g)
      assert(math.abs(d - c) < 1e-9 * math.max(1.0, math.abs(d)),
        s"ys=${ys.take(5)}... g=$g direct=$d closed=$c")
    }
  }

  test("n = 1 leave-one-out is exactly the smoothing prior") {
    assert(closed(Seq(42L), 777L) == 777.0)
  }
}
