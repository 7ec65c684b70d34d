package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.holtWintersForecast]] — bit-equality against an
  * independent Scala replication of the integer triple recursion,
  * seasonal-slot wiring, and the learns-the-cycle property plain
  * Holt cannot have.
  */
class HoltWintersSpec extends SparkSpec {

  import spark.implicits._

  /** Independent replication of the milli-unit recursion. */
  private def naive(xs: Seq[Long], a: Int, b: Int, g: Int,
      m: Int): (Long, Long, Array[Long], Int) = {
    var l = 0L; var t = 0L; val s = Array.fill(m)(0L); var i = 0
    def step(num: Double): Long = math.floor(num / 1000.0).toLong
    for (x <- xs) {
      val j = i % m
      val lNew = step(a.toDouble * (x - s(j)) +
        (1000 - a).toDouble * (l + t))
      val tNew = step(b.toDouble * (lNew - l) +
        (1000 - b).toDouble * t)
      val sNew = step(g.toDouble * (x - lNew) +
        (1000 - g).toDouble * s(j))
      if (i == 0) { l = x; t = 0L } else { l = lNew; t = tNew; s(j) = sNew }
      i += 1
    }
    (l, t, s, i)
  }

  private val pattern = Seq(500L, -200L, 0L, 300L, -400L, 100L, -300L)

  test("matches the independent integer-recursion replication " +
      "bit-for-bit") {
    val xs = (0 until 33).map(t =>
      10000L + 37L * t + pattern(t % 7) + (t % 3) * 11L)
    val df = xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
      .toDF("g", "b", "x")
    val r = Analytics.holtWintersForecast(df, Seq("g"), col("b"),
      col("x"), alphaMilli = 300, betaMilli = 100, gammaMilli = 200,
      season = 7).collect()(0)
    val (l, t, s, n) = naive(xs, 300, 100, 200, 7)
    assert(r.getAs[Long]("level") == l)
    assert(r.getAs[Long]("trend") == t)
    for (k <- 0 until 7)
      assert(r.getAs[Long](s"s$k") == s(k), s"s$k")
    assert(r.getAs[Long]("n_buckets") == n.toLong)
    assert(r.getAs[Long]("forecast_2") ==
      l + 2 * t + s((n + 1) % 7))
  }

  test("learns a weekly cycle through a trend: the h-step forecasts " +
      "carry the right slot's seasonal, where plain Holt is flat") {
    // strong exact cycle + linear trend, 12 full weeks (seasonals
    // start from zero by the documented convention, so convergence
    // takes γ-geometric cycles: 1 − 0.7¹² ≈ 0.99 at γ = 300)
    val xs = (0 until 84).map(t => 20000L + 50L * t +
      pattern(t % 7) * 10L)
    val df = xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
      .toDF("g", "b", "x")
    val r = Analytics.holtWintersForecast(df, Seq("g"), col("b"),
      col("x"), gammaMilli = 300, season = 7).collect()(0)
    // forecast error against the true generator at h = 1..3: a few
    // per-mill of the level, an order under the ±4500 cycle swing
    for (h <- 1 to 3) {
      val truth = 20000L + 50L * (83 + h) + pattern((83 + h) % 7) * 10L
      val got = r.getAs[Long](s"forecast_$h")
      assert(math.abs(got - truth) < 900L,
        s"h=$h got $got want $truth")
    }
    // the slot spread must reflect the planted cycle's ordering:
    // slot 0 (+5000) far above slot 4 (−4000)
    assert(r.getAs[Long]("s0") - r.getAs[Long]("s4") > 5000L)
  }

  test("resume == full recompute at EVERY split point — the " +
      "left-fold identity with the seasonal array") {
    val xs = (0 until 23).map(t =>
      8000L + 13L * t + pattern(t % 7) + (t % 5) * 7L)
    val df = xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
      .toDF("g", "b", "x")
    val full = Analytics.holtWintersForecast(df, Seq("g"), col("b"),
      col("x"), season = 7).collect()(0)
    for (cut <- Seq(1, 6, 7, 8, 15, 22)) {
      val state = Analytics.holtWintersForecast(
        df.where(col("b") < cut), Seq("g"), col("b"), col("x"),
        season = 7)
      val resumed = Analytics.holtWintersResume(state,
        df.where(col("b") >= cut), Seq("g"), col("b"), col("x"),
        season = 7).collect()(0)
      for (f <- full.schema.fieldNames.filter(_ != "g"))
        assert(resumed.getAs[Long](f) == full.getAs[Long](f),
          s"cut=$cut field=$f")
    }
  }

  test("a cycle-free series degrades to plain Holt's level/trend " +
      "read with near-zero seasonals") {
    val xs = (0 until 28).map(t => 5000L + 20L * t)
    val df = xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
      .toDF("g", "b", "x")
    val r = Analytics.holtWintersForecast(df, Seq("g"), col("b"),
      col("x"), season = 7).collect()(0)
    for (k <- 0 until 7)
      assert(math.abs(r.getAs[Long](s"s$k")) < 400L, s"s$k")
  }
}
