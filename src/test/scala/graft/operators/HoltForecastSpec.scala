package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.holtForecast]] — naive-recursion equality, trend
  * learning on a ramp (the EWMA blind spot), and init contracts.
  */
class HoltForecastSpec extends SparkSpec {

  import spark.implicits._

  private def run(xs: Seq[Long], a: Int = 300, b: Int = 100) =
    Analytics.holtForecast(
      xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
        .toDF("g", "day", "cents"),
      Seq("g"), col("day"), col("cents"), a, b).head()

  /** Reference: the same integer recursion in plain Scala. */
  private def naive(xs: Seq[Long], a: Int, b: Int): (Long, Long) = {
    var l = xs.head; var t = 0L
    for (x <- xs.tail) {
      val lNew = math.floor(
        (a.toDouble * x + (1000 - a).toDouble * (l + t)) / 1000.0).toLong
      t = math.floor(
        (b.toDouble * (lNew - l) + (1000 - b).toDouble * t) / 1000.0)
        .toLong
      l = lNew
    }
    (l, t)
  }

  test("matches the naive recursion, including negative trends") {
    val xs = Seq(100L, 90L, 120L, 80L, 60L, 40L, 55L, 20L)
    val (wantL, wantT) = naive(xs, 300, 100)
    val r = run(xs)
    assert(r.getAs[Long]("level") === wantL)
    assert(r.getAs[Long]("trend") === wantT)
    assert(r.getAs[Long]("forecast_3") === wantL + 3 * wantT)
    assert(r.getAs[Long]("n_buckets") === xs.size.toLong)
  }

  test("a steady ramp learns a positive trend and forecasts ahead " +
      "of the last level") {
    val ramp = (1 to 40).map(i => 100L * i)
    val r = run(ramp)
    assert(r.getAs[Long]("trend") > 0L)
    assert(r.getAs[Long]("forecast_1") > r.getAs[Long]("level"))
    // with a long ramp the learned trend approaches the true step
    assert(math.abs(r.getAs[Long]("trend") - 100L) < 40L)
  }

  test("holtResume(state(prefix), suffix) == holtForecast(full) for " +
      "every split point — the left-fold identity") {
    val xs = Seq(100L, 90L, 120L, 80L, 60L, 40L, 55L, 20L)
    def df(part: Seq[(Long, Int)]) =
      part.map { case (x, i) => ("g", i, x) }.toDF("g", "day", "cents")
    val full = Analytics.holtForecast(df(xs.zipWithIndex),
      Seq("g"), col("day"), col("cents"), 300, 100).head()
    for (cut <- 1 until xs.size) {
      val state = Analytics.holtForecast(
        df(xs.zipWithIndex.take(cut)), Seq("g"), col("day"),
        col("cents"), 300, 100)
      val resumed = Analytics.holtResume(state,
        df(xs.zipWithIndex.drop(cut)), Seq("g"), col("day"),
        col("cents"), 300, 100).head()
      for (f <- Seq("n_buckets", "level", "trend", "forecast_3"))
        assert(resumed.getAs[Long](f) === full.getAs[Long](f),
          s"cut=$cut field=$f")
    }
  }

  test("holtResume: stateless new groups init like holtForecast, and " +
      "state-only groups pass through unchanged") {
    val state = Analytics.holtForecast(
      Seq(("old", 0, 50L), ("old", 1, 60L)).toDF("g", "day", "cents"),
      Seq("g"), col("day"), col("cents"), 300, 100)
    val out = Analytics.holtResume(state,
        Seq(("new", 2, 99L)).toDF("g", "day", "cents"),
        Seq("g"), col("day"), col("cents"), 300, 100)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("new").getAs[Long]("level") === 99L)
    assert(out("new").getAs[Long]("trend") === 0L)
    assert(out("new").getAs[Long]("n_buckets") === 1L)
    val oldState = state.head()
    assert(out("old").getAs[Long]("level") ===
      oldState.getAs[Long]("level"))
    assert(out("old").getAs[Long]("n_buckets") === 2L)
  }

  test("a single bucket reports its value with zero trend; bucket " +
      "values aggregate before the recursion") {
    val r = run(Seq(777L))
    assert(r.getAs[Long]("level") === 777L)
    assert(r.getAs[Long]("trend") === 0L)
    assert(r.getAs[Long]("forecast_2") === 777L)
    // two rows in one bucket sum first
    val df = Seq(("g", 0, 40L), ("g", 0, 2L), ("g", 1, 100L))
      .toDF("g", "day", "cents")
    val out = Analytics.holtForecast(df, Seq("g"), col("day"),
      col("cents"), 300, 100).head()
    val (wantL, wantT) = naive(Seq(42L, 100L), 300, 100)
    assert(out.getAs[Long]("level") === wantL)
    assert(out.getAs[Long]("trend") === wantT)
  }
}
