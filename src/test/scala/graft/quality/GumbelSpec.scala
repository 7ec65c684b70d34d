package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Drift.gumbelBlockMaxima]] — hand-computed MoM fit, return-level
  * monotonicity in T, degenerate guards, and the q321 capacity read
  * on the real corpus.
  */
class GumbelSpec extends SparkSpec {

  private def series(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("b", LongType),
      StructField("y", LongType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  test("hand-computed: block maxima {100, 200, 300} -> mean 200, " +
      "var 10000, beta = 100*sqrt(6)/pi, mu = 200 - gamma*beta") {
    val rows = Seq(("g", 1L, 100L), ("g", 2L, 200L), ("g", 3L, 300L))
    val out = Drift.gumbelBlockMaxima(series(rows: _*), Seq("g"),
      col("b"), col("y"), Seq(30)).head()
    val beta = 100.0 * Drift.gumbelSqrt6OverPi
    val mu = 200.0 - Drift.eulerGamma * beta
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == 3L && out.getLong(2) == 300L)
    assert(out.getDouble(4) == r4(mu))
    assert(out.getDouble(5) == r4(beta))
    assert(out.getDouble(6) ==
      r4(mu + beta * Drift.gumbelVariate(30)))
  }

  test("within-block maxima: several rows per block reduce to the " +
      "block max before any moment") {
    val rows = Seq(("g", 1L, 100L), ("g", 1L, 999L), ("g", 2L, 200L),
      ("g", 2L, 5L), ("g", 3L, 300L))
    val out = Drift.gumbelBlockMaxima(series(rows: _*), Seq("g"),
      col("b"), col("y"), Seq(30)).head()
    assert(out.getLong(2) == 999L)
  }

  test("return levels are monotone in the period and exceed the " +
      "mean maximum") {
    val rows = (1L to 20L).map(i => ("g", i, 1000L + (i * 37L) % 400L))
    val out = Drift.gumbelBlockMaxima(series(rows: _*), Seq("g"),
      col("b"), col("y"), Seq(10, 100, 1000)).head()
    val (r10, r100, r1000) =
      (out.getDouble(6), out.getDouble(7), out.getDouble(8))
    assert(r10 < r100 && r100 < r1000)
    assert(r10 > out.getDouble(3))
  }

  test("constant maxima (zero variance) guard to null") {
    val rows = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L))
    val out = Drift.gumbelBlockMaxima(series(rows: _*), Seq("g"),
      col("b"), col("y"), Seq(30)).head()
    assert(out.isNullAt(4) && out.isNullAt(6))
  }

  test("store == raw: shard-landed per-bucket maxima merged by one " +
      "more max land on the identical fit (q327's contract)") {
    val rows = (1L to 12L).map(i => ("g", i, 100L + (i * 53L) % 300L))
    val raw = Drift.gumbelBlockMaxima(series(rows: _*), Seq("g"),
      col("b"), col("y"), Seq(30)).head()
    // two shard halves, each pre-maxed (here trivially, one row per
    // bucket per shard with overlapping buckets split across shards)
    val shardRows = rows.zipWithIndex.map { case ((g, b, y), i) =>
      (g, b, y - (if (i % 2 == 0) 7L else 0L)) } ++ rows
    val store = series(shardRows: _*)
      .withColumnRenamed("b", "bucket")
      .withColumnRenamed("y", "day_max")
    val merged = Drift.gumbelFromBlockMaxima(store, Seq("g"),
      "bucket", "day_max", Seq(30)).head()
    assert(merged == raw)
  }

  test("q321 on the real corpus: every type's rl_365 exceeds rl_30 " +
      "exceeds the mean max, and the year-level sits within a " +
      "plausible band of the observed 30-day max") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .gumbelMaximaQ(spark, "/root/testdata/sf0.001").collect()
      assert(rows.length == 5)
      rows.foreach { r =>
        assert(r.getDouble(6) > r.getDouble(3))
        assert(r.getDouble(7) > r.getDouble(6))
        // the year return level extrapolates BEYOND one observed
        // month, but not absurdly (light-tailed parent)
        assert(r.getDouble(7) < r.getLong(2) * 4.0)
      }
    }
  }
}
