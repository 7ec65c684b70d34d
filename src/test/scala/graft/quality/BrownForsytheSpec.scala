package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Drift.brownForsythe]] — exact medians off the count frame
  * (odd/even n), a hand-computed F, the blindness contract (a pure
  * location shift reads F ≈ 0 where the variance alarm stays quiet),
  * and the planted q295 widening on the real corpus.
  */
class BrownForsytheSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  private def bf(b: Seq[(String, Long)], c: Seq[(String, Long)]) =
    Drift.brownForsythe(side(b: _*), side(c: _*), col("x"), Seq("g"))

  test("medians are exact off the count frame: odd n takes the " +
      "middle, even n averages the two middles (med2 = sum)") {
    val out = bf(
      Seq(("g", 1L), ("g", 5L), ("g", 100L)),
      Seq(("g", 2L), ("g", 4L), ("g", 6L), ("g", 8L))).head()
    assert(out.getLong(3) == 10L) // odd: 5 + 5
    assert(out.getLong(4) == 10L) // even: 4 + 6
  }

  test("hand-computed F: base deviations {2,0,2}, cur {6,0,6} " +
      "(doubled units {4,0,4} vs {12,0,12})") {
    val out = bf(
      Seq(("g", 1L), ("g", 3L), ("g", 5L)),
      Seq(("g", 1L), ("g", 7L), ("g", 13L))).head()
    // z_b = {4,0,4}: sb=8, qb=32; z_c = {12,0,12}: sc=24, qc=288
    // ssb = 64/3 + 576/3 - 1024/6 = 42.6667; ssw = (32-64/3)+(288-576/3)
    val sb = 8.0; val sc = 24.0; val qb = 32.0; val qc = 288.0
    val ssb = sb * sb / 3.0 + sc * sc / 3.0 -
      (sb + sc) * (sb + sc) / 6.0
    val ssw = (qb - sb * sb / 3.0) + (qc - sc * sc / 3.0)
    val want = ssb * 4.0 / ssw
    assert(out.getDouble(5) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("a pure location shift is invisible: identical spread, " +
      "shifted mean, F = 0") {
    val out = bf(
      Seq(("g", 1L), ("g", 2L), ("g", 3L)),
      Seq(("g", 101L), ("g", 102L), ("g", 103L))).head()
    assert(out.getDouble(5) == 0.0 && out.getInt(6) == 0)
  }

  test("degenerate spread (all values equal on both sides) is " +
      "guarded: ssw = 0 emits null F") {
    val out = bf(
      Seq(("g", 5L), ("g", 5L)), Seq(("g", 9L), ("g", 9L))).head()
    assert(out.isNullAt(5) && out.getInt(6) == 0)
  }

  test("q295 on the real corpus: the mean-preserving 2-HIGH widening " +
      "is the only variance alarm; location tests would be blind " +
      "to it by construction") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .varianceDriftQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("2-HIGH").getInt(6) == 1)
      assert(byG("2-HIGH").getDouble(5) > 3.841459)
      byG.filterKeys(_ != "2-HIGH").values.foreach { r =>
        assert(r.getInt(6) == 0, s"false alarm: ${r.getString(0)}")
      }
    }
  }
}
