package graft.quality

import graft.SparkSpec
import graft.registry.AnalyticsRegistry
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Drift.wilcoxonSignedRank]] — closed form on a hand-computed
  * fixture, the zero-difference and tie contracts, and the planted
  * within-key creep detection (q281).
  */
class WilcoxonSpec extends SparkSpec {

  private def pairsDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("b", LongType),
      StructField("c", LongType))),
    rows.map { case (g, b, c) => Row(g, b, c) })

  test("hand-computed closed form: d = {+1, +2, -3, +1} gives " +
      "tie-averaged ranks {1.5, 1.5, 3, 4}, W+ = 6, z = 1/sqrt(7.375)") {
    val out = Drift.wilcoxonSignedRank(
      pairsDf(("g", 10L, 11L), ("g", 10L, 12L), ("g", 10L, 7L),
        ("g", 20L, 21L)),
      "b", "c", Seq("g")).head()
    assert(out.getLong(1) == 4L) // n_pairs
    assert(out.getLong(2) == 0L) // n_zero
    // W+*2: the two d=+1 pairs at rank2 3 each, d=+2 at rank2 6
    assert(out.getLong(3) == 12L)
    val want = (6.0 - 5.0) / math.sqrt(4.0 * 5.0 * 9.0 / 24.0 - 6.0 / 48.0)
    assert(out.getDouble(4) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(!out.getBoolean(5))
  }

  test("zero differences drop from the ranks but are counted; a " +
      "group with ONLY zeros is absent") {
    val out = Drift.wilcoxonSignedRank(
      pairsDf(("g", 10L, 11L), ("g", 10L, 12L), ("g", 10L, 7L),
        ("g", 20L, 21L), ("g", 5L, 5L), ("g", 9L, 9L),
        ("z", 3L, 3L)),
      "b", "c", Seq("g")).collect()
    assert(out.length == 1 && out(0).getString(0) == "g")
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    assert(out(0).getLong(3) == 12L) // ranks unchanged by zeros
  }

  test("one-sided differences saturate W+: all-positive d gives " +
      "W+*2 = n(n+1) and a large positive z") {
    val out = Drift.wilcoxonSignedRank(
      pairsDf((1 to 12).map(i =>
        ("g", 100L * i, 100L * i + i)): _*),
      "b", "c", Seq("g")).head()
    assert(out.getLong(3) == 12L * 13L) // sum of rank2 = 2*Σrank
    assert(out.getDouble(4) > 3.0 && out.getBoolean(5))
  }

  test("q281 on the real corpus: the planted BUILDING creep is " +
      "flagged, every clean segment is not") {
    graft.core.CacheScope.withScope {
      val rows = AnalyticsRegistry
        .wilcoxonPairedQ(spark, "/root/testdata/sf0.001").collect()
      val bySeg = rows.map(r => r.getString(0) -> r.getInt(5)).toMap
      assert(bySeg("BUILDING") == 1, "planted creep missed")
      assert(bySeg.filterKeys(_ != "BUILDING").values.forall(_ == 0),
        s"false alarm: $bySeg")
    }
  }
}
