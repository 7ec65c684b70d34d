package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Sampling.ppsHorvitzThompson]] — the saturation identity, the
  * classic PPS constant-contribution property, and determinism.
  */
class PpsHtSpec extends SparkSpec {

  private def rowsDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("id", LongType),
      StructField("w", LongType))),
    rows.map { case (g, i, w) => Row(g, i, w) })

  test("saturation: when k*w_i >= W for every row, all rows sample " +
      "at p=1 and the estimates ARE the exact totals") {
    val d = rowsDf(("a", 1L, 5L), ("a", 2L, 7L), ("b", 3L, 8L))
    // W = 20; k = 4 -> k*w = 20/28/32 >= 20 for every row
    val out = Sampling.ppsHorvitzThompson(d, "id", "w", Seq("g"),
      expectedK = 4).orderBy("g").collect()
    assert(out(0).getLong(3) == 2L) // a: both sampled
    assert(out(0).getDouble(4) == 2.0 && out(0).getDouble(5) == 12.0)
    assert(out(1).getLong(3) == 1L)
    assert(out(1).getDouble(4) == 1.0 && out(1).getDouble(5) == 8.0)
  }

  test("the PPS property: below saturation every sampled row " +
      "contributes exactly floor(W*1e6/k)/1e6 to ht_weight, so " +
      "ht_weight = n_sampled * W/k up to the micro quantum") {
    val d = rowsDf((1 to 200).map(i =>
      ("g", i.toLong, (i % 13 + 1).toLong)): _*)
    val w = (1 to 200).map(i => i % 13 + 1L).sum
    val out = Sampling.ppsHorvitzThompson(d, "id", "w", Seq("g"),
      expectedK = 20).head()
    val n = out.getLong(3)
    assert(n > 0, "expected a nonempty sample")
    // per-row contribution: ipm*w = floor(W*1e6/(k*w))*w — equal to
    // floor(W*1e6/k) only when w divides; bound the gap instead
    val perRow = out.getDouble(5) / n
    assert(math.abs(perRow - w.toDouble / 20.0) < 0.001 * w,
      s"per-row contribution $perRow vs ${w / 20.0}")
  }

  test("deterministic: two runs produce identical estimates; zero " +
      "and null weights are outside the estimable domain") {
    val d = rowsDf(("a", 1L, 5L), ("a", 2L, 0L), ("b", 3L, 8L))
    def run() = Sampling.ppsHorvitzThompson(d, "id", "w", Seq("g"),
      expectedK = 2).orderBy("g").collect().toSeq
    val a = run()
    assert(a === run())
    assert(a.head.getLong(1) == 1L, "w=0 row must not count as true")
  }
}
