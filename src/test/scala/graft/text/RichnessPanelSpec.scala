package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.richnessPanel]] and [[TextAnalysis.zipfFit]] —
  * hand-computed Yule's K / Herdan's C / GT hapax discount on tiny
  * corpora, the exact quantized-OLS Zipf slope, size-invariance of K
  * under corpus doubling, and guards (empty vocab, v1 = 0).
  */
class RichnessPanelSpec extends SparkSpec {

  private def corpus(rows: (String, String)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("text", StringType))),
    rows.map { case (g, t) => Row(g, t) })

  test("hand-computed panel: 'a a b' -> K = 1e4*(5-3)/9, " +
      "C = ln2/ln3, c1* = 2*V2/V1 = 2") {
    val out = TextAnalysis.richnessPanel(
      corpus(("g", "a a b")), "g", "text").head()
    assert(out.getLong(1) == 3L && out.getLong(2) == 2L)
    assert(out.getLong(3) == 1L && out.getLong(4) == 1L)
    val k = 10000.0 * (5.0 - 3.0) / 9.0
    assert(out.getDouble(5) ==
      BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(out.getDouble(6) ==
      BigDecimal(math.log(2.0) / math.log(3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getDouble(7) == 2.0)
  }

  test("Yule's K is size-invariant: doubling every count leaves K " +
      "fixed while TTR halves-ish") {
    val base = Seq.fill(10)(("g", "a a a b b c"))
    val one = TextAnalysis.richnessPanel(
      corpus(base: _*), "g", "text").head()
    val two = TextAnalysis.richnessPanel(
      corpus(base ++ base: _*), "g", "text").head()
    // K = 1e4(S2 - N)/N²: doubling counts maps (S2, N) -> (4S2, 2N);
    // the -N term breaks exact equality but only at O(1/N) — at
    // N = 60 the drift is ~2%
    assert(math.abs(one.getDouble(5) - two.getDouble(5)) <
      one.getDouble(5) * 0.05)
    assert(one.getLong(2) == two.getLong(2))
  }

  test("v1 = 0 guards gt_c1_star to null") {
    val out = TextAnalysis.richnessPanel(
      corpus(("g", "a a b b")), "g", "text").head()
    assert(out.isNullAt(7))
  }

  test("zipf slope: exact quantized-OLS replay on counts {4,2,1}") {
    val out = TextAnalysis.zipfFit(
      corpus(("g", "a a a a b b c")), "g", "text").head()
    assert(out.getLong(1) == 3L)
    val pts = Seq((1L, 4L), (2L, 2L), (3L, 1L)).map { case (r, c) =>
      (math.floor(math.log(r.toDouble) * 1e9).toLong,
        math.floor(math.log(c.toDouble) * 1e9).toLong)
    }
    val m = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val slope = (BigInt(m) * sxy - BigInt(sx) * sy).toDouble /
      (BigInt(m) * sxx - BigInt(sx) * sx).toDouble
    assert(out.getDouble(2) ==
      BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // {4,2,1} over ranks {1,2,3} is steeper than perfect Zipf
    // (1/r would give {4,2,1.33}): the fit lands near -1.23
    assert(out.getDouble(2) < -1.0 && out.getDouble(2) > -1.5)
  }

  test("zipf: a single-type vocabulary gives null slope (den = 0)") {
    val out = TextAnalysis.zipfFit(
      corpus(("g", "a a a")), "g", "text").head()
    assert(out.getLong(1) == 1L && out.isNullAt(2))
  }

  test("q307/q308 on the real corpus: every language lands a " +
      "negative slope and a finite K") {
    graft.core.CacheScope.withScope {
      val p = graft.registry.TextRegistry
        .richnessPanelQ(spark, "/root/testdata/sf0.001").collect()
      assert(p.length == 5 && p.forall(r => r.getDouble(5) > 0.0))
      val z = graft.registry.TextRegistry
        .zipfFitQ(spark, "/root/testdata/sf0.001").collect()
      assert(z.length == 5 && z.forall(r => r.getDouble(2) < 0.0))
    }
  }
}
