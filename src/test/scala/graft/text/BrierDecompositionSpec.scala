package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[QualityModel.brierDecomposition]] — hand-computed decomposition
  * on constant-per-bin scores (where Murphy's identity is EXACT), a
  * perfectly-calibrated scorer (reliability 0), an uninformative one
  * (resolution 0), and the q320 audit on the real corpus.
  */
class BrierDecompositionSpec extends SparkSpec {

  private def scored(rows: (String, Double, Boolean)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("s", DoubleType),
      StructField("y", BooleanType))),
    rows.map { case (g, s, y) => Row(g, s, y) })

  private def bd(rows: (String, Double, Boolean)*) =
    QualityModel.brierDecomposition(scored(rows: _*), Seq("g"),
      col("s"), col("y"))

  test("perfectly calibrated, constant per bin: score 0.25 with 1/4 " +
      "positives and 0.75 with 3/4 -> reliability 0, identity exact") {
    val rows =
      (Seq.fill(3)(("g", 0.25, false)) :+ (("g", 0.25, true))) ++
      (Seq.fill(3)(("g", 0.75, true)) :+ (("g", 0.75, false)))
    val out = bd(rows: _*).head()
    assert(out.getDouble(4) == 0.0, "reliability must vanish")
    // brier = rel - res + unc + wb_gap; constant-per-bin scores make
    // the identity exact up to the micro/nano floors
    assert(math.abs(out.getDouble(7)) < 1e-4,
      s"wb_gap ${out.getDouble(7)}")
    // o_bar = 0.5 -> uncertainty 0.25
    assert(out.getDouble(6) == 0.25)
    assert(out.getDouble(5) > 0.0, "resolution must be positive")
  }

  test("uninformative scorer: one bin, score = base rate -> " +
      "resolution 0, brier = uncertainty") {
    val rows = Seq.fill(2)(("g", 0.5, true)) ++
      Seq.fill(2)(("g", 0.5, false))
    val out = bd(rows: _*).head()
    assert(out.getDouble(5) == 0.0)
    assert(out.getDouble(4) == 0.0)
    assert(out.getDouble(3) == 0.25 && out.getDouble(6) == 0.25)
  }

  test("confidently wrong scorer: reliability dominates the brier") {
    val rows = Seq.fill(4)(("g", 0.95, false)) ++
      Seq.fill(4)(("g", 0.05, true))
    val out = bd(rows: _*).head()
    assert(out.getDouble(3) > 0.8)
    assert(out.getDouble(4) > 0.5, "miscalibration must dominate")
  }

  test("q320 on the real corpus: every source's decomposition is " +
      "internally consistent (brier = rel - res + unc + wb_gap " +
      "within rounding) and uncertainty is the base-rate floor") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .brierDecompositionQ(spark, "/root/testdata/sf0.001").collect()
      assert(rows.length == 20)
      rows.foreach { r =>
        val (b, rel, res, unc, gap) = (r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))
        assert(math.abs(b - (rel - res + unc + gap)) < 5e-6)
        assert(unc <= 0.25 + 1e-9)
        assert(res >= 0.0 && rel >= 0.0)
      }
    }
  }
}
