package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.powerAnalysis]] — the textbook two-proportion design
  * formula replayed in scala.math, the p₂≥1 null guard, and
  * monotonicity in the lift.
  */
class PowerAnalysisSpec extends SparkSpec {

  private def trialsDf(rows: (String, Boolean)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("y", BooleanType))),
    rows.map { case (g, y) => Row(g, y) })

  private def formula(p1: Double, lift: Double): Long = {
    val p2 = p1 + lift
    val pBar = (p1 + p2) / 2.0
    val a = 1.959964 * math.sqrt(2.0 * pBar * (1.0 - pBar)) +
      0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    math.ceil(a * a / (lift * lift)).toLong
  }

  test("10% baseline: n per arm matches the scala.math replay " +
      "(the 685-per-arm textbook neighborhood for +5pp)") {
    val rows = (1 to 100).map(i => ("g", i <= 10))
    val out = Analytics.powerAnalysis(trialsDf(rows: _*), "g",
      col("y")).orderBy("lift").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(5) == formula(0.1, r.getDouble(4)))
    }
    // sanity anchor: +5pp from 10% is in the canonical ~700 range
    val n5 = out.last.getLong(5)
    assert(n5 > 600 && n5 < 800, s"n_per_arm = $n5")
  }

  test("larger lifts need fewer samples") {
    val rows = (1 to 200).map(i => ("g", i <= 40))
    val ns = Analytics.powerAnalysis(trialsDf(rows: _*), "g",
      col("y")).orderBy("lift").collect().map(_.getLong(5))
    assert(ns(0) > ns(1) && ns(1) > ns(2))
  }

  test("lift past certainty: p2 >= 1 -> null design row") {
    val rows = (1 to 100).map(i => ("g", i <= 99))
    val out = Analytics.powerAnalysis(trialsDf(rows: _*), "g",
      col("y"), lifts = Seq(0.02)).collect().head
    assert(out.isNullAt(5))
  }
}
