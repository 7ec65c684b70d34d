package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Drift.cohensD]] — closed form on hand moments, the degenerate
  * guards, one-sided groups dropping, and the q292 "significant but
  * not material" reading on the real corpus.
  */
class CohensDSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("closed form: base {10,20} vs cur {20,30} gives d = 10/sqrt(50), " +
      "g = d*4/7, and the 1.96*se band") {
    val out = Drift.cohensD(
      side(("g", 10L), ("g", 20L)), side(("g", 20L), ("g", 30L)),
      col("x"), Seq("g")).head()
    val d = 10.0 / math.sqrt(50.0)
    assert(out.getDouble(3) == 15.0 && out.getDouble(4) == 25.0)
    assert(out.getDouble(5) == r6(d))
    assert(out.getDouble(6) == r6(d * (1.0 - 3.0 / 7.0)))
    val se = math.sqrt(4.0 / 4.0 + d * d / 8.0)
    assert(out.getDouble(7) == r6(d - 1.96 * se))
    assert(out.getDouble(8) == r6(d + 1.96 * se))
    assert(out.getInt(9) == 1)
  }

  test("zero pooled variance is guarded: constant sides emit null d " +
      "and material 0") {
    val out = Drift.cohensD(
      side(("g", 5L), ("g", 5L)), side(("g", 9L), ("g", 9L)),
      col("x"), Seq("g")).head()
    assert(out.isNullAt(5) && out.getInt(9) == 0)
  }

  test("single-row sides are guarded; one-sided groups are absent") {
    val rows = Drift.cohensD(
      side(("a", 1L), ("a", 3L), ("b", 7L)),
      side(("a", 2L), ("a", 4L), ("c", 9L)),
      col("x"), Seq("g")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a"))
  }

  test("q292 on the real corpus (sf0.01): the planted 1-URGENT +10% " +
      "is significant (CI excludes 0) but NOT material (|d| < 0.2) — " +
      "the exact distinction the query exists to draw") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .effectSizeQ(spark, "/root/testdata/sf0.01").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      val u = byG("1-URGENT")
      assert(u.getDouble(5) > 0.1 && u.getDouble(5) < 0.2)
      assert(u.getDouble(7) > 0.0, "CI should exclude zero")
      assert(u.getInt(9) == 0)
      byG.filterKeys(_ != "1-URGENT").values.foreach { r =>
        assert(math.abs(r.getDouble(5)) < 0.05,
          s"unexpected effect on ${r.getString(0)}")
      }
    }
  }
}
