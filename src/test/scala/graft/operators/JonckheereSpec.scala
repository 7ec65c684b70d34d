package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.jonckheereTerpstra]] — hand-counted J on a perfect
  * ladder, exact tie half-credit, direction (one-sided increasing),
  * and the q319 MACHINERY dose ladder on the real corpus.
  */
class JonckheereSpec extends SparkSpec {

  private def dosed(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("w", LongType),
      StructField("v", LongType))),
    rows.map { case (g, w, v) => Row(g, w, v) })

  private def jt(rows: (String, Long, Long)*) =
    Analytics.jonckheereTerpstra(dosed(rows: _*), Seq("g"),
      col("w"), col("v"))

  test("perfect ladder: doses {1,2,3} x 2 values each, all " +
      "higher-dose values above -> J2 = 2 * (3 pairs * 4) = 24, " +
      "positive z") {
    val rows = Seq(
      ("g", 1L, 10L), ("g", 1L, 11L),
      ("g", 2L, 20L), ("g", 2L, 21L),
      ("g", 3L, 30L), ("g", 3L, 31L))
    val out = jt(rows: _*).head()
    // U_12 = U_13 = U_23 = 4 wins each -> J = 12, J2 = 24
    assert(out.getLong(3) == 24L)
    assert(out.getDouble(4) > 0.0)
  }

  test("ties take exact half-credit: a cross-dose tie contributes " +
      "1 to J2 (half a win in doubled units)") {
    val out = jt(("g", 1L, 5L), ("g", 2L, 5L)).head()
    assert(out.getLong(3) == 1L)
  }

  test("a DECREASING ladder scores negative z and never flags " +
      "(one-sided increasing contract)") {
    val rows = Seq(
      ("g", 1L, 30L), ("g", 1L, 31L),
      ("g", 2L, 20L), ("g", 2L, 21L),
      ("g", 3L, 10L), ("g", 3L, 11L))
    val out = jt(rows: _*).head()
    assert(out.getLong(3) == 0L && out.getDouble(4) < 0.0)
    assert(out.getInt(5) == 0)
  }

  test("q319 on the real corpus: MACHINERY's dose ladder fires; " +
      "every clean segment stays quiet") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .jonckheereQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("MACHINERY").getInt(5) == 1)
      assert(byG("MACHINERY").getDouble(4) > 1.96)
      byG.filterKeys(_ != "MACHINERY").values.foreach { r =>
        assert(r.getInt(5) == 0, s"${r.getString(0)} false alarm")
      }
    }
  }
}
