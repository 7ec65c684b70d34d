package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.mannKendall]] — closed forms on hand-computed series
  * (strict monotone, ties, flat), the n<2 guards, and the planted
  * q285 trend on the real corpus.
  */
class MannKendallSpec extends SparkSpec {

  private def seriesDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("bx", LongType),
      StructField("y", LongType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  private def mk(rows: (String, Long, Long)*) =
    Analytics.mannKendall(seriesDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("bx"),
      org.apache.spark.sql.functions.col("y"))

  test("strictly increasing n=5: S = 10 = n(n-1)/2, tau = 1, " +
      "var_num = 5*4*15 = 300, z = 9/sqrt(300/18)") {
    val out = mk((1L to 5L).map(i => ("g", i, 10L * i)): _*).head()
    assert(out.getLong(1) == 5L && out.getLong(2) == 10L)
    assert(out.getLong(3) == 300L)
    assert(out.getDouble(4) == 1.0)
    val want = 9.0 / math.sqrt(300.0 / 18.0)
    assert(out.getDouble(5) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(out.getInt(6) == 1)
  }

  test("ties shrink the variance numerator: y = {1,1,2} has one " +
      "tie pair of t=2 -> var_num = 3*2*11 - 2*1*9 = 48, S = 2") {
    val out = mk(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 2L)).head()
    assert(out.getLong(2) == 2L && out.getLong(3) == 48L)
  }

  test("flat series: S = 0, z = 0, all-tied var_num can go " +
      "non-positive -> z null and trending 0, never NaN") {
    val out = mk(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L)).head()
    assert(out.getLong(2) == 0L)
    // var_num = 3*2*11 - 3*2*11 = 0 -> guarded
    assert(out.getLong(3) == 0L && out.isNullAt(5))
    assert(out.getInt(6) == 0)
  }

  test("single-bucket group: tau and z null, trending 0") {
    val out = mk(("g", 1L, 5L)).head()
    assert(out.getLong(1) == 1L && out.isNullAt(4) && out.isNullAt(5))
    assert(out.getInt(6) == 0)
  }

  test("q285 on the real corpus: the planted purchase growth is " +
      "flagged with a decisively positive tau") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .mannKendallQ(spark, "/root/testdata/sf0.001").collect()
      val p = rows.find(_.getString(0) == "purchase").get
      assert(p.getDouble(4) > 0.1, s"tau ${p.getDouble(4)}")
      assert(p.getDouble(5) > 1.96 && p.getInt(6) == 1)
    }
  }
}
