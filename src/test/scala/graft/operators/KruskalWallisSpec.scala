package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.kruskalWallis]] — closed forms (no-tie and tied
  * pooled ranks), the degenerate guards, the dof-keyed critical
  * lookup, and the planted q291 MACHINERY shift on the real corpus.
  */
class KruskalWallisSpec extends SparkSpec {

  private def samplesDf(rows: (String, String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("cat", StringType),
      StructField("v", LongType))),
    rows.map { case (g, c, v) => Row(g, c, v) })

  private def kw(rows: (String, String, Long)*) =
    Analytics.kruskalWallis(samplesDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("cat"),
      org.apache.spark.sql.functions.col("v"))

  test("closed form, no ties: A={1,2} B={3,4} gives H = 2.4 " +
      "(rank sums 3 and 7) and no tie correction") {
    val out = kw(("g", "A", 1L), ("g", "A", 2L),
      ("g", "B", 3L), ("g", "B", 4L)).head()
    assert(out.getLong(1) == 4L && out.getLong(2) == 2L)
    assert(out.getInt(3) == 1) // dof
    assert(out.getDouble(4) == 2.4 && out.getDouble(5) == 2.4)
    assert(out.getInt(6) == 0) // 2.4 < 3.841
  }

  test("closed form with ties: A={1,1} B={2} gives H = 1.5, " +
      "C = 0.75, H' = 2.0") {
    val out = kw(("g", "A", 1L), ("g", "A", 1L), ("g", "B", 2L))
      .head()
    assert(out.getDouble(4) == 1.5)
    assert(out.getDouble(5) == 2.0)
  }

  test("single category cannot differ: H null, differs 0") {
    val out = kw(("g", "A", 1L), ("g", "A", 2L)).head()
    assert(out.getLong(2) == 1L && out.isNullAt(4) && out.getInt(6) == 0)
  }

  test("all values tied across categories: C = 0 is guarded, " +
      "H' null, differs 0") {
    val out = kw(("g", "A", 5L), ("g", "A", 5L),
      ("g", "B", 5L)).head()
    // H = 3*terms/1e6/(N(N+1)) - 3(N+1) with everything tied is 0;
    // corr = 1 - (27-3)/(27-3) = 0 -> guarded null
    assert(out.isNullAt(5) && out.getInt(6) == 0)
  }

  test("q291 on the real corpus: the planted MACHINERY shift is the " +
      "only segment past its dof-4 critical value") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .kruskalWallisQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("MACHINERY").getInt(6) == 1)
      assert(byG("MACHINERY").getDouble(5) > 9.487729)
      byG.filterKeys(_ != "MACHINERY").values.foreach { r =>
        assert(r.getInt(6) == 0, s"false alarm: ${r.getString(0)}")
      }
    }
  }
}
