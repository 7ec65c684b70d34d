package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.pageHinkley]] — hand-traced PH recursions (step shift,
  * slack discount, floor of the running mean), the never-negative
  * invariant, and the planted q286 step on the real corpus.
  */
class PageHinkleySpec extends SparkSpec {

  private def seriesDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("bx", LongType),
      StructField("y", LongType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  private def ph(delta: Long, lambda: Long, rows: (String, Long, Long)*) =
    Analytics.pageHinkley(seriesDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("bx"),
      org.apache.spark.sql.functions.col("y"), delta, lambda)

  test("hand trace, delta=0: flat {10,10,10} then 22 gives " +
      "ph_max = (22-13)e6 = 9e6 and the alarm lands on the step") {
    val out = ph(0L, 5000000L,
      ("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 10L),
      ("g", 4L, 22L)).head()
    assert(out.getLong(1) == 4L)
    assert(out.getLong(2) == 9000000L)
    assert(out.getLong(3) == 4L && out.getInt(4) == 1)
  }

  test("hand trace, delta=1e6: the slack drains the flat prefix to " +
      "its running min, so the step's PH gains the drained depth") {
    val out = ph(1000000L, 100000000L,
      ("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 10L),
      ("g", 4L, 22L)).head()
    // m: -1e6, -2e6, -3e6, then term 9e6-1e6=8e6 -> m=5e6, min=-3e6
    assert(out.getLong(2) == 8000000L)
    assert(out.isNullAt(3) && out.getInt(4) == 0)
  }

  test("running mean floors exactly: {1,2} gives mean floor(3e6/2) " +
      "and term 5e5 at t=2") {
    val out = ph(0L, 1L, ("g", 1L, 1L), ("g", 2L, 2L)).head()
    assert(out.getLong(2) == 500000L)
  }

  test("monotone-decreasing series never alarms upward: PH stays 0") {
    val out = ph(0L, 1L,
      ("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 10L)).head()
    assert(out.getLong(2) == 0L && out.getInt(4) == 0)
  }

  test("buckets average within themselves: two rows in one bucket " +
      "read as their mean, not their sum") {
    val out = ph(0L, 1L,
      ("g", 1L, 10L), ("g", 1L, 20L), ("g", 2L, 15L)).head()
    // bucket 1 mean = 15e6 -> bucket 2 term = 0, ph stays 0
    assert(out.getLong(1) == 2L && out.getLong(2) == 0L)
  }

  test("q286 on the real corpus: the 1.5x purchase step from day 21 " +
      "alarms inside the shifted window; clean types stay quiet") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .pageHinkleyQ(spark, "/root/testdata/sf0.001").collect()
      val byType = rows.map(r => r.getString(0) -> r).toMap
      val p = byType("purchase")
      assert(p.getInt(4) == 1 && p.getLong(3) >= 20L,
        s"purchase alarm at ${p.get(3)}")
      Seq("click", "error", "signup", "view").foreach { ty =>
        assert(byType(ty).getInt(4) == 0, s"$ty false alarm")
      }
    }
  }
}
