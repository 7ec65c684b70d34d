package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.cochranArmitage]] — closed form on a hand-computed
  * 2×3 dose table, the degenerate guards (all-success, one level),
  * and the planted q287 MACHINERY ladder on the real corpus.
  */
class CochranArmitageSpec extends SparkSpec {

  private def doseDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("w", LongType),
      StructField("f", LongType))),
    rows.map { case (g, w, f) => Row(g, w, f) })

  private def ca(rows: (String, Long, Long)*) =
    Analytics.cochranArmitage(doseDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("w"),
      org.apache.spark.sql.functions.col("f"))

  test("hand-computed 3-level ladder: rates 0/2, 1/2, 2/2 give " +
      "num = N*Swr - R*Swn = 48 - 36 = 12 and var = 43.2") {
    // levels w=1 (0 of 2), w=2 (1 of 2), w=3 (2 of 2): rising rate
    val rows = Seq(("g", 1L, 0L), ("g", 1L, 0L),
      ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 3L, 1L), ("g", 3L, 1L))
    val out = ca(rows: _*).head()
    assert(out.getLong(1) == 6L && out.getLong(2) == 3L)
    assert(out.getLong(3) == 3L) // n_levels
    // N=6 R=3 Swn=12 Swr=8 Sw2n=28
    // num = 6*8 - 3*12 = 12; var = 3*3*(6*28-144)/5 = 9*24/5 = 43.2
    val want = 12.0 / math.sqrt(9.0 * 24.0 / 5.0)
    assert(out.getDouble(4) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("all-success and all-failure groups are guarded: z null, " +
      "trending 0 (no variance to test against)") {
    val out = ca(("a", 1L, 1L), ("a", 2L, 1L),
      ("b", 1L, 0L), ("b", 2L, 0L))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").isNullAt(4) && out("a").getInt(5) == 0)
    assert(out("b").isNullAt(4) && out("b").getInt(5) == 0)
  }

  test("a single dose level cannot trend: z null") {
    val out = ca(("g", 2L, 1L), ("g", 2L, 0L)).head()
    assert(out.getLong(3) == 1L && out.isNullAt(4))
  }

  test("q287 on the real corpus: the planted MACHINERY dose-response " +
      "is flagged decisively with positive z") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .cochranArmitageQ(spark, "/root/testdata/sf0.001").collect()
      val m = rows.find(_.getString(0) == "MACHINERY").get
      assert(m.getDouble(4) > 3.0 && m.getInt(5) == 1)
    }
  }
}
