package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.degreeAssortativity]] — sign on canonical
  * hub-and-spoke vs chained-hub graphs, the regular-graph null
  * guard, duplicate/self-edge tolerance, and the q322 neutral read
  * on the real basket graph.
  */
class AssortativitySpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = df(
    StructType(Seq(
      StructField("a", LongType),
      StructField("b", LongType))),
    rows.map { case (x, y) => Row(x, y) })

  private def r(rows: (Long, Long)*): Row =
    Analytics.degreeAssortativity(edges(rows: _*), "a", "b").head()

  test("a star is maximally disassortative: r = -1") {
    val out = r((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(out.getLong(0) == 5L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == -1.0)
  }

  test("two hubs joined to each other plus leaves read NEGATIVE " +
      "(hub-leaf edges dominate); a hub-hub-only core reads " +
      "POSITIVE when leaves pair among themselves") {
    val hubSpoke = r((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L),
      (2L, 6L), (2L, 7L), (1L, 2L))
    assert(hubSpoke.getDouble(2) < 0.0)
    // assortative: two triangles (degree-2 with degree-2) plus a
    // disjoint pair of degree-1 nodes pairing with each other
    val mixed = r((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (7L, 8L))
    assert(mixed.getDouble(2) > 0.0)
  }

  test("a regular graph (every degree equal) has no degree variance: " +
      "null r") {
    // a 4-cycle: every node degree 2
    val out = r((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(out.isNullAt(2))
  }

  test("duplicate and self edges drop before degrees are counted") {
    val clean = r((1L, 2L), (1L, 3L), (1L, 4L))
    val dirty = r((1L, 2L), (2L, 1L), (1L, 1L), (1L, 3L), (1L, 4L),
      (1L, 3L))
    assert(clean.getDouble(2) == dirty.getDouble(2))
    assert(clean.getLong(1) == dirty.getLong(1))
  }

  test("q322 on the real corpus: the random-basket co-purchase " +
      "graph reads neutral attachment (|r| < 0.05) — the " +
      "calibration point the scaladoc promises") {
    graft.core.CacheScope.withScope {
      val out = graft.registry.AnalyticsRegistry
        .assortativityQ(spark, "/root/testdata/sf0.001").head()
      assert(out.getLong(0) > 0L && out.getLong(1) > 0L)
      assert(math.abs(out.getDouble(2)) < 0.05,
        s"expected neutral, got ${out.getDouble(2)}")
    }
  }
}
