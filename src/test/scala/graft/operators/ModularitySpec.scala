package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.modularityScore]] — the exact-integer identity on
  * hand-computed graphs, negative contributions, and the composition
  * with [[Analytics.labelPropagation]].
  */
class ModularitySpec extends SparkSpec {

  import spark.implicits._

  // two triangles + one bridge: m = 7
  private def edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")

  test("hand-computed contributions for the two-triangle split") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "community")
    val out = Analytics.modularityScore(edges, "a", "b", labels)
      .orderBy("community").collect()
    // community 1: e=3, d=2+2+3=7 → (4·7·3 − 49)·1e6 div (4·49)
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === 3L)
    assert(out(0).getLong(3) === 7L)
    assert(out(0).getLong(4) === (4L * 7 * 3 - 49) * 1000000 / (4 * 49))
    // symmetric for community 4
    assert(out(1).getLong(4) === out(0).getLong(4))
    // total Q = 2·(35/196) ≈ 0.357 — positive, in µ-units
    assert(out.map(_.getLong(4)).sum > 300000L)
  }

  test("an anti-community labeling yields negative contributions " +
      "(truncation toward zero)") {
    // split ACROSS the triangles: {1,2,4} vs {3,5,6}
    val labels = Seq((1L, 1L), (2L, 1L), (4L, 1L),
      (3L, 2L), (5L, 2L), (6L, 2L)).toDF("node", "community")
    val out = Analytics.modularityScore(edges, "a", "b", labels)
      .orderBy("community").collect()
    // community 1: internal edges = {1-2} only; d = 2+2+3 = 7
    assert(out(0).getLong(2) === 1L)
    val want = (4L * 7 * 1 - 49) * 1000000 / (4 * 49) // negative, trunc
    assert(out(0).getLong(4) === want && want < 0)
  }

  test("all-in-one-community scores exactly zero") {
    val labels = (1L to 6L).map(n => (n, 0L)).toDF("node", "community")
    val out = Analytics.modularityScore(edges, "a", "b", labels).collect()
    assert(out.length === 1)
    // e = m and d = 2m → 4m·m − 4m² = 0
    assert(out(0).getLong(4) === 0L)
  }

  test("composes with labelPropagation: the LPA cut on the bridged " +
      "triangles is positive and matches the hand labeling") {
    val lpa = Analytics.labelPropagation(edges, "a", "b", rounds = 3)
    val out = Analytics.modularityScore(edges, "a", "b", lpa)
      .agg(sum("q_contrib_micro")).head.getLong(0)
    assert(out > 300000L)
  }
}
