package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.labelPropagation]] against a reference sync-LPA
  * implementation, and [[Analytics.fdAudit]] against hand-computed
  * group/row counts including the null-dependent rule.
  */
class LpaFdSpec extends SparkSpec {

  import spark.implicits._

  /** Reference sync LPA: same contract — most-common neighbor label,
    * ties to the smallest label, synchronous rounds.
    */
  private def refLpa(
      edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .distinct.filter { case (a, b) => a != b }
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(labels).groupBy(identity)
          .view.mapValues(_.size).toSeq
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def runLpa(edges: Seq[(Long, Long)], rounds: Int) =
    Analytics.labelPropagation(
        edges.toDF("a", "b"), "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles with one bridge separate into their own " +
      "communities; engine matches the reference on every round " +
      "count") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    for (r <- 1 to 4) {
      assert(runLpa(edges, r) === refLpa(edges, r), s"rounds=$r")
    }
    val c3 = runLpa(edges, 3)
    // the bridge does not merge the triangles
    assert(c3(1L) === c3(2L) && c3(2L) === c3(3L))
    assert(c3(4L) === c3(5L) && c3(5L) === c3(6L))
    assert(c3(1L) !== c3(4L))
  }

  test("self-loops, duplicates, and reversed edges canonicalize; " +
      "null endpoints are dropped") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (null, 3L), (3L, null))
      .toDF("a", "b")
    val out = Analytics.labelPropagation(df, "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out === refLpa(Seq((1L, 2L)), 2))
  }

  test("fdAudit: holding and violated FDs with exact counts; null " +
      "determinants excluded; null dependents count as distinct") {
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "x", "p"), (1L, "x", "p"),     // key 1 consistent
      (2L, "y", "p"), (2L, "z", "q"),     // key 2 violates b; c varies
      (3L, null, "p"),                    // null dependent
      (3L, "w", "p"),                     // with a non-null → violation
      (null, "v", "r"))                   // null determinant: excluded
      .toDF("k", "b", "c")
    val out = Analytics.fdAudit(df, Seq(("k", "b"), ("k", "c"), ("b", "c")))
      .orderBy("determinant", "dependent").collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val kb = byPair(("k", "b"))
    assert(kb.getLong(2) === 3L)  // groups 1,2,3
    assert(kb.getLong(3) === 2L)  // 2 {y,z}; 3 {null,w}
    assert(kb.getLong(4) === 6L)  // null-det row excluded
    assert(kb.getLong(5) === 4L)
    assert(kb.getInt(6) === 0)
    val kc = byPair(("k", "c"))
    assert(kc.getLong(3) === 1L)  // only key 2 {p,q}
    // b → c: groups w,x,y,z (null-b rows excluded): all single-valued
    val bc = byPair(("b", "c"))
    assert(bc.getLong(2) === 5L) // v,w,x,y,z
    assert(bc.getLong(3) === 0L)
    assert(bc.getInt(6) === 1)
  }
}
