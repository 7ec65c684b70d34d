package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.kCore]] — peel semantics on graphs where plain degree
  * thresholding gets the answer wrong, plus the cut-off contract.
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 30) = {
    val (labels, converged) =
      Analytics.kCore(edges.toDF("a", "b"), "a", "b", k, maxRounds)
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      converged)
  }

  // triangle 1-2-3 with a pendant chain 3-4-5-6: every chain node has
  // degree ≥ 1, node 4 has degree 2, but the 2-core is ONLY the
  // triangle — the chain unravels over three peel rounds
  private val triangleChain = Seq[(Long, Long)](
    (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6))

  test("2-core keeps the triangle and unravels the whole pendant " +
      "chain (cascade, not one-shot threshold)") {
    val (labels, converged) = core(triangleChain, k = 2)
    assert(converged)
    assert(labels == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("3-core of the triangle graph is empty (degree within the " +
      "subgraph, not the input)") {
    val (labels, converged) = core(triangleChain, k = 3)
    assert(converged)
    assert(labels.isEmpty)
  }

  test("duplicate, reversed, and self-loop edges canonicalize away") {
    val messy = triangleChain ++ Seq[(Long, Long)](
      (2L, 1L), (1L, 2L), (3L, 3L))
    assert(core(messy, k = 2) == core(triangleChain, k = 2))
  }

  test("core_degree is the degree INSIDE the core") {
    // K4 plus one extra node 5 attached to 1 and 2: 3-core = K4 with
    // degrees 3, node 5 (degree 2) peels
    val k4 = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val (labels, converged) = core(k4 ++ Seq((1L, 5L), (2L, 5L)), k = 3)
    assert(converged)
    assert(labels == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("maxRounds cut-off returns converged=false and a SUPERSET of " +
      "the core; extra rounds past the fixpoint are a no-op") {
    val (partial, convergedEarly) = core(triangleChain, 2, maxRounds = 1)
    assert(!convergedEarly)
    assert(Set(1L, 2L, 3L).subsetOf(partial.keySet)) // superset
    // 6 peeled in round 1, chain still present
    assert(partial.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val (full, c2) = core(triangleChain, 2, maxRounds = 30)
    assert(c2 && full.keySet == Set(1L, 2L, 3L))
  }
}
