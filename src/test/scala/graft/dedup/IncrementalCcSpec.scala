package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ConnectedComponents.incremental]] — the fold-in must equal a
  * batch recompute on the union graph, on every merge shape: old
  * components merging with each other, brand-new nodes bridging old
  * components, fresh-only components, and replayed batches.
  */
class IncrementalCcSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]) =
    ConnectedComponents.componentsAuto(
      edges.toDF("a", "b"), "a", "b")._1

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(old: Seq[(Long, Long)], batch: Seq[(Long, Long)]) = {
    val inc = ConnectedComponents.incremental(
      labelsOf(old), batch.toDF("a", "b"), "a", "b")
    assert(asMap(inc) == asMap(labelsOf(old ++ batch)))
  }

  test("a batch edge merging two standing components relabels BOTH " +
      "to the global minimum") {
    check(old = Seq((1, 2), (10, 11)), batch = Seq((2, 10)))
  }

  test("a fresh node bridging two standing components merges them " +
      "through it") {
    check(old = Seq((1, 2), (10, 11)), batch = Seq((2, 99), (99, 10)))
  }

  test("a fresh-only component labels by its own minimum") {
    check(old = Seq((1, 2)), batch = Seq((50, 51), (51, 52)))
  }

  test("a chain of merges across old components converges (the " +
      "contracted graph is itself multi-hop)") {
    check(
      old = Seq((1, 2), (10, 11), (20, 21), (30, 31)),
      batch = Seq((2, 10), (11, 20), (21, 30)))
  }

  test("a new minimum arriving in the batch wins: fresh node 0 joins " +
      "component {5,6}") {
    check(old = Seq((5, 6)), batch = Seq((0, 6)))
  }

  test("replaying an already-folded batch is a no-op (idempotence — " +
      "the streaming-maintenance contract)") {
    val old = Seq[(Long, Long)]((1, 2), (10, 11))
    val batch = Seq[(Long, Long)]((2, 10), (50, 51))
    val once = ConnectedComponents.incremental(
      labelsOf(old), batch.toDF("a", "b"), "a", "b")
    val twice = ConnectedComponents.incremental(
      once, batch.toDF("a", "b"), "a", "b")
    assert(asMap(once) == asMap(twice))
    assert(asMap(once) == asMap(labelsOf(old ++ batch)))
  }

  test("an empty batch passes the standing labels through untouched") {
    val old = Seq[(Long, Long)]((1, 2), (10, 11))
    val inc = ConnectedComponents.incremental(
      labelsOf(old), Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(asMap(inc) == asMap(labelsOf(old)))
  }
}
