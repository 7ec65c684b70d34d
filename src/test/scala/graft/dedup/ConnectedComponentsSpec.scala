package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ConnectedComponentsSpec extends SparkSpec {

  private def edges(rows: (Int, Int)*) = df(
    StructType(Seq(
      StructField("id_a", IntegerType),
      StructField("id_b", IntegerType))),
    rows.map { case (a, b) => Row(a, b) })

  private def comps(e: org.apache.spark.sql.DataFrame): Map[Int, Int] =
    ConnectedComponents.components(e, "id_a", "id_b")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

  test("a chain collapses to the minimum id") {
    // 1-2, 2-3, 3-4: min label 1 must flood the whole chain
    val m = comps(edges((1, 2), (2, 3), (3, 4)))
    assert(m == Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1))
  }

  test("disjoint components keep separate labels") {
    val m = comps(edges((1, 2), (10, 11), (11, 12)))
    assert(m == Map(1 -> 1, 2 -> 1, 10 -> 10, 11 -> 10, 12 -> 10))
  }

  test("cycles converge") {
    val m = comps(edges((1, 2), (2, 3), (3, 1)))
    assert(m == Map(1 -> 1, 2 -> 1, 3 -> 1))
  }

  test("edge direction does not matter (undirected)") {
    // min id arrives via the 'b' side
    val m = comps(edges((5, 1), (5, 6)))
    assert(m == Map(1 -> 1, 5 -> 1, 6 -> 1))
  }

  test("empty edge list yields empty components") {
    assert(comps(edges()) == Map.empty)
  }

  test("long path converges within maxIter (label floods one hop per " +
      "iteration)") {
    val path = (1 until 12).map(i => (i, i + 1))
    val m = comps(edges(path: _*))
    assert(m.values.toSet == Set(1))
    assert(m.size == 12)
  }

  test("componentsWithStatus reports convergence, and non-convergence " +
      "when maxIter is far smaller than needed") {
    val path = (1 until 40).map(i => (i, i + 1))
    val (_, ok) = ConnectedComponents.componentsWithStatus(
      edges(path: _*), "id_a", "id_b")
    assert(ok)
    val (labels, bad) = ConnectedComponents.componentsWithStatus(
      edges(path: _*), "id_a", "id_b", maxIter = 1)
    assert(!bad)
    // truncated propagation: labels exist but are not all the min id
    assert(labels.collect().map(_.getInt(1)).toSet != Set(1))
  }

  test("pointer jumping converges a 40-link chain within ~log-diameter " +
      "iterations (one-hop alone would need 39)") {
    val path = (1 until 40).map(i => (i, i + 1))
    val (labels, ok) = ConnectedComponents.componentsWithStatus(
      edges(path: _*), "id_a", "id_b", maxIter = 10)
    assert(ok, "should converge within 10 iterations via path halving")
    assert(labels.collect().map(_.getInt(1)).toSet == Set(1))
  }

  test("componentsAuto (driver union-find fast path) labels exactly " +
      "like the distributed loop on chains, cycles and disjoint parts") {
    val e = edges(
      (1, 2), (2, 3), (3, 4), // chain
      (10, 11), (11, 12), (12, 10), // cycle
      (20, 21), // pair
      (30, 31), (32, 31)) // shared min via middle node
    val dist = ConnectedComponents.components(e, "id_a", "id_b")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val (auto, converged) = ConnectedComponents.componentsAuto(
      e, "id_a", "id_b")
    assert(converged)
    // driver path preserves the INPUT id type (int here)
    val m = auto.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(m == dist)
  }

  test("componentsAuto falls back to the distributed loop above the " +
      "driver edge limit and still matches") {
    val path = (1 until 50).map(i => (i, i + 1))
    val e = edges(path: _*)
    val (auto, converged) = ConnectedComponents.componentsAuto(
      e, "id_a", "id_b", driverEdgeLimit = 10) // force distributed
    assert(converged)
    // over-limit path still returns the INPUT id type (int here)
    assert(auto.collect().map(_.getInt(1)).toSet == Set(1))
  }

  test("componentsAuto rejects non-integral id columns up front " +
      "(string ids would silently cast to null)") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val e = edges((1, 2), (2, 3))
      .select(concat(lit("n"), col("id_a")).as("id_a"),
        concat(lit("n"), col("id_b")).as("id_b"))
    val err = intercept[IllegalArgumentException] {
      ConnectedComponents.componentsAuto(e, "id_a", "id_b")
    }
    assert(err.getMessage.contains("integral"))
    // componentsWithStatus remains the string-id path
    val (labels, converged) = ConnectedComponents
      .componentsWithStatus(e, "id_a", "id_b")
    assert(converged)
    assert(labels.collect().map(_.getString(1)).toSet == Set("n1"))
  }
}
