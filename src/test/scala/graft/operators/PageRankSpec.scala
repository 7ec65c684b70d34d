package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Fixed-point PageRank ([[Analytics.pageRank]]). */
class PageRankSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("s", StringType),
    StructField("d", StringType)))

  private def edges(es: (String, String)*) =
    df(schema, es.map { case (a, b) => Row(a, b) })

  /** Exact driver replay of the fixed-point iteration. */
  private def replay(
      es: Seq[(String, String)], iters: Int,
      damping: Int = 850): Map[String, Long] = {
    val e = es.distinct
    val deg = e.groupBy(_._1).map { case (k, xs) => k -> xs.length }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    val scale = 1000000000000L
    val teleport = ((1000L - damping) * scale / 1000L) / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) =>
          (damping * r(u)) / (1000L * deg(u)) }.sum
      }
      r = nodes.map(v => v -> (teleport + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("ranks equal the exact integer replay on an asymmetric graph " +
      "(hub, spokes, dangling-free cycle)") {
    val es = Seq("a" -> "b", "c" -> "b", "d" -> "b", "b" -> "a",
      "a" -> "c", "c" -> "d", "d" -> "a")
    val got = Analytics.pageRank(edges(es: _*), "s", "d", iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == replay(es, 6))
    // the hub every node points at outranks the spokes
    assert(got("b") > got("c") && got("b") > got("d"))
  }

  test("a symmetric two-node cycle splits mass equally") {
    val got = Analytics.pageRank(
        edges("x" -> "y", "y" -> "x"), "s", "d", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("x") == got("y"))
  }

  test("mass conserves up to the documented sub-1e-12-per-edge floor " +
      "leak, never exceeds the scale") {
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val total = Analytics.pageRank(edges(es: _*), "s", "d", iters = 8)
      .collect().map(_.getLong(1)).sum
    val scale = 1000000000000L
    assert(total <= scale)
    // leak bound: per round, < 1 unit per edge + n units of teleport
    // truncation; 8 rounds x (4 edges + 3) is ~56 units of 1e12
    assert(total > scale - 1000L)
  }

  test("dangling-mass identity: a sink node's damped mass is DROPPED " +
      "per iteration (the documented semantics), exactly matching the " +
      "replay and the closed-form one-round identity") {
    // c has in-edges but no out-edges: a dangling sink
    val es = Seq("a" -> "b", "b" -> "c", "a" -> "c")
    val got = Analytics.pageRank(edges(es: _*), "s", "d", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == replay(es, 1))
    // one-round identity: total_1 = n·teleport + Σ_{u: deg>0} Σ_edges
    // (850·r0(u) div (1000·deg(u))) — c's 850·r0(c)/1000 appears
    // NOWHERE on the right-hand side
    val scale = 1000000000000L
    val n = 3L
    val teleport = (150L * scale / 1000L) / n
    val r0 = scale / n
    val fromA = (850L * r0) / (1000L * 2) * 2 // a→b, a→c
    val fromB = (850L * r0) / (1000L * 1)     // b→c
    assert(got.values.sum == n * teleport + fromA + fromB)
    // and the dropped dangling mass is visible: total shrank by more
    // than the div-remainder floor leak alone could explain
    assert(got.values.sum < scale - (850L * r0) / 1000L + 1000L)
  }

  test("duplicate edge rows collapse before degree counting") {
    val dup = Analytics.pageRank(
        edges("x" -> "y", "x" -> "y", "y" -> "x"), "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dup == replay(Seq("x" -> "y", "y" -> "x"), 3))
  }

  test("partitioning never changes a rank (exact integer arithmetic)") {
    val es = (1 to 40).map(i => s"n$i" -> s"n${i * 7 % 40 + 1}") ++
      (1 to 40).map(i => s"n${i * 7 % 40 + 1}" -> s"n$i")
    val one = Analytics.pageRank(
        edges(es: _*).repartition(1), "s", "d", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = Analytics.pageRank(
        edges(es: _*).repartition(7), "s", "d", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == many)
    assert(one == replay(es, 5))
  }
}
