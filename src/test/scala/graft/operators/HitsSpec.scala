package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.hits]] — reference-implementation equality (BigInt
  * replay of the fixed-point rounds), role separation on directed
  * graphs, and the normalization/mass invariants.
  */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  private val Scale = BigInt(1000000000000L)

  /** Exact BigInt replay of the operator's contract: init
    * `scale div n`, per round hub-sum → L1-renormalize → auth-sum →
    * L1-renormalize, every division a floor (all values positive).
    */
  private def reference(
      edges: Seq[(String, String)], iters: Int)
      : (Map[String, BigInt], Map[String, BigInt]) = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    def norm(raw: Map[String, BigInt]): Map[String, BigInt] = {
      val tot = raw.values.sum
      nodes.map(n => n -> raw.get(n).map(_ * Scale / tot)
        .getOrElse(BigInt(0))).toMap
    }
    var auth = nodes.map(n => n -> Scale / nodes.size).toMap
    var hub = auth
    for (_ <- 1 to iters) {
      hub = norm(e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => auth(x._2)).sum })
      auth = norm(e.groupBy(_._2).map { case (v, es) =>
        v -> es.map(x => hub(x._1)).sum })
    }
    (hub, auth)
  }

  // bipartite-ish purchase shape: c2 buys from both suppliers,
  // c1/c3 from one each; s3 is bought by the strong hub only
  private val g = Seq(
    ("c1", "s1"), ("c2", "s1"), ("c2", "s2"), ("c3", "s2"),
    ("c2", "s3"))

  test("matches the exact BigInt reference round for round") {
    for (iters <- 1 to 4) {
      val out = Analytics.hits(g.toDF("src", "dst"), "src", "dst",
        iters = iters).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (h, a) = reference(g, iters)
      for ((n, (hv, av)) <- out) {
        assert(BigInt(hv) === h(n), s"hub($n) at iters=$iters")
        assert(BigInt(av) === a(n), s"auth($n) at iters=$iters")
      }
    }
  }

  test("roles separate: pure sources have zero authority, pure " +
      "sinks zero hub, and the two-supplier customer out-hubs the rest") {
    val out = Analytics.hits(g.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (c <- Seq("c1", "c2", "c3")) assert(out(c)._2 === 0L)
    for (s <- Seq("s1", "s2", "s3")) assert(out(s)._1 === 0L)
    assert(out("c2")._1 > out("c1")._1 && out("c2")._1 > out("c3")._1)
    // s3 is reachable only from the best hub — still a weaker
    // authority than the shared suppliers
    assert(out("s3")._2 < out("s1")._2)
  }

  test("L1 mass: each side sums to scale minus < n div-floor units") {
    val out = Analytics.hits(g.toDF("src", "dst"), "src", "dst",
      iters = 3).collect()
    val n = out.length
    val hubSum = out.map(_.getLong(1)).sum
    val authSum = out.map(_.getLong(2)).sum
    for (s <- Seq(hubSum, authSum)) {
      assert(s <= Scale.toLong && s > Scale.toLong - n)
    }
  }

  test("duplicate and null edges normalize away") {
    val dirty = (g ++ g ++ Seq((null: String, "s1"), ("c1", null)))
      .toDF("src", "dst")
    val clean = Analytics.hits(g.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val out = Analytics.hits(dirty, "src", "dst")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === clean)
  }
}
