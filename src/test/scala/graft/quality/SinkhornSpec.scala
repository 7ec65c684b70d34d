package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Drift.sinkhornTransport]] — a naive BigInt replication of the
  * half-step recurrence, the uniform-cost product plan, diagonal
  * transport for identical margins, and margin matching.
  */
class SinkhornSpec extends SparkSpec {

  private def marg(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("label", StringType),
      StructField("cnt", LongType))),
    rows.map { case (l, c) => Row(l, c) })

  private val ordCost = (i: org.apache.spark.sql.Column,
      j: org.apache.spark.sql.Column) =>
    abs(i.cast("long") - j.cast("long"))

  private def run(src: Seq[(String, Long)], dst: Seq[(String, Long)]) =
    Drift.sinkhornTransport(marg(src: _*), marg(dst: _*), ordCost)
      .collect()
      .map(r => (r.getAs[String]("src_label"),
        r.getAs[String]("dst_label")) ->
        ((r.getAs[Long]("cost"), r.getAs[Long]("plan_micro"),
          r.getAs[Long]("ot_cost_micro"))))
      .toMap

  /** Independent replication with BigInt maps. */
  private def naive(src: Seq[(String, Long)], dst: Seq[(String, Long)],
      iters: Int = 3): (Map[(String, String), Long], Long) = {
    val pt = src.map(_._2).sum
    val qt = dst.map(_._2).sum
    val p = src.map { case (l, c) => l -> c * 1000000L / pt }.toMap
    val q = dst.map { case (l, c) => l -> c * 1000000L / qt }.toMap
    val cost = for ((i, _) <- src; (j, _) <- dst)
      yield (i, j) -> math.abs(i.toLong - j.toLong)
    val k = cost.map { case (ij, c) =>
      ij -> math.floor(math.exp(-c.toDouble * 2) * 1e6).toLong }.toMap
    var u = src.map(_._1 -> 1000000L).toMap
    var v = dst.map(_._1 -> 1000000L).toMap
    for (_ <- 1 to iters) {
      u = src.map { case (i, _) =>
        val kv = dst.map { case (j, _) =>
          BigInt(k((i, j))) * v(j) }.sum
        i -> (BigInt(p(i)) * BigInt("1000000000000") / kv).toLong
      }.toMap
      v = dst.map { case (j, _) =>
        val ku = src.map { case (i, _) =>
          BigInt(k((i, j))) * u(i) }.sum
        j -> (BigInt(q(j)) * BigInt("1000000000000") / ku).toLong
      }.toMap
    }
    val plan = cost.map { case ((i, j), _) =>
      (i, j) -> ((BigInt(u(i)) * k((i, j)) / 1000000L) * v(j) /
        1000000L).toLong
    }.toMap
    val tc = plan.map { case (ij, pl) =>
      pl * cost.toMap.apply(ij) }.sum
    (plan, tc)
  }

  test("naive BigInt replication on a skewed 3x3 transport") {
    val src = Seq(("1", 50L), ("2", 30L), ("3", 20L))
    val dst = Seq(("1", 20L), ("2", 30L), ("3", 50L))
    val out = run(src, dst)
    val (plan, tc) = naive(src, dst)
    plan.foreach { case (ij, pl) =>
      assert(out(ij)._2 == pl, s"cell $ij") }
    out.values.foreach(v => assert(v._3 == tc))
  }

  test("identical margins transport (almost) everything on the " +
      "diagonal; the off-diagonal blur is the entropic price") {
    val m = Seq(("1", 40L), ("2", 40L), ("3", 20L))
    val out = run(m, m)
    val diag = Seq("1", "2", "3").map(l => out((l, l))._2).sum
    assert(diag > 800000L) // > 80% of the unit micro mass
    assert(out(("1", "3"))._2 < 20000L)
  }

  test("the plan's COLUMN sums match the destination margins almost " +
      "exactly (the final half-step is the column scaler); rows " +
      "carry the iteration error") {
    val src = Seq(("1", 70L), ("2", 30L))
    val dst = Seq(("1", 30L), ("2", 70L))
    val out = run(src, dst)
    val col1 = out(("1", "1"))._2 + out(("2", "1"))._2
    // q_1 = 300000 micro; per-cell floor residues only
    assert(math.abs(col1 - 300000L) < 10L)
    val row1 = out(("1", "1"))._2 + out(("1", "2"))._2
    assert(math.abs(row1 - 700000L) < 30000L)
  }
}
