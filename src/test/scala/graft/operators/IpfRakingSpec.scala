package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.ipfRaking]] — a naive BigInt replication of the
  * half-step recurrence, margin convergence, the proportional-sample
  * fixpoint, and the margins-cover-sample contract.
  */
class IpfRakingSpec extends SparkSpec {

  private def cells(rows: (String, String)*) = df(
    StructType(Seq(
      StructField("i", StringType),
      StructField("j", StringType))),
    rows.map { case (i, j) => Row(i, j) })

  private def margins(c: String, rows: (String, Long)*) = df(
    StructType(Seq(
      StructField(c, StringType),
      StructField("target", LongType))),
    rows.map { case (l, t) => Row(l, t) })

  /** Independent replication: BigInt half-steps over a dense map. */
  private def naive(
      counts: Map[(String, String), Long],
      rm: Map[String, Long], cm: Map[String, Long],
      iters: Int): Map[(String, String), Long] = {
    var w = counts.map { case (k, n) => k -> BigInt(n) * 1000000 }
    for (step <- 1 to 2 * iters) {
      val byAxis: ((String, String)) => String =
        if (step % 2 == 1) _._1 else _._2
      val marg = if (step % 2 == 1) rm else cm
      val sums = w.groupBy { case (k, _) => byAxis(k) }
        .map { case (a, m) => a -> m.values.sum }
      w = w.map { case (k, v) =>
        k -> (v * marg(byAxis(k)) * 1000000) / sums(byAxis(k))
      }
    }
    w.map { case (k, v) => k -> v.toLong }
  }

  private def expand(counts: Map[(String, String), Long]) =
    counts.toSeq.flatMap { case ((i, j), n) =>
      Seq.fill(n.toInt)((i, j)) }

  test("naive BigInt replication of 3 full iterations on a skewed " +
      "2x2 table") {
    val counts = Map(("a", "x") -> 1L, ("a", "y") -> 3L,
      ("b", "x") -> 2L, ("b", "y") -> 2L)
    val rm = Map("a" -> 8L, "b" -> 12L)
    val cm = Map("x" -> 10L, "y" -> 10L)
    val out = Analytics.ipfRaking(cells(expand(counts): _*), "i", "j",
      margins("i", rm.toSeq: _*), margins("j", cm.toSeq: _*),
      iters = 3).collect()
    val exp = naive(counts, rm, cm, 3)
    assert(out.length == 4)
    out.foreach { r =>
      val k = (r.getAs[String]("i"), r.getAs[String]("j"))
      assert(r.getAs[Long]("w_micro") == exp(k), s"cell $k")
      assert(r.getAs[Long]("n_sample") == counts(k))
    }
  }

  test("column margins are matched exactly after the final (column) " +
      "half-step; row margins to within iteration tolerance") {
    val counts = Map(("a", "x") -> 5L, ("a", "y") -> 1L,
      ("b", "x") -> 1L, ("b", "y") -> 5L)
    val rm = Map("a" -> 100L, "b" -> 50L)
    val cm = Map("x" -> 60L, "y" -> 90L)
    val out = Analytics.ipfRaking(cells(expand(counts): _*), "i", "j",
      margins("i", rm.toSeq: _*), margins("j", cm.toSeq: _*),
      iters = 3).collect()
    val byCol = out.groupBy(_.getAs[String]("j"))
      .map { case (jv, rs) => jv -> rs.map(_.getAs[Long]("w_micro")).sum }
    // the last half-step scales columns: off only by the per-cell
    // floor residue (< 1 micro each)
    assert(math.abs(byCol("x") - 60L * 1000000) <= 2L)
    assert(math.abs(byCol("y") - 90L * 1000000) <= 2L)
    val byRow = out.groupBy(_.getAs[String]("i"))
      .map { case (iv, rs) => iv -> rs.map(_.getAs[Long]("w_micro")).sum }
    // rows carry the IPF iteration error — on this deliberately
    // skewed 5:1 table, ~2 weight units out of 150 after 3 rounds
    assert(math.abs(byRow("a") - 100L * 1000000) < 5000000L)
  }

  test("a sample already proportional to both margins is a fixpoint " +
      "(weights = the uniform scale)") {
    val counts = Map(("a", "x") -> 2L, ("a", "y") -> 2L,
      ("b", "x") -> 2L, ("b", "y") -> 2L)
    val rm = Map("a" -> 8L, "b" -> 8L)
    val cm = Map("x" -> 8L, "y" -> 8L)
    val out = Analytics.ipfRaking(cells(expand(counts): _*), "i", "j",
      margins("i", rm.toSeq: _*), margins("j", cm.toSeq: _*),
      iters = 2).collect()
    out.foreach(r => assert(r.getAs[Long]("w_micro") == 4000000L))
  }

  test("weight_ratio is the mirrored w/(n·1e6) division") {
    val counts = Map(("a", "x") -> 2L, ("b", "x") -> 2L)
    val rm = Map("a" -> 6L, "b" -> 2L)
    val cm = Map("x" -> 8L)
    val out = Analytics.ipfRaking(cells(expand(counts): _*), "i", "j",
      margins("i", rm.toSeq: _*), margins("j", cm.toSeq: _*),
      iters = 1).collect()
      .map(r => r.getAs[String]("i") -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("weight_ratio") ==
      math.rint(a.getAs[Long]("w_micro").toDouble /
        (a.getAs[Long]("n_sample").toDouble * 1e6) * 1e6) / 1e6)
  }
}
