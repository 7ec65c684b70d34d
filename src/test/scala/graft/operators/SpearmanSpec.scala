package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.spearmanCorr]] — monotone invariance, tie averaging
  * against a naive reference, sign, and degenerate groups.
  */
class SpearmanSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Double, Double)]) =
    Analytics.spearmanCorr(rows.toDF("g", "x", "y"), "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("any strictly monotone map scores exactly 1 (where Pearson " +
      "would not)") {
    val rows = Seq(1.0, 2.0, 5.0, 9.0, 40.0)
      .map(x => ("g", x, x * x * x))
    assert(run(rows)("g") === Some(1.0))
    val rev = rows.map { case (g, x, y) => (g, x, -y) }
    assert(run(rev)("g") === Some(-1.0))
  }

  test("tie averaging matches the naive average-rank Pearson") {
    val xs = Seq(1.0, 1.0, 2.0, 3.0, 3.0, 3.0)
    val ys = Seq(2.0, 1.0, 2.0, 2.0, 3.0, 4.0)
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted.zipWithIndex
      val byVal = sorted.groupBy(_._1)
        .map { case (x, g) => x -> g.map(_._2 + 1).sum.toDouble / g.size }
      v.map(byVal)
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (u, w) => (u - ma) * (w - mb) }.sum
      val va = a.map(u => (u - ma) * (u - ma)).sum
      val vb = b.map(w => (w - mb) * (w - mb)).sum
      cov / math.sqrt(va * vb)
    }
    val want = pearson(avgRanks(xs), avgRanks(ys))
    val got = run(xs.zip(ys).map { case (x, y) => ("g", x, y) })("g").get
    assert(math.abs(got - want) < 1e-6)
  }

  test("groups are independent and degenerate groups yield null") {
    val rows =
      Seq(("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
        ("down", 1.0, 3.0), ("down", 2.0, 2.0), ("down", 3.0, 1.0),
        ("flat", 5.0, 1.0), ("flat", 5.0, 2.0), ("flat", 5.0, 3.0))
    val out = run(rows)
    assert(out("up") === Some(1.0))
    assert(out("down") === Some(-1.0))
    assert(out("flat") === None) // zero x-rank variance
  }

  test("null values drop pairwise") {
    val df = Seq[(String, java.lang.Double, java.lang.Double)](
      ("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0),
      ("g", null, 99.0), ("g", 99.0, null))
      .toDF("g", "x", "y")
    val out = Analytics.spearmanCorr(df, "x", "y", Seq("g")).collect()(0)
    assert(out.getAs[Long]("n") === 3L)
    assert(out.getAs[Double]("rho") === 1.0)
  }

  test("outlier leverage is capped: one extreme y moves rho only " +
      "by its rank step") {
    val base = (1 to 10).map(i => ("g", i.toDouble, i.toDouble))
    val spiked = base.init :+ (("g", 10.0, 1e9))
    assert(run(base)("g") === Some(1.0))
    assert(run(spiked)("g") === Some(1.0)) // still top rank — unmoved
  }

  test("BIGINT values above 2^53 rank on the native value: adjacent " +
      "longs that collide as doubles stay distinct") {
    // 2^60 and 2^60+1 are the same double; ranking on the native long
    // must still see the second as strictly larger. x inverts their
    // order vs y → a real rank difference only native ranking detects.
    val big = 1L << 60
    val df = Seq(
      ("g", big, big + 1), ("g", big + 1, big), ("g", 0L, 0L))
      .toDF("g", "x", "y")
    val out = Analytics.spearmanCorr(df, "x", "y", Seq("g")).collect()(0)
    assert(out.getAs[Long]("n") === 3L)
    // native ranks: x = (2,3,1) vs y = (3,2,1) → rho = 1/2 exactly;
    // a double-cast rank would tie the two big values on both sides
    // and read rho = 1
    assert(out.getAs[Double]("rho") === 0.5)
  }
}
