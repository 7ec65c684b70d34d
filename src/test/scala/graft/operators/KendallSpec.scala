package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.kendallTauB]] — closed forms, tie correction against a
  * naive all-pairs reference, sign, degenerate groups, and group
  * independence.
  */
class KendallSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Int, Int)]) =
    Analytics.kendallTauB(rows.toDF("g", "x", "y"), "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  /** Naive all-pairs τ-b. */
  private def naive(rows: Seq[(Int, Int)]): Option[Double] = {
    val n = rows.size
    var c = 0L; var d = 0L
    for (i <- rows.indices; j <- (i + 1) until n) {
      val sx = math.signum(rows(j)._1 - rows(i)._1)
      val sy = math.signum(rows(j)._2 - rows(i)._2)
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
    }
    val tx2 = rows.groupBy(_._1).values
      .map(g => g.size.toLong * (g.size - 1)).sum
    val ty2 = rows.groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1)).sum
    val n02 = n.toLong * (n - 1)
    val denX = (n02 - tx2).toDouble
    val denY = (n02 - ty2).toDouble
    if (denX > 0 && denY > 0)
      Some(2.0 * (c - d) / math.sqrt(denX * denY))
    else None
  }

  test("perfect concordance scores 1, perfect reversal -1") {
    val up = (1 to 8).map(i => ("g", i, i * 10))
    assert(run(up)("g") === Some(1.0))
    val down = (1 to 8).map(i => ("g", i, -i))
    assert(run(down)("g") === Some(-1.0))
  }

  test("tie correction matches the naive all-pairs reference") {
    val rows = Seq((1, 2), (1, 1), (2, 2), (3, 2), (3, 3), (3, 1),
      (4, 4), (2, 4), (5, 3))
    val want = naive(rows).get
    val got = run(rows.map { case (x, y) => ("g", x, y) })("g").get
    assert(math.abs(got - want) < 1e-6, s"got $got want $want")
  }

  test("degenerate groups (one axis fully tied) yield null") {
    val allX = (1 to 5).map(i => ("g", 7, i))
    assert(run(allX)("g") === None)
    val single = Seq(("g", 1, 1))
    assert(run(single)("g") === None)
  }

  test("groups are independent; n and n_cells report per group") {
    val rows = (1 to 6).map(i => ("a", i, i)) ++
      Seq(("b", 1, 2), ("b", 2, 1), ("b", 1, 2))
    val out = Analytics.kendallTauB(
        rows.toDF("g", "x", "y"), "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("tau_b") === 1.0)
    assert(out("a").getAs[Long]("n") === 6L)
    assert(out("a").getAs[Long]("n_cells") === 6L)
    assert(out("b").getAs[Long]("n") === 3L)
    assert(out("b").getAs[Long]("n_cells") === 2L)
    val wantB = naive(Seq((1, 2), (2, 1), (1, 2))).get
    assert(math.abs(out("b").getAs[Double]("tau_b") - wantB) < 1e-6)
  }

  test("null x or y drops pairwise; agreement with Spearman's sign") {
    val df = Seq[(String, java.lang.Integer, java.lang.Integer)](
      ("g", 1, 1), ("g", 2, 3), ("g", 3, 2), ("g", null, 9),
      ("g", 9, null)).toDF("g", "x", "y")
    val out = Analytics.kendallTauB(df, "x", "y", Seq("g")).collect()(0)
    assert(out.getAs[Long]("n") === 3L)
    val want = naive(Seq((1, 1), (2, 3), (3, 2))).get
    assert(math.abs(out.getAs[Double]("tau_b") - want) < 1e-6)
  }
}
