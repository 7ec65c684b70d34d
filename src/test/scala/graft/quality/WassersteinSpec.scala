package graft.quality

import graft.SparkSpec

/** [[Drift.wassersteinTest]] — naive-reference equality, the
  * pure-shift identity that defines W₁'s units (shifting every value
  * by c moves W₁ by exactly c), and the one-sided / degenerate
  * contracts shared with [[Drift.ksTest]].
  */
class WassersteinSpec extends SparkSpec {

  import spark.implicits._

  private def w1(base: Seq[Double], cur: Seq[Double],
      threshold: Double = 1.0) = {
    val b = base.map(v => ("g", v)).toDF("g", "v")
    val c = cur.map(v => ("g", v)).toDF("g", "v")
    Drift.wassersteinTest(b, c, "v", Seq("g"), threshold).collect()(0)
  }

  /** Naive W₁ = Σ_k |F(v_k) − G(v_k)| · (v_{k+1} − v_k). */
  private def naive(x: Seq[Double], y: Seq[Double]): Double = {
    val n = x.size; val m = y.size
    val vals = (x ++ y).distinct.sorted
    var i = 0L; var j = 0L; var s = BigDecimal(0)
    for (k <- vals.indices.dropRight(1)) {
      i += x.count(_ == vals(k)); j += y.count(_ == vals(k))
      val gap = (BigInt(i) * m - BigInt(j) * n).abs
      s += BigDecimal(gap) * BigDecimal(vals(k + 1) - vals(k))
    }
    (s / (BigDecimal(n) * m)).toDouble
  }

  test("matches the naive segment-sum reference, with ties and " +
      "unequal sample sizes") {
    val x = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 8.0)
    val y = Seq(2.0, 3.0, 3.0, 4.0, 9.0)
    val got = w1(x, y).getAs[Double]("w1")
    assert(math.abs(got - naive(x, y)) < 1e-6,
      s"got $got want ${naive(x, y)}")
  }

  test("a pure shift by c reads exactly c — W₁ is in value units") {
    val x = (1 to 40).map(_.toDouble * 3)
    val shifted = x.map(_ + 700.0)
    val r = w1(x, shifted, threshold = 100.0)
    assert(math.abs(r.getAs[Double]("w1") - 700.0) < 1e-6)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("identical samples score exactly zero and don't flag") {
    val x = (1 to 50).map(_.toDouble)
    val r = w1(x, x)
    assert(r.getAs[Double]("w1") == 0.0)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("a symmetric variance change is visible (unlike a location " +
      "test): widening about the shared median moves mass outward") {
    val narrow = (-20 to 20).map(_ * 1.0)
    val wide = (-20 to 20).map(_ * 10.0)
    val r = w1(narrow, wide, threshold = 50.0)
    // each tail quartile moves ~ its distance: W₁ is large
    assert(r.getAs[Double]("w1") > 50.0)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("one-sided groups flag with null W₁, the ksTest contract") {
    val b = Seq(("g", 1.0), ("h", 2.0)).toDF("g", "v")
    val c = Seq(("g", 3.0)).toDF("g", "v")
    val rows = Drift.wassersteinTest(b, c, "v", Seq("g"), 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("h").getAs[Boolean]("drifted"))
    assert(rows("h").isNullAt(rows("h").fieldIndex("w1")))
    assert(!rows("g").isNullAt(rows("g").fieldIndex("w1")))
  }
}
