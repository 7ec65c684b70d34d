package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Drift.cvmTest]] — naive-reference equality, the variance-change
  * sensitivity that distinguishes it from MW-U, and the one-sided /
  * degenerate contracts shared with [[Drift.ksTest]].
  */
class CvmSpec extends SparkSpec {

  import spark.implicits._

  private def cvm(base: Seq[Double], cur: Seq[Double]) = {
    val b = base.map(v => ("g", v)).toDF("g", "v")
    val c = cur.map(v => ("g", v)).toDF("g", "v")
    Drift.cvmTest(b, c, "v", Seq("g")).collect()(0)
  }

  /** Naive T = Σ_points (F−G)² · nm/N² over the pooled sample. */
  private def naive(x: Seq[Double], y: Seq[Double]): Double = {
    val n = x.size; val m = y.size
    val vals = (x ++ y).distinct.sorted
    var i = 0L; var j = 0L; var s = BigInt(0)
    for (v <- vals) {
      val cb = x.count(_ == v); val cc = y.count(_ == v)
      i += cb; j += cc
      val d = BigInt(i) * m - BigInt(j) * n
      s += BigInt(cb + cc) * d * d
    }
    (BigDecimal(s) / (BigDecimal(n) * m * (n + m) * (n + m))).toDouble
  }

  test("matches the naive pooled-point reference, with ties") {
    val x = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 8.0)
    val y = Seq(2.0, 3.0, 3.0, 4.0, 9.0)
    val want = naive(x, y)
    val got = cvm(x, y).getAs[Double]("cvm_t")
    assert(math.abs(got - want) < 1e-6, s"got $got want $want")
  }

  test("a pure VARIANCE change (symmetric about the shared median) " +
      "is visible: T far above the identical-sample floor") {
    // same median 0; current is 10x wider — MW-U's location reading
    // is blind here, the integrated squared gap is not
    val narrow = (-20 to 20).map(_ * 0.1)
    val wide = (-20 to 20).map(_ * 1.0)
    val tVar = cvm(narrow, wide).getAs[Double]("cvm_t")
    val tSame = cvm(narrow, narrow).getAs[Double]("cvm_t")
    assert(tVar > 10 * tSame, s"tVar=$tVar tSame=$tSame")
    assert(cvm(narrow, wide).getAs[Boolean]("drifted"))
  }

  test("identical samples score near zero and don't flag") {
    val x = (1 to 50).map(_.toDouble)
    val r = cvm(x, x)
    assert(r.getAs[Double]("cvm_t") < 0.02)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("one-sided groups flag with null T, the ksTest contract") {
    val b = Seq(("g", 1.0), ("h", 2.0)).toDF("g2", "v")
      .withColumnRenamed("g2", "g")
    val c = Seq(("g", 3.0)).toDF("g", "v")
    val rows = Drift.cvmTest(b, c, "v", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("h").getAs[Boolean]("drifted"))
    assert(rows("h").isNullAt(rows("h").fieldIndex("cvm_t")))
    assert(!rows("g").isNullAt(rows("g").fieldIndex("cvm_t")))
  }
}
