package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.hillTailIndex]] — naive-Scala-replicated values, the
  * heavy-vs-light tail ordering, the all-equal degenerate (α null),
  * the m clamp, and the n ≥ 2 contract.
  */
class HillTailSpec extends SparkSpec {

  private def frame(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType),
      StructField("id", LongType))),
    rows.map { case (g, x, id) => Row(g, x, id) })

  private def run(m: Int, rows: (String, Long, Long)*) =
    Analytics.hillTailIndex(frame(rows: _*), "g", col("x"), col("id"),
      m = m)

  /** Independent reference: sort desc, nano-floored lns, excess mean. */
  private def naive(values: Seq[Long], m: Int): (Long, Long, Long) = {
    val sorted = values.sorted(Ordering[Long].reverse)
    val mEff = math.min(m, values.size - 1)
    val lnq = (x: Long) => math.floor(math.log(x.toDouble) * 1e9).toLong
    val s = sorted.take(mEff).map(lnq).sum
    val thr = sorted(mEff)
    (mEff.toLong, thr, (s - mEff * lnq(thr)) / mEff)
  }

  test("hand/naive-computed hill_nano and alpha on a mixed tail") {
    val vals = Seq(1000L, 800L, 100L, 90L, 80L, 70L, 10L)
    val rows = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
    val r = run(3, rows: _*).collect()(0)
    val (mEff, thr, hill) = naive(vals, 3)
    assert(r.getAs[Long]("m_used") == mEff)
    assert(r.getAs[Long]("x_tail") == thr)
    assert(r.getAs[Long]("hill_nano") == hill)
    assert(r.getAs[Double]("alpha") ==
      math.rint(1e9 / hill * 1e6) / 1e6)
    assert(r.getAs[Long]("n") == 7L)
  }

  test("a Pareto-ish tail reads a smaller alpha than a flat tail") {
    val pareto = (1 to 50).map(i => ("heavy", 1000000L / i, i.toLong))
    val flat = (1 to 50).map(i =>
      ("light", 1000000L - i * 1000L, (100 + i).toLong))
    val out = run(20, (pareto ++ flat): _*).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("alpha")).toMap
    // the inverse-rank sample decays like x^-1 (alpha near 1); the
    // arithmetic grid barely decays at all
    assert(out("heavy") < 2.0)
    assert(out("light") > 20.0)
  }

  test("all-equal top order statistics: hill_nano = 0, alpha null") {
    val rows = (1 to 7).map(i => ("g", 500L, i.toLong))
    val r = run(3, rows: _*).collect()(0)
    assert(r.getAs[Long]("hill_nano") == 0L)
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("m clamps to n-1; ties at the threshold keep the top-m SET " +
      "well-defined") {
    val rows = Seq(("g", 100L, 1L), ("g", 50L, 2L), ("g", 50L, 3L))
    val r = run(100, rows: _*).collect()(0)
    assert(r.getAs[Long]("m_used") == 2L)
    assert(r.getAs[Long]("x_tail") == 50L)
    // s = lnq(100) + lnq(50), thr = lnq(50)
    val (_, _, hill) = naive(Seq(100L, 50L, 50L), 100)
    assert(r.getAs[Long]("hill_nano") == hill)
  }

  test("groups need n >= 2; non-positive values are excluded first") {
    val rows = Seq(("solo", 10L, 1L),
      ("zeroed", 10L, 2L), ("zeroed", 0L, 3L), ("zeroed", -5L, 4L))
    assert(run(3, rows: _*).collect().isEmpty)
  }
}
