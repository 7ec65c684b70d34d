package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.ipwAte]] — a fully hand-computed 2-stratum estimate,
  * the IPW==stratification collapse identity, positivity handling,
  * and the no-support degenerate.
  */
class IpwAteSpec extends SparkSpec {

  private def frame(rows: (String, Boolean, Long)*) = df(
    StructType(Seq(
      StructField("s", StringType),
      StructField("t", BooleanType),
      StructField("y", LongType))),
    rows.map { case (s, t, y) => Row(s, t, y) })

  private def run(rows: (String, Boolean, Long)*) =
    Analytics.ipwAte(frame(rows: _*), Seq("s"), col("t"), col("y"))

  test("hand-computed two-stratum estimate, including the __ALL " +
      "Hajek row") {
    val rows = Seq(
      ("A", true, 10L), ("A", true, 20L), ("A", false, 30L),
      ("B", true, 40L), ("B", false, 50L), ("B", false, 60L))
    val out = run(rows: _*).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n") == 3L && a.getAs[Long]("n1") == 2L)
    assert(a.getAs[Long]("e_micro") == 666666L)
    assert(a.getAs[Long]("mu1_cents") == 15L)
    assert(a.getAs[Long]("mu0_cents") == 30L)
    assert(a.getAs[Long]("ate_cents") == -15L)
    assert(a.getAs[Int]("in_support") == 1)
    val b = out("B")
    assert(b.getAs[Long]("e_micro") == 333333L)
    assert(b.getAs[Long]("ate_cents") == -15L)
    val all = out("__ALL")
    // T1 = (30*3) div 2 + (40*3) div 1 = 45 + 120 = 165
    // T0 = (30*3) div 1 + (110*3) div 2 = 90 + 165 = 255; N = 6
    assert(all.getAs[Long]("n") == 6L && all.getAs[Long]("n1") == 3L)
    assert(all.getAs[Long]("mu1_cents") == 165L / 6L)
    assert(all.getAs[Long]("mu0_cents") == 255L / 6L)
    assert(all.getAs[Long]("ate_cents") == 165L / 6L - 255L / 6L)
  }

  test("the __ALL row equals the classic stratification estimator " +
      "(the stratum-constant-propensity collapse)") {
    val rows = Seq(
      ("A", true, 100L), ("A", true, 140L), ("A", false, 90L),
      ("A", false, 70L), ("A", false, 80L),
      ("B", true, 300L), ("B", false, 260L), ("B", false, 240L),
      ("C", true, 55L), ("C", true, 65L), ("C", false, 50L))
    val all = run(rows: _*).collect()
      .find(_.getAs[String]("stratum") == "__ALL").get
    // naive double stratification estimate Σ n_s(ȳ1_s − ȳ0_s)/N
    val byS = rows.groupBy(_._1)
    val n = rows.size.toDouble
    val strat = byS.values.map { g =>
      val y1 = g.filter(_._2).map(_._3.toDouble)
      val y0 = g.filterNot(_._2).map(_._3.toDouble)
      g.size * (y1.sum / y1.size - y0.sum / y0.size)
    }.sum / n
    // the engine is integer-floored per stratum; 1-cent tolerance
    // per floor on each side of the difference
    assert(math.abs(all.getAs[Long]("ate_cents") - strat) <= 2.0)
  }

  test("a stratum without controls is emitted with in_support = 0 " +
      "and excluded from __ALL") {
    val rows = Seq(
      ("A", true, 10L), ("A", false, 30L),
      ("X", true, 999L), ("X", true, 888L)) // no controls in X
    val out = run(rows: _*).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    val x = out("X")
    assert(x.getAs[Int]("in_support") == 0)
    assert(x.isNullAt(x.fieldIndex("mu0_cents")))
    assert(x.isNullAt(x.fieldIndex("ate_cents")))
    val all = out("__ALL")
    assert(all.getAs[Long]("n") == 2L) // only stratum A contributes
    assert(all.getAs[Long]("mu1_cents") == 10L)
    assert(all.getAs[Long]("mu0_cents") == 30L)
  }

  test("no supported stratum at all: the __ALL row carries nulls " +
      "rather than fabricating an estimate") {
    val rows = Seq(("A", true, 10L), ("B", true, 20L))
    val all = run(rows: _*).collect()
      .find(_.getAs[String]("stratum") == "__ALL").get
    assert(all.isNullAt(all.fieldIndex("ate_cents")))
  }
}
