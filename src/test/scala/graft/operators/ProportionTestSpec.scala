package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ProportionTestSpec extends SparkSpec {

  private def frame(rows: Seq[(String, java.lang.Boolean)]) = df(
    StructType(Seq(
      StructField("g", StringType, nullable = true),
      StructField("s", BooleanType, nullable = true))),
    rows.map { case (g, s) => Row(g, s) })

  private def run(rows: Seq[(String, java.lang.Boolean)]) =
    Analytics.proportionTest(frame(rows), "g", col("s"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap

  test("closed form z against the pooled rest") {
    // a: 30/40 converted; b: 10/40 converted
    val rows = (1 to 30).map(_ => ("a", true: java.lang.Boolean)) ++
      (1 to 10).map(_ => ("a", false: java.lang.Boolean)) ++
      (1 to 10).map(_ => ("b", true: java.lang.Boolean)) ++
      (1 to 30).map(_ => ("b", false: java.lang.Boolean))
    val out = run(rows)
    val a = out("a")
    assert(a.getLong(1) === 40L && a.getLong(2) === 30L)
    assert(a.getDouble(3) === 0.75)
    assert(a.getDouble(4) === 0.25)
    // p̂ = 0.5; se = sqrt(.5*.5*(1/40+1/40)); z = .5/se
    val se = math.sqrt(0.25 * (1.0 / 40 + 1.0 / 40))
    assert(math.abs(a.getDouble(5) - 0.5 / se) < 1e-12)
    assert(a.getBoolean(6))
    // symmetric: b's z is the negation
    assert(math.abs(out("b").getDouble(5) + a.getDouble(5)) < 1e-12)
  }

  test("a group matching the rest is not significant") {
    val rows = Seq("a", "b", "c").flatMap { g =>
      (1 to 20).map(_ => (g, true: java.lang.Boolean)) ++
        (1 to 20).map(_ => (g, false: java.lang.Boolean))
    }
    run(rows).values.foreach { r =>
      assert(math.abs(r.getDouble(5)) < 1e-12)
      assert(!r.getBoolean(6))
    }
  }

  test("degenerate variance yields null z, not infinity") {
    // everyone converted: pooled p = 1 -> se = 0
    val rows = Seq(("a", true: java.lang.Boolean),
      ("b", true: java.lang.Boolean))
    run(rows).values.foreach { r =>
      assert(r.isNullAt(5))
      assert(r.isNullAt(6))
    }
    // single group: empty complement
    val one = run(Seq(("a", true: java.lang.Boolean),
      ("a", false: java.lang.Boolean)))
    assert(one("a").isNullAt(5))
  }

  test("null groups and null outcomes are excluded") {
    val rows = Seq(
      ("a", true: java.lang.Boolean), ("a", null: java.lang.Boolean),
      (null, true: java.lang.Boolean), ("b", false: java.lang.Boolean))
    val out = run(rows)
    assert(out.keySet === Set("a", "b"))
    assert(out("a").getLong(1) === 1L)
  }
}
