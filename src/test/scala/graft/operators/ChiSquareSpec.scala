package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pearson χ² independence test ([[Analytics.chiSquare]]). */
class ChiSquareSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", StringType),
    StructField("b", StringType)))

  private def pairs(rows: (String, String, Int)*) =
    df(schema, rows.flatMap { case (a, b, n) =>
      Seq.fill(n)(Row(a, b))
    })

  private def chi2(rows: (String, String, Int)*) = {
    val r = Analytics.chiSquare(pairs(rows: _*), "a", "b").head()
    (r.getDouble(0), r.getInt(1), r.getLong(2))
  }

  test("perfectly independent table has chi2 = 0") {
    // P(a)·P(b) factorizes exactly: counts 10,20 / 30,60
    val (c, dof, n) = chi2(
      ("x", "p", 10), ("x", "q", 20), ("y", "p", 30), ("y", "q", 60))
    assert(c == 0.0 && dof == 1 && n == 120L)
  }

  test("textbook 2x2: chi2 matches the closed form") {
    // [[20,10],[10,20]]: chi2 = n(ad-bc)^2/((a+b)(c+d)(a+c)(b+d))
    //   = 60*(400-100)^2/(30*30*30*30) = 60*90000/810000 = 6.6667
    val (c, dof, _) = chi2(
      ("x", "p", 20), ("x", "q", 10), ("y", "p", 10), ("y", "q", 20))
    assert(dof == 1)
    assert(math.abs(c - 60.0 * 90000.0 / 810000.0) < 1e-3)
  }

  test("structurally-zero cells still contribute their expectation") {
    // diagonal-only 2x2: zero cells must push chi2 to the n maximum
    val (c, dof, n) = chi2(("x", "p", 15), ("y", "q", 15))
    assert(dof == 1 && n == 30L)
    assert(math.abs(c - 30.0) < 1e-9) // chi2 = n for a perfect diagonal
  }

  test("null categories are real levels: statistic equals the " +
      "sentinel-recoded table") {
    val rows = Seq(
      Row(null, "p"), Row(null, "p"), Row(null, "q"),
      Row("y", "p"), Row("y", "q"), Row("y", "q"))
    val withNull = df(StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType))), rows)
    val recoded = Analytics.chiSquare(
      withNull.na.fill("NULL_LEVEL", Seq("a")), "a", "b").head()
    val raw = Analytics.chiSquare(withNull, "a", "b").head()
    assert(raw.getDouble(0) == recoded.getDouble(0))
    assert(raw.getInt(1) == recoded.getInt(1) && raw.getInt(1) == 1)
    assert(raw.getLong(2) == 6L)
  }

  test("dof = (levels_a - 1)(levels_b - 1)") {
    val (_, dof, _) = chi2(
      ("x", "p", 1), ("x", "q", 2), ("x", "r", 3),
      ("y", "p", 4), ("y", "q", 5), ("y", "r", 6),
      ("z", "p", 7), ("z", "q", 8), ("z", "r", 9))
    assert(dof == 4)
  }
}
