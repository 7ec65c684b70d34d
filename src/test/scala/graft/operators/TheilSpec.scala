package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.theilDecomposition]] — zero at equality, the exact
  * within/between decomposition identity, and the two pure cases.
  */
class TheilSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long)]) =
    Analytics.theilDecomposition(rows.toDF("g", "v"), "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("perfect equality scores exactly zero everywhere") {
    val out = run(Seq(("a", 10L), ("a", 10L), ("b", 10L), ("b", 10L)))
    assert(out("a").getAs[Double]("theil") === 0.0)
    assert(out("__total__").getAs[Double]("theil") === 0.0)
    assert(out("__total__").getAs[Double]("theil_between") === 0.0)
  }

  test("between-only inequality: internally-equal groups with " +
      "different means put ALL inequality in the between term") {
    val out = run(Seq(("a", 10L), ("a", 10L), ("b", 40L), ("b", 40L)))
    assert(out("a").getAs[Double]("theil") === 0.0)
    assert(out("b").getAs[Double]("theil") === 0.0)
    val t = out("__total__")
    assert(t.getAs[Double]("theil_within_weighted") === 0.0)
    assert(t.getAs[Double]("theil_between") > 0.1)
    assert(t.getAs[Double]("theil") ===
      t.getAs[Double]("theil_between"))
  }

  test("within-only inequality: same group means, unequal members " +
      "put ALL inequality in the within term") {
    // both groups: mean 25, same n → between ratios are exactly 1
    val out = run(Seq(("a", 10L), ("a", 40L), ("b", 20L), ("b", 30L)))
    val t = out("__total__")
    assert(math.abs(t.getAs[Double]("theil_between")) < 1e-6)
    assert(t.getAs[Double]("theil_within_weighted") > 0.01)
    // a is more unequal than b
    assert(out("a").getAs[Double]("theil") >
      out("b").getAs[Double]("theil"))
  }

  test("the decomposition identity holds to quantization: " +
      "T = Σ s_g·T_g + T_between") {
    val out = run(Seq(("a", 5L), ("a", 80L), ("a", 15L),
      ("b", 200L), ("b", 10L), ("c", 42L)))
    val t = out("__total__")
    assert(math.abs(t.getAs[Double]("theil") -
      (t.getAs[Double]("theil_within_weighted") +
        t.getAs[Double]("theil_between"))) < 2e-6)
    assert(t.getAs[Double]("theil") > 0.0)
  }

  test("non-positive and null-group rows are excluded") {
    val df = Seq[(String, Long)](("a", 10L), ("a", 20L), ("a", 0L),
      ("a", -5L), (null, 30L)).toDF("g", "v")
    val out = Analytics.theilDecomposition(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n") === 2L)
    assert(out("__total__").getAs[Long]("n") === 2L)
  }
}
