package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.giniConcentration]] — the closed-form sorted-index
  * cases, tie invariance, zero participation, and the exclusion /
  * degenerate contracts.
  */
class GiniSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Analytics.giniConcentration(
        rows.toDF("g", "v", "id"), "g", col("v"), col("id"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("hand-computed: values 1..4 give exactly 0.25") {
    // Σ i·x = 1+4+9+16 = 30, n = 4, s = 10:
    // (2·30 − 5·10) / (4·10) = 10/40
    val out = run(Seq(("a", 1L, 1L), ("a", 2L, 2L),
      ("a", 3L, 3L), ("a", 4L, 4L)))
    assert(out("a").getAs[Double]("gini") === 0.25)
    assert(out("a").getAs[Long]("n") === 4L)
    assert(out("a").getAs[Long]("value_sum") === 10L)
  }

  test("perfect equality scores exactly zero; ties don't perturb it") {
    val out = run(Seq(("a", 7L, 3L), ("a", 7L, 1L), ("a", 7L, 2L)))
    assert(out("a").getAs[Double]("gini") === 0.0)
  }

  test("extreme concentration approaches (n-1)/n") {
    // one holder of everything among n=4: G = (2·4·s − 5·s)/(4·s) = 3/4
    val out = run(Seq(("a", 0L, 1L), ("a", 0L, 2L),
      ("a", 0L, 3L), ("a", 100L, 4L)))
    assert(out("a").getAs[Double]("gini") === 0.75)
  }

  test("groups are independent; negative/null-group rows excluded; " +
      "all-zero group gets null gini") {
    val df = Seq[(String, Long, Long)](
      ("a", 1L, 1L), ("a", 3L, 2L), ("a", -5L, 3L),
      ("b", 0L, 4L), ("b", 0L, 5L)).toDF("g", "v", "id")
      .union(Seq((null.asInstanceOf[String], 9L, 6L)).toDF("g", "v", "id"))
    val out = Analytics.giniConcentration(df, "g", col("v"), col("id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("a", "b"))
    // a: x = (1,3): (2·(1+6) − 3·4)/(2·4) = 2/8
    assert(out("a").getAs[Double]("gini") === 0.25)
    assert(out("a").getAs[Long]("n") === 2L)
    assert(out("b").getAs[Long]("n") === 2L)
    assert(out("b").isNullAt(out("b").fieldIndex("gini")))
  }
}
