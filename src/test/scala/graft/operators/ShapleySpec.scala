package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.shapleyAttribution]] — closed-form two-channel game,
  * the efficiency property, symmetry, and the bounded-lattice guard.
  */
class ShapleySpec extends SparkSpec {

  import spark.implicits._

  /** Rows: (user, channel-or-null, converted). */
  private def run(rows: Seq[(String, String, Boolean)]) =
    Analytics.shapleyAttribution(
      rows.toDF("u", "ch", "cv"), col("u"), col("ch"), col("cv"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("closed-form two-channel game: credits match the hand Shapley") {
    // coalition rates: v(a)=1/2, v(b)=0, v(ab)=1, v(empty)=0
    // φ_a = 1/2·(v(a)−v(∅)) + 1/2·(v(ab)−v(b)) = 1/4 + 1/2 = 0.75
    // φ_b = 1/2·(v(b)−v(∅)) + 1/2·(v(ab)−v(a)) = 0 + 1/4 = 0.25
    val rows = Seq(
      ("u1", "a", false), ("u1", null, true), // {a} converted
      ("u2", "a", false), // {a} not converted
      ("u3", "b", false), // {b} not converted
      ("u4", "a", false), ("u4", "b", false), ("u4", null, true))
    val out = run(rows)
    assert(out("a").getAs[Double]("shapley") === 0.75)
    assert(out("b").getAs[Double]("shapley") === 0.25)
    assert(out("a").getAs[Long]("n_users") === 3L)
    assert(out("a").getAs[Long]("n_conv") === 2L)
  }

  test("efficiency: credits sum to v(all) - v(empty) when every " +
      "coalition is observed") {
    val rows = Seq(
      ("e0", null, true), // ∅, converted → v(∅) = 1
      ("u1", "a", true), ("u2", "a", false), // v(a) = 1/2
      ("u3", "b", false), // v(b) = 0
      ("u4", "a", false), ("u4", "b", false), ("u4", null, true))
    val out = run(rows)
    val total = out("a").getAs[Double]("shapley") +
      out("b").getAs[Double]("shapley")
    // v(ab) − v(∅) = 1 − 1 = 0 (nano-floor error ≤ 2e-9 per term)
    assert(math.abs(total - 0.0) < 1e-6)
  }

  test("symmetric channels receive equal credit") {
    val rows = Seq(
      ("u1", "x", false), ("u1", null, true),
      ("u2", "y", false), ("u2", null, true),
      ("u3", "x", false), ("u3", "y", false), ("u3", null, true),
      ("u4", "x", false), ("u4", "y", false))
    val out = run(rows)
    assert(out("x").getAs[Double]("shapley") ===
      out("y").getAs[Double]("shapley"))
  }

  test("the 2^k lattice guard refuses unbounded channel domains") {
    val rows = (1 to 9).map(i => ("u", s"ch$i", false))
    intercept[IllegalArgumentException] {
      Analytics.shapleyAttribution(
        rows.toDF("u", "ch", "cv"), col("u"), col("ch"), col("cv"))
        .collect()
    }
  }
}
