package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.permutationTests]] (per-group hash-randomization) and
  * [[Analytics.bhSelect]] (Benjamini–Hochberg step-up) — the
  * screen→select composition.
  */
class FdrScreenSpec extends SparkSpec {

  import spark.implicits._

  test("permutationTests: a single group equals the global " +
      "permutationTest on the same data") {
    val rows = (1 to 40).map(i =>
      ("g", s"u$i", if (i % 2 == 0) 100L + i else 10L + i, i % 2 == 0))
      .toDF("g", "u", "v", "a")
    val per = Analytics.permutationTests(rows, Seq("g"), col("u"),
      col("v"), col("a"), replicas = 99, salt = "s").head()
    val global = Analytics.permutationTest(rows, col("u"), col("v"),
      col("a"), replicas = 99, salt = "s").head()
    for (f <- Seq("n_a", "n_b", "r_valid", "n_extreme"))
      assert(per.getAs[Long](f) === global.getAs[Long](f), f)
    assert(per.getAs[Double]("p_value") === global.getAs[Double]("p_value"))
    assert(per.getAs[Double]("obs_diff") === global.getAs[Double]("obs_diff"))
  }

  test("permutationTests: a planted shift scores small p in ITS " +
      "group only; groups are independent") {
    val shifted = (1 to 30).map(i =>
      ("hot", s"u$i", if (i % 2 == 0) 1000L else 10L, i % 2 == 0))
    val nulls = (1 to 30).map(i =>
      ("cold", s"u$i", 50L + i % 7, i % 2 == 0))
    val out = Analytics.permutationTests(
        (shifted ++ nulls).toDF("g", "u", "v", "a"),
        Seq("g"), col("u"), col("v"), col("a"), replicas = 99)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("hot").getAs[Double]("p_value") <= 0.02)
    assert(out("cold").getAs[Double]("p_value") > 0.05)
  }

  test("bhSelect: the textbook step-up — selects every test up to " +
      "the LARGEST k passing, including earlier non-passing ranks") {
    // sorted p = .010, .025, .030, .20, .50; m=5, α=.05 → thresholds
    // .01 .02 .03 .04 .05: ranks 1 and 3 pass, rank 2 (.025 > .02)
    // does NOT — the step-up still selects ranks 1..3
    val tests = Seq(
      ("t1", 1L, 100L), ("t2", 25L, 1000L), ("t3", 3L, 100L),
      ("t4", 20L, 100L), ("t5", 50L, 100L)).toDF("id", "pn", "pd")
    val out = Analytics.bhSelect(tests, Seq("id"), col("pn"),
        col("pd"), alphaMilli = 50)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("rank"), r.getAs[Int]("selected"))).toMap
    assert(out("t1") === ((1L, 1)))
    assert(out("t2") === ((2L, 1))) // swept in by rank 3's pass
    assert(out("t3") === ((3L, 1)))
    assert(out("t4") === ((4L, 0)))
    assert(out("t5") === ((5L, 0)))
  }

  test("bhSelect: nothing passes → nothing selected; boundary " +
      "equality p = k·α/m is a pass (≤, exact integers)") {
    val none = Seq(("a", 50L, 100L), ("b", 60L, 100L))
      .toDF("id", "pn", "pd")
    assert(Analytics.bhSelect(none, Seq("id"), col("pn"), col("pd"), 50)
      .agg(sum("selected")).head().getLong(0) === 0L)
    // p = exactly 1·0.05/1 = 1/20: 1·1·1000 ≤ 1·50·20
    val edge = Seq(("e", 1L, 20L)).toDF("id", "pn", "pd")
    assert(Analytics.bhSelect(edge, Seq("id"), col("pn"), col("pd"), 50)
      .head().getAs[Int]("selected") === 1)
  }

  test("bhSelect: ties in p rank deterministically by id") {
    val tied = Seq(("b", 1L, 100L), ("a", 1L, 100L))
      .toDF("id", "pn", "pd")
    val out = Analytics.bhSelect(tied, Seq("id"), col("pn"),
        col("pd"), 50)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rank")).toMap
    assert(out("a") === 1L)
    assert(out("b") === 2L)
  }
}
