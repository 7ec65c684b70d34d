package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.theilSenTrend]] — exact-line recovery, outlier
  * robustness (the point of the estimator), median parity cases, and
  * degenerate groups.
  */
class TheilSenSpec extends SparkSpec {

  import spark.implicits._

  private def run(pts: Seq[(Long, Long)]) =
    Analytics.theilSenTrend(
      pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"),
      Seq("g"), col("x"), col("y")).head()

  test("an exact line is recovered exactly: slope and intercept") {
    val r = run((0L to 9L).map(x => (x, 7L * x + 30L)))
    assert(r.getAs[Double]("slope") === 7.0)
    assert(r.getAs[Double]("intercept") === 30.0)
    assert(r.getAs[Long]("n_pairs") === 45L)
  }

  test("one wildly corrupted bucket does NOT move the slope (OLS " +
      "would)") {
    val clean = (0L to 10L).map(x => (x, 5L * x))
    val poisoned = clean.updated(5, (5L, 1000000L))
    assert(run(poisoned).getAs[Double]("slope") === 5.0)
  }

  test("even pair counts average the two middle slopes") {
    // x=0,1,2,3 with y=0,1,3,3: slopes 1,1.5,1,2,1,0 sorted
    // 0,1,1,1,1.5,2 → median (1+1)/2 = 1
    val r = run(Seq((0L, 0L), (1L, 1L), (2L, 3L), (3L, 3L)))
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Double]("slope") === 1.0)
  }

  test("a single-bucket group yields null slope and zero pairs; " +
      "same-bucket rows pre-sum") {
    val r = run(Seq((3L, 10L)))
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.getAs[Long]("n_pairs") === 0L)
    val r2 = Analytics.theilSenTrend(
      Seq(("g", 0L, 4L), ("g", 0L, 6L), ("g", 1L, 20L))
        .toDF("g", "x", "y"),
      Seq("g"), col("x"), col("y")).head()
    assert(r2.getAs[Long]("n_buckets") === 2L)
    assert(r2.getAs[Double]("slope") === 10.0) // (20-10)/1
  }
}
