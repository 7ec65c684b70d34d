package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.kendallW]] — hand-computed concordance values
  * (including the tie-corrected classical formula), the W = 1
  * perfect-agreement bound, the complete-judge contract, and the
  * W = Q/(b(k−1)) identity against [[Analytics.friedmanTest]].
  */
class KendallWSpec extends SparkSpec {

  private def scores(rows: (String, String, String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("judge", StringType),
      StructField("item", StringType),
      StructField("y", LongType))),
    rows.map { case (g, j, i, y) => Row(g, j, i, y) })

  private def run(rows: (String, String, String, Long)*) =
    Analytics.kendallW(scores(rows: _*), Seq("g"), col("judge"),
      col("item"), col("y"))

  test("perfect agreement: every judge orders the items " +
      "identically -> W = 1, significant at k=4, b=3") {
    val rows = for {
      j <- Seq("j1", "j2", "j3"); (it, y) <-
        Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L))
    } yield ("g", j, it, y)
    val r = run(rows: _*).collect()(0)
    assert(r.getAs[Double]("w") == 1.0)
    assert(r.getAs[Long]("n_judges") == 3L)
    assert(r.getAs[Long]("n_items") == 4L)
    // Q = b(k-1)W = 9 > chi2_crit(3) = 7.81
    assert(r.getAs[Double]("q") == 9.0)
    assert(r.getAs[Int]("significant") == 1)
  }

  test("hand-computed WITH a tie (classical 12S/(b^2(k^3-k)-b*SumT) " +
      "formula): judge1 ties items a,b -> W = 78/84") {
    val rows = Seq(
      ("g", "j1", "a", 1L), ("g", "j1", "b", 1L), ("g", "j1", "c", 2L),
      ("g", "j2", "a", 1L), ("g", "j2", "b", 2L), ("g", "j2", "c", 3L))
    val r = run(rows: _*).collect()(0)
    // S = 6.5 (true ranks 2.5, 3.5, 6 about mean 4); T = 2^3-2 = 6
    // W = 12*6.5 / (4*24 - 2*6) = 78/84
    assert(r.getAs[Double]("w") == math.rint(78.0 / 84.0 * 1e6) / 1e6)
  }

  test("an incomplete judge (missing an item) is dropped — the " +
      "complete-block contract") {
    val rows = Seq(
      ("g", "j1", "a", 5L), ("g", "j1", "b", 9L),
      ("g", "j2", "a", 5L), ("g", "j2", "b", 9L),
      ("g", "j3", "a", 7L)) // j3 never scored b
    val r = run(rows: _*).collect()(0)
    assert(r.getAs[Long]("n_judges") == 2L)
    assert(r.getAs[Double]("w") == 1.0)
  }

  test("identity with friedmanTest: W = Q/(b(k-1)) on a mixed " +
      "30-cell fixture, and the emitted q IS the Friedman statistic") {
    val rows = for {
      (j, o) <- Seq(("j1", 0), ("j2", 1), ("j3", 2), ("j4", 0),
        ("j5", 3))
      (it, idx) <- Seq("a", "b", "c", "d", "e", "f").zipWithIndex
    } yield ("g", j, it, ((idx + o) % 6 * 10 + (idx * o) % 7).toLong)
    val w = run(rows: _*).collect()(0)
    val fr = Analytics.friedmanTest(
      scores(rows: _*).withColumnRenamed("judge", "blk")
        .withColumn("blkId",
          org.apache.spark.sql.functions.abs(
            org.apache.spark.sql.functions.hash(col("blk")))
            .cast("long")),
      Seq("g"), col("blkId"), col("item"), col("y")).collect()(0)
    assert(w.getAs[Double]("q") == fr.getAs[Double]("q"))
    val b = w.getAs[Long]("n_judges").toDouble
    val k = w.getAs[Long]("n_items").toDouble
    val expected = math.rint(
      fr.getAs[Double]("q") / (b * (k - 1)) * 1e6) / 1e6
    assert(math.abs(w.getAs[Double]("w") - expected) <= 1e-6,
      s"w=${w.getAs[Double]("w")} expected=$expected")
  }

  test("all-tied scores (zero denominator): null W, not significant") {
    val rows = for (j <- Seq("j1", "j2"); it <- Seq("a", "b", "c"))
      yield ("g", j, it, 7L)
    val r = run(rows: _*).collect()(0)
    assert(r.isNullAt(r.fieldIndex("w")))
    assert(r.getAs[Int]("significant") == 0)
  }
}
