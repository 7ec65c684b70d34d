package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CalibrationSpec extends SparkSpec {

  private def frame(rows: Seq[(java.lang.Double, java.lang.Boolean)]) =
    df(
      StructType(Seq(
        StructField("score", DoubleType, nullable = true),
        StructField("label", BooleanType, nullable = true))),
      rows.map { case (s, l) => Row(s, l) })

  private def report(rows: Seq[(java.lang.Double, java.lang.Boolean)],
      bins: Int = 10) =
    QualityModel.calibrationReport(frame(rows), "score", col("label"),
        bins)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)

  test("closed form: bins, counts, means, empirical rates") {
    val rows = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.05, false), (0.05, false),          // bin 0: 0/2 positive
      (0.95, true), (0.95, true), (0.95, false)) // bin 9: 2/3
    val out = report(rows)
    assert(out.map(t => (t._1, t._2, t._3)) ===
      Seq((0, 2L, 0L), (9, 3L, 2L)))
    val b0 = out.head
    assert(math.abs(b0._4 - 0.05) < 1e-6) // micro-unit floor rounding
    assert(b0._5 === 0.0)
    val b9 = out.last
    assert(math.abs(b9._4 - 0.95) < 1e-6)
    assert(math.abs(b9._5 - 2.0 / 3.0) < 1e-12)
  }

  test("score exactly 1.0 folds into the top bin") {
    val out = report(Seq[(java.lang.Double, java.lang.Boolean)](
      (1.0, true)))
    assert(out.map(_._1) === Seq(9))
  }

  test("null scores and labels are excluded") {
    val out = report(Seq[(java.lang.Double, java.lang.Boolean)](
      (0.5, true), (null, true), (0.5, null)))
    assert(out.map(_._2).sum === 1L)
  }

  test("ECE contributions sum to the expected calibration error") {
    val rows = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.2, false), (0.2, false), (0.2, true), (0.2, false), // gap .05
      (0.8, true), (0.8, false)) // gap 0.3
    val ece = QualityModel.calibrationReport(frame(rows), "score",
        col("label"))
      .agg(sum("ece_contrib")).collect()(0).getDouble(0)
    // |0.2 - 0.25| * 4/6 + |0.8 - 0.5| * 2/6
    assert(math.abs(ece - (0.05 * 4 / 6 + 0.3 * 2 / 6)) < 1e-9)
  }

  test("perfectly calibrated bins have zero gap") {
    val rows = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.5, true), (0.5, false))
    val g = QualityModel.calibrationReport(frame(rows), "score",
        col("label"))
      .collect()(0).getAs[Double]("gap")
    assert(math.abs(g) < 1e-12)
  }
}
