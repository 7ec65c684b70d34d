package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.hosmerLemeshow]] — hand-computed bucket χ²
  * contributions, perfect calibration, and the degenerate-bucket
  * null guard.
  */
class HosmerLemeshowSpec extends SparkSpec {

  private def scored(rows: (String, Double, Boolean, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("p", DoubleType),
      StructField("y", BooleanType),
      StructField("k", LongType))),
    rows.map { case (g, p, y, k) => Row(g, p, y, k) })

  private def hl(bins: Int, rows: (String, Double, Boolean, Long)*) =
    Analytics.hosmerLemeshow(scored(rows: _*), "g", col("p"),
      col("y"), col("k"), bins)

  test("hand-computed two-bucket table") {
    val out = hl(2,
      ("g", 0.1, false, 1L), ("g", 0.2, false, 2L),
      ("g", 0.8, true, 3L), ("g", 0.9, true, 4L))
      .orderBy("bin").collect()
    assert(out.length == 2)
    // bin 1: n=2 obs=0 E=.3 -> .09/(.3*.85); bin 2 symmetric: E=1.7
    assert(out(0).getLong(3) == 0L && out(0).getDouble(4) == 0.3)
    assert(math.abs(out(0).getDouble(5) - 0.3529) < 1e-9)
    assert(out(1).getLong(3) == 2L && out(1).getDouble(4) == 1.7)
    assert(math.abs(out(1).getDouble(5) - 0.3529) < 1e-9)
  }

  test("well-calibrated scores: every contribution near zero") {
    // 8 rows at p=0.5, exactly 2 positives per 4-row bucket ->
    // obs == E exactly, zero contribution
    val rows = (1 to 8).map(i =>
      ("g", 0.5, Set(1, 2, 5, 6).contains(i), i.toLong))
    val out = hl(2, rows: _*).collect()
    assert(out.forall(r => r.getDouble(5) == 0.0))
  }

  test("zero-score bucket: E = 0 -> null contribution, not Infinity") {
    val out = hl(2,
      ("g", 0.0, false, 1L), ("g", 0.0, false, 2L),
      ("g", 0.9, true, 3L), ("g", 0.9, true, 4L))
      .orderBy("bin").collect()
    assert(out(0).isNullAt(5))
    assert(!out(1).isNullAt(5))
  }

  test("deterministic ntile: ties split by the tie-break key") {
    val rows = (1 to 9).map(i => ("g", 0.5, i <= 4, i.toLong))
    val a = hl(3, rows: _*).orderBy("bin").collect()
    val b = hl(3, rows: _*).orderBy("bin").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getLong(2)).toSeq == Seq(3L, 3L, 3L))
  }
}
