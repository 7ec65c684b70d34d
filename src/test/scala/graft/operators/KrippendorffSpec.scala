package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.krippendorffAlpha]] — perfect agreement, the
  * hand-computed two-rater case, and the null guard on a
  * single-category group.
  */
class KrippendorffSpec extends SparkSpec {

  private def units(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("a", LongType),
      StructField("b", LongType))),
    rows.map { case (g, a, b) => Row(g, a, b) })

  private def alpha2(rows: (String, Long, Long)*) =
    Analytics.krippendorffAlpha(units(rows: _*), "g",
      Seq(col("a"), col("b")))

  test("perfect agreement across mixed categories -> alpha = 1") {
    val out = alpha2(("g", 0L, 0L), ("g", 1L, 1L), ("g", 2L, 2L))
      .collect().head
    assert(out.getLong(1) == 3L && out.getLong(2) == 0L)
    assert(out.getDouble(3) == 1.0)
  }

  test("hand-computed 2-rater case: (0,0),(1,1),(0,0),(1,0)") {
    // SumX = 2; n = 8 values, n_0 = 5, n_1 = 3
    // de = 64 - (25 + 9) = 30; alpha = 1 - 7*2/30 = 8/15
    val out = alpha2(
      ("g", 0L, 0L), ("g", 1L, 1L), ("g", 0L, 0L), ("g", 1L, 0L))
      .collect().head
    assert(out.getLong(2) == 2L)
    assert(math.abs(out.getDouble(3) - 8.0 / 15.0) < 1e-6)
  }

  test("single observed category: de = 0 -> null alpha (undefined)") {
    val out = alpha2(("g", 1L, 1L), ("g", 1L, 1L)).collect().head
    assert(out.isNullAt(3))
  }

  test("three raters, systematic disagreement drives alpha negative") {
    // every unit rated (0,1,2): X_u = 6 each; alpha < 0 (worse than
    // chance agreement among balanced marginals)
    val d = df(
      StructType(Seq(
        StructField("g", StringType),
        StructField("a", LongType),
        StructField("b", LongType),
        StructField("c", LongType))),
      (1 to 6).map(_ => Row("g", 0L, 1L, 2L)))
    val out = Analytics.krippendorffAlpha(d, "g",
      Seq(col("a"), col("b"), col("c"))).collect().head
    assert(out.getLong(2) == 36L)
    assert(out.getDouble(3) < 0.0)
  }

  test("null ratings drop the unit, not the group") {
    val d = df(
      StructType(Seq(
        StructField("g", StringType),
        StructField("a", LongType),
        StructField("b", LongType))),
      Seq(Row("g", 0L, 0L), Row("g", 1L, 1L), Row("g", null, 1L)))
    val out = Analytics.krippendorffAlpha(d, "g",
      Seq(col("a"), col("b"))).collect().head
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(3) == 1.0)
  }
}
