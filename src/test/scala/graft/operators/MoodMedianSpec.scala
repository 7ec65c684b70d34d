package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.moodMedianTest]] — hand-computed 2×2 table, the exact
  * lower-median selection, and outlier immunity.
  */
class MoodMedianSpec extends SparkSpec {

  private def values(rows: (String, String, Long)*) = df(
    StructType(Seq(
      StructField("s", StringType),
      StructField("c", StringType),
      StructField("v", LongType))),
    rows.map { case (s, c, v) => Row(s, c, v) })

  private def mood(rows: (String, String, Long)*) =
    Analytics.moodMedianTest(values(rows: _*), "s", col("c"), col("v"))

  test("hand-computed: separated samples -> chi2 = 3 exactly") {
    val out = mood(
      ("s", "a", 1L), ("s", "a", 2L), ("s", "a", 3L),
      ("s", "b", 10L), ("s", "b", 11L), ("s", "b", 12L))
      .collect().head
    assert(out.getLong(1) == 10L)     // pooled lower median
    assert(out.getLong(2) == 2L)      // n_samples
    assert(out.getLong(3) == 6L)      // n
    assert(out.getLong(4) == 3000000000L) // chi2 = 3.0 in nano
    assert(out.getLong(5) == 1L)      // dof
  }

  test("identical samples -> zero statistic") {
    val out = mood(
      ("s", "a", 1L), ("s", "a", 2L), ("s", "b", 1L), ("s", "b", 2L))
      .collect().head
    assert(out.getLong(4) == 0L)
  }

  test("a 1000x outlier moves nothing: only the median side counts") {
    val base = Seq(
      ("s", "a", 1L), ("s", "a", 2L), ("s", "a", 3L),
      ("s", "b", 10L), ("s", "b", 11L), ("s", "b", 12L))
    val withOutlier = base.updated(5, ("s", "b", 12000L))
    val a = mood(base: _*).collect().head.getLong(4)
    val b = mood(withOutlier: _*).collect().head.getLong(4)
    assert(a == b)
  }

  test("odd pooled count picks the exact middle order statistic") {
    val out = mood(
      ("s", "a", 1L), ("s", "a", 5L), ("s", "b", 3L)).collect().head
    assert(out.getLong(1) == 3L)
  }
}
