package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, floor}
import org.apache.spark.sql.types._

/** [[Analytics.quantileNormalize]] — hand-computed pooled positions,
  * rank preservation, and the equal-sized-groups identity (mapped
  * distributions become identical across groups).
  */
class QuantileNormSpec extends SparkSpec {

  private def frame(rows: (Long, String, Long)*) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("g", StringType),
      StructField("v", LongType))),
    rows.map { case (i, g, v) => Row(i, g, v) })

  private def run(rows: (Long, String, Long)*) =
    Analytics.quantileNormalize(frame(rows: _*), "id", "g",
        col("v"), col("id"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("value"), r.getAs[Long]("mapped"))))
      .toMap

  test("hand-computed positions: a shifted group maps onto the " +
      "pooled order statistics") {
    // group a: 10, 20, 30; group b: 110, 120, 130
    // pooled sorted: 10,20,30,110,120,130 (N=6); r of 3 -> pos 2r
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 110L), (5L, "b", 120L), (6L, "b", 130L))
    val out = run(rows: _*)
    assert(out(1L) == ((10L, 20L)))   // pos ceil(1*6/3)=2
    assert(out(2L) == ((20L, 110L)))  // pos 4
    assert(out(3L) == ((30L, 130L)))  // pos 6
    assert(out(4L) == ((110L, 20L)))
    assert(out(5L) == ((120L, 110L)))
    assert(out(6L) == ((130L, 130L)))
  }

  test("equal-sized groups end up with IDENTICAL mapped multisets — " +
      "the quantile-normalization contract") {
    val a = (1 to 40).map(i => (i.toLong, "a", (i * i).toLong))
    val b = (1 to 40).map(i => ((100 + i).toLong, "b", (1000 + 3 * i).toLong))
    val out = run((a ++ b): _*)
    val ma = a.map(r => out(r._1)._2).sorted
    val mb = b.map(r => out(r._1)._2).sorted
    assert(ma == mb)
  }

  test("mapping preserves within-group rank order (monotone)") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 50L), (3L, "a", 500L),
      (4L, "b", 7L), (5L, "b", 8L), (6L, "b", 9L), (7L, "b", 10L))
    val out = run(rows: _*)
    assert(out(1L)._2 <= out(2L)._2 && out(2L)._2 <= out(3L)._2)
    assert(out(4L)._2 <= out(5L)._2 && out(5L)._2 <= out(6L)._2 &&
      out(6L)._2 <= out(7L)._2)
  }

  test("value ties are resolved by the tie column — every row gets " +
      "exactly one mapped value") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (4L, "b", 10L), (5L, "b", 10L))
    val out = run(rows: _*)
    assert(out.size == 5)
    out.values.foreach { case (_, m) => assert(m == 10L) }
  }

  test("null groups and values are excluded") {
    val withNulls = df(
      StructType(Seq(
        StructField("id", LongType),
        StructField("g", StringType),
        StructField("v", LongType))),
      Seq(Row(1L, "a", 10L), Row(2L, null, 20L), Row(3L, "a", null)))
    val out = Analytics.quantileNormalize(withNulls, "id", "g",
      col("v"), col("id")).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }
}
