package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Analytics.positionAttribution]] and [[Analytics.jackknifeRatio]]. */
class AttributionJackknifeSpec extends SparkSpec {

  private val evSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("ts", TimestampType),
    StructField("id", LongType)))

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  private def events(rows: (Long, Int, Long)*) =
    df(evSchema, rows.map { case (k, m, i) => Row(k, ts(m), i) })

  test("U-shaped credit: 1000 / 500+500 / 400+200+400 / " +
      "400+66x2+68+400, each conversion summing to exactly 1000") {
    // users 1..4 convert at minute 50 with 1..5 prior touches
    val conv = events((1L, 50, 100L), (2L, 50, 200L), (3L, 50, 300L),
      (4L, 50, 400L))
    val tch = events(
      (1L, 10, 1L),
      (2L, 10, 1L), (2L, 20, 2L),
      (3L, 10, 1L), (3L, 20, 2L), (3L, 30, 3L),
      (4L, 10, 1L), (4L, 20, 2L), (4L, 30, 3L), (4L, 40, 4L),
      (4L, 45, 5L))
    val got = Analytics.positionAttribution(conv, tch, "k", "ts",
        "id", "2 hours")
      .select(col("k"), col("touch_rank"), col("credit_milli"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got((1L, 1)) == 1000L)
    assert(got((2L, 1)) == 500L && got((2L, 2)) == 500L)
    assert(got((3L, 1)) == 400L && got((3L, 2)) == 200L &&
      got((3L, 3)) == 400L)
    // n = 5: middles split 200 div 3 = 66 with remainder 2 on the
    // LAST middle (rank 4)
    assert(got((4L, 1)) == 400L && got((4L, 2)) == 66L &&
      got((4L, 3)) == 66L && got((4L, 4)) == 68L &&
      got((4L, 5)) == 400L)
    for (u <- 1L to 4L)
      assert(got.collect { case ((k, _), c) if k == u => c }.sum
        == 1000L, s"user $u total")
  }

  private val jkSchema = StructType(Seq(
    StructField("key", LongType),
    StructField("num", LongType),
    StructField("den", LongType)))

  test("jackknife matches the exact integer replay of the " +
      "delete-one-bucket construction") {
    val rows = (1L to 400L).map(i => Row(i, i * 37 % 1000 + 100,
      i % 7 + 1))
    val d = df(jkSchema, rows)
    val got = Analytics.jackknifeRatio(d, col("num"), col("den"),
        col("key"), buckets = 8, scale = 1e6)
      .collect()(0)
    // replay: same md5 bucketing via the engine itself, math on the
    // driver in exact integers
    val bk = d.select(
        (conv(substring(md5(concat(lit("jk:"),
          col("key").cast("string"))), 1, 8), 16, 10).cast("long")
          % 8).as("b"), col("num"), col("den"))
      .groupBy("b").agg(sum("num").as("sn"), sum("den").as("sd"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (tn, td) = (bk.map(_._1).sum, bk.map(_._2).sum)
    val tis = bk.map { case (sn, sd) =>
      math.floor(1e6 * (tn - sn).toDouble / (td - sd).toDouble).toLong
    }
    val nb = tis.length
    val tbar = tis.sum / nb
    val ss = tis.map(t => (t - tbar) * (t - tbar)).sum
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    assert(got.getLong(0) == nb.toLong)
    assert(got.getDouble(1) == r9(tn.toDouble / td.toDouble))
    assert(got.getDouble(2) == r9(tbar.toDouble / 1e6))
    assert(got.getDouble(3) ==
      r9(math.sqrt(ss.toDouble * (nb - 1) / nb) / 1e6))
  }

  test("over-cap bucket deviation raises instead of wrapping") {
    // two wildly different buckets at max scale: deviation * 1e12
    // blows the per-deviation bound
    val d = df(jkSchema, Seq(Row(1L, 1000000L, 1L), Row(2L, 1L, 1000L),
      Row(3L, 999999L, 2L), Row(4L, 5L, 800L)))
    val e = intercept[Exception] {
      Analytics.jackknifeRatio(d, col("num"), col("den"), col("key"),
        buckets = 2, scale = 1e12).collect()
    }
    assert(e.getMessage.contains("jackknifeRatio"))
  }
}
