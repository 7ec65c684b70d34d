package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot diff ([[Analytics.tableDiff]]) and time-weighted average
  * ([[Analytics.timeWeightedAvg]]).
  */
class DiffTwaSpec extends SparkSpec {

  private val snapSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = true),
    StructField("a", StringType, nullable = true),
    StructField("b", DoubleType, nullable = true)))

  private def snap(rows: (Integer, String, java.lang.Double)*) =
    df(snapSchema, rows.map { case (k, a, b) => Row(k, a, b) })

  private def diff(
      l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): Map[Int, String] =
    Analytics.tableDiff(l, r, Seq("k"), Seq("a", "b"))
      .collect().map(x => x.getInt(0) -> x.getString(1)).toMap

  test("diff classifies added, removed, changed, unchanged") {
    val left = snap((1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0))
    val right = snap((1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0))
    assert(diff(left, right) == Map(
      1 -> "unchanged", 2 -> "changed", 3 -> "removed", 4 -> "added"))
  }

  test("null values compare as equal to null, different from 'None' string") {
    val left = snap((1, null, 1.0), (2, "None", 1.0))
    val right = snap((1, null, 1.0), (2, "None", 1.0))
    assert(diff(left, right) == Map(1 -> "unchanged", 2 -> "unchanged"))
    // null vs the literal string "None" is a CHANGE (null renders as
    // "n", values as "v"+value — no sentinel collision)
    val r2 = snap((1, "None", 1.0), (2, null, 1.0))
    assert(diff(left, r2) == Map(1 -> "changed", 2 -> "changed"))
  }

  test("delimiter injection cannot alias two different rows") {
    // ("a", "b|n") and ("a|vb", null) would render identically under
    // naive "|"-joined concatenation; the length-prefixed rendering
    // keeps them distinct
    val sch = StructType(Seq(
      StructField("k", IntegerType),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true)))
    val left = df(sch, Seq(Row(1, "a", "b|n")))
    val right = df(sch, Seq(Row(1, "a|vb", null)))
    val out = Analytics.tableDiff(left, right, Seq("k"), Seq("a", "b"))
      .collect()
    assert(out.head.getString(1) == "changed")
  }

  test("null keys join null-safely (one row, not added+removed)") {
    val left = snap((null, "x", 1.0))
    val right = snap((null, "x", 1.0))
    val out = Analytics.tableDiff(left, right, Seq("k"), Seq("a", "b"))
      .collect()
    assert(out.length == 1 && out.head.getString(1) == "unchanged")
  }

  test("diff shuffles digests, not wide rows (payload columns pruned)") {
    val plan = Analytics.tableDiff(
        snap((1, "x", 1.0)), snap((1, "x", 2.0)), Seq("k"),
        Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // the exchange carries k + md5 digest only; the rendered source
    // columns a, b must not appear in any Exchange output schema
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange")).mkString("\n")
    assert(!exchangeLines.contains("a#") && !exchangeLines.contains("b#"),
      s"wide columns crossed the exchange:\n$exchangeLines")
  }

  private val twaSchema = StructType(Seq(
    StructField("u", IntegerType),
    StructField("ts", TimestampType),
    StructField("v", DoubleType),
    StructField("id", IntegerType)))

  private def ts(sec: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  private def twa(rows: (Int, Int, Double, Int)*) =
    Analytics.timeWeightedAvg(
        df(twaSchema, rows.map { case (u, s, v, i) =>
          Row(u, ts(s), v, i) }),
        "u", "ts", "v", tieBreak = Seq("id"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq

  test("value held longer weighs more; last observation unweighted") {
    // v=10 for 30s, v=0 for 10s, final v=99 never weighted:
    // twa = (10*30 + 0*10) / 40 = 7.5
    assert(twa((1, 0, 10.0, 1), (1, 30, 0.0, 2), (1, 40, 99.0, 3)) ==
      Seq((1, 2L, 7.5)))
  }

  test("uniform sampling degenerates to the plain mean") {
    val out = twa((1, 0, 1.0, 1), (1, 10, 2.0, 2), (1, 20, 6.0, 3),
      (1, 30, 0.0, 4))
    assert(out == Seq((1, 3L, 3.0))) // (1+2+6)/3
  }

  test("single-observation and zero-span entities are excluded") {
    val out = twa(
      (1, 5, 42.0, 1), // single obs — no interval
      (2, 7, 1.0, 1), (2, 7, 2.0, 2), // zero span
      (3, 0, 4.0, 1), (3, 10, 0.0, 2))
    assert(out == Seq((3, 1L, 4.0)))
  }

  test("same-instant tie contributes zero regardless of tie order") {
    // u=1: (t0 v=8 id=2) and (t0 v=2 id=1) tie; then t10.
    // id=1 orders first with 0-length interval: twa = 8*10/10 = 8
    assert(twa((1, 0, 8.0, 2), (1, 0, 2.0, 1), (1, 10, 0.0, 3)) ==
      Seq((1, 2L, 8.0)))
  }

  test("integer values times microsecond gaps do not overflow Long " +
      "(products accumulate in double)") {
    val schema = StructType(Seq(
      StructField("u", IntegerType),
      StructField("ts", TimestampType),
      StructField("v", LongType)))
    // value 1e12 held for a day = 1e12 * 8.64e10 µs ≈ 8.6e22 — far
    // past Long.MaxValue (9.2e18); ANSI-off long arithmetic would
    // wrap silently and emit garbage
    val day = 86400
    val d = df(schema, Seq(
      Row(1, ts(0), 1000000000000L),
      Row(1, ts(day), 3000000000000L),
      Row(1, ts(3 * day), 0L)))
    val out = Analytics.timeWeightedAvg(d, "u", "ts", "v").head()
    // (1e12·1day + 3e12·2days) / 3days = 7/3e12
    assert(math.abs(out.getAs[Double]("twa") - 7e12 / 3) < 1e3,
      s"got ${out.getAs[Double]("twa")}")
  }
}
