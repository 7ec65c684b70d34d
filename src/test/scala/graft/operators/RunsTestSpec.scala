package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.runsTest]] — hand-counted runs, the exact-median-drop
  * contract, the perfect-alternation and single-block extremes, and
  * the planted q304 regime oscillation on the real corpus.
  */
class RunsTestSpec extends SparkSpec {

  private def seriesDf(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("bx", LongType),
      StructField("y", LongType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  private def rt(rows: (String, Long, Long)*) =
    Analytics.runsTest(seriesDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("bx"),
      org.apache.spark.sql.functions.col("y"))

  test("hand-counted: {1,9,2,8} alternates around median 5 -> " +
      "4 runs, the maximum, positive z") {
    val out = rt(("g", 1L, 1L), ("g", 2L, 9L), ("g", 3L, 2L),
      ("g", 4L, 8L)).head()
    assert(out.getLong(1) == 4L && out.getLong(3) == 4L)
    // E[R] = 2*2*2/4 + 1 = 3; Var = 8*(8-4)/(16*3) = 2/3
    val want = (4.0 - 3.0) / math.sqrt(2.0 / 3.0)
    assert(out.getDouble(4) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("two clean blocks {1,2,8,9} give the minimum 2 runs and " +
      "negative z") {
    val out = rt(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 8L),
      ("g", 4L, 9L)).head()
    assert(out.getLong(3) == 2L)
    assert(out.getDouble(4) < 0.0)
  }

  test("exact-median buckets drop from the sequence but the runs " +
      "count stays coherent (odd n: the middle value IS the median)") {
    val out = rt(("g", 1L, 1L), ("g", 2L, 5L), ("g", 3L, 9L)).head()
    // median 5 drops; kept = {1, 9} -> 2 runs of the 2-long sequence
    assert(out.getLong(1) == 2L && out.getLong(3) == 2L)
  }

  test("one-sided kept sequence is guarded: all-above (after even-n " +
      "median) can't happen, but a two-value {5,5,9} collapse can — " +
      "null z") {
    val out = rt(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 9L)).head()
    // med2 = 10 -> the two 5s drop, only 9 remains: n1=1, n2=0
    assert(out.isNullAt(4) && out.getInt(5) == 0)
  }

  test("q304 on the real corpus: the block oscillation collapses " +
      "purchase to 10 runs (clumped); clean types read random") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .runsTestQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("purchase").getInt(5) == 1)
      assert(byG("purchase").getDouble(4) < -1.96)
      byG.filterKeys(_ != "purchase").values.foreach { r =>
        assert(r.getInt(5) == 0, s"${r.getString(0)} false alarm")
      }
    }
  }
}
