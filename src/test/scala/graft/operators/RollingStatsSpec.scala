package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Analytics.rollingStats]] — trailing-window z-score anomaly
  * detection. Statistics derive from exact integer frame sums, so the
  * expected values here are closed-form.
  */
class RollingStatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("k", StringType),
    StructField("ts", TimestampType),
    StructField("v", LongType)))

  private def at(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  private def run(rows: Seq[Row], windowSec: Long,
      minCount: Int = 2, includeCurrent: Boolean = false) =
    Analytics.rollingStats(df(schema, rows), "k", "ts", "v",
        windowSec, zThreshold = 3.0, minCount = minCount,
        includeCurrent = includeCurrent)
      .orderBy("id")
      .collect()

  test("closed-form baseline stats and z over the prior window") {
    // baseline 100, 102, 98 then a 1000 spike, all within the window
    val rows = Seq(
      Row(0, "a", at(0), 100L), Row(1, "a", at(10), 102L),
      Row(2, "a", at(20), 98L), Row(3, "a", at(30), 1000L))
    val out = run(rows, windowSec = 60)
    val spike = out(3)
    assert(spike.getAs[Long]("roll_n") == 3L)
    // s1 = 300, s2 = 30008; mean = 100; var = (3*30008 - 90000)/9
    val mean = 300.0 / 3
    val varPop = (3L * 30008L - 300L * 300L).toDouble / 9
    val z = ((1000L * 3 - 300L).toDouble / 3) / math.sqrt(varPop)
    assert(spike.getAs[Double]("roll_mean") == mean)
    assert(spike.getAs[Double]("roll_std") == math.sqrt(varPop))
    assert(spike.getAs[Double]("zscore") == z)
    assert(z > 3.0 && spike.getAs[Int]("is_anomaly") == 1)
    // the stable rows are not anomalous
    assert(out.take(3).forall(_.getAs[Int]("is_anomaly") == 0))
  }

  test("frame is [t-W, t): left edge inclusive, current row and exact-ts peers excluded") {
    val rows = Seq(
      Row(0, "a", at(0), 10L),    // exactly W before row 2 -> included
      Row(1, "a", at(30), 20L),
      Row(2, "a", at(60), 30L),
      Row(3, "a", at(60), 40L))   // ts-tie with row 2 -> excluded from its frame
    val out = run(rows, windowSec = 60)
    assert(out(2).getAs[Long]("roll_n") == 2L) // rows 0 and 1, not the tie
    assert(out(3).getAs[Long]("roll_n") == 2L)
    assert(out(2).getAs[Double]("roll_mean") == 15.0)
    // row 0 slides out one second later
    val shifted = run(rows.map {
      case Row(3, k, _, v) => Row(3, k, at(61), v)
      case r => r
    }, windowSec = 60)
    assert(shifted(3).getAs[Long]("roll_n") == 2L) // rows 1 and 2; row 0 aged out
    assert(shifted(3).getAs[Double]("roll_mean") == 25.0)
  }

  test("includeCurrent=true restores the pandas-style inclusive frame") {
    val rows = Seq(
      Row(0, "a", at(0), 100L), Row(1, "a", at(10), 200L))
    val out = run(rows, windowSec = 60, includeCurrent = true)
    assert(out(0).getAs[Long]("roll_n") == 1L)
    assert(out(1).getAs[Long]("roll_n") == 2L)
    assert(out(1).getAs[Double]("roll_mean") == 150.0)
    // self-inclusive two-row frame pins |z| to 1
    assert(math.abs(out(1).getAs[Double]("zscore")) == 1.0)
  }

  test("guards: empty baseline, minCount, and zero variance give null z and no flag") {
    val rows = Seq(
      Row(0, "a", at(0), 100L),            // empty baseline
      Row(1, "a", at(10), 500L),           // n=1 < minCount
      Row(2, "b", at(0), 7L), Row(3, "b", at(10), 7L),
      Row(4, "b", at(20), 9000L))          // baseline {7,7}: var = 0
    val out = run(rows, windowSec = 60)
    for (i <- Seq(0, 1, 4)) {
      assert(out(i).isNullAt(out(i).fieldIndex("zscore")))
      assert(out(i).getAs[Int]("is_anomaly") == 0)
    }
    assert(out(0).getAs[Long]("roll_n") == 0L)
    assert(out(0).isNullAt(out(0).fieldIndex("roll_mean")))
    assert(out(4).getAs[Double]("roll_std") == 0.0)
  }

  test("keys are independent and null ts/value rows are dropped") {
    val rows = Seq(
      Row(0, "a", at(0), 100L), Row(1, "b", at(5), 900L),
      Row(2, "a", at(10), 102L), Row(3, "a", null, 1L),
      Row(4, "a", at(20), null))
    val out = run(rows, windowSec = 60)
    assert(out.map(_.getAs[Int]("id")).toSeq == Seq(0, 1, 2))
    assert(out(2).getAs[Long]("roll_n") == 1L) // only row 0; b's row invisible
  }
}
