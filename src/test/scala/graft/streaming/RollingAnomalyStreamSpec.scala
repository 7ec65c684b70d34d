package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[EventStreams.rollingAnomalyStream]] — the monitoring family's
  * streaming twin: trailing-baseline z-scores emitted only when the
  * watermark CLOSES an event (its `[t − W, t)` baseline can no longer
  * change), late events dropped, state pruned to the in-horizon
  * buffer. Equality with [[Analytics.rollingStats]] is pinned
  * row-for-row on the closed set, nulls and all.
  */
class RollingAnomalyStreamSpec extends SparkSpec {

  import EventStreams.AnomalyEvent

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def awaitRows(name: String, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.table(name).count() < n &&
      System.nanoTime() < deadline) Thread.sleep(100)
  }

  test("closed events match the batch twin row-for-row; pending and " +
      "late events are withheld/dropped; baselines cross batches and " +
      "survive pruning") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[AnomalyEvent]
    val scored = EventStreams.rollingAnomalyStream(
      in.toDS(), windowSec = 3600L, zThreshold = 1.0, minCount = 2,
      watermark = "30 minutes")
    val q = scored.writeStream.format("memory")
      .queryName("roll_anom").outputMode("append").start()
    try {
      // b1: max ts 11:30 → watermark after b1 = 11:00
      in.addData(
        AnomalyEvent(1L, 1L, t("10:00"), 100L),
        AnomalyEvent(2L, 1L, t("10:30"), 110L),
        AnomalyEvent(3L, 1L, t("11:30"), 500L))
      q.processAllAvailable()
      // b2: id 5 is LATE (10:40 < wm 11:00) → dropped; 4 and 10
      // buffer. Events ≤ 11:00 close now: ids 1 (empty baseline)
      // and 2 (baseline {100})
      in.addData(
        AnomalyEvent(4L, 1L, t("11:10"), 120L),
        AnomalyEvent(5L, 1L, t("10:40"), 999L),
        AnomalyEvent(10L, 2L, t("11:20"), 50L))
      q.processAllAvailable()
      awaitRows("roll_anom", 2L)
      val early = spark.table("roll_anom").select("event_id")
        .as[Long].collect().toSet
      assert(early == Set(1L, 2L), "only watermark-closed events emit")
      // b3: u1 data at 12:30 → wm advances to 12:00; the no-data
      // batch fires timeouts: id 4 closes (baseline {110} — 10:00 is
      // outside [10:10, 11:10)), id 3 closes (baseline {110, 120},
      // z = 77 → anomaly), id 10 closes on timeout with NO new u2
      // data (empty baseline)
      in.addData(AnomalyEvent(6L, 1L, t("12:30"), 130L))
      q.processAllAvailable()
      awaitRows("roll_anom", 5L)
      // b4: wm reaches 13:00 → id 6 closes; its baseline {500@11:30}
      // must have SURVIVED the prune to [wm − W) at the previous
      // close (11:10 sits below the 11:30 frame start — excluded)
      in.addData(AnomalyEvent(7L, 1L, t("13:30"), 140L))
      q.processAllAvailable()
      awaitRows("roll_anom", 6L)
      val got = spark.table("roll_anom")
      val ids = got.select("event_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L, 4L, 6L, 10L),
        "late id 5 dropped; pending id 7 withheld")
      // the anomaly: id 3 at 500 against baseline {110, 120}
      val a3 = got.where(col("event_id") === 3).head()
      assert(a3.getAs[Long]("roll_n") == 2L)
      assert(a3.getAs[Double]("roll_mean") == 115.0)
      assert(a3.getAs[Double]("roll_std") == 5.0)
      assert(a3.getAs[Double]("zscore") == 77.0)
      assert(a3.getAs[Int]("is_anomaly") == 1)
      // batch twin over exactly the ARRIVED events (late id 5 never
      // did), restricted to the closed set — row-for-row, nulls too
      val arrived = Seq(
        (1L, 1L, t("10:00"), 100L), (2L, 1L, t("10:30"), 110L),
        (3L, 1L, t("11:30"), 500L), (4L, 1L, t("11:10"), 120L),
        (10L, 2L, t("11:20"), 50L), (6L, 1L, t("12:30"), 130L),
        (7L, 1L, t("13:30"), 140L))
        .toDF("event_id", "user_id", "ts", "cents")
      val twin = Analytics.rollingStats(arrived, "user_id", "ts",
          "cents", windowSec = 3600L, zThreshold = 1.0, minCount = 2)
        .where(col("event_id").isInCollection(ids))
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "roll_n", "roll_mean", "roll_std",
            "zscore", "is_anomaly")
          .orderBy("event_id").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
            r.get(5).toString.toInt))
          .toSeq
      assert(norm(got) == norm(twin))
    } finally q.stop()
  }
}
