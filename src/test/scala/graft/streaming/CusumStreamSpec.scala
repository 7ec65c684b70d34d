package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[EventStreams.cusumStream]] — the monitoring family's continuous
  * level-shift twin: per-period counts accumulate one-sided CUSUM
  * sums against a fixed reference, a period emits exactly when the
  * watermark closes it, gap periods emit zeros (never past the max
  * observed period), late ticks drop, and the whole statistic is
  * BIGINT so batch equality is bit-for-bit.
  */
class CusumStreamSpec extends SparkSpec {

  import EventStreams.{CusumPoint, CusumTick}

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def awaitRows(name: String, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.table(name).count() < n &&
      System.nanoTime() < deadline) Thread.sleep(100)
  }

  test("closed periods match the batch twin bit-for-bit; gaps emit " +
      "zeros; late ticks drop; quiet groups close via timeout") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[CusumTick]
    // hourly periods, target 2 events/period, threshold 2500 milli
    val out = EventStreams.cusumStream(in.toDS(), periodSec = 3600L,
      targetMilli = 2000L, hMilli = 2500L, watermark = "30 minutes")
    val q = out.writeStream.format("memory")
      .queryName("cusum_stream").outputMode("append").start()
    try {
      // b1: ticks in hours 10 and 13 (hours 11, 12 are a gap);
      // max ts 13:10 → wm 12:40 → hours 10..11 close
      in.addData(
        CusumTick("a", t("10:05")), CusumTick("a", t("10:15")),
        CusumTick("a", t("10:25")), CusumTick("a", t("13:10")))
      q.processAllAvailable()
      awaitRows("cusum_stream", 2L)
      // b2: a LATE tick into closed hour 10 must drop (its row is
      // final); a second group appears, advancing wm to 14:30 →
      // hour 12 (gap zero) and hour 13 close for "a"
      in.addData(
        CusumTick("a", t("10:45")), CusumTick("b", t("15:00")))
      q.processAllAvailable()
      awaitRows("cusum_stream", 4L)
      // b3: more "b" traffic pushes wm to 16:30 — "a" has NOTHING
      // pending past its max observed period (13): no further "a"
      // rows ever; "b"'s hour 15 closes on its own data
      in.addData(CusumTick("b", t("17:00")))
      q.processAllAvailable()
      awaitRows("cusum_stream", 5L)
      val got = spark.table("cusum_stream").as[CusumPoint]
        .collect().sortBy(p => (p.group, p.period))
      val aRows = got.filter(_.group == "a")
      assert(aRows.map(_.period % 24).toSeq === Seq(10L, 11L, 12L, 13L))
      // counts: 3 (late 10:45 dropped), then gap zeros, then 1
      assert(aRows.map(_.n).toSeq === Seq(3L, 0L, 0L, 1L))
      // hand math (milli): d = 1000·c − 2000 → cs {1000,−1000,−3000,
      // −4000}; S⁺ = {1000, 0, 0, 0}; S⁻ = {0, 2000, 4000, 5000}
      assert(aRows.map(_.cusum_pos_milli).toSeq ===
        Seq(1000L, 0L, 0L, 0L))
      assert(aRows.map(_.cusum_neg_milli).toSeq ===
        Seq(0L, 2000L, 4000L, 5000L))
      assert(aRows.map(_.shift_down).toSeq === Seq(0, 0, 1, 1))
      assert(aRows.forall(_.shift_up == 0))
      // batch twin over the ARRIVED (non-late) ticks, restricted to
      // the closed set — bit-for-bit
      val arrived = Seq(
        ("a", t("10:05")), ("a", t("10:15")), ("a", t("10:25")),
        ("a", t("13:10")), ("b", t("15:00")), ("b", t("17:00")))
        .toDF("group", "ts")
      val batch = Analytics.cusumFixedTarget(arrived, "group",
          floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long"),
          targetMilli = 2000L, hMilli = 2500L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5),
            r.getInt(6))).toMap
      got.foreach { p =>
        assert(batch((p.group, p.period)) ===
          ((p.n, p.cusum_pos_milli, p.cusum_neg_milli, p.shift_up,
            p.shift_down)), s"mismatch at ${p.group}/${p.period}")
      }
    } finally q.stop()
  }

  test("the upward branch fires and state survives long gaps") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[CusumTick]
    val out = EventStreams.cusumStream(in.toDS(), periodSec = 3600L,
      targetMilli = 1000L, hMilli = 1500L, watermark = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("cusum_up").outputMode("append").start()
    try {
      // hour 0: 3 ticks (d = +2000); hour 1: 3 ticks (d = +2000):
      // S⁺ crosses 1500 immediately and keeps climbing
      in.addData(CusumTick("g", t("00:10")), CusumTick("g", t("00:20")),
        CusumTick("g", t("00:30")))
      q.processAllAvailable()
      in.addData(CusumTick("g", t("01:10")), CusumTick("g", t("01:20")),
        CusumTick("g", t("01:50")))
      q.processAllAvailable()
      in.addData(CusumTick("g", t("02:30")))
      q.processAllAvailable()
      awaitRows("cusum_up", 2L)
      val got = spark.table("cusum_up").as[CusumPoint]
        .collect().sortBy(_.period)
      assert(got.map(_.cusum_pos_milli).toSeq === Seq(2000L, 4000L))
      assert(got.map(_.shift_up).toSeq === Seq(1, 1))
    } finally q.stop()
  }
}
