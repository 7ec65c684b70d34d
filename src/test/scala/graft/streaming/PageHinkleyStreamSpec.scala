package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[EventStreams.pageHinkleyStream]] — the self-calibrating level
  * monitor's streaming twin: observed buckets emit when the watermark
  * closes them, late ticks drop, absent buckets do NOT zero-fill
  * (a value series has no mean for a silent hour), and every emitted
  * row is bit-equal to [[Analytics.pageHinkleyTrace]] over the
  * arrived events.
  */
class PageHinkleyStreamSpec extends SparkSpec {

  import EventStreams.{PhPoint, PhTick}

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def awaitRows(name: String, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.table(name).count() < n &&
      System.nanoTime() < deadline) Thread.sleep(100)
  }

  test("closed buckets match the batch trace bit-for-bit; a gap " +
      "bucket emits nothing; late ticks drop; the step alarms") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[PhTick]
    // hourly buckets, no slack, alarm at 5e6 µ (5 cents of mean)
    val out = EventStreams.pageHinkleyStream(in.toDS(),
      periodSec = 3600L, deltaMicro = 0L, lambdaMicro = 5000000L,
      watermark = "30 minutes")
    val q = out.writeStream.format("memory")
      .queryName("ph_stream").outputMode("append").start()
    try {
      // hour 10: two ticks (mean 10); hour 11 silent (NO row);
      // hour 12: one tick; max ts 13:10 → wm 12:40 → hours 10..12
      // closable, but only 10 and 12 observed
      in.addData(
        PhTick("a", t("10:05"), 8L), PhTick("a", t("10:25"), 12L),
        PhTick("a", t("12:15"), 10L), PhTick("a", t("13:10"), 22L))
      q.processAllAvailable()
      awaitRows("ph_stream", 2L)
      // a LATE tick into closed hour 10 drops; "b" traffic advances
      // the watermark past hour 13 so the 22-cent step closes
      in.addData(PhTick("a", t("10:45"), 99L),
        PhTick("b", t("15:00"), 7L))
      q.processAllAvailable()
      awaitRows("ph_stream", 3L)
      val got = spark.table("ph_stream").as[PhPoint]
        .collect().sortBy(p => (p.group, p.bucket))
      val aRows = got.filter(_.group == "a")
      assert(aRows.map(_.bucket % 24).toSeq === Seq(10L, 12L, 13L))
      assert(aRows.map(_.n).toSeq === Seq(2L, 1L, 1L))
      // hand math (µ): x = {10e6, 10e6, 22e6}; means {10e6, 10e6,
      // 14e6}; terms {0, 0, 8e6}; m {0, 0, 8e6}; min 0 → ph
      // {0, 0, 8e6}; the step crosses 5e6
      assert(aRows.map(_.x_micro).toSeq ===
        Seq(10000000L, 10000000L, 22000000L))
      assert(aRows.map(_.ph_micro).toSeq === Seq(0L, 0L, 8000000L))
      assert(aRows.map(_.alarmed).toSeq === Seq(0, 0, 1))
      // batch trace over the ARRIVED (non-late) ticks, restricted to
      // the closed set — bit-for-bit
      val arrived = Seq(
        ("a", t("10:05"), 8L), ("a", t("10:25"), 12L),
        ("a", t("12:15"), 10L), ("a", t("13:10"), 22L),
        ("b", t("15:00"), 7L))
        .toDF("group", "ts", "cents")
      val batch = Analytics.pageHinkleyTrace(arrived, Seq("group"),
          floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long"),
          col("cents"), deltaMicro = 0L, lambdaMicro = 5000000L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
        .toMap
      got.foreach { p =>
        assert(batch((p.group, p.bucket)) ===
          ((p.n, p.x_micro, p.ph_micro, p.alarmed)),
          s"mismatch at ${p.group}/${p.bucket}")
      }
    } finally q.stop()
  }

  test("the slack discount and floored running mean carry across " +
      "batches: state survives and the recursion stays exact") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[PhTick]
    val out = EventStreams.pageHinkleyStream(in.toDS(),
      periodSec = 3600L, deltaMicro = 1000000L,
      lambdaMicro = 100000000L, watermark = "0 seconds")
    val q = out.writeStream.format("memory")
      .queryName("ph_slack").outputMode("append").start()
    try {
      // values 1 then 2 cents: t=2 mean floors to 1.5e6 → 1500000
      in.addData(PhTick("g", t("00:30"), 1L))
      q.processAllAvailable()
      in.addData(PhTick("g", t("01:30"), 2L))
      q.processAllAvailable()
      in.addData(PhTick("g", t("02:30"), 2L))
      q.processAllAvailable()
      awaitRows("ph_slack", 2L)
      val got = spark.table("ph_slack").as[PhPoint]
        .collect().sortBy(_.bucket)
      // t1: x=1e6, mean=1e6, term=-1e6, m=-1e6, min=-1e6, ph=0
      // t2: x=2e6, cum=3e6, mean=floor(1.5e6)=1500000,
      //     term=2e6-1500000-1e6=-500000, m=-1.5e6, ph=0... min -1.5e6
      assert(got.map(_.ph_micro).toSeq === Seq(0L, 0L))
      assert(got.map(_.x_micro).toSeq === Seq(1000000L, 2000000L))
    } finally q.stop()
  }
}
