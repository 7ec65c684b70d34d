package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.holtMaintenanceSink]] — the standing forecast
  * monitor: live == batch over the union (bit-equal, integer
  * recursion), late buckets merge correctly, replay overwrites.
  */
class HoltSinkSpec extends SparkSpec {

  import spark.implicits._

  test("cross-batch live forecast equals the batch fold over the " +
      "union; a LATE row for an old bucket still lands in order; " +
      "replay overwrites") {
    implicit val sql = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_holt_store").toString + "/holt"
    val in = MemoryStream[(String, Int, Long)]
    val q = EventStreams.holtMaintenanceSink(
      in.toDF().toDF("g", "day", "cents"), Seq("g"), "day",
      col("cents"), store,
      java.nio.file.Files.createTempDirectory("graft_holt_ckpt")
        .toString)
    val b1 = Seq(("g", 0, 100L), ("g", 1, 90L), ("h", 0, 5L))
    // batch 2 carries days 2-3 AND a late addition to g's day 1
    val b2 = Seq(("g", 2, 120L), ("g", 3, 80L), ("g", 1, 10L),
      ("h", 1, 6L))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def live = EventStreams.liveHoltForecast(spark, store, Seq("g"))
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val want = Analytics.holtForecast(
        (b1 ++ b2).toDF("g", "day", "cents"), Seq("g"), col("day"),
        col("cents")).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val first = live
      assert(first === want) // bit-equal: same integer fold
      assert(first("g")(0) === 4L) // n_buckets merged, not 5
      // at-least-once redelivery of batch 0 rewrites its shard
      EventStreams.landHoltBucketShard(b1.toDF("g", "day", "cents"),
        0L, Seq("g"), "day", col("cents"), store)
      assert(live === first)
      // the SAME store serves the Theil-Sen monitor, bit-equal to
      // its batch form — the point of storing the additive statistic
      val liveTs = EventStreams.liveTheilSenTrend(spark, store,
        Seq("g")).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val wantTs = Analytics.theilSenTrend(
        (b1 ++ b2).toDF("g", "day", "cents"), Seq("g"), col("day"),
        col("cents")).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(liveTs === wantTs)
    } finally q.stop()
  }
}
