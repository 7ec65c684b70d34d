package graft.streaming

import graft.SparkSpec
import graft.quality.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.mwDriftMaintenanceSink]] — the standing rank-test
  * monitor: stream == batch over the union (integer-exact, the q205
  * twin contract), replay idempotence, counts-based == rows-based.
  */
class MwDriftSinkSpec extends SparkSpec {

  import spark.implicits._

  private def baseline = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0),
    ("g", 3.0), ("g", 5.0), ("h", 10.0), ("h", 11.0))
    .toDF("grp", "v")

  test("cross-batch merge equals the batch test over the union; " +
      "replay overwrites") {
    implicit val sql = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_mw_store").toString + "/mw"
    val in = MemoryStream[(String, Double)]
    val q = EventStreams.mwDriftMaintenanceSink(
      in.toDF().toDF("grp", "v"), "v", Seq("grp"), store,
      java.nio.file.Files.createTempDirectory("graft_mw_ckpt")
        .toString)
    val b1 = Seq(("g", 2.0), ("g", 4.0), ("h", 10.5))
    val b2 = Seq(("g", 6.0), ("g", 6.0), ("h", 12.0))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def live = EventStreams.liveMwDrift(spark, store, baseline,
        "v", Seq("grp")).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val want = Drift.mannWhitneyU(baseline,
        (b1 ++ b2).toDF("grp", "v"), "v", Seq("grp")).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val first = live
      assert(first === want) // bit-equal: all-integer rank machinery
      // at-least-once redelivery of batch 0 rewrites its shard
      EventStreams.landMwCountShard(b1.toDF("grp", "v"), 0L, "v",
        Seq("grp"), store)
      assert(live === first)
    } finally q.stop()
  }

  test("counts-based entry equals the rows-based test, including " +
      "ties split across count rows") {
    val cur = Seq(("g", 2.0), ("g", 2.0), ("g", 7.0)).toDF("grp", "v")
    val want = Drift.mannWhitneyU(baseline, cur, "v", Seq("grp"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // the same multiset expressed as two count frames with the tie
    // SPLIT across rows (2.0 appears with n=1 twice) — the
    // aggregation inside must re-merge them
    val baseCounts = baseline.groupBy("grp", "v")
      .agg(count(lit(1)).as("n"))
    val curCounts = Seq(("g", 2.0, 1L), ("g", 2.0, 1L), ("g", 7.0, 1L))
      .toDF("grp", "v", "n")
    val got = Drift.mannWhitneyUFromCounts(baseCounts, curCounts,
      "v", "n", Seq("grp")).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got === want)
  }

  test("liveDriftPanel: the SAME store serves all three alarms and " +
      "equals the batch panel over the union") {
    implicit val sql = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_panel_store").toString + "/mw"
    val in = MemoryStream[(String, Double)]
    val q = EventStreams.mwDriftMaintenanceSink(
      in.toDF().toDF("grp", "v"), "v", Seq("grp"), store,
      java.nio.file.Files.createTempDirectory("graft_panel_ckpt")
        .toString)
    val b1 = Seq(("g", 2.0), ("g", 4.0), ("h", 10.5))
    val b2 = Seq(("g", 6.0), ("g", 6.0), ("h", 12.0))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      graft.core.CacheScope.withScope {
        val live = EventStreams.liveDriftPanel(spark, store, baseline,
          "v", Seq("grp")).collect()
          .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
        val want = Drift.driftPanel(baseline,
          (b1 ++ b2).toDF("grp", "v"), "v", Seq("grp")).collect()
          .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
        assert(live === want) // KS/CvM/MW all bit-equal off one store
      }
    } finally q.stop()
  }
}
