package graft.streaming

import graft.SparkSpec
import graft.quality.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.mgMaintenanceSink]] — standing heavy-hitter
  * candidates.
  */
class MgSinkSpec extends SparkSpec {

  test("streamed shards retain the heavy value; replay OVERWRITES " +
      "the shard; exact verify over the live store is deterministic") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_mg_store").toString + "/mg"
    val in = MemoryStream[String]
    val k = 4
    val q = EventStreams.mgMaintenanceSink(
      in.toDF().toDF("item"), "item", store,
      java.nio.file.Files.createTempDirectory("graft_mg_ckpt")
        .toString, k = k)
    // 30 items over two batches; "hot" holds 12 > 30/(k+1) = 6
    val b1 = Seq.fill(7)("hot") ++ (1 to 8).map(i => s"a$i")
    val b2 = Seq.fill(5)("hot") ++ (1 to 10).map(i => s"b$i")
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def live = EventStreams.liveMgCandidates(spark, store, k)
      val first = live.collect().map(_.getString(0)).toSet
      assert(first.contains("hot"))
      assert(live.count() <= k)
      // at-least-once redelivery of batch 0: the shard rewrites
      // in place, and the verified counts stay the true ones
      EventStreams.landMgShard(b1.toDF("item"), 0L, "item", store, k)
      val verified = HeavyHitters.verifyHeavyHitters(
          (b1 ++ b2).toDF("item"), "item", live,
          minFraction = 0.25, k = k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(verified == Map("hot" -> 12L))
    } finally q.stop()
  }
}
