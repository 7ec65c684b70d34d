package graft.streaming

import graft.SparkSpec
import graft.quality.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.cmsMaintenanceSink]] — standing frequency sketch. */
class CmsSinkSpec extends SparkSpec {

  test("per-batch CMS shards merge to the batch build; replay " +
      "OVERWRITES; estimates exact at wide width") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_cms_store").toString + "/cms"
    val in = MemoryStream[String]
    val q = EventStreams.cmsMaintenanceSink(
      in.toDF().toDF("item"), "item", store,
      java.nio.file.Files.createTempDirectory("graft_cms_ckpt")
        .toString)
    val b1 = Seq("alpha", "alpha", "beta")
    val b2 = Seq("alpha", "gamma", "gamma", "gamma")
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def est = CountMin.cmsEstimate(
          EventStreams.liveCms(spark, store),
          Seq("alpha", "beta", "gamma").toDF("item"), "item")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val first = est
      assert(first === Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 3L))
      // at-least-once redelivery of batch 0: shard rewrites, counts
      // do not double
      EventStreams.landCmsShard(b1.toDF("item"), 0L, "item", store,
        depth = 4, width = 512)
      assert(est === first)
    } finally q.stop()
  }
}
