package graft.streaming

import graft.SparkSpec
import graft.dedup.ConnectedComponents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.clusterMaintenanceSink]] — the cluster layer's
  * incremental maintenance: per-batch fold-in equals the batch
  * recompute over all arrived pairs, replays touch nothing, and only
  * changed buckets are rewritten.
  */
class ClusterSinkSpec extends SparkSpec {

  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def batchLabels(edges: Seq[(Long, Long)]) =
    asMap(ConnectedComponents.componentsAuto(
      edges.toDF("a", "b"), "a", "b")._1)

  test("the standing store equals a batch recompute after every " +
      "micro-batch, including cross-batch merges; replaying a folded " +
      "batch rewrites zero buckets") {
    implicit val sql = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_cc_store").toString + "/labels"
    val in = MemoryStream[(Long, Long)]
    val q = EventStreams.clusterMaintenanceSink(
      in.toDF().toDF("a", "b"), "a", "b", store,
      java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
        .toString, numBuckets = 8)
    val b1 = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val b2 = Seq((2L, 10L), (50L, 51L)) // merges {1,2}∪{10,11}, fresh
    val b3 = Seq((51L, 20L)) // merges the fresh pair into {20,21}
    try {
      in.addData(b1: _*); q.processAllAvailable()
      assert(asMap(EventStreams.liveClusters(spark, store)) ==
        batchLabels(b1))
      in.addData(b2: _*); q.processAllAvailable()
      assert(asMap(EventStreams.liveClusters(spark, store)) ==
        batchLabels(b1 ++ b2))
      in.addData(b3: _*); q.processAllAvailable()
      val want = batchLabels(b1 ++ b2 ++ b3)
      assert(asMap(EventStreams.liveClusters(spark, store)) == want)
      // the cross-batch merges really happened: {1,2}∪{10,11} → 1,
      // {50,51}∪{20,21} → 20
      assert(want(11L) == 1L && want(51L) == 20L)
      // at-least-once redelivery: an already-folded batch contracts
      // to self-loops → no bucket files change
      def mtimes = new java.io.File(store).listFiles
        .filter(_.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles.map(_.lastModified).sorted.toSeq).toMap
      val before = mtimes
      EventStreams.landClusterBatch(
        b2.toDF("a", "b"), "a", "b", store, numBuckets = 8)
      assert(mtimes == before)
      assert(asMap(EventStreams.liveClusters(spark, store)) == want)
    } finally q.stop()
  }

  test("a merge batch rewrites ONLY the buckets holding changed " +
      "labels — untouched buckets' files stay byte-identical") {
    // ids chosen so the two standing components land in different
    // buckets than the untouched third
    val store = java.nio.file.Files
      .createTempDirectory("graft_cc_store2").toString + "/labels"
    val b1 = Seq((1L, 2L), (3L, 4L), (5L, 6L))
    EventStreams.landClusterBatch(
      b1.toDF("a", "b"), "a", "b", store, numBuckets = 16)
    val files = new java.io.File(store).listFiles
      .filter(_.getName.startsWith("bucket="))
      .map(d => d.getName ->
        d.listFiles.map(f => (f.getName, f.lastModified)).sorted.toSeq)
      .toMap
    EventStreams.landClusterBatch(
      Seq((2L, 3L)).toDF("a", "b"), "a", "b", store, numBuckets = 16)
    val after = new java.io.File(store).listFiles
      .filter(_.getName.startsWith("bucket="))
      .map(d => d.getName ->
        d.listFiles.map(f => (f.getName, f.lastModified)).sorted.toSeq)
      .toMap
    // labels 3 and 4 move to component 1; ids 1/2 keep theirs, 5/6
    // untouched. Buckets of {3,4} must change; buckets holding ONLY
    // {1,2,5,6} must not.
    val changedIds = Seq(3L, 4L)
    val touchedBuckets = Seq((1L, 2L), (3L, 4L), (5L, 6L))
      .flatMap { case (a, b) => Seq(a, b) }
      .filter(changedIds.contains)
      .map(id => s"bucket=${math.floorMod(
        org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashLong(id, 42), 16)}").toSet
    after.foreach { case (bucket, fs) =>
      if (!touchedBuckets.contains(bucket))
        assert(files.get(bucket).contains(fs),
          s"$bucket rewritten without a changed label")
    }
    assert(asMap(EventStreams.liveClusters(spark, store)) ==
      batchLabels(b1 ++ Seq((2L, 3L))))
  }
}
