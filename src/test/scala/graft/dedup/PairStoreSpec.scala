package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[Dedup.PairStore]] — the standing near-dup pair store's
  * append == rebuild identity at every batch boundary, delta
  * disjointness, replay determinism, and the streaming maintenance
  * sink ([[graft.streaming.EventStreams.pairStoreMaintenanceSink]]).
  */
class PairStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docsDf: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def sigSet(df: DataFrame): Set[Seq[Long]] =
    df.collect().map(r =>
      (0 until r.length).map(i => r.getLong(i))).toSet

  test("append == rebuild at EVERY batch boundary: the folded store's " +
      "pairs and signatures equal the full rebuild over the docs " +
      "ingested so far — jaccards bit-identical") {
    graft.core.CacheScope.withScope {
      val d = docsDf
      var store = Dedup.emptyPairStore(spark, "doc_id")
      for (k <- 0 to 2) {
        val batch = d.where(col("doc_id") % 3 === k)
        store = Dedup.mergePairStore(store,
          Dedup.pairStoreDelta(store, batch, "doc_id", "text",
            n = 3, numHashes = 16, bands = 4, threshold = 0.8))
        val soFar = d.where(col("doc_id") % 3 <= k)
        val rebuilt = Dedup.minhashLshPairs(soFar, "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.8)
        assert(pairSet(store.pairs) === pairSet(rebuilt),
          s"pairs diverge after batch $k")
        assert(sigSet(store.signatures) ===
          sigSet(Dedup.minhashSignatures(soFar, "doc_id", "text",
            n = 3, numHashes = 16)),
          s"signatures diverge after batch $k")
      }
      assert(pairSet(store.pairs).nonEmpty)
    }
  }

  test("deltas are disjoint (a pair lands exactly once — in the " +
      "batch that completes it) and replay-deterministic") {
    graft.core.CacheScope.withScope {
      val d = docsDf
      val b0 = d.where(col("doc_id") % 3 === 0)
      val b1 = d.where(col("doc_id") % 3 === 1)
      val empty = Dedup.emptyPairStore(spark, "doc_id")
      val d0 = Dedup.pairStoreDelta(empty, b0, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      val s0 = Dedup.mergePairStore(empty, d0)
      val d1 = Dedup.pairStoreDelta(s0, b1, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      val p0 = pairSet(d0.pairs)
      val p1 = pairSet(d1.pairs)
      assert(p0.intersect(p1).isEmpty, "a pair landed twice")
      // replay: the same (prior, batch) re-derives the identical
      // shard — the OVERWRITE idempotency argument
      val d1again = Dedup.pairStoreDelta(s0, b1, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      assert(pairSet(d1again.pairs) === p1)
      assert(sigSet(d1again.signatures) === sigSet(d1.signatures))
    }
  }

  test("streaming maintenance sink: two micro-batches land shards " +
      "whose union equals the full rebuild; re-landing a batch " +
      "OVERWRITES its shard (no double counting)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    graft.core.CacheScope.withScope {
      val store = java.nio.file.Files
        .createTempDirectory("graft_pair_store").toString + "/ps"
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.EventStreams.pairStoreMaintenanceSink(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", store,
        java.nio.file.Files.createTempDirectory("graft_pair_ckpt")
          .toString,
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      // 40 short docs with planted near-dups across the two batches
      val mk = (i: Long) => (i, (0 to 8).map(j =>
        s"w${(i / 4 * 3 + j) % 9}").mkString(" "))
      val b1 = (1L to 20L).map(mk)
      val b2 = (21L to 40L).map(mk)
      try {
        in.addData(b1: _*); q.processAllAvailable()
        in.addData(b2: _*); q.processAllAvailable()
        val live = pairSet(graft.streaming.EventStreams
          .livePairStore(spark, store))
        val want = pairSet(Dedup.minhashLshPairs(
          (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.8))
        assert(live === want)
        assert(live.nonEmpty)
        // at-least-once redelivery of batch 0: OVERWRITE keeps the
        // store identical
        graft.streaming.EventStreams.landPairStoreShard(
          b1.toDF("doc_id", "text"), 0L, "doc_id", "text", store,
          n = 3, numHashes = 16, bands = 4, threshold = 0.8)
        assert(pairSet(graft.streaming.EventStreams
          .livePairStore(spark, store)) === want)
      } finally q.stop()
    }
  }

  test("q366 reads the rebuild's numbers from the store: the " +
      "store-fed audit row equals q280's") {
    graft.core.CacheScope.withScope {
      val a = graft.registry.DedupRegistry
        .pairStoreAuditQ(spark, sfDir).collect()(0)
      val b = graft.registry.DedupRegistry
        .dedupCaptureRecaptureQ(spark, sfDir).collect()(0)
      assert(a === b)
    }
  }
}
