package graft.streaming

import graft.SparkSpec
import graft.text.TfIdf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.bm25IndexMaintenanceSink]] — the lexical index's
  * incremental maintenance leg: per-batch shards, OVERWRITE replay,
  * search equality against the from-scratch build, compaction.
  */
class Bm25IndexSinkSpec extends SparkSpec {

  private def searchRows(out: DataFrame) =
    out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet

  test("per-batch index shards merge to the from-scratch build: " +
      "search over the store equals bm25Search over the union; " +
      "replay of a batch OVERWRITES its shard; compaction preserves " +
      "the index") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm25_store").toString + "/idx"
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.bm25IndexMaintenanceSink(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", store,
      java.nio.file.Files.createTempDirectory("graft_bm25_ckpt")
        .toString)
    val b1 = Seq((1L, "alpha beta gamma alpha"), (2L, "beta beta"),
      (3L, "gamma delta epsilon"))
    val b2 = Seq((4L, "alpha delta"), (5L, ""), // empty doc: len 0 row
      (6L, "epsilon epsilon alpha beta"))
    val queries = Seq((100L, "alpha beta"), (200L, "delta epsilon"))
      .toDF("qid", "qtext")
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def live = searchRows(TfIdf.bm25SearchOverIndex(
        EventStreams.liveBm25Index(spark, store), "doc_id",
        queries, "qid", "qtext", k = 4))
      val want = searchRows(TfIdf.bm25Search(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
        queries, "qid", "qtext", k = 4))
      val first = live
      assert(first === want)
      assert(first.nonEmpty)
      // at-least-once redelivery of batch 0: OVERWRITE, not append —
      // a double-append would double every df/tf/N and change scores
      EventStreams.landBm25IndexShard(
        b1.toDF("doc_id", "text"), 0L, "doc_id", "text", store)
      assert(live === first)
      // compaction to a new store is a pure re-tag: search-identical,
      // one shard dir
      val store2 = java.nio.file.Files
        .createTempDirectory("graft_bm25_store2").toString + "/idx"
      EventStreams.compactBm25Store(spark, store, store2)
      val compacted = searchRows(TfIdf.bm25SearchOverIndex(
        EventStreams.liveBm25Index(spark, store2), "doc_id",
        queries, "qid", "qtext", k = 4))
      assert(compacted === first)
      assert(new java.io.File(store2).listFiles
        .count(_.getName.startsWith("batch_id=")) == 1)
    } finally q.stop()
  }

  test("shard algebra equality holds under ANY sharding (batch-level " +
      "twin): 1, 2 and 5 shards all reconstruct bm25Search exactly, " +
      "maxDf pruning included") {
    import spark.implicits._
    val docsSeq = (1L to 40L).map(i =>
      (i, (1L to (i % 7 + 1)).map(j => s"w${(i * j) % 11}")
        .mkString(" ")))
    val docs = docsSeq.toDF("doc_id", "text")
    val queries = Seq((1L, "w1 w2 w3"), (2L, "w7 w10"))
      .toDF("qid", "qtext")
    val want = searchRows(TfIdf.bm25Search(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 5, maxDf = 12L))
    for (nShards <- Seq(1, 2, 5)) {
      val shards = (0 until nShards).map(s =>
          TfIdf.bm25IndexShard(
            docs.where(col("doc_id") % nShards === s),
            "doc_id", "text", lit(s.toLong)))
        .reduce(_ unionByName _)
      assert(searchRows(TfIdf.bm25SearchOverIndex(shards, "doc_id",
        queries, "qid", "qtext", k = 5, maxDf = 12L)) === want,
        s"$nShards shards")
    }
  }

  test("empty and whitespace-only documents contribute a len-0 doc " +
      "row and no postings — N and avgdl match the from-scratch path") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "),
      (4L, "alpha")).toDF("doc_id", "text")
    val shard = TfIdf.bm25IndexShard(docs, "doc_id", "text", lit(0L))
    val docRows = shard.where(col("token").isNull).collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(docRows === Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    assert(shard.where(col("token").isNotNull &&
      col("doc_id").isin(2L, 3L)).count() === 0)
    val queries = Seq((9L, "alpha")).toDF("qid", "qtext")
    assert(searchRows(TfIdf.bm25SearchOverIndex(shard, "doc_id",
      queries, "qid", "qtext", k = 10)) ===
      searchRows(TfIdf.bm25Search(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 10)))
  }
}
