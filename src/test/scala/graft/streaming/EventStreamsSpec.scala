package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class TestEvent(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class EventStreamsSpec extends SparkSpec {

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, time: String, user: Long, typ: String,
      value: Double = 1.0): TestEvent =
    TestEvent(id, t(time), user, typ, value, s"""{"k":$id}""")

  private def runQuery[T](
      stream: MemoryStream[T], out: org.apache.spark.sql.DataFrame,
      mode: String, name: String): org.apache.spark.sql.DataFrame = {
    val q = out.writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("hourlyCounts aggregates tumbling windows per event type") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TestEvent]
    in.addData(
      ev(1, "10:05", 1, "click"), ev(2, "10:20", 2, "click"),
      ev(3, "10:40", 1, "purchase", 9.5), ev(4, "11:10", 3, "click"))
    val res = runQuery(in, EventStreams.hourlyCounts(in.toDF()),
      "complete", "hourly")
    val clicks10 = res.where(col("event_type") === "click" &&
      hour(col("window.start")) === 10).head()
    assert(clicks10.getAs[Long]("n_events") == 2L)
    assert(res.where(col("event_type") === "purchase").head()
      .getAs[Double]("sum_value") == 9.5)
  }

  test("hourlyCounts streaming result matches the batch twin") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      ev(1, "10:05", 1, "click"), ev(2, "10:20", 2, "click"),
      ev(3, "10:40", 1, "purchase", 9.5), ev(4, "11:10", 3, "click"))
    val in = MemoryStream[TestEvent]
    in.addData(events: _*)
    val streamed = runQuery(in, EventStreams.hourlyCounts(in.toDF()),
      "complete", "twin_stream")
      .select(col("window.start").as("w"), col("event_type"),
        col("n_events"), col("sum_value"))
    // identical transform applied to a batch frame
    val batch = EventStreams.hourlyCounts(events.toDF())
      .select(col("window.start").as("w"), col("event_type"),
        col("n_events"), col("sum_value"))
    assert(streamed.orderBy("w", "event_type").collect().toSeq ==
      batch.orderBy("w", "event_type").collect().toSeq)
  }

  test("sessionize merges events within the gap, splits beyond it") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TestEvent]
    in.addData(
      ev(1, "10:00", 1, "click"), ev(2, "10:10", 1, "click"), // session 1
      ev(3, "11:30", 1, "click"), // > 30 min gap → session 2
      ev(4, "10:05", 2, "click")) // other user
    val res = runQuery(in,
      EventStreams.sessionize(in.toDF(), gap = "30 minutes"),
      "complete", "sessions")
    assert(res.where(col("user_id") === 1).count() == 2)
    assert(res.where(col("user_id") === 2).count() == 1)
    val s1 = res.where(col("user_id") === 1 &&
      hour(col("session_window.start")) === 10).head()
    assert(s1.getAs[Long]("n_events") == 2L)
  }

  test("dedupEvents drops duplicate event_ids within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TestEvent]
    in.addData(
      ev(1, "10:00", 1, "click"), ev(1, "10:01", 1, "click"), // dup id
      ev(2, "10:02", 2, "click"))
    val res = runQuery(in, EventStreams.dedupEvents(in.toDF()),
      "append", "deduped")
    assert(res.count() == 2)
    assert(res.select("event_id").distinct().count() == 2)
  }

  test("propsRollup extracts JSON k per window and type") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TestEvent]
    in.addData(ev(10, "10:00", 1, "click"), ev(20, "10:30", 2, "click"))
    val res = runQuery(in, EventStreams.propsRollup(in.toDF()),
      "complete", "props")
    val row = res.head()
    assert(row.getAs[Double]("avg_k") == 15.0)
    assert(row.getAs[Long]("n_with_k") == 2L)
  }

  test("enrichWithDimension joins a stream against a static dim, " +
      "unmatched keys keep null attributes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val in = MemoryStream[TestEvent]
    in.addData(
      ev(1, "10:00", 1, "click"), ev(2, "10:01", 2, "click"),
      ev(3, "10:02", 9, "click")) // no dim row
    val out = EventStreams.enrichWithDimension(
      in.toDF(), dim, "user_id", "cust_id", Seq("tier"))
    val q = out.writeStream.format("memory")
      .queryName("enriched").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("enriched")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("dedupByFingerprint drops re-arrivals of the same normalized " +
      "content within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val in = MemoryStream[(Long, Timestamp, String)]
    val stream = in.toDF().toDF("doc_id", "ts", "text")
    val out = EventStreams.dedupByFingerprint(stream, "text", "ts")
    val q = out.writeStream.format("memory")
      .queryName("fp_dedup").outputMode("append").start()
    try {
      in.addData(
        (1L, t("10:00"), "Hello World"),
        (2L, t("10:01"), "hello   world"), // same normalized content
        (3L, t("10:02"), "different"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("fp_dedup")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
  }

  test("intervalJoin attributes right events to left events within the " +
      "horizon, per user, and matches its batch twin") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val views = Seq(
      ev(1, "10:00", 1, "view"), ev(2, "10:00", 2, "view"),
      ev(3, "12:00", 1, "view"))
    val clicks = Seq(
      ev(101, "10:10", 1, "click"), // within 30m of view 1
      ev(102, "10:50", 1, "click"), // beyond horizon of view 1
      ev(103, "10:10", 3, "click"), // no matching user
      ev(104, "12:20", 1, "click")) // within 30m of view 3
    val inV = MemoryStream[TestEvent]
    val inC = MemoryStream[TestEvent]
    inV.addData(views: _*)
    inC.addData(clicks: _*)
    val joined = EventStreams.intervalJoin(
      inV.toDF(), inC.toDF(), horizon = "30 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("attributed").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attributed")
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (3L, 104L)))
    // identical transform on batch frames
    val batch = EventStreams.intervalJoin(
      views.toDF(), clicks.toDF(), horizon = "30 minutes")
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == got)
  }

  test("watermark drops events later than the horizon once it advances " +
      "(bounded state, documented late-data policy)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TestEvent]
    val agg = EventStreams.hourlyCounts(in.toDF(), watermark = "1 hour")
    val q = agg.writeStream.format("memory")
      .queryName("late_data").outputMode("append").start()
    try {
      // batch 1: events at 10:xx, then an event at 13:00 pushes the
      // watermark to 12:00 and lets the 10:00 window emit
      in.addData(ev(1, "10:05", 1, "click"), ev(2, "10:20", 2, "click"))
      q.processAllAvailable()
      in.addData(ev(3, "13:00", 3, "click"))
      q.processAllAvailable()
      // batch 3: a late 10:40 event — behind the 12:00 watermark, must
      // NOT reopen the already-emitted 10:00 window
      in.addData(ev(4, "10:40", 1, "click"))
      q.processAllAvailable()
      in.addData(ev(5, "15:00", 4, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val w10 = spark.table("late_data")
      .where(hour(col("window.start")) === 10)
    assert(w10.count() == 1)
    assert(w10.head().getAs[Long]("n_events") == 2L) // late row excluded
  }

  test("dedupByFingerprint soak: 5 micro-batches with late data — late " +
      "rows dropped, state rows bounded by the watermark (evictions " +
      "observed via stateOperators), horizon re-emission documented") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, String)]
    val stream = in.toDF().toDF("doc_id", "ts", "text")
    val out = EventStreams.dedupByFingerprint(
      stream, "text", "ts", watermark = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("fp_soak").outputMode("append").start()
    try {
      // batch 1: two distinct docs + an in-batch normalized dup
      in.addData(
        (1L, t("10:00"), "alpha doc"),
        (2L, t("10:05"), "beta doc"),
        (3L, t("10:05"), "ALPHA   doc")) // dup of 1 → dropped
      q.processAllAvailable()
      // batch 2: 13:00 advances the watermark to 12:00
      in.addData((4L, t("13:00"), "gamma doc"))
      q.processAllAvailable()
      // batch 3: a LATE new doc (behind the 12:00 watermark → dropped),
      // a dup within the horizon (dropped), and a re-arrival of "beta"
      // whose state entry expired (10:05 + 1h < 12:00) → re-emitted:
      // the documented bounded-state trade — dedup is exact only
      // within the watermark horizon
      in.addData(
        (5L, t("10:30"), "delta doc"), // late → dropped
        (6L, t("13:05"), "beta doc"), // horizon re-emission
        (7L, t("13:06"), "gamma doc")) // dup within horizon → dropped
      q.processAllAvailable()
      // batches 4+5: advance the watermark twice more so the 13:xx
      // entries expire — state must shrink, not accumulate the corpus
      in.addData((8L, t("16:00"), "omega doc"))
      q.processAllAvailable()
      in.addData((9L, t("16:30"), "sigma doc"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("fp_soak")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L, 6L, 8L, 9L))
    val stateProgress = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
    // evictions actually happened (watermark-bounded state, not
    // grow-forever), and the final state holds only the entries still
    // inside the horizon — NOT one row per distinct document ever seen
    assert(stateProgress.map(_.numRowsRemoved).sum > 0,
      "expected watermark evictions from the dedup state store")
    val finalRows = stateProgress.last.numRowsTotal
    assert(finalRows <= 2,
      s"state should hold only in-horizon fingerprints, got $finalRows")
  }

  test("foreachBatchSink lands micro-batches into a parquet fact table") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[TestEvent]
    val counts = EventStreams.hourlyCounts(in.toDF())
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"))
    val q = EventStreams.foreachBatchSink(counts, ckpt) { (batch, id) =>
      if (!batch.isEmpty)
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(s"$out/fact_hourly")
    }
    try {
      in.addData(ev(1, "10:05", 1, "click"), ev(2, "10:20", 2, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$out/fact_hourly")
    assert(landed.count() >= 1)
    assert(landed.where(col("event_type") === "click").head()
      .getAs[Long]("n_events") == 2L)
  }

  test("userRunningTotals accumulates state across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[EventStreams.UserEvent]
    val out = EventStreams.userRunningTotals(in.toDS())
    val q = out.writeStream.format("memory")
      .queryName("totals").outputMode("update").start()
    try {
      in.addData(
        EventStreams.UserEvent(1, "click", 1.0),
        EventStreams.UserEvent(1, "purchase", 20.0))
      q.processAllAvailable()
      in.addData(EventStreams.UserEvent(1, "click", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    // last update row for user 1 carries the accumulated totals
    val last = spark.table("totals").where(col("n_events") === 3)
    assert(last.count() == 1)
    val row = last.head()
    assert(row.getAs[Double]("sum_value") == 23.0)
    assert(row.getAs[Long]("n_purchases") == 1L)
  }

  test("incrementalChunkDedupSink: a re-sent document with a mid-doc " +
      "edit re-ships ONLY the chunks touching the edit; exact resends " +
      "ship nothing; the store carries clean chunk rows") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_chunk_store").toString + "/chunks"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_chunk_ckpt").toString
    def toks(seed: Int, n: Int) = {
      val rng = new scala.util.Random(seed)
      (1 to n).map(_ => s"w${rng.nextInt(80)}")
    }
    val t1 = toks(1, 400)
    val t2 = toks(2, 300)
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalChunkDedupSink(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", store, ckpt,
      expectedChunks = 10000, k = 3, targetTokens = 16)
    try {
      in.addData((1L, t1.mkString(" ")), (2L, t2.mkString(" ")))
      q.processAllAvailable()
      val after1 = spark.read.parquet(store)
      assert(after1.columns.toSet ==
        Set("doc_id", "chunk_idx", "n_tokens", "chunk_text"),
        s"store schema: ${after1.columns.toSeq}")
      val n1 = after1.count()
      assert(n1 > 10, s"expected many ~16-token chunks, got $n1")
      // batch 2: doc 1 re-sent with a mid-doc insertion (as id 10),
      // doc 2 re-sent verbatim (as id 12), one genuinely new doc
      val t1edited = t1.take(200) ++
        Seq("inserted", "sentence", "goes", "here") ++ t1.drop(200)
      val t3 = toks(3, 150)
      in.addData((10L, t1edited.mkString(" ")),
        (12L, t2.mkString(" ")), (11L, t3.mkString(" ")))
      q.processAllAvailable()
      val after2 = spark.read.parquet(store)
      // verbatim resend ships nothing
      assert(after2.where(col("doc_id") === 12L).count() == 0)
      // the new doc ships all its chunks
      val doc11 = graft.text.TextAnalysis.chunkByContent(
        Seq((11L, t3.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", 3, 16).count()
      assert(after2.where(col("doc_id") === 11L).count() == doc11)
      // the edited doc ships ONLY the edit-local chunks
      val doc10Total = graft.text.TextAnalysis.chunkByContent(
        Seq((10L, t1edited.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", 3, 16).count()
      val doc10Landed = after2.where(col("doc_id") === 10L).count()
      assert(doc10Landed > 0)
      assert(doc10Landed * 2 < doc10Total,
        s"$doc10Landed of $doc10Total chunks re-shipped — boundaries " +
          "shifted past the edit")
    } finally q.stop()
  }

  test("incrementalDedupSink: cross-batch first-writer-wins corpus, " +
      "in-batch collapse, Bloom state carried between batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_inc_corpus").toString + "/docs"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_inc_ckpt").toString
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = EventStreams.incrementalDedupSink(
      docs, "text", "doc_id", corpus, ckpt, expectedItems = 1000)
    try {
      // batch 1: duplicate inside the batch collapses to lowest id
      in.addData((5L, "alpha"), (2L, "alpha"), (3L, "beta"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus)
      assert(after1.count() == 2)
      assert(after1.where(col("text") === "alpha")
        .head().getAs[Long]("doc_id") == 2L)
      // batch 2: re-arrival of both texts dropped, one new survives
      in.addData((1L, "alpha"), (9L, "beta"), (7L, "gamma"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.count() == 3)
      // first writer won: alpha stays at id 2 even though 1 < 2
      // arrived later
      assert(after2.where(col("text") === "alpha")
        .head().getAs[Long]("doc_id") == 2L)
      // batch 3: everything already seen → nothing lands
      in.addData((11L, "alpha"), (12L, "gamma"), (13L, "beta"))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 3)
    } finally q.stop()
    // a NEW sink over the same corpus rebuilds the filter from disk:
    // replays of seen texts still dedup (restart idempotency)
    val in2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalDedupSink(
      in2.toDF().toDF("doc_id", "text"), "text", "doc_id", corpus,
      java.nio.file.Files.createTempDirectory("graft_inc_ckpt2")
        .toString,
      expectedItems = 1000)
    try {
      in2.addData((20L, "alpha"), (21L, "delta"))
      q2.processAllAvailable()
      val finalCorpus = spark.read.parquet(corpus)
      assert(finalCorpus.count() == 4)
      assert(finalCorpus.where(col("text") === "alpha").count() == 1)
    } finally q2.stop()
  }

  test("incrementalDedupSink sharded: a shard-byte ceiling forces the " +
      "filter into >=2 shards; dedup, shard merging between batches, " +
      "and restart replay stay exact") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.expressions.BloomOps
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_shard_corpus").toString + "/docs"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_shard_ckpt").toString
    // 5000 expected items at 1% fpp ≈ 6 KB of bits; 1 KiB ceiling → ≥5
    // independent shards — the same split the real 2 GiB ceiling makes
    val (k, _, _) = BloomOps.shardedSizing(5000, 0.01, maxShardBytes = 1024)
    assert(k >= 2, s"test setup must force multiple shards, got $k")
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalDedupSink(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id", corpus, ckpt,
      expectedItems = 5000, maxShardBytes = 1024)
    try {
      // batch 1: 120 docs spread across every shard (md5 routing)
      in.addData((0 until 120).map(i => (i.toLong, s"document $i")): _*)
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 120)
      // batch 2: 120 replays (must all dedup against shard state
      // carried between batches) + 30 new
      in.addData(((0 until 120).map(i => (1000L + i, s"document $i")) ++
        (0 until 30).map(i => (2000L + i, s"fresh $i"))): _*)
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.count() == 150)
      // first writer won for every replayed text
      assert(after2.where(col("doc_id") >= 1000L && col("doc_id") < 2000L)
        .count() == 0)
    } finally q.stop()
    // restart: a NEW sink rebuilds all shards from the corpus — exact
    // replay of seen texts still dedups, new texts still land
    val in2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalDedupSink(
      in2.toDF().toDF("doc_id", "text"), "text", "doc_id", corpus,
      java.nio.file.Files.createTempDirectory("graft_shard_ckpt2")
        .toString,
      expectedItems = 5000, maxShardBytes = 1024)
    try {
      in2.addData(((0 until 120).map(i => (3000L + i, s"document $i")) ++
        (0 until 30).map(i => (4000L + i, s"fresh $i")) :+
        (5000L, "post-restart newcomer")): _*)
      q2.processAllAvailable()
      val fin = spark.read.parquet(corpus)
      assert(fin.count() == 151)
      assert(fin.where(col("doc_id") >= 3000L && col("doc_id") < 5000L)
        .count() == 0)
      assert(fin.where(col("text") === "post-restart newcomer")
        .count() == 1)
    } finally q2.stop()
  }

  test("incrementalNearDupSink: near-duplicates of landed docs drop " +
      "across batches and restarts; the corpus is extended, not " +
      "re-banded") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_ndup_corpus").toString + "/docs"
    val index = java.nio.file.Files
      .createTempDirectory("graft_ndup_index").toString + "/bands"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ndup_ckpt").toString
    val baseA = "the quick brown fox jumps over the lazy dog while " +
      "the patient cat watches from the warm window sill nearby " +
      "and the evening light settles across the quiet garden path"
    val baseB = "completely different content about distributed " +
      "query engines shuffling partitions across executors while " +
      "the optimizer prunes columns and pushes filters into scans"
    def mut(b: String, i: Int) = b + s" trailing marker token$i"
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalNearDupSink(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", "doc_id",
      corpus, index, ckpt, n = 3, numHashes = 16, bands = 4)
    try {
      in.addData((1L, mut(baseA, 1)), (2L, mut(baseB, 2)))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 2)
      // batch 2: near-dup variants of BOTH landed docs drop; a fresh
      // doc and an exact in-batch dup pair land once
      in.addData((10L, mut(baseA, 10)), (11L, mut(baseB, 11)),
        (12L, "a wholly new document with fresh unseen vocabulary"),
        (13L, "a wholly new document with fresh unseen vocabulary"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.count() == 3)
      assert(after2.where(col("doc_id").isin(10L, 11L, 13L)).count() == 0)
    } finally q.stop()
    // restart: index is on disk; near-dup replays still drop
    val in2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalNearDupSink(
      in2.toDF().toDF("doc_id", "text"), "doc_id", "text", "doc_id",
      corpus, index,
      java.nio.file.Files.createTempDirectory("graft_ndup_ckpt2")
        .toString,
      n = 3, numHashes = 16, bands = 4)
    try {
      in2.addData((20L, mut(baseA, 20)),
        (21L, "post restart genuinely novel words entirely"))
      q2.processAllAvailable()
      val fin = spark.read.parquet(corpus)
      assert(fin.count() == 4)
      assert(fin.where(col("doc_id") === 20L).count() == 0)
      assert(fin.where(col("doc_id") === 21L).count() == 1)
      // the index holds bands ONLY for landed docs (4 docs × 4 bands)
      assert(spark.read.parquet(index).count() == 16)
    } finally q2.stop()
  }

  test("incrementalNearDupSink: restart with corpus present but index " +
      "deleted rebuilds AND persists the full corpus index — near-dups " +
      "of pre-existing docs keep dropping in later batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_ndup_lost_corpus").toString + "/docs"
    val index = java.nio.file.Files
      .createTempDirectory("graft_ndup_lost_index").toString + "/bands"
    val baseA = "the quick brown fox jumps over the lazy dog while " +
      "the patient cat watches from the warm window sill nearby " +
      "and the evening light settles across the quiet garden path"
    val baseB = "completely different content about distributed " +
      "query engines shuffling partitions across executors while " +
      "the optimizer prunes columns and pushes filters into scans"
    def mut(b: String, i: Int) = b + s" trailing marker token$i"
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalNearDupSink(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", "doc_id",
      corpus, index,
      java.nio.file.Files.createTempDirectory("graft_ndup_lost_ckpt1")
        .toString,
      n = 3, numHashes = 16, bands = 4)
    try {
      in.addData((1L, mut(baseA, 1)), (2L, mut(baseB, 2)))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 2)
    } finally q.stop()
    // simulate index loss: corpus survives, bands are gone
    val fs = new org.apache.hadoop.fs.Path(index)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(index), true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(index)))
    val in2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalNearDupSink(
      in2.toDF().toDF("doc_id", "text"), "doc_id", "text", "doc_id",
      corpus, index,
      java.nio.file.Files.createTempDirectory("graft_ndup_lost_ckpt2")
        .toString,
      n = 3, numHashes = 16, bands = 4)
    try {
      // batch right after the restart: a near-dup of a corpus doc
      // must drop (the rebuilt index covers the corpus) and a fresh
      // doc lands
      in2.addData((10L, mut(baseA, 10)),
        (11L, "novel vocabulary forming an entirely separate text"))
      q2.processAllAvailable()
      val after1 = spark.read.parquet(corpus)
      assert(after1.count() == 3)
      assert(after1.where(col("doc_id") === 10L).count() == 0)
      // the persisted index covers EVERY corpus doc (3 docs × 4
      // bands), not just this batch's survivors — the silent-loss
      // shape this spec pins down
      assert(spark.read.parquet(index).count() == 12)
      // a LATER batch still sees pre-existing docs through the index
      in2.addData((20L, mut(baseB, 20)))
      q2.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.count() == 3)
      assert(after2.where(col("doc_id") === 20L).count() == 0)
    } finally q2.stop()
  }

  test("scd2DimensionSink: out-of-order micro-batches converge to the " +
      "batch scd2Versions derivation over the union of observations") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.transform.StarSchemaBuilder
    val path = java.nio.file.Files
      .createTempDirectory("graft_scd2_stream").toString + "/dim"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_scd2_stream_ckpt").toString
    val in = MemoryStream[(Int, String, Int)]
    val updates = in.toDF().toDF("k", "attr", "seq")
    val q = EventStreams.scd2DimensionSink(
      updates, path, ckpt, Seq("k"), Seq("attr"), "seq")
    try {
      // batch 1: LATER observations arrive first
      in.addData((1, "B", 5), (1, "C", 9), (2, "X", 3))
      q.processAllAvailable()
      // batch 2: late arrivals — before history (A@1, Y@1) and inside
      // B's eventual run (B@7, same attrs → endpoint, no-op change)
      in.addData((1, "A", 1), (1, "B", 7), (2, "Y", 1))
      q.processAllAvailable()
      // batch 3: new current version + exact replays (idempotency)
      in.addData((1, "D", 12), (1, "B", 5), (2, "X", 3))
      q.processAllAvailable()
    } finally q.stop()
    val cols = Seq("k", "attr", "valid_from", "valid_to", "last_seen",
      "version_n", "is_current")
    val got = spark.read.parquet(path)
      .orderBy("k", "version_n").select(cols.map(col): _*)
      .collect().map(_.toSeq).toSeq
    // the batch derivation over ALL observations at once
    val all = Seq((1, "B", 5), (1, "C", 9), (2, "X", 3), (1, "A", 1),
      (1, "B", 7), (2, "Y", 1), (1, "D", 12))
      .toDF("k", "attr", "seq")
    val want = StarSchemaBuilder
      .scd2Versions(all.distinct(), Seq("k"), Seq("attr"), "seq")
      .orderBy("k", "version_n").select(cols.map(col): _*)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"\ngot  = $got\nwant = $want")
    // sanity on the converged shape: k=1 → A,B,C,D; k=2 → Y,X
    assert(got.map(r => (r.head, r(1))) == Seq(
      (1, "A"), (1, "B"), (1, "C"), (1, "D"), (2, "Y"), (2, "X")))
  }

  test("incrementalImageDedupSink: perceptual re-uploads drop across " +
      "batches and a sketch-store-loss restart; in-batch identical " +
      "sketches collapse; undecodable payloads always land") {
    import graft.multimodal.Multimodal
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_img_corpus").toString + "/imgs"
    val sketches = java.nio.file.Files
      .createTempDirectory("graft_img_sk").toString + "/sk"
    def png(seed: Int) = Multimodal.syntheticTexturedPng(24, 16, seed)
    def edited(seed: Int): Array[Byte] = {
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png(seed)))
      im.setRGB(2, 3, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val in = MemoryStream[(Long, Array[Byte])]
    val q = EventStreams.incrementalImageDedupSink(
      in.toDF().toDF("img_id", "png"), "img_id", "png", "img_id",
      corpus, sketches,
      java.nio.file.Files.createTempDirectory("graft_img_ckpt")
        .toString)
    try {
      in.addData((1L, png(1)), (2L, png(2)),
        (3L, "not an image".getBytes))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 3)
      // exact re-upload, near-dup (1-px edit), novel + its in-batch
      // twin, another undecodable
      in.addData((10L, png(1)), (11L, edited(2)), (12L, png(40)),
        (13L, png(40)), (14L, "junk too".getBytes))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.count() == 5)
      assert(after2.select("img_id").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L, 12L, 14L))
    } finally q.stop()
    // restart with the sketch store DELETED: it rebuilds by
    // re-decoding the corpus, and near-dups of pre-existing images
    // keep dropping
    def rmr(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles.foreach(c => rmr(c.getPath))
      f.delete()
    }
    rmr(sketches)
    val in2 = MemoryStream[(Long, Array[Byte])]
    val q2 = EventStreams.incrementalImageDedupSink(
      in2.toDF().toDF("img_id", "png"), "img_id", "png", "img_id",
      corpus, sketches,
      java.nio.file.Files.createTempDirectory("graft_img_ckpt2")
        .toString)
    try {
      in2.addData((20L, edited(1)), (21L, png(77)))
      q2.processAllAvailable()
      val fin = spark.read.parquet(corpus)
      assert(fin.count() == 6)
      assert(fin.where(col("img_id") === 20L).count() == 0)
      assert(fin.where(col("img_id") === 21L).count() == 1)
      // rebuilt store covers the decodable corpus + the new landing
      assert(spark.read.parquet(sketches)
        .where(col("dhash_hi").isNotNull).count() == 4)
    } finally q2.stop()
  }

  test("incrementalAudioDedupSink: gain-rescaled re-uploads drop " +
      "across batches and a sketch-store-loss restart; in-batch " +
      "identical sketches collapse; undecodable payloads land") {
    import graft.multimodal.Multimodal
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_aud_corpus").toString + "/wavs"
    val sketches = java.nio.file.Files
      .createTempDirectory("graft_aud_sk").toString + "/sk"
    def wav(seed: Long, amp: Int = 300) =
      Multimodal.envelopeWav(8000, 450, amp, seed)
    val in = MemoryStream[(Long, Array[Byte])]
    val q = EventStreams.incrementalAudioDedupSink(
      in.toDF().toDF("aud_id", "wav"), "aud_id", "wav", "aud_id",
      corpus, sketches,
      java.nio.file.Files.createTempDirectory("graft_aud_ckpt")
        .toString)
    try {
      in.addData((1L, wav(1)), (2L, wav(2)),
        (3L, "not audio".getBytes))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 3)
      // gain-doubled re-upload of 1, novel + its in-batch twin
      in.addData((10L, wav(1, amp = 600)), (11L, wav(40)),
        (12L, wav(40)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.select("aud_id").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L, 11L))
    } finally q.stop()
    def rmr(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles.foreach(c => rmr(c.getPath))
      f.delete()
    }
    rmr(sketches)
    val in2 = MemoryStream[(Long, Array[Byte])]
    val q2 = EventStreams.incrementalAudioDedupSink(
      in2.toDF().toDF("aud_id", "wav"), "aud_id", "wav", "aud_id",
      corpus, sketches,
      java.nio.file.Files.createTempDirectory("graft_aud_ckpt2")
        .toString)
    try {
      in2.addData((20L, wav(2, amp = 900)), (21L, wav(55)))
      q2.processAllAvailable()
      val fin = spark.read.parquet(corpus)
      assert(fin.where(col("aud_id") === 20L).count() == 0,
        "rebuilt sketch store must keep dropping gain-scaled dups")
      assert(fin.where(col("aud_id") === 21L).count() == 1)
      assert(spark.read.parquet(sketches)
        .where(col("ahash_hi").isNotNull).count() == 4)
    } finally q2.stop()
  }

  test("incrementalEmbeddingDedupSink: re-encoded vectors drop across " +
      "batches and an index-loss restart; in-batch identical vectors " +
      "collapse; exact replicas of landed rows re-dedup idempotently; " +
      "null vectors always land") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dim = 8
    def unit(axis: Int): Seq[Float] =
      (0 until dim).map(d => if (d == axis) 1.0f else 0.0f)
    // tiny off-axis perturbation: cosine vs unit(axis) ≈ 0.99995,
    // SRP sketch unchanged (no hyperplane dot sits within 0.01 of 0)
    def nearly(axis: Int): Seq[Float] =
      (0 until dim).map(d =>
        if (d == axis) 1.0f else if (d == (axis + 1) % dim) 0.01f
        else 0.0f)
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_emb_corpus").toString + "/vecs"
    val index = java.nio.file.Files
      .createTempDirectory("graft_emb_idx").toString + "/idx"
    val in = MemoryStream[(Long, Option[Seq[Float]])]
    val q = EventStreams.incrementalEmbeddingDedupSink(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      "vec_id", corpus, index,
      java.nio.file.Files.createTempDirectory("graft_emb_ckpt")
        .toString, dim)
    try {
      in.addData((1L, Some(unit(0))), (2L, Some(unit(1))), (3L, None))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() == 3)
      // exact re-upload, near-dup (perturbed), novel + its in-batch
      // identical twin, another null
      in.addData((10L, Some(unit(0))), (11L, Some(nearly(1))),
        (12L, Some(unit(2))), (13L, Some(unit(2))), (14L, None))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus)
      assert(after2.count() == 5)
      assert(after2.select("vec_id").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L, 12L, 14L))
    } finally q.stop()
    // restart with the SRP index DELETED: it rebuilds from the corpus
    // (non-null vectors only) and near-dups of pre-existing vectors
    // keep dropping
    def rmr(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles.foreach(c => rmr(c.getPath))
      f.delete()
    }
    rmr(index)
    val in2 = MemoryStream[(Long, Option[Seq[Float]])]
    val q2 = EventStreams.incrementalEmbeddingDedupSink(
      in2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      "vec_id", corpus, index,
      java.nio.file.Files.createTempDirectory("graft_emb_ckpt2")
        .toString, dim)
    try {
      in2.addData((20L, Some(nearly(0))), (21L, Some(unit(3))))
      q2.processAllAvailable()
      val fin = spark.read.parquet(corpus)
      assert(fin.count() == 6)
      assert(fin.where(col("vec_id") === 20L).count() == 0)
      assert(fin.where(col("vec_id") === 21L).count() == 1)
      // rebuilt index covers the non-null corpus + the new landing
      assert(spark.read.parquet(index).count() == 4)
      // at-least-once replay: an exact replica of a landed row probes
      // at Hamming 0, verifies at cosine 1.0, and drops; a replayed
      // NULL row has no sketch — it drops by id against the corpus —
      // while a genuinely new null row still lands
      in2.addData((30L, Some(unit(3))), (3L, None), (31L, None))
      q2.processAllAvailable()
      val fin2 = spark.read.parquet(corpus)
      assert(fin2.count() == 7)
      assert(fin2.where(col("vec_id") === 3L).count() == 1,
        "replayed null row must not re-land")
      assert(fin2.where(col("vec_id") === 31L).count() == 1,
        "new null row still lands")
    } finally q2.stop()
  }

  test("datasheetMaintenanceSink: per-batch shard datasheets merge to " +
      "the batch-build over the union; checkpoint replay of a batch " +
      "overwrites its shard instead of double-counting") {
    import graft.text.TextAnalysis
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_ds_store").toString + "/ds"
    val in = MemoryStream[(Long, String, String)]
    val q = EventStreams.datasheetMaintenanceSink(
      in.toDF().toDF("doc_id", "src", "text"), "doc_id", "text",
      Seq("src"), store,
      java.nio.file.Files.createTempDirectory("graft_ds_ckpt")
        .toString)
    val b1 = Seq((1L, "web", "alpha beta"), (2L, "web", "alpha"),
      (3L, "book", "gamma"))
    val b2 = Seq((4L, "web", "delta beta"), (5L, "book", "gamma gamma"))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def live = EventStreams.liveDatasheet(spark, store, Seq("src"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val want = TextAnalysis.mergeDatasheets(
        TextAnalysis.datasheetShards(
          (b1 ++ b2).toDF("doc_id", "src", "text"), "doc_id", "text",
          Seq("src"), col("doc_id") % 3),
        Seq("src"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val first = live
      assert(first == want, s"$first vs $want")
      assert(first("web") == ((3L, 5L, 3L))) // alpha beta delta
      // replay batch 1 (at-least-once redelivery): the shard
      // OVERWRITES, the live datasheet does not double-count
      EventStreams.landDatasheetShard(
        b1.toDF("doc_id", "src", "text"), 0L, "doc_id", "text",
        Seq("src"), store)
      assert(live == first)
      // compaction to a new store preserves the datasheet exactly
      // (sketch union, not estimate) and collapses to one shard dir
      val store2 = java.nio.file.Files
        .createTempDirectory("graft_ds_store2").toString + "/ds"
      EventStreams.compactDatasheetStore(spark, store, store2,
        Seq("src"))
      val compacted = EventStreams.liveDatasheet(spark, store2,
          Seq("src"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(compacted == first)
      assert(new java.io.File(store2).listFiles
        .count(_.getName.startsWith("batch_id=")) == 1)
    } finally q.stop()
  }

  test("quantileMaintenanceSink: per-batch KLL shards merge to the " +
      "one-pass quantiles over the union; replay overwrites its " +
      "shard; compaction preserves the algebra") {
    import graft.quality.Drift
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_qs_store").toString + "/qs"
    val in = MemoryStream[(String, Double)]
    val q = EventStreams.quantileMaintenanceSink(
      in.toDF().toDF("lang", "v"), Seq("lang"), col("v"), store,
      java.nio.file.Files.createTempDirectory("graft_qs_ckpt")
        .toString)
    val b1 = (1 to 40).map(i => ("en", i.toDouble)) ++
      (1 to 10).map(i => ("de", (i * 3).toDouble))
    val b2 = (41 to 100).map(i => ("en", i.toDouble))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      def live = EventStreams.liveQuantiles(spark, store, Seq("lang"),
          Seq(0.5, 0.75))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      val first = live
      // exact regime: inclusive order statistics over the union
      assert(first("en") == ((100L, 50.0, 75.0)))
      assert(first("de") == ((10L, 15.0, 24.0)))
      // one-pass build over the union agrees (merge-tree independence)
      val want = Drift.mergeQuantileShards(
        Drift.quantileShards((b1 ++ b2).toDF("lang", "v"), Seq("lang"),
          col("v"), lit(0)), Seq("lang"), Seq(0.5, 0.75))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(first == want)
      // at-least-once replay of batch 0 overwrites, never doubles
      Drift.quantileShards(b1.toDF("lang", "v"), Seq("lang"),
          col("v"), lit(0L))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$store/batch_id=0")
      assert(live == first)
      // sketch-preserving compaction to a new store
      val store2 = java.nio.file.Files
        .createTempDirectory("graft_qs_store2").toString + "/qs"
      Drift.compactQuantileShards(
          spark.read.parquet(store).drop("batch_id"), Seq("lang"), 0L)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$store2/batch_id=0")
      val compacted = EventStreams.liveQuantiles(spark, store2,
          Seq("lang"), Seq(0.5, 0.75))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(compacted == first)
    } finally q.stop()
  }
}
