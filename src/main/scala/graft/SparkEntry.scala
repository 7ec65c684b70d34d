package graft

import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is an operator of the engine exercised over the
  * driver's test tables, with an equivalent DuckDB oracle in
  * [[SparkEntry.oracleSql]]. Conventions for oracle hash-fidelity:
  * output columns are strings / ints / longs / doubles only (no raw
  * timestamps or booleans), aggregate doubles are rounded, every query
  * has a total deterministic ORDER BY on both sides, and sums are always
  * over doubles (DuckDB sum(BIGINT) would widen to HUGEINT and break the
  * schema compare).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` physical type varies by data generator:
    * TIMESTAMP(NANOS) reads as nanos longs (Sessions sets the legacy
    * conf), TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
    * TIMESTAMP_NTZ. Normalize both to a session-TZ (UTC) microsecond
    * TIMESTAMP so downstream `unix_micros`/window arithmetic sees one
    * type; the wall-clock values are UTC instants either way.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", Fx.nanosToTimestamp(col("ts")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ wall-clock values ARE UTC instants, and the cast
        // below renders them in the SESSION zone — a session built
        // without Sessions.configure (which pins UTC) would silently
        // shift every instant by its local offset; fail loud instead
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events() requires spark.sql.session.timeZone=UTC (set by " +
            "graft.core.Sessions.configure): the NTZ->TIMESTAMP cast " +
            "renders wall-clock values in the session zone")
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation with the
    * dimension side broadcast.
    */
  def entry(spark: SparkSession): DataFrame =
    revenueByNation(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- //
  // Reference-parity queries (SURVEY.md §2)                          //
  // ---------------------------------------------------------------- //

  /** A1/A4/A6: grouped aggregation — pricing summary (TPC-H Q1 shape). */
  private def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2: latest-per-group (pandas groupby().idxmax() — first max wins).
    * Runs via the `max_by(struct(*), key)` aggregation form — partial +
    * final agg, ONE shuffle and no per-partition sort (the window form,
    * [[Analytics.latestPerGroup]], is result-identical and spec-checked
    * against this; the agg form is the scale default).
    */
  private def latestOrderPerCustomer(s: SparkSession, dir: String): DataFrame =
    Analytics.latestPerGroupAgg(
        t(s, dir, "orders"),
        Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        Fx.dateKey(col("o_orderdate")).as("o_orderdate_key"),
        col("o_totalprice"))
      .orderBy("o_custkey")

  /** T1: top-k by column (pandas nlargest). */
  private def top10Orders(s: SparkSession, dir: String): DataFrame =
    Analytics.topK(t(s, dir, "orders"), col("o_totalprice"), 10,
        col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** A3/T3: frequency facet counts (pandas value_counts().head). */
  private def orderPriorityFacets(s: SparkSession, dir: String): DataFrame =
    Analytics.facetCounts(t(s, dir, "orders"), col("o_orderpriority"), 10)

  /** P7/F14: regex-capture faceting (region-from-place in the reference;
    * here: leading word of part name).
    */
  private def partNameFacets(s: SparkSession, dir: String): DataFrame =
    Analytics.facetCounts(
      t(s, dir, "part"),
      regexp_extract(col("p_name"), "^(\\w+)", 1), 10)

  /** J1: multi-way equi-join + grouped agg, dimensions broadcast. */
  private def revenueByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy("n_name")

  /** A4/A5: scalar summary stats (exact median — oracle equality). */
  private def orderPriceStats(s: SparkSession, dir: String): DataFrame =
    Analytics.summaryStats(t(s, dir, "orders"), col("o_totalprice"))
      .select(
        round(col("mean"), 4).as("mean"),
        round(col("median"), 4).as("median"),
        round(col("max"), 2).as("max"),
        round(col("sum"), 2).as("sum"),
        col("count"))

  /** J2/U2: anti-join — customers with no orders. */
  private def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Analytics.orphanKeys(
        t(s, dir, "customer"), t(s, dir, "orders"),
        "c_custkey", "o_custkey")
      .orderBy("c_custkey")

  /** F1-F3/F13: surrogate keys + zero-padding for dim_customer. */
  private def dimCustomerKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        Fx.surrogateKey(col("c_custkey"), col("c_name")).as("customer_sk"),
        Fx.zeroPad(col("c_custkey"), 10).as("custkey_padded"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  /** F4-F9: generated date dimension over order dates. */
  private def dateDimension(s: SparkSession, dir: String): DataFrame =
    Fx.dateDimension(t(s, dir, "orders"), "o_orderdate")
      .select(
        date_format(col("date"), "yyyy-MM-dd").as("date_str"),
        col("date_key"), col("year"), col("quarter"), col("month"),
        col("month_name"), col("day_of_week"), col("day_of_year"),
        col("is_weekend").cast("int").as("is_weekend"))
      .orderBy("date_str")

  /** A8: duplicate-row accounting with pandas keep=False semantics —
    * all members of any duplicate group count.
    */
  private def duplicateOrderKeyStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
          .as("duplicate_rows"),
        coalesce(sum(when(col("__n") === 1, col("__n"))), lit(0L))
          .as("unique_rows"),
        coalesce(sum(col("__n")), lit(0L)).as("total_rows"))

  /** A7/P4: per-column completeness ratios. */
  private def lineitemCompleteness(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      round(avg(col("l_orderkey").isNotNull.cast("int")), 4)
        .as("c_orderkey"),
      round(avg(col("l_quantity").isNotNull.cast("int")), 4)
        .as("c_quantity"),
      round(avg(col("l_shipdate").isNotNull.cast("int")), 4)
        .as("c_shipdate"),
      count(lit(1)).as("total_rows"))

  /** P5/A6: range-rule accounting (violations below/above + bounds). */
  private def quantityRangeCheck(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity")
    t(s, dir, "lineitem").agg(
      count(when(q.isNotNull && q < 5.0, 1)).as("below_min"),
      count(when(q.isNotNull && q > 45.0, 1)).as("above_max"),
      count(q).as("checked"),
      round(min(q).cast("double"), 2).as("min_found"),
      round(max(q).cast("double"), 2).as("max_found"))
  }

  /** P6/F15: anchored pattern-rule accounting (pandas str.match). */
  private def customerNamePattern(s: SparkSession, dir: String): DataFrame = {
    val v = col("c_name").cast("string")
    t(s, dir, "customer").agg(
      count(when(v.isNotNull && !v.rlike("^(?:Customer#\\d{9})"), 1))
        .as("mismatches"),
      count(v).as("checked"))
  }

  /** Events: hourly tumbling aggregation (batch twin of the streaming
    * pipeline in graft.streaming).
    */
  private def eventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("hour", "event_type")

  /** F18: JSON props extraction + grouped agg over extracted field. */
  private def eventsPropsExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        round(avg("k"), 4).as("avg_k"),
        count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** U1: union-by-name of heterogeneous projections with missing
    * columns → null (pandas concat outer-column behavior).
    */
  private def unionHighLowOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val high = o.filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))
    val low = o.filter(col("o_totalprice") < 1000)
      .select(col("o_orderkey"), col("o_totalprice"))
    Analytics.unionAll(Seq(high, low))
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- //
  // LLM-pipeline extension queries (SURVEY.md §7.1 step 8):           //
  // text analysis, dedup, similarity search, multimodal plumbing      //
  // ---------------------------------------------------------------- //

  import graft.dedup.Dedup
  import graft.multimodal.Multimodal
  import graft.similarity.Similarity
  import graft.text.TextAnalysis

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")

  /** Text quality/token statistics per language. */
  private def textStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(avg(TextAnalysis.tokenCount(col("text")).cast("double")), 4)
        .as("avg_tokens"),
      round(avg(TextAnalysis.punctRatio(col("text"))), 4).as("avg_punct"),
      round(avg(TextAnalysis.stopwordRatio(col("text"))), 4).as("avg_stop"),
      round(avg(TextAnalysis.qualityScore(col("text"))), 4)
        .as("avg_quality"))
      .orderBy("lang")

  /** Per-document quality scoring. */
  private def docQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text")), 4).as("stop_ratio"),
      round(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
      .orderBy("doc_id")

  /** Language-ID heuristic vs the labeled lang column. */
  private def langIdFacets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langIdStaged(docs(s, dir), "text")
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")

  /** Whole-document + min-shingle-hash fingerprints. */
  private def docFingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.minShingleHash(col("text"), 4).as("sketch"))
      .orderBy("doc_id")

  /** Exact dedup accounting over normalized-text fingerprints. */
  private def exactDupStats(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDupStats(docs(s, dir), "text")

  /** Exact n-gram Jaccard near-dup pairs (inverted-index join).
    * maxShingleDf=10 drops stop-shingles from CANDIDATE generation —
    * at sf0.1 that is 10k of 27k shingles and 2.8× of the Σ(df²) join
    * cost, growing quadratically with corpus scale — while the exact
    * verify over full shingle sets keeps the emitted pairs and values
    * byte-identical to the uncapped run (spec-checked; the oracle is
    * the plain uncapped SQL).
    */
  private def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(10))
      .select(col("id_a"), col("id_b"), col("common"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** MinHash-LSH near-dup pairs (signatures → bands → verify).
    * r=4 rows/band: the s-curve crosses at (1/4)^(1/4) ≈ 0.71 — steep
    * enough that sub-0.2-Jaccard noise pairs (the bulk at corpus scale)
    * almost never become candidates, while 0.8+ pairs are near-certain.
    */
  private def minhashLshPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** Exact n-gram CONTAINMENT pairs ([[Dedup.ngramContainmentPairs]]):
    * |A∩B| / min(|A|, |B|) ≥ 0.6 over the q23 inverted index — the
    * asymmetric near-dup measure that catches a short document
    * embedded in a long one (quotes, boilerplate, wrapped re-posts)
    * where the long side's union dilutes Jaccard. Same
    * result-invariant stop-shingle cap.
    */
  private def ngramContainmentPairs(
      s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.6, maxShingleDf = Some(10))
      .select(col("id_a"), col("id_b"), col("common"),
        round(col("containment"), 4).as("containment"))
      .orderBy("id_a", "id_b")

  /** MinHash Jaccard ESTIMATES over the q24 LSH candidate pairs
    * ([[Dedup.minhashJaccardEstimate]]): Broder's agreement-fraction
    * estimator — pairs scored from 16 signature longs per document,
    * never touching shingle sets. The monitoring/histogram companion
    * to q24's exact verify.
    */
  private def minhashJaccardEst(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text",
        n = 3, numHashes = 16)
      .transform(graft.core.CacheScope.disk)
    val cands = Dedup.lshCandidates(sigs, "doc_id",
      bands = 4, rowsPerBand = 4)
    Dedup.minhashJaccardEstimate(cands, sigs, "doc_id", numHashes = 16)
      .orderBy("id_a", "id_b")
  }

  /** TF-weighted 64-bit SimHash fingerprints. */
  private def simhashFingerprints(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text")
      .select("doc_id", "simhash_hex")
      .orderBy("doc_id")

  /** SimHash near-dup pairs, hamming ≤ 3, via exact 4-block banding. */
  private def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int")
        .as("hamming"))
      .orderBy("id_a", "id_b")

  /** Embedding cosine near-duplicate pairs via centroid blocking —
    * candidates share one of their 2 nearest centroids, then one exact
    * dot product per candidate (no all-pairs work; the brute-force
    * [[Similarity.nearDupPairs]] is demoted to the spec oracle).
    */
  private def embeddingNeardup(s: SparkSession, dir: String): DataFrame =
    // nlist ≈ √n (Similarity.sqrtNlist guidance, pinned to a literal
    // for the oracle): bucket size stays ~√n as the corpus grows, so
    // Σ(bucket²) candidate work is O(n^1.5), not O(n²); measured at
    // sf0.001/0.01/0.1 this equals or beats the recall of the smaller
    // nlist with ~30% fewer candidates
    Similarity.nearDupPairsBlocked(emb(s, dir), "vec_id", "embedding",
        threshold = 0.45, nlist = 32, nprobe = 3)
      .orderBy("id_a", "id_b")

  /** Brute-force cosine top-10 neighbors for the first 10 vectors —
    * ranked by the bounded-heap top-k aggregate (shuffle carries k per
    * (query, partition), not every scored candidate); result-identical
    * to the window form, which the spec asserts.
    */
  private def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.bruteForceTopKAgg(
        e.where(col("vec_id") < 10), e, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Int8-quantized brute-force cosine top-10
    * ([[Similarity.quantizeInt8]]): the corpus is quantized to
    * per-vector-scaled tinyint codes (4× less storage/shuffle than
    * float32) and the search runs DIRECTLY on the codes — per-vector
    * scales cancel in the cosine, no dequantize. The oracle replays
    * the exact quantization arithmetic, so ranks, ties and rounded
    * sims are engine-identical.
    */
  private def annInt8(s: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(emb(s, dir), "embedding")
      .select(col("vec_id"), col("embedding_q"))
    Similarity.bruteForceTopKAgg(
        q.where(col("vec_id") < 10), q, "vec_id", "embedding_q", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF (bucketed) top-10 — the scale path for similarity search.
    * Fixed nlist=16 ([[Similarity.hashKCentroids]]): centroid count —
    * and with it the broadcast table and O(n·nlist) assignment cost —
    * stays constant as the corpus grows.
    */
  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.ivfTopK(
        e.where(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF over k-MEDIANS-refined centroids — same search path as q29
    * with the index "training" swapped in: FIXED-k hash init (nlist
    * independent of corpus size, so the broadcast centroid table and
    * the O(n·k) assignment cost hold at any scale), two refinement
    * iterations, exact per-dimension medians (selection-based order
    * statistics, so centroids reproduce bit-for-bit across engines —
    * a mean would inherit summation-order noise).
    */
  private def annIvfKmedians(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // exactMedian pinned: the oracle replays DuckDB's midpoint median
    // bit-for-bit; the engine DEFAULT is the bounded percentile_approx
    val cents = Similarity.kMediansCentroids(
      e, "vec_id", "embedding", k = 16, iters = 2, exactMedian = true)
    Similarity.ivfTopKWithCentroids(
        e.where(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 10, cents, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic hash-based train/val/test split over orders — pure
    * column expression (no shuffle, no rand()), so the assignment is
    * identical across engines, runs, and table growth. Summarized per
    * split to pin the exact membership via count + price sum.
    */
  private def hashSplitCounts(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.hashSplit(
        t(s, dir, "orders"), "o_orderkey",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("split")

  /** EXACT stratified sample: ceil(10% · stratum size) orders per
    * priority, membership pinned by the deterministic min-hash rank.
    * The key sum makes the oracle compare the exact sampled set, not
    * just its size.
    */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.stratifiedSampleExact(
        t(s, dir, "orders"), "o_orderkey", Seq("o_orderpriority"), 0.1)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum(col("o_orderkey").cast("double")), 1).as("key_sum"))
      .orderBy("o_orderpriority")

  /** Text normalization + PII redaction, membership pinned by md5 of
    * the transformed strings (not just row counts). A deterministic
    * email/phone/SSN per doc is appended before redaction so the scrub
    * path is exercised even on a clean corpus.
    */
  private def textNormalizeRedact(s: SparkSession, dir: String): DataFrame = {
    val synth = concat(col("text"),
      lit(" Contact: user"), col("doc_id").cast("string"),
      lit("@example.com, call 555-123-4567 or 123-45-6789."))
    val red = TextAnalysis.redactPii(synth)
    docs(s, dir).select(col("doc_id"),
        md5(TextAnalysis.normalizeText(col("text"))).as("norm_md5"),
        md5(red).as("redacted_md5"),
        TextAnalysis.piiCount(red).cast("int").as("n_pii"))
      .orderBy("doc_id")
  }

  /** Corpus-level collocation mining: top-15 adjacent word bigrams.
    * One explode + one shuffle; the n-gram assembly stays in codegen.
    */
  private def topBigrams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(TextAnalysis.bigrams(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(15)

  /** Range (interval) join: orders land in OVERLAPPING price bands —
    * a genuine interval containment join (a point can match several
    * bands), planned as a bucketized equi-join instead of the
    * nested-loop a naive theta-join would produce.
    */
  private def rangeJoinPriceBands(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(20).select(
      col("id").as("band_id"),
      (col("id") * 25000.0).as("lo"),
      (col("id") * 25000.0 + 40000.0).as("hi"))
    val pts = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
    Analytics.rangeJoin(pts, bands, "o_totalprice", "lo", "hi",
        bucketWidth = 25000.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("band_id")
  }

  /** Audio codec roundtrip: synthesize a REAL PCM16 WAV per document
    * (square wave parameterized by doc_id), decode it back through the
    * batch PCM parser, and emit signal stats. Every sample of a square
    * wave is ±amplitude, so decoded RMS and peak both equal the
    * amplitude EXACTLY — the oracle recomputes them analytically from
    * doc_id without any audio stack.
    */
  private def wavRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val wavs = Multimodal.synthesizeTestWavs(
      docs(s, dir).select("doc_id"), "doc_id")
    Multimodal.decodeWavStats(wavs, "id", "wav")
      .select(col("id").as("doc_id"), col("channels"), col("sample_rate"),
        col("n_samples"), col("peak"), round(col("rms"), 4).as("rms"))
      .orderBy("doc_id")
  }

  /** HyperLogLog approximate distinct (the 100 TB cardinality path —
    * constant memory per group vs countDistinct's exact shuffle of
    * every distinct value) asserted against the exact count in-query:
    * `within_5pct` must be 1 for every group or the oracle compare
    * fails. Spark's HLL++ is deterministic (hash-based, merge is
    * register-max), so this is a stable assertion, not a flaky one.
    */
  private def approxDistinctUsers(s: SparkSession, dir: String): DataFrame =
    events(s, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("__approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("__approx") - col("n_exact")) <=
          col("n_exact").cast("double") * lit(0.05))
          .cast("int").as("within_5pct"))
      .orderBy("event_type")

  /** Event attribution through the streaming interval join's batch
    * twin: each view pairs with same-user purchases in the following
    * 30 minutes, rolled up per hour. The identical transform runs on
    * `readStream` frames with watermark-bounded join state
    * ([[graft.streaming.EventStreams.intervalJoin]]).
    */
  private def eventAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val joined = graft.streaming.EventStreams.intervalJoin(
      ev.where(col("event_type") === "view"),
      ev.where(col("event_type") === "purchase"),
      horizon = "30 minutes")
    joined
      .groupBy(date_format(date_trunc("hour", col("l_ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users"),
        round(avg((unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
          .cast("double") / lit(1e6)), 4).as("avg_gap_sec"))
      .orderBy("hour")
  }

  /** Deterministic n-per-group sampling (reservoir analogue): the 5
    * min-hash orders per priority, membership pinned by the key sum.
    */
  private def groupSample(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.perGroupSample(
        t(s, dir, "orders"), "o_orderkey", Seq("o_orderpriority"), 5)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum(col("o_orderkey").cast("double")), 1).as("key_sum"))
      .orderBy("o_orderpriority")

  /** Token-budget shard packing (concat-then-chunk sequence packing):
    * documents laid end-to-end in id order, cut into 5000-token
    * shards via the PARTITIONED prefix sum ([[Packing.packIntoShards]]
    * — the unbounded window touches one row per id bucket, never the
    * corpus). Per-shard rollup pins the exact document→shard
    * assignment.
    */
  private def tokenShards(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("tokens"))
    graft.sampling.Packing.packIntoShards(d, "doc_id", "tokens",
        budget = 5000, bucketWidth = 256)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).cast("long").as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard")
  }

  /** Per-language token-budget selection: spend a 2000-token budget
    * per predicted language on the highest-quality documents
    * (rounded-quality order, id tie-break — the 4-decimal rounding is
    * the cross-engine-stable key q19 proves). Strict budget: the
    * first document that would overflow is excluded.
    */
  private def langTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("tokens", TextAnalysis.tokenCount(col("text")))
    val tagged = TextAnalysis.langIdStaged(d, "text")
    graft.sampling.Packing.takeUntilBudget(
        tagged, Seq("predicted"),
        Seq(round(col("quality"), 4).desc, col("doc_id").asc),
        "tokens", budget = 2000)
      .groupBy("predicted")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).cast("long").as("sum_tokens"),
        round(sum(col("doc_id").cast("double")), 1).as("id_sum"))
      .orderBy("predicted")
  }

  /** Token-window chunking (64-token windows, 8-token overlap) — the
    * pre-embedding/RAG chunking pass. md5 of each chunk's text pins
    * the exact chunk boundaries and content in the oracle compare.
    */
  private def docChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkByTokens(docs(s, dir), "doc_id", "text",
        window = 64, overlap = 8)
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tokens").cast("long").as("n_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Weighted sample without replacement (Efraimidis–Spirakis A-RES,
    * ln(u)/w keys): 20 orders with inclusion probability scaling with
    * o_totalprice, membership pinned by the md5 hash — deterministic
    * across engines.
    */
  private def weightedOrderSample(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.weightedSample(
        t(s, dir, "orders"), "o_orderkey", "o_totalprice", k = 20)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** MP4 metadata roundtrip (the q38 pattern for VIDEO): a synthetic
    * ISO-BMFF header per doc_id — 20-byte ftyp(isom) + moov + mvhd v0
    * with formula-driven timescale/duration — is ENCODED as hex and
    * DECODED back by [[Multimodal.videoHeaderMeta]] (dynamic box
    * offsets, pure expressions), then frame-sample midpoint
    * timestamps are planned from the decoded duration. The oracle
    * computes the same formulas directly, so any encode OR decode bug
    * breaks the hash match.
    */
  private def videoMeta(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val timescale = (id % 3 * 300 + 600).cast("long")
    val ticks = ((id % 50 + 1) * 600).cast("long")
    val headerHex = concat(
      lit("00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"),
      lit("00000074" + "6D6F6F76"), // moov size + type
      lit("0000006C" + "6D766864" + "00" + "000000" // mvhd v0 + flags
        + "00000000" + "00000000"), // creation + modification
      lpad(hex(timescale), 8, "0"), lpad(hex(ticks), 8, "0"))
    val n = 8
    docs(s, dir)
      .select(id, Multimodal.videoHeaderMeta(unhex(headerHex)).as("m"))
      .select(id, col("m.format").as("format"), col("m.brand").as("brand"),
        col("m.timescale").as("timescale"),
        col("m.duration_ticks").as("duration_ticks"),
        round(col("m.duration_sec"), 4).as("duration_sec"),
        Multimodal.frameSampleTimestamps(col("m.duration_sec"), n)
          .as("__ts"))
      .select(col("doc_id"), col("format"), col("brand"),
        col("timescale"), col("duration_ticks"), col("duration_sec"),
        size(col("__ts")).as("n_frames"),
        element_at(col("__ts"), 1).as("first_ts"),
        element_at(col("__ts"), n).as("last_ts"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: every 10th document plays the eval
    * set; the rest are the corpus. Flags corpus docs sharing ≥5
    * distinct 5-grams with any benchmark doc — the small-absolute-
    * overlap regime LSH can't serve (see
    * [[Dedup.contaminationCheck]]).
    */
  private def contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contaminationCheck(
        d.where(col("doc_id") % 10 =!= 0),
        d.where(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 5, minCommon = 5)
      .orderBy("corpus_id", "benchmark_id")
  }

  /** q64's decontamination with the benchmark-side document-frequency
    * cap ENGAGED (`maxBenchmarkDf = 1`): 3-gram shingles present in
    * more than one eval document are boilerplate identifying no
    * specific benchmark doc — and at corpus scale each one multiplies
    * join fan-out (df_corpus × df_benchmark rows). The cap of 1
    * demonstrably changes this data's answer (drops pairs reached
    * only via shared-boilerplate shingles), so the oracle verifies
    * the cap's exact semantics, not just the uncapped join.
    */
  private def contaminationCapped(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contaminationCheck(
        d.where(col("doc_id") % 10 =!= 0),
        d.where(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, minCommon = 3,
        maxBenchmarkDf = Some(1))
      .orderBy("corpus_id", "benchmark_id")
  }

  /** Product-quantized ANN ([[Similarity.pqTrainCodebooks]] /
    * [[Similarity.pqEncode]] / [[Similarity.pqTopK]]): 4 blocks × 16
    * codewords over the 64-dim embeddings — each corpus vector
    * becomes 4 codes (64× smaller than float32), and search is ADC
    * over the code table. Fully deterministic (hash-init k-medians
    * training, L2 per-block encode, code-ascending ties), so the
    * oracle replays training, encoding AND the ADC scoring.
    */
  private def annPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // exactMedian pinned for the cross-engine oracle replay; the
    // engine default is the bounded percentile_approx re-center
    val books = Similarity.pqTrainCodebooks(e, "vec_id", "embedding",
      m = 4, k = 16, iters = 2, exactMedian = true)
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", books)
    Similarity.pqTopK(e.where(col("vec_id") < 10), enc, books,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ ANN ([[Similarity.ivfPqAssignCodes]] /
    * [[Similarity.ivfPqTopK]]): q112's PQ codes behind q29's coarse
    * routing — each query probes its 3 nearest of 16 hash-init
    * centroids and ADC-scores ONLY those buckets' codes, so the
    * scored-row count is Σ(probed bucket sizes), ~nprobe/nlist of
    * the corpus, instead of corpus × queries. The 100 TB search
    * shape: the index rows carry 4 codes, never vectors. Fully
    * deterministic, so the oracle replays training, encoding,
    * routing AND the routed ADC scoring.
    */
  private def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val books = Similarity.pqTrainCodebooks(e, "vec_id", "embedding",
      m = 4, k = 16, iters = 2, exactMedian = true)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    val index = Similarity.ivfPqAssignCodes(
      e, "vec_id", "embedding", cents, books)
    Similarity.ivfPqTopK(e.where(col("vec_id") < 10), index, books,
        cents, "vec_id", "embedding", k = 10, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** RESIDUAL IVF-PQ ANN ([[Similarity.ivfRpqTrainCodebooks]] /
    * [[Similarity.ivfRpqAssignCodes]] / [[Similarity.ivfRpqTopK]]):
    * q113's coarse routing, but the PQ codebooks train on and encode
    * the residual x − c against each vector's assigned centroid — the
    * published IVF-ADC construction that spends the code budget on
    * local displacement. ADC scores cosine(q, c + r̂) from codes only,
    * decomposed into per-(query, block, code) and per-(centroid,
    * block, code) broadcast lookup tables. Fully deterministic, so
    * the oracle replays assignment, residual training, encoding,
    * routing AND the decomposed scoring.
    */
  private def annIvfRpq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    // exactMedian pinned for the cross-engine oracle replay (engine
    // default is the bounded percentile_approx re-center)
    val books = Similarity.ivfRpqTrainCodebooks(e, "vec_id", "embedding",
      cents, m = 4, k = 16, iters = 2, exactMedian = true)
    val index = Similarity.ivfRpqAssignCodes(
      e, "vec_id", "embedding", cents, books)
    Similarity.ivfRpqTopK(e.where(col("vec_id") < 10), index, books,
        cents, "vec_id", "embedding", k = 10, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** ANN recall audit ([[Similarity.recallAudit]]): the q28
    * brute-force exact top-10 vs the q29 IVF routed top-10, per-query
    * — (n_exact, n_hit, recall) rows, the index-health measure that
    * triggers re-centering/re-training when it slips. In production
    * the query leg is a hash-sample; here it's the same 10 audit
    * queries q28/q29 pin.
    */
  private def annRecallAuditQ(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopKAgg(
      q, e, "vec_id", "embedding", k = 10)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    val routed = Similarity.ivfTopKWithCentroids(
      q, e, "vec_id", "embedding", k = 10, cents, nprobe = 3)
    Similarity.recallAudit(routed, exact).orderBy("query_id")
  }

  /** SAMPLED ANN recall audit — the standing production form
    * [[Similarity.recallAudit]]'s scaladoc prescribes: the query leg
    * is a deterministic 10 % [[graft.sampling.Sampling.hashFraction]]
    * sample of the corpus (salt "audit"), so the brute-force exact
    * leg costs 10 % of a query-load scan however large the corpus
    * grows — the audit that runs on a schedule, not the q117
    * exhaustive twin kept for comparison. Same IVF routed side
    * (16 hash centroids, nprobe 3, k 10). Per sampled query:
    * (n_exact, n_hit, recall).
    */
  private def annRecallAuditSampledQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(graft.sampling.Sampling
      .hashFraction(col("vec_id"), "audit") < 0.10)
    val exact = Similarity.bruteForceTopKAgg(
      q, e, "vec_id", "embedding", k = 10)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    val routed = Similarity.ivfTopKWithCentroids(
      q, e, "vec_id", "embedding", k = 10, cents, nprobe = 3)
    Similarity.recallAudit(routed, exact).orderBy("query_id")
  }

  /** Distributed BPE merge-table training
    * ([[TextAnalysis.bpeTrainMerges]]): 8 byte-pair merges induced
    * from the documents corpus — per iteration one vocabulary-sized
    * pair-count aggregation, one argmax row to the driver, one pure
    * merge expression. The tokenizer-build artifact (step, lhs, rhs,
    * merged, pair_count).
    */
  private def bpeMergesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrainMerges(docs(s, dir), "text", merges = 8)
      .select(col("step"), col("lhs"), col("rhs"), col("merged"),
        col("pair_count"))
      .orderBy("step")

  /** Dedup-aware token budget: per language, the RAW token count next
    * to the EFFECTIVE count after exact + near-dup survivorship (the
    * q31 kept-set) — what deduplication actually saves per slice, the
    * number a mixture designer needs instead of raw volume (a
    * language dominated by re-posts contributes far fewer unique
    * training tokens than its raw count suggests).
    * `dup_token_frac` is an exact-long division emitted UNROUNDED
    * (q137's argument: same two longs → the same double in every
    * engine).
    */
  private def dedupTokenBudget(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.{CorpusPipeline, Dedup}
    val d = docs(s, dir)
    val kept = Dedup.exactDedupSemi(d, "doc_id", "text")
      .join(CorpusPipeline.nearDupDropIds(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8),
        Seq("doc_id"), "left_anti")
    val tok = d.select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("__nt"))
    val raw = tok.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("raw_tokens"))
    val eff = kept.select("doc_id").join(tok, Seq("doc_id"))
      .groupBy(col("lang").as("__l"))
      .agg(count(lit(1)).as("__nk"), sum("__nt").as("__et"))
    raw.join(eff, col("lang") <=> col("__l"), "left")
      .select(col("lang"), col("n_docs"), col("raw_tokens"),
        coalesce(col("__nk"), lit(0L)).as("n_kept"),
        coalesce(col("__et"), lit(0L)).as("effective_tokens"),
        when(col("raw_tokens") > 0,
          (col("raw_tokens") - coalesce(col("__et"), lit(0L)))
            .cast("double") / col("raw_tokens"))
          .as("dup_token_frac"))
      .orderBy("lang")
  }

  /** Mergeable corpus datasheet
    * ([[TextAnalysis.datasheetShards]] / [[TextAnalysis
    * .mergeDatasheets]]): shard datasheets built independently per
    * ingest batch (doc_id % 4 plays the batch id) merge by sum +
    * DataSketches-HLL union into the per-(source, lang) datasheet —
    * the maintenance shape where stats update per append without
    * rescanning history. The HLL vocabulary estimate is asserted
    * in-query against the exact distinct count (q46's pattern:
    * `vocab_within_5pct` must be 1 for every group or the oracle
    * compare fails — the sketch is deterministic, so this is a
    * stable assertion).
    */
  private def mergeableDatasheetQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merged = TextAnalysis.mergeDatasheets(
      TextAnalysis.datasheetShards(d, "doc_id", "text",
        Seq("source", "lang"), col("doc_id") % 4),
      Seq("source", "lang"))
    val exact = d.select(col("source").as("__s"), col("lang").as("__l"),
        explode(TextAnalysis.words(coalesce(col("text"), lit(""))))
          .as("w"))
      .groupBy("__s", "__l")
      .agg(count_distinct(col("w")).as("__ve"))
    merged.join(exact,
        col("source") <=> col("__s") && col("lang") <=> col("__l"),
        "left")
      .select(col("source"), col("lang"), col("n_docs"),
        col("sum_tokens"),
        coalesce(col("__ve"), lit(0L)).as("vocab_exact"),
        (abs(col("vocab_estimate") - coalesce(col("__ve"), lit(0L))) <=
          coalesce(col("__ve"), lit(0L)).cast("double") * lit(0.05))
          .cast("int").as("vocab_within_5pct"))
      .orderBy("source", "lang")
  }

  /** Rare-token span detection ([[TextAnalysis.rareTokenSpans]]):
    * per document the 16-token window densest in corpus-rare tokens
    * (freq ≤ 2) — the garbage-span locator for base64 blobs and
    * mojibake runs that whole-document scores dilute. Integer window
    * counts keep the argmax bit-exact across engines.
    */
  private def rareTokenSpansQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rareTokenSpans(docs(s, dir), "doc_id", "text",
        window = 16, maxFreq = 2)
      .orderBy("doc_id")

  /** Corpus cluster map: embedding-space clusters
    * ([[Similarity.hashKCentroids]] + [[Similarity.assignToCentroids]])
    * joined to document metadata — per cluster (n_docs, sum_tokens,
    * n_langs, top_lang, top_lang_docs), the "what lives where in my
    * corpus" datasheet a mixture designer reads before weighting
    * sources. Cross-modal composition: clusters from the embeddings
    * table, stats from documents, joined on the shared id. One
    * broadcast centroid assignment + two map-side-combined
    * aggregations; the top-lang window sorts per-cluster language
    * counts (≤ #langs rows per cluster).
    */
  private def corpusClusterMap(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    val assigned = Similarity
      .assignToCentroids(e, cents, "vec_id", "embedding")
      .select(col("vec_id").as("doc_id"), col("centroid_id"))
    val base = assigned
      .join(docs(s, dir).select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("__nt")),
        Seq("doc_id"))
      .transform(graft.core.CacheScope.disk)
    val agg = base.groupBy("centroid_id")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("sum_tokens"),
        count_distinct(col("lang")).as("n_langs"))
    val lw = Window.partitionBy("centroid_id")
      .orderBy(col("__lc").desc, col("lang").asc)
    val top = base.where(col("lang").isNotNull)
      .groupBy("centroid_id", "lang").agg(count(lit(1)).as("__lc"))
      .withColumn("__r", row_number().over(lw)).where(col("__r") === 1)
      .select(col("centroid_id"), col("lang").as("top_lang"),
        col("__lc").as("top_lang_docs"))
    agg.join(top, Seq("centroid_id"), "left").orderBy("centroid_id")
  }

  /** Bigram-LM quality ([[TextAnalysis.bigramLmScoreSelf]]): the
    * word-ORDER typicality signal above q124's unigram score —
    * Jelinek-Mercer λ=0.75 (dyadic: λ and 1−λ are exact binary
    * doubles, so the oracle's literals are bit-identical weights).
    */
  private def bigramLmQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScoreSelf(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"),
        round(col("bigram_lm_score"), 4).as("bigram_lm_score"))
      .orderBy("doc_id")

  /** Semantic decontamination report
    * ([[Similarity.srpNearDupMatches]]): every fifth embedding plays
    * a benchmark/eval item re-encoded with drift (q127's perturbation
    * — slight for every tenth id, heavy otherwise); the report lists
    * each eval item's verified semantic matches in the training
    * corpus — (eval_id, corpus_id, hamming, cos) — the embedding
    * sibling of q64's n-gram contamination check, catching leaked
    * items that shingle overlap misses after paraphrase/re-encoding.
    * Probe cost: the eval set sketches only itself against the
    * standing corpus SRP index; corpus vectors load candidate-sized.
    */
  private def semanticDecontamination(
      s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val evalSet = corpus.where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), transform(col("v"),
        (x, d) => x +
          when(col("vec_id") % 10 === 0, lit(0.01)).otherwise(lit(0.3)) *
          ((col("vec_id") * 7 + d) % 5 - lit(2)).cast("double")).as("v"))
    val index = Similarity.buildSrpIndex(corpus, "vec_id", "v", dim = 64)
    Similarity.srpNearDupMatches(index, corpus, evalSet,
        "vec_id", "v", dim = 64, maxDist = 3, minCos = 0.98)
      .select(col("batch_id").as("eval_id"), col("corpus_id"),
        col("hamming").cast("int").as("hamming"),
        round(col("cos"), 4).as("cos"))
      .orderBy("eval_id", "corpus_id")
  }

  /** BPE apply: train the q142 merge table, then segment every
    * document with it — the corpus token budget under the REAL
    * trained tokenizer (train → apply, the full tokenizer-build
    * loop). Runs the PRODUCTION path
    * ([[TextAnalysis.bpeTokenCountsFast]]: broadcast rank table + one
    * `mapPartitions` greedy pass, plan constant-size in the
    * vocabulary); the expression-composed
    * [[TextAnalysis.bpeTokenCounts]] is its spec-pinned audit twin
    * (BpeSpec holds them row-for-row equal on this corpus).
    */
  private def bpeTokenCountsQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = TextAnalysis.bpeTrainMerges(d, "text", merges = 8)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextAnalysis.bpeTokenCountsFast(d, "doc_id", "text", m)
      .orderBy("doc_id")
  }

  /** ANN hard-negative mining ([[Similarity.hardNegatives]]): per
    * audit query, the 5 most-similar WRONG-label vectors via the q29
    * IVF routing — the contrastive-training negative sampler (random
    * negatives are trivially separable; the confusable wrong-label
    * neighbors carry the gradient). Label filter prunes inside the
    * probed buckets, before ranking.
    */
  private def hardNegativesQ(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    Similarity.hardNegatives(e.where(col("vec_id") < 10), e,
        "vec_id", "embedding", "label", k = 5, cents, nprobe = 3)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("sim"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Fused corpus-prep quality pass
    * ([[TextAnalysis.qualityPass]]): collapse-repeats cleanup,
    * Gopher-style repetition signals, and the self-trained unigram-LM
    * score in ONE scan of documents — the q133/q65/q124 trio fused
    * over shared tokenization (plan-spec-pinned to a single parquet
    * scan). Text ships as md5 (q133's convention).
    */
  private def fusedQualityPassQ(
      s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPass(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("n_tokens"), col("n_removed"), col("n_bigrams"),
        col("dup_bigram_frac"), col("top_bigram_frac"),
        round(col("lm_score"), 4).as("lm_score"))

  /** FOUR-way fused quality pass — q140's trio plus q145's
    * Jelinek-Mercer bigram-LM score in the SAME single corpus scan
    * ([[TextAnalysis.qualityPass]] `withBigramLm = true`): the bigram
    * model re-aggregates from the fused (kind, token) count frame and
    * its unigram backoff reuses the q140 LM vocabulary, so the fourth
    * signal adds zero corpus scans (plan-spec-pinned with q140's
    * single-FileSourceScan assertion).
    */
  private def fusedQualityBigramQ(
      s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPass(docs(s, dir), "doc_id", "text",
        withBigramLm = true)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("n_tokens"), col("n_removed"), col("n_bigrams"),
        col("dup_bigram_frac"), col("top_bigram_frac"),
        round(col("lm_score"), 4).as("lm_score"),
        round(col("bigram_lm_score"), 4).as("bigram_lm_score"))
      .orderBy("doc_id")
      .orderBy("doc_id")

  /** End-to-end ANN index LIFECYCLE — the maintain-audit loop the
    * maintenance scaladocs describe, in one query: codebooks train on
    * the INITIAL corpus (vec_id % 4 ≠ 0) and persist to parquet; the
    * IVF-PQ search index builds as a bucketed table
    * ([[Similarity.pqBuildIvfIndex]]) and the batch (vec_id % 4 = 0)
    * lands through [[Similarity.ivfPqIndexAppend]] — codes frozen on
    * the initial-corpus codebooks, exactly the daily-append shape; a
    * vector-carrying twin ([[Similarity.buildIvfIndex]] +
    * [[Similarity.ivfIndexAppend]]) feeds [[Similarity.ivfDriftReport]]
    * (a code-only index cannot drift-report). The sampled audit
    * (10 % [[graft.sampling.Sampling.hashFraction]], q138's form)
    * searches the appended table via [[Similarity.ivfPqTopK]] against
    * the brute-force exact leg, and each sampled query's recall rolls
    * up to its assigned bucket. Output, one row per coarse bucket:
    * (centroid_id, n, mean_sim, recenter_advised, n_audit,
    * avg_recall) — drift and recall side by side, the health report
    * that decides re-center vs re-train. Builds are
    * overwrite-then-append so in-session reruns stay deterministic.
    */
  /** Reap `graft_q139_*_<pid>` warehouse locations whose pid is no
    * longer alive: a crashed or killed run never reaches its own
    * same-pid cleanup, and without this its index/codebook tables
    * would sit in the warehouse forever (the in-memory catalog dies
    * with the JVM; the directories don't). Liveness via
    * `ProcessHandle.of` — stronger than an age heuristic, which
    * either reaps a slow live run or waits out dead ones.
    */
  private[graft] def q139ReapOrphans(s: SparkSession): Unit = {
    val self = java.lang.ProcessHandle.current().pid()
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) {
      val pat = "^graft_q139_.*_([0-9]+)$".r
      fs.listStatus(wh).foreach { st =>
        st.getPath.getName match {
          case pat(pid) if pid.toLong != self &&
              !java.lang.ProcessHandle.of(pid.toLong)
                .map[Boolean](_.isAlive).orElse(false) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }

  private def indexLifecycleQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val initial = e.where(col("vec_id") % 4 =!= 0)
    val batch = e.where(col("vec_id") % 4 === 0)
    val cents = Similarity.hashKCentroids(
      initial, "vec_id", "embedding", 16)
    val books = Similarity.pqTrainCodebooks(initial, "vec_id",
      "embedding", m = 4, k = 16, iters = 2, exactMedian = true)
    // artifact names carry the JVM pid: concurrent sessions (a verify
    // run racing a test suite that also executes the registry) must
    // not fight over one warehouse location — same-session reruns
    // still hit the same names and stay overwrite-then-append
    val tag = java.lang.ProcessHandle.current().pid()
    val pqT = s"graft_q139_pq_idx_$tag"
    val vecT = s"graft_q139_vec_idx_$tag"
    val booksT = s"graft_q139_books_$tag"
    q139ReapOrphans(s)
    // the warehouse dir outlives the in-memory catalog: a table
    // location left by a previous same-pid session would block
    // saveAsTable, so drop the catalog entry AND any orphaned location
    Seq(pqT, vecT, booksT).foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    // codebooks persist as a warehouse table like the indexes — a
    // cluster-visible location (executors of a real deployment write
    // parquet parts to the shared warehouse FS), where a driver-local
    // temp dir would land parts on each executor's own disk and the
    // read-back would miss them; same-pid reuse also stops repeated
    // runs leaking one temp dir per call
    books.write.mode("overwrite").saveAsTable(booksT)
    val booksP = s.table(booksT)
    Similarity.pqBuildIvfIndex(initial, "vec_id", "embedding", cents,
      booksP, pqT, numBuckets = 4)
    Similarity.ivfPqIndexAppend(batch, "vec_id", "embedding", cents,
      booksP, pqT, numBuckets = 4)
    Similarity.buildIvfIndex(initial, "vec_id", "embedding", cents,
      vecT, numBuckets = 4)
    Similarity.ivfIndexAppend(batch, "vec_id", "embedding", cents,
      vecT, numBuckets = 4)
    val drift = Similarity.ivfDriftReport(s, vecT,
      "embedding", cents)
    val q = e.where(graft.sampling.Sampling
      .hashFraction(col("vec_id"), "audit") < 0.10)
    val approx = Similarity.ivfPqTopK(q, s.table(pqT),
      booksP, cents, "vec_id", "embedding", k = 10, nprobe = 3)
    val exact = Similarity.bruteForceTopKAgg(
      q, e, "vec_id", "embedding", k = 10)
    val audit = Similarity.recallAudit(approx, exact)
    val qc = s.table(vecT)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    // avg_recall deliberately UNROUNDED: per-query recalls are exact
    // small-denominator rationals rounded to 4 decimals, so their
    // mean frequently lands on an exact decimal half and round(.,4)
    // diverges between engines (Spark rounds the shortest decimal
    // string, others the binary value); the driver compare's 9-decimal
    // canonicalization absorbs ulp-level summation-order noise
    val perC = audit.join(qc, Seq("query_id"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_audit"),
        avg(col("recall")).as("avg_recall"))
    drift.join(perC, Seq("centroid_id"), "left_outer")
      .select(col("centroid_id"), col("n"), col("mean_sim"),
        col("recenter_advised"),
        coalesce(col("n_audit"), lit(0L)).as("n_audit"),
        col("avg_recall"))
      .orderBy("centroid_id")
  }

  /** LSH candidate-coverage audit ([[Similarity.recallAudit]] in pair
    * mode): q24's banded candidate generation audited against q23's
    * exact-Jaccard ≥ 0.8 pairs, per id_a — the s-curve tuning measure
    * for (numHashes, bands): a slipping audit means more hashes or
    * wider bands. Candidate-side false positives are verify-stage
    * cost, not a miss — the audit measures what banding LOSES.
    */
  private def lshRecallAuditQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      n = 3, threshold = 0.8, maxShingleDf = Some(10))
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text",
      n = 3, numHashes = 16)
    val cands = Dedup.lshCandidates(sigs, "doc_id",
      bands = 4, rowsPerBand = 4)
    Similarity.recallAudit(cands, exact, keyCols = Seq("id_a", "id_b"))
      .orderBy("id_a")
  }

  /** Shuffle-key skew report over the documents language column
    * ([[Analytics.skewReport]]): languages above a 5 % row share, with
    * the task-imbalance multiplier a hash exchange keyed on `lang`
    * would suffer — exactly the diagnostic that motivated this
    * round's two-phase rank/budget operators.
    */
  private def keySkewReport(s: SparkSession, dir: String): DataFrame =
    Analytics.skewReport(docs(s, dir), "lang", minFraction = 0.05,
        exactKeys = true)
      .orderBy("key")

  /** Incremental near-dup detection ([[Dedup.buildLshIndex]] +
    * [[Dedup.nearDupMatches]]): every third document plays the
    * incoming batch; the rest are the standing corpus whose LSH index
    * is built once. Batch rows probe the index and candidates verify
    * by exact Jaccard — the asymmetric daily-ingest shape that never
    * re-pairs the corpus with itself. Same q24 band parameters.
    */
  private def nearDupIncremental(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val corpus = d.where(col("doc_id") % 3 =!= 0)
    val batch = d.where(col("doc_id") % 3 === 0)
    val index = Dedup.buildLshIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4)
    Dedup.nearDupMatches(corpus, index, batch, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("batch_id"), col("corpus_id"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("batch_id", "corpus_id")
  }

  /** Incremental containment matches ([[Dedup.containmentMatches]]):
    * the q110 batch/corpus split, but scored by BATCH-side containment
    * — the asymmetric ingest guard that catches a batch doc embedded
    * in a longer corpus doc where Jaccard (and the band index that
    * estimates it) dilutes below threshold. Same result-invariant
    * corpus-DF stop-shingle cap as q23/q119.
    */
  private def containmentIncremental(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val corpus = d.where(col("doc_id") % 3 =!= 0)
    val batch = d.where(col("doc_id") % 3 === 0)
    Dedup.containmentMatches(corpus, batch, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(10))
      .select(col("batch_id"), col("corpus_id"), col("common"),
        round(col("containment"), 4).as("containment"))
      .orderBy("batch_id", "corpus_id")
  }

  /** Content-defined chunking ([[TextAnalysis.chunkByContent]]):
    * rolling-hash boundaries (3-gram md5 class mod 32) cut each
    * document into ~32-token chunks whose identity depends only on
    * LOCAL content — the insertion-robust chunking that makes
    * chunk-level dedup against a previous snapshot work. md5 of each
    * chunk pins exact boundaries and content in the oracle.
    */
  private def contentChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkByContent(docs(s, dir), "doc_id", "text",
        k = 3, targetTokens = 32)
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tokens"), md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Chunk-level incremental dedup ([[Dedup.dedupChunksAgainst]] —
    * q109's content-defined chunking composed with q51's
    * dedup-against-store shape): every 10th document gets a trailing
    * edit and the edited snapshot dedups at CHUNK granularity against
    * the original snapshot's chunk store. Only chunks touching an
    * edit re-land — content-defined boundaries keep every untouched
    * chunk's md5 identical, so an edited corpus re-ships deltas, not
    * documents. The oracle replays chunking on both snapshots, the
    * within-snapshot first-writer collapse, and the store anti-join.
    */
  private def chunkIncrementalDedup(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val edited = d.withColumn("text",
      when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" edit pass appended new sentence")))
      .otherwise(col("text")))
    Dedup.dedupChunksAgainst(d, edited, "doc_id", "text",
        k = 3, targetTokens = 32)
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tokens"), md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Auto skew remediation on the oracle path ([[Analytics.skewSalts]]
    * / [[Analytics.autoSaltedJoin]] / [[Analytics.autoSaltedSum]]):
    * the documents language rollup (q111's skew subject) computed
    * through hot-key-only salting — the diagnosis pass derives
    * per-key salt factors from skew_ratio, the join key becomes
    * (lang, salt) with only hot languages' rows spread and replicated,
    * and the sum aggregates partially on the salted key. The oracle is
    * the PLAIN join+rollup: salting must never change a result, and
    * the id-sum pins exact row membership through both operators.
    */
  private def saltedLangRollup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("lang"), col("doc_id"))
    val dim = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val salts = Analytics.skewSalts(d, "lang", minFraction = 0.05,
      maxSalts = 16, exactKeys = true)
    val joined = Analytics.autoSaltedJoin(d, dim, "lang", "inner", salts)
    Analytics.autoSaltedSum(joined, "lang", Seq("doc_id"), salts)
      .join(dim, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("sum_doc_id"))
      .orderBy("lang")
  }

  /** Per-priority winsorized order prices ([[Analytics.winsorize]],
    * exact mode): clamp each priority's prices into its own [p05, p95]
    * quantile range and report the clipped mass next to the original
    * — the outlier-robust normalization pass, per-group cutoffs so a
    * cheap-priority segment is not clipped by an expensive one's
    * distribution.
    */
  private def winsorizedPrices(s: SparkSession, dir: String): DataFrame =
    Analytics.winsorize(
        t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_totalprice")),
        "o_totalprice", pLo = 0.05, pHi = 0.95,
        groupCols = Seq("o_orderpriority"), exact = true)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        // the clipped DELTA, not the clipped total: interior rows
        // contribute exactly 0, so the sum's FP error stays far from
        // the rounding boundary regardless of group magnitude
        round(sum(col("o_totalprice_w") - col("o_totalprice")), 1)
          .as("clip_delta"),
        round(min("o_totalprice_w"), 2).as("min_w"),
        round(max("o_totalprice_w"), 2).as("max_w"))
      .orderBy("o_orderpriority")

  /** Temperature-scaled mixture weights
    * ([[graft.sampling.Sampling.temperatureWeights]]): the α-sampling
    * table for the per-language training mix at α = 0.5 — natural
    * share p, reweighted share q ∝ p^α, and the size-preserving
    * repetition factor q/p that [[graft.sampling.Sampling.mixture]]
    * consumes. FP-order-sensitive quantities rounded at 6.
    */
  private def temperatureMixture(
      s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.temperatureWeights(
        docs(s, dir).select(col("lang")), "lang", alpha = 0.5)
      .select(col("group"), col("n").cast("long").as("n_docs"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round(col("weight"), 6).as("weight"))
      .orderBy("group")

  /** Exact shared-span detection ([[Dedup.sharedSpans]]): document
    * pairs whose longest verbatim common token substring reaches 8
    * tokens (5-gram seeds, boilerplate 5-grams df-capped at 10) — the
    * "exact substring dedup" pass published training pipelines run
    * beside whole-document near-dup removal.
    */
  private def sharedSpanPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.sharedSpans(docs(s, dir), "doc_id", "text",
        k = 5, minSpanTokens = 8, maxShingleDf = 10)
      .orderBy("id_a", "id_b")

  /** Gopher-style token-repetition signals per document (duplicate
    * and top bigram fractions) — the standard repetition filters a
    * pretraining pipeline runs next to [[TextAnalysis.qualityScore]].
    */
  private def repetitionSignals(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Corpus datasheet: the per-(source, lang) mix report every
    * training run documents — volume, token mass, mean quality.
    * First-class use of the documents table's provenance columns.
    */
  private def corpusDatasheet(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("sum_tokens"),
        round(avg(TextAnalysis.qualityScore(col("text"))), 4)
          .as("avg_quality"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "lang")

  /** Per-source quota cap (the per-domain cap every web corpus
    * applies) via [[graft.sampling.Sampling.cappedPerGroupSample]] —
    * the two-phase skew-safe form: a count-aware hash pre-filter
    * bounds each group's window input to ~cap rows, so one mega-domain
    * can never pin a single sort task. The id checksum pins the exact
    * kept SET, not just its size.
    */
  private def sourceCap(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val kept = graft.sampling.Sampling
      .cappedPerGroupSample(d, "doc_id", Seq("source"), n = 10,
        salt = "cap")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        round(sum(col("doc_id").cast("double")), 1).as("kept_id_sum"))
    d.groupBy("source").agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("source"))
      .select("source", "n_total", "n_kept", "kept_id_sum")
      .orderBy("source")
  }

  /** Training-mixture construction: src0 upsampled 2.5 epochs, src1
    * downsampled to a quarter, src2 excluded, everything else one
    * epoch ([[graft.sampling.Sampling.mixture]]). The multiset id
    * checksum pins exactly WHICH rows each fractional epoch drew.
    */
  private def sourceMixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val agg = graft.sampling.Sampling
      .mixture(d, "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0))
      .groupBy("source")
      .agg(count(lit(1)).as("n_emitted"),
        round(sum(col("doc_id").cast("double")), 1).as("emitted_id_sum"))
    d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(agg, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_emitted"), lit(0L)).as("n_emitted"),
        coalesce(col("emitted_id_sum"), lit(0.0)).as("emitted_id_sum"))
      .orderBy("source")
  }

  /** Vocabulary coverage curve for tokenizer-training prep: top-25
    * words with cumulative corpus-token coverage
    * ([[TextAnalysis.vocabCoverage]]).
    */
  private def vocabCoverageTop(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(docs(s, dir), "text", k = 25)
      .orderBy("rank")

  /** Leakage-aware train/val/test split: near-dup clusters (MinHash-
    * LSH verified pairs → connected components) share one split
    * assignment, so a near-copy of a training document can never leak
    * into val/test — the contamination hazard per-id hash splits
    * (q41) leave open. Composition of q24's pair finder, q31's
    * component labeler, and q41's split hash.
    */
  private def clusterSplit(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select("id_a", "id_b")
    val (labels, _) = graft.dedup.ConnectedComponents
      .componentsAuto(pairs, "id_a", "id_b")
    graft.sampling.Sampling
      .splitByCluster(d, "doc_id", labels, "id", "component",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "csplit")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        round(sum(col("doc_id").cast("double")), 1).as("id_sum"))
      .orderBy("split")
  }

  /** Sub-document duplicate-window signal: fraction of each document's
    * non-overlapping 8-token spans that also occur verbatim in another
    * document ([[Dedup.duplicateChunkFraction]]) — the span-granular
    * boilerplate detector whole-document dedup cannot see.
    */
  private def dupChunkFraction(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateChunkFraction(docs(s, dir), "doc_id", "text",
        window = 8)
      .orderBy("doc_id")

  /** End-to-end training-data composition — the full curation chain
    * as ONE lazy plan: exact dedup (q22's fingerprint semantics) +
    * near-dup removal (q24's MinHash-LSH pairs → q31's connected
    * components, one survivor per cluster), then mixture weighting
    * (q68's epoch semantics: src0×2.5, src1×0.25, src2 dropped), then
    * token-budget shard packing (q59's concat-then-chunk layout) over
    * the (doc, epoch) sequence. Proves the sampling/packing surface
    * composes with the dedup surface without plan blowup: no
    * cartesian product, the only unbounded window is the packing
    * stitch's per-bucket rows (spec-pinned).
    *
    * Tokenization runs ONCE per surviving document, BEFORE the
    * mixture explode — an upsampled epoch copy re-tokenizing the text
    * would multiply the scan's CPU by the mixture weight for no
    * information.
    */
  private def trainingShards(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val exact = Dedup.exactDedupSemi(d, "doc_id", "text")
    val drops = graft.dedup.CorpusPipeline.nearDupDropIds(
      d, "doc_id", "text", n = 3, numHashes = 16, bands = 4,
      threshold = 0.8)
    // drop list is data-dependent — AQE chooses the join strategy
    val deduped = exact.join(drops, Seq("doc_id"), "left_anti")
    val slim = deduped.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("tokens"))
    val mixed = graft.sampling.Sampling.mixture(slim, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0))
    // (doc, epoch) → one packing sequence id; epochs < 8 by weight cap
    val seqd = mixed.withColumn("seq_id",
      col("doc_id") * lit(8L) + col("epoch"))
    graft.sampling.Packing.packIntoShards(seqd, "seq_id", "tokens",
        budget = 5000, bucketWidth = 2048)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).cast("long").as("shard_tokens"),
        min(col("seq_id")).as("first_seq"),
        max(col("seq_id")).as("last_seq"))
      .orderBy("shard")
  }

  /** SemDeDup-style semantic dedup over the embedding corpus, nlist
    * sized by the √n rule ([[Similarity.sqrtNlist]] — one count, so
    * Σ(bucket²) stays O(n^1.5) at any sf instead of degrading as a
    * fixed nlist's buckets grow): within each fixed-hash centroid
    * bucket, drop vectors with a lower-id ≥-threshold cosine neighbor
    * ([[Similarity.semanticDedup]]). Per-bucket kept/dropped census;
    * the oracle recomputes the same √n in SQL.
    */
  private def semanticDedupCensus(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.45, nlist = Similarity.sqrtNlist(e.count()))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dropped"), 1).otherwise(0)).cast("long")
          .as("n_dropped"))
      .orderBy("centroid_id")
  }

  /** Compressibility quality signal gated in-query (the q46 pattern:
    * the oracle states the invariants as constants, so the compare
    * fails if the deflate path ever produces an out-of-bounds ratio or
    * loses the doubling-compresses property on ANY document).
    */
  private def compressQuality(s: SparkSession, dir: String): DataFrame = {
    // null/empty-text docs have no deflate ratio (null) — exclude them
    // symmetrically on both sides so the invariant gate tests the
    // deflate signal, not corpus hygiene
    val d = docs(s, dir).where(col("text").isNotNull && length(col("text")) > 0)
    val single = graft.text.Compressibility
      .deflateRatio(d, "doc_id", "text")
      .select(col("id"), col("ratio").as("r1"))
    val doubled = graft.text.Compressibility
      .deflateRatio(
        d.select(col("doc_id"),
          concat(col("text"), col("text")).as("text")),
        "doc_id", "text")
      .select(col("id"), col("ratio").as("r2"))
    single.join(doubled, "id")
      .agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) === sum((col("r1") > 0 && col("r1") <= 1.2)
          .cast("int"))).cast("int").as("all_ratios_bounded"),
        (count(lit(1)) === sum((col("r2") < col("r1"))
          .cast("int"))).cast("int").as("all_doubling_compresses"))
  }

  /** Incremental-ingest dedup: a simulated new batch (80% of docs)
    * deduped against the standing corpus (20%) — the daily-append
    * workflow; the corpus side reduces to distinct fingerprints before
    * the anti-join.
    */
  private def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.dedupAgainst(
        d.where(col("doc_id") % 5 === 0),
        d.where(col("doc_id") % 5 =!= 0),
        "text", "doc_id")
      .agg(count(lit(1)).as("n_new"),
        round(sum(col("doc_id").cast("double")), 1).as("id_sum"))
  }

  /** Incremental dedup through the Bloom prefilter
    * ([[Dedup.dedupAgainstBloom]]): result-identical to q51's
    * anti-join form (the filter has no false negatives; positives are
    * exactly verified), so the oracle is the plain SQL anti-join —
    * what the query proves is that the scan-only-history path returns
    * the same answer. The filter is built in one distributed pass
    * sized to the history count and would be REUSED across batches in
    * the incremental-ingest loop.
    */
  private def bloomIncrementalDedup(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val corpus = d.where(col("doc_id") % 3 === 0)
    val batch = d.where(col("doc_id") % 3 =!= 0)
    val bloom = Dedup.buildFingerprintBloom(
      corpus, "text",
      expectedItems = math.max(1L, corpus.count()), fpp = 0.01)
    Dedup.dedupAgainstBloom(corpus, batch, "text", "doc_id", bloom)
      .agg(count(lit(1)).as("n_new"),
        round(sum(col("doc_id").cast("double")), 1).as("id_sum"))
  }

  /** SCD type-2 history derived from a change stream: each customer's
    * order-priority observations (orders, ordered by date with orderkey
    * tie-break) collapse into versioned rows with valid_from/valid_to/
    * is_current — the warehouse dimension-history shape, derived with
    * ONE exchange on the key (change-detect lag, version filter, lead
    * and version numbering all reuse it).
    */
  private def customerPriorityScd2(
      s: SparkSession, dir: String): DataFrame = {
    import graft.transform.StarSchemaBuilder
    StarSchemaBuilder.scd2Versions(
        t(s, dir, "orders")
          .select("o_custkey", "o_orderpriority", "o_orderdate",
            "o_orderkey"),
        keyCols = Seq("o_custkey"),
        attrCols = Seq("o_orderpriority"),
        orderCol = "o_orderdate",
        tieBreak = Seq("o_orderkey"))
      .select(
        col("o_custkey"),
        col("version_n"),
        col("o_orderpriority").as("priority"),
        Fx.dateKey(col("valid_from")).as("valid_from_key"),
        Fx.dateKey(col("valid_to")).as("valid_to_key"),
        col("is_current").cast("int").as("is_current"))
      .orderBy("o_custkey", "version_n")
  }

  /** Edit-distance fuzzy self-join over distinct part names —
    * symmetric-delete (SymSpell) signature blocking + exact
    * `levenshtein(_,_,threshold)` verify. The cross join never exists
    * in the plan (spec-asserted); candidates are an equi-join on
    * deletion signatures, complete by the symmetric-delete property,
    * so the result is identical to the nested-loop join the oracle
    * runs.
    */
  private def fuzzyPartNames(s: SparkSession, dir: String): DataFrame =
    Analytics.fuzzySelfJoin(t(s, dir, "part"), "p_name", maxDist = 2)
      .orderBy("value_a", "value_b")

  /** Exact heavy-hitter tokens (> 3.2% of corpus token mass) via the
    * two-phase Misra–Gries candidate + exact-verify operator — the
    * full `groupBy(token).count()` never runs; the sketch pass carries
    * ≤ k counters per partition and the verify groups only
    * candidate-matching rows.
    */
  private def heavyHitterTokens(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    Analytics.heavyHitters(
        docs(s, dir).select(
          explode(TextAnalysis.words(col("text"))).as("w")),
        "w", minFraction = 0.032)
      .orderBy("value")
  }

  /** Rank-normalization window functions (percent_rank / cume_dist)
    * per market segment — the top-decile customers by within-segment
    * balance percentile.
    */
  private def acctbalPercentRanks(
      s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .where(col("pct_rank") >= 0.99)
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Custom GROUPING SETS — two independent reporting dimensions
    * (priority totals and month totals) in ONE scan and one shuffle,
    * the shape neither ROLLUP nor CUBE expresses (no combined cells,
    * no grand total).
    */
  private def orderGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    s.sql("""
      SELECT o_orderpriority,
        date_format(o_orderdate, 'yyyy-MM') AS month,
        CAST(grouping_id() AS INT) AS gid,
        count(*) AS n,
        round(sum(o_totalprice), 2) AS total
      FROM __orders_gs
      GROUP BY GROUPING SETS ((o_orderpriority),
        (date_format(o_orderdate, 'yyyy-MM')))
      ORDER BY gid, o_orderpriority, month""")
  }

  /** Classifier evaluation over the language-ID heuristic: per-language
    * precision / recall / F1 against the metadata label — one
    * confusion-matrix aggregation (the q20 table) plus cell-sized
    * arithmetic; the evaluation-report shape any corpus-labeling model
    * needs.
    */
  private def langIdMetrics(s: SparkSession, dir: String): DataFrame = {
    val p = TextAnalysis.langIdStaged(docs(s, dir), "text")
      .select(col("lang"), col("predicted"))
      .transform(graft.core.CacheScope.disk)
    val actual = p.groupBy(col("lang").as("language"))
      .agg(count(lit(1)).as("n_actual"))
    val predicted = p.groupBy(col("predicted").as("language"))
      .agg(count(lit(1)).as("n_predicted"))
    val correct = p.where(col("lang") === col("predicted"))
      .groupBy(col("lang").as("language"))
      .agg(count(lit(1)).as("n_correct"))
    val prec = col("n_correct").cast("double") /
      nullif(col("n_predicted").cast("double"), lit(0.0))
    val rec = col("n_correct").cast("double") /
      nullif(col("n_actual").cast("double"), lit(0.0))
    actual
      .join(predicted, Seq("language"), "full_outer")
      .join(correct, Seq("language"), "left")
      .select(col("language"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .withColumn("precision", round(prec, 6))
      .withColumn("recall", round(rec, 6))
      .withColumn("f1",
        round(lit(2.0) * prec * rec / nullif(prec + rec, lit(0.0)), 6))
      .orderBy("language")
  }

  /** Relationship-cardinality audit: the fan-out histogram of
    * lineitems per order (including zero-fan-out orders via the left
    * join) — the data-modeling check that a claimed 1:N relationship
    * actually holds and how N distributes.
    */
  private def orderFanoutHistogram(
      s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders").select(col("o_orderkey"))
      .join(
        t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("__n")),
        col("o_orderkey") === col("l_orderkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("fanout"))
    per.groupBy("fanout").agg(count(lit(1)).as("n_orders"))
      .orderBy("fanout")
  }

  /** Inter-arrival latency per event type: exact p50/p95 of the gap
    * (seconds) between consecutive same-type events — one window on
    * the type key feeding one percentile aggregation.
    */
  private def eventInterArrival(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("__t").asc, col("event_id").asc)
    events(s, dir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("__t"))
      .withColumn("__gap",
        (col("__t") - lag(col("__t"), 1).over(w)).cast("double") / 1e6)
      .where(col("__gap").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(percentile(col("__gap"), lit(0.5)), 4).as("p50_sec"),
        round(percentile(col("__gap"), lit(0.95)), 4).as("p95_sec"))
      .orderBy("event_type")
  }

  /** One-scan numeric table profile over lineitem's measure columns —
    * the "describe" report: every statistic for every column computed
    * in a single aggregation, per-column rows exploded from the one
    * result row.
    */
  private def lineitemProfile(s: SparkSession, dir: String): DataFrame =
    Analytics.numericProfile(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("column_name")

  /** CDC change-feed application over a deterministic change set:
    * snapshot (keys not divisible by 3) + updates (every 5th key
    * repriced), inserts (3·11 multiples), and deletes (every 7th key,
    * winning same-instant ties) — materialized current state
    * summarized. One max_by aggregation on the key, no window sort.
    */
  private def cdcApplySummary(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    val snapshot = o.where(col("o_orderkey") % 3 =!= 0)
    val updates = o.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") * 1.2, 2))
      .withColumn("op", lit("U")).withColumn("ord", lit(1))
    // inserts land at ord=0: their keys (3·11 multiples) are disjoint
    // from the snapshot (keys % 3 ≠ 0), and a 5-divisible insert is
    // then deterministically repriced by its ord=1 update
    val inserts = o
      .where(col("o_orderkey") % 3 === 0 && col("o_orderkey") % 11 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") + 1000.0, 2))
      .withColumn("op", lit("I")).withColumn("ord", lit(0))
    val deletes = o.where(col("o_orderkey") % 7 === 0)
      .withColumn("op", lit("D")).withColumn("ord", lit(2))
    val changes = updates.unionByName(inserts).unionByName(deletes)
    Analytics.applyChanges(snapshot, changes, Seq("o_orderkey"),
        "op", "ord", baseOrd = lit(0))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("o_totalprice"), 1).as("price_sum"),
        round(sum(col("o_orderkey").cast("double")), 1).as("key_sum"))
  }

  /** Distribution-drift monitor: PSI of order prices between two
    * deterministic snapshot halves over baseline-decile bins —
    * per-bin populations, smoothed shares, and PSI contributions.
    */
  private def priceDriftPsi(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Drift
    val o = t(s, dir, "orders")
    Drift.psiBins(
        o.where(col("o_orderkey") % 2 === 1),
        o.where(col("o_orderkey") % 2 === 0),
        "o_totalprice", bins = 10, exact = true)
      .orderBy("bin")
  }

  /** Per-priority price trend: OLS slope/intercept of total price over
    * order date (epoch days) — one co-moment aggregation pass per
    * group, no per-group iteration.
    */
  private def priceTrendByPriority(
      s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("double").as("__x"))
      .groupBy("o_orderpriority")
      .agg(
        round(regr_slope(col("o_totalprice"), col("__x")), 6)
          .as("slope"),
        round(regr_intercept(col("o_totalprice"), col("__x")), 4)
          .as("intercept"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Most-characteristic keyword per document (argmax tf-idf via
    * `min_by` over a composite ordering struct — partial+final agg,
    * no per-document window sort) histogrammed over the corpus.
    */
  private def topKeywordHistogram(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TfIdf
    TfIdf.tfidf(docs(s, dir), "doc_id", "text")
      .withColumn("__r", round(col("tfidf"), 4))
      .groupBy("doc_id")
      .agg(min_by(col("token"),
        struct((-col("__r")).as("s"), col("token").as("t")))
        .as("keyword"))
      .groupBy("keyword")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("keyword")
  }

  /** χ² independence test: is event type independent of day-of-week?
    * One corpus-touching contingency count; everything downstream is
    * cell-sized.
    */
  private def eventTypeWeekdayChi2(
      s: SparkSession, dir: String): DataFrame =
    Analytics.chiSquare(
      events(s, dir).select(col("event_type"),
        dayofweek(col("ts")).as("dow")),
      "event_type", "dow")

  /** Pearson correlation matrix over lineitem measures — single
    * aggregation pass, three co-moment pairs at once.
    */
  private def lineitemCorrMatrix(
      s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 6)
        .as("corr_qty_price"),
      round(corr(col("l_quantity"), col("l_discount")), 6)
        .as("corr_qty_disc"),
      round(corr(col("l_extendedprice"), col("l_discount")), 6)
        .as("corr_price_disc"),
      count(lit(1)).as("n"))

  /** Peak 1-hour activity per user: a RANGE window over event-time
    * micros (each row averages that user's events in the trailing
    * hour) rolled up to the user's peak — burst detection with one
    * exchange on the user key.
    */
  private def peakHourlyActivity(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("__t"))
      .rangeBetween(-hourUs, 0)
    events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("__t"),
        col("value"))
      .withColumn("__ravg", round(avg(col("value")).over(w), 6))
      .withColumn("__rn", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(max(col("__ravg")).as("peak_avg_value"),
        max(col("__rn")).as("peak_events_1h"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Gini concentration of customer balances per market segment —
    * rank-weighted sum identity G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)
    * with deterministic rank ties. Ranks come from the range-
    * partitioned two-pass form ([[Analytics.rankByRange]]) instead of
    * a per-segment window sort, so no task is ever segment-sized.
    */
  private def acctbalGini(s: SparkSession, dir: String): DataFrame = {
    Analytics.rankByRange(
        t(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")),
        Seq("c_mktsegment"),
        Seq(col("c_acctbal").asc, col("c_custkey").asc),
        rankCol = "__rn")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal")).as("__sx"),
        sum(col("__rn").cast("double") * col("c_acctbal")).as("__six"))
      .select(col("c_mktsegment"), col("n"),
        round((lit(2.0) * col("__six") -
          (col("n") + 1).cast("double") * col("__sx")) /
          (col("n").cast("double") * col("__sx")), 6).as("gini"))
      .orderBy("c_mktsegment")
  }

  /** Hybrid-retrieval fusion: reciprocal-rank fusion of the cosine
    * ANN ranking with a recency ranking over the same candidate set —
    * exact-reproducible integer-rank arithmetic, no corpus rescan in
    * the fusion itself.
    */
  private def hybridRankFusion(s: SparkSession, dir: String): DataFrame = {
    val cos = Similarity.bruteForceTopK(
        emb(s, dir).where(col("vec_id") < 10), emb(s, dir),
        "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .transform(graft.core.CacheScope.disk)
    val wRec = Window.partitionBy(col("query_id"))
      .orderBy(col("neighbor_id").desc)
    val rec = cos.select(col("query_id"), col("neighbor_id"))
      .withColumn("rank", row_number().over(wRec).cast("int"))
    Similarity.rrfFuse(Seq(cos, rec), "query_id", "neighbor_id",
        "rank", k = 60, topN = 5)
      .orderBy("query_id", "fused_rank")
  }

  /** Event-type transition matrix: for each user's time-ordered event
    * stream, count (previous type → type) transitions and normalize to
    * row-stochastic probabilities — the first-order Markov view of user
    * behavior. One window on the user key (lag), one grouped count,
    * one tiny per-prev normalization join.
    */
  private def eventTransitionMatrix(
      s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type")
      .agg(sum("n").as("__tot"))
    pairs.join(totals, Seq("prev_type"))
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("p"))
      .orderBy("prev_type", "next_type")
  }

  /** Daily cohort retention: users grouped by their first-activity day
    * (cohort), counted distinct on each later day offset 0..7 — the
    * activation/retention curve. The cohort assignment is one window
    * min per user; the rest is a grouped distinct count.
    */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val e = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort", min(col("day")).over(w))
    e.withColumn("offset",
        datediff(col("day"), col("cohort")).cast("int"))
      .where(col("offset") <= 7)
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  /** Dedup audit: size histogram of the verified near-dup clusters
    * (MinHash-LSH candidates → exact-Jaccard verify → connected
    * components). `removable` is the doc count near-dup removal would
    * drop — the "how much redundancy is in this corpus" report run
    * before committing to a dedup pass.
    */
  private def nearDupClusterHistogram(
      s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.{ConnectedComponents, Dedup}
    val pairs = Dedup.minhashLshPairs(
      docs(s, dir), "doc_id", "text", 3, 16, 4, 0.8)
    val labels = ConnectedComponents
      .componentsAuto(pairs, "id_a", "id_b")._1
    labels.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(
        col("cluster_size"),
        col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("docs_in_clusters"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("removable"))
      .orderBy("cluster_size")
  }

  /** Snapshot reconciliation over two deterministic order snapshots:
    * "yesterday" misses every 7th key, "today" reprices every 5th —
    * the diff classifies each key as added/removed/changed/unchanged
    * shuffling only (key, digest), never the wide row.
    */
  private def orderSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val yesterday = o.where(col("o_orderkey") % 7 =!= 0)
    val today = o.where(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0,
          round(col("o_totalprice") * 1.1, 2))
          .otherwise(col("o_totalprice")))
    Analytics.tableDiff(yesterday, today, Seq("o_orderkey"),
        Seq("o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_orderkey").cast("double")), 1).as("key_sum"))
      .orderBy("status")
  }

  /** Time-weighted average event value per user — each value weighted
    * by how long it was current (exact microsecond durations, last
    * observation unweighted). Top 50 users by TWA.
    */
  private def userTimeWeightedValue(
      s: SparkSession, dir: String): DataFrame =
    Analytics.timeWeightedAvg(events(s, dir), "user_id", "ts", "value",
        tieBreak = Seq("event_id"))
      .select(col("user_id"), col("n_intervals"),
        round(col("twa"), 4).as("twa"))
      .orderBy(col("twa").desc, col("user_id").asc)
      .limit(50)

  /** Ordered funnel over the event stream: view → click → purchase per
    * user, each step counting only strictly after the previous step's
    * reach time. One exchange + one sort serve all three step windows
    * and the final per-user rollup.
    */
  private def eventFunnel(s: SparkSession, dir: String): DataFrame =
    Analytics.funnelCounts(events(s, dir), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("step_n")

  /** Logistic quality-classifier scoring — σ(w·x + b) over the fixed
    * declarative feature vector (log-tokens, punct ratio, stopword
    * ratio, mean word length): the "fastText-style quality filter"
    * stage as pure map-only column arithmetic in whole-stage codegen.
    */
  private def qualityModelScores(s: SparkSession, dir: String): DataFrame = {
    import graft.text.QualityModel
    val w = QualityModel.Weights(Map(
      "log_tokens" -> 0.9, "punct_ratio" -> -8.0,
      "stop_ratio" -> 2.5, "mean_word_len" -> 0.15), bias = -4.0)
    docs(s, dir)
      .select(col("doc_id"),
        round(QualityModel.score(col("text"), w), 6).as("score"))
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .orderBy("doc_id")
  }

  /** Per-language adaptive quality floor: each language keeps docs at
    * or above its OWN p10 quality cutoff (exact interpolated
    * percentile), so low-resource languages aren't filtered by a
    * high-resource language's score distribution. Reports the kept
    * population per language.
    */
  private def adaptiveQualityFloorByLang(
      s: SparkSession, dir: String): DataFrame = {
    import graft.text.QualityModel
    val scored = docs(s, dir).select(
      col("doc_id"), col("lang"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
    QualityModel.adaptiveQualityFloor(scored, "lang", "q", 0.1,
        exact = true)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_kept"),
        round(min("q"), 6).as("min_kept"),
        round(avg("q"), 4).as("avg_kept"),
        round(max("cutoff"), 6).as("cutoff"))
      .orderBy("lang")
  }

  /** Z-order (Morton) layout key over (customer, order date): the 100
    * orders lowest on the Z-curve, bit-exact against the oracle's
    * arithmetic reconstruction of the interleave. The key is the
    * codegen'd `graft_zorder` expression that
    * [[Analytics.clusterByZOrder]] range-partitions by for
    * two-dimensional zone-map pruning.
    */
  private def zorderOrderKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        Fx.dateKey(col("o_orderdate")).as("odate_key"),
        Analytics.zorderKey(
          col("o_custkey"), Fx.dateKey(col("o_orderdate"))).as("zkey"))
      .orderBy("zkey", "o_orderkey")
      .limit(100)

  /** Z-ordered compaction end-to-end ([[graft.transform.Compaction
    * .compactZOrdered]]): land a deliberately-fragmented copy of
    * orders (16 small files), rewrite it with merge + Z-order
    * clustering in ONE range exchange, and report row-fidelity
    * aggregates over the REWRITTEN table — the oracle computes them
    * from the source rows, so any row the swap machinery loses or
    * duplicates hash-mismatches. The zkey checksum is summed mod a
    * prime (order-independent, overflow-free at any sf); file counts
    * and the single-exchange plan are spec-anchored (CompactionSpec).
    */
  private def compactZOrderFidelity(
      s: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files
      .createTempDirectory("graft_q104").toString + "/orders"
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        Fx.dateKey(col("o_orderdate")).as("odate_key"),
        col("o_totalprice"))
      .repartition(16)
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(work)
    graft.transform.Compaction.compactZOrdered(
      s, work, "o_custkey", "odate_key", targetFileBytes = 1L << 30)
    s.read.parquet(work)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        round(sum("o_totalprice"), 2).as("price_sum"),
        sum(Analytics.zorderKey(col("o_custkey"), col("odate_key"))
          % 1000003L).as("zkey_checksum"))
  }

  /** Embedding-distribution drift between labels: per-label mean
    * embedding (posexplode + partial-agg vector mean, rounded for
    * cross-engine reproducibility) then pairwise cosine over the tiny
    * centroid table — "are two sources' embedding distributions
    * converging?" at one corpus scan.
    */
  private def labelCentroidDrift(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidDrift(emb(s, dir), "label", "embedding")
      .orderBy("group_a", "group_b")

  /** Supplier account balances rolled up the geography dimension chain
    * (supplier ⋈ nation ⋈ region, both dims broadcast).
    */
  private def supplierBalanceByRegion(
      s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum("s_acctbal"), 2).as("total_balance"),
        round(avg("s_acctbal"), 4).as("avg_balance"))
      .orderBy("r_name")

  /** Wide-format pivot: events per day × event type (the pandas
    * `pivot_table` shape). Explicit pivot values keep the plan a
    * single pass (no distinct-values pre-query).
    */
  private def eventTypePivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")
  }

  /** ROLLUP hierarchy totals (region → nation) with grouping_id —
    * the drill-down twin of q32's CUBE.
    */
  private def supplierRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "s_acctbal")
      // Column args, not String varargs: rollup("r_name", ...) over a
      // joined lineage trips Spark 4.1's ambiguous-self-join detector
      // (string-name resolution through Expand); rollup(col(...), ...)
      // resolves cleanly
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_suppliers"),
        round(sum("s_acctbal"), 2).as("total_balance"))
      .orderBy(asc_nulls_last("r_name"), asc_nulls_last("n_name"))

  /** Per-group z-score outlier detection (anomaly surface for data
    * quality): orders whose totalprice sits ≥ 1.5 sample standard
    * deviations from their priority's mean (the price distribution is
    * near-uniform — bounded tails, max |z| ≈ 1.77 — so 1.5σ is the
    * meaningful tail cut). Stats come from one
    * aggregation broadcast back onto the rows — no window over the
    * fact table.
    */
  private def priceOutliers(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val stats = orders.groupBy("o_orderpriority")
      .agg(avg("o_totalprice").as("__mu"),
        stddev_samp(col("o_totalprice")).as("__sd"))
    // rounded z before the cut: summation-order ULP noise in mu/sd
    // must not flip boundary rows between engines
    orders.join(broadcast(stats), Seq("o_orderpriority"))
      .where(round(abs(col("o_totalprice") - col("__mu")) / col("__sd"), 4)
        >= lit(1.5))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_outliers"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy("o_orderpriority")
  }

  /** Top-3 orders per priority via the bounded-heap aggregate — the
    * general grouped-top-k shape (shuffle carries 3 rows per
    * (priority, partition), never the order set), oracle-checked
    * against row_number ranking.
    */
  private def topOrdersPerPriority(s: SparkSession, dir: String): DataFrame = {
    val topk = graft.expressions.TopKByScore.topK(3)
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("__top"))
      .select(col("o_orderpriority"),
        posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col("o_orderpriority"),
        col("__e.id").as("o_orderkey"),
        round(col("__e.score"), 2).as("o_totalprice"),
        (col("__i") + 1).cast("int").as("rank"))
      .orderBy("o_orderpriority", "rank")
  }

  /** Decile bucketing per market segment (the feature-transform shape
    * for rank-normalizing a signal before training) — via the
    * range-partitioned two-pass `ntile` ([[Analytics.ntileByRange]]):
    * the plain `ntile` window runs ONE sort task per segment (5
    * segments = 5 tasks at any cluster size); the two-pass form
    * spreads each segment across range slices and reassembles exact
    * Spark `ntile` buckets from slice-local ranks + offsets.
    */
  private def acctbalDeciles(s: SparkSession, dir: String): DataFrame = {
    Analytics.ntileByRange(
        t(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")),
        Seq("c_mktsegment"),
        Seq(col("c_acctbal").asc, col("c_custkey").asc),
        k = 10, bucketCol = "decile")
      .groupBy("c_mktsegment", "decile")
      .agg(count(lit(1)).as("n"),
        round(min("c_acctbal"), 2).as("lo"),
        round(max("c_acctbal"), 2).as("hi"))
      .orderBy("c_mktsegment", "decile")
  }

  /** Top-3 TF-IDF terms for the first five documents (ranked on the
    * ROUNDED score with token tie-break so both engines agree on
    * borderline ordering); document frequencies come from the FULL
    * corpus, only the ranked output is filtered.
    */
  private def topTfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.text.TfIdf.tfidf(docs(s, dir), "doc_id", "text")
      .withColumn("tfidf", round(col("tfidf"), 4))
      .where(col("doc_id") < 5)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("token"), col("tfidf"),
        col("rank").cast("int").as("rank"))
      .orderBy("doc_id", "rank")
  }

  /** Capstone: composed training-corpus preparation — exact dedup →
    * MinHash-LSH near-dup removal → quality floor → language tagging —
    * summarized per predicted language.
    */
  private def corpusPrep(s: SparkSession, dir: String): DataFrame =
    graft.dedup.CorpusPipeline
      .prepareTrainingCorpus(docs(s, dir), "doc_id", "text",
        minQuality = 0.3)
      .groupBy("predicted")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("predicted")

  /** CUBE faceting with grouping_id — multi-dimensional rollup beyond
    * the reference's flat facet counts (free at scale: one shuffle,
    * partial aggregation per grouping set).
    */
  private def orderCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderpriority", "o_orderstatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("gid", "o_orderpriority", "o_orderstatus")

  /** As-of join: each purchase event picks up the user's latest
    * strictly-prior event (any type) — union+window, one shuffle.
    */
  private def asofPriorEvent(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"),
        round(col("value"), 2).as("value"))
    Analytics.asofJoin(
        purchases, e.select("user_id", "ts", "event_id", "event_type"),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        rightCols = Seq("event_id", "event_type"), strict = true)
      .select(col("event_id"), col("user_id"), col("value"),
        col("asof_event_id"), col("asof_event_type"))
      .orderBy("event_id")
  }

  /** Batch session windows over events (30-min inactivity gap) — the
    * batch twin of [[graft.streaming.EventStreams.sessionize]].
    */
  private def eventSessions(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Sliding-window event rates (1 h window, 15 min slide) — batch twin
    * of [[graft.streaming.EventStreams.slidingCounts]]. Each event lands
    * in 4 overlapping windows (explicit row multiplication, epoch-
    * aligned starts).
    */
  private def eventsSliding(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Running totals + lag over a window frame — per-customer order
    * history with running revenue.
    */
  private def customerRunningTotals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        Fx.dateKey(col("o_orderdate")).as("order_date_key"),
        round(sum("o_totalprice").over(cum), 2).as("running_total"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        row_number().over(w).as("order_seq"))
      .orderBy("o_custkey", "order_seq")
  }

  /** Exact interpolated percentiles per market segment — exact mode
    * for oracle value-equality; [[Analytics.percentiles]] with
    * `approx = true` is the documented 100 TB mode (sketch-based,
    * decomposable).
    */
  private def acctbalPercentiles(s: SparkSession, dir: String): DataFrame =
    Analytics.percentiles(
        t(s, dir, "customer"), Seq("c_mktsegment"), col("c_acctbal"),
        Seq(0.25, 0.5, 0.75))
      .select(
        col("c_mktsegment"),
        round(col("p25"), 4).as("p25"),
        round(col("p50"), 4).as("p50"),
        round(col("p75"), 4).as("p75"),
        col("n"))
      .orderBy("c_mktsegment")

  /** Multimodal plumbing over binary payloads (text bytes here; the
    * same path carries image/audio blobs).
    */
  private def binaryFingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
      .select(
        col("doc_id"),
        Multimodal.sniffMime(col("bin")).as("mime"),
        length(col("bin")).cast("long").as("byte_len"),
        md5(col("bin")).as("fingerprint"),
        Multimodal.chunkCount(col("bin"), 256).as("n_chunks"))
      .orderBy("doc_id")

  /** Multimodal header decode, end-to-end through real bytes: PNG
    * headers are BUILT from doc_id formulas as pure column expressions
    * (hex-assemble + unhex), then DECODED back by
    * [[Multimodal.imageHeaderMeta]] — also pure expressions, all
    * whole-stage codegen. The oracle computes the same formulas
    * directly, so any encode OR decode bug breaks the hash match.
    */
  private def pngHeaderDecode(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val w = (id % 64 + 16).cast("long")
    val h = (id % 48 + 8).cast("long")
    val colorType = when(id % 3 === 0, 0)
      .when(id % 3 === 1, 2).otherwise(6)
    val headerHex = concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"), // sig + IHDR
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      lit("08"), lpad(hex(colorType), 2, "0"), lit("000000"))
    docs(s, dir)
      .select(id, Multimodal.imageHeaderMeta(unhex(headerHex)).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.bit_depth").as("bit_depth"),
        col("m.channels").as("channels"))
      .orderBy("doc_id")
  }

  /** REAL codec roundtrip at table scale: synthesize a PNG per doc_id
    * (JDK encoder), decode it back with the batched pixel decoder, and
    * emit dims + mean channel stats. The synthetic pixels are
    * closed-form in (x, y, seed), so the oracle reconstructs the
    * channel means analytically (the q47 square-wave treatment) — no
    * image codec needed on the DuckDB side.
    */
  private def imagePixelStats(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.synthesizeTestImages(
      docs(s, dir).select("doc_id"), "doc_id")
    Multimodal.decodeImageFeatures(imgs, "id", "png", grid = 2)
      .select(col("id").as("doc_id"),
        col("width"), col("height"),
        round(element_at(col("features"), 5).cast("double"), 4)
          .as("mean_r"),
        round(element_at(col("features"), 6).cast("double"), 4)
          .as("mean_g"),
        round(element_at(col("features"), 7).cast("double"), 4)
          .as("mean_b"))
      .orderBy("doc_id")
  }

  /** Image perceptual near-dup ([[Multimodal.imageDHash]] +
    * [[Dedup.hammingBandedPairs]]): 64-bit dHash over a 9×8
    * integer-pooled luma grid, banded Hamming join at distance ≤ 3 —
    * exact by pigeonhole, so the oracle can score ALL pairs and still
    * match. The multimodal dedup path: re-encoded/resized copies of an
    * image land within a few bits while distinct images scatter.
    * Synthetic TEXTURED images are arithmetic of (x, y, seed) (the q39
    * construction with oscillating formulas), so the whole
    * decode→pool→hash→pair chain replays in SQL with integer
    * exactness (milli-luma sums, cross-multiplied averages); ids
    * agreeing mod 336 are identical images (hamming 0).
    */
  private def imageDHashPairs(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.synthesizeTexturedImages(
      docs(s, dir).select("doc_id"), "doc_id")
    Dedup.hammingBandedPairs(
        Multimodal.imageDHash(imgs, "id", "png"),
        "id", "dhash_hi", "dhash_lo", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding near-dup via hyperplane LSH ([[Similarity.srpSketch]]
    * over int8 codes + [[Dedup.hammingBandedPairs]]): a batch of
    * slightly-perturbed copies (re-encoded embeddings drift) probes
    * the corpus at Hamming ≤ 3 of 64 hyperplane bits — an 8-byte
    * sketch stands in for 64 floats in the blocking join. Candidates
    * are verified with exact cosine on the original vectors. The
    * third fingerprint family (text SimHash, image dHash, embedding
    * SRP) on the shared banded pair machinery.
    */
  private def srpNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val batch = corpus.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), transform(col("v"),
        (x, d) => x + lit(0.01) *
          ((col("vec_id") * 7 + d) % 5 - lit(2)).cast("double")).as("v"))
    val all = corpus.select(col("vec_id").as("id"), col("v"))
      .unionByName(batch.select(
        (col("vec_id") + lit(1000000L)).as("id"), col("v")))
    val sk = Similarity.srpSketch(
      Similarity.quantizeInt8(all, "v"), "id", "v_q", dim = 64)
    Dedup.hammingBandedPairs(sk, "id", "srp_hi", "srp_lo", maxDist = 3)
      .where(col("id_a") < 1000000L && col("id_b") >= 1000000L)
      .select(col("id_a").as("corpus_id"),
        (col("id_b") - 1000000L).as("batch_src"), col("hamming"))
      .join(corpus.select(col("vec_id").as("corpus_id"),
        col("v").as("va")), Seq("corpus_id"))
      .join(batch.select(col("vec_id").as("batch_src"),
        col("v").as("vb")), Seq("batch_src"))
      .select(col("corpus_id"), col("batch_src"), col("hamming"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cos"))
      .orderBy("corpus_id", "batch_src")
  }

  /** Unigram-LM quality scoring ([[TextAnalysis.unigramLmScoreSelf]]):
    * Lidstone-smoothed token log-probabilities trained on the corpus,
    * documents ranked by mean token log-prob — the CCNet-style
    * distributional-typicality signal (its KenLM perplexity, in
    * dependency-free unigram form). Low scorers are the
    * out-of-distribution tail a quality floor cuts.
    */
  private def unigramLmQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLmScoreSelf(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("lm_score"), 4).as("lm_score"))
      .orderBy("doc_id")

  /** Time-series resample + gap fill ([[Analytics.resampleFfill]]):
    * per-user daily grid over the user's own observation span, bucket
    * mean of `value`, empty days forward-filled from the last seen
    * bucket (`filled` marks the carried rows) — the regularization
    * step every rolling-window/trend computation downstream assumes.
    */
  private def resampleDailyValues(
      s: SparkSession, dir: String): DataFrame = {
    // event values are exact 2-decimal; resampling on integer cents
    // keeps the bucket mean a single exact-integer-ratio division —
    // engine-identical doubles, no summation-order rounding boundary
    val ev = events(s, dir)
      .withColumn("__cents", round(col("value") * 100).cast("long"))
    // half-up to 4 decimals in INTEGER space: the cents mean is an
    // exact integer ratio, but decimal round() on an exact-half double
    // diverges across engines (Spark rounds the shortest decimal
    // string, others the binary value); floor(x·100 + 0.5) doesn't
    Analytics.resampleFfill(ev, "user_id", "ts", "__cents",
        stepSec = 86400L)
      .select(col("user_id"), col("bucket_ts"),
        (floor(col("value") * 100 + 0.5).cast("long") / 10000.0)
          .as("value"), col("filled"))
      .orderBy("user_id", "bucket_ts")
  }

  /** Entity resolution ([[Analytics.resolveEntities]]): part records
    * linked through SymSpell-blocked edit-distance ≤ 2 name matches,
    * clustered transitively (connected components over names), each
    * record stamped with its cluster's canonical name and minimum
    * part key — the record-linkage/master-data operator composed from
    * the fuzzy-join and CC machinery.
    */
  private def entityResolution(s: SparkSession, dir: String): DataFrame =
    Analytics.resolveEntities(t(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 2)
      .orderBy("p_partkey")

  /** Incremental embedding dedup ([[Similarity.buildSrpIndex]] +
    * [[Similarity.dedupEmbeddingAgainst]]): the corpus's 8-byte SRP
    * sketches stand as the index; a batch of re-encoded uploads
    * (vec_id % 5 == 0, perturbed lightly for % 10 == 0 — true
    * near-dups — and heavily otherwise — novel) sketches only itself,
    * probes at Hamming ≤ 3, and candidates verify by exact cosine
    * ≥ 0.98. Survivors = novel rows + the LSH-missed tail. The
    * embedding analogue of the q110 band-index ingest shape.
    */
  private def srpDedupIncremental(
      s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val batch = corpus.where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), transform(col("v"),
        (x, d) => x +
          when(col("vec_id") % 10 === 0, lit(0.01)).otherwise(lit(0.3)) *
          ((col("vec_id") * 7 + d) % 5 - lit(2)).cast("double")).as("v"))
    val index = Similarity.buildSrpIndex(corpus, "vec_id", "v", dim = 64)
    Similarity.dedupEmbeddingAgainst(index, corpus, batch,
        "vec_id", "v", dim = 64, maxDist = 3, minCos = 0.98)
      .select(col("vec_id"))
      .orderBy("vec_id")
  }

  /** Quality-survivorship near-dup dedup ([[Dedup.dedupNearKeepBest]]):
    * the q24 LSH clusters, but each cluster keeps its HIGHEST-quality
    * member (min doc_id on ties) instead of the minimum id — among
    * re-posts, keep the cleanest capture. Output: survivors with
    * cluster size and quality.
    */
  private def keepBestNearDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
    Dedup.dedupNearKeepBest(d, "doc_id", "text", "__q",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("doc_id"), col("cluster_size"),
        round(col("__q"), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Linear-interpolation resample ([[Analytics.resampleInterp]]):
    * q125's daily grid, but interior gaps take the line between the
    * surrounding observed buckets — the continuous-signal gap fill.
    * Cents-exact bucket means; the interpolation arithmetic is
    * mirrored op-for-op in the oracle; half-up rounding in integer
    * space as in q125.
    */
  private def resampleInterpDaily(
      s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("__cents", round(col("value") * 100).cast("long"))
    Analytics.resampleInterp(ev, "user_id", "ts", "__cents",
        stepSec = 86400L)
      .select(col("user_id"), col("bucket_ts"),
        (floor(col("value") * 100 + 0.5).cast("long") / 10000.0)
          .as("value"), col("interpolated"))
      .orderBy("user_id", "bucket_ts")
  }

  /** Rolling 1-hour window stats + 3σ anomaly flags per user
    * ([[Analytics.rollingStats]]) over integer cents. Every statistic
    * derives from exact long frame sums by a fixed op sequence, so
    * the oracle replays bit-for-bit; outputs round half-up in integer
    * space as in q125.
    */
  private def rollingAnomalies(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("__cents", round(col("value") * 100).cast("long"))
    Analytics.rollingStats(ev, "user_id", "ts", "__cents",
        windowSec = 3600L, zThreshold = 3.0, minCount = 2)
      .select(col("event_id"), col("user_id"), col("roll_n"),
        (floor(col("roll_mean") * 100 + 0.5).cast("long") / 10000.0)
          .as("roll_mean"),
        (floor(col("roll_std") * 100 + 0.5).cast("long") / 10000.0)
          .as("roll_std"),
        (floor(col("zscore") * 10000 + 0.5).cast("long") / 10000.0)
          .as("zscore"),
        col("is_anomaly"))
      .orderBy("event_id")
  }

  /** Per-user EWMA trend over event values ([[Analytics.ewma]]),
    * α = 1/2 over the last 20 observations on integer cents — the
    * dyadic-exact configuration whose fold the oracle replays through
    * closed-form power weights (every term and partial sum is an
    * exact dyadic rational, so summation order cannot matter).
    * event_id tie-breaks equal timestamps.
    */
  private def ewmaUserTrend(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("__cents", round(col("value") * 100).cast("long"))
    Analytics.ewma(ev, "user_id", "ts", "__cents",
        alpha = 0.5, lags = 20, tieCols = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ewma_n"),
        (floor(col("ewma") * 100 + 0.5).cast("long") / 10000.0)
          .as("ewma"))
      .orderBy("event_id")
  }

  /** Per-customer spend trend ([[Analytics.groupTrend]]): OLS of
    * order totalprice (cents) over order date (epoch days). Sufficient
    * statistics are exact decimal-38 integers mirrored by HUGEINT in
    * the oracle; slope/intercept/r² are fixed double op-sequences over
    * them, rounded half-up in integer space.
    */
  private def customerSpendTrend(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("__day",
        floor(unix_micros(col("o_orderdate").cast("timestamp"))
          / 86400000000L).cast("long"))
      .withColumn("__cents", round(col("o_totalprice") * 100).cast("long"))
    Analytics.groupTrend(o, Seq("o_custkey"), "__day", "__cents")
      .select(col("o_custkey"), col("n"),
        (floor(col("slope") * 10000 + 0.5).cast("long") / 10000.0)
          .as("slope"),
        (floor(col("intercept") * 100 + 0.5).cast("long") / 100.0)
          .as("intercept"),
        (floor(col("r2") * 10000 + 0.5).cast("long") / 10000.0)
          .as("r2"))
      .orderBy("o_custkey")
  }

  /** Intra-document stutter cleanup ([[TextAnalysis.collapseRepeats]]):
    * consecutive repeated tokens collapse to one; the oracle mirrors
    * the keep-predicate with DuckDB's indexed list_filter lambda.
    */
  private def collapseRepeatRuns(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collapseRepeats(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")

  /** Intra-document duplicate-line removal ([[TextAnalysis.dedupLines]])
    * over deterministically derived 4-token lines (the corpus is
    * single-line word soup, so lines are built, not parsed — the
    * 40-ish word vocabulary makes short lines genuinely repeat).
    * Zero-token docs are excluded on both sides ("" splits to one
    * empty line but derives zero lines).
    */
  private def lineDedupDocs(s: SparkSession, dir: String): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val lines = transform(
      sequence(lit(0), (ceil(size(ws) / 4.0) - 1).cast("int")),
      i => array_join(slice(ws, i * 4 + 1, lit(4)), " "))
    val src = t(s, dir, "documents")
      .where(size(ws) > 0)
      .select(col("doc_id"), array_join(lines, "\n").as("text"))
    TextAnalysis.dedupLines(src, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_removed"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Corpus-wide line dedup ([[TextAnalysis.dedupLinesGlobal]]) over
    * the same derived 4-token lines as q134 — a line survives only in
    * the lowest-(doc_id, pos) document that contains it, everywhere
    * else it's boilerplate and drops (the C4/RefinedWeb corpus-level
    * pass; q134 is the within-document variant).
    */
  private def globalLineDedupDocs(s: SparkSession, dir: String): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val lines = transform(
      sequence(lit(0), (ceil(size(ws) / 4.0) - 1).cast("int")),
      i => array_join(slice(ws, i * 4 + 1, lit(4)), " "))
    val src = t(s, dir, "documents")
      .where(size(ws) > 0)
      .select(col("doc_id"), array_join(lines, "\n").as("text"))
    TextAnalysis.dedupLinesGlobal(src, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_removed"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Event-type affinity ([[Analytics.basketAffinity]]): which event
    * types co-occur in the same user's history more than independence
    * predicts. Baskets = users, items = distinct event types; all
    * metrics single divisions of exact long counts.
    */
  private def eventTypeAffinity(s: SparkSession, dir: String): DataFrame =
    Analytics.basketAffinity(events(s, dir), "user_id", "event_type",
        maxBasket = 8)
      .orderBy("item_a", "item_b")

  /** Event-sequence transition matrix
    * ([[Analytics.transitionMatrix]]): for each (from, to) pair of
    * consecutive event types in a user's timeline, the transition
    * count and P(to | from). (ts, event_id) totally orders each
    * user's events; null timestamps drop (their position in the
    * sequence is undefined).
    */
  private def eventTransitions(s: SparkSession, dir: String): DataFrame =
    Analytics.transitionMatrix(
        events(s, dir).where(col("ts").isNotNull),
        "user_id", "event_type",
        Seq(col("ts").asc, col("event_id").asc))
      .orderBy("from_state", "to_state")

  /** Filter-cascade ablation over the corpus quality filters
    * ([[graft.quality.Funnel.filterFunnel]]): the datasheet table
    * answering "what did each filter cost, and which filters are
    * fully shadowed by the rest?" — one scan, one ungrouped
    * aggregate, however many stages. Stages reuse the q18/q19 metric
    * expressions so the cascade audits the filters the pipeline
    * actually runs.
    */
  private def filterFunnelQ(s: SparkSession, dir: String): DataFrame =
    graft.quality.Funnel.filterFunnel(docs(s, dir), Seq(
        "nonempty" -> (col("n_chars") > 0),
        "min_tokens" ->
          (TextAnalysis.tokenCount(col("text")) >= 20),
        "low_punct" ->
          (coalesce(TextAnalysis.punctRatio(col("text")), lit(0.0))
            <= lit(0.1)),
        "stopword_floor" ->
          (coalesce(TextAnalysis.stopwordRatio(col("text")), lit(0.0))
            >= lit(0.05)),
        "quality_score" ->
          (TextAnalysis.qualityScore(col("text")) >= lit(0.5))))
      .orderBy("stage")

  /** Cross-source near-duplication matrix
    * ([[Dedup.crossSourceDupMatrix]]): which corpus sources re-crawl
    * which, measured on the q24 MinHash-LSH verified pairs — the
    * provenance audit run before assigning mixture weights (a source
    * that is 40 % near-duplicated in another double-counts that
    * content at whatever weight it gets).
    */
  private def crossSourceDupMatrixQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceDupMatrix(docs(s, dir), "doc_id", "text", "source")
      .orderBy("src_a", "src_b")

  /** DSIR importance-weighted selection
    * ([[TextAnalysis.dsirSelect]]): hashed-unigram log-likelihood
    * ratios against the English slice as target, then the
    * highest-scoring documents up to a 10k-token budget — the
    * published domain-tilt selection (Xie et al. 2023) as a
    * deterministic top-k. Scores are integer micro-units (exact
    * BIGINT sums), the budget cut is the histogram-pruned
    * [[graft.sampling.Packing.takeUntilBudget]].
    */
  private def dsirSelectionQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirSelect(docs(s, dir), "doc_id", "text",
        col("lang") === "en", tokenBudget = 10000L)
      .orderBy("doc_id")

  /** Fixed-point PageRank over the order graph
    * ([[Analytics.pageRank]]): customers and suppliers as nodes,
    * symmetrized (customer ordered-from supplier) edges, 6 exact
    * integer iterations — which entities sit at the center of the
    * trade network. Every rank is a BIGINT in trillionths, so the
    * result hashes identically on any engine, partitioning, or
    * cluster size.
    */
  private def supplierPagerankQ(s: SparkSession, dir: String): DataFrame = {
    val co = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
    // no .distinct() here: pageRank normalizes (distinct + persist)
    // itself — a caller-side distinct would just add a full shuffle
    // of the raw pair stream before the operator's own
    val edges = co.union(co.select(col("b").as("a"), col("a").as("b")))
    Analytics.pageRank(edges, "a", "b", iters = 6)
      .orderBy("node")
  }

  /** Cluster-merge survivorship ([[Dedup.mergeSurvivorship]]): q128's
    * near-dup clusters, but each collapses to ONE consolidated record
    * carrying the union of the cluster's provenance (sources, langs)
    * and its total token mass next to the kept member — dedup that
    * doesn't lose where content was seen.
    */
  private def mergeSurvivorshipQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
      .withColumn("__tok",
        TextAnalysis.tokenCount(col("text")).cast("long"))
    Dedup.mergeSurvivorship(d, "doc_id", "text", "__q",
        setCols = Seq("source", "lang"), sumCols = Seq("__tok"))
      .select(col("cluster_id"), col("kept_id"), col("n_members"),
        round(col("best_score"), 4).as("best_quality"),
        col("source_set").as("sources"), col("lang_set").as("langs"),
        col("sum___tok").as("total_tokens"))
      .orderBy("cluster_id")
  }

  /** Data-constrained epoch allocation
    * ([[graft.sampling.Sampling.epochAllocation]]): exact-dedup the
    * corpus ([[Dedup.exactDedupSemi]] — the narrow-shuffle form),
    * weigh each source by its survivors' integer milli-quality mass,
    * then water-fill a 40k-token training budget across sources with
    * a 1.5-epoch repetition cap (chosen so BOTH allocator paths run at
    * this corpus size — several sources cap and their freed budget
    * redistributes; production uses the published 4). Every
    * step is BIGINT floor-division — the 3 unrolled rounds replay
    * bit-exact in the oracle.
    */
  private def epochAllocationQ(
      s: SparkSession, dir: String): DataFrame = {
    val sv = Dedup.exactDedupSemi(docs(s, dir), "doc_id", "text")
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
      .withColumn("__tok",
        TextAnalysis.tokenCount(col("text")).cast("long"))
    val per = sv.groupBy("source").agg(
      sum(col("__tok")).as("u"),
      sum(floor(col("__q") * 1000 + 0.5).cast("long")).as("w"))
    graft.sampling.Sampling.epochAllocation(per, "source", "u", "w",
        budget = 40000L, maxEpochsMilli = 1500L, rounds = 3)
      .orderBy("source")
  }

  /** Frequent event trigrams ([[Analytics.frequentSequences]]): the
    * contiguous 3-step behavior patterns shared by at least 3 users —
    * support counted in DISTINCT users, so a bot looping one path
    * counts once. Order within a user is (ts, event_id) — a total
    * order, lag determinism's contract.
    */
  private def eventSequencesQ(s: SparkSession, dir: String): DataFrame =
    Analytics.frequentSequences(events(s, dir), "user_id", "event_type",
        Seq(col("ts").asc, col("event_id").asc), n = 3, minSupport = 3)
      .select(col("step_1"), col("step_2"), col("step_3"),
        col("n_keys"), round(col("support"), 4).as("support"))
      .orderBy(col("n_keys").desc, col("step_1"), col("step_2"),
        col("step_3"))

  /** Uniform negative sampling
    * ([[graft.sampling.Sampling.negativeSample]]): per customer, 5
    * parts they never ordered, drawn by deterministic hash from the
    * part catalog — the contrastive-training negative sampler's
    * uniform (easy-negative) counterpart to q141's hard negatives.
    */
  private def negativeSamplesQ(s: SparkSession, dir: String): DataFrame = {
    val inter = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        Seq("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    graft.sampling.Sampling.negativeSample(inter, "o_custkey",
        "l_partkey", t(s, dir, "part"), "p_partkey", k = 5,
        oversample = 4, salt = "neg")
      .orderBy("o_custkey", "neg_rank")
  }

  /** Greedy k-center diversity selection
    * ([[Similarity.kCenterSelect]]): the 8 maximally-spread embedding
    * vectors by exact integer squared-L2 over int8 codes — the
    * coreset/diversity pass of a data-selection pipeline, every
    * argmax bit-exact across engines.
    */
  private def kcenterSelectQ(s: SparkSession, dir: String): DataFrame =
    Similarity.kCenterSelect(emb(s, dir), "vec_id", "embedding", k = 8)
      .select(col("round"), col("vec_id"), col("d2_at_selection"))
      .orderBy("round")

  /** Calibration (reliability) report
    * ([[graft.text.QualityModel.calibrationReport]]) of the composite
    * quality score against the is-English slice: per decile bin the
    * mean predicted score vs the empirical rate, the gap, and the ECE
    * contribution — integer micro-unit sums keep every emitted double
    * a single exact-long division.
    */
  private def calibrationReportQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("__score", TextAnalysis.qualityScore(col("text")))
    graft.text.QualityModel.calibrationReport(d, "__score",
        col("lang") === "en", bins = 10)
      .select(col("bin"), col("n"), col("n_positive"),
        round(col("mean_score"), 6).as("mean_score"),
        round(col("frac_positive"), 6).as("frac_positive"),
        round(col("ece_contrib"), 6).as("ece_contrib"))
      .orderBy("bin")
  }

  /** Mergeable quantile datasheet
    * ([[graft.quality.Drift.quantileShards]]): per-language p50/p75
    * of per-document token counts, built as 4 independent shard
    * sketches and combined by sketch-union — the percentile row of
    * the maintain-per-append datasheet algebra (q148 covers distincts
    * via HLL; percentiles need a mergeable KLL sketch). At oracle
    * scale every group is in the sketch's exact regime, so each
    * quantile is the exact inclusive order statistic; the ranks are
    * DYADIC (0.5, 0.75 — exact binary doubles), so the rank→index
    * arithmetic agrees bit-for-bit across engines (the q131/q145
    * dyadic-constant argument).
    */
  private def quantileDatasheetQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val shards = graft.quality.Drift.quantileShards(d, Seq("lang"),
      TextAnalysis.tokenCount(col("text")).cast("double"),
      pmod(col("doc_id"), lit(4)), k = 8192)
    graft.quality.Drift.mergeQuantileShards(shards, Seq("lang"),
        Seq(0.5, 0.75), k = 8192)
      .select(col("lang"), col("n"), col("p50"), col("p75"))
      .orderBy("lang")
  }

  /** PII incidence report ([[TextAnalysis.piiIncidence]]) over a
    * deterministically PII-perturbed corpus (the q144 treatment —
    * synthetic tables carry no real PII, so docs at doc_id ≡ 0 mod
    * {7, 11, 13} get an email / SSN / phone appended and the report
    * must locate exactly those): per (source, pii_type) the affected
    * documents, total matches, and affected fraction.
    */
  private def piiIncidenceQ(s: SparkSession, dir: String): DataFrame = {
    val seeded = docs(s, dir).withColumn("text",
      concat(col("text"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          lit(" ssn 123-45-6789")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          lit(" call 555-123-4567")).otherwise(lit(""))))
    TextAnalysis.piiIncidence(seeded, "text", Seq("source"))
      .select(col("source"), col("pii_type"), col("n_docs"),
        col("n_docs_with"), col("n_matches"),
        round(col("doc_frac"), 6).as("doc_frac"))
      .orderBy("source", "pii_type")
  }

  /** Tokenizer fertility report: per language, BPE tokens per word
    * and characters per BPE token under the corpus-trained 8-merge
    * table (q142's trainer + q143's production apply) — the
    * tokenizer-fit audit that decides whether a language needs its
    * own vocabulary budget. Unrounded exact-long divisions.
    */
  private def tokenizerFertilityQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = TextAnalysis.bpeTrainMerges(d, "text", merges = 8)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextAnalysis.bpeTokenCountsFast(d, "doc_id", "text", m)
      .join(d.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("__nc")), Seq("doc_id"))
      .groupBy("lang")
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_tokens_bpe")).as("n_tokens_bpe"),
        sum(col("__nc")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_tokens_bpe"),
        col("n_chars"),
        (col("n_tokens_bpe").cast("double") / col("n_words"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens_bpe"))
          .as("chars_per_token"))
      .orderBy("lang")
  }

  /** Exact per-group KS drift test ([[graft.quality.Drift.ksTest]])
    * on a deterministically perturbed split: odd orderkeys are the
    * baseline, even the current batch with '1-URGENT' prices inflated
    * 5 % (the q162/q144 seeding treatment — the detector must flag
    * exactly that segment while fixed-bin PSI's shape stays put for
    * the rest). `ks_scaled` is the exact BIGINT supremum; `ks_d` and
    * the threshold are single float ops over exact longs.
    */
  private def ksDriftQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.05).otherwise(col("o_totalprice")))
    graft.quality.Drift.ksTest(base, cur, "o_totalprice",
        Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_base"), col("n_cur"),
        col("ks_scaled"), round(col("ks_d"), 6).as("ks_d"),
        round(col("threshold"), 6).as("threshold"), col("drifted"))
      .orderBy("o_orderpriority")
  }

  /** Deterministic epoch shuffle + worker sharding
    * ([[graft.sampling.Sampling.epochOrder]]): the reproducible
    * global training order for epoch 2 over 4 data-loader workers —
    * every engine, run, and partitioning derives the same permutation
    * and the same balanced shards.
    */
  private def epochOrderQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.epochOrder(
        docs(s, dir).select(col("doc_id")), "doc_id", epoch = 2,
        numWorkers = 4)
      .select(col("doc_id"), col("order_idx"), col("worker"),
        col("worker_pos"))
      .orderBy("order_idx")

  /** Two-proportion z-test per market segment
    * ([[Analytics.proportionTest]]): is a segment's
    * customer-conversion rate (≥ 1 finalized order) different from
    * the pooled rest — the segment screen of an A/B readout, exact
    * counts under the float z.
    */
  private def proportionTestQ(s: SparkSession, dir: String): DataFrame = {
    val conv = t(s, dir, "orders")
      .where(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct()
    val c = t(s, dir, "customer")
      .join(conv, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("__conv", col("o_custkey").isNotNull)
    Analytics.proportionTest(c, "c_mktsegment", col("__conv"))
      .select(col("c_mktsegment"), col("n"), col("successes"),
        round(col("rate"), 6).as("rate"),
        round(col("rate_rest"), 6).as("rate_rest"),
        round(col("z"), 6).as("z"), col("significant"))
      .orderBy("c_mktsegment")
  }

  /** Linear multi-touch attribution ([[Analytics.linearAttribution]]):
    * every purchase splits 1000 exact milli-credits across the
    * view/click touches in its trailing 2-hour window, remainder to
    * the last touch — q48's single-touch attribution generalized to
    * the report that sets channel budgets.
    */
  private def linearAttributionQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    Analytics.linearAttribution(
        e.where(col("event_type") === "purchase"),
        e.where(col("event_type").isin("view", "click")),
        "user_id", "ts", "event_id", windowDuration = "2 hours")
      .select(col("user_id"), col("conversion_id"), col("touch_id"),
        col("touch_rank"), col("n_touches"), col("credit_milli"))
      .orderBy("conversion_id", "touch_rank")
  }

  /** Per-source quantile normalization
    * ([[Analytics.quantileNormalize]]) of the quality score onto the
    * global distribution — the batch-effect correction that makes one
    * quality threshold mean the same thing across sources whose
    * scorers run hot or cold. Exact integer grid routing; the
    * 100-point global grid is the exact interpolated percentile
    * (`exact = true`, oracle-replayable).
    */
  private def quantileNormalizeQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("__score", TextAnalysis.qualityScore(col("text")))
    Analytics.quantileNormalize(d, "source", "__score", k = 100,
        exact = true)
      .select(col("doc_id"), col("source"),
        round(col("__score"), 6).as("score"), col("grid_idx"),
        round(col("normalized"), 6).as("normalized"))
      .orderBy("doc_id")
  }

  /** Audio perceptual near-dup ([[Multimodal.audioEHash]] +
    * [[Dedup.hammingBandedMatches]]): synthesized envelope WAVs per
    * document, a batch of every-5th re-synthesized at DOUBLE gain —
    * same recording, different volume — probed against the corpus at
    * Hamming ≤ 3. The hash is exact integer arithmetic end to end
    * (Σ|sample| per window, cross-multiplied mean comparisons), so
    * gain-scaled copies match at Hamming 0 by construction and the
    * whole decode→pool→hash→band chain replays closed-form from the
    * synthesis parameters (the q39/q122 analytic-oracle treatment).
    * Fourth fingerprint family on the shared banded machinery.
    */
  private def audioEhashDedupQ(s: SparkSession, dir: String): DataFrame = {
    val ids = docs(s, dir).select(col("doc_id"))
    val corpusHash = Multimodal.audioEHash(
      Multimodal.synthesizeEnvelopeWavs(ids, "doc_id", ampScale = 1),
      "id", "wav")
    val batchHash = Multimodal.audioEHash(
      Multimodal.synthesizeEnvelopeWavs(
        ids.where(col("doc_id") % 5 === 0), "doc_id", ampScale = 2),
      "id", "wav")
    Dedup.hammingBandedMatches(
        corpusHash.select(col("id"), col("ahash_hi"), col("ahash_lo")),
        batchHash.select(col("id"), col("ahash_hi"), col("ahash_lo")),
        "id", "ahash_hi", "ahash_lo", maxDist = 3)
      .select(col("corpus_id"), col("batch_id"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("corpus_id", "batch_id")
  }

  /** k-anonymity audit ([[graft.quality.Privacy.kAnonymityReport]]):
    * equivalence-class size histogram over the
    * (nation, market-segment) quasi-identifiers of the customer
    * table, classes below k = 10 flagged — the privacy audit that
    * prices a release, emitting SIZES only (never the small classes'
    * values).
    */
  private def kAnonymityQ(s: SparkSession, dir: String): DataFrame =
    graft.quality.Privacy.kAnonymityReport(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
        k = 10)
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        col("violates"))
      .orderBy("class_size")

  /** BM25 top-k retrieval ([[graft.text.TfIdf.bm25Search]]): the
    * audit queries (docs 0–4 as their own queries) against the full
    * corpus — sparse lexical retrieval with df-pruned postings and
    * micro-unit-exact score sums. (On this deliberately tiny
    * vocabulary, BM25's length normalization can rank a short
    * term-dense document above the query's own longer source — the
    * correct Okapi behavior, replayed identically by the oracle.)
    */
  private def bm25SearchQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.TfIdf.bm25Search(d, "doc_id", "text",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, maxDf = 400L)
      .orderBy("query_id", "rank")
  }

  /** SCD-2 point-in-time lookup
    * ([[graft.transform.StarSchemaBuilder.scd2Lookup]]): every order
    * joined to the priority version its customer was IN at the
    * order's own date — the as-was reporting join over the q75
    * history, completing the SCD-2 circle (derive → upsert → stream →
    * lookup).
    */
  private def scd2LookupQ(s: SparkSession, dir: String): DataFrame = {
    import graft.transform.StarSchemaBuilder
    val o = t(s, dir, "orders")
    val vers = StarSchemaBuilder.scd2Versions(
      o.select("o_custkey", "o_orderpriority", "o_orderdate",
        "o_orderkey"),
      keyCols = Seq("o_custkey"), attrCols = Seq("o_orderpriority"),
      orderCol = "o_orderdate", tieBreak = Seq("o_orderkey"))
    StarSchemaBuilder.scd2Lookup(
        o.select("o_orderkey", "o_custkey", "o_orderdate"), vers,
        Seq("o_custkey"), "o_orderdate", Seq("o_orderpriority"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("dim_o_orderpriority").as("priority_as_was"),
        col("dim_version_n").as("version_n"))
      .orderBy("o_orderkey")
  }

  /** MMR diverse reranking ([[Similarity.mmrRerank]]): the top-20
    * cosine candidates for audit query 0, reranked to 8 results
    * maximizing λ·relevance − (1−λ)·max-cosine-to-selected — the
    * retrieval stack's final stage, keeping near-duplicate hits from
    * crowding out coverage. Every pick's objective is
    * micro-quantized before the argmax (bit-exact rounds).
    */
  private def mmrRerankQ(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val q0 = e.agg(min_by(col("v"), col("vec_id")).as("qv"))
    val cands = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .withColumn("rel", Similarity.dot(col("v"), col("qv")) /
        (Similarity.norm(col("v")) * Similarity.norm(col("qv"))))
      .select(col("vec_id"), col("v"), col("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(20)
    Similarity.mmrRerank(cands, "vec_id", "v", "rel", k = 8,
        lambdaMilli = 700)
      .select(col("rank").cast("int").as("rank"), col("vec_id"),
        round(col("rel"), 6).as("rel"),
        round(col("max_cos_prior"), 6).as("max_cos_prior"),
        col("obj_micro"))
      .orderBy("rank")
  }

  /** Lagged cross-correlation ([[Analytics.crossCorrelation]]):
    * hourly signup counts against purchase counts at every lag in
    * ±6 hours — the lead/lag screen; gap hours count as zeros via the
    * generated grid.
    */
  private def crossCorrelationQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.crossCorrelation(events(s, dir), "ts", "event_type",
        "signup", "purchase", bucketSeconds = 3600L, maxLag = 6)
      .select(col("lag").cast("int").as("lag"), col("n_buckets"),
        round(col("corr"), 6).as("corr"))
      .orderBy("lag")

  // ---------------------------------------------------------------- //
  // Oracle SQL builders (portable md5-based hashing — see Dedup)      //
  // ---------------------------------------------------------------- //

  /** Per-document text metric CTEs (tokens/punct/stop/quality),
    * composable over any source relation carrying a `text` column.
    */
  private val oracleWords = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private val oracleStopList = TextAnalysis.stopwords
    .map(w => s"'$w'").mkString(", ")
  private def oracleMetricsCtes(src: String): String =
    s"""m AS (
       SELECT $src.*,
         len($oracleWords) AS tokens,
         CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
           / CAST(nullif(length(text), 0) AS DOUBLE) AS punct,
         CAST(len(list_filter($oracleWords,
             w -> w IN ($oracleStopList))) AS DOUBLE)
           / CAST(nullif(len($oracleWords), 0) AS DOUBLE) AS stop
       FROM $src),
       q AS (
       SELECT m.*,
         least(CAST(1.0 AS DOUBLE), CAST(tokens AS DOUBLE) / 100.0) * 0.5
           + (1.0 - least(CAST(1.0 AS DOUBLE), coalesce(punct, 0.0) * 5.0)) * 0.25
           + least(CAST(1.0 AS DOUBLE), coalesce(stop, 0.0) * 5.0) * 0.25
           AS quality
       FROM m)"""
  private val oracleMetricsCte = "WITH " + oracleMetricsCtes("documents")

  /** Distinct word-3-shingle CTEs (q23/q24/q31). */
  private val oracleShingleCtes =
    s"""sh AS (
       SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM (
           SELECT doc_id, $oracleWords AS ws FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""
  private val oracleShingleCte = "WITH " + oracleShingleCtes

  /** Exact-Jaccard pair selection from the shingle CTE. */
  private def oracleJaccardSelect(
      candidateFilter: String, includeCommon: Boolean): String =
    s"""common AS (
       SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       $candidateFilter
       GROUP BY 1, 2)
       SELECT ida AS id_a, idb AS id_b,
         ${if (includeCommon) "common," else ""}
         round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 4) AS jaccard
       FROM common
       JOIN sizes sa ON sa.doc_id = ida
       JOIN sizes sb ON sb.doc_id = idb
       WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8
       ORDER BY id_a, id_b"""

  /** MinHash signature + band CTEs (16 hashes, 4 bands of 4). */
  /** Mirrors Dedup's Carter-Wegman family: one md5 per shingle, two
    * 32-bit halves, member i = h1 + i·h2 (exact in BIGINT).
    */
  private val oracleMinhashCtes: String = {
    val mins = (0 until 16)
      .map(i => s"min(h1 + $i * h2) AS h$i")
      .mkString(", ")
    val bands = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, " +
        s"md5(${(0 until 4).map(r => s"CAST(h${4 * b + r} AS VARCHAR)")
          .mkString(" || '|' || ")}) AS sig FROM sigs")
      .mkString(" UNION ALL ")
    s"""shh AS (
         SELECT doc_id,
           CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
           CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
         FROM sh),
       sigs AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id),
       bands AS ($bands),
       cands AS (
         SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)"""
  }

  /** Exact + near dedup "kept" chain (q31/q73): LSH candidates →
    * exact-Jaccard verify (0.8) → recursive-CTE connected components
    * dropping every non-minimum member, intersected with exact
    * fingerprint dedup (lowest id per normalized text). Needs WITH
    * RECURSIVE plus [[oracleShingleCtes]] and [[oracleMinhashCtes]]
    * upstream; exposes `kept` (surviving documents rows).
    */
  private val oracleDedupKeptCtes: String =
    s"""pairs AS (
       SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       FROM sh a JOIN sh b
         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
       GROUP BY 1, 2),
       verified AS (
         SELECT ida, idb FROM pairs
         JOIN sizes sa ON sa.doc_id = ida
         JOIN sizes sb ON sb.doc_id = idb
         WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
       edges AS (SELECT ida AS a, idb AS b FROM verified
                 UNION SELECT idb, ida FROM verified),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       drops AS (
         SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) < a),
       keep1 AS (
         SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1),
       kept AS (
         SELECT d.* FROM documents d
         JOIN keep1 USING (doc_id)
         WHERE d.doc_id NOT IN (SELECT doc_id FROM drops))"""

  /** TF-weighted SimHash CTE: identical bit math to Dedup.simhash. */
  private val oracleSimhashCte: String = {
    def bit(i: Int) =
      s"((CAST(('0x' || substr(h, ${i / 4 + 1}, 1)) AS BIGINT) >> ${3 - i % 4}) & 1)"
    val sums = (0 until 64)
      .map(i => s"sum(CASE WHEN ${bit(i)} = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(", ")
    val hexDigits = (0 until 16).map { j =>
      val v = (0 until 4)
        .map(k => s"(CASE WHEN s${j * 4 + k} > 0 THEN ${8 >> k} ELSE 0 END)")
        .mkString(" + ")
      s"substr('0123456789abcdef', 1 + ($v), 1)"
    }.mkString(" || ")
    s"""WITH toks AS (
       SELECT doc_id, unnest($oracleWords) AS token FROM documents),
       th AS (SELECT doc_id, md5(token) AS h FROM toks),
       sums AS (SELECT doc_id, $sums FROM th GROUP BY doc_id),
       sh AS (SELECT doc_id, $hexDigits AS simhash_hex FROM sums),
       shp AS (
         SELECT doc_id, simhash_hex,
           CAST(('0x' || substr(simhash_hex, 1, 8)) AS BIGINT) AS hi,
           CAST(('0x' || substr(simhash_hex, 9, 8)) AS BIGINT) AS lo
         FROM sh)"""
  }

  /** Arithmetic reconstruction of the `graft_zorder` Morton key
    * (q79): mask-shift bit spreading on BIGINT, the final interleave
    * in HUGEINT (the top bit would overflow BIGINT), sign handling as
    * `+ 2^31` per dimension and `- 2^63` on the key — bit-identical to
    * [[graft.expressions.ZOrderKey.interleave]] (validated on the
    * int extremes).
    */
  private def oracleZorder(a: String, b: String): String = {
    def spread(x: String): String = {
      val steps = Seq(
        16 -> "281470681808895",        // 0x0000FFFF0000FFFF
        8 -> "71777214294589695",       // 0x00FF00FF00FF00FF
        4 -> "1085102592571150095",     // 0x0F0F0F0F0F0F0F0F
        2 -> "3689348814741910323",     // 0x3333333333333333
        1 -> "6148914691236517205")     // 0x5555555555555555
      steps.foldLeft(s"($x & 4294967295)") { case (v, (sh, m)) =>
        s"((($v) | (($v) << $sh)) & $m)"
      }
    }
    val ua = s"(CAST($a AS BIGINT) + 2147483648)"
    val ub = s"(CAST($b AS BIGINT) + 2147483648)"
    s"CAST(CAST(${spread(ua)} AS HUGEINT) * 2 + ${spread(ub)}" +
      " - 9223372036854775808 AS BIGINT)"
  }

  /** Cosine in double precision over the embeddings arrays. */
  /** One PQ block's oracle chain (mirrors [[graft.similarity
    * .Similarity.pqTrainCodebooks]] for block `b`): sub-vector slice →
    * hash-init c0 → two cosine-assign/median-refine rounds → dense
    * codes by hash rank → L2-argmin encode. Every expression matches
    * the Spark side bit-for-bit (left-to-right dot products, medians
    * rounded at 6, cosine at 4, code-ascending ties).
    */
  private def oraclePqBlock(
      b: Int, sub: Int, k: Int, src: String = "e",
      encSrc: String = ""): String = {
    val lo = b * sub + 1
    val hi = (b + 1) * sub
    // train codebooks on `src`; encode rows of `encSrc` (defaults to
    // the training frame) — the index-lifecycle shape where codebooks
    // are frozen on the initial corpus and appended batches encode
    // with them
    val (encCte, encFrom) =
      if (encSrc.isEmpty || encSrc == src) ("", s"e$b")
      else (s"f$b AS (SELECT vec_id, v[$lo:$hi] AS v FROM $encSrc),\n       ",
        s"f$b")
    def assign(src: String, cents: String) =
      s"""(SELECT vec_id, v, cid FROM (
         SELECT e.vec_id, e.v, c.cid, row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
         FROM $src e CROSS JOIN $cents c) WHERE rn = 1)"""
    def medians(assigned: String) =
      s"""(SELECT cid, pos, round(median(v[pos]), 6) AS m
         FROM $assigned CROSS JOIN dims$b GROUP BY cid, pos)"""
    s"""e$b AS (SELECT vec_id, v[$lo:$hi] AS v FROM $src),
       ${encCte}dims$b AS (SELECT unnest(range(1, ${sub + 1})) AS pos),
       c0$b AS (SELECT vec_id AS cid, v AS cv FROM e$b
                ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                LIMIT $k),
       a1$b AS ${assign(s"e$b", s"c0$b")},
       m1$b AS ${medians(s"a1$b")},
       c1$b AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m1$b
                GROUP BY cid),
       a2$b AS ${assign(s"e$b", s"c1$b")},
       m2$b AS ${medians(s"a2$b")},
       c2$b AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m2$b
                GROUP BY cid),
       cb$b AS (SELECT cv, row_number() OVER (
           ORDER BY md5(CAST(cid AS VARCHAR)) ASC, cid ASC) - 1 AS code
         FROM c2$b),
       enc$b AS (SELECT vec_id, code FROM (
           SELECT e.vec_id, c.code, row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(c.cv, c.cv)
               - 2 * list_dot_product(e.v, c.cv) ASC, c.code ASC) AS rn
           FROM $encFrom e CROSS JOIN cb$b c) WHERE rn = 1)"""
  }

  /** Content-chunking CTE replay ([[graft.text.TextAnalysis
    * .chunkByContent]], the q109 construction) over `src` (a relation
    * exposing doc_id, text), CTE names prefixed `p`; final CTE
    * `${p}ch` carries (doc_id, chunk_idx, n_tokens, chunk_md5).
    */
  private def oracleChunkCtes(p: String, src: String, target: Int): String =
    s"""${p}tok AS (
         SELECT doc_id, $oracleWords AS ws FROM $src
         WHERE len($oracleWords) > 0),
       ${p}b AS (
         SELECT doc_id, ws,
           list_filter(generate_series(3, len(ws) - 1), j ->
             (('0x' || substr(md5(array_to_string(ws[j-2:j], ' ')),
               1, 8))::BIGINT % $target) = 0) AS bs
         FROM ${p}tok),
       ${p}c AS (
         SELECT doc_id, ws,
           list_prepend(1, list_transform(bs, j -> j + 1)) AS ss,
           list_append(bs, len(ws)) AS es
         FROM ${p}b),
       ${p}ch AS (
         SELECT doc_id, i - 1 AS chunk_idx,
           es[i] - ss[i] + 1 AS n_tokens,
           md5(array_to_string(ws[ss[i]:es[i]], ' ')) AS chunk_md5
         FROM ${p}c, LATERAL (SELECT unnest(
           generate_series(1, len(ss))) AS i) t)"""

  /** One BPE training iteration over the space-delimited symbol
    * strings in CTE s{i-1}: pair counts → deterministic argmax →
    * greedy left-to-right merge. The merge is TWO replace passes: a
    * single replace-all consumes the shared boundary space of
    * textually-adjacent occurrences and skips every second one; the
    * skipped occurrences are never adjacent to each other (their
    * neighbors were replaced, restoring delimiters), so the second
    * pass completes exactly the greedy non-overlapping set the
    * engine's fold computes.
    */
  private def oracleBpeStep(i: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    // this chain references each step several times — inlining
    // re-expands the whole prefix per reference (exponential plan,
    // "too many open files" on the base scan). The 1-row argmax
    // cross-joins in (no repeated scalar subqueries), which also
    // makes an exhausted step (empty t) empty out the rest — matching
    // the engine's early stop.
    val prev = s"s${i - 1}"
    val pat = s"' ' || mt.lhs || ' ' || mt.rhs || ' '"
    val rep = s"' ' || mt.lhs || mt.rhs || ' '"
    s"""p$i AS MATERIALIZED (
         SELECT ws[j] AS lhs, ws[j + 1] AS rhs, sum(freq) AS cnt FROM (
           SELECT freq, string_split(trim(s), ' ') AS ws FROM $prev),
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS j)
             t
         GROUP BY 1, 2),
       t$i AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$i
               ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
       s$i AS MATERIALIZED (SELECT w, freq,
           replace(replace(s, $pat, $rep), $pat, $rep) AS s
         FROM $prev, t$i mt)"""
  }

  private def oracleCos(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / nullif(" +
      s"sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)), 0.0), 4)"

  private def oracleCosRaw(a: String, b: String): String =
    s"(list_dot_product($a, $b) / nullif(" +
      s"sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)), 0.0))"

  /** SRP sketch CTEs (q123/q127): int8-quantize (the q105 CTE) an
    * `allv(id, v)` relation, project onto the 64 md5-derived sign rows
    * (integer-valued terms → exact sums), pack bits into (hi, lo) —
    * identical bit math to Similarity.srpSketch. Exposes `hs`.
    */
  private val oracleSrpCtes: String =
    """qz AS (
         SELECT id,
           CASE WHEN coalesce(
               list_max(list_transform(v, x -> abs(x))), 0.0) = 0.0
             THEN list_transform(v, x -> 0.0)
             ELSE list_transform(v, x -> round(x /
               (list_max(list_transform(v, y -> abs(y))) / 127.0)))
           END AS qv
         FROM allv),
       sb AS (
         SELECT id, bi.i AS i,
           list_sum(list_transform(range(64), d ->
             CASE WHEN substr(md5('srp_' || bi.i || '_' || d), 1, 1)
               IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END
             * coalesce(qv[d+1], 0.0))) AS s
         FROM qz, LATERAL (SELECT unnest(range(64)) AS i) bi),
       hs AS (
         SELECT id,
           sum(CASE WHEN i < 32 AND s > 0 THEN
             CAST(1 AS BIGINT) << CAST(31 - i AS INT) ELSE 0 END) AS hi,
           sum(CASE WHEN i >= 32 AND s > 0 THEN
             CAST(1 AS BIGINT) << CAST(63 - i AS INT) ELSE 0 END) AS lo
         FROM sb GROUP BY id)"""

  /** Language-ID CTEs (marker scores → precedence argmax), composable
    * over any source relation carrying a `text` column; `p` passes all
    * source columns through plus `predicted`.
    */
  private def oracleLangCtes(src: String): String = {
    val marker = TextAnalysis.langMarkers.map { case (lang, ws) =>
      lang -> s"len(list_filter($oracleWords, w -> w IN (${ws.map(w => s"'$w'").mkString(", ")})))"
    }
    s"""ls AS (
       SELECT $src.*,
         ${marker("en")} AS s_en, ${marker("de")} AS s_de,
         ${marker("es")} AS s_es, ${marker("fr")} AS s_fr,
         length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
       FROM $src),
       p AS (
       SELECT ls.*,
         CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'unknown'
              WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'zh'
              WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
              ELSE 'fr' END AS predicted
       FROM ls)"""
  }
  private val oracleLangScores: String = "WITH " + oracleLangCtes("documents")

  // ---------------------------------------------------------------- //
  // Contract                                                          //
  // ---------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_latest_order_per_customer" -> (latestOrderPerCustomer _),
    "q03_top10_orders" -> (top10Orders _),
    "q04_order_priority_facets" -> (orderPriorityFacets _),
    "q05_part_name_facets" -> (partNameFacets _),
    "q06_revenue_by_nation" -> (revenueByNation _),
    "q07_order_price_stats" -> (orderPriceStats _),
    "q08_customers_without_orders" -> (customersWithoutOrders _),
    "q09_dim_customer_keys" -> (dimCustomerKeys _),
    "q10_date_dimension" -> (dateDimension _),
    "q11_duplicate_orderkey_stats" -> (duplicateOrderKeyStats _),
    "q12_lineitem_completeness" -> (lineitemCompleteness _),
    "q13_quantity_range_check" -> (quantityRangeCheck _),
    "q14_customer_name_pattern" -> (customerNamePattern _),
    "q15_events_hourly" -> (eventsHourly _),
    "q16_events_props_extract" -> (eventsPropsExtract _),
    "q17_union_high_low_orders" -> (unionHighLowOrders _),
    "q18_text_stats" -> (textStats _),
    "q19_doc_quality" -> (docQuality _),
    "q20_lang_id_facets" -> (langIdFacets _),
    "q21_doc_fingerprints" -> (docFingerprints _),
    "q22_exact_dup_stats" -> (exactDupStats _),
    "q23_ngram_jaccard_pairs" -> (ngramJaccardPairs _),
    "q24_minhash_lsh_pairs" -> (minhashLshPairs _),
    "q25_simhash_fingerprints" -> (simhashFingerprints _),
    "q26_simhash_pairs" -> (simhashPairs _),
    "q27_embedding_neardup" -> (embeddingNeardup _),
    "q28_ann_bruteforce" -> (annBruteForce _),
    "q105_ann_int8" -> (annInt8 _),
    "q29_ann_ivf" -> (annIvf _),
    "q30_binary_fingerprints" -> (binaryFingerprints _),
    "q31_corpus_prep" -> (corpusPrep _),
    "q32_order_cube" -> (orderCube _),
    "q33_asof_prior_event" -> (asofPriorEvent _),
    "q34_event_sessions" -> (eventSessions _),
    "q37_events_sliding" -> (eventsSliding _),
    "q35_customer_running_totals" -> (customerRunningTotals _),
    "q36_acctbal_percentiles" -> (acctbalPercentiles _),
    "q38_png_header_decode" -> (pngHeaderDecode _),
    "q39_image_pixel_stats" -> (imagePixelStats _),
    "q40_ann_kmedians" -> (annIvfKmedians _),
    "q41_hash_split" -> (hashSplitCounts _),
    "q42_stratified_sample" -> (stratifiedSample _),
    "q43_normalize_redact" -> (textNormalizeRedact _),
    "q44_top_bigrams" -> (topBigrams _),
    "q45_range_join_bands" -> (rangeJoinPriceBands _),
    "q46_approx_distinct" -> (approxDistinctUsers _),
    "q47_wav_roundtrip" -> (wavRoundtrip _),
    "q48_event_attribution" -> (eventAttribution _),
    "q49_group_sample" -> (groupSample _),
    "q50_compress_quality" -> (compressQuality _),
    "q51_incremental_dedup" -> (incrementalDedup _),
    "q52_supplier_by_region" -> (supplierBalanceByRegion _),
    "q53_event_pivot" -> (eventTypePivot _),
    "q54_supplier_rollup" -> (supplierRollup _),
    "q55_price_outliers" -> (priceOutliers _),
    "q56_top_orders_per_priority" -> (topOrdersPerPriority _),
    "q57_acctbal_deciles" -> (acctbalDeciles _),
    "q58_tfidf_terms" -> (topTfidfTerms _),
    "q59_token_shards" -> (tokenShards _),
    "q60_lang_token_budget" -> (langTokenBudget _),
    "q61_doc_chunks" -> (docChunks _),
    "q62_weighted_order_sample" -> (weightedOrderSample _),
    "q63_video_meta" -> (videoMeta _),
    "q64_contamination" -> (contamination _),
    "q103_contamination_capped" -> (contaminationCapped _),
    "q106_shared_spans" -> (sharedSpanPairs _),
    "q107_temperature_mixture" -> (temperatureMixture _),
    "q108_winsorized_prices" -> (winsorizedPrices _),
    "q109_content_chunks" -> (contentChunks _),
    "q110_neardup_incremental" -> (nearDupIncremental _),
    "q111_key_skew" -> (keySkewReport _),
    "q112_ann_pq" -> (annPq _),
    "q113_ann_ivfpq" -> (annIvfPq _),
    "q116_ann_ivfrpq" -> (annIvfRpq _),
    "q117_ann_recall_audit" -> (annRecallAuditQ _),
    "q118_lsh_recall_audit" -> (lshRecallAuditQ _),
    "q119_ngram_containment" -> (ngramContainmentPairs _),
    "q120_minhash_jaccard_est" -> (minhashJaccardEst _),
    "q121_containment_incremental" -> (containmentIncremental _),
    "q122_image_dhash_pairs" -> (imageDHashPairs _),
    "q123_srp_neardup" -> (srpNearDupPairs _),
    "q124_unigram_lm_quality" -> (unigramLmQuality _),
    "q125_resample_ffill" -> (resampleDailyValues _),
    "q126_entity_resolution" -> (entityResolution _),
    "q127_srp_dedup_incremental" -> (srpDedupIncremental _),
    "q128_keepbest_near_dedup" -> (keepBestNearDedup _),
    "q129_resample_interp" -> (resampleInterpDaily _),
    "q130_rolling_anomalies" -> (rollingAnomalies _),
    "q131_ewma_trend" -> (ewmaUserTrend _),
    "q132_spend_trend" -> (customerSpendTrend _),
    "q133_collapse_repeats" -> (collapseRepeatRuns _),
    "q134_line_dedup" -> (lineDedupDocs _),
    "q135_global_line_dedup" -> (globalLineDedupDocs _),
    "q136_event_type_affinity" -> (eventTypeAffinity _),
    "q137_event_transitions" -> (eventTransitions _),
    "q138_ann_recall_audit_sampled" -> (annRecallAuditSampledQ _),
    "q139_index_lifecycle" -> (indexLifecycleQ _),
    "q140_fused_quality_pass" -> (fusedQualityPassQ _),
    "q141_hard_negatives" -> (hardNegativesQ _),
    "q142_bpe_merges" -> (bpeMergesQ _),
    "q143_bpe_token_counts" -> (bpeTokenCountsQ _),
    "q144_semantic_decontamination" -> (semanticDecontamination _),
    "q145_bigram_lm_quality" -> (bigramLmQuality _),
    "q146_corpus_cluster_map" -> (corpusClusterMap _),
    "q147_rare_token_spans" -> (rareTokenSpansQ _),
    "q148_mergeable_datasheet" -> (mergeableDatasheetQ _),
    "q149_dedup_token_budget" -> (dedupTokenBudget _),
    "q150_fused_quality_bigram" -> (fusedQualityBigramQ _),
    "q151_filter_funnel" -> (filterFunnelQ _),
    "q152_cross_source_dup_matrix" -> (crossSourceDupMatrixQ _),
    "q153_dsir_selection" -> (dsirSelectionQ _),
    "q154_supplier_pagerank" -> (supplierPagerankQ _),
    "q155_merge_survivorship" -> (mergeSurvivorshipQ _),
    "q156_epoch_allocation" -> (epochAllocationQ _),
    "q157_event_sequences" -> (eventSequencesQ _),
    "q158_negative_samples" -> (negativeSamplesQ _),
    "q159_kcenter_select" -> (kcenterSelectQ _),
    "q160_calibration_report" -> (calibrationReportQ _),
    "q161_quantile_datasheet" -> (quantileDatasheetQ _),
    "q162_pii_incidence" -> (piiIncidenceQ _),
    "q163_tokenizer_fertility" -> (tokenizerFertilityQ _),
    "q164_ks_drift" -> (ksDriftQ _),
    "q165_epoch_order" -> (epochOrderQ _),
    "q166_segment_conversion" -> (proportionTestQ _),
    "q167_linear_attribution" -> (linearAttributionQ _),
    "q168_quantile_normalize" -> (quantileNormalizeQ _),
    "q169_audio_ehash_dedup" -> (audioEhashDedupQ _),
    "q170_k_anonymity" -> (kAnonymityQ _),
    "q171_bm25_search" -> (bm25SearchQ _),
    "q172_scd2_lookup" -> (scd2LookupQ _),
    "q173_mmr_rerank" -> (mmrRerankQ _),
    "q174_event_cross_correlation" -> (crossCorrelationQ _),
    "q114_chunk_incremental" -> (chunkIncrementalDedup _),
    "q115_salted_lang_rollup" -> (saltedLangRollup _),
    "q65_repetition_signals" -> (repetitionSignals _),
    "q66_corpus_datasheet" -> (corpusDatasheet _),
    "q67_source_cap" -> (sourceCap _),
    "q68_source_mixture" -> (sourceMixture _),
    "q69_vocab_coverage" -> (vocabCoverageTop _),
    "q70_cluster_split" -> (clusterSplit _),
    "q71_dup_chunk_fraction" -> (dupChunkFraction _),
    "q72_semantic_dedup" -> (semanticDedupCensus _),
    "q73_training_shards" -> (trainingShards _),
    "q74_bloom_incremental" -> (bloomIncrementalDedup _),
    "q75_priority_scd2" -> (customerPriorityScd2 _),
    "q76_fuzzy_part_names" -> (fuzzyPartNames _),
    "q77_heavy_hitter_tokens" -> (heavyHitterTokens _),
    "q78_centroid_drift" -> (labelCentroidDrift _),
    "q79_zorder_keys" -> (zorderOrderKeys _),
    "q104_compact_zorder" -> (compactZOrderFidelity _),
    "q80_quality_model_scores" -> (qualityModelScores _),
    "q81_adaptive_quality_floor" -> (adaptiveQualityFloorByLang _),
    "q82_event_funnel" -> (eventFunnel _),
    "q83_neardup_histogram" -> (nearDupClusterHistogram _),
    "q84_snapshot_diff" -> (orderSnapshotDiff _),
    "q85_time_weighted_value" -> (userTimeWeightedValue _),
    "q86_event_transitions" -> (eventTransitionMatrix _),
    "q87_cohort_retention" -> (cohortRetention _),
    "q88_peak_hourly_activity" -> (peakHourlyActivity _),
    "q89_acctbal_gini" -> (acctbalGini _),
    "q90_hybrid_rank_fusion" -> (hybridRankFusion _),
    "q91_top_keyword_histogram" -> (topKeywordHistogram _),
    "q92_type_weekday_chi2" -> (eventTypeWeekdayChi2 _),
    "q93_lineitem_corr" -> (lineitemCorrMatrix _),
    "q94_price_drift_psi" -> (priceDriftPsi _),
    "q95_price_trend" -> (priceTrendByPriority _),
    "q96_lineitem_profile" -> (lineitemProfile _),
    "q97_cdc_apply" -> (cdcApplySummary _),
    "q98_langid_metrics" -> (langIdMetrics _),
    "q99_order_fanout" -> (orderFanoutHistogram _),
    "q100_event_interarrival" -> (eventInterArrival _),
    "q101_acctbal_pct_rank" -> (acctbalPercentRanks _),
    "q102_order_grouping_sets" -> (orderGroupingSets _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey,
         CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS o_orderdate_key,
         o_totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q03_top10_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q04_order_priority_facets" ->
      """SELECT o_orderpriority AS facet, count(*) AS count FROM orders
         GROUP BY 1 ORDER BY count DESC, facet ASC NULLS LAST LIMIT 10""",
    "q05_part_name_facets" ->
      """SELECT regexp_extract(p_name, '^(\w+)', 1) AS facet,
         count(*) AS count FROM part
         GROUP BY 1 ORDER BY count DESC, facet ASC NULLS LAST LIMIT 10""",
    "q06_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS line_count
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q07_order_price_stats" ->
      """SELECT round(avg(o_totalprice), 4) AS mean,
         round(CAST(median(o_totalprice) AS DOUBLE), 4) AS median,
         round(max(o_totalprice), 2) AS max,
         round(sum(o_totalprice), 2) AS sum,
         count(o_totalprice) AS count
         FROM orders""",
    "q08_customers_without_orders" ->
      """SELECT DISTINCT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_dim_customer_keys" ->
      """SELECT c_custkey,
         substring(md5(concat_ws('|',
           coalesce(CAST(c_custkey AS VARCHAR), 'None'),
           coalesce(c_name, 'None'))), 1, 12) AS customer_sk,
         lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS custkey_padded,
         c_mktsegment
         FROM customer ORDER BY c_custkey""",
    "q10_date_dimension" ->
      """SELECT strftime(d, '%Y-%m-%d') AS date_str,
         CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
         CAST(year(d) AS INT) AS year,
         CAST(quarter(d) AS INT) AS quarter,
         CAST(month(d) AS INT) AS month,
         monthname(d) AS month_name,
         dayname(d) AS day_of_week,
         CAST(dayofyear(d) AS INT) AS day_of_year,
         CAST(isodow(d) >= 6 AS INT) AS is_weekend
         FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
               WHERE o_orderdate IS NOT NULL)
         ORDER BY date_str""",
    "q11_duplicate_orderkey_stats" ->
      """SELECT
         CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
           AS duplicate_rows,
         CAST(coalesce(sum(CASE WHEN n = 1 THEN n END), 0) AS BIGINT)
           AS unique_rows,
         CAST(coalesce(sum(n), 0) AS BIGINT) AS total_rows
         FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)""",
    "q12_lineitem_completeness" ->
      """SELECT
         round(avg(CAST(l_orderkey IS NOT NULL AS INT)), 4) AS c_orderkey,
         round(avg(CAST(l_quantity IS NOT NULL AS INT)), 4) AS c_quantity,
         round(avg(CAST(l_shipdate IS NOT NULL AS INT)), 4) AS c_shipdate,
         count(*) AS total_rows
         FROM lineitem""",
    "q13_quantity_range_check" ->
      """SELECT
         count(CASE WHEN l_quantity IS NOT NULL AND l_quantity < 5.0
           THEN 1 END) AS below_min,
         count(CASE WHEN l_quantity IS NOT NULL AND l_quantity > 45.0
           THEN 1 END) AS above_max,
         count(l_quantity) AS checked,
         round(CAST(min(l_quantity) AS DOUBLE), 2) AS min_found,
         round(CAST(max(l_quantity) AS DOUBLE), 2) AS max_found
         FROM lineitem""",
    "q14_customer_name_pattern" ->
      """SELECT
         count(CASE WHEN c_name IS NOT NULL
           AND NOT regexp_matches(c_name, '^(?:Customer#\d{9})')
           THEN 1 END) AS mismatches,
         count(c_name) AS checked
         FROM customer""",
    "q15_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         event_type,
         count(*) AS n_events,
         round(sum(value), 2) AS sum_value,
         count(DISTINCT user_id) AS n_users
         FROM events
         GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q16_events_props_extract" ->
      """SELECT event_type,
         round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4)
           AS avg_k,
         count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q17_union_high_low_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         WHERE o_totalprice > 400000
         UNION ALL
         SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) FROM orders
         WHERE o_totalprice < 1000
         ORDER BY o_orderkey""",
    "q18_text_stats" ->
      s"""$oracleMetricsCte
         SELECT lang, count(*) AS n_docs,
           round(avg(CAST(tokens AS DOUBLE)), 4) AS avg_tokens,
           round(avg(punct), 4) AS avg_punct,
           round(avg(stop), 4) AS avg_stop,
           round(avg(quality), 4) AS avg_quality
         FROM q GROUP BY lang ORDER BY lang""",
    "q19_doc_quality" ->
      s"""$oracleMetricsCte
         SELECT doc_id, CAST(tokens AS BIGINT) AS n_tokens,
           round(punct, 4) AS punct_ratio,
           round(stop, 4) AS stop_ratio,
           round(quality, 4) AS quality
         FROM q ORDER BY doc_id""",
    "q20_lang_id_facets" ->
      s"""$oracleLangScores
         SELECT lang, predicted, count(*) AS n
         FROM p GROUP BY lang, predicted ORDER BY lang, predicted""",
    "q21_doc_fingerprints" ->
      s"""WITH sh4 AS (
           SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
               AS shingle FROM (
             SELECT doc_id, $oracleWords AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 3)) AS i) t),
         mh AS (SELECT doc_id, min(md5(shingle)) AS sketch
                FROM sh4 GROUP BY doc_id)
         SELECT d.doc_id,
           md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fp,
           mh.sketch AS sketch
         FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    "q22_exact_dup_stats" ->
      """SELECT
         CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
           AS duplicate_rows,
         count(*) AS distinct_texts,
         CAST(coalesce(sum(n), 0) AS BIGINT) AS total_rows
         FROM (SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                 AS fp, count(*) AS n
               FROM documents GROUP BY 1)""",
    "q23_ngram_jaccard_pairs" ->
      s"""$oracleShingleCte,
         ${oracleJaccardSelect("", includeCommon = true)}""",
    "q24_minhash_lsh_pairs" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes,
         ${oracleJaccardSelect(
        "JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id",
        includeCommon = false)}""",
    "q25_simhash_fingerprints" ->
      s"""$oracleSimhashCte
         SELECT doc_id, simhash_hex FROM sh ORDER BY doc_id""",
    "q26_simhash_pairs" ->
      s"""$oracleSimhashCte
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
             AS INT) AS hamming
         FROM shp a JOIN shp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         ORDER BY id_a, id_b""",
    "q27_embedding_neardup" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cents AS (SELECT vec_id AS cid, v AS cv FROM e
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT 32),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN cents c) WHERE rn <= 3),
         cands AS (
           SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
           FROM assign a JOIN assign b
             ON a.cid = b.cid AND a.vec_id < b.vec_id)
         SELECT ida AS id_a, idb AS id_b,
           ${oracleCos("a.v", "b.v")} AS sim
         FROM cands JOIN e a ON a.vec_id = ida JOIN e b ON b.vec_id = idb
         WHERE ${oracleCos("a.v", "b.v")} >= 0.45
         ORDER BY id_a, id_b""",
    "q28_ann_bruteforce" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         s AS (
           SELECT qid, e.vec_id AS nid, ${oracleCos("qv", "e.v")} AS sim
           FROM q CROSS JOIN e WHERE qid <> e.vec_id),
         r AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    // replays quantizeInt8's exact arithmetic: q_i = round(x_i /
    // (max|x|/127)); codes are small exact integers, so the cosine —
    // scales cancel — matches the Spark side bit-for-bit at 4 decimals
    "q105_ann_int8" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         qz AS (
           SELECT vec_id,
             CASE WHEN coalesce(
                 list_max(list_transform(v, x -> abs(x))), 0.0) = 0.0
               THEN list_transform(v, x -> 0.0)
               ELSE list_transform(v, x -> round(x /
                 (list_max(list_transform(v, y -> abs(y))) / 127.0)))
             END AS qv
           FROM e),
         q AS (SELECT vec_id AS qid, qv FROM qz WHERE vec_id < 10),
         s AS (
           SELECT qid, z.vec_id AS nid, ${oracleCos("q.qv", "z.qv")} AS sim
           FROM q CROSS JOIN qz z WHERE qid <> z.vec_id),
         r AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    "q29_ann_ivf" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cents AS (SELECT vec_id AS cid, v AS cv FROM e
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT 16),
         assign AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         probes AS (
           SELECT qid, qv, cid FROM (
             SELECT q.qid, q.qv, c.cid, row_number() OVER (
               PARTITION BY q.qid
               ORDER BY ${oracleCos("q.qv", "c.cv")} DESC, c.cid ASC) AS rn
             FROM q CROSS JOIN cents c) WHERE rn <= 3),
         s AS (
           SELECT qid, a.vec_id AS nid, ${oracleCos("qv", "a.v")} AS sim
           FROM probes p JOIN assign a ON a.cid = p.cid
           WHERE a.vec_id <> qid),
         r AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    "q30_binary_fingerprints" ->
      """SELECT doc_id,
         'application/octet-stream' AS mime,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         md5(text) AS fingerprint,
         CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_chunks
         FROM documents ORDER BY doc_id""",
    "q31_corpus_prep" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         $oracleDedupKeptCtes,
         ${oracleMetricsCtes("kept")},
         qf AS (SELECT * FROM q WHERE quality >= 0.3),
         ${oracleLangCtes("qf")}
         SELECT predicted, count(*) AS n_docs,
           round(avg(quality), 4) AS avg_quality
         FROM p GROUP BY predicted ORDER BY predicted""",
    "q32_order_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
         CAST(2 * GROUPING(o_orderpriority) + GROUPING(o_orderstatus)
           AS INT) AS gid,
         count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY CUBE(o_orderpriority, o_orderstatus)
         ORDER BY gid, o_orderpriority, o_orderstatus""",
    "q33_asof_prior_event" ->
      """WITH p AS (
           SELECT event_id, ts, user_id, round(value, 2) AS value
           FROM events WHERE event_type = 'purchase'),
         cand AS (
           SELECT p.event_id, e.event_id AS asof_event_id,
             e.event_type AS asof_event_type,
             row_number() OVER (PARTITION BY p.event_id
               ORDER BY e.ts DESC, e.event_id DESC) AS rn
           FROM p JOIN events e
             ON e.user_id = p.user_id AND e.ts < p.ts)
         SELECT p.event_id, p.user_id, p.value,
           c.asof_event_id, c.asof_event_type
         FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
           USING (event_id)
         ORDER BY event_id""",
    "q34_event_sessions" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_s
           FROM events),
         sess AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q35_customer_running_totals" ->
      """SELECT o_custkey, o_orderkey,
         CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING), 2) AS running_total,
         round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
         CAST(row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
         FROM orders
         ORDER BY o_custkey, order_seq""",
    "q37_events_sliding" ->
      """SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts)
             - k * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) offsets
         GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q36_acctbal_percentiles" ->
      """SELECT c_mktsegment,
         round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
         round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
         round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
         count(*) AS n
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // q38: the oracle recomputes the header fields straight from the
    // doc_id formulas — Spark must round-trip them through actual PNG
    // header bytes (hex-assemble → unhex → parse), so an encode or
    // decode defect on either side breaks the match.
    "q38_png_header_decode" ->
      """SELECT doc_id,
         'png' AS format,
         CAST(doc_id % 64 + 16 AS BIGINT) AS width,
         CAST(doc_id % 48 + 8 AS BIGINT) AS height,
         CAST(8 AS INT) AS bit_depth,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                   WHEN doc_id % 3 = 1 THEN 3
                   ELSE 4 END AS INT) AS channels
         FROM documents ORDER BY doc_id""",
    // q39: DuckDB has no image codec, but it doesn't need one — the
    // synthetic PNG's pixel (x,y) is fixed arithmetic of (x,y,seed)
    // (Multimodal.syntheticPng), so the oracle reconstructs the channel
    // sums in closed form: r = x*7+seed and b = x+y+5*seed never wrap
    // at these dims (≤216, ≤82 < 256); g = (y*11+3*seed) % 256 can wrap
    // → summed per-y via a list comprehension. The REAL cast replays
    // the decoder's double→float truncation bit-for-bit.
    "q39_image_pixel_stats" ->
      """WITH p AS (
           SELECT doc_id,
             CAST(doc_id % 24 + 8 AS INT) AS width,
             CAST(doc_id % 16 + 8 AS INT) AS height,
             doc_id % 7 AS seed
           FROM documents),
         s AS (
           SELECT doc_id, width, height,
             height * (7 * width * (width-1) // 2 + width * seed)
               AS sum_r,
             width * list_sum([ (y*11 + 3*seed) % 256
               FOR y IN range(0, CAST(height AS BIGINT)) ]) AS sum_g,
             width * height * 5 * seed + height * (width*(width-1) // 2)
               + width * (height*(height-1) // 2) AS sum_b
           FROM p)
         SELECT doc_id, width, height,
           round(CAST(CAST(CAST(sum_r AS DOUBLE) / (width*height) / 255.0
             AS REAL) AS DOUBLE), 4) AS mean_r,
           round(CAST(CAST(CAST(sum_g AS DOUBLE) / (width*height) / 255.0
             AS REAL) AS DOUBLE), 4) AS mean_g,
           round(CAST(CAST(CAST(sum_b AS DOUBLE) / (width*height) / 255.0
             AS REAL) AS DOUBLE), 4) AS mean_b
         FROM s ORDER BY doc_id""",
    "q40_ann_kmedians" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         dims AS (
           SELECT unnest(range(1, 1 + (SELECT max(len(v)) FROM e)))
             AS pos),
         c0 AS (SELECT vec_id AS cid, v AS cv FROM e
                ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                LIMIT 16),
         a1 AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN c0 c) WHERE rn = 1),
         m1 AS (
           SELECT cid, pos, round(median(v[pos]), 6) AS m
           FROM a1 CROSS JOIN dims GROUP BY cid, pos),
         c1 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m1
                GROUP BY cid),
         a2 AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN c1 c) WHERE rn = 1),
         m2 AS (
           SELECT cid, pos, round(median(v[pos]), 6) AS m
           FROM a2 CROSS JOIN dims GROUP BY cid, pos),
         c2 AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m2
                GROUP BY cid),
         assign AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN c2 c) WHERE rn = 1),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         probes AS (
           SELECT qid, qv, cid FROM (
             SELECT q.qid, q.qv, c.cid, row_number() OVER (
               PARTITION BY q.qid
               ORDER BY ${oracleCos("q.qv", "c.cv")} DESC, c.cid ASC) AS rn
             FROM q CROSS JOIN c2 c) WHERE rn <= 3),
         s AS (
           SELECT qid, a.vec_id AS nid, ${oracleCos("qv", "a.v")} AS sim
           FROM probes p JOIN assign a ON a.cid = p.cid
           WHERE a.vec_id <> qid),
         r AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    "q41_hash_split" ->
      """WITH s AS (
           SELECT *, CAST(('0x' || substr(
               md5('split' || CAST(o_orderkey AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 AS h
           FROM orders),
         lab AS (
           SELECT *, CASE WHEN h < 0.8 THEN 'train'
                          WHEN h < 0.9 THEN 'val'
                          ELSE 'test' END AS split
           FROM s)
         SELECT split, count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS sum_price
         FROM lab GROUP BY split ORDER BY split""",
    "q42_stratified_sample" ->
      """WITH h AS (
           SELECT *, CAST(('0x' || substr(
               md5('sample' || CAST(o_orderkey AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 AS hf
           FROM orders),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY hf ASC, o_orderkey ASC) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM h)
         SELECT o_orderpriority, count(*) AS n_sampled,
           round(sum(CAST(o_orderkey AS DOUBLE)), 1) AS key_sum
         FROM r WHERE rn <= ceil(n * 0.1)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q43_normalize_redact" ->
      """WITH r AS (
           SELECT doc_id, text,
             regexp_replace(regexp_replace(regexp_replace(
               text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                 || '@example.com, call 555-123-4567 or 123-45-6789.',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
               '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS red
           FROM documents)
         SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g'))) AS norm_md5,
           md5(red) AS redacted_md5,
           CAST(len(regexp_extract_all(red, '<(EMAIL|PHONE|SSN)>'))
             AS INT) AS n_pii
         FROM r ORDER BY doc_id""",
    "q44_top_bigrams" ->
      """WITH w AS (
           SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         b AS (
           SELECT ws[i] || ' ' || ws[i+1] AS bigram FROM w,
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t)
         SELECT bigram, count(*) AS n FROM b
         GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 15""",
    "q45_range_join_bands" ->
      """WITH bands AS (
           SELECT i AS band_id, i * 25000.0 AS lo,
             i * 25000.0 + 40000.0 AS hi
           FROM (SELECT unnest(range(0, 20)) AS i))
         SELECT band_id, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
         FROM bands JOIN orders
           ON o_totalprice >= lo AND o_totalprice < hi
         GROUP BY band_id ORDER BY band_id""",
    // within_5pct = 1 on the oracle side is an ASSERTION on the Spark
    // HLL estimate's error, not a tautology: if the estimate drifts
    // past 5% the hash compare fails.
    "q46_approx_distinct" ->
      """SELECT event_type,
         count(DISTINCT user_id) AS n_exact,
         CAST(1 AS INT) AS within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",
    // analytic roundtrip: the synthesized square wave's RMS and peak
    // are exactly its amplitude, so the oracle needs no audio codec
    "q47_wav_roundtrip" ->
      """SELECT doc_id,
         CAST(1 AS INT) AS channels,
         CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
         CAST(400 + (doc_id % 5) * 200 AS BIGINT) AS n_samples,
         CAST(1000 + (doc_id % 20) * 1500 AS INT) AS peak,
         CAST(1000 + (doc_id % 20) * 1500 AS DOUBLE) AS rms
         FROM documents ORDER BY doc_id""",
    "q48_event_attribution" ->
      """WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
         p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT v.ts AS l_ts, p.ts AS r_ts, v.user_id
           FROM v JOIN p ON v.user_id = p.user_id
             AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE)
         SELECT strftime(date_trunc('hour', l_ts),
             '%Y-%m-%d %H:%M:%S') AS hour,
           count(*) AS n_pairs,
           count(DISTINCT user_id) AS n_users,
           round(avg(CAST(epoch_us(r_ts) - epoch_us(l_ts) AS DOUBLE)
             / 1e6), 4) AS avg_gap_sec
         FROM j GROUP BY 1 ORDER BY hour""",
    "q49_group_sample" ->
      """WITH h AS (
           SELECT *, CAST(('0x' || substr(
               md5('sample' || CAST(o_orderkey AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 AS hf
           FROM orders),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY hf ASC, o_orderkey ASC) AS rn
           FROM h)
         SELECT o_orderpriority, count(*) AS n_sampled,
           round(sum(CAST(o_orderkey AS DOUBLE)), 1) AS key_sum
         FROM r WHERE rn <= 5
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // q46-style in-query assertion: the constants are claims about the
    // deflate signal that must hold for EVERY document
    "q50_compress_quality" ->
      """SELECT count(*) AS n_docs,
         CAST(1 AS INT) AS all_ratios_bounded,
         CAST(1 AS INT) AS all_doubling_compresses
         FROM documents
         WHERE text IS NOT NULL AND length(text) > 0""",
    "q51_incremental_dedup" ->
      """WITH fp AS (
           SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
           FROM documents),
         corpus AS (SELECT DISTINCT f FROM fp WHERE doc_id % 5 = 0),
         batch AS (
           SELECT doc_id, f, row_number() OVER (PARTITION BY f
             ORDER BY doc_id) AS rn
           FROM fp WHERE doc_id % 5 <> 0),
         newdocs AS (
           SELECT doc_id FROM batch
           WHERE rn = 1 AND f NOT IN (SELECT f FROM corpus))
         SELECT count(*) AS n_new,
           round(sum(CAST(doc_id AS DOUBLE)), 1) AS id_sum
         FROM newdocs""",
    "q52_supplier_by_region" ->
      """SELECT r_name,
         count(*) AS n_suppliers,
         round(sum(s_acctbal), 2) AS total_balance,
         round(avg(s_acctbal), 4) AS avg_balance
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q53_event_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY 1 ORDER BY day""",
    "q54_supplier_rollup" ->
      """SELECT r_name, n_name,
         CAST(2 * GROUPING(r_name) + GROUPING(n_name) AS INT) AS gid,
         count(*) AS n_suppliers,
         round(sum(s_acctbal), 2) AS total_balance
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS LAST, n_name NULLS LAST""",
    "q55_price_outliers" ->
      """WITH s AS (
           SELECT o_orderpriority, avg(o_totalprice) AS mu,
             stddev_samp(o_totalprice) AS sd
           FROM orders GROUP BY 1)
         SELECT o.o_orderpriority, count(*) AS n_outliers,
           round(max(o_totalprice), 2) AS max_price
         FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
         WHERE round(abs(o_totalprice - mu) / sd, 4) >= 1.5
         GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
    "q56_top_orders_per_priority" ->
      """SELECT o_orderpriority, o_orderkey,
         round(o_totalprice, 2) AS o_totalprice,
         CAST(rn AS INT) AS rank
         FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_orderpriority, rank""",
    "q57_acctbal_deciles" ->
      """SELECT c_mktsegment, CAST(decile AS INT) AS decile,
         count(*) AS n,
         round(min(c_acctbal), 2) AS lo,
         round(max(c_acctbal), 2) AS hi
         FROM (
           SELECT c_mktsegment, c_acctbal,
             ntile(10) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
           FROM customer)
         GROUP BY c_mktsegment, decile
         ORDER BY c_mktsegment, decile""",
    "q58_tfidf_terms" ->
      """WITH w AS (
           SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM w GROUP BY 1, 2),
         dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT doc_id, token,
             round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
           FROM tf JOIN dfq USING (token) CROSS JOIN n),
         r AS (
           SELECT doc_id, token, tfidf, CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, token ASC)
             AS INT) AS rank
           FROM scored WHERE doc_id < 5)
         SELECT doc_id, token, tfidf, rank FROM r
         WHERE rank <= 3 ORDER BY doc_id, rank""",
    "q59_token_shards" ->
      s"""WITH d AS (
           SELECT doc_id, len($oracleWords) AS tok FROM documents),
         c AS (
           SELECT doc_id, tok,
             sum(tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
               AS strt
           FROM d)
         SELECT CAST(floor(strt / 5000.0) AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS shard_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY 1 ORDER BY shard""",
    "q60_lang_token_budget" ->
      s"""WITH ${oracleMetricsCtes("documents")},
         ${oracleLangCtes("q")},
         sel AS (
           SELECT predicted, doc_id, tokens,
             sum(tokens) OVER (PARTITION BY predicted
               ORDER BY round(quality, 4) DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM p)
         SELECT predicted, count(*) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS sum_tokens,
           round(sum(CAST(doc_id AS DOUBLE)), 1) AS id_sum
         FROM sel WHERE cum <= 2000
         GROUP BY predicted ORDER BY predicted""",
    "q61_doc_chunks" ->
      s"""WITH d AS (
           SELECT doc_id, $oracleWords AS ws FROM documents),
         n AS (
           SELECT doc_id, ws, len(ws) AS t FROM d WHERE len(ws) > 0),
         c AS (
           SELECT doc_id, ws,
             unnest(generate_series(0,
               greatest(0, CAST(ceil((t - 64) / 56.0) AS BIGINT))))
               AS chunk_idx
           FROM n),
         ch AS (
           SELECT doc_id, chunk_idx,
             ws[chunk_idx * 56 + 1 : chunk_idx * 56 + 64] AS chunk
           FROM c)
         SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM ch ORDER BY doc_id, chunk_idx""",
    "q62_weighted_order_sample" ->
      """WITH s AS (
           SELECT o_orderkey, o_totalprice,
             ln(CAST(('0x' || substr(
                 md5('wsample' || CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0) / o_totalprice AS k
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
         top AS (
           SELECT o_orderkey, o_totalprice FROM s
           ORDER BY k DESC, o_orderkey ASC LIMIT 20)
         SELECT o_orderkey, o_totalprice FROM top ORDER BY o_orderkey""",
    "q63_video_meta" ->
      """WITH v AS (
           SELECT doc_id,
             CAST(doc_id % 3 * 300 + 600 AS BIGINT) AS timescale,
             CAST((doc_id % 50 + 1) * 600 AS BIGINT) AS duration_ticks
           FROM documents),
         d AS (
           SELECT *, CAST(duration_ticks AS DOUBLE) / timescale AS dur
           FROM v)
         SELECT doc_id, 'mp4' AS format, 'isom' AS brand,
           timescale, duration_ticks,
           round(dur, 4) AS duration_sec,
           CAST(8 AS INT) AS n_frames,
           round(dur * 1 / 16.0, 4) AS first_ts,
           round(dur * 15 / 16.0, 4) AS last_ts
         FROM d ORDER BY doc_id""",
    "q64_contamination" ->
      s"""WITH sh AS (
           SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
               ws[i+3] || ' ' || ws[i+4] AS shingle FROM (
             SELECT doc_id, $oracleWords AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 4))
               AS i) t),
         bench AS (SELECT doc_id AS benchmark_id, shingle FROM sh
                   WHERE doc_id % 10 = 0),
         corpus AS (SELECT doc_id AS corpus_id, shingle FROM sh
                    WHERE doc_id % 10 <> 0)
         SELECT corpus_id, benchmark_id, count(*) AS common_ngrams
         FROM corpus JOIN bench USING (shingle)
         GROUP BY corpus_id, benchmark_id
         HAVING count(*) >= 5
         ORDER BY corpus_id, benchmark_id""",
    // the QUALIFY window replays the Spark side's benchmark-DF cap:
    // shingles in >1 benchmark doc drop BEFORE the join
    "q103_contamination_capped" ->
      s"""WITH sh AS (
           SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM (
             SELECT doc_id, $oracleWords AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 2))
               AS i) t),
         bench AS (SELECT doc_id AS benchmark_id, shingle FROM sh
                   WHERE doc_id % 10 = 0
                   QUALIFY count(*) OVER (PARTITION BY shingle) <= 1),
         corpus AS (SELECT doc_id AS corpus_id, shingle FROM sh
                    WHERE doc_id % 10 <> 0)
         SELECT corpus_id, benchmark_id, count(*) AS common_ngrams
         FROM corpus JOIN bench USING (shingle)
         GROUP BY corpus_id, benchmark_id
         HAVING count(*) >= 3
         ORDER BY corpus_id, benchmark_id""",
    // islands trick replayed: consecutive shared 5-grams share a
    // diagonal (pa-pb); group key pa - row_number is constant per run
    "q106_shared_spans" ->
      s"""WITH tok AS (
           SELECT doc_id, $oracleWords AS ws FROM documents),
         kg AS (
           SELECT doc_id, i AS pos,
             md5(array_to_string(ws[i:i+4], ' ')) AS h
           FROM tok, LATERAL (SELECT unnest(
             generate_series(1, len(ws) - 4)) AS i) t),
         hdf AS (SELECT h FROM (
             SELECT h, count(DISTINCT doc_id) AS df FROM kg GROUP BY h)
           WHERE df <= 10),
         kgc AS (SELECT kg.* FROM kg JOIN hdf USING (h)),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pa, b.pos AS pb
           FROM kgc a JOIN kgc b USING (h) WHERE a.doc_id < b.doc_id),
         runs AS (
           SELECT id_a, id_b, count(*) AS run FROM (
             SELECT id_a, id_b, pa - pb AS diag,
               pa - row_number() OVER (
                 PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS grp
             FROM p) GROUP BY id_a, id_b, diag, grp)
         SELECT id_a, id_b, max(run) + 4 AS max_span_tokens
         FROM runs GROUP BY id_a, id_b
         HAVING max(run) + 4 >= 8
         ORDER BY id_a, id_b""",
    "q107_temperature_mixture" ->
      """WITH g AS (
           SELECT lang AS grp, CAST(count(*) AS DOUBLE) AS n
           FROM documents GROUP BY lang),
         t AS (SELECT sum(n) AS tot FROM g),
         pz AS (
           SELECT grp, n, n / tot AS p, pow(n / tot, 0.5) AS pa
           FROM g CROSS JOIN t),
         z AS (SELECT sum(pa) AS zn FROM pz)
         SELECT grp AS "group", CAST(n AS BIGINT) AS n_docs,
           round(p, 6) AS p, round(pa / zn, 6) AS q,
           round(pa / zn / p, 6) AS weight
         FROM pz CROSS JOIN z ORDER BY "group"""",
    "q108_winsorized_prices" ->
      """WITH cuts AS (
           SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
           FROM orders GROUP BY o_orderpriority),
         w AS (
           SELECT o.o_orderpriority, o.o_totalprice,
             least(greatest(o.o_totalprice, c.lo), c.hi) AS wv
           FROM orders o JOIN cuts c USING (o_orderpriority))
         SELECT o_orderpriority, count(*) AS n,
           round(sum(wv - o_totalprice), 1) AS clip_delta,
           round(min(wv), 2) AS min_w,
           round(max(wv), 2) AS max_w
         FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // 1-based twin of the boundary rule: a cut after 1-based end
    // position j in [3, len-1] when the md5-prefix int of the 3-gram
    // ending there lands in class 0 mod 32; last position excluded
    "q109_content_chunks" ->
      s"""WITH tok AS (
           SELECT doc_id, $oracleWords AS ws FROM documents
           WHERE len($oracleWords) > 0),
         b AS (
           SELECT doc_id, ws,
             list_filter(generate_series(3, len(ws) - 1), j ->
               (('0x' || substr(md5(array_to_string(ws[j-2:j], ' ')),
                 1, 8))::BIGINT % 32) = 0) AS bs
           FROM tok),
         c AS (
           SELECT doc_id, ws,
             list_prepend(1, list_transform(bs, j -> j + 1)) AS ss,
             list_append(bs, len(ws)) AS es
           FROM b),
         ch AS (
           SELECT doc_id, i - 1 AS chunk_idx,
             es[i] - ss[i] + 1 AS n_tokens,
             md5(array_to_string(ws[ss[i]:es[i]], ' ')) AS chunk_md5
           FROM c, LATERAL (SELECT unnest(
             generate_series(1, len(ss))) AS i) t)
         SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(n_tokens AS BIGINT) AS n_tokens, chunk_md5
         FROM ch ORDER BY doc_id, chunk_idx""",
    // asymmetric replay of the q24 minhash/banding construction:
    // batch-side bands probe corpus-side bands, candidates verify by
    // exact Jaccard over the full shingle sets
    "q110_neardup_incremental" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes,
         xc AS (
           SELECT DISTINCT bb.doc_id AS bid, cb.doc_id AS cid
           FROM bands bb JOIN bands cb
             ON bb.band = cb.band AND bb.sig = cb.sig
           WHERE bb.doc_id % 3 = 0 AND cb.doc_id % 3 <> 0),
         common AS (
           SELECT x.doc_id AS bid, y.doc_id AS cid, count(*) AS common
           FROM sh x JOIN sh y ON x.shingle = y.shingle
           JOIN xc ON xc.bid = x.doc_id AND xc.cid = y.doc_id
           GROUP BY 1, 2)
         SELECT bid AS batch_id, cid AS corpus_id,
           round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 4)
             AS jaccard
         FROM common
         JOIN sizes sa ON sa.doc_id = bid
         JOIN sizes sb ON sb.doc_id = cid
         WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8
         ORDER BY batch_id, corpus_id""",
    "q111_key_skew" ->
      """WITH ctx AS (
           SELECT count(lang) AS nr, count(DISTINCT lang) AS nk
           FROM documents),
         h AS (
           SELECT CAST(lang AS VARCHAR) AS key, count(*) AS cnt
           FROM documents WHERE lang IS NOT NULL GROUP BY lang)
         SELECT key, cnt AS n_rows_key,
           round(CAST(cnt AS DOUBLE) / nr, 6) AS fraction,
           nr AS n_rows, nk AS n_keys,
           round(CAST(cnt AS DOUBLE) * nk / nr, 4) AS skew_ratio
         FROM h CROSS JOIN ctx
         WHERE CAST(cnt AS DOUBLE) > 0.05 * nr
         ORDER BY key""",
    // full PQ replay: per-block training chains (hash-init k-medians,
    // the q40 treatment ×4 sub-spaces), L2-argmin codes, then ADC —
    // dot and norm² reassembled from per-block codeword lookups
    "q112_ann_pq" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         ${(0 until 4).map(b => oraclePqBlock(b, 16, 16)).mkString(",\n")},
         ncodes AS (
           SELECT e.vec_id, enc0.code AS k0, enc1.code AS k1,
             enc2.code AS k2, enc3.code AS k3
           FROM e
           JOIN enc0 ON enc0.vec_id = e.vec_id
           JOIN enc1 ON enc1.vec_id = e.vec_id
           JOIN enc2 ON enc2.vec_id = e.vec_id
           JOIN enc3 ON enc3.vec_id = e.vec_id),
         q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
         s AS (
           SELECT q.vec_id AS qid, n.vec_id AS nid,
             round((list_dot_product(q.v[1:16], b0.cv)
                 + list_dot_product(q.v[17:32], b1.cv)
                 + list_dot_product(q.v[33:48], b2.cv)
                 + list_dot_product(q.v[49:64], b3.cv))
               / nullif(sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(b0.cv, b0.cv)
                   + list_dot_product(b1.cv, b1.cv)
                   + list_dot_product(b2.cv, b2.cv)
                   + list_dot_product(b3.cv, b3.cv)), 0.0), 4) AS sim
           FROM q CROSS JOIN ncodes n
           JOIN cb0 b0 ON b0.code = n.k0
           JOIN cb1 b1 ON b1.code = n.k1
           JOIN cb2 b2 ON b2.code = n.k2
           JOIN cb3 b3 ON b3.code = n.k3
           WHERE n.vec_id <> q.vec_id),
         r AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    "q113_ann_ivfpq" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         ${(0 until 4).map(b => oraclePqBlock(b, 16, 16)).mkString(",\n")},
         ncodes AS (
           SELECT e.vec_id, enc0.code AS k0, enc1.code AS k1,
             enc2.code AS k2, enc3.code AS k3
           FROM e
           JOIN enc0 ON enc0.vec_id = e.vec_id
           JOIN enc1 ON enc1.vec_id = e.vec_id
           JOIN enc2 ON enc2.vec_id = e.vec_id
           JOIN enc3 ON enc3.vec_id = e.vec_id),
         ccents AS (
           SELECT vec_id AS ccid, v AS ccv FROM e
           ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
           LIMIT 16),
         cassign AS (
           SELECT vec_id, ccid FROM (
             SELECT e.vec_id, c.ccid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.ccv")} DESC, c.ccid ASC)
               AS rn
             FROM e CROSS JOIN ccents c) WHERE rn = 1),
         q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
         probes AS (
           SELECT qid, ccid FROM (
             SELECT q.vec_id AS qid, c.ccid, row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY ${oracleCos("q.v", "c.ccv")} DESC, c.ccid ASC)
               AS rn
             FROM q CROSS JOIN ccents c) WHERE rn <= 3),
         s AS (
           SELECT q.vec_id AS qid, n.vec_id AS nid,
             round((list_dot_product(q.v[1:16], b0.cv)
                 + list_dot_product(q.v[17:32], b1.cv)
                 + list_dot_product(q.v[33:48], b2.cv)
                 + list_dot_product(q.v[49:64], b3.cv))
               / nullif(sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(b0.cv, b0.cv)
                   + list_dot_product(b1.cv, b1.cv)
                   + list_dot_product(b2.cv, b2.cv)
                   + list_dot_product(b3.cv, b3.cv)), 0.0), 4) AS sim
           FROM q
           JOIN probes p ON p.qid = q.vec_id
           JOIN cassign ca ON ca.ccid = p.ccid
           JOIN ncodes n ON n.vec_id = ca.vec_id
           JOIN cb0 b0 ON b0.code = n.k0
           JOIN cb1 b1 ON b1.code = n.k1
           JOIN cb2 b2 ON b2.code = n.k2
           JOIN cb3 b3 ON b3.code = n.k3
           WHERE n.vec_id <> q.vec_id),
         r AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    "q114_chunk_incremental" ->
      s"""WITH newdoc AS (
           SELECT doc_id, CASE WHEN doc_id % 10 = 0
             THEN text || ' edit pass appended new sentence'
             ELSE text END AS text
           FROM documents),
         ${oracleChunkCtes("p", "documents", 32)},
         ${oracleChunkCtes("n", "newdoc", 32)},
         kq AS (
           SELECT doc_id, chunk_idx, n_tokens, chunk_md5,
             row_number() OVER (PARTITION BY chunk_md5
               ORDER BY doc_id ASC, chunk_idx ASC) AS rn
           FROM nch)
         SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(n_tokens AS BIGINT) AS n_tokens, chunk_md5
         FROM kq WHERE rn = 1
           AND chunk_md5 NOT IN (SELECT chunk_md5 FROM pch)
         ORDER BY doc_id, chunk_idx""",
    // the salted join/sum must be result-identical to the plain
    // rollup — the oracle IS the unsalted form
    "q115_salted_lang_rollup" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
         FROM documents WHERE lang IS NOT NULL
         GROUP BY lang ORDER BY lang""",
    // residual IVF-PQ replay: q113's coarse assignment, then the PQ
    // chains train/encode over the RESIDUAL x − c (CTE r), and ADC
    // reassembles cosine(q, c + r̂) from per-block lookups — all sums
    // in the engine's block order (left-assoc from 0.0)
    "q116_ann_ivfrpq" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         ccents AS (
           SELECT vec_id AS ccid, v AS ccv FROM e
           ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
           LIMIT 16),
         cassign AS (
           SELECT vec_id, ccid FROM (
             SELECT e.vec_id, c.ccid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.ccv")} DESC, c.ccid ASC)
               AS rn
             FROM e CROSS JOIN ccents c) WHERE rn = 1),
         res AS (
           SELECT e.vec_id,
             list_transform(generate_series(1, 64),
               i -> e.v[i] - c.ccv[i]) AS v
           FROM e
           JOIN cassign ca ON ca.vec_id = e.vec_id
           JOIN ccents c ON c.ccid = ca.ccid),
         ${(0 until 4).map(b => oraclePqBlock(b, 16, 16, src = "res"))
            .mkString(",\n")},
         ncodes AS (
           SELECT e.vec_id, enc0.code AS k0, enc1.code AS k1,
             enc2.code AS k2, enc3.code AS k3
           FROM e
           JOIN enc0 ON enc0.vec_id = e.vec_id
           JOIN enc1 ON enc1.vec_id = e.vec_id
           JOIN enc2 ON enc2.vec_id = e.vec_id
           JOIN enc3 ON enc3.vec_id = e.vec_id),
         q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
         probes AS (
           SELECT qid, ccid FROM (
             SELECT q.vec_id AS qid, c.ccid, row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY ${oracleCos("q.v", "c.ccv")} DESC, c.ccid ASC)
               AS rn
             FROM q CROSS JOIN ccents c) WHERE rn <= 3),
         s AS (
           SELECT q.vec_id AS qid, n.vec_id AS nid,
             round((list_dot_product(q.v, c.ccv)
                 + (0.0 + list_dot_product(q.v[1:16], b0.cv)
                     + list_dot_product(q.v[17:32], b1.cv)
                     + list_dot_product(q.v[33:48], b2.cv)
                     + list_dot_product(q.v[49:64], b3.cv)))
               / nullif(sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(c.ccv, c.ccv)
                   + 2.0 * (0.0
                     + list_dot_product(c.ccv[1:16], b0.cv)
                     + list_dot_product(c.ccv[17:32], b1.cv)
                     + list_dot_product(c.ccv[33:48], b2.cv)
                     + list_dot_product(c.ccv[49:64], b3.cv))
                   + (0.0 + list_dot_product(b0.cv, b0.cv)
                     + list_dot_product(b1.cv, b1.cv)
                     + list_dot_product(b2.cv, b2.cv)
                     + list_dot_product(b3.cv, b3.cv))), 0.0), 4) AS sim
           FROM q
           JOIN probes p ON p.qid = q.vec_id
           JOIN ccents c ON c.ccid = p.ccid
           JOIN cassign ca ON ca.ccid = p.ccid
           JOIN ncodes n ON n.vec_id = ca.vec_id
           JOIN cb0 b0 ON b0.code = n.k0
           JOIN cb1 b1 ON b1.code = n.k1
           JOIN cb2 b2 ON b2.code = n.k2
           JOIN cb3 b3 ON b3.code = n.k3
           WHERE n.vec_id <> q.vec_id),
         rk AS (
           SELECT qid, nid, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT) AS rank
           FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, sim, rank
         FROM rk WHERE rank <= 10 ORDER BY query_id, rank""",
    // recall audit: q28's exact top-10 LEFT JOIN q29's routed top-10
    // per query — misses lower recall, approx-side false positives
    // don't (the audit measures what routing LOSES)
    "q117_ann_recall_audit" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         bs AS (
           SELECT qid, e.vec_id AS nid, ${oracleCos("qv", "e.v")} AS sim
           FROM q CROSS JOIN e WHERE qid <> e.vec_id),
         br AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
             FROM bs) WHERE rank <= 10),
         cents AS (SELECT vec_id AS cid, v AS cv FROM e
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT 16),
         assign AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
         probes AS (
           SELECT qid, qv, cid FROM (
             SELECT q.qid, q.qv, c.cid, row_number() OVER (
               PARTITION BY q.qid
               ORDER BY ${oracleCos("q.qv", "c.cv")} DESC, c.cid ASC) AS rn
             FROM q CROSS JOIN cents c) WHERE rn <= 3),
         vs AS (
           SELECT qid, a.vec_id AS nid, ${oracleCos("qv", "a.v")} AS sim
           FROM probes p JOIN assign a ON a.cid = p.cid
           WHERE a.vec_id <> qid),
         vr AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
             FROM vs) WHERE rank <= 10)
         SELECT br.qid AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(vr.nid) AS BIGINT) AS n_hit,
           round(CAST(count(vr.nid) AS DOUBLE) / count(*), 4) AS recall
         FROM br LEFT JOIN vr ON vr.qid = br.qid AND vr.nid = br.nid
         GROUP BY br.qid ORDER BY query_id""",
    // LSH coverage audit: exact-Jaccard ≥ 0.8 pairs (q23's uncapped
    // oracle form) LEFT JOIN the banded candidates (q24's cands CTE)
    "q118_lsh_recall_audit" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         ex AS (
           SELECT ida, idb FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8)
         SELECT ex.ida AS id_a,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(c.idb) AS BIGINT) AS n_hit,
           round(CAST(count(c.idb) AS DOUBLE) / count(*), 4) AS recall
         FROM ex LEFT JOIN cands c ON c.ida = ex.ida AND c.idb = ex.idb
         GROUP BY ex.ida ORDER BY id_a""",
    // containment = common / min(|A|, |B|): the asymmetric twin of
    // q23's Jaccard select over the same shingle CTEs
    "q119_ngram_containment" ->
      s"""$oracleShingleCte,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT ida AS id_a, idb AS id_b, common,
           round(CAST(common AS DOUBLE) / least(sa.n, sb.n), 4)
             AS containment
         FROM common
         JOIN sizes sa ON sa.doc_id = ida
         JOIN sizes sb ON sb.doc_id = idb
         WHERE CAST(common AS DOUBLE) / least(sa.n, sb.n) >= 0.6
         ORDER BY id_a, id_b""",
    // Broder estimator: per candidate pair, the fraction of the 16
    // Carter-Wegman signature components that agree
    "q120_minhash_jaccard_est" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes
         SELECT c.ida AS id_a, c.idb AS id_b,
           round((${(0 until 16).map(i =>
             s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)")
             .mkString(" + ")}) / 16.0, 4) AS est_jaccard
         FROM cands c
         JOIN sigs a ON a.doc_id = c.ida
         JOIN sigs b ON b.doc_id = c.idb
         ORDER BY id_a, id_b""",
    // asymmetric containment replay over the q110 split: batch-side
    // denominator only (|batch doc's shingles|)
    "q121_containment_incremental" ->
      s"""$oracleShingleCte,
         b AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 3 = 0),
         c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 3 <> 0),
         nb AS (SELECT doc_id, count(*) AS n FROM b GROUP BY doc_id),
         common AS (
           SELECT b.doc_id AS bid, c.doc_id AS cid, count(*) AS common
           FROM b JOIN c ON b.shingle = c.shingle GROUP BY 1, 2)
         SELECT bid AS batch_id, cid AS corpus_id, common,
           round(CAST(common AS DOUBLE) / nb.n, 4) AS containment
         FROM common JOIN nb ON nb.doc_id = bid
         WHERE CAST(common AS DOUBLE) / nb.n >= 0.8
         ORDER BY batch_id, corpus_id""",
    // full decode→pool→hash replay in integer arithmetic: synthetic
    // pixels are (x,y,seed) formulas (q39), milli-luma sums are
    // integers, dHash bits compare averages by cross-multiplication —
    // no float anywhere. All-pairs scoring matches the engine's banded
    // join because 4×16 banding is exact at distance <= 3.
    "q122_image_dhash_pairs" ->
      """WITH p AS (
           SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS w,
             CAST(doc_id % 16 + 8 AS INT) AS h,
             CAST(doc_id % 336 AS INT) AS seed
           FROM documents),
         xs AS (SELECT doc_id, w, h, seed, unnest(range(w)) AS x FROM p),
         px AS (SELECT doc_id, w, h, seed, x,
                  unnest(range(h)) AS y FROM xs),
         lum AS (
           SELECT doc_id,
             least(y * 8 // h, 7) AS cy, least(x * 9 // w, 8) AS cx,
             299 * ((x*(37 + 13*(seed%5)) + y*(23 + 7*(seed%3)) + seed)
                 % 256)
               + 587 * ((x*x*(seed%4 + 1) + y*29 + 2*seed) % 256)
               + 114 * ((x*53 + y*41 + x*y + 5*seed) % 256) AS ml
           FROM px),
         cells AS (
           SELECT doc_id, cy, cx, sum(ml) AS s, count(*) AS c
           FROM lum GROUP BY 1, 2, 3),
         bits AS (
           SELECT l.doc_id, l.cy, l.cx,
             CASE WHEN r.s * l.c > l.s * r.c THEN 1 ELSE 0 END AS bit
           FROM cells l JOIN cells r
             ON r.doc_id = l.doc_id AND r.cy = l.cy AND r.cx = l.cx + 1
           WHERE l.cx < 8),
         hs AS (
           SELECT doc_id,
             sum(CASE WHEN cy < 4 THEN
               bit * (CAST(1 AS BIGINT) << (31 - (cy*8 + cx)))
               ELSE 0 END) AS hi,
             sum(CASE WHEN cy >= 4 THEN
               bit * (CAST(1 AS BIGINT) << (31 - ((cy-4)*8 + cx)))
               ELSE 0 END) AS lo
           FROM bits GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
             AS INT) AS hamming
         FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         ORDER BY id_a, id_b""",
    // full SRP replay: perturb, quantize (the q105 CTE), project onto
    // 64 md5-derived sign rows (integer-valued terms -> exact sums),
    // pack bits, score batch-vs-corpus at hamming <= 3, verify cosine
    "q123_srp_neardup" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         b AS (
           SELECT vec_id, list_transform(range(len(v)), d ->
             v[d+1] + 0.01 * CAST((vec_id*7 + d) % 5 - 2 AS DOUBLE)) AS v
           FROM e WHERE vec_id % 10 = 0),
         allv AS (
           SELECT vec_id AS id, v FROM e
           UNION ALL SELECT vec_id + 1000000 AS id, v FROM b),
         $oracleSrpCtes,
         pr AS (
           SELECT a.id AS corpus_id, z.id - 1000000 AS batch_src,
             CAST(bit_count(xor(a.hi, z.hi))
               + bit_count(xor(a.lo, z.lo)) AS INT) AS hamming
           FROM hs a JOIN hs z ON a.id < 1000000 AND z.id >= 1000000
           WHERE bit_count(xor(a.hi, z.hi))
             + bit_count(xor(a.lo, z.lo)) <= 3)
         SELECT corpus_id, batch_src, hamming,
           ${oracleCos("e.v", "b.v")} AS cos
         FROM pr JOIN e ON e.vec_id = corpus_id
           JOIN b ON b.vec_id = batch_src
         ORDER BY corpus_id, batch_src""",
    "q124_unigram_lm_quality" ->
      s"""WITH t AS (
           SELECT doc_id, unnest($oracleWords) AS w FROM documents),
         cnt AS (SELECT w, count(*) AS n FROM t GROUP BY w),
         tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                   CAST(count(*) AS DOUBLE) AS vv FROM cnt),
         lm AS (SELECT w, ln((n + 0.5) / (nn + 0.5 * (vv + 1)))
                  AS logp FROM cnt, tot),
         dw AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
         sc AS (
           SELECT doc_id, sum(c) AS n_tokens,
             sum(c * logp) / sum(c) AS s
           FROM dw JOIN lm USING (w) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
           round(s, 4) AS lm_score
         FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    "q125_resample_ffill" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE ts IS NOT NULL),
         b AS (
           SELECT user_id,
             make_timestamp((epoch_us(ts) // 86400000000)
               * 86400000000) AS bucket_ts,
             avg(CAST(round(value * 100) AS BIGINT)) AS v
           FROM ev GROUP BY 1, 2),
         g AS (
           SELECT user_id, unnest(generate_series(lo, hi,
             INTERVAL 1 DAY)) AS bucket_ts
           FROM (SELECT user_id, min(bucket_ts) AS lo,
                   max(bucket_ts) AS hi FROM b GROUP BY 1)),
         f AS (
           SELECT g.user_id, g.bucket_ts, b.v,
             last_value(b.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value
           FROM g LEFT JOIN b
             ON b.user_id = g.user_id AND b.bucket_ts = g.bucket_ts)
         SELECT user_id, bucket_ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) / 10000.0 AS value,
           v IS NULL AS filled
         FROM f ORDER BY user_id, bucket_ts""",
    // q76's fuzzy pairs -> recursive-CTE transitive closure over the
    // matched names (min-label = lexicographic min) -> min-key
    // survivorship, replaying resolveEntities end to end
    "q126_entity_resolution" ->
      """WITH RECURSIVE names AS (
           SELECT DISTINCT p_name AS n FROM part),
         fp AS (
           SELECT a.n AS na, b.n AS nb
           FROM names a JOIN names b ON a.n < b.n
           WHERE levenshtein(a.n, b.n) <= 2),
         edges AS (SELECT na AS a, nb AS b FROM fp
                   UNION SELECT nb, na FROM fp),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (
           SELECT a AS n, least(a, min(b)) AS root
           FROM reach GROUP BY a),
         ent AS (
           SELECT p.p_partkey, p.p_name,
             coalesce(r.root, p.p_name) AS entity_name
           FROM part p LEFT JOIN roots r ON r.n = p.p_name),
         keys AS (
           SELECT entity_name, min(p_partkey) AS entity_key
           FROM ent GROUP BY 1)
         SELECT e.p_partkey, e.p_name, k.entity_key, e.entity_name
         FROM ent e JOIN keys k USING (entity_name)
         ORDER BY e.p_partkey""",
    // the q123 sketch replay, asymmetric: light perturbations
    // (vec_id%10=0) should match and drop, heavy ones (novel) survive;
    // survivors = batch minus (hamming<=3 AND unrounded cos>=0.98)
    "q127_srp_dedup_incremental" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         b AS (
           SELECT vec_id, list_transform(range(len(v)), d ->
             v[d+1] + (CASE WHEN vec_id % 10 = 0 THEN 0.01 ELSE 0.3 END)
               * CAST((vec_id*7 + d) % 5 - 2 AS DOUBLE)) AS v
           FROM e WHERE vec_id % 5 = 0),
         allv AS (
           SELECT vec_id AS id, v FROM e
           UNION ALL SELECT vec_id + 1000000 AS id, v FROM b),
         $oracleSrpCtes,
         matched AS (
           SELECT DISTINCT z.id - 1000000 AS vec_id
           FROM hs a JOIN hs z ON a.id < 1000000 AND z.id >= 1000000
           JOIN e ON e.vec_id = a.id
           JOIN b b2 ON b2.vec_id = z.id - 1000000
           WHERE bit_count(xor(a.hi, z.hi))
               + bit_count(xor(a.lo, z.lo)) <= 3
             AND ${oracleCosRaw("e.v", "b2.v")} >= 0.98)
         SELECT vec_id FROM b
         WHERE vec_id NOT IN (SELECT vec_id FROM matched)
         ORDER BY vec_id""",
    // the q31 kept-set (exact + near-dup survivorship) joined to
    // per-doc token counts; dup_token_frac is the unrounded
    // exact-long division (q137's argument)
    "q149_dedup_token_budget" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         $oracleDedupKeptCtes,
         tok AS (
           SELECT doc_id, lang, len($oracleWords) AS nt
           FROM documents),
         raw AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS raw_tokens
           FROM tok GROUP BY lang),
         keptt AS (
           SELECT t.lang, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(t.nt) AS BIGINT) AS effective_tokens
           FROM kept k JOIN tok t ON t.doc_id = k.doc_id
           GROUP BY t.lang)
         SELECT r.lang, r.n_docs, r.raw_tokens,
           coalesce(k.n_kept, 0) AS n_kept,
           coalesce(k.effective_tokens, 0) AS effective_tokens,
           CASE WHEN r.raw_tokens > 0 THEN
             CAST(r.raw_tokens - coalesce(k.effective_tokens, 0)
               AS DOUBLE) / r.raw_tokens END AS dup_token_frac
         FROM raw r LEFT JOIN keptt k
           ON k.lang IS NOT DISTINCT FROM r.lang
         ORDER BY r.lang""",
    // additive stats replayed exactly; the HLL estimate itself cannot
    // replay in DuckDB, so the oracle pins the in-query tolerance
    // flag at 1 (q46's pattern) — a drifting sketch fails the gate
    "q148_mergeable_datasheet" ->
      """WITH base AS (
           SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(regexp_extract_all(
               lower(coalesce(text, '')), '[a-z0-9]+'))) AS BIGINT)
               AS sum_tokens
           FROM documents GROUP BY 1, 2),
         voc AS (
           SELECT source, lang,
             CAST(count(DISTINCT w) AS BIGINT) AS vocab_exact
           FROM (SELECT source, lang, unnest(regexp_extract_all(
               lower(coalesce(text, '')), '[a-z0-9]+')) AS w
             FROM documents)
           GROUP BY 1, 2)
         SELECT b.source, b.lang, b.n_docs, b.sum_tokens,
           CAST(coalesce(v.vocab_exact, 0) AS BIGINT) AS vocab_exact,
           1 AS vocab_within_5pct
         FROM base b LEFT JOIN voc v
           ON v.source IS NOT DISTINCT FROM b.source
           AND v.lang IS NOT DISTINCT FROM b.lang
         ORDER BY b.source, b.lang""",
    // integer rare-count sliding window (ROWS frame), argmax by
    // (count DESC, start ASC); short docs keep their single span
    "q147_rare_token_spans" ->
      s"""WITH cnt AS (
           SELECT w, count(*) AS cw FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         tok AS (
           SELECT doc_id, i - 1 AS pos,
             CASE WHEN cnt.cw <= 2 THEN 1 ELSE 0 END AS rare
           FROM (SELECT doc_id, $oracleWords AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
               t,
             cnt
           WHERE cnt.w = ws[i]),
         sc AS (
           SELECT doc_id, pos,
             sum(rare) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS rw,
             count(*) OVER (PARTITION BY doc_id) AS n
           FROM tok),
         keep AS (SELECT * FROM sc WHERE pos <= n - 16 OR pos = 0),
         best AS (
           SELECT doc_id, n, pos, rw FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY rw DESC, pos ASC) AS rn FROM keep)
           WHERE rn = 1)
         SELECT d.doc_id,
           CAST(coalesce(best.n, 0) AS BIGINT) AS n_tokens,
           CAST(best.pos AS INT) AS worst_start,
           CAST(best.rw AS BIGINT) AS rare_in_window
         FROM documents d LEFT JOIN best ON best.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // embedding clusters (q117's cents/assign CTEs) joined to the
    // documents table on the shared id
    "q146_corpus_cluster_map" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cents AS (SELECT vec_id AS cid, v AS cv FROM e
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT 16),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC)
               AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
         base AS (
           SELECT a.cid AS centroid_id, d.doc_id, d.lang,
             len($oracleWords) AS nt
           FROM assign a JOIN documents d ON d.doc_id = a.vec_id),
         agg AS (
           SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS sum_tokens,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
           FROM base GROUP BY 1),
         lcnt AS (SELECT centroid_id, lang, count(*) AS c FROM base
                  WHERE lang IS NOT NULL GROUP BY 1, 2),
         top AS (
           SELECT centroid_id, lang AS top_lang,
             CAST(c AS BIGINT) AS top_lang_docs
           FROM (SELECT *, row_number() OVER (
               PARTITION BY centroid_id ORDER BY c DESC, lang ASC)
               AS rn FROM lcnt)
           WHERE rn = 1)
         SELECT agg.centroid_id, n_docs, sum_tokens, n_langs,
           top.top_lang, top.top_lang_docs
         FROM agg LEFT JOIN top USING (centroid_id)
         ORDER BY centroid_id""",
    // q124's unigram CTEs + bigram/left-context models; λ=0.75 and
    // 0.25 are exact binary doubles (the dyadic-weight argument)
    "q145_bigram_lm_quality" ->
      s"""WITH t AS (
           SELECT doc_id, unnest($oracleWords) AS w FROM documents),
         cnt AS (SELECT w, count(*) AS n FROM t GROUP BY w),
         tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                   CAST(count(*) AS DOUBLE) AS vv FROM cnt),
         pu AS (SELECT w, (n + 0.5) / (nn + 0.5 * (vv + 1)) AS p
                FROM cnt, tot),
         bgx AS (
           SELECT doc_id, ws[i] AS l, ws[i+1] AS r FROM (
             SELECT doc_id, $oracleWords AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t2),
         dbg AS (SELECT doc_id, l, r, count(*) AS c
                 FROM bgx GROUP BY 1, 2, 3),
         bc AS (SELECT l, r, sum(c) AS n FROM dbg GROUP BY 1, 2),
         lc AS (SELECT l, sum(n) AS nl FROM bc GROUP BY 1),
         sc AS (
           SELECT doc_id, sum(c) AS nb,
             sum(c * ln(0.75 * (bc.n / CAST(lc.nl AS DOUBLE))
               + 0.25 * pu.p)) / sum(c) AS s
           FROM dbg
           JOIN bc USING (l, r)
           JOIN lc USING (l)
           JOIN pu ON pu.w = dbg.r
           GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
           round(s, 4) AS bigram_lm_score
         FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // q127's construction, but the output is the contamination REPORT
    // (matched pairs + distance/similarity), not the survivors
    "q144_semantic_decontamination" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         b AS (
           SELECT vec_id, list_transform(range(len(v)), d ->
             v[d+1] + (CASE WHEN vec_id % 10 = 0 THEN 0.01 ELSE 0.3 END)
               * CAST((vec_id*7 + d) % 5 - 2 AS DOUBLE)) AS v
           FROM e WHERE vec_id % 5 = 0),
         allv AS (
           SELECT vec_id AS id, v FROM e
           UNION ALL SELECT vec_id + 1000000 AS id, v FROM b),
         $oracleSrpCtes
         SELECT z.id - 1000000 AS eval_id, a.id AS corpus_id,
           CAST(bit_count(xor(a.hi, z.hi))
             + bit_count(xor(a.lo, z.lo)) AS INT) AS hamming,
           round(${oracleCosRaw("e.v", "b2.v")}, 4) AS cos
         FROM hs a JOIN hs z ON a.id < 1000000 AND z.id >= 1000000
         JOIN e ON e.vec_id = a.id
         JOIN b b2 ON b2.vec_id = z.id - 1000000
         WHERE bit_count(xor(a.hi, z.hi))
             + bit_count(xor(a.lo, z.lo)) <= 3
           AND ${oracleCosRaw("e.v", "b2.v")} >= 0.98
         ORDER BY eval_id, corpus_id""",
    // the q31 LSH/CC construction, but survivorship = argmax quality
    // (min id on ties) per component; singletons keep themselves
    "q128_keepbest_near_dedup" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         pairs AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         verified AS (
           SELECT ida, idb FROM pairs
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
         edges AS (SELECT ida AS a, idb AS b FROM verified
                   UNION SELECT idb, ida FROM verified),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (
           SELECT a AS doc_id, least(a, min(b)) AS comp
           FROM reach GROUP BY a),
         ${oracleMetricsCtes("documents")},
         lab AS (
           SELECT q.doc_id, q.quality,
             coalesce(r.comp, q.doc_id) AS comp
           FROM q LEFT JOIN roots r USING (doc_id)),
         best AS (
           SELECT doc_id, cluster_size, quality FROM (
             SELECT doc_id, quality,
               count(*) OVER (PARTITION BY comp) AS cluster_size,
               row_number() OVER (PARTITION BY comp
                 ORDER BY quality DESC, doc_id ASC) AS rn
             FROM lab) WHERE rn = 1)
         SELECT doc_id, cluster_size, round(quality, 4) AS quality
         FROM best ORDER BY doc_id""",
    "q129_resample_interp" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE ts IS NOT NULL),
         b AS (
           SELECT user_id,
             make_timestamp((epoch_us(ts) // 86400000000)
               * 86400000000) AS bucket_ts,
             avg(CAST(round(value * 100) AS BIGINT)) AS v
           FROM ev GROUP BY 1, 2),
         g AS (
           SELECT user_id, unnest(generate_series(lo, hi,
             INTERVAL 1 DAY)) AS bucket_ts
           FROM (SELECT user_id, min(bucket_ts) AS lo,
                   max(bucket_ts) AS hi FROM b GROUP BY 1)),
         j AS (
           SELECT g.user_id, g.bucket_ts, b.v,
             epoch_us(g.bucket_ts) AS t
           FROM g LEFT JOIN b
             ON b.user_id = g.user_id AND b.bucket_ts = g.bucket_ts),
         f AS (
           SELECT user_id, bucket_ts, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1,
             t
           FROM j),
         iv AS (
           SELECT user_id, bucket_ts,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN t1 IS NULL THEN v0
                  WHEN t0 IS NULL THEN v1
                  ELSE v0 + (v1 - v0) * ((t - t0) / (t1 - t0)) END
               AS value,
             v IS NULL AS interpolated
           FROM f)
         SELECT user_id, bucket_ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) / 10000.0 AS value,
           interpolated
         FROM iv ORDER BY user_id, bucket_ts""",
    "q130_rolling_anomalies" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS eu
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         r AS (
           SELECT event_id, user_id, v,
             count(v) OVER w AS n,
             CAST(sum(v) OVER w AS BIGINT) AS s1,
             CAST(sum(v * v) OVER w AS BIGINT) AS s2
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY eu
             RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)),
         d AS (
           SELECT event_id, user_id, n,
             CAST(s1 AS DOUBLE) / n AS mean,
             CAST(n * s2 - s1 * s1 AS DOUBLE)
               / CAST(n * n AS DOUBLE) AS var,
             CAST(v * n - s1 AS DOUBLE) / n AS dev
           FROM r)
         SELECT event_id, user_id, n AS roll_n,
           CAST(floor(mean * 100 + 0.5) AS BIGINT) / 10000.0
             AS roll_mean,
           CAST(floor(sqrt(var) * 100 + 0.5) AS BIGINT) / 10000.0
             AS roll_std,
           CASE WHEN n >= 2 AND var > 0 THEN
             CAST(floor(dev / sqrt(var) * 10000 + 0.5) AS BIGINT)
               / 10000.0 END AS zscore,
           CAST(CASE WHEN n >= 2 AND var > 0
             THEN abs(dev / sqrt(var)) > 3.0 ELSE false END AS INT)
             AS is_anomaly
         FROM d ORDER BY event_id""",
    "q131_ewma_trend" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS eu
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         w AS (
           SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY eu, event_id) AS rn
           FROM ev),
         p AS (
           SELECT a.event_id, a.user_id,
             count(*) AS n,
             sum(b.v * pow(0.5, a.rn - b.rn)) AS num,
             sum(pow(0.5, a.rn - b.rn)) AS den
           FROM w a JOIN w b
             ON b.user_id = a.user_id
             AND b.rn BETWEEN a.rn - 19 AND a.rn
           GROUP BY 1, 2)
         SELECT event_id, user_id, n AS ewma_n,
           CAST(floor(num / den * 100 + 0.5) AS BIGINT) / 10000.0
             AS ewma
         FROM p ORDER BY event_id""",
    "q132_spend_trend" ->
      """WITH o AS (
           SELECT o_custkey,
             epoch_us(o_orderdate) // 86400000000 AS x,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
         s AS (
           SELECT o_custkey, count(*) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(y * y) AS HUGEINT) AS syy
           FROM o GROUP BY 1),
         d AS (
           SELECT o_custkey, n,
             n * sxy - sx * sy AS c,
             n * sxx - sx * sx AS vx,
             n * syy - sy * sy AS vy,
             sx, sy
           FROM s),
         f AS (
           SELECT o_custkey, n,
             CASE WHEN n >= 2 AND vx > 0 THEN
               CAST(c AS DOUBLE) / CAST(vx AS DOUBLE) END AS slope,
             c, vx, vy, sx, sy
           FROM d)
         SELECT o_custkey, n,
           CAST(floor(slope * 10000 + 0.5) AS BIGINT) / 10000.0
             AS slope,
           CAST(floor((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / n * 100 + 0.5) AS BIGINT) / 100.0 AS intercept,
           CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
             CAST(floor(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
               / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))
               * 10000 + 0.5) AS BIGINT) / 10000.0 END AS r2
         FROM f ORDER BY o_custkey""",
    "q133_collapse_repeats" ->
      """WITH d AS (
           SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')
               AS ws
           FROM documents),
         k AS (
           SELECT doc_id, ws,
             list_filter(ws, (x, i) -> i = 1 OR ws[i - 1] <> x) AS kept
           FROM d)
         SELECT doc_id,
           CAST(len(kept) AS BIGINT) AS n_tokens,
           CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
           md5(array_to_string(kept, ' ')) AS text_md5
         FROM k ORDER BY doc_id""",
    "q134_line_dedup" ->
      """WITH d AS (
           SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')
               AS ws
           FROM documents),
         l AS (
           SELECT doc_id,
             list_transform(
               generate_series(0, CAST(ceil(len(ws) / 4.0) AS INT) - 1),
               i -> array_to_string(ws[i * 4 + 1 : i * 4 + 4], ' '))
               AS lines
           FROM d WHERE len(ws) > 0),
         k AS (
           SELECT doc_id, lines,
             list_filter(lines, (x, i) -> list_position(lines, x) = i)
               AS kept
           FROM l)
         SELECT doc_id,
           CAST(len(kept) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(kept) AS BIGINT) AS n_removed,
           md5(array_to_string(kept, chr(10))) AS text_md5
         FROM k ORDER BY doc_id""",
    "q135_global_line_dedup" ->
      """WITH d AS (
           SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')
               AS ws
           FROM documents),
         l AS (
           SELECT doc_id,
             list_transform(
               generate_series(0, CAST(ceil(len(ws) / 4.0) AS INT) - 1),
               i -> array_to_string(ws[i * 4 + 1 : i * 4 + 4], ' '))
               AS lines
           FROM d WHERE len(ws) > 0),
         e AS (
           SELECT doc_id, i - 1 AS pos, lines[i] AS line
           FROM l, LATERAL (SELECT
             unnest(generate_series(1, len(lines))) AS i) t),
         w AS (
           SELECT line,
             min(CAST(doc_id AS HUGEINT) * 4294967296 + pos) AS fk
           FROM e GROUP BY 1),
         k AS (
           SELECT CAST(fk // 4294967296 AS BIGINT) AS doc_id,
             CAST(fk % 4294967296 AS BIGINT) AS pos, line
           FROM w),
         r AS (
           SELECT doc_id, count(*) AS n_lines,
             string_agg(line, chr(10) ORDER BY pos) AS text
           FROM k GROUP BY 1)
         SELECT l.doc_id,
           coalesce(r.n_lines, 0) AS n_lines,
           CAST(len(l.lines) AS BIGINT) - coalesce(r.n_lines, 0)
             AS n_removed,
           md5(coalesce(r.text, '')) AS text_md5
         FROM l LEFT JOIN r USING (doc_id) ORDER BY l.doc_id""",
    "q136_event_type_affinity" ->
      """WITH di AS (
           SELECT DISTINCT user_id, event_type FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         rk AS (
           SELECT user_id, event_type, row_number() OVER (
             PARTITION BY user_id ORDER BY event_type) AS rn
           FROM di),
         c AS (SELECT user_id, event_type FROM rk WHERE rn <= 8),
         nb AS (SELECT count(DISTINCT user_id) AS n FROM c),
         ic AS (
           SELECT event_type, count(*) AS cnt FROM c GROUP BY 1),
         p AS (
           SELECT a.event_type AS item_a, b.event_type AS item_b,
             count(*) AS pair_count
           FROM c a JOIN c b USING (user_id)
           WHERE a.event_type < b.event_type GROUP BY 1, 2)
         SELECT item_a, item_b, pair_count,
           CAST(pair_count AS DOUBLE) / n AS support,
           CAST(pair_count AS DOUBLE) / ca.cnt AS confidence,
           CAST(pair_count * n AS DOUBLE)
             / CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift
         FROM p CROSS JOIN nb
           JOIN ic ca ON ca.event_type = item_a
           JOIN ic cb ON cb.event_type = item_b
         ORDER BY item_a, item_b""",
    "q137_event_transitions" ->
      """WITH s AS (
           SELECT user_id, event_type, ts, event_id FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             AND ts IS NOT NULL),
         lg AS (
           SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_state,
             event_type AS to_state
           FROM s),
         p AS (
           SELECT from_state, to_state, count(*) AS transitions
           FROM lg WHERE from_state IS NOT NULL GROUP BY 1, 2),
         t AS (
           SELECT from_state, sum(transitions) AS tot
           FROM p GROUP BY 1)
         SELECT from_state, to_state, transitions,
           CAST(transitions AS DOUBLE) / tot AS prob
         FROM p JOIN t USING (from_state)
         ORDER BY from_state, to_state""",
    // q117 with the query leg hash-sampled at 10 % (salt "audit") —
    // the standing scheduled-audit form
    "q138_ann_recall_audit_sampled" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e
           WHERE CAST(('0x' || substr(
               md5('audit' || CAST(vec_id AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 < 0.10),
         bs AS (
           SELECT qid, e.vec_id AS nid, ${oracleCos("qv", "e.v")} AS sim
           FROM q CROSS JOIN e WHERE qid <> e.vec_id),
         br AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
             FROM bs) WHERE rank <= 10),
         cents AS (SELECT vec_id AS cid, v AS cv FROM e
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT 16),
         assign AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
         probes AS (
           SELECT qid, qv, cid FROM (
             SELECT q.qid, q.qv, c.cid, row_number() OVER (
               PARTITION BY q.qid
               ORDER BY ${oracleCos("q.qv", "c.cv")} DESC, c.cid ASC) AS rn
             FROM q CROSS JOIN cents c) WHERE rn <= 3),
         vs AS (
           SELECT qid, a.vec_id AS nid, ${oracleCos("qv", "a.v")} AS sim
           FROM probes p JOIN assign a ON a.cid = p.cid
           WHERE a.vec_id <> qid),
         vr AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
             FROM vs) WHERE rank <= 10)
         SELECT br.qid AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(vr.nid) AS BIGINT) AS n_hit,
           round(CAST(count(vr.nid) AS DOUBLE) / count(*), 4) AS recall
         FROM br LEFT JOIN vr ON vr.qid = br.qid AND vr.nid = br.nid
         GROUP BY br.qid ORDER BY query_id""",
    // index lifecycle: codebooks + coarse centroids train on the
    // initial corpus (vec_id % 4 <> 0), ALL rows encode with them
    // (the append), drift = per-bucket mean-vector cosine vs its
    // centroid, audit = q138's sampled recall over the PQ-routed
    // search, rolled up to the query's assigned bucket
    "q139_index_lifecycle" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         ei AS (SELECT vec_id, v FROM e WHERE vec_id % 4 <> 0),
         ${(0 until 4).map(b =>
             oraclePqBlock(b, 16, 16, "ei", "e")).mkString(",\n")},
         ncodes AS (
           SELECT e.vec_id, enc0.code AS k0, enc1.code AS k1,
             enc2.code AS k2, enc3.code AS k3
           FROM e
           JOIN enc0 ON enc0.vec_id = e.vec_id
           JOIN enc1 ON enc1.vec_id = e.vec_id
           JOIN enc2 ON enc2.vec_id = e.vec_id
           JOIN enc3 ON enc3.vec_id = e.vec_id),
         ccents AS (SELECT vec_id AS ccid, v AS ccv FROM ei
                    ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
                      vec_id ASC
                    LIMIT 16),
         cassign AS (
           SELECT vec_id, ccid FROM (
             SELECT e.vec_id, c.ccid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.ccv")} DESC, c.ccid ASC)
               AS rn
             FROM e CROSS JOIN ccents c) WHERE rn = 1),
         dims AS (SELECT unnest(range(1, 65)) AS pos),
         dmean AS (
           SELECT ca.ccid, d.pos, round(avg(e.v[d.pos]), 6) AS m,
             count(*) AS nn
           FROM cassign ca JOIN e ON e.vec_id = ca.vec_id
             CROSS JOIN dims d
           GROUP BY ca.ccid, d.pos),
         mv AS (SELECT ccid, list(m ORDER BY pos) AS mvec,
             max(nn) AS n
           FROM dmean GROUP BY ccid),
         drift AS (
           SELECT mv.ccid, mv.n,
             ${oracleCos("mv.mvec", "c.ccv")} AS mean_sim
           FROM mv JOIN ccents c ON c.ccid = mv.ccid),
         q AS (SELECT vec_id, v FROM e
           WHERE CAST(('0x' || substr(
               md5('audit' || CAST(vec_id AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 < 0.10),
         probes AS (
           SELECT qid, ccid FROM (
             SELECT q.vec_id AS qid, c.ccid, row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY ${oracleCos("q.v", "c.ccv")} DESC, c.ccid ASC)
               AS rn
             FROM q CROSS JOIN ccents c) WHERE rn <= 3),
         s AS (
           SELECT q.vec_id AS qid, n.vec_id AS nid,
             round((list_dot_product(q.v[1:16], b0.cv)
                 + list_dot_product(q.v[17:32], b1.cv)
                 + list_dot_product(q.v[33:48], b2.cv)
                 + list_dot_product(q.v[49:64], b3.cv))
               / nullif(sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(b0.cv, b0.cv)
                   + list_dot_product(b1.cv, b1.cv)
                   + list_dot_product(b2.cv, b2.cv)
                   + list_dot_product(b3.cv, b3.cv)), 0.0), 4) AS sim
           FROM q
           JOIN probes p ON p.qid = q.vec_id
           JOIN cassign ca ON ca.ccid = p.ccid
           JOIN ncodes n ON n.vec_id = ca.vec_id
           JOIN cb0 b0 ON b0.code = n.k0
           JOIN cb1 b1 ON b1.code = n.k1
           JOIN cb2 b2 ON b2.code = n.k2
           JOIN cb3 b3 ON b3.code = n.k3
           WHERE n.vec_id <> q.vec_id),
         vr AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
             FROM s) WHERE rank <= 10),
         bs AS (
           SELECT qq.qid, e.vec_id AS nid,
             ${oracleCos("qq.qv", "e.v")} AS sim
           FROM (SELECT vec_id AS qid, v AS qv FROM q) qq
           CROSS JOIN e WHERE qq.qid <> e.vec_id),
         br AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
             FROM bs) WHERE rank <= 10),
         rec AS (
           SELECT br.qid,
             round(CAST(count(vr.nid) AS DOUBLE) / count(*), 4)
               AS recall
           FROM br LEFT JOIN vr ON vr.qid = br.qid AND vr.nid = br.nid
           GROUP BY br.qid),
         pa AS (
           SELECT ca.ccid, CAST(count(*) AS BIGINT) AS n_audit,
             avg(recall) AS avg_recall
           FROM rec JOIN cassign ca ON ca.vec_id = rec.qid
           GROUP BY ca.ccid)
         SELECT d.ccid AS centroid_id, CAST(d.n AS BIGINT) AS n,
           d.mean_sim AS mean_sim,
           d.mean_sim < 0.98 AS recenter_advised,
           coalesce(pa.n_audit, 0) AS n_audit,
           pa.avg_recall AS avg_recall
         FROM drift d LEFT JOIN pa ON pa.ccid = d.ccid
         ORDER BY centroid_id""",
    // the q133 + q65 + q124 trio over one shared tokenization CTE
    "q140_fused_quality_pass" ->
      """WITH d AS (
           SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')
               AS ws
           FROM documents),
         k AS (
           SELECT doc_id, ws,
             list_filter(ws, (x, i) -> i = 1 OR ws[i - 1] <> x) AS kept
           FROM d),
         bg AS (
           SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM d,
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t),
         per AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
         sig AS (
           SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
             round(1.0 - CAST(count(*) AS DOUBLE) / sum(n), 4)
               AS dup_bigram_frac,
             round(CAST(max(n) AS DOUBLE) / sum(n), 4)
               AS top_bigram_frac
           FROM per GROUP BY doc_id),
         t AS (SELECT doc_id, unnest(ws) AS w FROM d),
         cnt AS (SELECT w, count(*) AS n FROM t GROUP BY w),
         tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                   CAST(count(*) AS DOUBLE) AS vv FROM cnt),
         lm AS (SELECT w, ln((n + 0.5) / (nn + 0.5 * (vv + 1)))
                  AS logp FROM cnt, tot),
         dw AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
         sc AS (
           SELECT doc_id, sum(c * logp) / sum(c) AS s
           FROM dw JOIN lm USING (w) GROUP BY doc_id)
         SELECT k.doc_id, md5(array_to_string(kept, ' ')) AS text_md5,
           CAST(len(kept) AS BIGINT) AS n_tokens,
           CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
           sig.n_bigrams, sig.dup_bigram_frac, sig.top_bigram_frac,
           round(sc.s, 4) AS lm_score
         FROM k LEFT JOIN sig ON sig.doc_id = k.doc_id
         LEFT JOIN sc ON sc.doc_id = k.doc_id
         ORDER BY k.doc_id""",
    // q140's fused trio + q145's bigram LM, one replay: the bigram
    // model folds from the same per-doc (l, r) counts the repetition
    // signals use, backoff from the same unigram vocabulary
    "q150_fused_quality_bigram" ->
      """WITH d AS (
           SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')
               AS ws
           FROM documents),
         k AS (
           SELECT doc_id, ws,
             list_filter(ws, (x, i) -> i = 1 OR ws[i - 1] <> x) AS kept
           FROM d),
         bgx AS (
           SELECT doc_id, ws[i] AS l, ws[i+1] AS r FROM d,
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t2),
         per AS (SELECT doc_id, l, r, count(*) AS c
                 FROM bgx GROUP BY 1, 2, 3),
         sig AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 4)
               AS dup_bigram_frac,
             round(CAST(max(c) AS DOUBLE) / sum(c), 4)
               AS top_bigram_frac
           FROM per GROUP BY doc_id),
         t AS (SELECT doc_id, unnest(ws) AS w FROM d),
         cnt AS (SELECT w, count(*) AS n FROM t GROUP BY w),
         tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                   CAST(count(*) AS DOUBLE) AS vv FROM cnt),
         lm AS (SELECT w, ln((n + 0.5) / (nn + 0.5 * (vv + 1)))
                  AS logp FROM cnt, tot),
         dw AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
         sc AS (
           SELECT doc_id, sum(c * logp) / sum(c) AS s
           FROM dw JOIN lm USING (w) GROUP BY doc_id),
         pu AS (SELECT w, (n + 0.5) / (nn + 0.5 * (vv + 1)) AS p
                FROM cnt, tot),
         bc AS (SELECT l, r, sum(c) AS n FROM per GROUP BY 1, 2),
         lc AS (SELECT l, sum(n) AS nl FROM bc GROUP BY 1),
         sb AS (
           SELECT doc_id, sum(c * ln(0.75 * (bc.n / CAST(lc.nl AS DOUBLE))
               + 0.25 * pu.p)) / sum(c) AS s
           FROM per
           JOIN bc USING (l, r)
           JOIN lc USING (l)
           JOIN pu ON pu.w = per.r
           GROUP BY doc_id)
         SELECT k.doc_id, md5(array_to_string(kept, ' ')) AS text_md5,
           CAST(len(kept) AS BIGINT) AS n_tokens,
           CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
           sig.n_bigrams, sig.dup_bigram_frac, sig.top_bigram_frac,
           round(sc.s, 4) AS lm_score,
           round(sb.s, 4) AS bigram_lm_score
         FROM k LEFT JOIN sig ON sig.doc_id = k.doc_id
         LEFT JOIN sc ON sc.doc_id = k.doc_id
         LEFT JOIN sb ON sb.doc_id = k.doc_id
         ORDER BY k.doc_id""",
    // single-scan funnel replay: every flag once per row, 3k counters
    // in one aggregate, per-stage rows unioned off the single agg row
    "q151_filter_funnel" -> {
      val names = Seq("nonempty", "min_tokens", "low_punct",
        "stopword_floor", "quality_score")
      val k = names.size
      def conj(idx: Seq[Int]) =
        if (idx.isEmpty) "TRUE" else idx.map(j => s"f$j").mkString(" AND ")
      val aggs = (0 until k).flatMap { i =>
        val reached = conj(0 until i)
        val others = conj((0 until k).filter(_ != i))
        Seq(
          s"sum(CASE WHEN $reached THEN 1 ELSE 0 END) AS in_$i",
          s"sum(CASE WHEN ($reached) AND NOT f$i THEN 1 ELSE 0 END)" +
            s" AS fail_$i",
          s"sum(CASE WHEN ($others) AND NOT f$i THEN 1 ELSE 0 END)" +
            s" AS sole_$i")
      }.mkString(",\n           ")
      val rows = names.zipWithIndex.map { case (n, i) =>
        s"""SELECT CAST(${i + 1} AS INT) AS stage, '$n' AS filter,
           CAST(coalesce(in_$i, 0) AS BIGINT) AS n_in,
           CAST(coalesce(fail_$i, 0) AS BIGINT) AS n_rejected,
           CAST(coalesce(in_$i - fail_$i, 0) AS BIGINT) AS n_out,
           CAST(coalesce(sole_$i, 0) AS BIGINT) AS n_sole_reject,
           round(CAST(fail_$i AS DOUBLE) / nullif(in_$i, 0), 4)
             AS reject_frac
           FROM agg"""
      }.mkString("\n         UNION ALL ")
      s"""$oracleMetricsCte,
         f AS (
           SELECT coalesce(n_chars > 0, FALSE) AS f0,
             coalesce(tokens >= 20, FALSE) AS f1,
             coalesce(coalesce(punct, 0.0) <= 0.1, FALSE) AS f2,
             coalesce(coalesce(stop, 0.0) >= 0.05, FALSE) AS f3,
             coalesce(quality >= 0.5, FALSE) AS f4
           FROM q),
         agg AS (
           SELECT $aggs
           FROM f)
         $rows ORDER BY stage"""
    },
    // q24's verified pairs, symmetrized and joined to sources: the
    // diagonal holds both directions of each pair (halve it)
    "q152_cross_source_dup_matrix" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes,
         pairsj AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         verified AS (
           SELECT ida, idb FROM pairsj
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
         sym AS (SELECT ida AS x, idb AS y FROM verified
                 UNION ALL SELECT idb, ida FROM verified),
         es AS (
           SELECT da.source AS src_a, db.source AS src_b, x, y
           FROM sym
           JOIN documents da ON da.doc_id = x
           JOIN documents db ON db.doc_id = y),
         cells AS (
           SELECT src_a, src_b,
             CAST(CASE WHEN src_a = src_b THEN count(*) // 2
                       ELSE count(*) END AS BIGINT) AS n_pairs,
             count(DISTINCT x) AS n_dup_docs
           FROM es GROUP BY 1, 2),
         tot AS (SELECT source AS src_a, count(*) AS n_docs
                 FROM documents GROUP BY 1)
         SELECT src_a, src_b, n_pairs,
           CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(n_dup_docs AS DOUBLE) / n_docs, 4) AS dup_frac
         FROM cells JOIN tot USING (src_a)
         ORDER BY src_a, src_b""",
    // per-bucket log-likelihood ratio quantized to BIGINT micro-units
    // BEFORE the per-doc sum: scores are exact integer sums, so the
    // ranked budget cut is engine- and order-independent
    "q153_dsir_selection" ->
      s"""WITH tokx AS (
           SELECT doc_id, (lang = 'en') AS t,
             CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS b
           FROM (SELECT doc_id, lang, unnest($oracleWords) AS w
                 FROM documents)),
         raw AS (SELECT b, count(*) AS cr FROM tokx GROUP BY b),
         tgt AS (SELECT b, count(*) AS ct FROM tokx WHERE t GROUP BY b),
         tot AS (SELECT count(*) AS nr,
                   sum(CASE WHEN t THEN 1 ELSE 0 END) AS nt FROM tokx),
         lr AS (
           SELECT b, CAST(floor(ln(
               ((coalesce(ct, 0) + 1.0) * (nr + 1024.0)) /
               ((cr + 1.0) * (nt + 1024.0))) * 1000000.0 + 0.5)
             AS BIGINT) AS qlr
           FROM raw LEFT JOIN tgt USING (b), tot),
         sc AS (
           SELECT doc_id, count(*) AS n_tokens, sum(qlr) AS score_micro
           FROM tokx JOIN lr USING (b) GROUP BY doc_id),
         r AS (
           SELECT *, sum(n_tokens) OVER (
             ORDER BY score_micro DESC, doc_id ASC) AS cum
           FROM sc)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(score_micro AS BIGINT) AS score_micro
         FROM r WHERE cum <= 10000 ORDER BY doc_id""",
    // 6 unrolled fixed-point iterations; all arithmetic is BIGINT
    // floor-division, so the replay is bit-exact
    "q154_supplier_pagerank" -> {
      def iter(k: Int): String = {
        val prev = if (k == 1) "r0" else s"r${k - 1}"
        s"""r$k AS (
           SELECT n2.node, (150000000000 // (SELECT n FROM nn))
               + coalesce(s$k.c, 0) AS r
           FROM nodes n2 LEFT JOIN (
             SELECT e.b AS node,
               sum((850 * p.r) // (1000 * deg.d)) AS c
             FROM e JOIN $prev p ON p.node = e.a
             JOIN deg ON deg.a = e.a
             GROUP BY e.b) s$k ON s$k.node = n2.node)"""
      }
      s"""WITH co AS (
           SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
             's' || CAST(l_suppkey AS VARCHAR) AS b
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         e AS (SELECT a, b FROM co UNION SELECT b, a FROM co),
         deg AS (SELECT a, count(*) AS d FROM e GROUP BY a),
         nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
         nn AS (SELECT count(*) AS n FROM nodes),
         r0 AS (SELECT node,
           1000000000000 // (SELECT n FROM nn) AS r FROM nodes),
         ${(1 to 6).map(iter).mkString(",\n         ")}
         SELECT node, CAST(r AS BIGINT) AS rank_scaled
         FROM r6 ORDER BY node"""
    },
    // q128's cluster chain, but clusters collapse to consolidated
    // records: argmax keep, provenance unions, token mass
    "q155_merge_survivorship" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         pairs AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         verified AS (
           SELECT ida, idb FROM pairs
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
         edges AS (SELECT ida AS a, idb AS b FROM verified
                   UNION SELECT idb, ida FROM verified),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (
           SELECT a AS doc_id, least(a, min(b)) AS comp
           FROM reach GROUP BY a),
         ${oracleMetricsCtes("documents")},
         lab AS (
           SELECT q.doc_id, q.quality, q.source, q.lang, q.tokens,
             coalesce(r.comp, q.doc_id) AS comp
           FROM q LEFT JOIN roots r USING (doc_id)),
         ranked AS (
           SELECT comp, doc_id, row_number() OVER (PARTITION BY comp
             ORDER BY quality DESC, doc_id ASC) AS rn
           FROM lab),
         aggd AS (
           SELECT comp AS cluster_id, count(*) AS n_members,
             max(quality) AS bq,
             array_to_string(list_sort(list_distinct(list(source))),
               ',') AS sources,
             array_to_string(list_sort(list_distinct(list(lang))),
               ',') AS langs,
             sum(tokens) AS total_tokens
           FROM lab GROUP BY comp)
         SELECT a.cluster_id, r2.doc_id AS kept_id,
           CAST(a.n_members AS BIGINT) AS n_members,
           round(a.bq, 4) AS best_quality, a.sources, a.langs,
           CAST(a.total_tokens AS BIGINT) AS total_tokens
         FROM aggd a JOIN ranked r2
           ON r2.comp = a.cluster_id AND r2.rn = 1
         ORDER BY a.cluster_id""",
    // exact-dedup survivors -> per-source (token, milli-quality)
    // masses -> 3 unrolled water-filling rounds, all BIGINT floor-div
    "q156_epoch_allocation" -> {
      def round2(k: Int): String = {
        val prev = if (k == 1) "a0" else s"a${k - 1}"
        s"""a$k AS (
           SELECT source, u, w, cap,
             least(cap, alloc + CASE WHEN alloc < cap AND t$k.actw > 0
               THEN ((40000 - t$k.spent) * w) // t$k.actw
               ELSE 0 END) AS alloc
           FROM $prev, (
             SELECT sum(CASE WHEN alloc < cap THEN w ELSE 0 END)
                 AS actw,
               sum(alloc) AS spent FROM $prev) t$k)"""
      }
      s"""${oracleMetricsCte},
         keep1 AS (
           SELECT doc_id FROM (
             SELECT doc_id, min(doc_id) OVER (PARTITION BY
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               ) AS k0
             FROM documents) WHERE doc_id = k0),
         per AS (
           SELECT source, sum(tokens) AS u,
             sum(CAST(floor(quality * 1000 + 0.5) AS BIGINT)) AS w
           FROM q JOIN keep1 USING (doc_id)
           GROUP BY source),
         a0 AS (
           SELECT source, u, w, (u * 1500) // 1000 AS cap,
             CAST(0 AS BIGINT) AS alloc
           FROM per WHERE u > 0 AND w > 0),
         ${(1 to 3).map(round2).mkString(",\n         ")}
         SELECT source, CAST(u AS BIGINT) AS unique_tokens,
           CAST(w AS BIGINT) AS weight,
           CAST(alloc AS BIGINT) AS allocated_tokens,
           CAST((alloc * 1000) // u AS BIGINT) AS epochs_milli,
           alloc = cap AS capped
         FROM a3 ORDER BY source"""
    },
    // lag windows replay the trigram walk; support = distinct users
    "q157_event_sequences" ->
      """WITH l AS (
           SELECT user_id, event_type,
             lag(event_type, 2) OVER w AS s1,
             lag(event_type, 1) OVER w AS s2
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (
           SELECT DISTINCT s1 AS step_1, s2 AS step_2,
             event_type AS step_3, user_id
           FROM l WHERE s1 IS NOT NULL AND s2 IS NOT NULL),
         c AS (
           SELECT step_1, step_2, step_3, count(*) AS n_keys
           FROM g GROUP BY 1, 2, 3 HAVING count(*) >= 3),
         el AS (
           SELECT count(*) AS nk FROM (
             SELECT user_id FROM events
             WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             GROUP BY user_id HAVING count(*) >= 3))
         SELECT step_1, step_2, step_3,
           CAST(n_keys AS BIGINT) AS n_keys,
           round(CAST(n_keys AS DOUBLE) / nk, 4) AS support
         FROM c, el
         ORDER BY n_keys DESC, step_1, step_2, step_3""",
    // deterministic md5 draws mod catalog size, anti-joined, first-k
    "q158_negative_samples" ->
      """WITH inter AS MATERIALIZED (
           SELECT DISTINCT o_custkey AS u, l_partkey AS it
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         users AS (SELECT DISTINCT u FROM inter WHERE u IS NOT NULL),
         items AS MATERIALIZED (
           SELECT it, row_number() OVER (ORDER BY it) AS idx FROM (
             SELECT DISTINCT p_partkey AS it FROM part
             WHERE p_partkey IS NOT NULL)),
         ni AS (SELECT count(*) AS n FROM items),
         slots AS (
           SELECT u, unnest(generate_series(0, 19)) AS slot
           FROM users),
         draws AS (
           SELECT u, slot,
             (CAST(('0x' || substr(md5('neg' || CAST(u AS VARCHAR)
               || ':' || CAST(slot AS VARCHAR)), 1, 8)) AS BIGINT)
               % ni.n) + 1 AS idx
           FROM slots, ni),
         cand AS (
           SELECT u, slot, it FROM draws JOIN items USING (idx)),
         fresh AS (
           SELECT u, it, min(slot) AS slot FROM cand
           WHERE NOT EXISTS (SELECT 1 FROM inter i
             WHERE i.u = cand.u AND i.it = cand.it)
           GROUP BY u, it),
         r AS (
           SELECT u, it, slot, row_number() OVER (
             PARTITION BY u ORDER BY slot, it) AS rk
           FROM fresh)
         SELECT u AS o_custkey, it AS l_partkey,
           CAST(slot AS INT) AS draw_slot, CAST(rk AS INT) AS neg_rank
         FROM r WHERE rk <= 5
         ORDER BY o_custkey, neg_rank""",
    // int8 quantization (the q105 CTE) then 7 unrolled farthest-point
    // rounds in exact BIGINT squared-L2; MATERIALIZED per round (each
    // step is referenced twice — plain CTEs would inline the whole
    // prefix exponentially)
    "q159_kcenter_select" -> {
      def d2(a: String, b: String): String =
        s"""CAST(list_sum(list_transform(
           generate_series(1, len($a)),
           i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"""
      def step(k: Int): String = {
        val prev = if (k == 2) "m1" else s"m${k - 1}"
        s"""c$k AS MATERIALIZED (
             SELECT vec_id, q, mind FROM $prev
             ORDER BY mind DESC, vec_id ASC LIMIT 1),
           m$k AS MATERIALIZED (
             SELECT m.vec_id, m.q,
               least(m.mind, ${d2("m.q", "c.q")}) AS mind
             FROM $prev m, c$k c WHERE m.vec_id <> c.vec_id)"""
      }
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE embedding IS NOT NULL),
         qz AS (
           SELECT vec_id,
             CASE WHEN coalesce(
                 list_max(list_transform(v, x -> abs(x))), 0.0) = 0.0
               THEN list_transform(v, x -> 0.0)
               ELSE list_transform(v, x -> round(x /
                 (list_max(list_transform(v, y -> abs(y))) / 127.0)))
             END AS qv
           FROM e),
         qi AS MATERIALIZED (
           SELECT vec_id,
             list_transform(qv, x -> CAST(x AS BIGINT)) AS q
           FROM qz),
         c1 AS MATERIALIZED (
           SELECT vec_id, q FROM qi ORDER BY vec_id ASC LIMIT 1),
         m1 AS MATERIALIZED (
           SELECT p.vec_id, p.q, ${d2("p.q", "c.q")} AS mind
           FROM qi p, c1 c WHERE p.vec_id <> c.vec_id),
         ${(2 to 8).map(step).mkString(",\n         ")}
         SELECT CAST(1 AS INT) AS round, vec_id,
           CAST(NULL AS BIGINT) AS d2_at_selection FROM c1
         ${(2 to 8).map(k =>
            s"UNION ALL SELECT CAST($k AS INT), vec_id, mind FROM c$k")
            .mkString("\n         ")}
         ORDER BY round"""
    },
    // decile bins over the replayed quality score; micro-unit integer
    // sums make every emitted double a single exact division
    "q160_calibration_report" ->
      s"""$oracleMetricsCte,
         b AS (
           SELECT least(CAST(floor(quality * 10) AS INT), 9) AS bin,
             CAST(floor(quality * 1000000) AS BIGINT) AS micro,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM q WHERE quality IS NOT NULL AND lang IS NOT NULL),
         g AS (
           SELECT bin, count(*) AS n, sum(micro) AS sm,
             sum(pos) AS np
           FROM b GROUP BY bin),
         t AS (SELECT sum(n) AS tot FROM g)
         SELECT CAST(bin AS INT) AS bin, CAST(n AS BIGINT) AS n,
           CAST(np AS BIGINT) AS n_positive,
           round(CAST(sm AS DOUBLE) / (n * 1000000), 6) AS mean_score,
           round(CAST(np AS DOUBLE) / n, 6) AS frac_positive,
           round(abs(CAST(sm AS DOUBLE) / (n * 1000000)
             - CAST(np AS DOUBLE) / n) * n / tot, 6) AS ece_contrib
         FROM g, t ORDER BY bin""",
    // exact-regime KLL == the inclusive order statistic: smallest
    // value whose cumulative fraction >= rank (cume_dist replay);
    // ranks 0.5/0.75 are exact binary doubles on both engines
    "q161_quantile_datasheet" ->
      s"""WITH tok AS (
           SELECT lang, CAST(len($oracleWords) AS DOUBLE) AS v
           FROM documents WHERE text IS NOT NULL),
         c AS (
           SELECT lang, v, cume_dist() OVER (
             PARTITION BY lang ORDER BY v) AS cd
           FROM tok)
         SELECT lang, CAST(count(*) AS BIGINT) AS n,
           min(CASE WHEN cd >= 0.5 THEN v END) AS p50,
           min(CASE WHEN cd >= 0.75 THEN v END) AS p75
         FROM c GROUP BY lang ORDER BY lang""",
    // the deterministic PII seeding replayed, then per-source regex
    // counts; rows unpivot per type
    "q162_pii_incidence" -> {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ssnPat = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
      val phonePat = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
      s"""WITH seeded AS (
           SELECT source,
             text ||
               CASE WHEN doc_id % 7 = 0 THEN ' contact user'
                 || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END ||
               CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789'
                 ELSE '' END ||
               CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567'
                 ELSE '' END AS text
           FROM documents),
         cnt AS (
           SELECT source,
             len(regexp_extract_all(coalesce(text, ''),
               '$emailPat')) AS c_email,
             len(regexp_extract_all(coalesce(text, ''),
               '$ssnPat')) AS c_ssn,
             len(regexp_extract_all(coalesce(text, ''),
               '$phonePat')) AS c_phone
           FROM seeded),
         g AS (
           SELECT source, count(*) AS n_docs,
             sum(c_email) AS m_email,
             sum(CASE WHEN c_email > 0 THEN 1 ELSE 0 END) AS d_email,
             sum(c_ssn) AS m_ssn,
             sum(CASE WHEN c_ssn > 0 THEN 1 ELSE 0 END) AS d_ssn,
             sum(c_phone) AS m_phone,
             sum(CASE WHEN c_phone > 0 THEN 1 ELSE 0 END) AS d_phone
           FROM cnt GROUP BY source)
         SELECT source, pii_type, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(nw AS BIGINT) AS n_docs_with,
           CAST(nm AS BIGINT) AS n_matches,
           round(CAST(nw AS DOUBLE) / n_docs, 6) AS doc_frac
         FROM (
           SELECT source, 'email' AS pii_type, n_docs,
             d_email AS nw, m_email AS nm FROM g
           UNION ALL SELECT source, 'ssn', n_docs, d_ssn, m_ssn FROM g
           UNION ALL SELECT source, 'phone', n_docs, d_phone, m_phone
             FROM g)
         ORDER BY source, pii_type"""
    },
    // cumulative counts per distinct value replay the exact scaled
    // KS supremum; the 5% '1-URGENT' perturbation is re-seeded
    "q164_ks_drift" ->
      """WITH base AS (
           SELECT o_orderpriority AS g, o_totalprice AS v
           FROM orders WHERE o_orderkey % 2 = 1),
         cur AS (
           SELECT o_orderpriority AS g,
             CASE WHEN o_orderpriority = '1-URGENT'
               THEN o_totalprice * 1.05 ELSE o_totalprice END AS v
           FROM orders WHERE o_orderkey % 2 = 0),
         u AS (
           SELECT g, v, 1 AS b FROM base
           UNION ALL SELECT g, v, 0 FROM cur),
         per AS (
           SELECT g, v, sum(b) AS cb, sum(1 - b) AS cc
           FROM u GROUP BY g, v),
         cum AS (
           SELECT g,
             sum(cb) OVER w AS i, sum(cc) OVER w AS j,
             sum(cb) OVER (PARTITION BY g) AS n1,
             sum(cc) OVER (PARTITION BY g) AS n2
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         agg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             max(abs(i * n2 - j * n1)) AS ks_scaled
           FROM cum GROUP BY g)
         SELECT g AS o_orderpriority,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           CAST(ks_scaled AS BIGINT) AS ks_scaled,
           CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
             ELSE round(CAST(ks_scaled AS DOUBLE) / (n_base * n_cur),
               6) END AS ks_d,
           CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
             ELSE round(1.358 * sqrt(CAST(n_base + n_cur AS DOUBLE)
               / (n_base * n_cur)), 6) END AS threshold,
           CASE WHEN n_base = 0 OR n_cur = 0 THEN TRUE
             ELSE CAST(ks_scaled AS DOUBLE) / (n_base * n_cur) >
               1.358 * sqrt(CAST(n_base + n_cur AS DOUBLE)
                 / (n_base * n_cur)) END AS drifted
         FROM agg ORDER BY o_orderpriority""",
    // the permutation is pure md5 arithmetic; the global rank replays
    // as one row_number
    "q165_epoch_order" ->
      """WITH r AS (
           SELECT doc_id, CAST(row_number() OVER (
             ORDER BY md5('order2:' || CAST(doc_id AS VARCHAR)),
               doc_id) AS BIGINT) AS order_idx
           FROM documents)
         SELECT doc_id, order_idx,
           CAST((order_idx - 1) % 4 AS INT) AS worker,
           CAST((order_idx - 1) // 4 + 1 AS BIGINT) AS worker_pos
         FROM r ORDER BY order_idx""",
    // exact counts under the float z; pooled variance, two-sided
    "q166_segment_conversion" ->
      """WITH conv AS (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderstatus = 'F'),
         c AS (
           SELECT c_mktsegment AS g,
             CASE WHEN conv.o_custkey IS NOT NULL THEN 1 ELSE 0 END
               AS s
           FROM customer LEFT JOIN conv ON o_custkey = c_custkey
           WHERE c_mktsegment IS NOT NULL),
         per AS (
           SELECT g, count(*) AS n, sum(s) AS ss FROM c GROUP BY g),
         tot AS (SELECT sum(n) AS tn, sum(ss) AS ts FROM per),
         j AS (
           SELECT g, n, ss, tn, ts, tn - n AS nr, ts - ss AS sr
           FROM per, tot),
         zc AS (
           SELECT g, n, ss,
             CAST(ss AS DOUBLE) / n AS rate,
             CAST(sr AS DOUBLE) / nr AS rate_rest,
             CASE WHEN nr > 0 AND ts > 0 AND ts < tn THEN
               (CAST(ss AS DOUBLE) / n - CAST(sr AS DOUBLE) / nr) /
               sqrt((CAST(ts AS DOUBLE) / tn)
                 * (CAST(1 AS DOUBLE) - CAST(ts AS DOUBLE) / tn)
                 * (CAST(1 AS DOUBLE) / n + CAST(1 AS DOUBLE) / nr))
             END AS z
           FROM j)
         SELECT g AS c_mktsegment, CAST(n AS BIGINT) AS n,
           CAST(ss AS BIGINT) AS successes,
           round(rate, 6) AS rate, round(rate_rest, 6) AS rate_rest,
           round(z, 6) AS z, abs(z) > 1.96 AS significant
         FROM zc ORDER BY c_mktsegment""",
    // interval pairing + per-conversion rank/count windows; credit is
    // exact integer milli-units, remainder to the last touch
    "q167_linear_attribution" ->
      """WITH c AS (
           SELECT user_id, ts AS cts, event_id AS cid FROM events
           WHERE event_type = 'purchase'),
         t AS (
           SELECT user_id, ts AS tts, event_id AS tid FROM events
           WHERE event_type IN ('view', 'click')),
         p AS (
           SELECT c.user_id, cid, cts, tid, tts
           FROM c JOIN t USING (user_id)
           WHERE tts <= cts AND tts > cts - INTERVAL 2 HOUR),
         r AS (
           SELECT user_id, cid, tid,
             count(*) OVER (PARTITION BY user_id, cid) AS n_touches,
             row_number() OVER (PARTITION BY user_id, cid
               ORDER BY tts, tid) AS touch_rank
           FROM p)
         SELECT user_id, cid AS conversion_id, tid AS touch_id,
           CAST(touch_rank AS INT) AS touch_rank,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(1000 // n_touches + CASE WHEN touch_rank = n_touches
             THEN 1000 % n_touches ELSE 0 END AS BIGINT)
             AS credit_milli
         FROM r ORDER BY conversion_id, touch_rank""",
    // inclusive within-source rank (RANGE frame counts peers), exact
    // integer grid index, 100-point exact global grid
    "q168_quantile_normalize" ->
      s"""$oracleMetricsCte,
         s AS (SELECT doc_id, source, quality AS v FROM q
               WHERE quality IS NOT NULL),
         r AS (
           SELECT doc_id, source, v,
             count(*) OVER (PARTITION BY source ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS i,
             count(*) OVER (PARTITION BY source) AS n
           FROM s),
         g AS (
           SELECT quantile_cont(v, list_transform(
             generate_series(1, 100),
             j -> CAST(j AS DOUBLE) / 100)) AS grid
           FROM s)
         SELECT doc_id, source, round(v, 6) AS score,
           CAST(least(100, (i * 100 + n - 1) // n) AS BIGINT)
             AS grid_idx,
           round(grid[CAST(least(100, (i * 100 + n - 1) // n)
             AS INT)], 6) AS normalized
         FROM r, g ORDER BY doc_id""",
    // closed-form hash replay: window means reduce to the seed-mixed
    // envelope multipliers, so bit w compares two integer terms; gain
    // cancels — batch hashes equal corpus hashes per id
    "q169_audio_ehash_dedup" -> {
      def mul(w: String): String =
        s"(doc_id + ($w)*($w)*(1 + doc_id % 31) + (doc_id // 7) * ($w)) % 9"
      s"""WITH bits AS (
           SELECT doc_id, w,
             CASE WHEN ${mul("w + 1")} > ${mul("w")}
               THEN 1 ELSE 0 END AS bit
           FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS w
                 FROM documents)),
         hs AS (
           SELECT doc_id,
             sum(CASE WHEN w < 32 THEN
               bit * (CAST(1 AS BIGINT) << (31 - w)) ELSE 0 END) AS hi,
             sum(CASE WHEN w >= 32 THEN
               bit * (CAST(1 AS BIGINT) << (63 - w)) ELSE 0 END) AS lo
           FROM bits GROUP BY doc_id),
         b AS (SELECT doc_id, hi, lo FROM hs WHERE doc_id % 5 = 0)
         SELECT a.doc_id AS corpus_id, b.doc_id AS batch_id,
           CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
             AS INT) AS hamming
         FROM hs a JOIN b ON bit_count(xor(a.hi, b.hi))
           + bit_count(xor(a.lo, b.lo)) <= 3
         ORDER BY corpus_id, batch_id"""
    },
    // BM25 replay: df-pruned postings, per-term micro quantization
    // BEFORE the per-(query, doc) sum, float literals spelled exactly
    // as the engine computes them
    "q171_bm25_search" ->
      s"""WITH tf AS (
           SELECT doc_id, w AS token, count(*) AS tf FROM (
             SELECT doc_id, unnest($oracleWords) AS w FROM documents)
           GROUP BY 1, 2),
         lens AS (
           SELECT doc_id, len($oracleWords) AS len FROM documents),
         stats AS (
           SELECT count(*) AS n,
             CAST(sum(len) AS DOUBLE) / count(*) AS avgdl
           FROM lens),
         dfq AS (
           SELECT token, count(*) AS df FROM tf
           GROUP BY token HAVING count(*) <= 400),
         qt AS (
           SELECT doc_id AS qid, unnest(list_distinct($oracleWords))
             AS token
           FROM documents WHERE doc_id < 5),
         sc AS (
           SELECT qid, tf.doc_id,
             CAST(floor(
               ln(CAST(1 AS DOUBLE) + (n - df + CAST(0.5 AS DOUBLE))
                 / (df + CAST(0.5 AS DOUBLE)))
               * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
               / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * len / avgdl))
               * 1000000000) AS BIGINT) AS tm
           FROM qt
           JOIN tf USING (token) JOIN dfq USING (token)
           JOIN lens ON lens.doc_id = tf.doc_id, stats),
         agg AS (
           SELECT qid, doc_id, sum(tm) AS score_micro
           FROM sc GROUP BY 1, 2),
         r AS (
           SELECT qid, doc_id, score_micro, row_number() OVER (
             PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)
             AS rank
           FROM agg)
         SELECT qid AS query_id, doc_id,
           CAST(score_micro AS BIGINT) AS score_micro,
           CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    // class-size histogram over the quasi-identifier grouping
    "q170_k_anonymity" ->
      """WITH cls AS (
           SELECT c_nationkey, c_mktsegment, count(*) AS sz
           FROM customer GROUP BY 1, 2)
         SELECT CAST(sz AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(sz) AS BIGINT) AS n_rows,
           sz < 10 AS violates
         FROM cls GROUP BY sz ORDER BY class_size""",
    // the q143 trained-apply chain regrouped per language
    "q163_tokenizer_fertility" ->
      s"""WITH w0 AS MATERIALIZED (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         s0 AS MATERIALIZED (SELECT w, freq,
             ' ' || array_to_string(list_transform(
               generate_series(1, length(w)),
               i -> substring(w, i, 1)), ' ') || ' ' AS s
           FROM w0),
         ${(1 to 8).map(oracleBpeStep).mkString(",\n")},
         wc AS (SELECT w, len(string_split(trim(s), ' ')) AS n
                FROM s8),
         dw AS (SELECT doc_id, unnest($oracleWords) AS w
                FROM documents),
         agg AS (
           SELECT doc_id, count(*) AS nw, sum(n) AS nt
           FROM dw JOIN wc USING (w) GROUP BY doc_id),
         per AS (
           SELECT d.lang, coalesce(a.nw, 0) AS nw,
             coalesce(a.nt, 0) AS nt, d.n_chars
           FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id)
         SELECT lang, CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(nt) AS BIGINT) AS n_tokens_bpe,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(nt) AS DOUBLE) / nullif(sum(nw), 0) AS fertility,
           CAST(sum(n_chars) AS DOUBLE) / nullif(sum(nt), 0)
             AS chars_per_token
         FROM per GROUP BY lang ORDER BY lang""",
    // 8 unrolled BPE iterations over the distinct-word frequency
    // table; each step: pair count → argmax → two-pass greedy replace
    "q142_bpe_merges" ->
      s"""WITH w0 AS MATERIALIZED (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         s0 AS MATERIALIZED (SELECT w, freq,
             ' ' || array_to_string(list_transform(
               generate_series(1, length(w)),
               i -> substring(w, i, 1)), ' ') || ' ' AS s
           FROM w0),
         ${(1 to 8).map(oracleBpeStep).mkString(",\n")}
         SELECT step, lhs, rhs, lhs || rhs AS merged,
           CAST(cnt AS BIGINT) AS pair_count
         FROM (${(1 to 8).map(i =>
            s"SELECT CAST($i AS INT) AS step, lhs, rhs, cnt FROM t$i")
            .mkString("\n           UNION ALL ")})
         ORDER BY step""",
    // the q142 chain's final symbol strings per WORD, summed per doc
    "q143_bpe_token_counts" ->
      s"""WITH w0 AS MATERIALIZED (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         s0 AS MATERIALIZED (SELECT w, freq,
             ' ' || array_to_string(list_transform(
               generate_series(1, length(w)),
               i -> substring(w, i, 1)), ' ') || ' ' AS s
           FROM w0),
         ${(1 to 8).map(oracleBpeStep).mkString(",\n")},
         wc AS (SELECT w, len(string_split(trim(s), ' ')) AS n
                FROM s8),
         dw AS (SELECT doc_id, unnest($oracleWords) AS w
                FROM documents),
         agg AS (
           SELECT doc_id, count(*) AS nw, sum(n) AS nt
           FROM dw JOIN wc USING (w) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(agg.nw, 0) AS BIGINT) AS n_words,
           CAST(coalesce(agg.nt, 0) AS BIGINT) AS n_tokens_bpe
         FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // q117's routing with the wrong-label filter inside the probed
    // buckets, before ranking
    "q141_hard_negatives" ->
      s"""WITH e AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
         cents AS (SELECT vec_id AS cid, v AS cv FROM e
                   ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                   LIMIT 16),
         assign AS (
           SELECT vec_id, label, v, cid FROM (
             SELECT e.vec_id, e.label, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
         q AS (SELECT vec_id AS qid, label AS ql, v AS qv FROM e
               WHERE vec_id < 10),
         probes AS (
           SELECT qid, ql, qv, cid FROM (
             SELECT q.qid, q.ql, q.qv, c.cid, row_number() OVER (
               PARTITION BY q.qid
               ORDER BY ${oracleCos("q.qv", "c.cv")} DESC, c.cid ASC)
               AS rn
             FROM q CROSS JOIN cents c) WHERE rn <= 3),
         vs AS (
           SELECT qid, ql, a.vec_id AS nid, a.label AS nl,
             ${oracleCos("qv", "a.v")} AS sim
           FROM probes p JOIN assign a ON a.cid = p.cid
           WHERE a.vec_id <> p.qid AND a.label <> p.ql),
         r AS (
           SELECT qid, ql, nid, nl, sim, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT)
             AS rank
           FROM vs)
         SELECT qid AS query_id, ql AS query_label,
           nid AS neighbor_id, nl AS neighbor_label, sim, rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank""",
    "q65_repetition_signals" ->
      s"""WITH bg AS (
           SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM (
             SELECT doc_id, $oracleWords AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t),
         per AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
           round(1.0 - CAST(count(*) AS DOUBLE) / sum(n), 4)
             AS dup_bigram_frac,
           round(CAST(max(n) AS DOUBLE) / sum(n), 4) AS top_bigram_frac
         FROM per GROUP BY doc_id ORDER BY doc_id""",
    "q66_corpus_datasheet" ->
      s"""WITH ${oracleMetricsCtes("documents")}
         SELECT source, lang, count(*) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS sum_tokens,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM q GROUP BY source, lang ORDER BY source, lang""",
    "q67_source_cap" ->
      """WITH h AS (
           SELECT *, CAST(('0x' || substr(
               md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 AS hf
           FROM documents),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY source
             ORDER BY hf ASC, doc_id ASC) AS rn
           FROM h),
         k AS (
           SELECT source, count(*) AS n_kept,
             round(sum(CAST(doc_id AS DOUBLE)), 1) AS kept_id_sum
           FROM r WHERE rn <= 10 GROUP BY source),
         tot AS (
           SELECT source, count(*) AS n_total
           FROM documents GROUP BY source)
         SELECT tot.source, n_total, n_kept, kept_id_sum
         FROM tot JOIN k USING (source) ORDER BY source""",
    "q68_source_mixture" ->
      """WITH w AS (
           SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                         WHEN 'src2' THEN 0.0 ELSE 1.0 END AS wt
           FROM documents),
         ex AS (
           SELECT doc_id, source, wt,
             unnest(generate_series(0, CAST(floor(wt) AS INT))) AS epoch
           FROM w),
         kept AS (
           SELECT * FROM ex WHERE epoch < floor(wt)
             OR CAST(('0x' || substr(md5('mix' || CAST(epoch AS VARCHAR)
                  || ':' || CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) / 4294967296.0 < wt - floor(wt)),
         agg AS (
           SELECT source, count(*) AS n_emitted,
             round(sum(CAST(doc_id AS DOUBLE)), 1) AS emitted_id_sum
           FROM kept GROUP BY source),
         tot AS (
           SELECT source, count(*) AS n_docs
           FROM documents GROUP BY source)
         SELECT tot.source, n_docs,
           coalesce(n_emitted, 0) AS n_emitted,
           coalesce(emitted_id_sum, 0.0) AS emitted_id_sum
         FROM tot LEFT JOIN agg USING (source) ORDER BY source""",
    "q69_vocab_coverage" ->
      s"""WITH toks AS (
           SELECT unnest($oracleWords) AS word FROM documents),
         c AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
         tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM c),
         r AS (
           SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank
           FROM c)
         SELECT CAST(rank AS INT) AS rank, word, cnt,
           round(CAST(sum(cnt) OVER (ORDER BY rank
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t, 6) AS cum_frac
         FROM r, tot WHERE rank <= 25 ORDER BY rank""",
    "q70_cluster_split" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         pairs AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         verified AS (
           SELECT ida, idb FROM pairs
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
         edges AS (SELECT ida AS a, idb AS b FROM verified
                   UNION SELECT idb, ida FROM verified),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         rep AS (
           SELECT a AS doc_id, least(a, min(b)) AS rep
           FROM reach GROUP BY a),
         lab AS (
           SELECT d.doc_id, coalesce(r.rep, d.doc_id) AS rep
           FROM documents d LEFT JOIN rep r USING (doc_id)),
         sp AS (
           SELECT doc_id, rep, CAST(('0x' || substr(
               md5('csplit' || CAST(rep AS VARCHAR)), 1, 8))
             AS BIGINT) / 4294967296.0 AS h
           FROM lab),
         labeled AS (
           SELECT doc_id, rep,
             CASE WHEN h < 0.8 THEN 'train'
                  WHEN h < 0.9 THEN 'val'
                  ELSE 'test' END AS split
           FROM sp)
         SELECT split, count(*) AS n_docs,
           count(DISTINCT rep) AS n_clusters,
           round(sum(CAST(doc_id AS DOUBLE)), 1) AS id_sum
         FROM labeled GROUP BY split ORDER BY split""",
    "q71_dup_chunk_fraction" ->
      s"""WITH d AS (
           SELECT doc_id, $oracleWords AS ws FROM documents),
         ch AS (
           SELECT doc_id, md5(array_to_string(
             list_slice(ws, i * 8 + 1, i * 8 + 8), ' ')) AS fp
           FROM d, LATERAL (SELECT unnest(generate_series(0,
             greatest(0, CAST(ceil((len(ws) - 8) / 8.0) AS INT)))) AS i) t
           WHERE len(ws) > 0),
         dc AS (
           SELECT fp, count(DISTINCT doc_id) AS nd FROM ch GROUP BY fp)
         SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dup_chunk_frac
         FROM ch JOIN dc USING (fp) GROUP BY doc_id ORDER BY doc_id""",
    "q72_semantic_dedup" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cnt AS (SELECT greatest(1, CAST(round(sqrt(count(*)), 0) AS INT))
                 AS nlist FROM e),
         rc AS (SELECT vec_id AS cid, v AS cv, row_number() OVER (
                  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
                  AS rk FROM e),
         cents AS (SELECT cid, cv FROM rc, cnt WHERE rk <= nlist),
         assign AS (
           SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
         drops AS (
           SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
             ON a.cid = b.cid AND a.vec_id < b.vec_id
           WHERE ${oracleCos("a.v", "b.v")} >= 0.45)
         SELECT cid AS centroid_id, count(*) AS n_vecs,
           CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM drops)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         FROM assign GROUP BY cid ORDER BY cid""",
    "q73_training_shards" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         $oracleDedupKeptCtes,
         w AS (
           SELECT doc_id, len($oracleWords) AS tok,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                         WHEN 'src2' THEN 0.0 ELSE 1.0 END AS wt
           FROM kept),
         ex AS (
           SELECT doc_id, tok, wt,
             unnest(generate_series(0, CAST(floor(wt) AS INT))) AS epoch
           FROM w),
         mix AS (
           SELECT doc_id, tok, epoch FROM ex WHERE epoch < floor(wt)
             OR CAST(('0x' || substr(md5('mix' || CAST(epoch AS VARCHAR)
                  || ':' || CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) / 4294967296.0 < wt - floor(wt)),
         seqd AS (
           SELECT doc_id * 8 + epoch AS seq_id, tok FROM mix),
         c AS (
           SELECT seq_id, tok,
             sum(tok) OVER (ORDER BY seq_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
               AS strt
           FROM seqd)
         SELECT CAST(floor(strt / 5000.0) AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS shard_tokens,
           min(seq_id) AS first_seq, max(seq_id) AS last_seq
         FROM c GROUP BY 1 ORDER BY shard""",
    "q74_bloom_incremental" ->
      """WITH fp AS (
           SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
           FROM documents),
         corpus AS (SELECT DISTINCT f FROM fp WHERE doc_id % 3 = 0),
         batch AS (
           SELECT doc_id, f, row_number() OVER (PARTITION BY f
             ORDER BY doc_id) AS rn
           FROM fp WHERE doc_id % 3 <> 0),
         newdocs AS (
           SELECT doc_id FROM batch
           WHERE rn = 1 AND f NOT IN (SELECT f FROM corpus))
         SELECT count(*) AS n_new,
           round(sum(CAST(doc_id AS DOUBLE)), 1) AS id_sum
         FROM newdocs""",

    "q75_priority_scd2" ->
      """WITH obs AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev,
             row_number() OVER w AS rn
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey)),
         vers AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
           FROM obs
           WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev),
         num AS (
           SELECT o_custkey, o_orderpriority, o_orderdate,
             CAST(row_number() OVER w AS INT) AS version_n,
             lead(o_orderdate) OVER w AS next_from
           FROM vers
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey))
         SELECT o_custkey, version_n, o_orderpriority AS priority,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS valid_from_key,
           CAST(strftime(next_from, '%Y%m%d') AS INT) AS valid_to_key,
           CASE WHEN next_from IS NULL THEN 1 ELSE 0 END AS is_current
         FROM num ORDER BY o_custkey, version_n""",

    // hourly conditional counts -> zero-filled grid -> lag self-join
    "q174_event_cross_correlation" ->
      """WITH e AS (
           SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
             AS idx, event_type
           FROM events WHERE ts IS NOT NULL),
         cnt AS (
           SELECT idx,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS a,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS b
           FROM e GROUP BY idx),
         rng AS (
           SELECT unnest(generate_series(
             (SELECT min(idx) FROM cnt),
             (SELECT max(idx) FROM cnt))) AS idx),
         g AS (
           SELECT r.idx, coalesce(a, 0) AS a, coalesce(b, 0) AS b
           FROM rng r LEFT JOIN cnt ON cnt.idx = r.idx),
         l AS (SELECT unnest(generate_series(-6, 6)) AS lag),
         j AS (
           SELECT l.lag, g1.a, g2.b
           FROM l, g g1, g g2 WHERE g2.idx = g1.idx + l.lag)
         SELECT CAST(lag AS INT) AS lag,
           CAST(count(*) AS BIGINT) AS n_buckets,
           round(corr(a, b), 6) AS corr
         FROM j GROUP BY lag ORDER BY lag""",
    // 8 unrolled greedy rounds: argmax of the micro-quantized
    // objective, running max-cosine updated against each new pick
    "q173_mmr_rerank" -> {
      def objSel(src: String) =
        s"""SELECT vec_id, v, rel, mc,
           CAST(floor((CAST(0.7 AS DOUBLE) * rel
             - CAST(0.3 AS DOUBLE) * mc) * 1000000) AS BIGINT) AS obj
           FROM $src"""
      def step(r: Int): String = {
        val prev = if (r == 1) "base" else s"m${r - 1}"
        val pick =
          s"""c$r AS MATERIALIZED (
             ${objSel(prev)}
             ORDER BY obj DESC, vec_id ASC LIMIT 1)"""
        if (r == 8) pick
        else pick + s""",
           m$r AS MATERIALIZED (
             SELECT p.vec_id, p.v, p.rel,
               greatest(p.mc, ${oracleCosRaw("p.v", "c.v")}) AS mc
             FROM $prev p, c$r c WHERE p.vec_id <> c.vec_id)"""
      }
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT v AS qv FROM e ORDER BY vec_id ASC LIMIT 1),
         sc AS (
           SELECT vec_id, v, ${oracleCosRaw("v", "qv")} AS rel
           FROM e, q WHERE vec_id <> 0),
         cand AS MATERIALIZED (
           SELECT vec_id, v, rel FROM sc
           ORDER BY rel DESC, vec_id ASC LIMIT 20),
         base AS (
           SELECT vec_id, v, rel, CAST(0.0 AS DOUBLE) AS mc
           FROM cand),
         ${(1 to 8).map(step).mkString(",\n         ")}
         SELECT rank, vec_id, round(rel, 6) AS rel,
           round(mc, 6) AS max_cos_prior, obj AS obj_micro
         FROM (${(1 to 8).map(r =>
            s"SELECT CAST($r AS INT) AS rank, vec_id, rel, mc, obj FROM c$r")
            .mkString("\n           UNION ALL ")})
         ORDER BY rank"""
    },
    // the q75 version CTEs + the interval-residual as-was join
    "q172_scd2_lookup" ->
      """WITH obs AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev,
             row_number() OVER w AS rn
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey)),
         vers AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
           FROM obs
           WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev),
         num AS (
           SELECT o_custkey, o_orderpriority AS pr,
             o_orderdate AS vfrom,
             lead(o_orderdate) OVER w AS vto,
             CAST(row_number() OVER w AS INT) AS version_n
           FROM vers
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey))
         SELECT f.o_orderkey, f.o_custkey,
           num.pr AS priority_as_was, num.version_n
         FROM orders f LEFT JOIN num ON num.o_custkey = f.o_custkey
           AND f.o_orderdate >= num.vfrom
           AND (num.vto IS NULL OR f.o_orderdate < num.vto)
         ORDER BY o_orderkey""",
    "q76_fuzzy_part_names" ->
      """WITH names AS (SELECT DISTINCT p_name AS n FROM part)
         SELECT a.n AS value_a, b.n AS value_b,
           CAST(levenshtein(a.n, b.n) AS INT) AS dist
         FROM names a JOIN names b ON a.n < b.n
         WHERE levenshtein(a.n, b.n) <= 2
         ORDER BY value_a, value_b""",

    "q77_heavy_hitter_tokens" ->
      s"""WITH toks AS (
           SELECT unnest($oracleWords) AS w FROM documents),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
         SELECT w AS value, count(*) AS cnt,
           round(CAST(count(*) AS DOUBLE) / (SELECT n FROM tot), 6)
             AS fraction
         FROM toks GROUP BY w
         HAVING CAST(count(*) AS DOUBLE) > 0.032 * (SELECT n FROM tot)
         ORDER BY value""",

    "q78_centroid_drift" ->
      s"""WITH e AS (
           SELECT label, embedding::DOUBLE[] AS v FROM embeddings
           WHERE embedding IS NOT NULL),
         ex AS (
           SELECT label, i, v[i] AS x FROM e,
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) t),
         cent AS (
           SELECT label, i, round(avg(x), 6) AS m FROM ex GROUP BY 1, 2),
         cv AS (SELECT label, list(m ORDER BY i) AS c FROM cent
                GROUP BY label),
         cnt AS (SELECT label, count(*) AS n FROM e GROUP BY label)
         SELECT a.label AS group_a, b.label AS group_b,
           ca.n AS n_a, cb.n AS n_b,
           ${oracleCos("a.c", "b.c")} AS sim
         FROM cv a JOIN cv b ON a.label < b.label
         JOIN cnt ca ON ca.label = a.label
         JOIN cnt cb ON cb.label = b.label
         ORDER BY group_a, group_b""",

    "q79_zorder_keys" ->
      s"""WITH keyed AS (
           SELECT o_orderkey, o_custkey,
             CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS odate_key,
             ${oracleZorder(
               "o_custkey",
               "CAST(strftime(o_orderdate, '%Y%m%d') AS INT)")} AS zkey
           FROM orders)
         SELECT * FROM keyed
         ORDER BY zkey, o_orderkey LIMIT 100""",

    // fidelity aggregates over the source rows — the Spark side reads
    // them back from the compacted-and-Z-ordered rewrite, so a row
    // lost or duplicated by the swap machinery hash-mismatches here
    "q104_compact_zorder" ->
      s"""SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           round(sum(o_totalprice), 2) AS price_sum,
           CAST(sum(${oracleZorder(
             "o_custkey",
             "CAST(strftime(o_orderdate, '%Y%m%d') AS INT)")}
             % 1000003) AS BIGINT) AS zkey_checksum
         FROM orders""",

    // feature sum order mirrors QualityModel.featureNames: bias +
    // log_tokens + punct + stop + mean_word_len, left-associated —
    // identical IEEE summation on both engines
    "q80_quality_model_scores" ->
      s"""WITH f AS (
           SELECT doc_id,
             len($oracleWords) AS tokens,
             coalesce(
               CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                 AS DOUBLE)
                 / CAST(nullif(length(text), 0) AS DOUBLE), 0.0) AS punct,
             coalesce(
               CAST(len(list_filter($oracleWords,
                 w -> w IN ($oracleStopList))) AS DOUBLE)
                 / CAST(nullif(len($oracleWords), 0) AS DOUBLE), 0.0)
               AS stop,
             coalesce(
               CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                 AS DOUBLE)
                 / nullif(CAST(len($oracleWords) AS DOUBLE), 0.0), 0.0)
               AS mwl
           FROM documents),
         z AS (
           SELECT doc_id,
             -4.0 + 0.9 * ln(1.0 + CAST(tokens AS DOUBLE))
               + (-8.0) * punct + 2.5 * stop + 0.15 * mwl AS zv
           FROM f)
         SELECT doc_id, round(1.0 / (1.0 + exp(-zv)), 6) AS score,
           CASE WHEN round(1.0 / (1.0 + exp(-zv)), 6) >= 0.5
             THEN 1 ELSE 0 END AS keep
         FROM z ORDER BY doc_id""",

    "q81_adaptive_quality_floor" ->
      s"""$oracleMetricsCte,
         sq AS (SELECT doc_id, lang, round(quality, 6) AS qv FROM q),
         cut AS (SELECT lang AS clang, quantile_cont(qv, 0.1) AS cutoff
                 FROM sq GROUP BY lang)
         SELECT lang, count(*) AS n_kept,
           round(min(qv), 6) AS min_kept,
           round(avg(qv), 4) AS avg_kept,
           round(max(cutoff), 6) AS cutoff
         FROM sq JOIN cut ON lang IS NOT DISTINCT FROM clang
         WHERE qv >= cutoff
         GROUP BY lang ORDER BY lang""",

    "q82_event_funnel" ->
      """WITH r0 AS (
           SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS v0
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         r1 AS (
           SELECT user_id, ts, event_type, v0,
             min(CASE WHEN event_type = 'click' AND v0 < ts
               THEN ts END) OVER w AS v1
           FROM r0
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         r2 AS (
           SELECT user_id, ts, event_type, v0, v1,
             min(CASE WHEN event_type = 'purchase' AND v1 < ts
               THEN ts END) OVER w AS v2
           FROM r1
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         per AS (
           SELECT user_id, min(v0) AS t1, min(v1) AS t2, min(v2) AS t3
           FROM r2 GROUP BY user_id),
         tot AS (
           SELECT count(t1) AS c1, count(t2) AS c2, count(t3) AS c3
           FROM per)
         SELECT * FROM (
           SELECT 1 AS step_n, 'view' AS step, c1 AS reached,
             round(CAST(c1 AS DOUBLE)
               / nullif(CAST(c1 AS DOUBLE), 0.0), 6) AS conversion
           FROM tot
           UNION ALL
           SELECT 2, 'click', c2,
             round(CAST(c2 AS DOUBLE)
               / nullif(CAST(c1 AS DOUBLE), 0.0), 6)
           FROM tot
           UNION ALL
           SELECT 3, 'purchase', c3,
             round(CAST(c3 AS DOUBLE)
               / nullif(CAST(c1 AS DOUBLE), 0.0), 6)
           FROM tot)
         ORDER BY step_n""",

    // reuses the factored q31 chain up to `reach`; component label =
    // least(id, min reachable id), histogram over label sizes
    "q83_neardup_histogram" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         $oracleDedupKeptCtes,
         labels AS (
           SELECT a AS id, least(a, min(b)) AS comp
           FROM reach GROUP BY a),
         csizes AS (
           SELECT comp, count(*) AS cluster_size
           FROM labels GROUP BY comp)
         SELECT cluster_size, count(*) AS n_clusters,
           cluster_size * count(*) AS docs_in_clusters,
           (cluster_size - 1) * count(*) AS removable
         FROM csizes GROUP BY cluster_size ORDER BY cluster_size""",

    // the oracle diffs columns directly; the engine compares md5
    // digests of the rendered rows — status-identical because the
    // shortest-round-trip rendering is injective on values
    "q84_snapshot_diff" ->
      """WITH yesterday AS (
           SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
         today AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 5 = 0
               THEN round(o_totalprice * 1.1, 2)
               ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
           FROM orders WHERE o_orderkey % 11 <> 0),
         d AS (
           SELECT coalesce(y.o_orderkey, t.o_orderkey) AS k,
             CASE WHEN y.o_orderkey IS NULL THEN 'added'
                  WHEN t.o_orderkey IS NULL THEN 'removed'
                  WHEN y.o_custkey IS NOT DISTINCT FROM t.o_custkey
                   AND y.o_orderstatus IS NOT DISTINCT FROM t.o_orderstatus
                   AND y.o_totalprice IS NOT DISTINCT FROM t.o_totalprice
                   AND y.o_orderpriority
                     IS NOT DISTINCT FROM t.o_orderpriority
                  THEN 'unchanged'
                  ELSE 'changed' END AS status
           FROM yesterday y
           FULL OUTER JOIN today t ON y.o_orderkey = t.o_orderkey)
         SELECT status, count(*) AS n,
           round(sum(CAST(k AS DOUBLE)), 1) AS key_sum
         FROM d GROUP BY status ORDER BY status""",

    "q85_time_weighted_value" ->
      """WITH o AS (
           SELECT user_id, epoch_us(ts) AS t, value, event_id
           FROM events),
         l AS (
           SELECT user_id, value, t,
             lead(t) OVER (PARTITION BY user_id
               ORDER BY t, event_id) AS nt
           FROM o),
         g AS (
           SELECT user_id, count(*) AS n_intervals,
             sum(value * (nt - t)) / sum(nt - t) AS twa
           FROM l WHERE nt IS NOT NULL
           GROUP BY user_id HAVING sum(nt - t) > 0)
         SELECT user_id, n_intervals, round(twa, 4) AS twa
         FROM g ORDER BY round(twa, 4) DESC, user_id LIMIT 50""",

    "q86_event_transitions" ->
      """WITH p AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
         c AS (
           SELECT prev_type, event_type AS next_type, count(*) AS n
           FROM p WHERE prev_type IS NOT NULL
           GROUP BY prev_type, event_type),
         t AS (
           SELECT prev_type, sum(n) AS tot FROM c GROUP BY prev_type)
         SELECT c.prev_type, c.next_type, c.n,
           round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
         FROM c JOIN t ON c.prev_type = t.prev_type
         ORDER BY c.prev_type, c.next_type""",

    "q87_cohort_retention" ->
      """WITH e AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
             min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
               AS cohort
           FROM events)
         SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(day - cohort AS INT) AS "offset",
           count(DISTINCT user_id) AS n_users
         FROM e WHERE day - cohort <= 7
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q88_peak_hourly_activity" ->
      """WITH o AS (
           SELECT user_id, epoch_us(ts) AS t, value FROM events),
         r AS (
           SELECT user_id,
             round(avg(value) OVER w, 6) AS ravg,
             count(*) OVER w AS rn
           FROM o
           WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
         SELECT user_id, max(ravg) AS peak_avg_value,
           max(rn) AS peak_events_1h, count(*) AS n_events
         FROM r GROUP BY user_id ORDER BY user_id""",

    "q89_acctbal_gini" ->
      """WITH r AS (
           SELECT c_mktsegment, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rn
           FROM customer),
         g AS (
           SELECT c_mktsegment, count(*) AS n,
             sum(c_acctbal) AS sx,
             sum(CAST(rn AS DOUBLE) * c_acctbal) AS six
           FROM r GROUP BY c_mktsegment)
         SELECT c_mktsegment, n,
           round((2.0 * six - CAST(n + 1 AS DOUBLE) * sx)
             / (CAST(n AS DOUBLE) * sx), 6) AS gini
         FROM g ORDER BY c_mktsegment""",

    "q90_hybrid_rank_fusion" ->
      s"""WITH e AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         s AS (
           SELECT qid, e.vec_id AS nid, ${oracleCos("qv", "e.v")} AS sim
           FROM q CROSS JOIN e WHERE qid <> e.vec_id),
         r AS (
           SELECT qid, nid, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, nid ASC) AS INT)
             AS rank
           FROM s),
         cos AS (SELECT qid, nid, rank FROM r WHERE rank <= 20),
         rec AS (
           SELECT qid, nid, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY nid DESC) AS INT) AS rank
           FROM cos),
         u AS (
           SELECT qid, nid,
             1.0 / (60.0 + CAST(rank AS DOUBLE)) AS sc FROM cos
           UNION ALL
           SELECT qid, nid,
             1.0 / (60.0 + CAST(rank AS DOUBLE)) FROM rec),
         f AS (
           SELECT qid, nid, sum(sc) AS fused, count(*) AS n_rankings
           FROM u GROUP BY qid, nid),
         t2 AS (
           SELECT qid, nid, fused, n_rankings,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY fused DESC, nid ASC) AS INT) AS fused_rank
           FROM f)
         SELECT qid AS query_id, nid AS neighbor_id, fused_rank,
           n_rankings, round(fused, 6) AS fused_score
         FROM t2 WHERE fused_rank <= 5
         ORDER BY query_id, fused_rank""",

    "q91_top_keyword_histogram" ->
      """WITH w AS (
           SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM w GROUP BY 1, 2),
         dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT doc_id, token,
             round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS r
           FROM tf JOIN dfq USING (token) CROSS JOIN n),
         top AS (
           SELECT doc_id, token AS keyword, row_number() OVER (
             PARTITION BY doc_id ORDER BY r DESC, token ASC) AS rn
           FROM scored)
         SELECT keyword, count(*) AS n_docs
         FROM top WHERE rn = 1 GROUP BY 1 ORDER BY 1""",

    "q92_type_weekday_chi2" ->
      """WITH base AS (
           SELECT event_type AS a,
             CAST(dayofweek(ts) AS INT) + 1 AS b
           FROM events),
         cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
         rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
         ct AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
         nt AS (SELECT sum(o) AS n FROM cells),
         fullc AS (
           SELECT rt.a, ct.b, ra, cb, (SELECT n FROM nt) AS n,
             coalesce(o, 0) AS o
           FROM rt CROSS JOIN ct
           LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
         e AS (
           SELECT o, CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
             / CAST(n AS DOUBLE) AS ev, n
           FROM fullc)
         SELECT round(sum(pow(CAST(o AS DOUBLE) - ev, 2) / ev), 4)
             AS chi2,
           CAST((SELECT (count(*) - 1) FROM rt)
             * (SELECT (count(*) - 1) FROM ct) AS INT) AS dof,
           CAST(max(n) AS BIGINT) AS n
         FROM e""",

    "q93_lineitem_corr" ->
      """SELECT
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
           round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
           count(*) AS n
         FROM lineitem""",

    "q94_price_drift_psi" ->
      """WITH b AS (
           SELECT o_totalprice AS x FROM orders
           WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL),
         c AS (
           SELECT o_totalprice AS x FROM orders
           WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
         e AS (
           SELECT round(unnest(quantile_cont(x,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])), 4)
             AS edge
           FROM b),
         bb AS (SELECT CAST((SELECT count(*) FROM e WHERE b.x >= edge)
                  AS INT) AS bin FROM b),
         cb AS (SELECT CAST((SELECT count(*) FROM e WHERE c.x >= edge)
                  AS INT) AS bin FROM c),
         bc AS (SELECT bin, count(*) AS nb FROM bb GROUP BY bin),
         cc AS (SELECT bin, count(*) AS nc FROM cb GROUP BY bin),
         bins AS (
           SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS bin),
         j AS (
           SELECT bin, coalesce(nb, 0) AS n_base,
             coalesce(nc, 0) AS n_cur
           FROM bins LEFT JOIN bc USING (bin) LEFT JOIN cc USING (bin)),
         t AS (
           SELECT CAST(sum(n_base) AS DOUBLE) + 5.0 AS tb,
             CAST(sum(n_cur) AS DOUBLE) + 5.0 AS tc
           FROM j)
         SELECT bin, n_base, n_cur,
           round((CAST(n_base AS DOUBLE) + 0.5) / tb, 6) AS p_base,
           round((CAST(n_cur AS DOUBLE) + 0.5) / tc, 6) AS p_cur,
           round(((CAST(n_cur AS DOUBLE) + 0.5) / tc
               - (CAST(n_base AS DOUBLE) + 0.5) / tb)
             * ln(((CAST(n_cur AS DOUBLE) + 0.5) / tc)
               / ((CAST(n_base AS DOUBLE) + 0.5) / tb)), 6) AS psi_term
         FROM j CROSS JOIN t ORDER BY bin""",

    "q95_price_trend" ->
      """SELECT o_orderpriority,
           round(regr_slope(o_totalprice,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
               AS DOUBLE)), 6) AS slope,
           round(regr_intercept(o_totalprice,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
               AS DOUBLE)), 4) AS intercept,
           count(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q96_lineitem_profile" -> {
      def statRow(c: String) =
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
            count(*) - count($c) AS n_nulls,
            count(DISTINCT $c) AS n_distinct,
            min($c) AS min, max($c) AS max,
            round(avg($c), 6) AS mean,
            round(stddev_samp($c), 6) AS stddev
            FROM lineitem"""
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(statRow).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          ")\nORDER BY column_name")
    },

    "q97_cdc_apply" ->
      """WITH base AS (
           SELECT o_orderkey AS k, o_totalprice AS price,
             o_orderpriority AS prio, 'I' AS op, 0 AS ord
           FROM orders WHERE o_orderkey % 3 <> 0),
         ups AS (
           SELECT o_orderkey, round(o_totalprice * 1.2, 2),
             o_orderpriority, 'U', 1
           FROM orders WHERE o_orderkey % 5 = 0),
         ins AS (
           SELECT o_orderkey, round(o_totalprice + 1000.0, 2),
             o_orderpriority, 'I', 0
           FROM orders
           WHERE o_orderkey % 3 = 0 AND o_orderkey % 11 = 0),
         dels AS (
           SELECT o_orderkey, o_totalprice, o_orderpriority, 'D', 2
           FROM orders WHERE o_orderkey % 7 = 0),
         feed AS (
           SELECT * FROM base UNION ALL SELECT * FROM ups
           UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM dels),
         latest AS (
           SELECT k, price, op, row_number() OVER (
             PARTITION BY k
             ORDER BY ord DESC,
               CASE WHEN op = 'D' THEN 1 ELSE 0 END DESC) AS rn
           FROM feed)
         SELECT count(*) AS n_rows,
           round(sum(price), 1) AS price_sum,
           round(sum(CAST(k AS DOUBLE)), 1) AS key_sum
         FROM latest WHERE rn = 1 AND op <> 'D'""",

    "q98_langid_metrics" ->
      s"""$oracleLangScores,
         act AS (SELECT lang AS language, count(*) AS n_actual
                 FROM p GROUP BY 1),
         prd AS (SELECT predicted AS language, count(*) AS n_predicted
                 FROM p GROUP BY 1),
         cor AS (SELECT lang AS language, count(*) AS n_correct
                 FROM p WHERE lang = predicted GROUP BY 1),
         j AS (
           SELECT coalesce(act.language, prd.language) AS language,
             coalesce(n_actual, 0) AS n_actual,
             coalesce(n_predicted, 0) AS n_predicted,
             coalesce(n_correct, 0) AS n_correct
           FROM act FULL OUTER JOIN prd USING (language)
           LEFT JOIN cor USING (language))
         SELECT language, n_actual, n_predicted, n_correct,
           round(CAST(n_correct AS DOUBLE)
             / nullif(CAST(n_predicted AS DOUBLE), 0.0), 6)
             AS precision,
           round(CAST(n_correct AS DOUBLE)
             / nullif(CAST(n_actual AS DOUBLE), 0.0), 6) AS recall,
           round(2.0 * (CAST(n_correct AS DOUBLE)
               / nullif(CAST(n_predicted AS DOUBLE), 0.0))
             * (CAST(n_correct AS DOUBLE)
               / nullif(CAST(n_actual AS DOUBLE), 0.0))
             / nullif(CAST(n_correct AS DOUBLE)
                 / nullif(CAST(n_predicted AS DOUBLE), 0.0)
               + CAST(n_correct AS DOUBLE)
                 / nullif(CAST(n_actual AS DOUBLE), 0.0),
               0.0), 6) AS f1
         FROM j ORDER BY language""",

    "q99_order_fanout" ->
      """WITH per AS (
           SELECT coalesce(n, 0) AS fanout FROM orders
           LEFT JOIN (SELECT l_orderkey, count(*) AS n FROM lineitem
                      GROUP BY 1) li
             ON o_orderkey = l_orderkey)
         SELECT fanout, count(*) AS n_orders
         FROM per GROUP BY fanout ORDER BY fanout""",

    "q100_event_interarrival" ->
      """WITH o AS (
           SELECT event_type, event_id, epoch_us(ts) AS t FROM events),
         g AS (
           SELECT event_type,
             CAST(t - lag(t) OVER (PARTITION BY event_type
               ORDER BY t, event_id) AS DOUBLE) / 1e6 AS gap
           FROM o)
         SELECT event_type, count(*) AS n_gaps,
           round(quantile_cont(gap, 0.5), 4) AS p50_sec,
           round(quantile_cont(gap, 0.95), 4) AS p95_sec
         FROM g WHERE gap IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "q101_acctbal_pct_rank" ->
      """SELECT * FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
           FROM customer
           WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey))
         WHERE pct_rank >= 0.99
         ORDER BY c_mktsegment, c_custkey""",

    "q102_order_grouping_sets" ->
      """SELECT o_orderpriority,
           strftime(o_orderdate, '%Y-%m') AS month,
           CAST(2 * GROUPING(o_orderpriority)
             + GROUPING(strftime(o_orderdate, '%Y-%m')) AS INT) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority),
           (strftime(o_orderdate, '%Y-%m')))
         ORDER BY gid, o_orderpriority, month""",
  )
}
