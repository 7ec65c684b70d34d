package graft.registry

import graft.dedup.Dedup
import graft.functions.Fx
import graft.multimodal.Multimodal
import graft.operators.Analytics
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Sampling, splits, mixtures and shard packing — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Split from the original
  * single-file registry; member bodies are unchanged.
  */
private[graft] object SamplingRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_temperature_mixture" -> (temperatureMixture _),
    "q266_effective_sample_size" -> (essQ _),
    "q156_epoch_allocation" -> (epochAllocationQ _),
    "q158_negative_samples" -> (negativeSamplesQ _),
    "q165_epoch_order" -> (epochOrderQ _),
    "q41_hash_split" -> (hashSplitCounts _),
    "q42_stratified_sample" -> (stratifiedSample _),
    "q49_group_sample" -> (groupSample _),
    "q59_token_shards" -> (tokenShards _),
    "q62_weighted_order_sample" -> (weightedOrderSample _),
    "q67_source_cap" -> (sourceCap _),
    "q68_source_mixture" -> (sourceMixture _),
    "q70_cluster_split" -> (clusterSplit _),
    "q73_training_shards" -> (trainingShards _),
    "q212_stratified_kfold" -> (kfoldAuditQ _),
    "q217_padding_waste" -> (paddingWasteQ _),
    "q283_pps_ht_estimate" -> (ppsHtQ _),
    "q297_neyman_allocation" -> (neymanAllocationQ _),
    "q350_ratio_estimate" -> (ratioEstimateQ _),
    "q371_dsir_weights" -> (dsirWeightsQ _),
  )

  /** Ratio estimation ([[graft.sampling.Sampling.ratioEstimator]]):
    * per-customer spend (the expensive measured target) observed
    * only on the custkey ≡ 0 (mod 7) sample, expanded through the
    * fully-known order COUNT auxiliary — Cochran's estimator beside
    * q283's inverse-probability one, with the ratio-residual SE. At
    * 100 TB this is "price the census from the measured slice":
    * counts are free from metadata, spend needs the scan. Sums
    * exact; R̂ one mirrored division; residual squares micro-floored
    * before the sum.
    */
  private[graft] def ratioEstimateQ(
      s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("__x"),
        sum(floor(col("o_totalprice") * 100)).cast("long")
          .as("__y"))
    graft.sampling.Sampling.ratioEstimator(perCust,
        Seq("c_mktsegment"),
        col("c_custkey") % 7 === 0, col("__x"), col("__y"))
      .orderBy("c_mktsegment")
  }

  /** PPS + Horvitz–Thompson corpus estimation
    * ([[graft.sampling.Sampling.ppsHorvitzThompson]]): one global
    * token-weighted Poisson sample (expected 100 docs) and the
    * inverse-probability per-source doc-count / token-total
    * estimates it supports, beside the true totals — the
    * "monitor the corpus from a standing sample" audit. The
    * inclusion test and inverse probabilities are exact integer
    * arithmetic, so the oracle replays the draw bit-for-bit.
    */
  private[graft] def ppsHtQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.ppsHorvitzThompson(
        docs(s, dir).select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long")
            .as("__tok")),
        "doc_id", "__tok", Seq("source"), expectedK = 100,
        salt = "q283")
      .orderBy("source")

  /** Neyman vs proportional allocation
    * ([[graft.sampling.Sampling.neymanAllocation]]) of a 1000-row
    * inspection budget across market segments by order-value spread:
    * FURNITURE's values are deterministically tripled (the oracle
    * re-seeds it), so its stratum std triples and the optimal
    * allocation gives it ~3× its proportional share — the
    * measure-the-corpus-not-the-easy-part reading. Exact integer
    * moments, mirrored sqrt/quotas, largest-remainder integerization
    * summing exactly to the budget.
    */
  private[graft] def neymanAllocationQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val factor = when(col("c_mktsegment") === "FURNITURE", lit(3.0))
      .otherwise(lit(1.0))
    graft.sampling.Sampling.neymanAllocation(
        o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
        "c_mktsegment", floor(col("o_totalprice") * factor * 100),
        budget = 1000L)
      .orderBy("c_mktsegment")
  }

  /** Padding-waste / packing-win report
    * ([[graft.sampling.Packing.paddingWasteReport]]): at candidate
    * max sequence lengths, truncation loss and padding burn of
    * one-doc-per-row batching vs the utilization concat-and-chunk
    * packing reaches — the max_len sizing table.
    */
  private[graft] def paddingWasteQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Packing.paddingWasteReport(docs(s, dir),
        graft.text.TextAnalysis.tokenCount(col("text")),
        maxLens = Seq(64, 128, 256, 512))
      .orderBy("max_len")

  /** Stratified k-fold assignment audit
    * ([[graft.sampling.Sampling.stratifiedKFold]]): orders dealt
    * round-robin into 5 folds WITHIN each priority stratum by
    * md5-ordered rank — per-(fold, stratum) counts balanced ±1 by
    * construction, not hash luck; the rank rides rankByRange so no
    * stratum sorts in one task.
    */
  private[graft] def kfoldAuditQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.stratifiedKFold(
        t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority")),
        "o_orderkey", "o_orderpriority", k = 5, salt = "q212")
      .groupBy(col("fold"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("fold", "o_orderpriority")

  def oracleSql: Map[String, String] = Map(
    // the engine's md5 bucket device; every ln nano-floored once per
    // bucket/total so λ and the doc weights are exact BIGINTs; the
    // per-token average is FLOOR division on both sides (w_nano can
    // be negative — DuckDB's // floors, and the engine mirrors floor
    // via pmod, NOT truncating div)
    "q371_dsir_weights" ->
      s"""WITH toks AS (
           SELECT doc_id, coalesce(lang = 'en', false) AS tgt,
             CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256 AS b
           FROM (
             SELECT doc_id, lang, unnest($oracleWords) AS w
             FROM documents WHERE text IS NOT NULL)),
         pb AS (
           SELECT b,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT)
               AS tb,
             CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT)
               AS rb
           FROM toks GROUP BY 1),
         tt AS (
           SELECT CAST(sum(tb) AS BIGINT) AS t,
             CAST(sum(rb) AS BIGINT) AS r
           FROM pb),
         lam AS (
           SELECT b,
             CAST(floor(ln(CAST(tb + 1 AS DOUBLE)) * 1000000000.0)
                 AS BIGINT)
               - CAST(floor(ln(CAST(t + 256 AS DOUBLE))
                 * 1000000000.0) AS BIGINT)
               - CAST(floor(ln(CAST(rb + 1 AS DOUBLE))
                 * 1000000000.0) AS BIGINT)
               + CAST(floor(ln(CAST(r + 256 AS DOUBLE))
                 * 1000000000.0) AS BIGINT) AS lam
           FROM pb CROSS JOIN tt),
         sc AS (
           SELECT doc_id, CAST(tgt AS INT) AS is_target,
             CAST(count(*) AS BIGINT) AS tokens,
             CAST(sum(lam) AS BIGINT) AS w_nano
           FROM toks JOIN lam USING (b)
           GROUP BY doc_id, tgt)
         SELECT doc_id, is_target, tokens, w_nano,
           w_nano // tokens AS avg_lr_nano
         FROM sc
         ORDER BY avg_lr_nano DESC, doc_id LIMIT 40""",
    // exact stratum moments in HUGEINT, mirrored sqrt/quotas, and the
    // largest-remainder rank replayed with the same tie-break
    "q297_neyman_allocation" ->
      """WITH v AS (
           SELECT c_mktsegment AS stratum,
             CAST(floor(o_totalprice
               * (CASE WHEN c_mktsegment = 'FURNITURE'
                 THEN 3.0 ELSE 1.0 END) * 100) AS BIGINT) AS x
           FROM orders JOIN customer ON o_custkey = c_custkey),
         st AS (
           SELECT stratum, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(x) AS BIGINT) AS s,
             sum(CAST(x AS HUGEINT) * x) AS q
           FROM v GROUP BY stratum),
         ww AS (
           SELECT stratum, n_rows,
             sqrt(CAST(CAST(n_rows AS HUGEINT) * q
                 - CAST(s AS HUGEINT) * s AS DOUBLE)
               / (CAST(n_rows AS DOUBLE)
                 * (CAST(n_rows AS DOUBLE) - 1.0))) AS std
           FROM st),
         wn AS (
           SELECT stratum, n_rows, std,
             CASE WHEN n_rows < 2 THEN 0.0
               ELSE CAST(n_rows AS DOUBLE) * std END AS w_neyman,
             CAST(n_rows AS DOUBLE) AS w_prop
           FROM ww),
         wn2 AS (
           SELECT stratum, n_rows, std,
             CASE WHEN (SELECT sum(w_neyman) FROM wn) > 0.0
               THEN w_neyman ELSE w_prop END AS w_neyman, w_prop
           FROM wn),
         ney AS (
           SELECT stratum, n_rows, std, w_prop,
             1000.0 * w_neyman / (SELECT sum(w_neyman) FROM wn2)
               AS quota
           FROM wn2),
         neyr AS (
           SELECT stratum, n_rows, std, w_prop,
             CAST(floor(quota) AS BIGINT) AS flo,
             row_number() OVER (ORDER BY quota - floor(quota) DESC,
               stratum ASC) AS rk
           FROM ney),
         neyf AS (
           SELECT stratum, n_rows, std, w_prop,
             flo + CASE WHEN rk <= 1000 - (SELECT sum(flo) FROM neyr)
               THEN 1 ELSE 0 END AS n_neyman
           FROM neyr),
         pr AS (
           SELECT stratum, n_rows, std, n_neyman,
             1000.0 * w_prop / (SELECT sum(w_prop) FROM neyf)
               AS quota
           FROM neyf),
         prr AS (
           SELECT stratum, n_rows, std, n_neyman,
             CAST(floor(quota) AS BIGINT) AS flo,
             row_number() OVER (ORDER BY quota - floor(quota) DESC,
               stratum ASC) AS rk
           FROM pr)
         SELECT stratum AS c_mktsegment, n_rows,
           CASE WHEN n_rows < 2 THEN NULL ELSE round(std, 4) END
             AS std,
           CAST(n_neyman AS BIGINT) AS n_neyman,
           CAST(flo + CASE WHEN rk <= 1000 - (SELECT sum(flo)
             FROM prr) THEN 1 ELSE 0 END AS BIGINT) AS n_prop
         FROM prr ORDER BY c_mktsegment""",
    // the draw replays exactly: inclusion is the integer cross-
    // multiplication h32·W < k·w·2^32, inverse probabilities are
    // micro-quantized integral divisions, sums order-free
    "q283_pps_ht_estimate" ->
      s"""WITH r AS (
           SELECT source, doc_id,
             CAST(len($oracleWords) AS BIGINT) AS w
           FROM documents WHERE len($oracleWords) > 0),
         tot AS (SELECT CAST(sum(w) AS BIGINT) AS totw FROM r),
         s AS (
           SELECT r.source, r.w, tot.totw,
             CAST(('0x' || substr(md5('q283' ||
               CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
           FROM r, tot),
         m AS (
           SELECT source, w, totw,
             h32 * totw < 100 * 4294967296 * w AS insample,
             CASE WHEN 100 * w >= totw THEN CAST(1000000 AS HUGEINT)
               ELSE (CAST(totw AS HUGEINT) * 1000000) // (100 * w)
               END AS ipm
           FROM s)
         SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(w) AS BIGINT) AS total_weight,
           CAST(sum(CASE WHEN insample THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           round(CAST(sum(CASE WHEN insample THEN ipm ELSE 0 END)
             AS DOUBLE) / 1e6, 4) AS ht_rows,
           round(CAST(sum(CASE WHEN insample THEN ipm * w ELSE 0 END)
             AS DOUBLE) / 1e6, 4) AS ht_weight
         FROM m GROUP BY source ORDER BY source""",
    // exact token-count weights; Σw, Σw² through HUGEINT; ess/deff
    // each one mirrored double division
    "q266_effective_sample_size" ->
      """WITH w AS (
           SELECT lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS BIGINT) AS w
           FROM documents),
         g AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(w) AS BIGINT) AS w_sum,
             sum(CAST(w AS HUGEINT) * w) AS w2
           FROM w WHERE w IS NOT NULL AND w >= 0 GROUP BY lang)
         SELECT lang, n, w_sum,
           CASE WHEN w2 > 0 THEN
             round(CAST(CAST(w_sum AS HUGEINT) * w_sum AS DOUBLE)
               / CAST(w2 AS DOUBLE), 4) END AS ess,
           CASE WHEN w_sum > 0 THEN
             round(CAST(CAST(n AS HUGEINT) * w2 AS DOUBLE)
               / CAST(CAST(w_sum AS HUGEINT) * w_sum AS DOUBLE), 6)
             END AS deff
         FROM g ORDER BY lang""",
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
    // md5-ordered round-robin within each stratum: fold sizes are
    // ±1 per stratum by construction; deterministic in (salt, id)
    "q212_stratified_kfold" ->
      """WITH r AS (
           SELECT o_orderpriority,
             CAST((row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY md5('q212' || ':'
                 || CAST(o_orderkey AS VARCHAR)) ASC,
                 o_orderkey ASC) - 1) % 5 AS INT) AS fold
           FROM orders)
         SELECT fold, o_orderpriority, count(*) AS n
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    // exact BIGINT sums over (docs × candidate lengths); div ==
    // positive //, one division per statistic
    "q217_padding_waste" ->
      s"""WITH tk AS (
           SELECT CAST(len($oracleWords) AS BIGINT) AS t
           FROM documents),
         g AS (SELECT m AS max_len, count(*) AS n_docs,
           CAST(sum(t) AS BIGINT) AS total_tokens,
           CAST(sum(least(t, m)) AS BIGINT) AS kept_tokens,
           CAST(sum(greatest(t - m, 0)) AS BIGINT) AS truncated_tokens,
           CAST(sum(m - least(t, m)) AS BIGINT) AS padding_tokens
           FROM tk, (SELECT unnest([64, 128, 256, 512]) AS m) ms
           GROUP BY m)
         SELECT max_len, n_docs, total_tokens, kept_tokens,
           truncated_tokens, padding_tokens,
           round(CAST(kept_tokens AS DOUBLE)
             / CAST(n_docs * max_len AS DOUBLE), 6) AS utilization,
           (kept_tokens + max_len - 1) // max_len AS packed_batches,
           round(CAST(kept_tokens AS DOUBLE)
             / CAST(((kept_tokens + max_len - 1) // max_len) * max_len
               AS DOUBLE), 6) AS packed_utilization
         FROM g ORDER BY max_len""",
    // exact per-customer (count, spend) frame; R̂ one mirrored
    // division, residual squares micro-floored before the sum, the
    // SRS variance chain a fixed-order double expression
    "q350_ratio_estimate" ->
      """WITH pc AS (
           SELECT c_custkey AS id, c_mktsegment AS g,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         pop AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_pop,
             CAST(sum(x) AS BIGINT) AS x_pop
           FROM pc GROUP BY g),
         ss AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_sample,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy
           FROM pc WHERE id % 7 = 0 GROUP BY g),
         sr AS (
           SELECT *, CASE WHEN sx > 0 THEN CAST(sy AS DOUBLE)
             / CAST(sx AS DOUBLE) END AS r
           FROM ss),
         res AS (
           SELECT pc.g, CAST(sum(CAST(floor(
               (CAST(pc.y AS DOUBLE) - sr.r * CAST(pc.x AS DOUBLE))
               * (CAST(pc.y AS DOUBLE) - sr.r * CAST(pc.x AS DOUBLE)))
               AS BIGINT)) AS BIGINT) AS se2
           FROM pc JOIN sr ON sr.g = pc.g
           WHERE pc.id % 7 = 0 GROUP BY pc.g),
         j AS (
           SELECT pop.g, pop.n_pop, pop.x_pop, sr.n_sample, sr.sx,
             sr.r, res.se2
           FROM pop LEFT JOIN sr ON sr.g = pop.g
           LEFT JOIN res ON res.g = pop.g)
         SELECT g AS c_mktsegment, n_pop,
           coalesce(n_sample, 0) AS n_sample, x_pop,
           round(CASE WHEN n_sample >= 2 AND sx > 0 THEN r END, 6)
             AS ratio,
           round(CASE WHEN n_sample >= 2 AND sx > 0 THEN
             r * CAST(x_pop AS DOUBLE) END, 4) AS y_hat,
           round(CASE WHEN n_sample >= 2 AND sx > 0 THEN
             sqrt(CAST(n_pop AS DOUBLE) * CAST(n_pop AS DOUBLE)
               * (1.0 - CAST(n_sample AS DOUBLE)
                 / CAST(n_pop AS DOUBLE))
               * (CAST(se2 AS DOUBLE)
                 / (CAST(n_sample AS DOUBLE) - 1.0))
               / CAST(n_sample AS DOUBLE)) END, 4) AS se
         FROM j ORDER BY c_mktsegment""",
  )

  /** Deterministic hash-based train/val/test split over orders — pure
    * column expression (no shuffle, no rand()), so the assignment is
    * identical across engines, runs, and table growth. Summarized per
    * split to pin the exact membership via count + price sum.
    */
  private[graft] def hashSplitCounts(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.stratifiedSampleExact(
        t(s, dir, "orders"), "o_orderkey", Seq("o_orderpriority"), 0.1)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum(col("o_orderkey").cast("double")), 1).as("key_sum"))
      .orderBy("o_orderpriority")

  /** Deterministic n-per-group sampling (reservoir analogue): the 5
    * min-hash orders per priority, membership pinned by the key sum.
    */
  private[graft] def groupSample(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def tokenShards(s: SparkSession, dir: String): DataFrame = {
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

  /** Weighted sample without replacement (Efraimidis–Spirakis A-RES,
    * ln(u)/w keys): 20 orders with inclusion probability scaling with
    * o_totalprice, membership pinned by the md5 hash — deterministic
    * across engines.
    */
  private[graft] def weightedOrderSample(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.weightedSample(
        t(s, dir, "orders"), "o_orderkey", "o_totalprice", k = 20)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** Temperature-scaled mixture weights
    * ([[graft.sampling.Sampling.temperatureWeights]]): the α-sampling
    * table for the per-language training mix at α = 0.5 — natural
    * share p, reweighted share q ∝ p^α, and the size-preserving
    * repetition factor q/p that [[graft.sampling.Sampling.mixture]]
    * consumes. FP-order-sensitive quantities rounded at 6.
    */
  /** Kish effective sample size
    * ([[graft.sampling.Sampling.effectiveSampleSize]]) of documents
    * weighted by their token count, per language — "if we draw docs
    * proportional to length, how many equal-weight docs is each
    * language slice actually worth". Exact integer weights (token
    * counts), DECIMAL moment sums, one mirrored double division each
    * for ess and deff.
    */
  private[graft] def essQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.effectiveSampleSize(
        docs(s, dir), Seq("lang"),
        size(graft.text.TextAnalysis.words(col("text"))).cast("long"))
      .orderBy("lang")

  private[graft] def temperatureMixture(
      s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.temperatureWeights(
        docs(s, dir).select(col("lang")), "lang", alpha = 0.5)
      .select(col("group"), col("n").cast("long").as("n_docs"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round(col("weight"), 6).as("weight"))
      .orderBy("group")

  /** Per-source quota cap (the per-domain cap every web corpus
    * applies) via [[graft.sampling.Sampling.cappedPerGroupSample]] —
    * the two-phase skew-safe form: a count-aware hash pre-filter
    * bounds each group's window input to ~cap rows, so one mega-domain
    * can never pin a single sort task. The id checksum pins the exact
    * kept SET, not just its size.
    */
  private[graft] def sourceCap(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def sourceMixture(s: SparkSession, dir: String): DataFrame = {
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

  /** Leakage-aware train/val/test split: near-dup clusters (MinHash-
    * LSH verified pairs → connected components) share one split
    * assignment, so a near-copy of a training document can never leak
    * into val/test — the contamination hazard per-id hash splits
    * (q41) leave open. Composition of q24's pair finder, q31's
    * component labeler, and q41's split hash.
    */
  private[graft] def clusterSplit(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def trainingShards(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def epochAllocationQ(
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

  /** Uniform negative sampling
    * ([[graft.sampling.Sampling.negativeSample]]): per customer, 5
    * parts they never ordered, drawn by deterministic hash from the
    * part catalog — the contrastive-training negative sampler's
    * uniform (easy-negative) counterpart to q141's hard negatives.
    */
  private[graft] def negativeSamplesQ(s: SparkSession, dir: String): DataFrame = {
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

  /** Deterministic epoch shuffle + worker sharding
    * ([[graft.sampling.Sampling.epochOrder]]): the reproducible
    * global training order for epoch 2 over 4 data-loader workers —
    * every engine, run, and partitioning derives the same permutation
    * and the same balanced shards.
    */
  private[graft] def epochOrderQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.epochOrder(
        docs(s, dir).select(col("doc_id")), "doc_id", epoch = 2,
        numWorkers = 4)
      .select(col("doc_id"), col("order_idx"), col("worker"),
        col("worker_pos"))
      .orderBy("order_idx")

  /** DSIR importance weights ([[graft.sampling.Sampling.dsirWeights]])
    * toward the English slice of the documents table: the top-40
    * documents by per-token hashed-unigram log-likelihood ratio — the
    * published "select raw data shaped like my curated set" recipe,
    * scored here with λ exact to the nano-ln unit on both engines.
    */
  private[graft] def dsirWeightsQ(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampling.dsirWeights(
      docs(s, dir), "doc_id", "text",
      targetFlag = col("lang") === "en", buckets = 256, topK = 40)
}
