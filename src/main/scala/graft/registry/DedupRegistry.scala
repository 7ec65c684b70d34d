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

/** Exact and near-duplicate detection queries — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Split from the original
  * single-file registry; member bodies are unchanged.
  */
private[graft] object DedupRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q103_contamination_capped" -> (contaminationCapped _),
    "q106_shared_spans" -> (sharedSpanPairs _),
    "q109_content_chunks" -> (contentChunks _),
    "q110_neardup_incremental" -> (nearDupIncremental _),
    "q114_chunk_incremental" -> (chunkIncrementalDedup _),
    "q118_lsh_recall_audit" -> (lshRecallAuditQ _),
    "q119_ngram_containment" -> (ngramContainmentPairs _),
    "q120_minhash_jaccard_est" -> (minhashJaccardEst _),
    "q276_bbit_minhash" -> (bbitMinhashEst _),
    "q280_dedup_capture_recapture" -> (dedupCaptureRecaptureQ _),
    "q282_detector_disagreement" -> (detectorDisagreementQ _),
    "q284_mcnemar_detectors" -> (mcnemarDetectorsQ _),
    "q303_cochran_q" -> (cochranQDetectorsQ _),
    "q311_fleiss_kappa" -> (fleissKappaDetectorsQ _),
    "q121_containment_incremental" -> (containmentIncremental _),
    "q126_entity_resolution" -> (entityResolution _),
    "q128_keepbest_near_dedup" -> (keepBestNearDedup _),
    "q134_line_dedup" -> (lineDedupDocs _),
    "q135_global_line_dedup" -> (globalLineDedupDocs _),
    "q148_mergeable_datasheet" -> (mergeableDatasheetQ _),
    "q149_dedup_token_budget" -> (dedupTokenBudget _),
    "q152_cross_source_dup_matrix" -> (crossSourceDupMatrixQ _),
    "q218_split_leakage" -> (splitLeakageQ _),
    "q222_incremental_cc" -> (incrementalCcQ _),
    "q226_pair_evidence" -> (pairEvidenceQ _),
    "q228_novelty_screen" -> (noveltyScreenQ _),
    "q229_lsh_plan" -> (lshPlanQ _),
    "q234_sorted_neighborhood" -> (sortedNeighborhoodQ _),
    "q247_jaro_winkler_pairs" -> (jaroWinklerPairsQ _),
    "q248_fs_weights" -> (fsWeightsQ _),
    "q251_dedup_sensitivity" -> (dedupSensitivityQ _),
    "q252_damerau_pairs" -> (damerauPairsQ _),
    "q155_merge_survivorship" -> (mergeSurvivorshipQ _),
    "q21_doc_fingerprints" -> (docFingerprints _),
    "q22_exact_dup_stats" -> (exactDupStats _),
    "q23_ngram_jaccard_pairs" -> (ngramJaccardPairs _),
    "q24_minhash_lsh_pairs" -> (minhashLshPairs _),
    "q267_source_dup_matrix" -> (sourceDupMatrixQ _),
    "q273_dedup_monitor_suite" -> (dedupMonitorSuiteQ _),
    "q363_detector_audit_suite" -> (detectorAuditSuiteQ _),
    "q366_pair_store_audit" -> (pairStoreAuditQ _),
    "q25_simhash_fingerprints" -> (simhashFingerprints _),
    "q26_simhash_pairs" -> (simhashPairs _),
    "q31_corpus_prep" -> (corpusPrep _),
    "q51_incremental_dedup" -> (incrementalDedup _),
    "q64_contamination" -> (contamination _),
    "q66_corpus_datasheet" -> (corpusDatasheet _),
    "q71_dup_chunk_fraction" -> (dupChunkFraction _),
    "q74_bloom_incremental" -> (bloomIncrementalDedup _),
    "q83_neardup_histogram" -> (nearDupClusterHistogram _),
    "q355_url_canonicalize" -> (urlCanonicalizeQ _),
  )

  /** URL canonicalization dedup ([[graft.text.Web.canonicalizeUrl]]):
    * each doc_id synthesizes a messy crawl URL — case-varied scheme
    * and host, the http :80 / https :443 default ports, tracking
    * params, shuffled param order, fragments — in two host families
    * plus a malformed shape every 13th id, and the canonical form
    * collapses the equivalence classes the frontier must dedup on.
    * `dup_count` (a window over the canonical form) is the dedup
    * read; malformed URLs canonicalize to null and group together as
    * the quarantine bucket. Pure regexp/array algebra, closed-form
    * oracle.
    */
  private[graft] def urlCanonicalizeQ(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val scheme = when(id % 3 === 0, "HTTP").otherwise(lit("http"))
    val host = concat(
      when(id % 2 === 0, "Example").otherwise(lit("example")),
      (id % 20).cast("string"), lit(".com"))
    val port = when(id % 4 === 0, ":80").otherwise(lit(""))
    val path = concat(lit("/p"), (id % 6).cast("string"))
    val query = when(id % 2 === 0,
      concat(lit("?utm_source=x&b=2&a="), (id % 5).cast("string")))
      .otherwise(concat(lit("?b=2&a="), (id % 5).cast("string")))
    val frag = when(id % 5 === 0, "#sec").otherwise(lit(""))
    val familyA = concat(scheme, lit("://"), host, port, path,
      query, frag)
    val familyB = concat(lit("HTTPS://Api"), (id % 20).cast("string"),
      lit(".io:443"))
    val raw = when(id % 13 === 0,
        concat(lit("not-a-url-"), id.cast("string")))
      .when(id % 11 === 0, familyB)
      .otherwise(familyA)
    val out = docs(s, dir)
      .select(id, graft.text.Web.canonicalizeUrl(raw).as("canonical"))
    out
      .withColumn("dup_count",
        count(lit(1)).over(Window.partitionBy(col("canonical"))))
      .orderBy("doc_id")
  }

  /** q280's full-rebuild capture-recapture SQL — shared verbatim by
    * q366 (the store-read audit must reproduce these numbers exactly).
    */
  private[graft] val oracleCaptureRecaptureSql: String =
    s"""WITH $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         mh AS (
           SELECT ida, idb FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         ${oracleSimhashCtes("s")},
         sp AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb
           FROM sshp a JOIN sshp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) <= 3),
         c AS (
           SELECT
             (SELECT count(*) FROM mh) AS n1,
             (SELECT count(*) FROM sp) AS n2,
             (SELECT count(*) FROM mh JOIN sp USING (ida, idb)) AS m),
         f AS (
           SELECT n1, n2, m,
             CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m + 1) - 1
               AS BIGINT) AS nhat
           FROM c)
         SELECT CAST(n1 AS BIGINT) AS n_minhash,
           CAST(n2 AS BIGINT) AS n_simhash,
           CAST(m AS BIGINT) AS n_overlap,
           nhat AS chapman_total,
           round(CAST(n1 AS DOUBLE)
             / nullif(CAST(nhat AS DOUBLE), 0.0), 6) AS recall_minhash,
           round(CAST(n2 AS DOUBLE)
             / nullif(CAST(nhat AS DOUBLE), 0.0), 6) AS recall_simhash
         FROM f"""

  def oracleSql: Map[String, String] = Map(
    // closed form of the messy-URL builder's id arithmetic; the
    // null-canonical quarantine bucket windows together on both
    // engines
    "q355_url_canonicalize" ->
      """WITH c AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN NULL
               WHEN doc_id % 11 = 0 THEN
                 'https://api' || CAST(doc_id % 20 AS VARCHAR)
                   || '.io/'
               ELSE 'http://example' || CAST(doc_id % 20 AS VARCHAR)
                 || '.com/p' || CAST(doc_id % 6 AS VARCHAR)
                 || '?a=' || CAST(doc_id % 5 AS VARCHAR) || '&b=2'
             END AS canonical
           FROM documents)
         SELECT doc_id, canonical,
           CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT)
             AS dup_count
         FROM c ORDER BY doc_id""",
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
    // the q280 chains emitted at pair level: inner join = both,
    // anti joins = each detector's exclusive catches
    "q282_detector_disagreement" ->
      s"""WITH $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         mh AS (
           SELECT ida, idb,
             round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 4)
               AS jaccard
           FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         ${oracleSimhashCtes("s")},
         sp AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb,
             CAST(bit_count(xor(a.hi, b.hi))
               + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
           FROM sshp a JOIN sshp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) <= 3)
         SELECT 'both' AS verdict, mh.ida AS id_a, mh.idb AS id_b,
           jaccard, hamming
         FROM mh JOIN sp ON mh.ida = sp.ida AND mh.idb = sp.idb
         UNION ALL
         SELECT 'minhash_only', ida, idb, jaccard,
           CAST(NULL AS INT)
         FROM mh WHERE NOT EXISTS (SELECT 1 FROM sp
           WHERE sp.ida = mh.ida AND sp.idb = mh.idb)
         UNION ALL
         SELECT 'simhash_only', ida, idb, CAST(NULL AS DOUBLE),
           hamming
         FROM sp WHERE NOT EXISTS (SELECT 1 FROM mh
           WHERE mh.ida = sp.ida AND mh.idb = sp.idb)
         ORDER BY verdict, id_a, id_b""",
    // three capture chains (exact-verify, simhash, 1-bit est) over
    // the pair union; all Q terms exact in HUGEINT, one division
    "q303_cochran_q" ->
      s"""WITH $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         mh AS (
           SELECT ida, idb FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         ${oracleSimhashCtes("s")},
         sp AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb
           FROM sshp a JOIN sshp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) <= 3),
         bb AS (
           SELECT c.ida, c.idb
           FROM cands c
           JOIN sigs a ON a.doc_id = c.ida
           JOIN sigs b ON b.doc_id = c.idb
           WHERE round(greatest(0.0, CAST((${(0 until 16).map(i =>
        s"(CASE WHEN (a.h$i & 1) = (b.h$i & 1) THEN 1 ELSE 0 END)")
        .mkString(" + ")}) * 2 - 16 AS DOUBLE) / 16.0), 4) >= 0.5),
         pu AS (
           SELECT DISTINCT ida, idb FROM (
             SELECT ida, idb FROM mh
             UNION ALL SELECT ida, idb FROM sp
             UNION ALL SELECT ida, idb FROM bb)),
         fl AS (
           SELECT pu.ida, pu.idb,
             CASE WHEN EXISTS (SELECT 1 FROM mh
               WHERE mh.ida = pu.ida AND mh.idb = pu.idb)
               THEN 1 ELSE 0 END AS fm,
             CASE WHEN EXISTS (SELECT 1 FROM sp
               WHERE sp.ida = pu.ida AND sp.idb = pu.idb)
               THEN 1 ELSE 0 END AS fs,
             CASE WHEN EXISTS (SELECT 1 FROM bb
               WHERE bb.ida = pu.ida AND bb.idb = pu.idb)
               THEN 1 ELSE 0 END AS fb
           FROM pu),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(fm) AS BIGINT) AS g1,
             CAST(sum(fs) AS BIGINT) AS g2,
             CAST(sum(fb) AS BIGINT) AS g3,
             sum(CAST(fm + fs + fb AS HUGEINT)
               * (fm + fs + fb)) AS l2
           FROM fl),
         f AS (
           SELECT n_items, g1, g2, g3,
             CAST(2 * (3 * (CAST(g1 AS HUGEINT) * g1
               + CAST(g2 AS HUGEINT) * g2 + CAST(g3 AS HUGEINT) * g3)
               - CAST(g1 + g2 + g3 AS HUGEINT) * (g1 + g2 + g3))
               AS DOUBLE) AS num,
             CAST(3 * CAST(g1 + g2 + g3 AS HUGEINT) - l2 AS DOUBLE)
               AS den
           FROM agg)
         SELECT n_items, g1 AS g_by_minhash, g2 AS g_by_simhash,
           g3 AS g_by_bbit,
           CASE WHEN den <= 0 THEN NULL
             ELSE round(num / den, 6) END AS q,
           CAST(2 AS INT) AS dof,
           CAST(coalesce((CASE WHEN den <= 0 THEN NULL
             ELSE num / den END) > 5.991465, FALSE) AS INT)
             AS differs
         FROM f""",
    // the q303 flags frame with the Fleiss tail: N, Σs and
    // Σ(s²+(3−s)²) exact, κ one mirrored double formula
    "q311_fleiss_kappa" ->
      s"""WITH $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         mh AS (
           SELECT ida, idb FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         ${oracleSimhashCtes("s")},
         sp AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb
           FROM sshp a JOIN sshp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) <= 3),
         bb AS (
           SELECT c.ida, c.idb
           FROM cands c
           JOIN sigs a ON a.doc_id = c.ida
           JOIN sigs b ON b.doc_id = c.idb
           WHERE round(greatest(0.0, CAST((${(0 until 16).map(i =>
        s"(CASE WHEN (a.h$i & 1) = (b.h$i & 1) THEN 1 ELSE 0 END)")
        .mkString(" + ")}) * 2 - 16 AS DOUBLE) / 16.0), 4) >= 0.5),
         pu AS (
           SELECT DISTINCT ida, idb FROM (
             SELECT ida, idb FROM mh
             UNION ALL SELECT ida, idb FROM sp
             UNION ALL SELECT ida, idb FROM bb)),
         fl AS (
           SELECT pu.ida, pu.idb,
             CASE WHEN EXISTS (SELECT 1 FROM mh
               WHERE mh.ida = pu.ida AND mh.idb = pu.idb)
               THEN 1 ELSE 0 END AS fm,
             CASE WHEN EXISTS (SELECT 1 FROM sp
               WHERE sp.ida = pu.ida AND sp.idb = pu.idb)
               THEN 1 ELSE 0 END AS fs,
             CASE WHEN EXISTS (SELECT 1 FROM bb
               WHERE bb.ida = pu.ida AND bb.idb = pu.idb)
               THEN 1 ELSE 0 END AS fb
           FROM pu),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(fm + fs + fb) AS BIGINT) AS s1,
             sum(CAST(fm + fs + fb AS HUGEINT) * (fm + fs + fb)
               + CAST(3 - fm - fs - fb AS HUGEINT)
                 * (3 - fm - fs - fb)) AS sq
           FROM fl),
         f AS (
           SELECT n, s1,
             (CAST(sq AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))
               / (6.0 * CAST(n AS DOUBLE)) AS pbar,
             CAST(s1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS p1
           FROM agg),
         g AS (
           SELECT n, pbar, p1,
             p1 * p1 + (1.0 - p1) * (1.0 - p1) AS pe
           FROM f)
         SELECT n AS n_items, CAST(3 AS INT) AS n_raters,
           round(p1, 6) AS p_flag, round(pbar, 6) AS p_bar,
           round(pe, 6) AS p_e,
           CASE WHEN 1.0 - pe <= 0 OR n < 1 THEN NULL
             ELSE round((pbar - pe) / (1.0 - pe), 6) END AS kappa,
           CAST(coalesce((CASE WHEN 1.0 - pe <= 0 OR n < 1 THEN NULL
             ELSE (pbar - pe) / (1.0 - pe) END) >= 0.61, FALSE)
             AS INT) AS substantial
         FROM g""",
    // the q280 capture chains reduced to the McNemar cells: discordant
    // counts exact, (b−c)² in HUGEINT, one double division per χ²
    "q284_mcnemar_detectors" ->
      s"""WITH $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         mh AS (
           SELECT ida, idb FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         ${oracleSimhashCtes("s")},
         sp AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb
           FROM sshp a JOIN sshp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) <= 3),
         cells AS (
           SELECT
             (SELECT count(*) FROM mh JOIN sp USING (ida, idb))
               AS n11,
             (SELECT count(*) FROM mh WHERE NOT EXISTS (
               SELECT 1 FROM sp
               WHERE sp.ida = mh.ida AND sp.idb = mh.idb)) AS b,
             (SELECT count(*) FROM sp WHERE NOT EXISTS (
               SELECT 1 FROM mh
               WHERE mh.ida = sp.ida AND mh.idb = sp.idb)) AS c),
         f AS (
           SELECT n11, b, c,
             (CAST(b AS HUGEINT) - c) * (CAST(b AS HUGEINT) - c)
               AS num,
             greatest(abs(CAST(b AS HUGEINT) - c) - 1, 0)
               * greatest(abs(CAST(b AS HUGEINT) - c) - 1, 0)
               AS num_cc
           FROM cells)
         SELECT CAST(n11 AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_minhash_only,
           CAST(c AS BIGINT) AS n_simhash_only,
           CASE WHEN b + c = 0 THEN NULL
             ELSE round(CAST(num AS DOUBLE) / (b + c), 6) END AS chi2,
           CASE WHEN b + c = 0 THEN NULL
             ELSE round(CAST(num_cc AS DOUBLE) / (b + c), 6)
             END AS chi2_cc,
           CAST(CASE WHEN b + c = 0 THEN 0
             WHEN CAST(num_cc AS DOUBLE) / (b + c) > 3.841 THEN 1
             ELSE 0 END AS INT) AS differs
         FROM f""",
    // both capture chains replayed (minhash verify at 0.8, simhash
    // hamming <= 3 all-pairs — exact by pigeonhole vs the banded
    // engine), Chapman as one integral division of exact counts
    "q280_dedup_capture_recapture" -> oracleCaptureRecaptureSql,
    // the store-read audit must reproduce the REBUILD's numbers
    // exactly (append == rebuild): q366's oracle IS q280's
    // full-rebuild SQL, verbatim by reference
    "q366_pair_store_audit" -> oracleCaptureRecaptureSql,
    // the composed suite: ONE shared CTE scaffold (shingles,
    // signatures, candidates, verified mh, simhash sp, 1-bit bb,
    // pair union fl with per-detector evidence), five audit legs
    // melted to (report, key_a, key_b, n, metric) — each leg's
    // formulas verbatim from its standalone oracle
    "q363_detector_audit_suite" ->
      s"""WITH $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         mh AS (
           SELECT ida, idb,
             round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 4)
               AS j
           FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         ${oracleSimhashCtes("s")},
         sp AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb,
             CAST(bit_count(xor(a.hi, b.hi))
               + bit_count(xor(a.lo, b.lo)) AS INT) AS hm
           FROM sshp a JOIN sshp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.hi, b.hi))
             + bit_count(xor(a.lo, b.lo)) <= 3),
         bb AS (
           SELECT c.ida, c.idb
           FROM cands c
           JOIN sigs a ON a.doc_id = c.ida
           JOIN sigs b ON b.doc_id = c.idb
           WHERE round(greatest(0.0, CAST((${(0 until 16).map(i =>
        s"(CASE WHEN (a.h$i & 1) = (b.h$i & 1) THEN 1 ELSE 0 END)")
        .mkString(" + ")}) * 2 - 16 AS DOUBLE) / 16.0), 4) >= 0.5),
         pu AS (
           SELECT DISTINCT ida, idb FROM (
             SELECT ida, idb FROM mh
             UNION ALL SELECT ida, idb FROM sp
             UNION ALL SELECT ida, idb FROM bb)),
         fl AS (
           SELECT pu.ida, pu.idb, mh.j, sp.hm,
             CASE WHEN mh.ida IS NOT NULL THEN 1 ELSE 0 END AS fm,
             CASE WHEN sp.ida IS NOT NULL THEN 1 ELSE 0 END AS fs,
             CASE WHEN bb.ida IS NOT NULL THEN 1 ELSE 0 END AS fb
           FROM pu
           LEFT JOIN mh ON mh.ida = pu.ida AND mh.idb = pu.idb
           LEFT JOIN sp ON sp.ida = pu.ida AND sp.idb = pu.idb
           LEFT JOIN bb ON bb.ida = pu.ida AND bb.idb = pu.idb),
         cap AS (
           SELECT sum(fm) AS n1, sum(fs) AS n2, sum(fm * fs) AS m
           FROM fl),
         capf AS (
           SELECT n1, n2, m,
             CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m + 1) - 1
               AS BIGINT) AS nhat
           FROM cap),
         mc AS (
           SELECT sum(fm * fs) AS n11,
             sum(CASE WHEN fm = 1 AND fs = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN fm = 0 AND fs = 1 THEN 1 ELSE 0 END) AS c
           FROM fl WHERE fm = 1 OR fs = 1),
         mcf AS (
           SELECT n11, b, c,
             (CAST(b AS HUGEINT) - c) * (CAST(b AS HUGEINT) - c)
               AS num,
             greatest(abs(CAST(b AS HUGEINT) - c) - 1, 0)
               * greatest(abs(CAST(b AS HUGEINT) - c) - 1, 0)
               AS num_cc
           FROM mc),
         cqa AS (
           SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(fm) AS BIGINT) AS g1,
             CAST(sum(fs) AS BIGINT) AS g2,
             CAST(sum(fb) AS BIGINT) AS g3,
             sum(CAST(fm + fs + fb AS HUGEINT)
               * (fm + fs + fb)) AS l2
           FROM fl),
         cqf AS (
           SELECT n_items, g1, g2, g3,
             CAST(2 * (3 * (CAST(g1 AS HUGEINT) * g1
               + CAST(g2 AS HUGEINT) * g2 + CAST(g3 AS HUGEINT) * g3)
               - CAST(g1 + g2 + g3 AS HUGEINT) * (g1 + g2 + g3))
               AS DOUBLE) AS num,
             CAST(3 * CAST(g1 + g2 + g3 AS HUGEINT) - l2 AS DOUBLE)
               AS den
           FROM cqa),
         fka AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(fm + fs + fb) AS BIGINT) AS s1,
             sum(CAST(fm + fs + fb AS HUGEINT) * (fm + fs + fb)
               + CAST(3 - fm - fs - fb AS HUGEINT)
                 * (3 - fm - fs - fb)) AS sq
           FROM fl),
         fkf AS (
           SELECT n, s1,
             (CAST(sq AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))
               / (6.0 * CAST(n AS DOUBLE)) AS pbar,
             CAST(s1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS p1
           FROM fka),
         fkg AS (
           SELECT n, pbar, p1,
             p1 * p1 + (1.0 - p1) * (1.0 - p1) AS pe
           FROM fkf)
         SELECT * FROM (
         SELECT 'capture_recapture' AS report, 'n_minhash' AS key_a,
           '' AS key_b, CAST(n1 AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS metric FROM capf
         UNION ALL
         SELECT 'capture_recapture', 'n_simhash', '',
           CAST(n2 AS BIGINT), CAST(NULL AS DOUBLE) FROM capf
         UNION ALL
         SELECT 'capture_recapture', 'n_overlap', '',
           CAST(m AS BIGINT), CAST(NULL AS DOUBLE) FROM capf
         UNION ALL
         SELECT 'capture_recapture', 'chapman_total', '', nhat,
           CAST(NULL AS DOUBLE) FROM capf
         UNION ALL
         SELECT 'capture_recapture', 'recall_minhash', '',
           CAST(NULL AS BIGINT),
           round(CAST(n1 AS DOUBLE)
             / nullif(CAST(nhat AS DOUBLE), 0.0), 6) FROM capf
         UNION ALL
         SELECT 'capture_recapture', 'recall_simhash', '',
           CAST(NULL AS BIGINT),
           round(CAST(n2 AS DOUBLE)
             / nullif(CAST(nhat AS DOUBLE), 0.0), 6) FROM capf
         UNION ALL
         SELECT 'queue',
           CASE WHEN fm = 1 AND fs = 1 THEN 'both'
             WHEN fm = 1 THEN 'minhash_only'
             ELSE 'simhash_only' END,
           CAST(ida AS VARCHAR) || ':' || CAST(idb AS VARCHAR),
           CAST(hm AS BIGINT), CAST(j AS DOUBLE)
         FROM fl WHERE fm = 1 OR fs = 1
         UNION ALL
         SELECT 'mcnemar', 'n_both', '', CAST(n11 AS BIGINT),
           CAST(NULL AS DOUBLE) FROM mcf
         UNION ALL
         SELECT 'mcnemar', 'n_minhash_only', '', CAST(b AS BIGINT),
           CAST(NULL AS DOUBLE) FROM mcf
         UNION ALL
         SELECT 'mcnemar', 'n_simhash_only', '', CAST(c AS BIGINT),
           CAST(NULL AS DOUBLE) FROM mcf
         UNION ALL
         SELECT 'mcnemar', 'differs', '',
           CAST(CASE WHEN b + c = 0 THEN 0
             WHEN CAST(num_cc AS DOUBLE) / (b + c) > 3.841 THEN 1
             ELSE 0 END AS BIGINT),
           CAST(NULL AS DOUBLE) FROM mcf
         UNION ALL
         SELECT 'mcnemar', 'chi2', '', CAST(NULL AS BIGINT),
           CASE WHEN b + c = 0 THEN NULL
             ELSE round(CAST(num AS DOUBLE) / (b + c), 6) END
         FROM mcf
         UNION ALL
         SELECT 'mcnemar', 'chi2_cc', '', CAST(NULL AS BIGINT),
           CASE WHEN b + c = 0 THEN NULL
             ELSE round(CAST(num_cc AS DOUBLE) / (b + c), 6) END
         FROM mcf
         UNION ALL
         SELECT 'cochran_q', 'n_items', '', n_items,
           CAST(NULL AS DOUBLE) FROM cqf
         UNION ALL
         SELECT 'cochran_q', 'g_by_minhash', '', g1,
           CAST(NULL AS DOUBLE) FROM cqf
         UNION ALL
         SELECT 'cochran_q', 'g_by_simhash', '', g2,
           CAST(NULL AS DOUBLE) FROM cqf
         UNION ALL
         SELECT 'cochran_q', 'g_by_bbit', '', g3,
           CAST(NULL AS DOUBLE) FROM cqf
         UNION ALL
         SELECT 'cochran_q', 'dof', '', CAST(2 AS BIGINT),
           CAST(NULL AS DOUBLE) FROM cqf
         UNION ALL
         SELECT 'cochran_q', 'differs', '',
           CAST(coalesce((CASE WHEN den <= 0 THEN NULL
             ELSE num / den END) > 5.991465, FALSE) AS BIGINT),
           CAST(NULL AS DOUBLE) FROM cqf
         UNION ALL
         SELECT 'cochran_q', 'q', '', CAST(NULL AS BIGINT),
           CASE WHEN den <= 0 THEN NULL
             ELSE round(num / den, 6) END FROM cqf
         UNION ALL
         SELECT 'fleiss_kappa', 'n_items', '', n,
           CAST(NULL AS DOUBLE) FROM fkg
         UNION ALL
         SELECT 'fleiss_kappa', 'n_raters', '', CAST(3 AS BIGINT),
           CAST(NULL AS DOUBLE) FROM fkg
         UNION ALL
         SELECT 'fleiss_kappa', 'substantial', '',
           CAST(coalesce((CASE WHEN 1.0 - pe <= 0 OR n < 1 THEN NULL
             ELSE (pbar - pe) / (1.0 - pe) END) >= 0.61, FALSE)
             AS BIGINT),
           CAST(NULL AS DOUBLE) FROM fkg
         UNION ALL
         SELECT 'fleiss_kappa', 'p_flag', '', CAST(NULL AS BIGINT),
           round(p1, 6) FROM fkg
         UNION ALL
         SELECT 'fleiss_kappa', 'p_bar', '', CAST(NULL AS BIGINT),
           round(pbar, 6) FROM fkg
         UNION ALL
         SELECT 'fleiss_kappa', 'p_e', '', CAST(NULL AS BIGINT),
           round(pe, 6) FROM fkg
         UNION ALL
         SELECT 'fleiss_kappa', 'kappa', '', CAST(NULL AS BIGINT),
           CASE WHEN 1.0 - pe <= 0 OR n < 1 THEN NULL
             ELSE round((pbar - pe) / (1.0 - pe), 6) END FROM fkg)
         ORDER BY report, key_a, key_b""",
    // the 1-bit estimate replays (agree·2 − 16)/16 over the masked
    // low bits — exact integers into one division, clamped at 0
    "q276_bbit_minhash" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes
         SELECT c.ida AS id_a, c.idb AS id_b,
           round((${(0 until 16).map(i =>
        s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)")
        .mkString(" + ")}) / 16.0, 4) AS est_jaccard,
           round(greatest(0.0, CAST((${(0 until 16).map(i =>
        s"(CASE WHEN (a.h$i & 1) = (b.h$i & 1) THEN 1 ELSE 0 END)")
        .mkString(" + ")}) * 2 - 16 AS DOUBLE) / 16.0), 4) AS est_b1
         FROM cands c
         JOIN sigs a ON a.doc_id = c.ida
         JOIN sigs b ON b.doc_id = c.idb
         ORDER BY id_a, id_b""",
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
    // the q152 chain with the md5 hash split as the source label:
    // cross-split cells ARE the leakage
    "q218_split_leakage" ->
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
           SELECT ${oracleSplitCase("x")} AS src_a,
             ${oracleSplitCase("y")} AS src_b, x, y
           FROM sym),
         cells AS (
           SELECT src_a, src_b,
             CAST(CASE WHEN src_a = src_b THEN count(*) // 2
                       ELSE count(*) END AS BIGINT) AS n_pairs,
             count(DISTINCT x) AS n_dup_docs
           FROM es GROUP BY 1, 2),
         tot AS (SELECT ${oracleSplitCase("doc_id")} AS src_a,
                 count(*) AS n_docs
                 FROM documents GROUP BY 1)
         SELECT src_a, src_b, n_pairs,
           CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(n_dup_docs AS DOUBLE) / n_docs, 4) AS dup_frac
         FROM cells JOIN tot USING (src_a)
         ORDER BY src_a, src_b""",
    // chain components have a closed form: min order key per customer
    // — no recursion needed; ≥2-order customers only (CC contract:
    // isolated nodes absent)
    "q222_incremental_cc" ->
      """WITH o AS (SELECT o_custkey, o_orderkey FROM orders),
         c AS (
           SELECT o_custkey, count(*) AS n, min(o_orderkey) AS mn
           FROM o GROUP BY 1)
         SELECT o_orderkey AS id, mn AS component
         FROM o JOIN c USING (o_custkey) WHERE n >= 2
         ORDER BY id""",
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
    // the q23 pair set replayed, then per-pair shared shingles ranked
    // by ascending corpus DF (ties on the shingle text) — DF counted
    // over the SAME distinct (doc_id, shingle) relation the engine's
    // explodeShingles produces
    "q226_pair_evidence" ->
      s"""$oracleShingleCte,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT ida AS id_a, idb AS id_b FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
         dfreq AS (
           SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
         shared AS (
           SELECT p.id_a, p.id_b, a.shingle
           FROM prs p
           JOIN sh a ON a.doc_id = p.id_a
           JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle),
         ranked AS (
           SELECT id_a, id_b, shingle, df,
             CAST(row_number() OVER (PARTITION BY id_a, id_b
               ORDER BY df ASC, shingle ASC) AS INT) AS rank
           FROM shared JOIN dfreq USING (shingle))
         SELECT id_a, id_b, shingle, df, rank FROM ranked
         WHERE rank <= 3 ORDER BY id_a, id_b, rank""",
    // per-doc distinct-shingle membership against the benchmark leg's
    // shingle SET; null novelty for shingle-less docs
    "q228_novelty_screen" ->
      s"""$oracleShingleCte,
         refsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
         corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
         tot AS (SELECT doc_id, count(*) AS n_shingles FROM corp
                 GROUP BY doc_id),
         seen AS (
           SELECT doc_id, count(*) AS n_seen FROM corp
           JOIN refsh USING (shingle) GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(t.n_shingles, 0) AS n_shingles,
           coalesce(sn.n_seen, 0) AS n_seen,
           CASE WHEN t.n_shingles IS NULL THEN NULL
             ELSE round(1.0 - coalesce(sn.n_seen, 0)
               / CAST(t.n_shingles AS DOUBLE), 6) END AS novelty_frac
         FROM documents d
         LEFT JOIN tot t ON t.doc_id = d.doc_id
         LEFT JOIN seen sn ON sn.doc_id = d.doc_id
         WHERE d.doc_id % 10 <> 0
         ORDER BY d.doc_id""",
    // rank = global (key, id) row_number; the banded-bucket join
    // collapses to the plain rank-gap predicate; levenshtein is an
    // integer, identical in both engines
    "q234_sorted_neighborhood" ->
      """WITH r AS (
           SELECT p_partkey AS id, p_name AS key,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
           FROM part WHERE p_name IS NOT NULL)
         SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a,
           b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS INT) AS dist,
           b.rnk - a.rnk AS rank_gap
         FROM r a JOIN r b
           ON b.rnk > a.rnk AND b.rnk - a.rnk <= 5
         WHERE levenshtein(a.key, b.key) <= 2
         ORDER BY id_a, id_b""",
    // the engine's graft_damerau_levenshtein matches DuckDB's
    // damerau_levenshtein (both unrestricted Lowrance-Wagner)
    "q252_damerau_pairs" ->
      """WITH r AS (
           SELECT p_partkey AS id, p_name AS key,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
           FROM part WHERE p_name IS NOT NULL)
         SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a,
           b.key AS key_b,
           CAST(damerau_levenshtein(a.key, b.key) AS INT) AS dl,
           CAST(levenshtein(a.key, b.key) AS INT) AS lev,
           b.rnk - a.rnk AS rank_gap
         FROM r a JOIN r b
           ON b.rnk > a.rnk AND b.rnk - a.rnk <= 5
         WHERE damerau_levenshtein(a.key, b.key) <= 2
         ORDER BY id_a, id_b""",
    // the q23 exact pair join at 0.5, bucketed over the literal
    // threshold grid; the unrounded jaccard doubles are identical
    // rationals in both engines, so grid comparisons cannot flip
    "q251_dedup_sensitivity" ->
      s"""$oracleShingleCte,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pj AS (
           SELECT ida, idb,
             CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS j
           FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5),
         g AS (SELECT unnest(generate_series(50, 95, 5)) AS t_centi)
         SELECT CAST(g.t_centi AS INT) AS t_centi,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT idb) AS BIGINT) AS n_docs_flagged
         FROM pj JOIN g ON pj.j >= CAST(g.t_centi AS DOUBLE) / 100.0
         GROUP BY 1 ORDER BY 1""",
    // exact agreement counts over the q234 candidate pairs; m/u are
    // Laplace-smoothed single divisions and each weight one mirrored
    // ln — null-safe equality is IS NOT DISTINCT FROM
    "q248_fs_weights" -> {
      val fieldBlock = (f: String) => {
        val m = s"((CAST(am_$f AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))"
        val u = s"((CAST(au_$f AS DOUBLE) + 0.5) / (CAST(nu AS DOUBLE) + 1.0))"
        s"""SELECT '$f' AS field, nm AS n_match, nu AS n_nonmatch,
           round($m, 6) AS m, round($u, 6) AS u,
           round(ln($m / $u), 6) AS w_agree,
           round(ln((1.0 - $m) / (1.0 - $u)), 6) AS w_disagree
         FROM c"""
      }
      val fields = Seq("p_brand", "p_type", "p_size", "p_retailprice")
      val agg = fields.map(f =>
        s"""CAST(sum(CASE WHEN m AND (a_$f IS NOT DISTINCT FROM b_$f)
             THEN 1 ELSE 0 END) AS BIGINT) AS am_$f,
           CAST(sum(CASE WHEN NOT m AND (a_$f IS NOT DISTINCT FROM b_$f)
             THEN 1 ELSE 0 END) AS BIGINT) AS au_$f""").mkString(",\n           ")
      val sel = fields.map(f =>
        s"pa.$f AS a_$f, pb.$f AS b_$f").mkString(", ")
      s"""WITH r AS (
           SELECT p_partkey AS id, p_name AS key,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
           FROM part WHERE p_name IS NOT NULL),
         pr AS (
           SELECT a.id AS ida, b.id AS idb,
             levenshtein(a.key, b.key) <= 2 AS m
           FROM r a JOIN r b
             ON b.rnk > a.rnk AND b.rnk - a.rnk <= 5),
         j AS (
           SELECT pr.m, $sel
           FROM pr
           JOIN part pa ON pa.p_partkey = pr.ida
           JOIN part pb ON pb.p_partkey = pr.idb),
         c AS (
           SELECT
             CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS nm,
             CAST(sum(CASE WHEN NOT m THEN 1 ELSE 0 END) AS BIGINT)
               AS nu,
           $agg
           FROM j)
         ${fields.map(fieldBlock).mkString("\n         UNION ALL\n         ")}
         ORDER BY field"""
    },
    // the engine's graft_jaro_winkler reproduces DuckDB's own
    // jaro_winkler_similarity bit-for-bit (spec-pinned), so the
    // threshold filter and the rounded score both agree exactly
    "q247_jaro_winkler_pairs" ->
      """WITH r AS (
           SELECT p_partkey AS id, p_name AS key,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
           FROM part WHERE p_name IS NOT NULL)
         SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a,
           b.key AS key_b,
           round(jaro_winkler_similarity(a.key, b.key), 6) AS jw,
           b.rnk - a.rnk AS rank_gap
         FROM r a JOIN r b
           ON b.rnk > a.rnk AND b.rnk - a.rnk <= 5
         WHERE jaro_winkler_similarity(a.key, b.key) >= 0.94
         ORDER BY id_a, id_b""",
    // the same left-fold multiplication chains as the engine: products
    // of identical IEEE factors are grouping-independent, so both
    // engines produce bit-identical doubles without pow()
    "q229_lsh_plan" ->
      """WITH cfg(bands, rows_per_band) AS (
           VALUES (2, 8), (4, 4), (8, 2), (16, 1)),
         g AS (SELECT bands, rows_per_band,
             unnest(generate_series(50, 950, 50)) AS s_milli FROM cfg),
         p AS (
           SELECT bands, rows_per_band, s_milli,
             CAST(s_milli AS DOUBLE) / 1000.0 AS s,
             list_aggregate(list_transform(
               generate_series(1, rows_per_band),
               x -> CAST(s_milli AS DOUBLE) / 1000.0), 'product') AS sr
           FROM g),
         p2 AS (
           SELECT bands, rows_per_band, s_milli, s,
             round(1.0 - list_aggregate(list_transform(
               generate_series(1, bands), x -> 1.0 - sr), 'product'), 6)
               AS p_candidate
           FROM p)
         SELECT bands, rows_per_band, CAST(s_milli AS INT) AS s_milli,
           p_candidate,
           CAST(s < 0.8 AND p_candidate >= 0.5 AS INT)
             AS false_positive,
           CAST(s >= 0.8 AND p_candidate < 0.5 AS INT)
             AS false_negative
         FROM p2 ORDER BY bands, rows_per_band, s_milli""",
    "q24_minhash_lsh_pairs" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes,
         ${oracleJaccardSelect(
        "JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id",
        includeCommon = false)}""",
    // the q24 pair machinery rolled up to a source×source matrix;
    // mean jaccard is a nano-quantized order-free sum, max order-free
    // one pairs CTE (the q24/q267 chain) reused by all three report
    // legs: recursive CC histogram, source matrix (round-then-quantize
    // like q267), threshold curve on the unrounded j like q251
    "q273_dedup_monitor_suite" ->
      s"""WITH RECURSIVE $oracleShingleCtes,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         pr AS (
           SELECT ida, idb,
             CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS j
           FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         edges AS (SELECT ida AS a, idb AS b FROM pr
                   UNION SELECT idb, ida FROM pr),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         labels AS (
           SELECT a AS id, least(a, min(b)) AS comp
           FROM reach GROUP BY a),
         csizes AS (
           SELECT comp, count(*) AS cluster_size
           FROM labels GROUP BY comp),
         hist AS (
           SELECT 'cluster_histogram' AS report,
             CAST(cluster_size AS VARCHAR) AS key_a, '' AS key_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST((cluster_size - 1) * count(*) AS DOUBLE) AS metric
           FROM csizes GROUP BY cluster_size),
         lab AS (
           SELECT least(da.source, db.source) AS key_a,
             greatest(da.source, db.source) AS key_b,
             round(j, 4) AS j
           FROM pr
           JOIN documents da ON da.doc_id = ida
           JOIN documents db ON db.doc_id = idb),
         mat AS (
           SELECT 'source_matrix' AS report, key_a, key_b,
             CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(floor(j * 1000000.0) AS BIGINT))
                 AS DOUBLE)
               / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS metric
           FROM lab GROUP BY key_a, key_b),
         g AS (SELECT unnest(generate_series(80, 95, 5)) AS t),
         curve AS (
           SELECT 'threshold_curve' AS report,
             CAST(CAST(t AS INT) AS VARCHAR) AS key_a, '' AS key_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT idb) AS DOUBLE) AS metric
           FROM pr JOIN g ON pr.j >= CAST(t AS DOUBLE) / 100.0
           GROUP BY t)
         SELECT * FROM hist
         UNION ALL SELECT * FROM mat
         UNION ALL SELECT * FROM curve
         ORDER BY report, key_a, key_b""",
    "q267_source_dup_matrix" ->
      s"""$oracleShingleCte,
         $oracleMinhashCtes,
         common AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
           JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
           GROUP BY 1, 2),
         pr AS (
           SELECT ida, idb,
             round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 4)
               AS j
           FROM common
           JOIN sizes sa ON sa.doc_id = ida
           JOIN sizes sb ON sb.doc_id = idb
           WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common)
             >= 0.8),
         lab AS (
           SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b, j
           FROM pr
           JOIN documents da ON da.doc_id = ida
           JOIN documents db ON db.doc_id = idb)
         SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(floor(j * 1000000.0) AS BIGINT))
               AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS avg_jaccard,
           max(j) AS max_jaccard
         FROM lab GROUP BY 1, 2 ORDER BY source_a, source_b""",
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
    "q66_corpus_datasheet" ->
      s"""WITH ${oracleMetricsCtes("documents")}
         SELECT source, lang, count(*) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS sum_tokens,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM q GROUP BY source, lang ORDER BY source, lang""",
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
  )

  /** Whole-document + min-shingle-hash fingerprints. */
  private[graft] def docFingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.minShingleHash(col("text"), 4).as("sketch"))
      .orderBy("doc_id")

  /** Exact dedup accounting over normalized-text fingerprints. */
  private[graft] def exactDupStats(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDupStats(docs(s, dir), "text")

  /** Exact n-gram Jaccard near-dup pairs (inverted-index join).
    * maxShingleDf=10 drops stop-shingles from CANDIDATE generation —
    * at sf0.1 that is 10k of 27k shingles and 2.8× of the Σ(df²) join
    * cost, growing quadratically with corpus scale — while the exact
    * verify over full shingle sets keeps the emitted pairs and values
    * byte-identical to the uncapped run (spec-checked; the oracle is
    * the plain uncapped SQL).
    */
  private[graft] def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(10))
      .select(col("id_a"), col("id_b"), col("common"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** Shared-shingle evidence for the q23 verified near-dup pairs
    * ([[Dedup.pairShingleEvidence]]): for each Jaccard-≥0.8 pair, the
    * 3 RAREST shared 3-shingles by corpus document frequency — the
    * reviewable "why did these two match" table a dedup decision needs
    * before deleting data. The pair frame is persisted because the
    * evidence operator reads it three times (two semi-join prunes +
    * the evidence join), exactly the contract its scaladoc states.
    */
  private[graft] def pairEvidenceQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = Some(10))
      .select("id_a", "id_b")
      .transform(graft.core.CacheScope.disk)
    Dedup.pairShingleEvidence(d, "doc_id", "text", pairs,
        n = 3, topK = 3)
      .orderBy("id_a", "id_b", "rank")
  }

  /** Per-document novelty vs the benchmark split
    * ([[Dedup.noveltyScreen]]): for every non-benchmark document, the
    * fraction of its distinct 3-shingles NOT already present anywhere
    * in the benchmark leg (doc_id % 10 = 0, the q103 split) — the
    * per-doc memorization/freshness aggregate next to q64's pairwise
    * contamination cells.
    */
  private[graft] def noveltyScreenQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.noveltyScreen(
        d.where(col("doc_id") % 10 =!= 0), "doc_id", "text",
        d.where(col("doc_id") % 10 === 0), "text", n = 3)
      .orderBy("doc_id")
  }

  /** Sorted-neighborhood blocking over part names
    * ([[Dedup.sortedNeighborhoodPairs]]): each part compared to its 5
    * successors in (p_name, p_partkey) sort order, verified at
    * levenshtein ≤ 2 — the third candidate-generation family next to
    * q23's inverted index and q126's SymSpell deletion blocks, on the
    * same fuzzy-name data.
    */
  private[graft] def sortedNeighborhoodQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(t(s, dir, "part"), "p_partkey",
        "p_name", window = 5, maxDist = 2)
      .orderBy("id_a", "id_b")

  /** q234's blocking with the Jaro–Winkler verify
    * ([[Dedup.sortedNeighborhoodPairsJw]], the codegen'd
    * [[graft.expressions.JaroWinkler]]): prefix-boosted name
    * agreement ≥ 0.94 instead of edit distance ≤ 2 — catches the
    * long-name variants levenshtein's absolute bound rejects, and
    * the DuckDB oracle scores with ITS OWN jaro_winkler_similarity
    * (the expression is bit-compatible by construction, spec-pinned
    * against 3,600 real pairs).
    */
  private[graft] def jaroWinklerPairsQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairsJw(t(s, dir, "part"), "p_partkey",
        "p_name", window = 5, minSim = 0.94)
      .orderBy("id_a", "id_b")

  /** q234's blocking with the unrestricted Damerau–Levenshtein
    * verify ([[Dedup.sortedNeighborhoodPairsDl]]) at the same bound
    * — transposition-tolerant matching: every q234 pair survives
    * (dl ≤ lev) and swapped-word variants levenshtein priced out at
    * 2 now pass at 1; the emitted (dl, lev) pair shows the delta.
    * The oracle verifies with DuckDB's own `damerau_levenshtein`
    * (both are the unrestricted Lowrance–Wagner form — spec-pinned
    * on the dl("ca","abc") = 2 disagreement case OSA gets wrong).
    */
  private[graft] def damerauPairsQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairsDl(t(s, dir, "part"), "p_partkey",
        "p_name", window = 5, maxDist = 2)
      .orderBy("id_a", "id_b")

  /** Dedup threshold-sensitivity curve: the q23 exact-Jaccard pair
    * machinery run once at 0.5, then bucketed over a 0.50–0.95
    * threshold grid — pairs surviving each threshold and the
    * keep-lowest-id removal proxy (distinct higher ids). The
    * knob-tuning table read BEFORE committing a 100 TB dedup pass to
    * one threshold: where the pair count collapses is where the
    * corpus's duplication structure actually lives. (The removal
    * count is the standard pre-transitivity PROXY — exact removal
    * needs the q83 connected-components census per threshold.)
    */
  private[graft] def dedupSensitivityQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDf = Some(10))
      .select(col("id_b"), col("jaccard"),
        explode(sequence(lit(50), lit(95), lit(5))).as("t_centi"))
      .where(col("jaccard") >= col("t_centi").cast("double") / 100.0)
      .groupBy("t_centi")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id_b")).as("n_docs_flagged"))
      .orderBy("t_centi")

  /** Fellegi–Sunter weight calibration
    * ([[Dedup.fellegiSunterWeights]]) on the q234 blocking: every
    * sorted-neighborhood candidate pair labeled by the levenshtein-≤2
    * verify, then per-field m/u probabilities and log-likelihood
    * weights for brand/type/size/retailprice — the audit that says
    * which fields actually separate matches from neighbors-by-sort
    * accident.
    */
  private[graft] def fsWeightsQ(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val pairs = Dedup.sortedNeighborhoodPairs(part, "p_partkey",
        "p_name", window = 5, maxDist = 1000)
      .select(col("id_a"), col("id_b"),
        (col("dist") <= 2).cast("int").as("is_match"))
    Dedup.fellegiSunterWeights(pairs, "id_a", "id_b", "is_match",
        part, "p_partkey",
        Seq("p_brand", "p_type", "p_size", "p_retailprice"))
      .orderBy("field")
  }

  /** LSH parameter planner ([[Dedup.lshPlan]]): the candidate-
    * probability S-curves of the four 16-hash (bands × rows) splits
    * against the q23/q24 Jaccard-0.8 near-dup threshold — the table
    * that says (2,8) is precision-leaning and (16,1) recall-leaning
    * BEFORE any banding run. Pure closed-form lattice; multiplication
    * folds instead of `pow`, so the oracle reproduces every double
    * bit-for-bit.
    */
  private[graft] def lshPlanQ(s: SparkSession, dir: String): DataFrame =
    Dedup.lshPlan(s, Seq((2, 8), (4, 4), (8, 2), (16, 1)),
        threshold = 0.8, gridStepMilli = 50)
      .orderBy("bands", "rows_per_band", "s_milli")

  /** Exact n-gram CONTAINMENT pairs ([[Dedup.ngramContainmentPairs]]):
    * |A∩B| / min(|A|, |B|) ≥ 0.6 over the q23 inverted index — the
    * asymmetric near-dup measure that catches a short document
    * embedded in a long one (quotes, boilerplate, wrapped re-posts)
    * where the long side's union dilutes Jaccard. Same
    * result-invariant stop-shingle cap.
    */
  private[graft] def ngramContainmentPairs(
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
  private[graft] def minhashJaccardEst(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text",
        n = 3, numHashes = 16)
      .transform(graft.core.CacheScope.disk)
    val cands = Dedup.lshCandidates(sigs, "doc_id",
      bands = 4, rowsPerBand = 4)
    Dedup.minhashJaccardEstimate(cands, sigs, "doc_id", numHashes = 16)
      .orderBy("id_a", "id_b")
  }

  /** Capture–recapture coverage audit of the near-dup detectors: the
    * q24 MinHash-LSH verified pairs and the q26 SimHash hamming-≤3
    * pairs are two imperfect "captures" of the same underlying
    * duplicate-pair population, so their overlap prices what NEITHER
    * caught — Chapman's estimator N̂ = ⌊(n₁+1)(n₂+1)/(m+1)⌋ − 1 and
    * the implied per-detector recall n_i/N̂. The honest caveat is in
    * the independence assumption: both detectors key on lexical
    * overlap, so positively-correlated misses bias N̂ LOW — the
    * number reads as "at least this many pairs exist", which is
    * exactly the direction a dedup-QA gate needs. All counts exact;
    * Chapman is one integral division; recalls one double division
    * each. Both pair generators are the banded/blocked machinery —
    * nothing here is all-pairs.
    */
  private[graft] def dedupCaptureRecaptureQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val mh = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select("id_a", "id_b")
      .transform(graft.core.CacheScope.disk)
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b")
      .transform(graft.core.CacheScope.disk)
    captureRecapture(mh, sp)
  }

  /** The Chapman capture–recapture tail over two detector pair
    * frames — shared by q280 (frames from the full LSH rebuild) and
    * q366 (the MinHash frame read from the standing pair store).
    */
  private def captureRecapture(
      mh: DataFrame, sp: DataFrame): DataFrame = {
    val nhat = expr("(CAST(n_minhash + 1 AS DECIMAL(38,0)) * " +
      "(n_simhash + 1)) div (n_overlap + 1) - 1").cast("long")
    mh.agg(count(lit(1)).as("n_minhash"))
      .crossJoin(sp.agg(count(lit(1)).as("n_simhash")))
      .crossJoin(mh.join(sp, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_overlap")))
      .select(col("n_minhash"), col("n_simhash"), col("n_overlap"),
        nhat.as("chapman_total"),
        round(col("n_minhash").cast("double") /
          nullif(nhat.cast("double"), lit(0.0)), 6)
          .as("recall_minhash"),
        round(col("n_simhash").cast("double") /
          nullif(nhat.cast("double"), lit(0.0)), 6)
          .as("recall_simhash"))
  }

  /** The q280 capture–recapture audit read from the STANDING PAIR
    * STORE ([[graft.dedup.Dedup.PairStore]], VERDICT r16 task 3):
    * the corpus arrives as three sequential ingest batches
    * (doc_id mod 3), each [[graft.dedup.Dedup.pairStoreDelta]]
    * deriving only the pairs its batch completes against the
    * standing signature/shingle tables, and the audit's MinHash side
    * reads the merged store's pair table — never re-running the LSH
    * chain. The oracle is q280's full-rebuild SQL VERBATIM: the
    * store path must reproduce the rebuild's numbers exactly (the
    * append == rebuild identity, spec-pinned at every batch
    * boundary). This is what makes the q363 audit suite a standing
    * monitor at 100 TB — per-ingest delta cost, store-read audits.
    */
  private[graft] def pairStoreAuditQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val store = (0 to 2).foldLeft(
        Dedup.emptyPairStore(s, "doc_id", numHashes = 16)) {
      (st, k) =>
        Dedup.mergePairStore(st, Dedup.pairStoreDelta(st,
          d.where(col("doc_id") % 3 === k), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.8))
    }
    val mh = store.pairs.select("id_a", "id_b")
      .transform(graft.core.CacheScope.disk)
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b")
      .transform(graft.core.CacheScope.disk)
    captureRecapture(mh, sp)
  }

  /** The q280 audit's actionable drill-down: the pair-level REVIEW
    * QUEUE of detector disagreements — near-dup pairs the MinHash
    * verify caught but SimHash missed (reordered/paraphrase-shaped
    * duplication SimHash's bag-of-words sums blur) and vice versa
    * (token-swap variants whose Jaccard dips under 0.8 while the
    * weighted bit profile barely moves), next to the agreed pairs,
    * each with whatever evidence its detector(s) produced. This is
    * the table a threshold-tuning decision reads; q280 prices its
    * size. Same banded/blocked generators; anti/inner joins on the
    * pair key are pair-domain-sized.
    */
  private[graft] def detectorDisagreementQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val keys = Seq("id_a", "id_b")
    val mh = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
      .transform(graft.core.CacheScope.disk)
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("int").as("hamming"))
      .transform(graft.core.CacheScope.disk)
    val both = mh.join(sp, keys)
      .select(lit("both").as("verdict"), col("id_a"), col("id_b"),
        col("jaccard"), col("hamming"))
    val mhOnly = mh.join(sp, keys, "left_anti")
      .select(lit("minhash_only").as("verdict"), col("id_a"),
        col("id_b"), col("jaccard"),
        lit(null).cast("int").as("hamming"))
    val spOnly = sp.join(mh, keys, "left_anti")
      .select(lit("simhash_only").as("verdict"), col("id_a"),
        col("id_b"), lit(null).cast("double").as("jaccard"),
        col("hamming"))
    both.unionByName(mhOnly).unionByName(spOnly)
      .orderBy("verdict", "id_a", "id_b")
  }

  /** McNemar's test ([[Analytics.mcnemar]]) over the q280 detector
    * pair: do MinHash-LSH and SimHash fire at DIFFERENT marginal rates
    * on the candidate-pair union? q282 lists the disagreements and
    * q280 estimates the un-caught population; this is the inferential
    * verdict on whether the two detectors' coverage differs at all —
    * the report read before retiring one of a redundant detector
    * pair. Only the discordant counts carry signal; both χ² variants
    * are exact-integer numerators over one double division.
    */
  private[graft] def mcnemarDetectorsQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val keys = Seq("id_a", "id_b")
    val mh = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"), lit(true).as("by_minhash"))
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"), lit(true).as("by_simhash"))
    val flags = mh.join(sp, keys, "full_outer")
      .select(coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
        coalesce(col("by_simhash"), lit(false)).as("by_simhash"))
    graft.operators.Analytics.mcnemar(flags, Seq.empty,
        "by_minhash", "by_simhash")
      .withColumnRenamed("n_a_only", "n_minhash_only")
      .withColumnRenamed("n_b_only", "n_simhash_only")
  }

  /** Cochran's Q over THREE detectors ([[Analytics.cochranQ]]):
    * q284's McNemar verdict generalized to the full detector bench —
    * MinHash-LSH (exact verify ≥ 0.8), SimHash (hamming ≤ 3), and
    * the 1-bit-compressed MinHash (est ≥ 0.5 on the same banded
    * candidates) — do ANY of the three fire at different marginal
    * rates on the candidate-pair union? The omnibus read before the
    * pairwise McNemars; every Q term an exact integer into one
    * division, dof-2 pinned critical.
    */
  private[graft] def cochranQDetectorsQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val keys = Seq("id_a", "id_b")
    val mh = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"), lit(true).as("by_minhash"))
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"), lit(true).as("by_simhash"))
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text",
        n = 3, numHashes = 16)
      .transform(graft.core.CacheScope.disk)
    val bb = Dedup.bbitMinhashEstimate(
        Dedup.lshCandidates(sigs, "doc_id", bands = 4,
          rowsPerBand = 4),
        sigs, "doc_id", numHashes = 16, b = 1)
      .where(col("est_b1") >= 0.5)
      .select(col("id_a"), col("id_b"), lit(true).as("by_bbit"))
    val flags = mh.join(sp, keys, "full_outer")
      .join(bb, keys, "full_outer")
      .select(
        coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
        coalesce(col("by_simhash"), lit(false)).as("by_simhash"),
        coalesce(col("by_bbit"), lit(false)).as("by_bbit"))
    graft.operators.Analytics.cochranQ(flags, Seq.empty,
      Seq("by_minhash", "by_simhash", "by_bbit"))
  }

  /** Fleiss' κ ([[graft.operators.Analytics.fleissKappa]]) over the
    * q303 three-detector union frame — the AGREEMENT companion of
    * q303's rate test: Cochran's Q on these detectors asks whether
    * MinHash/SimHash/b-bit fire at the same rate; κ asks whether they
    * fire on the SAME pairs. The subject frame is the flagged union
    * (the review queue q282 drains), so κ reads agreement among
    * pairs someone flagged — the all-quiet pairs that would inflate
    * it are excluded by construction (see the operator's domain
    * note). Same one-signature-pass chain as q303.
    */
  private[graft] def fleissKappaDetectorsQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val keys = Seq("id_a", "id_b")
    val mh = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"), lit(true).as("by_minhash"))
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"), lit(true).as("by_simhash"))
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text",
        n = 3, numHashes = 16)
      .transform(graft.core.CacheScope.disk)
    val bb = Dedup.bbitMinhashEstimate(
        Dedup.lshCandidates(sigs, "doc_id", bands = 4,
          rowsPerBand = 4),
        sigs, "doc_id", numHashes = 16, b = 1)
      .where(col("est_b1") >= 0.5)
      .select(col("id_a"), col("id_b"), lit(true).as("by_bbit"))
    val flags = mh.join(sp, keys, "full_outer")
      .join(bb, keys, "full_outer")
      .select(
        coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
        coalesce(col("by_simhash"), lit(false)).as("by_simhash"),
        coalesce(col("by_bbit"), lit(false)).as("by_bbit"))
    graft.operators.Analytics.fleissKappa(flags, Seq.empty,
      Seq("by_minhash", "by_simhash", "by_bbit"))
  }

  /** b-bit MinHash compression audit ([[Dedup.bbitMinhashEstimate]]):
    * the q120 estimate and its 1-bit-register sibling side by side
    * over the q24 LSH candidates — what Jaccard resolution survives
    * compressing the standing sketch table 64× (two bytes per
    * 16-hash signature). One signature pass feeds banding and both
    * estimators; all scoring is signature-only (shingle sets never
    * touched).
    */
  private[graft] def bbitMinhashEst(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text",
        n = 3, numHashes = 16)
      .transform(graft.core.CacheScope.disk)
    val cands = Dedup.lshCandidates(sigs, "doc_id",
        bands = 4, rowsPerBand = 4)
      .transform(graft.core.CacheScope.disk)
    Dedup.minhashJaccardEstimate(cands, sigs, "doc_id", numHashes = 16)
      .join(Dedup.bbitMinhashEstimate(cands, sigs, "doc_id",
        numHashes = 16, b = 1), Seq("id_a", "id_b"))
      .orderBy("id_a", "id_b")
  }

  /** TF-weighted 64-bit SimHash fingerprints. */
  private[graft] def simhashFingerprints(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text")
      .select("doc_id", "simhash_hex")
      .orderBy("doc_id")

  /** SimHash near-dup pairs, hamming ≤ 3, via exact 4-block banding. */
  private[graft] def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int")
        .as("hamming"))
      .orderBy("id_a", "id_b")

  /** q64's decontamination with the benchmark-side document-frequency
    * cap ENGAGED (`maxBenchmarkDf = 1`): 3-gram shingles present in
    * more than one eval document are boilerplate identifying no
    * specific benchmark doc — and at corpus scale each one multiplies
    * join fan-out (df_corpus × df_benchmark rows). The cap of 1
    * demonstrably changes this data's answer (drops pairs reached
    * only via shared-boilerplate shingles), so the oracle verifies
    * the cap's exact semantics, not just the uncapped join.
    */
  private[graft] def contaminationCapped(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contaminationCheck(
        d.where(col("doc_id") % 10 =!= 0),
        d.where(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, minCommon = 3,
        maxBenchmarkDf = Some(1))
      .orderBy("corpus_id", "benchmark_id")
  }

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
  private[graft] def dedupTokenBudget(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def mergeableDatasheetQ(
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

  /** LSH candidate-coverage audit ([[Similarity.recallAudit]] in pair
    * mode): q24's banded candidate generation audited against q23's
    * exact-Jaccard ≥ 0.8 pairs, per id_a — the s-curve tuning measure
    * for (numHashes, bands): a slipping audit means more hashes or
    * wider bands. Candidate-side false positives are verify-stage
    * cost, not a miss — the audit measures what banding LOSES.
    */
  private[graft] def lshRecallAuditQ(s: SparkSession, dir: String): DataFrame = {
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

  /** Incremental near-dup detection ([[Dedup.buildLshIndex]] +
    * [[Dedup.nearDupMatches]]): every third document plays the
    * incoming batch; the rest are the standing corpus whose LSH index
    * is built once. Batch rows probe the index and candidates verify
    * by exact Jaccard — the asymmetric daily-ingest shape that never
    * re-pairs the corpus with itself. Same q24 band parameters.
    */
  private[graft] def nearDupIncremental(
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
  private[graft] def containmentIncremental(
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
  private[graft] def contentChunks(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def chunkIncrementalDedup(
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

  /** Exact shared-span detection ([[Dedup.sharedSpans]]): document
    * pairs whose longest verbatim common token substring reaches 8
    * tokens (5-gram seeds, boilerplate 5-grams df-capped at 10) — the
    * "exact substring dedup" pass published training pipelines run
    * beside whole-document near-dup removal.
    */
  private[graft] def sharedSpanPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.sharedSpans(docs(s, dir), "doc_id", "text",
        k = 5, minSpanTokens = 8, maxShingleDf = 10)
      .orderBy("id_a", "id_b")

  /** Corpus datasheet: the per-(source, lang) mix report every
    * training run documents — volume, token mass, mean quality.
    * First-class use of the documents table's provenance columns.
    */
  private[graft] def corpusDatasheet(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("sum_tokens"),
        round(avg(TextAnalysis.qualityScore(col("text"))), 4)
          .as("avg_quality"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "lang")

  /** Sub-document duplicate-window signal: fraction of each document's
    * non-overlapping 8-token spans that also occur verbatim in another
    * document ([[Dedup.duplicateChunkFraction]]) — the span-granular
    * boilerplate detector whole-document dedup cannot see.
    */
  private[graft] def dupChunkFraction(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateChunkFraction(docs(s, dir), "doc_id", "text",
        window = 8)
      .orderBy("doc_id")

  /** Incremental-ingest dedup: a simulated new batch (80% of docs)
    * deduped against the standing corpus (20%) — the daily-append
    * workflow; the corpus side reduces to distinct fingerprints before
    * the anti-join.
    */
  private[graft] def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def bloomIncrementalDedup(
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

  /** Cross-source near-duplication matrix: the q24 verified MinHash
    * pairs labeled by each side's `source` and rolled up to a
    * source×source table — WHICH sources copy WHICH (mirror sites,
    * syndication, scraped re-posts) before anyone deletes a terabyte
    * by source-level policy. Pair labels canonicalize
    * (least, greatest) so the matrix is upper-triangular including
    * the diagonal (within-source redundancy). Mean jaccard is a
    * nano-quantized order-free sum; max is order-free by nature.
    * Scale shape: the pair frame (already banded/verified, never
    * corpus²) joins the doc→source projection twice by id.
    */
  private[graft] def sourceDupMatrixQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, threshold = 0.8)
    val src = d.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"),
        col("source").as("__sa")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"),
        col("source").as("__sb")), Seq("id_b"))
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"),
        round(col("jaccard"), 4).as("__j"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(floor(col("__j") * 1000000.0).cast("long")).as("__jn"),
        max(col("__j")).as("max_jaccard"))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        round(col("__jn").cast("double") /
          col("n_pairs").cast("double") / 1000000.0, 6)
          .as("avg_jaccard"),
        col("max_jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Standing near-dup monitor suite — the production composition of
    * the dedup shelf's three standing reports (VERDICT r15 task 1):
    * the q24 MinHash-LSH band→verify pass runs ONCE into a persisted
    * verified-pairs frame, and the cluster-size histogram (q83 shape),
    * source×source duplication matrix (q152/q267 shape) and
    * threshold-sensitivity curve (q251 shape, over the verified
    * 0.80–0.95 band) all fan out from that one frame in one lazy
    * plan — at 100 TB nobody runs the LSH chain once per report.
    * Output is the unified monitor schema (report, key_a, key_b, n,
    * metric); a plan spec pins the single banding pass structurally.
    * Scale: identical to q24 (the only pairwise generator is the
    * banded self-join); the three report legs are candidate-sized.
    */
  private[graft] def dedupMonitorSuiteQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .transform(graft.core.CacheScope.disk)
    // leg 1: verified-cluster size histogram (q83 shape); the CC
    // iteration materializes `pairs`, so the later legs hit cache
    val labels = graft.dedup.ConnectedComponents
      .componentsAuto(pairs, "id_a", "id_b")._1
    val hist = labels.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("__n"))
      .select(lit("cluster_histogram").as("report"),
        col("cluster_size").cast("string").as("key_a"),
        lit("").as("key_b"),
        col("__n").cast("long").as("n"),
        ((col("cluster_size") - 1) * col("__n"))
          .cast("double").as("metric"))
    // leg 2: source×source matrix (q267 shape; nano-quantized mean)
    val src = d.select(col("doc_id"), col("source"))
    val matrix = pairs
      .join(src.select(col("doc_id").as("id_a"),
        col("source").as("__sa")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"),
        col("source").as("__sb")), Seq("id_b"))
      .select(least(col("__sa"), col("__sb")).as("key_a"),
        greatest(col("__sa"), col("__sb")).as("key_b"),
        round(col("jaccard"), 4).as("__j"))
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("__np"),
        sum(floor(col("__j") * 1000000.0).cast("long")).as("__jn"))
      .select(lit("source_matrix").as("report"),
        col("key_a"), col("key_b"),
        col("__np").cast("long").as("n"),
        round(col("__jn").cast("double") /
          col("__np").cast("double") / 1000000.0, 6).as("metric"))
    // leg 3: threshold-sensitivity curve across the verified band
    // (q251 shape, on the UNROUNDED jaccard like the verify filter)
    val curve = pairs
      .select(col("id_b"), col("jaccard"),
        explode(sequence(lit(80), lit(95), lit(5))).as("__t"))
      .where(col("jaccard") >= col("__t").cast("double") / 100.0)
      .groupBy("__t")
      .agg(count(lit(1)).as("__np"),
        countDistinct(col("id_b")).as("__f"))
      .select(lit("threshold_curve").as("report"),
        col("__t").cast("string").as("key_a"), lit("").as("key_b"),
        col("__np").cast("long").as("n"),
        col("__f").cast("double").as("metric"))
    hist.unionByName(matrix).unionByName(curve)
      .orderBy("report", "key_a", "key_b")
  }

  /** Composed detector-audit suite (VERDICT r16 task 1): the five
    * standing detector audits — capture–recapture (q280), the
    * disagreement review queue (q282), McNemar (q284), Cochran's Q
    * (q303) and Fleiss' κ (q311) — emitted from ONE pass over the
    * shared detector frames instead of five re-runs of the same two
    * chains. [[graft.dedup.Dedup.lshDetectorFrames]] runs the
    * shingle scan / signature build / banding ONCE (persisted);
    * SimHash runs its one token pass; the b-bit estimate reads the
    * same signatures+candidates; and a single cached three-flag
    * pair-union frame (with each detector's evidence) feeds every
    * audit leg. Output is the unified melted monitor schema
    * `(report, key_a, key_b, n, metric)` — scalar verdicts as
    * stat-per-row, the queue leg at pair level with hamming in `n`
    * and jaccard in `metric`. Each leg's numbers equal its
    * standalone query's (spec-pinned); a plan spec pins ONE shingle
    * scan and ONE signature build structurally. Scale: identical to
    * q24 + q26 (the only pairwise generators are the banded
    * self-joins); every audit leg is pair-domain-sized reads of the
    * one cached flags frame.
    */
  private[graft] def detectorAuditSuiteQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val keys = Seq("id_a", "id_b")
    val fr = Dedup.lshDetectorFrames(d, "doc_id", "text",
      n = 3, numHashes = 16, bands = 4, threshold = 0.8)
    val mh = fr.verified
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 4).as("__j"),
        lit(true).as("by_minhash"))
    val sp = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("int").as("__h"),
        lit(true).as("by_simhash"))
    val bb = Dedup.bbitMinhashEstimate(fr.candidates, fr.signatures,
        "doc_id", numHashes = 16, b = 1)
      .where(col("est_b1") >= 0.5)
      .select(col("id_a"), col("id_b"), lit(true).as("by_bbit"))
    val flags = mh.join(sp, keys, "full_outer")
      .join(bb, keys, "full_outer")
      .select(col("id_a"), col("id_b"), col("__j"), col("__h"),
        coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
        coalesce(col("by_simhash"), lit(false)).as("by_simhash"),
        coalesce(col("by_bbit"), lit(false)).as("by_bbit"))
      .transform(graft.core.CacheScope.disk)
    // melt a 1-row verdict frame into stat-per-row form: longs into
    // `n`, doubles into `metric` — ONE pass per family, the explode
    // fans the single row out without re-running its aggregate
    def melt(one: DataFrame, report: String,
        longs: Seq[String], dbls: Seq[String]): DataFrame = {
      val entries =
        longs.map(c => struct(lit(c).as("key_a"),
          col(c).cast("long").as("n"),
          lit(null).cast("double").as("metric"))) ++
        dbls.map(c => struct(lit(c).as("key_a"),
          lit(null).cast("long").as("n"),
          col(c).cast("double").as("metric")))
      one.select(explode(array(entries: _*)).as("e"))
        .select(lit(report).as("report"), col("e.key_a").as("key_a"),
          lit("").as("key_b"), col("e.n").as("n"),
          col("e.metric").as("metric"))
    }
    // leg 1: capture–recapture (q280 numbers; Chapman integral)
    val nhat = expr("(CAST(n_minhash + 1 AS DECIMAL(38,0)) * " +
      "(n_simhash + 1)) div (n_overlap + 1) - 1").cast("long")
    val cap = flags.agg(
        sum(col("by_minhash").cast("long")).as("n_minhash"),
        sum(col("by_simhash").cast("long")).as("n_simhash"),
        sum((col("by_minhash") && col("by_simhash")).cast("long"))
          .as("n_overlap"))
      .select(col("n_minhash"), col("n_simhash"), col("n_overlap"),
        nhat.as("chapman_total"),
        round(col("n_minhash").cast("double") /
          nullif(nhat.cast("double"), lit(0.0)), 6)
          .as("recall_minhash"),
        round(col("n_simhash").cast("double") /
          nullif(nhat.cast("double"), lit(0.0)), 6)
          .as("recall_simhash"))
    val capLeg = melt(cap, "capture_recapture",
      Seq("n_minhash", "n_simhash", "n_overlap", "chapman_total"),
      Seq("recall_minhash", "recall_simhash"))
    // leg 2: the pair-level disagreement queue (q282 rows): verdict
    // in key_a, the pair key in key_b, hamming in n, jaccard in
    // metric — evidence null exactly where its detector didn't fire
    val queueLeg = flags
      .where(col("by_minhash") || col("by_simhash"))
      .select(lit("queue").as("report"),
        when(col("by_minhash") && col("by_simhash"), lit("both"))
          .when(col("by_minhash"), lit("minhash_only"))
          .otherwise(lit("simhash_only")).as("key_a"),
        concat(col("id_a").cast("string"), lit(":"),
          col("id_b").cast("string")).as("key_b"),
        col("__h").cast("long").as("n"),
        col("__j").cast("double").as("metric"))
    // legs 3–5: the inferential verdicts, each the OPERATOR run on
    // the restricted cached flags frame — formulas stay owned by
    // graft.operators.Analytics, domains match the standalone queries
    val mcLeg = melt(
      graft.operators.Analytics.mcnemar(
        flags.where(col("by_minhash") || col("by_simhash")),
        Seq.empty, "by_minhash", "by_simhash")
        .withColumnRenamed("n_a_only", "n_minhash_only")
        .withColumnRenamed("n_b_only", "n_simhash_only"),
      "mcnemar",
      Seq("n_both", "n_minhash_only", "n_simhash_only", "differs"),
      Seq("chi2", "chi2_cc"))
    val cqLeg = melt(
      graft.operators.Analytics.cochranQ(flags, Seq.empty,
        Seq("by_minhash", "by_simhash", "by_bbit")),
      "cochran_q",
      Seq("n_items", "g_by_minhash", "g_by_simhash", "g_by_bbit",
        "dof", "differs"),
      Seq("q"))
    val fkLeg = melt(
      graft.operators.Analytics.fleissKappa(flags, Seq.empty,
        Seq("by_minhash", "by_simhash", "by_bbit")),
      "fleiss_kappa",
      Seq("n_items", "n_raters", "substantial"),
      Seq("p_flag", "p_bar", "p_e", "kappa"))
    capLeg.unionByName(queueLeg).unionByName(mcLeg)
      .unionByName(cqLeg).unionByName(fkLeg)
      .orderBy("report", "key_a", "key_b")
  }

  /** Dedup audit: size histogram of the verified near-dup clusters
    * (MinHash-LSH candidates → exact-Jaccard verify → connected
    * components). `removable` is the doc count near-dup removal would
    * drop — the "how much redundancy is in this corpus" report run
    * before committing to a dedup pass.
    */
  private[graft] def nearDupClusterHistogram(
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

  /** Capstone: composed training-corpus preparation — exact dedup →
    * MinHash-LSH near-dup removal → quality floor → language tagging —
    * summarized per predicted language.
    */
  private[graft] def corpusPrep(s: SparkSession, dir: String): DataFrame =
    graft.dedup.CorpusPipeline
      .prepareTrainingCorpus(docs(s, dir), "doc_id", "text",
        minQuality = 0.3)
      .groupBy("predicted")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("predicted")

  /** Entity resolution ([[Analytics.resolveEntities]]): part records
    * linked through SymSpell-blocked edit-distance ≤ 2 name matches,
    * clustered transitively (connected components over names), each
    * record stamped with its cluster's canonical name and minimum
    * part key — the record-linkage/master-data operator composed from
    * the fuzzy-join and CC machinery.
    */
  private[graft] def entityResolution(s: SparkSession, dir: String): DataFrame =
    Analytics.resolveEntities(t(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 2)
      .orderBy("p_partkey")

  /** Quality-survivorship near-dup dedup ([[Dedup.dedupNearKeepBest]]):
    * the q24 LSH clusters, but each cluster keeps its HIGHEST-quality
    * member (min doc_id on ties) instead of the minimum id — among
    * re-posts, keep the cleanest capture. Output: survivors with
    * cluster size and quality.
    */
  private[graft] def keepBestNearDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
    Dedup.dedupNearKeepBest(d, "doc_id", "text", "__q",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("doc_id"), col("cluster_size"),
        round(col("__q"), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Intra-document duplicate-line removal ([[TextAnalysis.dedupLines]])
    * over deterministically derived 4-token lines (the corpus is
    * single-line word soup, so lines are built, not parsed — the
    * 40-ish word vocabulary makes short lines genuinely repeat).
    * Zero-token docs are excluded on both sides ("" splits to one
    * empty line but derives zero lines).
    */
  private[graft] def lineDedupDocs(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def globalLineDedupDocs(s: SparkSession, dir: String): DataFrame = {
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

  /** Cross-source near-duplication matrix
    * ([[Dedup.crossSourceDupMatrix]]): which corpus sources re-crawl
    * which, measured on the q24 MinHash-LSH verified pairs — the
    * provenance audit run before assigning mixture weights (a source
    * that is 40 % near-duplicated in another double-counts that
    * content at whatever weight it gets).
    */
  private[graft] def crossSourceDupMatrixQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceDupMatrix(docs(s, dir), "doc_id", "text", "source")
      .orderBy("src_a", "src_b")

  /** Train/test split leakage audit: the q152 dup matrix with the
    * md5 hash split (90/10) as the "source" — near-dup pairs CROSSING
    * the split boundary are exactly the eval rows a model has
    * effectively seen in training; run before any benchmark number
    * ships. Composes [[graft.sampling.Sampling.hashSplit]] with
    * [[Dedup.crossSourceDupMatrix]] — the split is a pure projection,
    * so the audit costs one LSH chain, same as q152.
    */
  private[graft] def splitLeakageQ(
      s: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceDupMatrix(
        graft.sampling.Sampling.hashSplit(docs(s, dir), "doc_id",
          Seq("train" -> 0.9, "test" -> 0.1), salt = "q218"),
        "doc_id", "text", "split")
      .orderBy("src_a", "src_b")

  /** Cluster-merge survivorship ([[Dedup.mergeSurvivorship]]): q128's
    * near-dup clusters, but each collapses to ONE consolidated record
    * carrying the union of the cluster's provenance (sources, langs)
    * and its total token mass next to the kept member — dedup that
    * doesn't lose where content was seen.
    */
  private[graft] def mergeSurvivorshipQ(
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

  /** Incremental component maintenance
    * ([[graft.dedup.ConnectedComponents.incremental]]) proven against
    * a full batch recompute: the per-customer order chain (consecutive
    * orders linked in date order — long-diameter components, the shape
    * that stresses path halving) is split into alternating edge
    * batches; the EVEN half is labeled batch-style, the ODD half folds
    * in incrementally, and the result must equal the all-edges
    * labeling. The oracle needs no recursion: a chain component's min
    * label is just the customer's minimum order key — the fixture
    * gives the exact closed form the operator must reproduce. Only
    * customers with ≥ 2 orders appear (isolated nodes are absent per
    * the CC contract).
    */
  private[graft] def incrementalCcQ(
      s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val chain = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col("o_orderkey"), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col("__prev").as("ea"), col("o_orderkey").as("eb"),
        col("__rn"))
      .localCheckpoint(false)
    val oldEdges = chain.where(col("__rn") % 2 === 0)
    val newEdges = chain.where(col("__rn") % 2 === 1)
    val (labels0, converged) = graft.dedup.ConnectedComponents
      .componentsAuto(oldEdges, "ea", "eb")
    require(converged, "baseline labeling did not converge")
    graft.dedup.ConnectedComponents
      .incremental(labels0, newEdges, "ea", "eb")
      .orderBy("id")
  }

  private[graft] val oracleShingleCte = "WITH " + oracleShingleCtes

  /** The q218 90/10 md5 hash split, mirroring
    * `Sampling.splitColumn(salt = "q218")` — salt concatenated with
    * no separator, bound pinned to 0.9.
    */
  private def oracleSplitCase(idExpr: String): String =
    s"(CASE WHEN CAST(('0x' || substr(md5('q218' " +
      s"|| CAST($idExpr AS VARCHAR)), 1, 8)) AS BIGINT) " +
      s"/ 4294967296.0 < 0.9 THEN 'train' ELSE 'test' END)"

  /** Exact-Jaccard pair selection from the shingle CTE. */
  private[graft] def oracleJaccardSelect(
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

  /** TF-weighted SimHash CTE: identical bit math to Dedup.simhash. */
  /** The simhash replay with PREFIXED CTE names, composable next to
    * the shingle chain (whose `sh` name the unprefixed form collides
    * with); final CTE `${p}shp` carries (doc_id, simhash_hex, hi, lo).
    */
  private[graft] def oracleSimhashCtes(p: String): String = {
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
    s"""${p}toks AS (
       SELECT doc_id, unnest($oracleWords) AS token FROM documents),
       ${p}th AS (SELECT doc_id, md5(token) AS h FROM ${p}toks),
       ${p}sums AS (SELECT doc_id, $sums FROM ${p}th GROUP BY doc_id),
       ${p}sh AS (SELECT doc_id, $hexDigits AS simhash_hex
         FROM ${p}sums),
       ${p}shp AS (
         SELECT doc_id, simhash_hex,
           CAST(('0x' || substr(simhash_hex, 1, 8)) AS BIGINT) AS hi,
           CAST(('0x' || substr(simhash_hex, 9, 8)) AS BIGINT) AS lo
         FROM ${p}sh)"""
  }

  private[graft] val oracleSimhashCte: String =
    "WITH " + oracleSimhashCtes("")

  /** Content-chunking CTE replay ([[graft.text.TextAnalysis
    * .chunkByContent]], the q109 construction) over `src` (a relation
    * exposing doc_id, text), CTE names prefixed `p`; final CTE
    * `${p}ch` carries (doc_id, chunk_idx, n_tokens, chunk_md5).
    */
  private[graft] def oracleChunkCtes(p: String, src: String, target: Int): String =
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
}
