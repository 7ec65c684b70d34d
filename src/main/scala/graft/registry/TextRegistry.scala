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

/** Text-analysis, quality and lexical-retrieval queries — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Split from the original
  * single-file registry; member bodies are unchanged.
  */
private[graft] object TextRegistry extends TextRetrievalShelf
    with TextMiningShelf {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    retrievalQueries ++ miningQueries ++ Map(
    "q124_unigram_lm_quality" -> (unigramLmQuality _),
    "q133_collapse_repeats" -> (collapseRepeatRuns _),
    "q140_fused_quality_pass" -> (fusedQualityPassQ _),
    "q142_bpe_merges" -> (bpeMergesQ _),
    "q143_bpe_token_counts" -> (bpeTokenCountsQ _),
    "q145_bigram_lm_quality" -> (bigramLmQuality _),
    "q147_rare_token_spans" -> (rareTokenSpansQ _),
    "q150_fused_quality_bigram" -> (fusedQualityBigramQ _),
    "q153_dsir_selection" -> (dsirSelectionQ _),
    "q162_pii_incidence" -> (piiIncidenceQ _),
    "q163_tokenizer_fertility" -> (tokenizerFertilityQ _),
    "q177_cms_token_counts" -> (cmsTokenCountsQ _),
    "q184_unicode_nfc" -> (unicodeNfcQ _),
    "q185_mg_heavy_hitters" -> (mgHeavyHittersQ _),
    "q202_vocab_coverage" -> (vocabCoverageQ _),
    "q204_hill_tail_index" -> (hillTailQ _),
    "q213_hash_collision_audit" -> (hashCollisionQ _),
    "q224_mojibake_report" -> (mojibakeReportQ _),
    "q225_unigram_lm" -> (unigramLmTrainQ _),
    "q227_unigram_fertility" -> (unigramFertilityQ _),
    "q239_pmi_collocations" -> (pmiCollocationsQ _),
    "q240_lexical_diversity" -> (lexicalDiversityQ _),
    "q241_lang_divergence" -> (langDivergenceQ _),
    "q258_chao1_richness" -> (chao1RichnessQ _),
    "q262_vocab_overlap" -> (vocabOverlapQ _),
    "q264_token_drift" -> (tokenDriftQ _),
    "q288_heaps_law" -> (heapsLawQ _),
    "q289_simpson_diversity" -> (simpsonDiversityQ _),
    "q290_selection_curve" -> (selectionCurveQ _),
    "q307_richness_panel" -> (richnessPanelQ _),
    "q308_zipf_fit" -> (zipfFitQ _),
    "q314_quality_reliability" -> (qualityReliabilityQ _),
    "q323_good_turing_table" -> (goodTuringTableQ _),
    "q18_text_stats" -> (textStats _),
    "q19_doc_quality" -> (docQuality _),
    "q20_lang_id_facets" -> (langIdFacets _),
    "q43_normalize_redact" -> (textNormalizeRedact _),
    "q44_top_bigrams" -> (topBigrams _),
    "q50_compress_quality" -> (compressQuality _),
    "q58_tfidf_terms" -> (topTfidfTerms _),
    "q60_lang_token_budget" -> (langTokenBudget _),
    "q61_doc_chunks" -> (docChunks _),
    "q65_repetition_signals" -> (repetitionSignals _),
    "q69_vocab_coverage" -> (vocabCoverageTop _),
    "q76_fuzzy_part_names" -> (fuzzyPartNames _),
    "q77_heavy_hitter_tokens" -> (heavyHitterTokens _),
    "q80_quality_model_scores" -> (qualityModelScores _),
    "q81_adaptive_quality_floor" -> (adaptiveQualityFloorByLang _),
    "q91_top_keyword_histogram" -> (topKeywordHistogram _),
    "q98_langid_metrics" -> (langIdMetrics _),
    "q275_lang_classifier" -> (langClassifierQ _),
    "q279_lang_classifier_resume" -> (langClassifierResumeQ _),
  )

  def oracleSql: Map[String, String] =
    retrievalOracleSql ++ miningOracleSql ++ Map(
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
    // same seeded perturbation (chr() builds the artifacts from code
    // points), RE2 \x{...} classes mirror the engine's \uXXXX ones
    "q224_mojibake_report" ->
      """WITH seeded AS (
           SELECT source,
             CASE WHEN doc_id % 7 = 0
               THEN text || ' x' || chr(65533) || ' ' || chr(195)
                 || chr(169) || ' a' || chr(133) || 'b'
               ELSE text END AS text
           FROM documents),
         c AS (
           SELECT source,
             len(regexp_extract_all(coalesce(text, ''),
               '\x{FFFD}')) AS r,
             len(regexp_extract_all(coalesce(text, ''),
               '[\x{0080}-\x{009F}]')) AS c1,
             len(regexp_extract_all(coalesce(text, ''),
               '[\x{00C2}\x{00C3}][\x{0080}-\x{00BF}]')) AS de
           FROM seeded)
         SELECT source, count(*) AS n_docs,
           CAST(sum(r) AS BIGINT) AS repl_chars,
           CAST(sum(c1) AS BIGINT) AS c1_chars,
           CAST(sum(de) AS BIGINT) AS double_enc,
           CAST(sum(CASE WHEN r + c1 + de > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flagged,
           round(CAST(sum(CASE WHEN r + c1 + de > 0 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS flagged_frac
         FROM c GROUP BY source ORDER BY source""",
    // both hard-EM rounds unrolled; the final rank cut replays the
    // engine's (cnt desc, piece asc) top-60
    "q225_unigram_lm" ->
      s"""WITH RECURSIVE
         $oracleUnigramHead,
         ${oracleUnigramRound(0)},
         ${oracleUnigramRound(1)}
         SELECT piece, cnt,
           (cnt * 1000000) //
             CAST((SELECT sum(cnt) FROM v2) AS BIGINT) AS q_micro,
           CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC)
             AS INT) AS rank
         FROM v2 QUALIFY rank <= 60 ORDER BY rank""",
    // the q225 chain to the final cut vocabulary, then the APPLY DP
    // (top-60 pieces + unk single chars at mass 0; words > 16 chars
    // fall back to one token per character) side by side with the
    // q163 BPE apply — token counts only, so no backwalk is needed:
    // k = ceil(dp[n] / 2^40), exact because 0 <= sum(q) < 2^40
    "q227_unigram_fertility" ->
      s"""WITH RECURSIVE
         $oracleUnigramHead,
         ${oracleUnigramRound(0)},
         ${oracleUnigramRound(1)},
         vf AS MATERIALIZED (
           SELECT piece, (cnt * 1000000) //
             CAST((SELECT sum(cnt) FROM v2) AS BIGINT) AS q
           FROM v2
           QUALIFY row_number()
             OVER (ORDER BY cnt DESC, piece ASC) <= 60),
         ca AS MATERIALIZED (
           SELECT c.w, c.j, c.i, v.q FROM ucand c JOIN vf v USING (piece)
           UNION ALL
           SELECT c.w, c.j, c.i, CAST(0 AS BIGINT)
           FROM ucand c LEFT JOIN vf v USING (piece)
           WHERE c.i - c.j = 1 AND v.piece IS NULL),
         cla AS MATERIALIZED (
           SELECT w, i, list(struct_pack(j := j, q := q)) AS cs
           FROM ca GROUP BY w, i),
         dpa AS (
           SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS dps FROM uwf
           UNION ALL
           SELECT d.w, d.i + 1,
             list_append(d.dps, list_min(list_transform(cl.cs,
               x -> d.dps[x.j + 1] + 1099511627776 - x.q)))
           FROM dpa d JOIN cla cl ON cl.w = d.w AND cl.i = d.i + 1),
         wcu AS MATERIALIZED (
           SELECT d.w,
             (d.dps[length(d.w) + 1] + 1099511627775) // 1099511627776
               AS n
           FROM dpa d JOIN uwf USING (w) WHERE d.i = length(uwf.w)),
         w0 AS MATERIALIZED (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest($oracleWords) AS w FROM documents) z
           GROUP BY w),
         s0 AS MATERIALIZED (SELECT w, freq,
             ' ' || array_to_string(list_transform(
               generate_series(1, length(w)),
               i -> substring(w, i, 1)), ' ') || ' ' AS s
           FROM w0),
         ${(1 to 8).map(oracleBpeStep).mkString(",\n")},
         wcb AS (SELECT w, len(string_split(trim(s), ' ')) AS n
                FROM s8),
         dw AS (SELECT doc_id, unnest($oracleWords) AS w
                FROM documents),
         wcall AS (
           SELECT w, n FROM wcu
           UNION ALL
           SELECT w, length(w) AS n FROM (
             SELECT DISTINCT w FROM dw WHERE length(w) > 16) z),
         agg AS (
           SELECT doc_id, count(*) AS nw, sum(u.n) AS ntu,
             sum(b.n) AS ntb
           FROM dw JOIN wcall u USING (w) JOIN wcb b USING (w)
           GROUP BY doc_id),
         per AS (
           SELECT d.lang, coalesce(a.nw, 0) AS nw,
             coalesce(a.ntu, 0) AS ntu, coalesce(a.ntb, 0) AS ntb
           FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id)
         SELECT lang, CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(ntu) AS BIGINT) AS n_tokens_uni,
           CAST(sum(ntb) AS BIGINT) AS n_tokens_bpe,
           CAST(sum(ntu) AS DOUBLE) / nullif(sum(nw), 0)
             AS fertility_uni,
           CAST(sum(ntb) AS DOUBLE) / nullif(sum(nw), 0)
             AS fertility_bpe
         FROM per GROUP BY lang ORDER BY lang""",
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
    "q171_bm25_search" -> oracleBm25Sql,
    "q176_bm25_incremental" -> oracleBm25Sql,
    // same UAX #15 algorithm on both engines (JDK Normalizer vs
    // DuckDB nfc_normalize); all codepoints BMP so length units agree
    "q184_unicode_nfc" ->
      """WITH r AS (
           SELECT lang, text || chr(769) AS raw,
             nfc_normalize(text || chr(769)) AS n
           FROM documents)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN length(n) < length(raw) THEN 1 ELSE 0
             END) AS BIGINT) AS n_composed,
           CAST(sum(length(raw)) AS BIGINT) AS chars_raw,
           CAST(sum(length(n)) AS BIGINT) AS chars_nfc
         FROM r GROUP BY lang ORDER BY lang""",
    // the MG phase is recall-guaranteed and the verify pass is exact,
    // so the oracle needs no sketch replay: plain grouped counts cut
    // at the same double-multiply threshold
    "q185_mg_heavy_hitters" ->
      s"""WITH toks AS (
           SELECT unnest($oracleWords) AS token FROM documents),
         n AS (SELECT count(*) AS n FROM toks),
         c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
         SELECT token, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS frac
         FROM c CROSS JOIN n
         WHERE CAST(cnt AS DOUBLE) > 0.005 * CAST(n.n AS DOUBLE)
         ORDER BY cnt DESC, token""",
    // CMS cells replay as one grouped count over (row, md5-bucket);
    // estimates as a min over the probe's buckets with absent cells 0
    "q177_cms_token_counts" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest($oracleWords) AS token
           FROM documents),
         truth AS (
           SELECT token, count(*) AS true_cnt FROM toks
           GROUP BY token
           ORDER BY true_cnt DESC, token ASC LIMIT 15),
         cells AS (
           SELECT d,
             CAST(('0x' || substr(md5('cms' || CAST(d AS VARCHAR)
               || ':' || token), 1, 8)) AS BIGINT) % 512 AS w_idx,
             count(*) AS cnt
           FROM toks
           CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS d) ds
           GROUP BY 1, 2),
         pr AS (
           SELECT token, unnest(generate_series(0, 3)) AS d
           FROM truth),
         est AS (
           SELECT pr.token, min(coalesce(c.cnt, 0)) AS est
           FROM pr
           LEFT JOIN cells c ON c.d = pr.d
             AND c.w_idx = CAST(('0x' || substr(md5('cms'
               || CAST(pr.d AS VARCHAR) || ':' || pr.token), 1, 8))
               AS BIGINT) % 512
           GROUP BY pr.token)
         SELECT token, CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(est AS BIGINT) AS est_cnt,
           CAST(CASE WHEN est = true_cnt THEN 1 ELSE 0 END AS INT)
             AS exact
         FROM truth JOIN est USING (token)
         ORDER BY true_cnt DESC, token ASC""",
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
    // the q19 components micro-floored into exact per-lang moments;
    // n(n-1) cancels, so alpha is 1.5*(1 - one integer division)
    "q314_quality_reliability" ->
      s"""$oracleMetricsCte,
         items AS (
           SELECT lang,
             CAST(floor(least(CAST(1.0 AS DOUBLE),
               CAST(tokens AS DOUBLE) / 100.0) * 1000000.0)
               AS BIGINT) AS vol,
             CAST(floor((1.0 - least(CAST(1.0 AS DOUBLE),
               coalesce(punct, 0.0) * 5.0)) * 1000000.0)
               AS BIGINT) AS clean,
             CAST(floor(least(CAST(1.0 AS DOUBLE),
               coalesce(stop, 0.0) * 5.0) * 1000000.0)
               AS BIGINT) AS stp
           FROM m WHERE text IS NOT NULL AND lang IS NOT NULL),
         ag AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vol) AS BIGINT) AS sv,
             sum(CAST(vol AS HUGEINT) * vol) AS qv,
             CAST(sum(clean) AS BIGINT) AS sc,
             sum(CAST(clean AS HUGEINT) * clean) AS qc,
             CAST(sum(stp) AS BIGINT) AS ss,
             sum(CAST(stp AS HUGEINT) * stp) AS qs,
             CAST(sum(vol + clean + stp) AS BIGINT) AS st,
             sum(CAST(vol + clean + stp AS HUGEINT)
               * (vol + clean + stp)) AS qt
           FROM items GROUP BY lang),
         f AS (
           SELECT lang, n,
             CAST(CAST(n AS HUGEINT) * qv - CAST(sv AS HUGEINT) * sv
               + CAST(n AS HUGEINT) * qc - CAST(sc AS HUGEINT) * sc
               + CAST(n AS HUGEINT) * qs - CAST(ss AS HUGEINT) * ss
               AS DOUBLE) AS snum,
             CAST(CAST(n AS HUGEINT) * qt - CAST(st AS HUGEINT) * st
               AS DOUBLE) AS tnum
           FROM ag)
         SELECT lang, n, CAST(3 AS INT) AS k_items,
           CASE WHEN n < 2 OR tnum <= 0 THEN NULL
             ELSE round(snum / tnum, 6) END AS var_ratio,
           CASE WHEN n < 2 OR tnum <= 0 THEN NULL
             ELSE round(1.5 * (1.0 - snum / tnum), 6) END AS alpha
         FROM f ORDER BY lang""",
    "q20_lang_id_facets" ->
      s"""$oracleLangScores
         SELECT lang, predicted, count(*) AS n
         FROM p GROUP BY lang, predicted ORDER BY lang, predicted""",
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
    // PMI through exact HUGEINT products; ordering by the rounded
    // pmi is safe because both engines compute identical doubles
    "q239_pmi_collocations" ->
      """WITH wd AS (
           SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         uni AS (
           SELECT w, count(*) AS nw
           FROM (SELECT unnest(ws) AS w FROM wd) GROUP BY 1),
         tot AS (
           SELECT CAST(sum(len(ws)) AS BIGINT) AS n_uni,
             CAST(sum(greatest(len(ws) - 1, 0)) AS BIGINT) AS n_bi
           FROM wd),
         b AS (
           SELECT ws[i] AS w1, ws[i+1] AS w2 FROM wd,
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t),
         p AS (
           SELECT w1, w2, count(*) AS n_pair FROM b GROUP BY 1, 2
           HAVING count(*) >= 5),
         j AS (
           SELECT p.w1, p.w2, p.n_pair,
             CAST(u1.nw AS BIGINT) AS n_w1,
             CAST(u2.nw AS BIGINT) AS n_w2
           FROM p
           JOIN uni u1 ON u1.w = p.w1
           JOIN uni u2 ON u2.w = p.w2)
         SELECT w1, w2, n_pair, n_w1, n_w2,
           round(ln(
             CAST(CAST(n_pair AS HUGEINT) * n_uni * n_uni AS DOUBLE)
             / CAST(CAST(n_bi AS HUGEINT) * n_w1 * n_w2 AS DOUBLE)),
             6) AS pmi
         FROM j, tot
         ORDER BY pmi DESC, w1, w2 LIMIT 50""",
    // entropy identity H = ln n − (Σ c·ln c)/n with the per-word
    // term floor-µ-quantized before the (order-free) sum
    "q240_lexical_diversity" ->
      """WITH c AS (
           SELECT doc_id, w, count(*) AS c FROM (
             SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents)
           GROUP BY 1, 2),
         d AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(sum(CAST(floor(CAST(c AS DOUBLE)
               * ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT))
               AS BIGINT) AS clnc
           FROM c GROUP BY 1)
         SELECT doc_id, n_tokens, n_types,
           round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS ttr,
           round(CAST(hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
             AS hapax_frac,
           round(ln(CAST(n_tokens AS DOUBLE))
             - (CAST(clnc AS DOUBLE) / 1000000.0)
               / CAST(n_tokens AS DOUBLE), 6) AS entropy,
           round(CASE WHEN n_tokens > 1 THEN
             (ln(CAST(n_tokens AS DOUBLE))
               - (CAST(clnc AS DOUBLE) / 1000000.0)
                 / CAST(n_tokens AS DOUBLE))
             / ln(CAST(n_tokens AS DOUBLE)) END, 6) AS norm_entropy
         FROM d ORDER BY doc_id""",
    // value-sliced checkpoints via integer floor division; first-doc
    // vocabulary counts; nano-quantized ln points into exact OLS sums
    "q288_heaps_law" ->
      s"""WITH tok AS (
           SELECT doc_id, $oracleWords AS ws
           FROM documents WHERE text IS NOT NULL),
         pd AS (
           SELECT doc_id, CAST(len(ws) AS BIGINT) AS ntok FROM tok),
         bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
           FROM pd),
         cps AS (
           SELECT k AS checkpoint,
             lo - 1 + ((hi - lo + 1) * k) // 12 AS b
           FROM bounds, (SELECT unnest(generate_series(1, 12)) AS k) t),
         curve AS (
           SELECT checkpoint, b, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS cum_tokens
           FROM cps JOIN pd ON pd.doc_id <= cps.b GROUP BY 1, 2),
         fd AS (
           SELECT w, min(doc_id) AS fdoc FROM (
             SELECT doc_id, unnest(ws) AS w FROM tok) GROUP BY w),
         vv AS (
           SELECT checkpoint, CAST(count(*) AS BIGINT) AS vocab
           FROM cps JOIN fd ON fd.fdoc <= cps.b GROUP BY 1),
         pts AS (
           SELECT c.checkpoint, c.b, c.n_docs, c.cum_tokens, v.vocab
           FROM curve c JOIN vv v USING (checkpoint)),
         q AS (
           SELECT CAST(floor(ln(CAST(cum_tokens AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS xq,
             CAST(floor(ln(CAST(vocab AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS yq
           FROM pts WHERE cum_tokens > 0 AND vocab > 0),
         s AS (
           SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx FROM q),
         fit AS (
           SELECT CASE WHEN m < 2 THEN NULL
             ELSE CAST(CAST(m AS HUGEINT) * sxy
                 - CAST(sx AS HUGEINT) * sy AS DOUBLE)
               / CAST(CAST(m AS HUGEINT) * sxx
                 - CAST(sx AS HUGEINT) * sx AS DOUBLE) END AS beta,
             m, sx, sy FROM s),
         fin AS (
           SELECT beta, CASE WHEN beta IS NULL THEN NULL
             ELSE exp(((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
               / CAST(m AS DOUBLE)) / 1000000000.0) END AS kc
           FROM fit)
         SELECT checkpoint, b AS boundary_doc, n_docs, cum_tokens,
           vocab, round(beta, 6) AS beta, round(kc, 4) AS k_coef
         FROM pts, fin ORDER BY checkpoint""",
    "q294_dirichlet_ql" -> oracleDirichletQlSql,
    // the replayed quality score ranks the corpus; ntile(10) shares
    // Spark's bucket arithmetic; md5 groups label exact dups; the
    // mean score is µ-floored per row before the order-free sum
    "q290_selection_curve" ->
      s"""$oracleMetricsCte,
         h AS (
           SELECT doc_id, n_chars, quality, md5(text) AS hh
           FROM q WHERE text IS NOT NULL),
         dc AS (SELECT hh, count(*) AS c FROM h GROUP BY hh),
         lab AS (
           SELECT doc_id, n_chars, quality,
             CASE WHEN c >= 2 THEN 1 ELSE 0 END AS dup
           FROM h JOIN dc USING (hh)),
         nt AS (
           SELECT doc_id, n_chars, quality, dup,
             ntile(10) OVER (ORDER BY quality DESC, doc_id)
               AS decile
           FROM lab)
         SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dup) AS BIGINT) AS n_dups,
           round(CAST(sum(dup) AS DOUBLE) / CAST(count(*) AS DOUBLE),
             6) AS dup_rate,
           round(CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS short_rate,
           round(CAST(sum(n_chars) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS mean_chars,
           round(CAST(sum(CAST(floor(quality * 1000000.0) AS BIGINT))
               AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
             AS mean_score,
           round(min(quality), 6) AS min_score,
           round(max(quality), 6) AS max_score
         FROM nt GROUP BY decile ORDER BY decile""",
    // repeat-pair numerator Σc(c−1) exact in HUGEINT; one mirrored
    // division per ratio
    "q289_simpson_diversity" ->
      s"""WITH wc AS (
           SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT lang, unnest($oracleWords) AS w
             FROM documents WHERE text IS NOT NULL)
           GROUP BY 1, 2),
         agg AS (
           SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(CAST(c AS HUGEINT) * (c - 1)) AS lnum,
             CAST(max(c) AS BIGINT) AS maxc
           FROM wc GROUP BY 1)
         SELECT lang, n_tokens, n_types,
           CASE WHEN n_tokens < 2 THEN NULL
             ELSE round(CAST(lnum AS DOUBLE)
               / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1)
                 AS DOUBLE), 6) END AS simpson,
           CASE WHEN n_tokens < 2 OR lnum = 0 THEN NULL
             ELSE round(CAST(CAST(n_tokens AS HUGEINT)
                 * (n_tokens - 1) AS DOUBLE)
               / CAST(lnum AS DOUBLE), 4) END AS inv_simpson,
           round(CAST(maxc AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS berger_parker
         FROM agg ORDER BY lang""",
    // KL terms nano-quantized before the order-free integer sum;
    // floor truncates toward −∞ identically on the negative terms
    "q241_lang_divergence" ->
      """WITH lw AS (
           SELECT lang, w, count(*) AS clw FROM (
             SELECT lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents)
           GROUP BY 1, 2),
         lt AS (SELECT lang, CAST(sum(clw) AS BIGINT) AS nl
           FROM lw GROUP BY 1),
         cw AS (SELECT w, CAST(sum(clw) AS BIGINT) AS cww
           FROM lw GROUP BY 1),
         nt AS (SELECT CAST(sum(cww) AS BIGINT) AS n FROM cw),
         t AS (
           SELECT lw.lang, lw.clw,
             CAST(floor(CAST(lw.clw AS DOUBLE) / CAST(lt.nl AS DOUBLE)
               * ln(CAST(CAST(lw.clw AS HUGEINT) * nt.n AS DOUBLE)
                 / CAST(CAST(lt.nl AS HUGEINT) * cw.cww AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS tn
           FROM lw
           JOIN cw ON cw.w = lw.w
           JOIN lt ON lt.lang = lw.lang, nt)
         SELECT lang, CAST(sum(clw) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(tn) AS BIGINT) AS kl_nano,
           round(CAST(sum(tn) AS DOUBLE) / 1000000000.0, 6) AS kl
         FROM t GROUP BY 1 ORDER BY lang""",
    "q246_retrieval_eval" -> oracleRetrievalEvalSql,
    "q259_retrieval_macro" ->
      s"""WITH base AS ($oracleRetrievalEvalSql),
         m AS (
           SELECT
             CAST(count(*) AS BIGINT) AS n_queries,
             CAST(sum(CASE WHEN n_rel IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_judged,
             CAST(sum(CASE WHEN n_rel IS NOT NULL AND n_hit = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_hit,
             CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
               CAST(floor(p_at_k * 1000000000.0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS sp,
             CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
               CAST(floor(r_at_k * 1000000000.0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS sr,
             CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
               CAST(floor(rr * 1000000000.0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS srr,
             CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
               CAST(floor(coalesce(ndcg, 0.0) * 1000000000.0)
                 AS BIGINT)
               ELSE 0 END) AS BIGINT) AS snd
           FROM base)
         SELECT n_queries, n_judged, n_zero_hit,
           round(CAST(sp AS DOUBLE) / CAST(n_judged AS DOUBLE)
             / 1000000000.0, 6) AS mean_p_at_k,
           round(CAST(sr AS DOUBLE) / CAST(n_judged AS DOUBLE)
             / 1000000000.0, 6) AS mean_r_at_k,
           round(CAST(srr AS DOUBLE) / CAST(n_judged AS DOUBLE)
             / 1000000000.0, 6) AS mrr,
           round(CAST(snd AS DOUBLE) / CAST(n_judged AS DOUBLE)
             / 1000000000.0, 6) AS mean_ndcg
         FROM m""",

    // exact BIGINT counts, HUGEINT determinant, one mirrored double
    // chain ((det·det)·N)/(((r1·r2)·ta)·tb) rounded 4 — a RANKING
    // score; top-k ties break on the token
    "q264_token_drift" ->
      """WITH wa AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
             AS token
           FROM documents WHERE doc_id % 2 = 0),
         wb AS (
           SELECT unnest(regexp_extract_all(
             lower(text || ' drifttoken'), '[a-z0-9]+')) AS token
           FROM documents WHERE doc_id % 2 = 1),
         ca_ AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt_base
                 FROM wa GROUP BY 1),
         cb_ AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt_cur
                 FROM wb GROUP BY 1),
         j AS (
           SELECT coalesce(ca_.token, cb_.token) AS token,
             coalesce(cnt_base, 0) AS cnt_base,
             coalesce(cnt_cur, 0) AS cnt_cur
           FROM ca_ FULL OUTER JOIN cb_ ON ca_.token = cb_.token),
         t AS (SELECT CAST(sum(cnt_base) AS BIGINT) AS ta,
                 CAST(sum(cnt_cur) AS BIGINT) AS tb FROM j),
         s AS (
           SELECT token, cnt_base, cnt_cur,
             CASE WHEN CAST(cnt_base + cnt_cur AS DOUBLE)
                 * CAST((ta - cnt_base) + (tb - cnt_cur) AS DOUBLE)
                 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) > 0.0 THEN
               round(CAST(CAST(cnt_base AS HUGEINT) * (tb - cnt_cur)
                   - CAST(cnt_cur AS HUGEINT) * (ta - cnt_base)
                   AS DOUBLE)
                 * CAST(CAST(cnt_base AS HUGEINT) * (tb - cnt_cur)
                   - CAST(cnt_cur AS HUGEINT) * (ta - cnt_base)
                   AS DOUBLE)
                 * CAST(ta + tb AS DOUBLE)
                 / (CAST(cnt_base + cnt_cur AS DOUBLE)
                   * CAST((ta - cnt_base) + (tb - cnt_cur) AS DOUBLE)
                   * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 4)
             END AS chi2
           FROM j, t)
         SELECT token, cnt_base, cnt_cur, chi2 FROM s
         ORDER BY chi2 DESC NULLS LAST, token ASC LIMIT 20""",
    // exact distinct-type counts; jaccard/containments single double
    // divisions
    "q262_vocab_overlap" ->
      """WITH t AS (
           SELECT DISTINCT g, w FROM (
             SELECT CAST(lang AS VARCHAR) AS g,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents WHERE lang IS NOT NULL)),
         sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n
                FROM t GROUP BY g),
         c AS (
           SELECT a.g AS ga, b.g AS gb,
             CAST(count(*) AS BIGINT) AS n_common
           FROM t a JOIN t b ON a.w = b.w AND a.g < b.g
           GROUP BY 1, 2)
         SELECT c.ga AS group_a, c.gb AS group_b,
           sa.n AS n_a, sb.n AS n_b, c.n_common,
           round(CAST(c.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - c.n_common AS DOUBLE), 6) AS jaccard,
           round(CAST(c.n_common AS DOUBLE) / CAST(sa.n AS DOUBLE), 6)
             AS contain_a,
           round(CAST(c.n_common AS DOUBLE) / CAST(sb.n AS DOUBLE), 6)
             AS contain_b
         FROM c JOIN sz sa ON sa.g = c.ga JOIN sz sb ON sb.g = c.gb
         ORDER BY group_a, group_b""",
    // exact t/f1/f2/n integers; chao1 and coverage each one mirrored
    // double expression (f1(f1-1) through HUGEINT)
    "q258_chao1_richness" ->
      """WITH w AS (
           SELECT lang,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
         c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
               FROM w GROUP BY 1, 2),
         g AS (
           SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS f2
           FROM c GROUP BY 1)
         SELECT lang, n_tokens, n_types, f1, f2,
           round(CAST(n_types AS DOUBLE)
             + CAST(CAST(f1 AS HUGEINT) * (f1 - 1) AS DOUBLE)
               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 4) AS chao1,
           round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS coverage
         FROM g ORDER BY lang""",
    "q326_smoothing_ab" -> {
      def leg(sys: String, resultsSql: String): String =
        s"""SELECT '$sys' AS system, n_queries, n_judged, n_zero_hit,
           mean_p_at_k, mean_r_at_k, mrr, mean_ndcg FROM (
           WITH base AS (${oracleRetrievalEvalSqlFor(resultsSql)}),
           m AS (
             SELECT
               CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(CASE WHEN n_rel IS NOT NULL THEN 1 ELSE 0
                 END) AS BIGINT) AS n_judged,
               CAST(sum(CASE WHEN n_rel IS NOT NULL AND n_hit = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_hit,
               CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
                 CAST(floor(p_at_k * 1000000000.0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS sp,
               CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
                 CAST(floor(r_at_k * 1000000000.0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS sr,
               CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
                 CAST(floor(rr * 1000000000.0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS srr,
               CAST(sum(CASE WHEN n_rel IS NOT NULL THEN
                 CAST(floor(coalesce(ndcg, 0.0) * 1000000000.0)
                   AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS snd
             FROM base)
           SELECT n_queries, n_judged, n_zero_hit,
             round(CAST(sp AS DOUBLE) / CAST(n_judged AS DOUBLE)
               / 1000000000.0, 6) AS mean_p_at_k,
             round(CAST(sr AS DOUBLE) / CAST(n_judged AS DOUBLE)
               / 1000000000.0, 6) AS mean_r_at_k,
             round(CAST(srr AS DOUBLE) / CAST(n_judged AS DOUBLE)
               / 1000000000.0, 6) AS mrr,
             round(CAST(snd AS DOUBLE) / CAST(n_judged AS DOUBLE)
               / 1000000000.0, 6) AS mean_ndcg
           FROM m)"""
      leg("bm25", oracleBm25Sql) + "\n         UNION ALL " +
        leg("dirichlet_ql", oracleDirichletQlSql) +
        "\n         ORDER BY system"
    },
    "q324_rocchio_prf" ->
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
         sc1 AS (
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
         agg1 AS (
           SELECT qid, doc_id, sum(tm) AS score
           FROM sc1 GROUP BY 1, 2),
         fb AS (
           SELECT qid, doc_id FROM (
             SELECT qid, doc_id, row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, doc_id ASC)
               AS rank
             FROM agg1) WHERE rank <= 5),
         votes AS (
           SELECT fb.qid, tf.token,
             CAST(sum(tf * CAST(floor(
               ln(CAST(1 AS DOUBLE) + (n - df + CAST(0.5 AS DOUBLE))
                 / (df + CAST(0.5 AS DOUBLE)))
               * 1000000) AS BIGINT)) AS BIGINT) AS mass
           FROM fb JOIN tf ON tf.doc_id = fb.doc_id
           JOIN dfq USING (token), stats
           GROUP BY 1, 2),
         votesx AS (
           SELECT v.qid, v.token, v.mass FROM votes v
           ANTI JOIN qt ON qt.qid = v.qid AND qt.token = v.token),
         expn AS (
           SELECT qid, token FROM (
             SELECT qid, token, row_number() OVER (
               PARTITION BY qid ORDER BY mass DESC, token ASC) AS r
             FROM votesx) WHERE r <= 5),
         nexp AS (
           SELECT qid, CAST(count(*) AS BIGINT) AS n_exp_terms
           FROM expn GROUP BY 1),
         sc2a AS (
           SELECT qid, tf.doc_id, 2 * CAST(floor(
               ln(CAST(1 AS DOUBLE) + (n - df + CAST(0.5 AS DOUBLE))
                 / (df + CAST(0.5 AS DOUBLE)))
               * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
               / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * len / avgdl))
               * 1000000000) AS BIGINT) AS tm
           FROM qt
           JOIN tf USING (token) JOIN dfq USING (token)
           JOIN lens ON lens.doc_id = tf.doc_id, stats),
         sc2b AS (
           SELECT qid, tf.doc_id, CAST(floor(
               ln(CAST(1 AS DOUBLE) + (n - df + CAST(0.5 AS DOUBLE))
                 / (df + CAST(0.5 AS DOUBLE)))
               * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
               / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * len / avgdl))
               * 1000000000) AS BIGINT) AS tm
           FROM expn
           JOIN tf USING (token) JOIN dfq USING (token)
           JOIN lens ON lens.doc_id = tf.doc_id, stats),
         merged AS (
           SELECT qid, doc_id, CAST(sum(tm) AS BIGINT) AS s FROM (
             SELECT qid, doc_id, tm FROM sc2a
             UNION ALL SELECT qid, doc_id, tm FROM sc2b)
           GROUP BY 1, 2),
         fin AS (
           SELECT qid, doc_id, s, row_number() OVER (
             PARTITION BY qid ORDER BY s DESC, doc_id ASC) AS rank
           FROM merged)
         SELECT fin.qid AS query_id, fin.doc_id,
           fin.s AS score_half_micro, CAST(fin.rank AS INT) AS rank,
           coalesce(nexp.n_exp_terms, 0) AS n_exp_terms
         FROM fin LEFT JOIN nexp ON nexp.qid = fin.qid
         WHERE fin.rank <= 10
         ORDER BY query_id, rank""",
    // exact bigram counts-of-counts; c* and mass one mirrored
    // division each; absent V_{c+1} is an honest null
    "q323_good_turing_table" ->
      s"""WITH b AS (
           SELECT lang, ws[i] || ' ' || ws[i + 1] AS bg FROM (
             SELECT lang, $oracleWords AS ws
             FROM documents WHERE text IS NOT NULL),
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
             AS i) t),
         c AS (
           SELECT lang, bg, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2),
         sp AS (
           SELECT lang, c, CAST(count(*) AS BIGINT) AS vc
           FROM c GROUP BY 1, 2),
         n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n
           FROM c GROUP BY 1),
         nx AS (SELECT lang, c - 1 AS c, vc AS vnext FROM sp)
         SELECT sp.lang, sp.c AS c, sp.vc AS v_c,
           CASE WHEN nx.vnext IS NULL OR sp.vc = 0 THEN NULL
             ELSE round(CAST(sp.c + 1 AS DOUBLE)
               * CAST(nx.vnext AS DOUBLE)
               / CAST(sp.vc AS DOUBLE), 6) END AS c_star,
           round(CAST(sp.c AS DOUBLE) * CAST(sp.vc AS DOUBLE)
             / CAST(n.n AS DOUBLE), 6) AS mass_share
         FROM sp
         LEFT JOIN nx ON nx.lang = sp.lang AND nx.c = sp.c
         JOIN n ON n.lang = sp.lang
         WHERE sp.c <= 8
         ORDER BY sp.lang, sp.c""",
    // exact N/V/V1/V2/S2 off one (lang, word) count (squares in
    // HUGEINT); each statistic one mirrored double expression
    "q307_richness_panel" ->
      s"""WITH w AS (
           SELECT lang, unnest($oracleWords) AS tok
           FROM documents WHERE text IS NOT NULL),
         c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
               FROM w GROUP BY 1, 2),
         g AS (
           SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS v1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS v2,
             sum(CAST(c AS HUGEINT) * c) AS s2
           FROM c GROUP BY 1)
         SELECT lang, n_tokens, n_types, v1, v2,
           CASE WHEN n_tokens < 2 THEN NULL
             ELSE round(10000.0
               * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
               / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
               6) END AS yule_k,
           CASE WHEN n_tokens < 2 OR n_types < 1 THEN NULL
             ELSE round(ln(CAST(n_types AS DOUBLE))
               / ln(CAST(n_tokens AS DOUBLE)), 6) END AS herdan_c,
           CASE WHEN v1 < 1 THEN NULL
             ELSE round(2.0 * CAST(v2 AS DOUBLE)
               / CAST(v1 AS DOUBLE), 6) END AS gt_c1_star
         FROM g ORDER BY lang""",
    // total-order ranks (count DESC, token ASC), nano-quantized ln
    // points into exact OLS sums — the q288 discipline
    "q308_zipf_fit" ->
      s"""WITH c AS (
           SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT lang, unnest($oracleWords) AS tok
             FROM documents WHERE text IS NOT NULL)
           GROUP BY 1, 2),
         top AS (
           SELECT lang, c, row_number() OVER (
             PARTITION BY lang ORDER BY c DESC, tok ASC) AS r
           FROM c QUALIFY r <= 100),
         q AS (
           SELECT lang,
             CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000000.0)
               AS BIGINT) AS xq,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000.0)
               AS BIGINT) AS yq
           FROM top),
         s AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx
           FROM q GROUP BY lang),
         fit AS (
           SELECT lang, m,
             CAST(CAST(m AS HUGEINT) * sxx
               - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS den,
             CAST(CAST(m AS HUGEINT) * sxy
               - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
           FROM s),
         fin AS (
           SELECT lang, m,
             CASE WHEN m < 2 OR den <= 0 THEN NULL
               ELSE num / den END AS slope,
             CASE WHEN m < 2 OR den <= 0 THEN NULL
               ELSE exp(((syd - (num / den) * sxd)
                 / CAST(m AS DOUBLE)) / 1000000000.0) END AS kc
           FROM fit)
         SELECT lang, m AS n_points, round(slope, 6) AS slope,
           round(kc, 4) AS k_coef
         FROM fin ORDER BY lang""",
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
    // q46-style in-query assertion: the constants are claims about the
    // deflate signal that must hold for EVERY document
    "q50_compress_quality" ->
      """SELECT count(*) AS n_docs,
         CAST(1 AS INT) AS all_ratios_bounded,
         CAST(1 AS INT) AS all_doubling_compresses
         FROM documents
         WHERE text IS NOT NULL AND length(text) > 0""",
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
    "q275_lang_classifier" -> oracleLangClfSql,
    "q279_lang_classifier_resume" -> oracleLangClfResumeSql,
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
    // coverage = one division of exact BIGINTs per checkpoint; the
    // ranking window runs over the bounded top-4000
    // TakeOrderedAndProject frame, ties total-ordered by token text
    "q202_vocab_coverage" ->
      s"""WITH wc AS (
           SELECT w, count(*) AS c FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         tt AS (SELECT CAST(sum(c) AS BIGINT) AS tot,
                count(*) AS types FROM wc),
         top AS (
           SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
           FROM wc ORDER BY c DESC, w ASC LIMIT 4000),
         ck AS (
           SELECT v AS vocab_size,
             CAST(sum(c) AS BIGINT) AS covered_tokens,
             count(*) AS n_types
           FROM top, LATERAL (SELECT
             unnest([100, 500, 1000, 2000, 4000]) AS v) t
           WHERE rk <= v GROUP BY v)
         SELECT vocab_size, n_types, covered_tokens,
           tt.tot AS total_tokens, tt.types AS distinct_types,
           round(CAST(covered_tokens AS DOUBLE)
             / CAST(tot AS DOUBLE), 6) AS coverage,
           round(1.0 - CAST(covered_tokens AS DOUBLE)
             / CAST(tot AS DOUBLE), 6) AS oov_rate
         FROM ck CROSS JOIN tt ORDER BY vocab_size""",
    // Hill estimator over the top-(k+1) counts: the ln sum is a
    // k-term rounded double sum; x_{k+1} rides a one-row cross join
    "q204_hill_tail_index" ->
      s"""WITH wc AS (
           SELECT w, count(*) AS c FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         top AS (
           SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
           FROM wc ORDER BY c DESC, w ASC LIMIT 501),
         xk AS (SELECT c AS xk1 FROM top WHERE rk = 501)
         SELECT count(*) AS k,
           CAST(max(xk.xk1) AS BIGINT) AS x_k_plus_1,
           round(CAST(count(*) AS DOUBLE)
             / sum(ln(CAST(c AS DOUBLE) / CAST(xk.xk1 AS DOUBLE))), 6)
             AS alpha,
           round(sum(ln(CAST(c AS DOUBLE) / CAST(xk.xk1 AS DOUBLE)))
             / CAST(count(*) AS DOUBLE), 6) AS mean_log_excess
         FROM top CROSS JOIN xk WHERE rk <= 500""",
    // buckets derive exactly as featureHashEmbed does; the mass
    // share divides once from exact BIGINTs
    "q213_hash_collision_audit" ->
      s"""WITH wc AS (
           SELECT w, count(*) AS c FROM (
             SELECT unnest($oracleWords) AS w FROM documents)
           GROUP BY w),
         h AS (SELECT w, c,
           CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS hh
           FROM wc),
         dims AS (SELECT unnest([64, 256, 1024]) AS dim),
         b AS (SELECT dim, hh % dim AS bkt, count(*) AS types,
               CAST(sum(c) AS BIGINT) AS mass
               FROM h CROSS JOIN dims GROUP BY 1, 2)
         SELECT dim, CAST(sum(types) AS BIGINT) AS n_types,
           count(*) AS buckets_used,
           CAST(max(types) AS BIGINT) AS max_bucket_types,
           round(CAST(sum(CASE WHEN types > 1 THEN mass ELSE 0 END)
             AS DOUBLE) / CAST(sum(mass) AS DOUBLE), 6)
             AS collision_mass_share
         FROM b GROUP BY dim ORDER BY dim""",
  )

  /** Vocabulary coverage / OOV curve ([[TextAnalysis.vocabCoverage]]):
    * token-mass coverage at candidate vocab sizes over the corpus —
    * the tokenizer-sizing report read before a vocab is frozen.
    */
  private[graft] def vocabCoverageQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(docs(s, dir), "text")
      .orderBy("vocab_size")

  /** Feature-hash collision audit
    * ([[TextAnalysis.hashCollisionAudit]]): at the q175 embedder's
    * candidate dimensions, how much TOKEN MASS collides — the
    * dimension-sizing report read next to the coverage curve.
    */
  private[graft] def hashCollisionQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashCollisionAudit(docs(s, dir), "text",
        dims = Seq(64, 256, 1024))
      .orderBy("dim")

  /** Hill tail-index of token frequencies
    * ([[TextAnalysis.hillTailIndex]]): the Zipf-tail diagnostic read
    * next to the coverage curve — heavy tail means vocab growth keeps
    * paying.
    */
  private[graft] def hillTailQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hillTailIndex(docs(s, dir), "text", k = 500)

  /** Text quality/token statistics per language. */
  private[graft] def textStats(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def docQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text")), 4).as("stop_ratio"),
      round(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
      .orderBy("doc_id")

  /** Language-ID heuristic vs the labeled lang column. */
  private[graft] def langIdFacets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langIdStaged(docs(s, dir), "text")
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")

  /** Text normalization + PII redaction, membership pinned by md5 of
    * the transformed strings (not just row counts). A deterministic
    * email/phone/SSN per doc is appended before redaction so the scrub
    * path is exercised even on a clean corpus.
    */
  private[graft] def textNormalizeRedact(s: SparkSession, dir: String): DataFrame = {
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

  /** PMI collocations ([[TextAnalysis.pmiCollocations]]): the
    * association-strength upgrade of q44's raw-count bigram top-15 —
    * a pair seen 30 times from two rare words outranks "the value"
    * seen 300 times. Count floor 5, top-50 by (pmi desc, w1, w2);
    * ordering is cross-engine-safe because the pmi doubles are
    * bit-identical (one ln over exact DECIMAL/HUGEINT products).
    */
  private[graft] def pmiCollocationsQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(docs(s, dir), "text",
      minPairCount = 5, topK = 50)

  /** Lexical diversity ([[TextAnalysis.lexicalDiversity]]): per-doc
    * TTR / hapax share / word-distribution entropy with the
    * µ-quantized order-free Σ c·ln c.
    */
  private[graft] def lexicalDiversityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexicalDiversity(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Heaps'-law vocabulary-growth fit ([[TextAnalysis.heapsLawFit]]):
    * 12 doc-id-boundary checkpoints of cumulative tokens vs
    * cumulative vocabulary (a word counts from its FIRST doc — one
    * grouped min, no token-level window) plus the log–log OLS β and
    * K. The growth-curve complement of q258's Chao1 point estimate.
    */
  private[graft] def heapsLawQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heapsLawFit(docs(s, dir), "doc_id", "text")
      .orderBy("checkpoint")

  private[graft] def selectionCurveQ(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        TextAnalysis.qualityScore(col("text")).as("__score"),
        md5(col("text").cast("binary")).as("__h"))
      .transform(graft.core.CacheScope.disk)
    val dupCounts = scored.groupBy("__h")
      .agg(count(lit(1)).as("__c"))
    val lab = scored.join(dupCounts, Seq("__h"))
      .withColumn("__dup", (col("__c") >= 2L).cast("long"))
      .withColumn("__all", lit("all"))
    // the two-pass range form unconditionally (not the adaptive
    // probe): the probe's small-corpus branch is a genuine global
    // window over the corpus, which the plan gate rightly rejects —
    // this form's only global window is the offset stitch over the
    // per-range-slice count frame (the q158/q165 pinned shape)
    val deciled = Analytics.ntileByRange(
      lab.select(col("__all"), col("doc_id"), col("n_chars"),
        col("__score"), col("__dup")),
      Seq("__all"),
      Seq(col("__score").desc, col("doc_id").asc),
      k = 10, bucketCol = "decile")
    deciled.groupBy("decile")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__dup")).as("n_dups"),
        sum(when(col("n_chars") < 200L, 1L).otherwise(0L))
          .as("__nshort"),
        sum(col("n_chars")).as("__chars"),
        sum(floor(col("__score") * 1000000.0).cast("long"))
          .as("__sq"),
        min(col("__score")).as("__mn"),
        max(col("__score")).as("__mx"))
      .select(col("decile"), col("n_docs"), col("n_dups"),
        round(col("n_dups").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("__nshort").cast("double") /
          col("n_docs").cast("double"), 6).as("short_rate"),
        round(col("__chars").cast("double") /
          col("n_docs").cast("double"), 4).as("mean_chars"),
        round(col("__sq").cast("double") /
          col("n_docs").cast("double") / 1000000.0, 6)
          .as("mean_score"),
        round(col("__mn"), 6).as("min_score"),
        round(col("__mx"), 6).as("max_score"))
      .orderBy("decile")
  }

  /** Simpson diversity / Berger–Parker dominance per language
    * ([[TextAnalysis.simpsonDiversity]]): the concentration row of
    * the language datasheet — exact-integer repeat-pair numerators,
    * one mirrored division per emitted ratio.
    */
  private[graft] def simpsonDiversityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.simpsonDiversity(docs(s, dir), "lang", "text")
      .orderBy("lang")

  /** Per-language unigram KL divergence from the corpus distribution
    * ([[TextAnalysis.langUnigramDivergence]]), nano-quantized
    * order-free term sum.
    */
  private[graft] def langDivergenceQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langUnigramDivergence(docs(s, dir), "lang", "text")
      .orderBy("lang")

  private[graft] def tokenDriftQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextAnalysis.tokenDriftLeaderboard(
      d.where(col("doc_id") % 2 === 0),
      d.where(col("doc_id") % 2 === 1)
        .withColumn("text", concat(col("text"), lit(" drifttoken"))),
      "text", k = 20)
  }

  /** Pairwise language vocabulary overlap
    * ([[TextAnalysis.vocabOverlap]]): exact shared-type counts,
    * Jaccard and both containments for every language pair — the
    * cross-lingual boilerplate screen next to q258's per-language
    * richness. Word-keyed self-join of the distinct (lang, word)
    * frame, |vocab|·G²-bounded.
    */
  private[graft] def vocabOverlapQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabOverlap(docs(s, dir), "lang", "text")
      .orderBy("group_a", "group_b")

  /** Chao1 vocabulary richness per language
    * ([[TextAnalysis.vocabularyRichness]]): is each language slice's
    * vocabulary saturated (chao1 ≈ observed types) or would more data
    * still grow it — the datasheet row mixture re-weighting reads.
    * Exact type/singleton/doubleton counts, mirrored double Chao1 and
    * Good–Turing coverage.
    */
  private[graft] def chao1RichnessQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabularyRichness(docs(s, dir), "lang", "text")
      .orderBy("lang")

  /** Yule's K / Herdan's C / GT-smoothed hapax value per language
    * ([[TextAnalysis.richnessPanel]]) — the size-invariant
    * repeat-structure scalars next to q258's unseen-mass row: K
    * compares slices of different volume directly (TTR can't), C is
    * the point estimate of q288's Heaps β, and c₁* is the SGT
    * discount LM smoothing consumes. All exact integers into one
    * mirrored expression each.
    */
  private[graft] def richnessPanelQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.richnessPanel(docs(s, dir), "lang", "text")
      .orderBy("lang")

  /** Zipf rank–frequency slope per language
    * ([[TextAnalysis.zipfFit]], top-100 tokens, total-order ranks,
    * nano-quantized ln points into exact OLS sums — the q288
    * discipline on the OTHER power law).
    */
  private[graft] def zipfFitQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfFit(docs(s, dir), "lang", "text", topK = 100)
      .orderBy("lang")

  private[graft] def goodTuringTableQ(
      s: SparkSession, dir: String): DataFrame =
    TextAnalysis.goodTuringTable(docs(s, dir), "lang", "text",
        maxC = 8, ngram = 2)
      .orderBy("lang", "c")

  /** Cronbach's α ([[Analytics.cronbachAlpha]]) over the q19 quality
    * score's own three components (volume, punctuation-cleanliness,
    * stopword-density) per language — the audit the composite owes
    * its consumers: does 0.5·vol + 0.25·clean + 0.25·stop average
    * ONE quality axis on this slice, or three unrelated signals?
    * Items micro-floored per doc; α is k/(k−1)·(1 − one division of
    * two exact integers) because the n(n−1) denominators cancel.
    */
  private[graft] def qualityReliabilityQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).where(col("text").isNotNull &&
      col("lang").isNotNull)
    val tokens = TextAnalysis.tokenCount(col("text")).cast("double")
    val vol = least(lit(1.0), tokens / 100.0)
    val punct = coalesce(TextAnalysis.punctRatio(col("text")),
      lit(0.0))
    val clean = lit(1.0) - least(lit(1.0), punct * 5.0)
    val stop = least(lit(1.0),
      coalesce(TextAnalysis.stopwordRatio(col("text")), lit(0.0)) *
        5.0)
    graft.operators.Analytics.cronbachAlpha(d, Seq("lang"), Seq(
        "vol" -> floor(vol * 1e6),
        "clean" -> floor(clean * 1e6),
        "stop" -> floor(stop * 1e6)))
      .orderBy("lang")
  }

  /** Corpus-level collocation mining: top-15 adjacent word bigrams.
    * One explode + one shuffle; the n-gram assembly stays in codegen.
    */
  private[graft] def topBigrams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(TextAnalysis.bigrams(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(15)

  /** Per-language token-budget selection: spend a 2000-token budget
    * per predicted language on the highest-quality documents
    * (rounded-quality order, id tie-break — the 4-decimal rounding is
    * the cross-engine-stable key q19 proves). Strict budget: the
    * first document that would overflow is excluded.
    */
  private[graft] def langTokenBudget(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def docChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkByTokens(docs(s, dir), "doc_id", "text",
        window = 64, overlap = 8)
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tokens").cast("long").as("n_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Distributed BPE merge-table training
    * ([[TextAnalysis.bpeTrainMerges]]): 8 byte-pair merges induced
    * from the documents corpus — per iteration one vocabulary-sized
    * pair-count aggregation, one argmax row to the driver, one pure
    * merge expression. The tokenizer-build artifact (step, lhs, rhs,
    * merged, pair_count).
    */
  private[graft] def bpeMergesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrainMerges(docs(s, dir), "text", merges = 8)
      .select(col("step"), col("lhs"), col("rhs"), col("merged"),
        col("pair_count"))
      .orderBy("step")

  /** Rare-token span detection ([[TextAnalysis.rareTokenSpans]]):
    * per document the 16-token window densest in corpus-rare tokens
    * (freq ≤ 2) — the garbage-span locator for base64 blobs and
    * mojibake runs that whole-document scores dilute. Integer window
    * counts keep the argmax bit-exact across engines.
    */
  private[graft] def rareTokenSpansQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rareTokenSpans(docs(s, dir), "doc_id", "text",
        window = 16, maxFreq = 2)
      .orderBy("doc_id")

  /** Bigram-LM quality ([[TextAnalysis.bigramLmScoreSelf]]): the
    * word-ORDER typicality signal above q124's unigram score —
    * Jelinek-Mercer λ=0.75 (dyadic: λ and 1−λ are exact binary
    * doubles, so the oracle's literals are bit-identical weights).
    */
  private[graft] def bigramLmQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScoreSelf(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"),
        round(col("bigram_lm_score"), 4).as("bigram_lm_score"))
      .orderBy("doc_id")

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
  private[graft] def bpeTokenCountsQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = TextAnalysis.bpeTrainMerges(d, "text", merges = 8)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextAnalysis.bpeTokenCountsFast(d, "doc_id", "text", m)
      .orderBy("doc_id")
  }

  /** Fused corpus-prep quality pass
    * ([[TextAnalysis.qualityPass]]): collapse-repeats cleanup,
    * Gopher-style repetition signals, and the self-trained unigram-LM
    * score in ONE scan of documents — the q133/q65/q124 trio fused
    * over shared tokenization (plan-spec-pinned to a single parquet
    * scan). Text ships as md5 (q133's convention).
    */
  private[graft] def fusedQualityPassQ(
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
  private[graft] def fusedQualityBigramQ(
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

  /** Gopher-style token-repetition signals per document (duplicate
    * and top bigram fractions) — the standard repetition filters a
    * pretraining pipeline runs next to [[TextAnalysis.qualityScore]].
    */
  private[graft] def repetitionSignals(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Vocabulary coverage curve for tokenizer-training prep: top-25
    * words with cumulative corpus-token coverage
    * ([[TextAnalysis.vocabCoverage]]).
    */
  private[graft] def vocabCoverageTop(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(docs(s, dir), "text", k = 25)
      .orderBy("rank")

  /** Compressibility quality signal gated in-query (the q46 pattern:
    * the oracle states the invariants as constants, so the compare
    * fails if the deflate path ever produces an out-of-bounds ratio or
    * loses the doubling-compresses property on ANY document).
    */
  private[graft] def compressQuality(s: SparkSession, dir: String): DataFrame = {
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

  /** Edit-distance fuzzy self-join over distinct part names —
    * symmetric-delete (SymSpell) signature blocking + exact
    * `levenshtein(_,_,threshold)` verify. The cross join never exists
    * in the plan (spec-asserted); candidates are an equi-join on
    * deletion signatures, complete by the symmetric-delete property,
    * so the result is identical to the nested-loop join the oracle
    * runs.
    */
  private[graft] def fuzzyPartNames(s: SparkSession, dir: String): DataFrame =
    Analytics.fuzzySelfJoin(t(s, dir, "part"), "p_name", maxDist = 2)
      .orderBy("value_a", "value_b")

  /** Exact heavy-hitter tokens (> 3.2% of corpus token mass) via the
    * two-phase Misra–Gries candidate + exact-verify operator — the
    * full `groupBy(token).count()` never runs; the sketch pass carries
    * ≤ k counters per partition and the verify groups only
    * candidate-matching rows.
    */
  private[graft] def heavyHitterTokens(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    Analytics.heavyHitters(
        docs(s, dir).select(
          explode(TextAnalysis.words(col("text"))).as("w")),
        "w", minFraction = 0.032)
      .orderBy("value")
  }

  /** Classifier evaluation over the language-ID heuristic: per-language
    * precision / recall / F1 against the metadata label — one
    * confusion-matrix aggregation (the q20 table) plus cell-sized
    * arithmetic; the evaluation-report shape any corpus-labeling model
    * needs.
    */
  private[graft] def langIdMetrics(s: SparkSession, dir: String): DataFrame = {
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

  /** Trained language classifier vs the marker heuristic
    * ([[graft.text.LangClassifier]]): one-vs-rest hard-sigmoid
    * logistic regression over hashed unigram+bigram presence features,
    * trained in-engine on the even-doc_id split with exact-integer
    * updates (3 epochs, 512 buckets, lr 0.01 — every weight
    * SQL-replayable), then scored on the odd split in the q98 shape
    * with the marker heuristic's correct count alongside. On this
    * corpus the labels carry little lexical signal, so the honest win
    * is calibration: the trained bias learns the class priors and
    * never wastes a prediction on "unknown", beating the
    * markers-or-bust heuristic on total correct.
    */
  private[graft] def langClassifierQ(
      s: SparkSession, dir: String): DataFrame = {
    import graft.text.LangClassifier
    val d = docs(s, dir)
    val trainDf = d.where(col("doc_id") % 2 === 0)
    val testDf = d.where(col("doc_id") % 2 === 1)
    val wts = LangClassifier.train(trainDf, "doc_id", "text", "lang",
        Seq("en", "de", "es", "fr", "zh"),
        numBuckets = 512, epochs = 3, lrMilli = 10)
      .transform(graft.core.CacheScope.disk)
    val pm = LangClassifier
      .predict(testDf, "doc_id", "text", wts, numBuckets = 512)
      .select(col("doc_id"), col("lang"), col("predicted"))
      .transform(graft.core.CacheScope.disk)
    val mk = TextAnalysis.langIdStaged(testDf, "text")
      .select(col("lang"), col("predicted").as("__marker"))
    val actual = pm.groupBy(col("lang").as("language"))
      .agg(count(lit(1)).as("n_actual"))
    val predicted = pm.groupBy(col("predicted").as("language"))
      .agg(count(lit(1)).as("n_predicted"))
    val correct = pm.where(col("lang") === col("predicted"))
      .groupBy(col("lang").as("language"))
      .agg(count(lit(1)).as("n_correct"))
    val markerCorrect = mk.where(col("lang") === col("__marker"))
      .groupBy(col("lang").as("language"))
      .agg(count(lit(1)).as("n_correct_marker"))
    val prec = col("n_correct").cast("double") /
      nullif(col("n_predicted").cast("double"), lit(0.0))
    val rec = col("n_correct").cast("double") /
      nullif(col("n_actual").cast("double"), lit(0.0))
    actual
      .join(predicted, Seq("language"), "full_outer")
      .join(correct, Seq("language"), "left")
      .join(markerCorrect, Seq("language"), "left")
      .select(col("language"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"),
        coalesce(col("n_correct_marker"), lit(0L))
          .as("n_correct_marker"))
      .withColumn("precision", round(prec, 6))
      .withColumn("recall", round(rec, 6))
      .orderBy("language")
  }

  /** Incremental model maintenance
    * ([[graft.text.LangClassifier.trainResume]]) proven against the
    * full retrain: q275's trainer run for 2 epochs, its weight table
    * stored, then ONE more epoch resumed from the table — and the
    * emitted weights must equal the 3-epoch oracle chain bit-for-bit
    * (each epoch is a pure function of the previous table, the
    * holtResume sequential-fold identity). The output here is the
    * RAW weight table, so this query also pins q275's training
    * arithmetic directly, not just through the scorecard.
    */
  private[graft] def langClassifierResumeQ(
      s: SparkSession, dir: String): DataFrame = {
    import graft.text.LangClassifier
    val trainDf = docs(s, dir).where(col("doc_id") % 2 === 0)
    val langs = Seq("en", "de", "es", "fr", "zh")
    val w2 = LangClassifier.train(trainDf, "doc_id", "text", "lang",
        langs, numBuckets = 512, epochs = 2, lrMilli = 10)
      .transform(graft.core.CacheScope.disk)
    LangClassifier.trainResume(trainDf, "doc_id", "text", "lang",
        langs, w2, numBuckets = 512, moreEpochs = 1, lrMilli = 10)
      .orderBy("lang", "bucket")
  }

  /** Most-characteristic keyword per document (argmax tf-idf via
    * `min_by` over a composite ordering struct — partial+final agg,
    * no per-document window sort) histogrammed over the corpus.
    */
  private[graft] def topKeywordHistogram(s: SparkSession, dir: String): DataFrame = {
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

  /** Logistic quality-classifier scoring — σ(w·x + b) over the fixed
    * declarative feature vector (log-tokens, punct ratio, stopword
    * ratio, mean word length): the "fastText-style quality filter"
    * stage as pure map-only column arithmetic in whole-stage codegen.
    */
  private[graft] def qualityModelScores(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def adaptiveQualityFloorByLang(
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

  /** Top-3 TF-IDF terms for the first five documents (ranked on the
    * ROUNDED score with token tie-break so both engines agree on
    * borderline ordering); document frequencies come from the FULL
    * corpus, only the ranked output is filtered.
    */
  private[graft] def topTfidfTerms(s: SparkSession, dir: String): DataFrame = {
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

  /** Unigram-LM quality scoring ([[TextAnalysis.unigramLmScoreSelf]]):
    * Lidstone-smoothed token log-probabilities trained on the corpus,
    * documents ranked by mean token log-prob — the CCNet-style
    * distributional-typicality signal (its KenLM perplexity, in
    * dependency-free unigram form). Low scorers are the
    * out-of-distribution tail a quality floor cuts.
    */
  private[graft] def unigramLmQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLmScoreSelf(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("lm_score"), 4).as("lm_score"))
      .orderBy("doc_id")

  /** Intra-document stutter cleanup ([[TextAnalysis.collapseRepeats]]):
    * consecutive repeated tokens collapse to one; the oracle mirrors
    * the keep-predicate with DuckDB's indexed list_filter lambda.
    */
  private[graft] def collapseRepeatRuns(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collapseRepeats(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")

  /** DSIR importance-weighted selection
    * ([[TextAnalysis.dsirSelect]]): hashed-unigram log-likelihood
    * ratios against the English slice as target, then the
    * highest-scoring documents up to a 10k-token budget — the
    * published domain-tilt selection (Xie et al. 2023) as a
    * deterministic top-k. Scores are integer micro-units (exact
    * BIGINT sums), the budget cut is the histogram-pruned
    * [[graft.sampling.Packing.takeUntilBudget]].
    */
  private[graft] def dsirSelectionQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirSelect(docs(s, dir), "doc_id", "text",
        col("lang") === "en", tokenBudget = 10000L)
      .orderBy("doc_id")

  /** Mojibake quarantine screen ([[TextAnalysis.mojibakeReport]])
    * over a deterministically corruption-perturbed corpus (the q162
    * treatment — the synthetic corpus is clean UTF-8, so docs at
    * doc_id ≡ 0 mod 7 get one replacement char, one double-decode
    * bigram ("Ã©") and one C1 control appended, and the report must
    * count exactly those): per source, artifact totals and the
    * affected-document fraction.
    */
  private[graft] def mojibakeReportQ(
      s: SparkSession, dir: String): DataFrame = {
    val seeded = docs(s, dir).withColumn("text",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"),
          lit(" x\uFFFD \u00C3\u00A9 a\u0085b")))
        .otherwise(col("text")))
    TextAnalysis.mojibakeReport(seeded, "text", Seq("source"))
      .select(col("source"), col("n_docs"), col("repl_chars"),
        col("c1_chars"), col("double_enc"), col("n_flagged"),
        round(col("flagged_frac"), 6).as("flagged_frac"))
      .orderBy("source")
  }

  /** PII incidence report ([[TextAnalysis.piiIncidence]]) over a
    * deterministically PII-perturbed corpus (the q144 treatment —
    * synthetic tables carry no real PII, so docs at doc_id ≡ 0 mod
    * {7, 11, 13} get an email / SSN / phone appended and the report
    * must locate exactly those): per (source, pii_type) the affected
    * documents, total matches, and affected fraction.
    */
  private[graft] def piiIncidenceQ(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def tokenizerFertilityQ(
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

  private[graft] def unicodeNfcQ(
      s: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("text"), lit("\u0301"))
    docs(s, dir)
      .select(col("lang"), raw.as("__raw"),
        call_function("graft_normalize", raw, lit("NFC")).as("__n"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(length(col("__n")) < length(col("__raw")), 1L)
          .otherwise(0L)).as("n_composed"),
        sum(length(col("__raw")).cast("long")).as("chars_raw"),
        sum(length(col("__n")).cast("long")).as("chars_nfc"))
      .orderBy("lang")
  }

  /** Sharded Misra–Gries heavy hitters over the token stream: ≤ 255
    * bounded counters per source shard, one PODS-2012 merge, then the
    * exact verify pass — so the sketch's order-dependent counters
    * never reach the output (see
    * [[graft.quality.HeavyHitters]]'s determinism contract), and the
    * oracle is plain GROUP BY SQL. minFraction 0.005 ≥ 1/(k+1) =
    * 1/256 keeps the retention bound sound (enforced).
    */
  private[graft] def mgHeavyHittersQ(
      s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("source"),
        explode(TextAnalysis.words(col("text"))).as("token"))
      .transform(graft.core.CacheScope.disk)
    val shards = graft.quality.HeavyHitters
      .mgShards(toks, col("token"), col("source"), k = 255)
    val merged = graft.quality.HeavyHitters
      .mergeMgShards(shards, k = 255)
    graft.quality.HeavyHitters
      .verifyHeavyHitters(toks, "token", merged,
        minFraction = 0.005, k = 255)
      .orderBy(col("cnt").desc, col("token"))
  }

  private[graft] def cmsTokenCountsQ(
      s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("token"))
      .transform(graft.core.CacheScope.disk)
    val merged = graft.quality.CountMin.mergeCmsShards(
      graft.quality.CountMin.cmsShards(
        toks, col("token"), col("doc_id") % 4, depth = 4, width = 512))
    val truth = toks.groupBy("token")
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("token").asc).limit(15)
    graft.quality.CountMin.cmsEstimate(
        merged, truth.select("token"), "token", depth = 4, width = 512)
      .join(truth, Seq("token"))
      .select(col("token"), col("true_cnt"),
        col("est").as("est_cnt"),
        (col("est") === col("true_cnt")).cast("int").as("exact"))
      .orderBy(col("true_cnt").desc, col("token").asc)
  }

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
  private[graft] def oracleBpeStep(i: Int): String = {
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

  private[graft] val oracleLangScores: String = "WITH " + oracleLangCtes("documents")

  /** q275 oracle: full replay of the hard-sigmoid logistic trainer
    * ([[graft.text.LangClassifier]]) — the GD epochs unroll as
    * generated CTE blocks (the q216 btRound pattern). Every quantity
    * is exact: features are md5-hashed presence buckets, σ in
    * nano-units is clamp(5·10⁸ + ⌊z/4⌋, 0, 10⁹) with the /4 exact in
    * doubles, the weight step replays Scala's floorDiv via the
    * shifted-nonnegative integer division (g·lr + OFF·D) // D − OFF.
    */
  private[graft] def oracleLangClfSql: String =
    oracleLangClf(oracleLangClfPredictAndScore)

  /** q279's oracle: the SAME trained weight table, emitted directly —
    * resume(2 epochs, +1) must equal the 3-epoch chain bit-for-bit.
    */
  private[graft] def oracleLangClfResumeSql: String = oracleLangClf(
    """
         SELECT l AS lang, b AS bucket, w AS w_nano FROM w3
         ORDER BY lang, bucket""")

  private[graft] def oracleLangClf(finish: String): String = {
    val B = 512
    val lr = 10L
    val off = 1000000L * lr
    def epoch(i: Int): String =
      s"""z$i AS (
           SELECT f.doc_id, w.l, CAST(sum(w.w) AS BIGINT) AS z
           FROM feat f JOIN w${i - 1} w ON f.b = w.b GROUP BY 1, 2),
         d$i AS (
           SELECT lab.doc_id, langs.l,
             CAST(CASE WHEN lab.lang = langs.l
                 THEN 1000000000 ELSE 0 END
               - least(1000000000, greatest(0, 500000000 +
                 CAST(floor(CAST(coalesce(z.z, 0) AS DOUBLE) / 4.0)
                   AS BIGINT))) AS BIGINT) AS d
           FROM lab CROSS JOIN langs
           LEFT JOIN z$i z ON z.doc_id = lab.doc_id
             AND z.l = langs.l),
         g$i AS (
           SELECT d.l, f.b, CAST(sum(d.d) AS BIGINT) AS g
           FROM feat f JOIN d$i d ON f.doc_id = d.doc_id
           GROUP BY 1, 2),
         w$i AS (
           SELECT w.l, w.b,
             CAST(w.w + (g.g * $lr + $off * (1000 * nn.n))
               // (1000 * nn.n) - $off AS BIGINT) AS w
           FROM w${i - 1} w JOIN g$i g ON w.l = g.l AND w.b = g.b,
             nn)"""
    s"""WITH tok AS (
           SELECT doc_id, lang, doc_id % 2 = 0 AS tr, $oracleWords AS ws
           FROM documents),
         grams AS (
           SELECT doc_id, tr, unnest(list_concat(ws,
             [ws[i] || ' ' || ws[i + 1]
               FOR i IN generate_series(1, len(ws) - 1)])) AS g
           FROM tok),
         fb AS (
           SELECT DISTINCT doc_id, tr,
             CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % $B AS b
           FROM grams
           UNION SELECT DISTINCT doc_id, tr, -1 FROM tok),
         feat AS (SELECT doc_id, b FROM fb WHERE tr),
         featT AS (SELECT doc_id, b FROM fb WHERE NOT tr),
         lab AS (SELECT doc_id, lang FROM documents
                 WHERE doc_id % 2 = 0),
         langs(l) AS (VALUES ('en'), ('de'), ('es'), ('fr'), ('zh')),
         nn AS (SELECT count(*) AS n FROM lab),
         w0 AS (
           SELECT langs.l, db.b, CAST(0 AS BIGINT) AS w
           FROM langs, (SELECT DISTINCT b FROM feat) db),
         ${(1 to 3).map(epoch).mkString(",\n         ")}$finish"""
  }

  private[graft] def oracleLangClfPredictAndScore: String =
    s""",
         oddd AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
         zt AS (
           SELECT f.doc_id, w.l, CAST(sum(w.w) AS BIGINT) AS z
           FROM featT f JOIN w3 w ON f.b = w.b GROUP BY 1, 2),
         ntok AS (SELECT doc_id, len(ws) AS nt FROM tok WHERE NOT tr),
         ranked AS (
           SELECT o.doc_id, o.lang, langs.l, nt,
             row_number() OVER (PARTITION BY o.doc_id
               ORDER BY coalesce(z.z, 0) DESC,
                 CASE langs.l WHEN 'zh' THEN 5 WHEN 'en' THEN 4
                   WHEN 'de' THEN 3 WHEN 'es' THEN 2 ELSE 1 END DESC)
               AS rn
           FROM oddd o CROSS JOIN langs
           JOIN ntok USING (doc_id)
           LEFT JOIN zt z ON z.doc_id = o.doc_id AND z.l = langs.l),
         mp AS (
           SELECT doc_id, lang,
             CASE WHEN nt = 0 THEN 'unknown' ELSE l END AS predicted
           FROM ranked WHERE rn = 1),
         ${oracleLangCtes("oddd")},
         mk AS (SELECT lang, predicted AS marker FROM p),
         act AS (SELECT lang AS language, count(*) AS n_actual
                 FROM oddd GROUP BY 1),
         prd AS (SELECT predicted AS language, count(*) AS n_predicted
                 FROM mp GROUP BY 1),
         cor AS (SELECT lang AS language, count(*) AS n_correct
                 FROM mp WHERE lang = predicted GROUP BY 1),
         mc AS (SELECT lang AS language, count(*) AS n_correct_marker
                 FROM mk WHERE lang = marker GROUP BY 1),
         j AS (
           SELECT coalesce(act.language, prd.language) AS language,
             coalesce(n_actual, 0) AS n_actual,
             coalesce(n_predicted, 0) AS n_predicted,
             coalesce(n_correct, 0) AS n_correct,
             coalesce(n_correct_marker, 0) AS n_correct_marker
           FROM act FULL OUTER JOIN prd USING (language)
           LEFT JOIN cor USING (language)
           LEFT JOIN mc USING (language))
         SELECT language, n_actual, n_predicted, n_correct,
           n_correct_marker,
           round(CAST(n_correct AS DOUBLE)
             / nullif(CAST(n_predicted AS DOUBLE), 0.0), 6)
             AS precision,
           round(CAST(n_correct AS DOUBLE)
             / nullif(CAST(n_actual AS DOUBLE), 0.0), 6) AS recall
         FROM j ORDER BY language"""

  /** Unigram-LM trainer ([[graft.text.UnigramLm.train]]): 2 hard-EM
    * rounds over the corpus's distinct-word table, 60-piece vocabulary
    * (pieces ≤ 3 chars, words ≤ 16, seed minCount 5) — the
    * SentencePiece-style top-down sibling of q142's bottom-up BPE.
    * Counts, micro-unit masses, and ranks are all integer-exact (the
    * lexicographic fewest-pieces/most-mass objective; see the
    * operator's scaladoc), so the oracle unrolls both EM rounds and
    * matches bit-for-bit.
    */
  private[graft] def unigramLmTrainQ(
      s: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLm.train(docs(s, dir), "text", vocabSize = 60,
        iters = 2, maxPieceLen = 3, maxWordLen = 16, minCount = 5)
      .orderBy("rank")

  /** Tokenizer-fertility comparison, unigram-LM vs BPE (extends q163):
    * per language, tokens-per-word under the q225 trained unigram
    * vocabulary (production `mapPartitions` apply, unk-char fallback)
    * side by side with the q142 8-merge BPE apply — the head-to-head a
    * vocabulary-budget decision actually needs. Both token counts are
    * exact longs; fertilities are unrounded exact divisions.
    */
  private[graft] def unigramFertilityQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val vocab = graft.text.UnigramLm.train(d, "text", vocabSize = 60,
        iters = 2, maxPieceLen = 3, maxWordLen = 16, minCount = 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val uni = graft.text.UnigramLm.tokenCounts(d, "doc_id", "text",
      vocab, maxPieceLen = 3, maxWordLen = 16)
    val m = TextAnalysis.bpeTrainMerges(d, "text", merges = 8)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val bpe = TextAnalysis.bpeTokenCountsFast(d, "doc_id", "text", m)
      .select(col("doc_id"), col("n_tokens_bpe"))
    uni.join(bpe, Seq("doc_id"))
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang")
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_tokens_uni")).as("n_tokens_uni"),
        sum(col("n_tokens_bpe")).as("n_tokens_bpe"))
      .select(col("lang"), col("n_words"), col("n_tokens_uni"),
        col("n_tokens_bpe"),
        (col("n_tokens_uni").cast("double") / col("n_words"))
          .as("fertility_uni"),
        (col("n_tokens_bpe").cast("double") / col("n_words"))
          .as("fertility_bpe"))
      .orderBy("lang")
  }

  /** One unrolled hard-EM round of the unigram-LM oracle: micro-unit
    * scores from v{t}, per-word Viterbi DP as a recursive CTE whose
    * state is the word's dp-prefix LIST, the per-position argmin
    * table (score asc, split j asc — the engine's tie-break), the
    * backwalk recursion over it, and the usage recount into v{t+1}
    * (single chars coalesced back at count 0 — the coverage rule).
    * 2^40 = 1099511627776 is the packed per-piece cost.
    */
  private[graft] def oracleUnigramRound(t: Int): String =
    s"""q$t AS MATERIALIZED (
         SELECT piece, (cnt * 1000000) //
           CAST((SELECT sum(cnt) FROM v$t) AS BIGINT) AS q FROM v$t),
       c$t AS MATERIALIZED (
         SELECT c.w, c.j, c.i, q.q FROM ucand c JOIN q$t q USING (piece)),
       cl$t AS MATERIALIZED (
         SELECT w, i, list(struct_pack(j := j, q := q)) AS cs
         FROM c$t GROUP BY w, i),
       dp$t AS (
         SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS dps FROM uwf
         UNION ALL
         -- per-position candidate LISTS + a lambda fold instead of a
         -- correlated subquery: DuckDB 1.0 silently NULLs a correlated
         -- subquery over a MATERIALIZED CTE inside recursion (bisected
         -- round 14); plain joins against materialized CTEs are fine
         SELECT d.w, d.i + 1,
           list_append(d.dps, list_min(list_transform(cl.cs,
             x -> d.dps[x.j + 1] + 1099511627776 - x.q)))
         FROM dp$t d JOIN cl$t cl ON cl.w = d.w AND cl.i = d.i + 1),
       dpf$t AS MATERIALIZED (
         SELECT d.w, d.dps FROM dp$t d JOIN uwf USING (w)
         WHERE d.i = length(uwf.w)),
       bj$t AS MATERIALIZED (
         SELECT w, i, j FROM (
           SELECT c.w, c.i, c.j,
             row_number() OVER (PARTITION BY c.w, c.i
               ORDER BY f.dps[c.j + 1] + 1099511627776 - c.q ASC,
                 c.j ASC) AS rn
           FROM c$t c JOIN dpf$t f USING (w)) z WHERE rn = 1),
       bw$t AS (
         SELECT w, length(w) AS pos, CAST([] AS VARCHAR[]) AS ps
         FROM uwf
         UNION ALL
         SELECT b.w, bj.j,
           list_append(b.ps, substring(b.w, bj.j + 1, b.pos - bj.j))
         FROM bw$t b JOIN bj$t bj ON bj.w = b.w AND bj.i = b.pos
         WHERE b.pos > 0),
       cnt${t + 1} AS (
         SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
           SELECT uwf.freq, unnest(s.ps) AS piece
           FROM (SELECT w, ps FROM bw$t WHERE pos = 0) s
           JOIN uwf USING (w)) z
         GROUP BY piece),
       v${t + 1} AS MATERIALIZED (
         SELECT coalesce(c.piece, s.piece) AS piece,
           coalesce(c.cnt, 0) AS cnt
         FROM cnt${t + 1} c FULL JOIN (
           SELECT piece FROM v0 WHERE length(piece) = 1) s
           ON s.piece = c.piece)"""

  /** The shared head of the unigram oracles: distinct words (≤ 16
    * chars), the (j, i) candidate lattice (pieces ≤ 3 chars), and the
    * minCount-5 seed vocabulary with unconditional single chars.
    */
  private[graft] val oracleUnigramHead: String =
    s"""uwf AS MATERIALIZED (
         SELECT w, count(*) AS freq FROM (
           SELECT unnest($oracleWords) AS w FROM documents) z
         WHERE length(w) <= 16 GROUP BY w),
       ucand AS MATERIALIZED (
         SELECT w, freq, j, i, substring(w, j + 1, i - j) AS piece
         FROM uwf,
           LATERAL (SELECT unnest(generate_series(0, length(w) - 1))
             AS j) tj,
           LATERAL (SELECT unnest(generate_series(j + 1,
             least(length(w), j + 3))) AS i) ti),
       useed AS (
         SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM ucand
         GROUP BY piece),
       v0 AS MATERIALIZED (
         SELECT piece, cnt FROM useed
         WHERE length(piece) = 1 OR cnt >= 5)"""
}
