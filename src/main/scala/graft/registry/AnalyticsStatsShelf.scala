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

/** OLAP / event / statistics queries over the TPC-H-ish tables — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Split from the original
  * single-file registry; member bodies are unchanged.
  */
/** Statistics shelf — rank/correlation tests, concentration and
  * robust-outlier reports, richness/agreement panels, plus their
  * DuckDB oracles. Split from AnalyticsRegistry (round 14); the
  * experimentation / model-evaluation / causal family moved on to
  * [[AnalyticsInferenceShelf]] (round 16 third wave). Member bodies
  * are unchanged — this trait is mixed back into the same object, so
  * every reference resolves exactly as before.
  */
private[graft] trait AnalyticsStatsShelf extends AnalyticsCore {

  private[graft] def statsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_robust_outliers" -> (robustOutliersQ _),
    "q186_jackknife_ratio" -> (jackknifeRatioQ _),
    "q187_l_diversity" -> (lDiversityQ _),
    "q189_benford_audit" -> (benfordAuditQ _),
    "q190_spend_concentration" -> (spendConcentrationQ _),
    "q191_kaplan_meier" -> (kaplanMeierQ _),
    "q364_rmst" -> (rmstQ _),
    "q198_segment_priority_assoc" -> (segmentPriorityAssocQ _),
    "q208_bootstrap_ci" -> (bootstrapCiQ _),
    "q211_conversion_delay" -> (conversionDelayQ _),
    "q216_brand_bradley_terry" -> (brandBtQ _),
    "q219_kmv_overlap" -> (kmvOverlapQ _),
    "q232_wilson_rates" -> (wilsonRatesQ _),
    "q233_eb_shrinkage" -> (ebShrinkageQ _),
    "q238_qty_price_spearman" -> (spearmanQ _),
    "q249_conformal_coverage" -> (conformalQ _),
    "q250_theil_decomposition" -> (theilQ _),
    "q255_gini_segments" -> (giniQ _),
    "q257_qty_price_kendall" -> (kendallQ _),
    "q260_segment_fdr_screen" -> (segmentFdrQ _),
    "q287_cochran_armitage" -> (cochranArmitageQ _),
    "q291_kruskal_wallis" -> (kruskalWallisQ _),
    "q300_dunn_posthoc" -> (dunnPosthocQ _),
    "q306_friedman_test" -> (friedmanQ _),
    "q367_kendall_w" -> (kendallWQ _),
    "q310_assoc_panel" -> (assocPanelQ _),
    "q316_nelson_aalen" -> (nelsonAalenQ _),
    "q319_jonckheere" -> (jonckheereQ _),
    "q373_quantile_reg" -> (quantileRegQ _),
    "q374_hill_tail" -> (hillTailQ _),
    "q382_quantile_norm" -> (quantileNormQ _),
  )

  /** The engine's pinned Bonferroni z critical values as a DuckDB
    * CASE over m — interpolating [[Analytics.zBonf05]] guarantees
    * bit-identical double literals.
    */
  private[graft] val zBonfCaseSql: String =
    "CASE m " + graft.operators.Analytics.zBonf05
      .map { case (m, v) => s"WHEN $m THEN $v" }.mkString(" ") + " END"

  /** The engine's pinned χ²₀.₀₅ critical values as a DuckDB CASE over
    * dof — interpolating [[Analytics.chi2Crit05]] guarantees the
    * oracle consumes bit-identical double literals.
    */
  private[graft] val chi2CritCaseSql: String =
    "CASE dof " + graft.operators.Analytics.chi2Crit05
      .map { case (d, v) => s"WHEN $d THEN $v" }.mkString(" ") + " END"

  private[graft] def statsOracleSql: Map[String, String] = Map(
    // exact integer quantile transform: within-group rank r of n_g
    // maps to the pooled order statistic at ⌈r·N/n_g⌉ — all ranks
    // total orders (value, key), all arithmetic BIGINT
    "q382_quantile_norm" ->
      """WITH b AS (
           SELECT o_orderkey AS k, c_mktsegment AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE o_totalprice IS NOT NULL
             AND c_mktsegment IS NOT NULL),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY g
             ORDER BY v, k) AS BIGINT) AS rr
           FROM b),
         s AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
               FROM b GROUP BY 1),
         t AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM b),
         p AS (
           SELECT CAST(row_number() OVER (ORDER BY v, k) AS BIGINT)
             AS pos, v AS pv
           FROM b)
         SELECT r.k AS o_orderkey, r.g AS c_mktsegment,
           r.v AS value, p.pv AS mapped
         FROM r JOIN s USING (g) CROSS JOIN t
         JOIN p ON p.pos = (r.rr * t.nt + s.ng - 1) // s.ng
         ORDER BY o_orderkey""",
    // residuals y·1e6 − b·x are exact BIGINTs (and strictly positive
    // at this data — min price cents·1e6 dominates |slope|·max days —
    // so // == div everywhere); intercept = the ⌈τn⌉-th smallest
    // residual; loss decomposes into exact conditional HUGEINT sums
    "q373_quantile_reg" -> {
      val slopes = (-5 to 5).map(i => (i * 1000000L).toString)
        .mkString(", ")
      s"""WITH r AS (
           SELECT date_diff('day', DATE '1992-01-01',
               CAST(o_orderdate AS DATE)) AS x,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS y
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
         g AS (SELECT CAST(unnest([$slopes]) AS BIGINT) AS slope_micro),
         res AS (
           SELECT slope_micro, y * 1000000 - slope_micro * x AS rr
           FROM r CROSS JOIN g),
         rk AS (
           SELECT slope_micro, rr,
             row_number() OVER (PARTITION BY slope_micro ORDER BY rr)
               AS rk
           FROM res),
         n1 AS (SELECT slope_micro, CAST(count(*) AS BIGINT) AS n
                FROM res GROUP BY 1),
         t AS (SELECT CAST(unnest([10, 50, 90]) AS INT) AS tau_pct),
         k AS (
           SELECT slope_micro, n, tau_pct,
             (tau_pct * n + 99) // 100 AS kk
           FROM n1 CROSS JOIN t),
         a AS (
           SELECT k.slope_micro, k.tau_pct, k.n, rk.rr AS aa
           FROM k JOIN rk ON rk.slope_micro = k.slope_micro
             AND rk.rk = k.kk),
         l AS (
           SELECT res.slope_micro, a.tau_pct, a.n, a.aa,
             sum(CAST(res.rr AS HUGEINT)) AS s,
             sum(CASE WHEN res.rr < a.aa THEN CAST(res.rr AS HUGEINT)
               ELSE 0 END) AS sl,
             sum(CASE WHEN res.rr < a.aa THEN 1 ELSE 0 END) AS nl
           FROM res JOIN a ON a.slope_micro = res.slope_micro
           GROUP BY 1, 2, 3, 4),
         loss AS (
           SELECT tau_pct, n, slope_micro, aa,
             CAST(tau_pct AS HUGEINT) * (s - CAST(n AS HUGEINT) * aa)
               - 100 * (sl - CAST(nl AS HUGEINT) * aa) AS loss
           FROM l),
         best AS (
           SELECT tau_pct, n, slope_micro, aa, loss,
             row_number() OVER (PARTITION BY tau_pct
               ORDER BY loss, slope_micro) AS pick
           FROM loss)
         SELECT tau_pct, n, slope_micro,
           aa // 1000000 AS intercept_cents,
           round(CAST(loss AS DOUBLE)
             / (CAST(n AS DOUBLE) * 100000000.0), 6) AS avg_loss
         FROM best WHERE pick = 1 ORDER BY tau_pct"""
    },
    // one nano-floored ln per order statistic; the excess sum is
    // non-negative by construction (top-m values ≥ the threshold), so
    // // == div
    "q374_hill_tail" ->
      """WITH b AS (
           SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x,
             o_orderkey AS tb
           FROM orders
           WHERE o_orderpriority IS NOT NULL
             AND o_totalprice IS NOT NULL
             AND CAST(floor(o_totalprice * 100) AS BIGINT) > 0),
         rk AS (
           SELECT g, x,
             CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000000.0)
               AS BIGINT) AS lnq,
             row_number() OVER (PARTITION BY g
               ORDER BY x DESC, tb ASC) AS rk
           FROM b),
         cn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b
                GROUP BY 1 HAVING count(*) >= 2),
         cm AS (SELECT g, n, least(100, n - 1) AS m_used FROM cn),
         agg AS (
           SELECT rk.g, cm.n, cm.m_used,
             CAST(sum(CASE WHEN rk <= m_used THEN lnq ELSE 0 END)
               AS BIGINT) AS s,
             max(CASE WHEN rk = m_used + 1 THEN x END) AS x_tail,
             max(CASE WHEN rk = m_used + 1 THEN lnq END) AS lnk
           FROM rk JOIN cm ON cm.g = rk.g
           WHERE rk <= m_used + 1
           GROUP BY 1, 2, 3)
         SELECT g AS o_orderpriority, n, m_used, x_tail,
           (s - m_used * lnk) // m_used AS hill_nano,
           round(CASE WHEN (s - m_used * lnk) // m_used > 0
             THEN 1000000000.0
               / CAST((s - m_used * lnk) // m_used AS DOUBLE)
             END, 6) AS alpha
         FROM agg ORDER BY o_orderpriority""",
    // the q291 rank machinery carried to pairwise mean-rank z's;
    // the Bonferroni critical keyed by the group's own m
    "q300_dunn_posthoc" ->
      s"""WITH b AS (
           SELECT c_mktsegment AS g, o_orderpriority AS cat,
             CASE WHEN c_mktsegment = 'MACHINERY'
               THEN CAST(floor(o_totalprice * 100 * (1.0 +
                 CAST(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                   AS DOUBLE) * 0.05)) AS BIGINT)
               ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
               END AS v
           FROM orders JOIN customer ON o_custkey = c_custkey),
         cells AS (
           SELECT g, cat, v, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2, 3),
         perv AS (
           SELECT g, v, CAST(sum(c) AS BIGINT) AS tv
           FROM cells GROUP BY 1, 2),
         rk AS (
           SELECT g, v, tv,
             coalesce(sum(tv) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bef
           FROM perv),
         r2 AS (SELECT g, v, 2 * bef + tv + 1 AS rank2 FROM rk),
         pc AS (
           SELECT cells.g, cat, CAST(sum(c) AS BIGINT) AS ni,
             sum(CAST(c AS HUGEINT) * rank2) AS rr
           FROM cells JOIN r2 ON r2.g = cells.g AND r2.v = cells.v
           GROUP BY 1, 2),
         gt AS (
           SELECT g, CAST(sum(tv) AS BIGINT) AS n,
             sum(CAST(tv AS HUGEINT) * tv * tv - tv) AS ties
           FROM perv GROUP BY g),
         gk AS (SELECT g, CAST(count(*) AS BIGINT) AS k
           FROM pc GROUP BY g),
         prs AS (
           SELECT a.g, a.cat AS cat_a, b2.cat AS cat_b,
             a.ni AS n_a, b2.ni AS n_b, a.rr AS r2a, b2.rr AS r2b
           FROM pc a JOIN pc b2 ON b2.g = a.g AND a.cat < b2.cat),
         zz AS (
           SELECT prs.g, cat_a, cat_b, n_a, n_b,
             CASE WHEN n < 2 OR (CAST(n AS DOUBLE)
                 * (CAST(n AS DOUBLE) + 1.0)
                 - CAST(ties AS DOUBLE)
                   / (CAST(n AS DOUBLE) - 1.0)) / 12.0 <= 0.0
               THEN NULL
               ELSE (CAST(r2a AS DOUBLE) / 2.0 / CAST(n_a AS DOUBLE)
                 - CAST(r2b AS DOUBLE) / 2.0 / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE)
                     * (CAST(n AS DOUBLE) + 1.0)
                   - CAST(ties AS DOUBLE)
                     / (CAST(n AS DOUBLE) - 1.0)) / 12.0
                   * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE))) END AS z,
             CAST(k * (k - 1) // 2 AS BIGINT) AS m
           FROM prs
           JOIN gt ON gt.g = prs.g
           JOIN gk ON gk.g = prs.g)
         SELECT g AS c_mktsegment, cat_a, cat_b, n_a, n_b,
           round(z, 6) AS z,
           CAST(coalesce(abs(z) > $zBonfCaseSql, FALSE) AS INT)
             AS significant
         FROM zz ORDER BY c_mktsegment, cat_a, cat_b""",
    // pooled tie-averaged rank2 off the (g, v) totals window;
    // per-category χ² terms µ-floored into HUGEINT before the
    // order-free sum; tie-corrected H'; dof-keyed pinned critical
    "q291_kruskal_wallis" ->
      s"""WITH b AS (
           SELECT c_mktsegment AS g, o_orderpriority AS cat,
             CASE WHEN c_mktsegment = 'MACHINERY'
               THEN CAST(floor(o_totalprice * 100 * (1.0 +
                 CAST(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                   AS DOUBLE) * 0.05)) AS BIGINT)
               ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
               END AS v
           FROM orders JOIN customer ON o_custkey = c_custkey),
         cells AS (
           SELECT g, cat, v, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2, 3),
         perv AS (
           SELECT g, v, CAST(sum(c) AS BIGINT) AS tv
           FROM cells GROUP BY 1, 2),
         rk AS (
           SELECT g, v, tv,
             coalesce(sum(tv) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bef
           FROM perv),
         r2 AS (SELECT g, v, 2 * bef + tv + 1 AS rank2 FROM rk),
         pc AS (
           SELECT cells.g, cat, CAST(sum(c) AS BIGINT) AS ni,
             sum(CAST(c AS HUGEINT) * rank2) AS rr
           FROM cells JOIN r2 ON r2.g = cells.g AND r2.v = cells.v
           GROUP BY 1, 2),
         terms AS (
           SELECT g, ni,
             CAST(floor(CAST(rr AS DOUBLE) * CAST(rr AS DOUBLE)
               / CAST(ni AS DOUBLE) * 1000000.0) AS HUGEINT) AS term
           FROM pc),
         s AS (
           SELECT g, CAST(sum(ni) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cats,
             sum(term) AS terms
           FROM terms GROUP BY g),
         tt AS (
           SELECT g, sum(CAST(tv AS HUGEINT) * tv * tv - tv) AS ties
           FROM perv GROUP BY g),
         f AS (
           SELECT s.g, n, n_cats, CAST(n_cats - 1 AS INT) AS dof,
             CASE WHEN n < 2 OR n_cats < 2 THEN NULL
               ELSE 3.0 * (CAST(terms AS DOUBLE) / 1000000.0)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                 - 3.0 * (CAST(n AS DOUBLE) + 1.0) END AS h,
             1.0 - CAST(ties AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr
           FROM s JOIN tt ON tt.g = s.g),
         ff AS (
           SELECT g, n, n_cats, dof, h,
             CASE WHEN h IS NULL OR corr <= 0.0 THEN NULL
               ELSE h / corr END AS h_adj
           FROM f)
         SELECT g AS c_mktsegment, n, n_cats, dof, round(h, 6) AS h,
           round(h_adj, 6) AS h_adj,
           CAST(coalesce(h_adj > $chi2CritCaseSql, FALSE) AS INT)
             AS differs
         FROM ff ORDER BY c_mktsegment""",
    // one long-frame scan; full-grid χ² (zero cells contribute E),
    // MI/entropy terms nano-floored before order-free integer sums;
    // one mirrored double expression per statistic
    "q310_assoc_panel" ->
      """WITH base AS (
           SELECT pair, x, y FROM (
             SELECT event_type,
               CAST(CAST(dayofweek(ts) AS INT) + 1 AS VARCHAR) AS dw,
               CASE WHEN (CASE WHEN event_type = 'purchase'
                   THEN value * 2.2 ELSE value END) < 25
                 THEN 'low'
                 WHEN (CASE WHEN event_type = 'purchase'
                   THEN value * 2.2 ELSE value END) < 50
                 THEN 'mid' ELSE 'high' END AS bucket
             FROM events
             WHERE value IS NOT NULL AND event_type IS NOT NULL
               AND ts IS NOT NULL) t,
           LATERAL (VALUES ('type_x_dow', event_type, dw),
             ('type_x_bucket', event_type, bucket)) v(pair, x, y)),
         cells AS (
           SELECT pair, x, y, CAST(count(*) AS BIGINT) AS o
           FROM base GROUP BY 1, 2, 3),
         rx AS (SELECT pair, x, CAST(sum(o) AS BIGINT) AS ra
           FROM cells GROUP BY 1, 2),
         cy AS (SELECT pair, y, CAST(sum(o) AS BIGINT) AS cb
           FROM cells GROUP BY 1, 2),
         nt AS (SELECT pair, CAST(sum(o) AS BIGINT) AS n
           FROM cells GROUP BY 1),
         lv AS (
           SELECT pair, CAST(count(DISTINCT x) AS BIGINT) AS lx,
             CAST(count(DISTINCT y) AS BIGINT) AS ly
           FROM cells GROUP BY 1),
         grid AS (
           SELECT rx.pair, ra, cb, n, coalesce(o, 0) AS o
           FROM rx JOIN cy ON cy.pair = rx.pair
           JOIN nt ON nt.pair = rx.pair
           LEFT JOIN cells ON cells.pair = rx.pair
             AND cells.x = rx.x AND cells.y = cy.y),
         chi AS (
           SELECT pair, sum(CAST(floor(
             (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)
               * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE)
               * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
               / CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT))
             AS chi2m
           FROM grid GROUP BY pair),
         mi AS (
           SELECT c.pair, sum(CAST(floor(
             CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
             * ln(CAST(CAST(o AS HUGEINT) * n AS DOUBLE)
               / CAST(CAST(ra AS HUGEINT) * cb AS DOUBLE))
             * 1000000000.0) AS HUGEINT)) AS mim
           FROM cells c
           JOIN rx ON rx.pair = c.pair AND rx.x = c.x
           JOIN cy ON cy.pair = c.pair AND cy.y = c.y
           JOIN nt ON nt.pair = c.pair
           GROUP BY c.pair),
         hx AS (
           SELECT rx.pair, -sum(CAST(floor(
             CAST(ra AS DOUBLE) / CAST(n AS DOUBLE)
             * ln(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000000.0) AS HUGEINT)) AS hxn
           FROM rx JOIN nt ON nt.pair = rx.pair GROUP BY rx.pair),
         hy AS (
           SELECT cy.pair, -sum(CAST(floor(
             CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)
             * ln(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000000.0) AS HUGEINT)) AS hyn
           FROM cy JOIN nt ON nt.pair = cy.pair GROUP BY cy.pair),
         fin AS (
           SELECT nt.pair, n, lx, ly,
             CAST(chi2m AS DOUBLE) / 1000000.0 AS chi2,
             CAST(mim AS DOUBLE) / 1000000000.0 AS mi,
             CAST(hxn AS DOUBLE) / 1000000000.0 AS hx,
             CAST(hyn AS DOUBLE) / 1000000000.0 AS hy
           FROM nt JOIN lv ON lv.pair = nt.pair
           JOIN chi ON chi.pair = nt.pair
           JOIN mi ON mi.pair = nt.pair
           JOIN hx ON hx.pair = nt.pair
           JOIN hy ON hy.pair = nt.pair)
         SELECT pair, n, lx AS levels_x, ly AS levels_y,
           round(chi2, 6) AS chi2,
           CASE WHEN n > 0 AND least(lx, ly) - 1 > 0 AND chi2 >= 0
             THEN round(sqrt(chi2 / (CAST(n AS DOUBLE)
               * CAST(least(lx, ly) - 1 AS DOUBLE))), 6) END
             AS cramers_v,
           round(mi, 6) AS mi_nats,
           CASE WHEN hy > 0 THEN round(mi / hy, 6) END
             AS u_y_given_x,
           CASE WHEN hx > 0 THEN round(mi / hx, 6) END
             AS u_x_given_y
         FROM fin ORDER BY pair""",
    // complete blocks only; tie-averaged doubled ranks within each
    // (segment, day) block; Q as a ratio of two exact integers in
    // doubled-rank units; both plants re-seeded
    "q306_friedman_test" ->
      s"""WITH cell AS (
           SELECT concat('seg', CAST(user_id % 3 AS VARCHAR)) AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS b,
             event_type AS cat,
             CAST(sum(CAST(floor(value * 100
               * (CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01')
                   % 7 = 0 THEN 3.0 ELSE 1.0 END)
               * (CASE WHEN user_id % 3 = 0
                   AND event_type = 'purchase'
                   THEN 2.5 ELSE 1.0 END)) AS BIGINT)) AS BIGINT) AS y
           FROM events
           WHERE value IS NOT NULL AND user_id IS NOT NULL
             AND event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2, 3),
         kk AS (
           SELECT g, CAST(count(DISTINCT cat) AS BIGINT) AS k
           FROM cell GROUP BY g),
         bk AS (
           SELECT g, b, CAST(count(*) AS BIGINT) AS nb
           FROM cell GROUP BY 1, 2),
         complete AS (
           SELECT cell.g, cell.b, cat, y
           FROM cell JOIN kk ON kk.g = cell.g
           JOIN bk ON bk.g = cell.g AND bk.b = cell.b
           WHERE bk.nb = kk.k),
         tie AS (
           SELECT g, b, y, CAST(count(*) AS BIGINT) AS t
           FROM complete GROUP BY 1, 2, 3),
         rk AS (
           SELECT g, b, y, 2 * coalesce(CAST(sum(t) OVER (
               PARTITION BY g, b ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) + t + 1 AS rank2
           FROM tie),
         wr AS (
           SELECT c.g, c.cat, rank2
           FROM complete c JOIN rk
             ON rk.g = c.g AND rk.b = c.b AND rk.y = c.y),
         pc AS (
           SELECT g, cat, CAST(sum(rank2) AS BIGINT) AS r2,
             sum(CAST(rank2 AS HUGEINT) * rank2) AS q2,
             CAST(count(*) AS BIGINT) AS bcat
           FROM wr GROUP BY 1, 2),
         kb AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_cats,
             max(bcat) AS n_blocks, sum(q2) AS sq2
           FROM pc GROUP BY g),
         tot AS (
           SELECT pc.g, n_cats, n_blocks, sq2,
             sum(CAST(r2 - n_blocks * (n_cats + 1) AS HUGEINT)
               * (r2 - n_blocks * (n_cats + 1))) AS num
           FROM pc JOIN kb ON kb.g = pc.g GROUP BY 1, 2, 3, 4),
         fin AS (
           SELECT g, n_blocks, n_cats,
             CAST(n_cats - 1 AS INT) AS dof,
             CASE WHEN n_blocks < 2 OR n_cats < 2
                 OR CAST(sq2 - n_blocks * n_cats * (n_cats + 1)
                   * (n_cats + 1) AS DOUBLE) <= 0 THEN NULL
               ELSE CAST((n_cats - 1) * num AS DOUBLE)
                 / CAST(sq2 - n_blocks * n_cats * (n_cats + 1)
                   * (n_cats + 1) AS DOUBLE) END AS q
           FROM tot)
         SELECT g AS segment, n_blocks, n_cats, dof,
           round(q, 6) AS q,
           CAST(coalesce(q > $chi2CritCaseSql, FALSE) AS INT)
             AS differs
         FROM fin ORDER BY segment""",
    // the q306 doubled-rank machinery with judges = segments over
    // priority spend cells; W and Q each one division of exact
    // HUGEINT sums, significance off the same pinned criticals
    "q367_kendall_w" ->
      s"""WITH cell AS (
           SELECT o_orderstatus AS g, c_mktsegment AS b,
             o_orderpriority AS cat,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2, 3),
         kk AS (
           SELECT g, CAST(count(DISTINCT cat) AS BIGINT) AS k
           FROM cell GROUP BY g),
         bk AS (
           SELECT g, b, CAST(count(*) AS BIGINT) AS nb
           FROM cell GROUP BY 1, 2),
         complete AS (
           SELECT cell.g, cell.b, cat, y
           FROM cell JOIN kk ON kk.g = cell.g
           JOIN bk ON bk.g = cell.g AND bk.b = cell.b
           WHERE bk.nb = kk.k),
         tie AS (
           SELECT g, b, y, CAST(count(*) AS BIGINT) AS t
           FROM complete GROUP BY 1, 2, 3),
         rk AS (
           SELECT g, b, y, 2 * coalesce(CAST(sum(t) OVER (
               PARTITION BY g, b ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) + t + 1 AS rank2
           FROM tie),
         wr AS (
           SELECT c.g, c.cat, rank2
           FROM complete c JOIN rk
             ON rk.g = c.g AND rk.b = c.b AND rk.y = c.y),
         pc AS (
           SELECT g, cat, CAST(sum(rank2) AS BIGINT) AS r2,
             sum(CAST(rank2 AS HUGEINT) * rank2) AS q2,
             CAST(count(*) AS BIGINT) AS bcat
           FROM wr GROUP BY 1, 2),
         kb AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_items,
             max(bcat) AS n_judges, sum(q2) AS sq2
           FROM pc GROUP BY g),
         tot AS (
           SELECT pc.g, n_items, n_judges, sq2,
             sum(CAST(r2 - n_judges * (n_items + 1) AS HUGEINT)
               * (r2 - n_judges * (n_items + 1))) AS num
           FROM pc JOIN kb ON kb.g = pc.g GROUP BY 1, 2, 3, 4),
         fin AS (
           SELECT g, n_judges, n_items,
             CAST(n_items - 1 AS INT) AS dof,
             CASE WHEN n_judges < 2 OR n_items < 2
                 OR CAST(sq2 - n_judges * n_items * (n_items + 1)
                   * (n_items + 1) AS DOUBLE) <= 0 THEN NULL
               ELSE CAST(num AS DOUBLE)
                 / (CAST(n_judges AS DOUBLE)
                   * CAST(sq2 - n_judges * n_items * (n_items + 1)
                     * (n_items + 1) AS DOUBLE)) END AS w,
             CASE WHEN n_judges < 2 OR n_items < 2
                 OR CAST(sq2 - n_judges * n_items * (n_items + 1)
                   * (n_items + 1) AS DOUBLE) <= 0 THEN NULL
               ELSE CAST((n_items - 1) * num AS DOUBLE)
                 / CAST(sq2 - n_judges * n_items * (n_items + 1)
                   * (n_items + 1) AS DOUBLE) END AS q
           FROM tot)
         SELECT g AS o_orderstatus, n_judges, n_items, dof,
           round(w, 6) AS w, round(q, 6) AS q,
           CAST(coalesce(q > $chi2CritCaseSql, FALSE) AS INT)
             AS significant
         FROM fin ORDER BY o_orderstatus""",
    // level table exact, all five moments in HUGEINT, one mirrored
    // division + sqrt for z; the planted MACHINERY ladder re-seeded
    "q287_cochran_armitage" ->
      """WITH b AS (
           SELECT c_mktsegment AS g,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CASE WHEN c_mktsegment = 'MACHINERY'
               THEN CASE WHEN o_orderkey % 100 < 10
                 + 6 * CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                 THEN 1 ELSE 0 END
               ELSE CASE WHEN o_orderkey % 100 < 10 THEN 1 ELSE 0 END
               END AS f
           FROM orders JOIN customer ON o_custkey = c_custkey),
         lvl AS (
           SELECT g, w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(f) AS BIGINT) AS r
           FROM b GROUP BY g, w),
         agg AS (
           SELECT g, CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS n_pos,
             sum(CAST(w AS HUGEINT) * n) AS swn,
             sum(CAST(w AS HUGEINT) * r) AS swr,
             sum(CAST(w AS HUGEINT) * w * n) AS sw2n,
             CAST(count(*) AS BIGINT) AS n_levels
           FROM lvl GROUP BY g),
         f AS (
           SELECT g, n, n_pos, n_levels,
             CAST(CAST(n AS HUGEINT) * swr
               - CAST(n_pos AS HUGEINT) * swn AS DOUBLE) AS num,
             CAST((CAST(n_pos AS HUGEINT) * (n - n_pos))
               * (CAST(n AS HUGEINT) * sw2n - swn * swn) AS DOUBLE)
               / CAST(n - 1 AS DOUBLE) AS vard
           FROM agg),
         z AS (
           SELECT g, n, n_pos, n_levels,
             CASE WHEN n < 2 OR n_pos = 0 OR n_pos = n
               OR n_levels < 2 THEN NULL
               ELSE num / sqrt(vard) END AS z
           FROM f)
         SELECT g AS c_mktsegment, n, n_pos, n_levels,
           round(z, 6) AS z,
           CAST(coalesce(abs(z) > 1.96, FALSE) AS INT) AS trending
         FROM z ORDER BY c_mktsegment""",
    // exact sorted-index Gini: Σ i·x is tie-permutation-invariant, so
    // the ck tie-break pins only the intermediate; HUGEINT products,
    // one double division before round(…, 6)
    "q255_gini_segments" ->
      """WITH sp AS (
           SELECT c_mktsegment AS g, o_custkey AS ck,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY g, o_custkey),
         rws AS (SELECT g, ck, x FROM sp
           WHERE x IS NOT NULL AND x >= 0 AND g IS NOT NULL),
         rk AS (SELECT g, x,
             CAST(row_number() OVER (PARTITION BY g ORDER BY x, ck)
               AS BIGINT) AS i
           FROM rws),
         agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS sxr
           FROM rk GROUP BY 1)
         SELECT g AS c_mktsegment, n, s AS value_sum,
           CASE WHEN s > 0 THEN
             round(CAST(2 * sxr
                 - (CAST(n AS HUGEINT) + 1) * CAST(s AS HUGEINT)
               AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * CAST(s AS HUGEINT)
                 AS DOUBLE), 6)
           ELSE NULL END AS gini
         FROM agg ORDER BY c_mktsegment""",
    // nano-floored Theil terms before every (order-free) sum; the
    // total row's T is BY CONSTRUCTION the sum of its quantized parts
    "q250_theil_decomposition" ->
      """WITH sp AS (
           SELECT c_mktsegment AS g,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY g, o_custkey),
         rws AS (SELECT g, x FROM sp
           WHERE x IS NOT NULL AND x > 0 AND g IS NOT NULL),
         grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s
           FROM rws GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(s) AS BIGINT) AS st FROM grp),
         wn AS (
           SELECT r.g, CAST(sum(CAST(floor(
             (CAST(CAST(r.x AS HUGEINT) * grp.n AS DOUBLE)
               / CAST(grp.s AS DOUBLE))
             * ln(CAST(CAST(r.x AS HUGEINT) * grp.n AS DOUBLE)
               / CAST(grp.s AS DOUBLE))
             * 1000000000.0) AS BIGINT)) AS BIGINT) AS w_nano
           FROM rws r JOIN grp ON grp.g = r.g GROUP BY 1),
         parts AS (
           SELECT grp.g, grp.n, grp.s,
             CAST(floor((CAST(grp.s AS DOUBLE) / CAST(tot.st AS DOUBLE))
               * ((CAST(wn.w_nano AS DOUBLE) / 1000000000.0)
                 / CAST(grp.n AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS sw_nano,
             CAST(floor((CAST(grp.s AS DOUBLE) / CAST(tot.st AS DOUBLE))
               * ln(CAST(CAST(grp.s AS HUGEINT) * tot.nt AS DOUBLE)
                 / CAST(CAST(tot.st AS HUGEINT) * grp.n AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS b_nano,
             round((CAST(wn.w_nano AS DOUBLE) / 1000000000.0)
               / CAST(grp.n AS DOUBLE), 6) AS theil
           FROM grp JOIN wn ON wn.g = grp.g, tot)
         SELECT g AS c_mktsegment, n, s AS value_sum, theil,
           CAST(NULL AS DOUBLE) AS theil_between,
           CAST(NULL AS DOUBLE) AS theil_within_weighted
         FROM parts
         UNION ALL
         SELECT '__total__', CAST(sum(n) AS BIGINT),
           CAST(sum(s) AS BIGINT),
           round(CAST(sum(sw_nano) + sum(b_nano) AS DOUBLE)
             / 1000000000.0, 6),
           round(CAST(sum(b_nano) AS DOUBLE) / 1000000000.0, 6),
           round(CAST(sum(sw_nano) AS DOUBLE) / 1000000000.0, 6)
         FROM parts
         ORDER BY c_mktsegment""",
    // cents-exact residuals, the ksTest cumulative order statistic,
    // integer ceiling k; the one double step is the coverage ratio
    "q249_conformal_coverage" ->
      """WITH o AS (
           SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
             o_orderkey % 2 = 1 AS is_cal
           FROM orders WHERE o_totalprice IS NOT NULL),
         p AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_cal,
             CAST(sum(v) AS BIGINT) AS s
           FROM o WHERE is_cal GROUP BY 1),
         p2 AS (SELECT g, n_cal, CAST(s // n_cal AS BIGINT) AS pred
           FROM p),
         res AS (
           SELECT o.g, abs(o.v - p2.pred) AS r
           FROM o JOIN p2 ON p2.g = o.g WHERE o.is_cal),
         rc AS (SELECT g, r, count(*) AS c FROM res GROUP BY 1, 2),
         cm AS (
           SELECT g, r, sum(c) OVER (PARTITION BY g ORDER BY r
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM rc),
         qh AS (
           SELECT cm.g, min(cm.r) AS q_hat
           FROM cm JOIN p2 ON p2.g = cm.g
           WHERE cm.cum >= ((p2.n_cal + 1) * 900 + 999) // 1000
           GROUP BY 1),
         tst AS (
           SELECT o.g, abs(o.v - p2.pred) AS r, p2.n_cal, p2.pred
           FROM o JOIN p2 ON p2.g = o.g WHERE NOT o.is_cal),
         agg AS (
           SELECT tst.g, max(tst.n_cal) AS n_cal,
             CAST(count(*) AS BIGINT) AS n_test,
             max(tst.pred) AS pred, max(qh.q_hat) AS q_hat,
             CAST(sum(CASE WHEN tst.r <= qh.q_hat THEN 1 ELSE 0 END)
               AS BIGINT) AS cov
           FROM tst LEFT JOIN qh ON qh.g = tst.g GROUP BY 1)
         SELECT g AS o_orderpriority, n_cal, n_test, pred, q_hat,
           round(CASE WHEN q_hat IS NOT NULL THEN
             CAST(cov AS DOUBLE) / CAST(n_test AS DOUBLE) END, 6)
             AS coverage,
           CAST(q_hat IS NULL AS INT) AS degenerate
         FROM agg ORDER BY g""",
    // Spearman replay: half-unit tie-averaged ranks per variable,
    // Pearson on ranks through HUGEINT, one double division at the
    // end (HUGEINT->DOUBLE and DECIMAL->DOUBLE both round-to-nearest
    // of the same exact integer)
    "q238_qty_price_spearman" ->
      """WITH rws AS (
           SELECT l_returnflag AS g, l_quantity AS x,
             l_extendedprice AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL
             AND l_extendedprice IS NOT NULL),
         rx AS (SELECT g, x, count(*) AS t FROM rws GROUP BY 1, 2),
         rx2 AS (
           SELECT g, x, 2 * coalesce(sum(t) OVER (PARTITION BY g
               ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) + t + 1 AS r
           FROM rx),
         ry AS (SELECT g, y, count(*) AS t FROM rws GROUP BY 1, 2),
         ry2 AS (
           SELECT g, y, 2 * coalesce(sum(t) OVER (PARTITION BY g
               ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) + t + 1 AS r
           FROM ry),
         j AS (
           SELECT rws.g, rx2.r AS rx, ry2.r AS ry
           FROM rws
           JOIN rx2 ON rx2.g = rws.g AND rx2.x = rws.x
           JOIN ry2 ON ry2.g = rws.g AND ry2.y = rws.y),
         a AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(rx AS HUGEINT) * ry) AS sxy,
             sum(CAST(rx AS HUGEINT) * rx) AS sxx,
             sum(CAST(ry AS HUGEINT) * ry) AS syy
           FROM j GROUP BY 1),
         f AS (
           SELECT g, n, CAST(n AS HUGEINT) * (n + 1) AS s,
             sxy, sxx, syy
           FROM a),
         v AS (
           SELECT g, n,
             CAST(n AS HUGEINT) * sxy - s * s AS covn,
             CAST(n AS HUGEINT) * sxx - s * s AS varx,
             CAST(n AS HUGEINT) * syy - s * s AS vary
           FROM f)
         SELECT g AS l_returnflag, n,
           CASE WHEN CAST(varx AS DOUBLE) > 0.0
               AND CAST(vary AS DOUBLE) > 0.0
             THEN round(CAST(covn AS DOUBLE)
               / sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)), 6)
             END AS rho
         FROM v ORDER BY g""",
    // per-group q201 machinery (md5-keyed flips, exact BIGINT unit
    // sums, one mirrored double per replica) + an INTEGER
    // cross-multiplied BH step-up — the float-free selection boundary
    "q260_segment_fdr_screen" ->
      """WITH e AS (
           SELECT event_type AS g, user_id,
             CAST(floor(value * (CASE WHEN user_id % 2 = 0
                 AND event_type = 'purchase' THEN 2.0 ELSE 1.0 END)
               * 100) AS BIGINT) AS v,
             (user_id % 2 = 0) AS a
           FROM events WHERE value IS NOT NULL),
         units AS (
           SELECT g, CAST(user_id AS VARCHAR) AS u, a,
             CAST(sum(v) AS BIGINT) AS v
           FROM e GROUP BY 1, 2, 3),
         ob AS (SELECT g,
             CAST(sum(CASE WHEN a THEN v ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN NOT a THEN v ELSE 0 END) AS BIGINT)
               AS sb,
             CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
           FROM units GROUP BY g),
         obs AS (SELECT g, na, nb,
             CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS obsd
           FROM ob),
         asg AS (
           SELECT g, u, v, r,
             CAST(('0x' || substr(md5('q260' || ':'
               || CAST(r AS VARCHAR) || ':' || u), 1, 8)) AS BIGINT)
               % 2 AS flip
           FROM units, LATERAL (SELECT
             unnest(generate_series(0, 98)) AS r) t),
         per AS (
           SELECT g, r,
             CAST(sum(CASE WHEN flip = 0 THEN v ELSE 0 END)
               AS BIGINT) AS sa,
             CAST(sum(CASE WHEN flip = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS na,
             CAST(sum(CASE WHEN flip = 1 THEN v ELSE 0 END)
               AS BIGINT) AS sb,
             CAST(sum(CASE WHEN flip = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS nb
           FROM asg GROUP BY g, r),
         d AS (SELECT g, CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS d
               FROM per WHERE na > 0 AND nb > 0),
         tl AS (SELECT d.g, CAST(count(*) AS BIGINT) AS r_valid,
                CAST(sum(CASE WHEN abs(d.d) >= abs(obs.obsd)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
                FROM d JOIN obs ON obs.g = d.g GROUP BY d.g),
         tests AS (
           SELECT obs.g, tl.n_extreme + 1 AS pn, tl.r_valid + 1 AS pd
           FROM obs JOIN tl ON tl.g = obs.g),
         rk AS (
           SELECT g, pn, pd,
             CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE) AS p,
             CAST(row_number() OVER (ORDER BY
               CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE), g)
               AS BIGINT) AS k
           FROM tests),
         mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM rk),
         km AS (SELECT max(k) AS kmax FROM rk, mm
                WHERE pn * m * 1000 <= k * 50 * pd)
         SELECT g AS event_type, round(p, 6) AS p_value, k AS rank,
           round(CAST(k * 50 AS DOUBLE) / CAST(m * 1000 AS DOUBLE), 6)
             AS bh_critical,
           CAST(CASE WHEN k <= coalesce(km.kmax, 0) THEN 1 ELSE 0 END
             AS INT) AS selected
         FROM rk, mm, km ORDER BY event_type""",
    // contingency-cell τ-b: exact HUGEINT concordant/discordant/tie
    // counts from the cell-pair join, one mirrored double division
    "q257_qty_price_kendall" ->
      """WITH r AS (
           SELECT l_returnflag AS g, CAST(l_quantity AS INT) AS x,
             CAST(floor(l_extendedprice / 10000) AS INT) AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL
             AND l_extendedprice IS NOT NULL),
         cells AS (
           SELECT g, x, y, CAST(count(*) AS BIGINT) AS n
           FROM r GROUP BY 1, 2, 3),
         cd AS (
           SELECT a.g,
             sum(CASE WHEN a.x < b.x AND a.y < b.y
               THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS c,
             sum(CASE WHEN a.x < b.x AND a.y > b.y
               THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS d
           FROM cells a JOIN cells b ON a.g = b.g
             AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
           GROUP BY a.g),
         tx AS (
           SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS tx2 FROM
             (SELECT g, x, CAST(sum(n) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2) GROUP BY g),
         ty AS (
           SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS ty2 FROM
             (SELECT g, y, CAST(sum(n) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2) GROUP BY g),
         tot AS (
           SELECT g, CAST(sum(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cells
           FROM cells GROUP BY g),
         f AS (
           SELECT tot.g, tot.n, tot.n_cells,
             CAST(CAST(tot.n AS HUGEINT) * (tot.n - 1) - tx.tx2
               AS DOUBLE) AS denx,
             CAST(CAST(tot.n AS HUGEINT) * (tot.n - 1) - ty.ty2
               AS DOUBLE) AS deny,
             CAST(coalesce(cd.c, 0) - coalesce(cd.d, 0) AS DOUBLE)
               * 2.0 AS num
           FROM tot
           LEFT JOIN cd ON cd.g = tot.g
           JOIN tx ON tx.g = tot.g
           JOIN ty ON ty.g = tot.g)
         SELECT g AS l_returnflag, n, n_cells,
           CASE WHEN denx > 0.0 AND deny > 0.0
             THEN round(num / sqrt(denx * deny), 6) END AS tau_b
         FROM f ORDER BY g""",
    // +,-,*,/ and sqrt are correctly-rounded IEEE ops, so the Wilson
    // bounds match the engine bit-for-bit with no quantization
    "q232_wilson_rates" ->
      """WITH g AS (
           SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS successes
           FROM orders GROUP BY 1),
         c AS (
           SELECT o_orderpriority, n, successes,
             CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(n AS DOUBLE) AS nd
           FROM g)
         SELECT o_orderpriority, n, successes,
           round(p, 6) AS rate,
           round((p + (1.96 * 1.96) / (2.0 * nd)
               - 1.96 * sqrt(p * (1.0 - p) / nd
                 + (1.96 * 1.96) / (4.0 * nd * nd)))
             / (1.0 + (1.96 * 1.96) / nd), 6) AS wilson_lo,
           round((p + (1.96 * 1.96) / (2.0 * nd)
               + 1.96 * sqrt(p * (1.0 - p) / nd
                 + (1.96 * 1.96) / (4.0 * nd * nd)))
             / (1.0 + (1.96 * 1.96) / nd), 6) AS wilson_hi
         FROM c ORDER BY o_orderpriority""",
    // the prior moments fold the SORTED rate list with the same left
    // fold the engine runs (list_reduce's first-element init equals
    // the engine's 0.0+x1 exactly)
    "q233_eb_shrinkage" ->
      """WITH g AS (
           SELECT o_custkey AS grp, count(*) AS n,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS successes
           FROM orders GROUP BY 1),
         ps AS (
           SELECT list_sort(list(
             CAST(successes AS DOUBLE) / CAST(n AS DOUBLE))) AS l,
             count(*) AS k
           FROM g),
         m AS (
           SELECT l, k,
             list_reduce(l, (a, x) -> a + x) / CAST(k AS DOUBLE) AS m
           FROM ps),
         v AS (
           SELECT k, m,
             CASE WHEN k < 2 THEN 0.0 ELSE
               list_reduce(list_transform(l, x -> (x - m) * (x - m)),
                 (a, y) -> a + y) / CAST(k - 1 AS DOUBLE) END AS v
           FROM m),
         pr AS (
           SELECT m,
             CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0
               THEN m * (1.0 - m) / v - 1.0 ELSE NULL END AS s
           FROM v)
         SELECT g.grp AS "group", g.n, g.successes,
           round(CAST(g.successes AS DOUBLE) / CAST(g.n AS DOUBLE), 6)
             AS rate,
           round((CAST(g.successes AS DOUBLE) + pr.s * pr.m)
             / (CAST(g.n AS DOUBLE) + pr.s), 6) AS shrunk_rate,
           round(pr.m, 6) AS prior_mean,
           round(coalesce(pr.s, 0.0), 6) AS prior_strength
         FROM g CROSS JOIN pr ORDER BY g.grp""",
    // exact counts under the float z; pooled variance, two-sided
    "q181_robust_outliers" ->
      """WITH med AS (
           SELECT o_orderpriority, median(o_totalprice) AS med
           FROM orders GROUP BY 1),
         dev AS (
           SELECT o.o_orderpriority, o.o_totalprice, m.med,
             abs(o.o_totalprice - m.med) AS ad
           FROM orders o JOIN med m USING (o_orderpriority)),
         mad AS (
           SELECT o_orderpriority, median(ad) AS mad
           FROM dev GROUP BY 1),
         z AS (
           SELECT d.o_orderpriority, d.med, m.mad,
             round(0.6745 * (d.o_totalprice - d.med) / m.mad, 4) AS mz
           FROM dev d JOIN mad m USING (o_orderpriority)
           WHERE m.mad > 0)
         SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CASE WHEN abs(mz) > 3.5 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           round(max(med), 2) AS median_price,
           round(max(mad), 2) AS mad,
           round(max(abs(mz)), 4) AS max_abs_mz
         FROM z GROUP BY 1 ORDER BY 1""",
    // smoothing prior div-floored in cents; enc and the closed-form
    // LOO mean are each ONE division of two exact BIGINTs
    "q186_jackknife_ratio" ->
      """WITH r AS (
           SELECT CAST(('0x' || substr(md5('jk:'
               || CAST(l_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % 32 AS b,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS n,
             CAST(l_quantity AS BIGINT) AS d
           FROM lineitem),
         bk AS (
           SELECT b, CAST(sum(n) AS BIGINT) AS sn,
             CAST(sum(d) AS BIGINT) AS sd
           FROM r GROUP BY b),
         tt AS (
           SELECT CAST(sum(sn) AS BIGINT) AS tn,
             CAST(sum(sd) AS BIGINT) AS td, count(*) AS nb
           FROM bk),
         ps AS (
           SELECT CAST(floor(1e4 * CAST(tn - sn AS DOUBLE)
             / CAST(td - sd AS DOUBLE)) AS BIGINT) AS ti
           FROM bk CROSS JOIN tt),
         mn AS (
           SELECT CAST(sum(ti) AS BIGINT) // count(*) AS tbar
           FROM ps),
         dv AS (
           SELECT CAST(sum((ti - tbar) * (ti - tbar)) AS BIGINT) AS ss
           FROM ps CROSS JOIN mn)
         SELECT CAST(tt.nb AS BIGINT) AS n_buckets,
           round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE), 9) AS theta,
           round(CAST(mn.tbar AS DOUBLE) / 1e4, 9) AS theta_jack,
           round(sqrt(CAST(ss AS DOUBLE) * (tt.nb - 1)
             / CAST(tt.nb AS DOUBLE)) / 1e4, 9) AS se
         FROM dv CROSS JOIN mn CROSS JOIN tt""",
    // diversity histogram over (priority, month) classes; the
    // distinct count rides pre-deduped (quasi, sensitive) rows
    "q187_l_diversity" ->
      """WITH pv AS (
           SELECT o_orderpriority,
             strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
             o_orderstatus, count(*) AS nr
           FROM orders GROUP BY 1, 2, 3),
         cls AS (
           SELECT o_orderpriority, ym, count(*) AS dc,
             CAST(sum(nr) AS BIGINT) AS sz
           FROM pv GROUP BY 1, 2)
         SELECT CAST(dc AS BIGINT) AS distinct_sensitive,
           count(*) AS n_classes, CAST(sum(sz) AS BIGINT) AS n_rows,
           dc < 3 AS violates
         FROM cls GROUP BY dc ORDER BY distinct_sensitive""",
    // resource-allocation index in exact micro-units: per-center
    // weight 1e6 // deg, summed as BIGINT — no libm in the score
    "q189_benford_audit" ->
      s"""WITH b AS (
           SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
           FROM orders),
         dd AS (
           SELECT g, CASE WHEN v > 0
             THEN CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) END AS d
           FROM b),
         c AS (SELECT g, d, count(*) AS n FROM dd GROUP BY 1, 2),
         pg AS (
           SELECT g,
             CAST(sum(CASE WHEN d IS NOT NULL THEN n ELSE 0 END)
               AS BIGINT) AS tot,
             CAST(sum(CASE WHEN d IS NULL THEN n ELSE 0 END)
               AS BIGINT) AS nexcl
           FROM c GROUP BY g),
         grid AS (
           SELECT g, tot, nexcl,
             CAST(unnest(generate_series(1, 9)) AS INT) AS digit
           FROM pg),
         j AS (
           SELECT grid.g, grid.digit, coalesce(c.n, 0) AS n,
             grid.nexcl, grid.tot
           FROM grid LEFT JOIN c
             ON c.g = grid.g AND c.d = grid.digit),
         e AS (
           SELECT j.*, ($benfordShareCase) * CAST(tot AS DOUBLE) AS ex
           FROM j),
         chi AS (
           SELECT g, sum((CAST(n AS DOUBLE) - ex)
             * (CAST(n AS DOUBLE) - ex) / ex) AS chi2
           FROM e GROUP BY g)
         SELECT e.g AS o_orderpriority, e.digit, e.n,
           e.nexcl AS n_excluded,
           round(e.ex, 4) AS expected_n,
           round(CAST(e.n AS DOUBLE) / CAST(e.tot AS DOUBLE), 6)
             AS share,
           round(chi.chi2, 4) AS chi2
         FROM e JOIN chi USING (g) ORDER BY 1, 2""",
    // entity shares quantize to micro-units (floor of one double
    // division of exact cents BIGINTs) so HHI is an exact integer
    // ratio in both engines
    "q190_spend_concentration" ->
      """WITH j AS (
           SELECT c_mktsegment AS g, o_custkey AS e,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
           FROM orders JOIN customer ON o_custkey = c_custkey),
         s AS (SELECT g, e, CAST(sum(v) AS BIGINT) AS v
               FROM j GROUP BY 1, 2),
         tt AS (SELECT g, CAST(sum(v) AS BIGINT) AS tv,
               count(*) AS ne FROM s GROUP BY g),
         sh AS (
           SELECT s.g, s.v, tt.ne,
             CAST(floor(1000000 * CAST(s.v AS DOUBLE)
               / CAST(tt.tv AS DOUBLE)) AS BIGINT) AS sm,
             row_number() OVER (PARTITION BY s.g
               ORDER BY s.v DESC, s.e) AS rk
           FROM s JOIN tt USING (g))
         SELECT g AS c_mktsegment,
           CAST(max(ne) AS BIGINT) AS n_entities,
           round(CAST(max(CASE WHEN rk = 1 THEN sm END) AS DOUBLE)
             / 1e6, 6) AS top1_share,
           round(CAST(sum(CASE WHEN rk <= 3 THEN sm ELSE 0 END)
             AS DOUBLE) / 1e6, 6) AS top3_share,
           round(CAST(sum(sm * sm) AS DOUBLE) / 1e12, 6) AS hhi,
           round(1e12 / CAST(sum(sm * sm) AS DOUBLE), 4)
             AS effective_n
         FROM sh GROUP BY g ORDER BY g""",
    // survival is an ordered left-fold product of per-step factors
    // (each ONE correctly-rounded IEEE division), so list_reduce here
    // and aggregate() in the engine produce bit-identical doubles —
    // no exp/ln detour whose rounding is engine-specific
    "q191_kaplan_meier" ->
      """WITH pc AS (
           SELECT c_mktsegment AS g, o_custkey,
             min(CAST(o_orderdate AS DATE)) AS f,
             max(CAST(o_orderdate AS DATE)) AS l
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         mx AS (SELECT max(l) AS mx FROM pc),
         subj AS (
           SELECT g, date_diff('day', f, l) AS t,
             (l < mx - 90) AS e
           FROM pc CROSS JOIN mx),
         bt AS (
           SELECT g, t,
             CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
           FROM subj GROUP BY 1, 2),
         rk AS (
           SELECT g, t, d, c,
             CAST(sum(d + c) OVER (PARTITION BY g) AS BIGINT)
               - CAST(coalesce(sum(d + c) OVER (PARTITION BY g
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n
           FROM bt),
         fl AS (
           SELECT g, list(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)
             ORDER BY t) AS fs
           FROM rk GROUP BY g),
         rn AS (
           SELECT rk.*, CAST(row_number() OVER (PARTITION BY g
             ORDER BY t) AS INT) AS i
           FROM rk)
         SELECT rn.g AS c_mktsegment, rn.t, rn.n AS n_at_risk,
           rn.d AS n_events, rn.c AS n_censored,
           round(list_reduce(fl.fs[1:rn.i], (x, y) -> x * y), 6)
             AS survival
         FROM rn JOIN fl USING (g) ORDER BY 1, 2""",
    // the q191 fold, each step floor-quantized to nano ONCE, area
    // = head segment + Σ s_nano·(clipped width) exact in BIGINT;
    // rmst_days one mirrored unrounded division
    "q364_rmst" ->
      """WITH pc AS (
           SELECT c_mktsegment AS g, o_custkey,
             min(CAST(o_orderdate AS DATE)) AS f,
             max(CAST(o_orderdate AS DATE)) AS l
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         mx AS (SELECT max(l) AS mx FROM pc),
         subj AS (
           SELECT g, date_diff('day', f, l) AS t,
             (l < mx - 90) AS e
           FROM pc CROSS JOIN mx),
         bt AS (
           SELECT g, t,
             CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
           FROM subj GROUP BY 1, 2),
         rk AS (
           SELECT g, t, d, c,
             CAST(sum(d + c) OVER (PARTITION BY g) AS BIGINT)
               - CAST(coalesce(sum(d + c) OVER (PARTITION BY g
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n
           FROM bt),
         fl AS (
           SELECT g, list(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)
             ORDER BY t) AS fs
           FROM rk GROUP BY g),
         rn AS (
           SELECT rk.*, CAST(row_number() OVER (PARTITION BY g
             ORDER BY t) AS INT) AS i
           FROM rk),
         sv AS (
           SELECT rn.g, rn.t,
             list_reduce(fl.fs[1:rn.i], (x, y) -> x * y) AS s
           FROM rn JOIN fl USING (g)),
         seg AS (
           SELECT g, t,
             coalesce(lead(t) OVER (PARTITION BY g ORDER BY t), 365)
               AS nt,
             CAST(floor(s * 1e9) AS BIGINT) AS sn
           FROM sv),
         agg AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_times,
             least(min(t), 365) * 1000000000
               + sum(sn * greatest(0, least(nt, 365) - t)) AS nano
           FROM seg GROUP BY g)
         SELECT g AS c_mktsegment, CAST(365 AS BIGINT) AS tau,
           n_times, CAST(nano AS BIGINT) AS rmst_nano,
           CAST(nano AS DOUBLE) / 1e9 AS rmst_days
         FROM agg ORDER BY c_mktsegment""",
    // dense (value x dose) grid with per-dose cumulative-below
    // counts; J2 exact in doubled units with tie half-credit; the
    // classical no-tie variance, one mirrored z
    "q319_jonckheere" ->
      """WITH b AS (
           SELECT c_mktsegment AS g,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CASE WHEN c_mktsegment = 'MACHINERY'
               THEN CAST(floor(o_totalprice * 100 * (1.0 +
                 CAST(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                   AS DOUBLE) * 0.05)) AS BIGINT)
               ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
               END AS v
           FROM orders JOIN customer ON o_custkey = c_custkey),
         cells AS (
           SELECT g, w, v, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2, 3),
         vals AS (SELECT DISTINCT g, v FROM cells),
         doses AS (SELECT DISTINCT g, w FROM cells),
         grid AS (
           SELECT vals.g, vals.v, doses.w, coalesce(c, 0) AS c
           FROM vals JOIN doses ON doses.g = vals.g
           LEFT JOIN cells ON cells.g = vals.g
             AND cells.v = vals.v AND cells.w = doses.w),
         cbf AS (
           SELECT g, v, w, c,
             coalesce(sum(c) OVER (PARTITION BY g, w ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
           FROM grid),
         jj AS (
           SELECT a.g,
             sum(CAST(b2.c AS HUGEINT) * (2 * a.cb + a.c)) AS j2
           FROM cbf a JOIN cbf b2
             ON b2.g = a.g AND b2.v = a.v AND a.w < b2.w
           GROUP BY 1),
         pd AS (
           SELECT g, w, CAST(sum(c) AS BIGINT) AS ni
           FROM cells GROUP BY 1, 2),
         mo AS (
           SELECT g, CAST(sum(ni) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS nd,
             sum(CAST(ni AS HUGEINT) * ni) AS sn2,
             sum(CAST(ni AS HUGEINT) * ni * (2 * ni + 3)) AS sn23
           FROM pd GROUP BY 1),
         f AS (
           SELECT mo.g, n, nd, j2,
             CAST(CAST(n AS HUGEINT) * n - sn2 AS DOUBLE) / 2.0
               AS e2,
             CAST(CAST(n AS HUGEINT) * n * (2 * n + 3) - sn23
               AS DOUBLE) / 72.0 AS varj
           FROM mo JOIN jj ON jj.g = mo.g)
         SELECT g AS c_mktsegment, n, nd AS n_doses,
           CAST(j2 AS BIGINT) AS j2,
           CASE WHEN n < 2 OR nd < 2 OR varj <= 0 THEN NULL
             ELSE round((CAST(j2 AS DOUBLE) - e2)
               / (2.0 * sqrt(varj)), 6) END AS z,
           CAST(coalesce((CASE WHEN n < 2 OR nd < 2 OR varj <= 0
               THEN NULL ELSE (CAST(j2 AS DOUBLE) - e2)
                 / (2.0 * sqrt(varj)) END) > 1.96, FALSE) AS INT)
             AS trending
         FROM f ORDER BY g""",
    // the q191 risk-set chain with the additive tail: increments
    // nano-floored before the running sum, exp/sqrt render-only
    "q316_nelson_aalen" ->
      """WITH pc AS (
           SELECT c_mktsegment AS g, o_custkey,
             min(CAST(o_orderdate AS DATE)) AS f,
             max(CAST(o_orderdate AS DATE)) AS l
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         mx AS (SELECT max(l) AS mx FROM pc),
         subj AS (
           SELECT g, date_diff('day', f, l) AS t,
             (l < mx - 90) AS e
           FROM pc CROSS JOIN mx),
         bt AS (
           SELECT g, t,
             CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
           FROM subj GROUP BY 1, 2),
         rk AS (
           SELECT g, t, d, c,
             CAST(sum(d + c) OVER (PARTITION BY g) AS BIGINT)
               - CAST(coalesce(sum(d + c) OVER (PARTITION BY g
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n
           FROM bt),
         q AS (
           SELECT g, t, d, c, n,
             CAST(floor(CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
               * 1000000000.0) AS HUGEINT) AS h,
             CAST(floor(CAST(d AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               * 1000000000000.0) AS HUGEINT) AS v
           FROM rk),
         cu AS (
           SELECT g, t, n, d, c,
             sum(h) OVER (PARTITION BY g ORDER BY t) AS hc,
             sum(v) OVER (PARTITION BY g ORDER BY t) AS vc
           FROM q)
         SELECT g AS c_mktsegment, t, n AS n_at_risk, d AS n_events,
           c AS n_censored,
           CAST(hc AS BIGINT) AS cum_hazard_nano,
           round(exp(-(CAST(hc AS DOUBLE) / 1000000000.0)), 6)
             AS survival_na,
           round(sqrt(CAST(vc AS DOUBLE) / 1000000000000.0), 6) AS se
         FROM cu ORDER BY 1, 2""",
    // sparse χ² identity N·(Σ n²/(r·c) − 1) — no zero-cell grid; MI
    // and entropies sum only observed cells/margins
    "q198_segment_priority_assoc" ->
      """WITH b AS (
           SELECT c_mktsegment AS a, o_orderpriority AS bb
           FROM orders JOIN customer ON o_custkey = c_custkey),
         cells AS (SELECT a, bb, count(*) AS n FROM b GROUP BY 1, 2),
         r AS (SELECT a, CAST(sum(n) AS BIGINT) AS r
               FROM cells GROUP BY 1),
         c AS (SELECT bb, CAST(sum(n) AS BIGINT) AS c
               FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
         na AS (SELECT count(*) AS ra FROM r),
         nb AS (SELECT count(*) AS cb FROM c),
         j AS (SELECT cells.n, r.r, c.c, t.nt
               FROM cells JOIN r USING (a) JOIN c USING (bb)
               CROSS JOIN t),
         sums AS (
           SELECT
             sum((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) AS chiterm,
             sum((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
               * ln(CAST(n AS DOUBLE) * CAST(nt AS DOUBLE)
                 / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))) AS mi
           FROM j),
         ha AS (SELECT sum((CAST(r AS DOUBLE) / CAST(nt AS DOUBLE))
                * ln(CAST(nt AS DOUBLE) / CAST(r AS DOUBLE))) AS ha
                FROM r CROSS JOIN t),
         hb AS (SELECT sum((CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
                * ln(CAST(nt AS DOUBLE) / CAST(c AS DOUBLE))) AS hb
                FROM c CROSS JOIN t)
         SELECT t.nt AS n, na.ra AS levels_a, nb.cb AS levels_b,
           round(CAST(nt AS DOUBLE) * (chiterm - 1.0), 4) AS chi2,
           round(sqrt((chiterm - 1.0)
             / CAST(least(ra, cb) - 1 AS DOUBLE)), 6) AS cramers_v,
           round(mi, 6) AS mi_nats,
           round(mi / ha, 6) AS u_a_given_b,
           round(mi / hb, 6) AS u_b_given_a
         FROM t CROSS JOIN na CROSS JOIN nb CROSS JOIN sums
           CROSS JOIN ha CROSS JOIN hb""",
    // Poisson(1) weights as integer threshold-counts over the 32-bit
    // md5; replicate ratios are one division of exact weighted sums;
    // CI bounds are order statistics picked by exact integer index;
    // the bootstrap mean folds the SORTED list with a 0.0 seed,
    // mirroring the engine's aggregate() fold bit-for-bit
    "q208_bootstrap_ci" ->
      s"""WITH per AS (
           SELECT CAST(o_custkey AS VARCHAR) AS u,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS num,
             1 AS den
           FROM orders),
         units AS (SELECT u, CAST(sum(num) AS BIGINT) AS num,
                   CAST(sum(den) AS BIGINT) AS den FROM per GROUP BY u),
         ob AS (SELECT count(*) AS nu, CAST(sum(num) AS BIGINT) AS tn,
                CAST(sum(den) AS BIGINT) AS td FROM units),
         asg AS (
           SELECT r, num, den, ${poissonWeightSql("uu")} AS w
           FROM (SELECT u, num, den, r,
             CAST(('0x' || substr(md5('q208' || ':'
               || CAST(r AS VARCHAR) || ':' || u), 1, 8)) AS BIGINT)
               AS uu
             FROM units, LATERAL (SELECT
               unnest(generate_series(0, 198)) AS r) t)),
         per_r AS (SELECT r, CAST(sum(w * num) AS BIGINT) AS wn,
                   CAST(sum(w * den) AS BIGINT) AS wd
                   FROM asg GROUP BY r),
         ratios AS (SELECT CAST(wn AS DOUBLE) / CAST(wd AS DOUBLE)
                    AS ratio FROM per_r WHERE wd > 0),
         fold AS (SELECT list(ratio ORDER BY ratio) AS rs,
                  count(*) AS rv FROM ratios),
         idx AS (SELECT rs, rv,
                 greatest(CAST(ceil(0.025 * rv) AS INT), 1) AS lo,
                 CAST(ceil(0.975 * rv) AS INT) AS hi FROM fold)
         SELECT ob.nu AS n_units, idx.rv AS r_valid,
           round(CAST(ob.tn AS DOUBLE) / CAST(ob.td AS DOUBLE), 6)
             AS obs_ratio,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), rs),
             (a, b) -> a + b) / CAST(rv AS DOUBLE), 6) AS boot_mean,
           round(rs[lo], 6) AS ci_lo,
           round(rs[hi], 6) AS ci_hi
         FROM ob CROSS JOIN idx""",
    // the q48 pair CTE + quantile_cont over exact integer micros —
    // delays divide to seconds once at the end
    "q211_conversion_delay" ->
      """WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
         p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT strftime(date_trunc('day', v.ts), '%Y-%m-%d')
               AS day,
             epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
           FROM v JOIN p ON v.user_id = p.user_id
             AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE)
         SELECT day, count(*) AS n,
           round(quantile_cont(delay_us, 0.5) / 1e6, 4) AS p50_sec,
           round(quantile_cont(delay_us, 0.9) / 1e6, 4) AS p90_sec,
           round(quantile_cont(delay_us, 0.99) / 1e6, 4) AS p99_sec
         FROM j GROUP BY day ORDER BY day""",
    // basket-duel comparisons → 8 exact MM rounds; see btRound for
    // the integer-division mirroring argument
    "q216_brand_bradley_terry" ->
      (s"""WITH li AS (
           SELECT l_orderkey AS ok, p_brand AS brand,
             l_extendedprice AS price, l_linenumber AS ln
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         comp AS MATERIALIZED (
           SELECT CASE WHEN x.price < y.price THEN x.brand
                  ELSE y.brand END AS w,
             CASE WHEN x.price < y.price THEN y.brand
                  ELSE x.brand END AS l
           FROM li x JOIN li y ON x.ok = y.ok AND x.ln < y.ln
             AND x.brand <> y.brand AND x.price <> y.price),
         c AS MATERIALIZED (SELECT w, l, count(*) AS n FROM comp GROUP BY 1, 2),
         pairs AS MATERIALIZED (SELECT least(w, l) AS a, greatest(w, l) AS b,
                   CAST(sum(n) AS BIGINT) AS m FROM c GROUP BY 1, 2),
         wins AS (SELECT w AS item, CAST(sum(n) AS BIGINT) AS wn
                  FROM c GROUP BY 1),
         it0 AS (SELECT DISTINCT item FROM (
                 SELECT w AS item FROM c UNION SELECT l FROM c)),
         items AS MATERIALIZED (SELECT it0.item,
                   CAST(coalesce(wins.wn, 0) AS BIGINT) AS wins
                   FROM it0 LEFT JOIN wins USING (item)),
         nn AS MATERIALIZED (SELECT count(*) AS n FROM items),
         nc AS (SELECT item, CAST(sum(m) AS BIGINT) AS n_comparisons
                FROM (SELECT a AS item, m FROM pairs
                      UNION ALL SELECT b, m FROM pairs) GROUP BY 1),
         p0 AS MATERIALIZED (SELECT item,
                CAST(1000000 AS BIGINT) AS p FROM items),
         """ + (1 to 8).map(btRound).mkString(",\n         ") + """
         SELECT items.item, items.wins,
           CAST(coalesce(nc.n_comparisons, 0) AS BIGINT)
             AS n_comparisons,
           p8.p AS strength_micro,
           round(CAST(p8.p AS DOUBLE) / 1000000, 6) AS strength
         FROM items LEFT JOIN nc USING (item) JOIN p8 USING (item)
         ORDER BY strength_micro DESC, item"""),
    // bottom-k md5 sketches: estimate (k−1)·2⁶⁰/θ_k, exact below k;
    // union = k-smallest-of-union; intersection by
    // inclusion–exclusion clamped at 0; tolerance 3/√k of the union
    "q219_kmv_overlap" ->
      """WITH d AS (SELECT DISTINCT event_type AS g,
             CAST(user_id AS VARCHAR) AS id FROM events),
         h AS (SELECT g, id,
               CAST(('0x' || substr(md5(id), 1, 15)) AS BIGINT) AS hh
               FROM d),
         sk AS MATERIALIZED (SELECT g, hh, id FROM (
           SELECT g, hh, id, row_number() OVER (PARTITION BY g
             ORDER BY hh, id) AS r FROM h) WHERE r <= 256),
         sz AS (SELECT g, count(*) AS ex FROM d GROUP BY g),
         pg AS (SELECT g, count(*) AS n, CAST(max(hh) AS BIGINT)
                AS theta FROM sk GROUP BY 1),
         est AS MATERIALIZED (SELECT sz.g, sz.ex,
           CASE WHEN sz.ex < 256 THEN CAST(sz.ex AS DOUBLE)
                ELSE 255.0 * CAST(1152921504606846976 AS DOUBLE)
                  / CAST(pg.theta AS DOUBLE) END AS est
           FROM sz JOIN pg USING (g)),
         prs AS MATERIALIZED (
           SELECT a.g AS ga, a.ex AS ea, a.est AS esta,
             b.g AS gb, b.ex AS eb, b.est AS estb
           FROM est a JOIN est b ON a.g < b.g),
         mg AS (SELECT ga, gb, hh, id FROM (
           SELECT p.ga, p.gb, sk.hh, sk.id FROM prs p
             JOIN sk ON sk.g = p.ga
           UNION ALL SELECT p.ga, p.gb, sk.hh, sk.id FROM prs p
             JOIN sk ON sk.g = p.gb)
           GROUP BY ga, gb, hh, id),
         un AS (SELECT ga, gb, count(*) AS un,
               CAST(max(CASE WHEN r = 256 THEN hh END) AS BIGINT)
                 AS utheta FROM (
           SELECT ga, gb, hh,
             row_number() OVER (PARTITION BY ga, gb
               ORDER BY hh, id) AS r FROM mg)
           GROUP BY 1, 2),
         unx AS (SELECT ga, gb,
           CASE WHEN un < 256 THEN CAST(un AS DOUBLE)
                ELSE 255.0 * CAST(1152921504606846976 AS DOUBLE)
                  / CAST(utheta AS DOUBLE) END AS estu FROM un),
         xi AS (SELECT a.g AS ga, b.g AS gb, count(*) AS xi
                FROM d a JOIN d b ON a.id = b.id AND a.g < b.g
                GROUP BY 1, 2)
         SELECT prs.ga AS group_a, prs.gb AS group_b,
           CAST(ea AS BIGINT) AS exact_a, CAST(eb AS BIGINT) AS exact_b,
           CAST(coalesce(xi.xi, 0) AS BIGINT) AS exact_intersection,
           CAST(ea + eb - coalesce(xi.xi, 0) AS BIGINT) AS exact_union,
           round(esta, 4) AS est_a, round(estb, 4) AS est_b,
           round(estu, 4) AS est_union,
           round(greatest(esta + estb - estu, 0.0), 4)
             AS est_intersection,
           CAST(abs(greatest(esta + estb - estu, 0.0)
               - CAST(coalesce(xi.xi, 0) AS DOUBLE))
             <= 0.1875 * CAST(ea + eb - coalesce(xi.xi, 0) AS DOUBLE)
               + 2.0 AS INT) AS within_tol
         FROM prs JOIN unx USING (ga, gb) LEFT JOIN xi USING (ga, gb)
         ORDER BY 1, 2""",
  )

  /** The nine Benford shares log10(1 + 1/d) as the engine's own
    * double literals — interpolated into the q189 oracle so both
    * sides multiply identical doubles.
    */
  private val benfordShareCase: String =
    "CASE digit " + (1 to 9).map(d =>
      s"WHEN $d THEN ${math.log10(1.0 + 1.0 / d)}").mkString(" ") +
      " END"

  /** Robust outlier screen — the median/MAD twin of q55's mean/stddev
    * z-score: modified z = 0.6745·(x − median) / MAD (Iglewicz &
    * Hoaglin's B-statistic), flagged at |z| > 3.5. Medians are exact
    * (oracle value-equality); the z is rounded to 4 BEFORE the cut so
    * boundary rows can't flip between engines; zero-MAD groups (over
    * half the group at one value) are excluded rather than divided.
    */
  private[graft] def robustOutliersQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
    val med = o.groupBy("o_orderpriority")
      .agg(median(col("o_totalprice")).as("__med"))
    val dev = o.join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("__ad", abs(col("o_totalprice") - col("__med")))
    val mad = dev.groupBy("o_orderpriority")
      .agg(median(col("__ad")).as("__mad"))
    dev.join(broadcast(mad), Seq("o_orderpriority"))
      .where(col("__mad") > 0)
      .withColumn("__mz", round(
        lit(0.6745) * (col("o_totalprice") - col("__med"))
          / col("__mad"), 4))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("__mz")) > 3.5, 1L).otherwise(0L))
          .as("n_outliers"),
        round(max(col("__med")), 2).as("median_price"),
        round(max(col("__mad")), 2).as("mad"),
        round(max(abs(col("__mz"))), 4).as("max_abs_mz"))
      .orderBy("o_orderpriority")
  }

  /** Bucketed delete-one jackknife SE for revenue-per-unit
    * ([[Analytics.jackknifeRatio]]): cents over quantity units, 32
    * md5 buckets on the order key.
    */
  private[graft] def jackknifeRatioQ(
      s: SparkSession, dir: String): DataFrame =
    // scale 1e4 for a ~1e5-magnitude cents-per-unit ratio: resolution
    // 1e-4 cents, deviation headroom ~5e4 ratio units per bucket
    Analytics.jackknifeRatio(t(s, dir, "lineitem"),
      round(col("l_extendedprice") * 100).cast("long"),
      col("l_quantity").cast("long"),
      col("l_orderkey"), buckets = 32, scale = 1e4)

  /** Distinct l-diversity of order status within (priority, month)
    * quasi-identifier classes ([[graft.quality.Privacy
    * .lDiversityReport]]) — the homogeneity-attack audit next to
    * q170's k-anonymity.
    */
  private[graft] def lDiversityQ(
      s: SparkSession, dir: String): DataFrame =
    graft.quality.Privacy.lDiversityReport(
        t(s, dir, "orders").withColumn("__ym",
          date_format(col("o_orderdate"), "yyyy-MM")),
        Seq("o_orderpriority", "__ym"), "o_orderstatus", l = 3)
      .select(col("distinct_sensitive"), col("n_classes"),
        col("n_rows"), col("violates"))
      .orderBy("distinct_sensitive")

  /** Theil-T spend inequality by market segment
    * ([[Analytics.theilDecomposition]]): per-customer spend cents,
    * per-segment Theil plus the exact within/between decomposition
    * on the `__total__` row — q89's Gini question answered
    * decomposably.
    */
  private[graft] def theilQ(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(sum(floor(col("o_totalprice") * 100)).as("cents"))
    Analytics.theilDecomposition(spend, "c_mktsegment", col("cents"))
      .orderBy("c_mktsegment")
  }

  /** Gini concentration of customer spend per market segment
    * ([[Analytics.giniConcentration]]): the bounded [0,1) Lorenz
    * summary beside q250's Theil and q190's HHI — exact sorted-index
    * numerator over cents via the two-pass rankByRange, one double
    * division at the end.
    */
  private[graft] def giniQ(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(sum(floor(col("o_totalprice") * 100)).as("cents"))
    Analytics.giniConcentration(spend, "c_mktsegment", col("cents"),
        col("c_custkey"))
      .orderBy("c_mktsegment")
  }

  /** Split-conformal 90% bands per priority
    * ([[Analytics.conformalCoverage]]): odd orders calibrate a
    * cents-exact group-mean predictor and the ⌈(n+1)·0.9⌉-th
    * smallest residual; even orders verify the guaranteed ≥ 0.9
    * coverage empirically. All integer until the one coverage
    * division.
    */
  private[graft] def conformalQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").where(col("o_totalprice").isNotNull)
    Analytics.conformalCoverage(
        o.where(col("o_orderkey") % 2 === 1),
        o.where(col("o_orderkey") % 2 === 0),
        floor(col("o_totalprice") * 100),
        Seq("o_orderpriority"), alphaMilli = 100)
      .orderBy("o_orderpriority")
  }

  /** Segment screen with FDR control ([[Analytics.permutationTests]]
    * → [[Analytics.bhSelect]]): one hash-randomization test per event
    * type for a cohort mean-value difference (unit = user, cohort =
    * even user_id, a 2× shift planted into even users' `purchase`
    * values), then Benjamini–Hochberg step-up at α = 0.05 over the
    * exact rational p-values — the screen→select composition every
    * many-segment monitor needs, float-free at the selection
    * boundary. 99 replicas keep the replica fan-out (units × R)
    * oracle-friendly.
    */
  private[graft] def segmentFdrQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val mult = when(col("user_id") % 2 === 0 &&
      col("event_type") === "purchase", 2.0).otherwise(1.0)
    val tests = Analytics.permutationTests(
      e.withColumn("__cents",
        floor(col("value") * mult * 100).cast("long")),
      Seq("event_type"), col("user_id"), col("__cents"),
      col("user_id") % 2 === 0, replicas = 99, salt = "q260")
    Analytics.bhSelect(tests
        .withColumn("__pn", col("n_extreme") + 1L)
        .withColumn("__pd", col("r_valid") + 1L),
        Seq("event_type"), col("__pn"), col("__pd"), alphaMilli = 50)
      .orderBy("event_type")
  }

  /** Kendall τ-b ([[Analytics.kendallTauB]]) between quantity and the
    * 10k-wide extended-price band per return flag — the concordance
    * reading beside q238's Spearman on the same relationship: both
    * axes are SMALL bounded integer domains (quantity 1–50, ~11 price
    * bands), exactly the ordinal×ordinal shape where the contingency
    * cell-pair method is row-count-free. Exact integer C/D/tie
    * counts, one double division.
    */
  private[graft] def kendallQ(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      col("l_quantity").cast("int").as("qty"),
      floor(col("l_extendedprice") / 10000).cast("int")
        .as("price_band"))
    Analytics.kendallTauB(li, "qty", "price_band", Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  /** Spearman rank correlation ([[Analytics.spearmanCorr]]) of
    * quantity vs extended price per return flag — the monotone
    * association Pearson under-reads on a multiplicative relation
    * with heavy ties (quantities are small integers: the tie-average
    * half-unit rank machinery is load-bearing, not a corner case).
    */
  private[graft] def spearmanQ(s: SparkSession, dir: String): DataFrame =
    Analytics.spearmanCorr(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", Seq("l_returnflag"))
      .orderBy("l_returnflag")

  /** Benford first-digit audit ([[Analytics.benfordAudit]]): leading-
    * digit distribution of order totals (exact cents) per order
    * priority vs Benford's law, with per-digit expected counts and
    * the per-group chi-square — the forensic screen for fabricated
    * amounts.
    */
  private[graft] def benfordAuditQ(s: SparkSession, dir: String): DataFrame =
    Analytics.benfordAudit(t(s, dir, "orders"), "o_orderpriority",
        round(col("o_totalprice") * 100, 0).cast("long"))
      .orderBy("o_orderpriority", "digit")

  /** Customer spend concentration ([[Analytics.concentrationReport]]):
    * HHI / top-k share / effective-N of per-customer order spend
    * within each market segment — shares quantized to exact
    * micro-units so the concentration index is engine-deterministic.
    */
  private[graft] def spendConcentrationQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.concentrationReport(
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")),
            col("o_custkey") === col("c_custkey")),
        "c_mktsegment", "o_custkey",
        round(col("o_totalprice") * 100, 0).cast("long"))
      .orderBy("c_mktsegment")

  /** Kaplan–Meier churn survival ([[Analytics.kaplanMeier]]): per
    * market segment, survival over customer "lifetime" (days between
    * first and last order), where a last order more than 90 days
    * before the global latest order date counts as observed churn and
    * later activity is censored — the product-limit curve behind
    * retention forecasting.
    */
  private[graft] def kaplanMeierQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
    val perCust = o.groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("__first"),
        max(col("o_orderdate").cast("date")).as("__last"))
    val mx = perCust.agg(max(col("__last")).as("__mx"))
    val subjects = perCust.crossJoin(broadcast(mx))
      .select(col("c_mktsegment"),
        datediff(col("__last"), col("__first")).as("__dur"),
        (col("__last") < date_sub(col("__mx"), 90)).as("__event"))
    Analytics.kaplanMeier(subjects, "c_mktsegment",
        col("__dur"), col("__event"))
      .orderBy("c_mktsegment", "t")
  }

  /** Restricted mean survival time ([[Analytics.rmst]]) on q191's
    * exact churn-subject frame at τ = 365 days: the average
    * retained days a customer accrues in their first year, per
    * segment — the single-number summary of the q191 curve
    * (VERDICT r16 task 4, completing the survival shelf). The area
    * accumulates as an exact BIGINT in nano·days over the same
    * double fold q191's oracle replays; `rmst_days` is one
    * mirrored unrounded division.
    */
  private[graft] def rmstQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
    val perCust = o.groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("__first"),
        max(col("o_orderdate").cast("date")).as("__last"))
    val mx = perCust.agg(max(col("__last")).as("__mx"))
    val subjects = perCust.crossJoin(broadcast(mx))
      .select(col("c_mktsegment"),
        datediff(col("__last"), col("__first")).as("__dur"),
        (col("__last") < date_sub(col("__mx"), 90)).as("__event"))
    Analytics.rmst(subjects, "c_mktsegment",
        col("__dur"), col("__event"), tau = 365L)
      .orderBy("c_mktsegment")
  }

  /** Nelson–Aalen cumulative hazard ([[Analytics.nelsonAalen]]) on
    * q191's exact churn-subject frame — the additive hazard reading
    * next to the KM survival curve: increments nano-floored before
    * the running sum, Breslow survival exp(−H) ≥ KM at every t (the
    * spec pins it), Σd/n² standard error alongside.
    */
  private[graft] def nelsonAalenQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
    val perCust = o.groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("__first"),
        max(col("o_orderdate").cast("date")).as("__last"))
    val mx = perCust.agg(max(col("__last")).as("__mx"))
    val subjects = perCust.crossJoin(broadcast(mx))
      .select(col("c_mktsegment"),
        datediff(col("__last"), col("__first")).as("__dur"),
        (col("__last") < date_sub(col("__mx"), 90)).as("__event"))
    Analytics.nelsonAalen(subjects, "c_mktsegment",
        col("__dur"), col("__event"))
      .orderBy("c_mktsegment", "t")
  }

  /** Categorical association screen ([[Analytics.associationReport]]):
    * market segment × order priority — χ² via the sparse identity
    * N·(Σ n²/(r·c) − 1) (zero cells need no densifying grid),
    * Cramér's V, mutual information, and both Theil's U coefficients
    * in one row.
    */
  private[graft] def segmentPriorityAssocQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.associationReport(
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey")),
      col("c_mktsegment"), col("o_orderpriority"))

  /** Poisson bootstrap CI ([[Analytics.bootstrapRatioCI]]): the
    * average order value (Σ spend / Σ orders over per-customer
    * units), with 199 md5-keyed Poisson(1)-weighted replicates — the
    * resampling-free bootstrap that runs as one fan-out aggregation
    * at any scale; weights are integer threshold-counts, CI bounds
    * exact order statistics of the sorted replicate array.
    */
  private[graft] def bootstrapCiQ(s: SparkSession, dir: String): DataFrame =
    Analytics.bootstrapRatioCI(
      t(s, dir, "orders").select(col("o_custkey").as("__u"),
        round(col("o_totalprice") * 100, 0).cast("long").as("__num"),
        lit(1L).as("__den")),
      col("__u"), col("__num"), col("__den"),
      replicas = 199, salt = "q208")

  /** Conversion-latency SLA report: view→purchase delays from the
    * streaming interval join's batch twin, exact interpolated
    * p50/p90/p99 per day ([[Analytics.percentiles]] — oracle mode;
    * the 100 TB path flips `approx = true` for the decomposable
    * sketch). Completes the funnel family with the "how fast do they
    * convert" cut.
    */
  private[graft] def conversionDelayQ(
      s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val pairs = graft.streaming.EventStreams.intervalJoin(
      ev.where(col("event_type") === "view"),
      ev.where(col("event_type") === "purchase"),
      horizon = "30 minutes")
    val delays = pairs.select(
      date_format(date_trunc("day", col("l_ts")), "yyyy-MM-dd")
        .as("day"),
      (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
        .as("delay_us"))
    Analytics.percentiles(delays, Seq("day"), col("delay_us"),
        Seq(0.5, 0.9, 0.99))
      .select(col("day"), col("n"),
        round(col("p50") / 1e6, 4).as("p50_sec"),
        round(col("p90") / 1e6, 4).as("p90_sec"),
        round(col("p99") / 1e6, 4).as("p99_sec"))
      .orderBy("day")
  }

  /** Bradley–Terry brand strengths ([[Analytics.bradleyTerry]]):
    * within every order, each cheaper-line brand "beats" each
    * pricier-line brand; 8 exact fixed-point MM rounds rank the
    * brands — the pairwise-preference model behind RLHF reward data,
    * exercised on the basket-duel graph.
    */
  private[graft] def brandBtQ(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("__ok"),
        col("p_brand").as("__brand"),
        col("l_extendedprice").as("__price"),
        col("l_linenumber").as("__ln"))
    val comp = li.alias("x").join(li.alias("y"),
        col("x.__ok") === col("y.__ok") &&
        col("x.__ln") < col("y.__ln") &&
        col("x.__brand") =!= col("y.__brand") &&
        col("x.__price") =!= col("y.__price"))
      .select(
        when(col("x.__price") < col("y.__price"), col("x.__brand"))
          .otherwise(col("y.__brand")).as("winner"),
        when(col("x.__price") < col("y.__price"), col("y.__brand"))
          .otherwise(col("x.__brand")).as("loser"))
    Analytics.bradleyTerry(comp, "winner", "loser", iters = 8)
      .orderBy(col("strength_micro").desc, col("item"))
  }

  /** KMV audience-overlap audit ([[Analytics.kmvOverlap]]): pairwise
    * distinct-user intersection estimates between event types from
    * bottom-256 md5 sketches — the set operation HLL can't do —
    * verified in-query against the exact intersections (deterministic
    * flag: md5 is fixed).
    */
  private[graft] def kmvOverlapQ(s: SparkSession, dir: String): DataFrame =
    Analytics.kmvOverlap(events(s, dir), "event_type", "user_id",
        k = 256)
      .orderBy("group_a", "group_b")

  /** One Bradley–Terry MM round as oracle CTEs: per-pair terms
    * quantize by BIGINT `//` BEFORE the per-item sum, update and
    * normalization are floor divisions — positive-operand `div`
    * (engine) equals `//` (DuckDB), so the fixed point replays
    * bit-for-bit.
    */
  private def btRound(i: Int): String = {
    val prev = s"p${i - 1}"
    s"""tr$i AS MATERIALIZED (
         SELECT a, b, m, pa.p AS pa, pb.p AS pb
         FROM pairs
         JOIN $prev pa ON pa.item = a JOIN $prev pb ON pb.item = b),
       dr$i AS MATERIALIZED (
         SELECT item, CAST(sum(t) AS BIGINT) AS d FROM (
           SELECT a AS item,
             (m * 1000000000000) // (pa + pb) AS t FROM tr$i
           UNION ALL SELECT b,
             (m * 1000000000000) // (pa + pb) FROM tr$i)
         GROUP BY 1),
       ur$i AS MATERIALIZED (
         SELECT items.item,
           CASE WHEN d IS NOT NULL AND wins > 0
             THEN (wins * 1000000000000) // d ELSE 0 END AS p0
         FROM items LEFT JOIN dr$i USING (item)),
       tt$i AS MATERIALIZED (SELECT CAST(sum(p0) AS BIGINT) AS tot FROM ur$i),
       p$i AS MATERIALIZED (
         SELECT item,
           greatest((p0 * nn.n * 1000000) // tot, 1) AS p
         FROM ur$i CROSS JOIN tt$i CROSS JOIN nn)"""
  }

  /** The Poisson(1) weight as pure integer threshold comparisons over
    * the 32-bit md5 value — Analytics.poissonThresholds interpolated
    * so the oracle draws byte-identical weights.
    */
  private[graft] def poissonWeightSql(u: String): String =
    graft.operators.Analytics.poissonThresholds
      .map(t => s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** Wilson bounds for per-priority fulfillment rates
    * ([[Analytics.wilsonRates]]): only correctly-rounded IEEE ops
    * (+ − × ÷ sqrt) over exact counts, so no quantization is needed
    * for bit-equality with the oracle.
    */
  private[graft] def wilsonRatesQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.wilsonRates(t(s, dir, "orders"), Seq("o_orderpriority"),
        col("o_orderstatus") === "F", z = 1.96)
      .orderBy("o_orderpriority")

  /** Cochran–Armitage trend-in-proportions ([[Analytics.cochranArmitage]])
    * across the five order-priority levels per market segment: is the
    * flag rate climbing with the priority ladder? A deterministic
    * dose-response (rate 10% + 6%·level) is planted on the MACHINERY
    * segment via orderkey arithmetic the oracle re-seeds; the other
    * segments carry the flat 10% base rate, so the test must flag
    * MACHINERY decisively (z = 3.96 at sf0.001, 9.10 at sf0.01); the
    * flat segments read as the sample actually falls (orderkey mod
    * isn't perfectly uniform per cell at a few hundred rows). Every
    * moment is an exact integer; z is one mirrored division + sqrt.
    */
  private[graft] def cochranArmitageQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = substring(col("o_orderpriority"), 1, 1).cast("long")
    val flag = when(col("c_mktsegment") === "MACHINERY",
      col("o_orderkey") % 100 < lit(10L) + w * 6L)
      .otherwise(col("o_orderkey") % 100 < 10L)
    val joined = o.join(broadcast(c),
      col("o_custkey") === col("c_custkey"))
    Analytics.cochranArmitage(joined, Seq("c_mktsegment"), w,
        flag.cast("long"))
      .orderBy("c_mktsegment")
  }

  /** Kruskal–Wallis k-sample rank test ([[Analytics.kruskalWallis]]):
    * within each market segment, do the five order-priority levels
    * differ in total-price distribution AT ALL? The any-difference
    * complement of q287's directional dose test, on the same planted
    * MACHINERY ladder (a +5%·level multiplicative shift the oracle
    * re-seeds): MACHINERY's H' lands far past the dof-4 critical
    * value while the flat segments stay under it. Pooled tie-averaged
    * ranks from (segment, priority, cents) cells — value-domain-sized
    * windows, category-sized arithmetic after.
    */
  private[graft] def kruskalWallisQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = substring(col("o_orderpriority"), 1, 1).cast("long")
    val cents = when(col("c_mktsegment") === "MACHINERY",
      floor(col("o_totalprice") * 100 *
        (lit(1.0) + w.cast("double") * 0.05)))
      .otherwise(floor(col("o_totalprice") * 100))
      .cast("long")
    val joined = o.join(broadcast(c),
      col("o_custkey") === col("c_custkey"))
    Analytics.kruskalWallis(joined, Seq("c_mktsegment"),
        col("o_orderpriority"), cents)
      .orderBy("c_mktsegment")
  }

  /** Dunn's post-hoc ([[Analytics.dunnPosthoc]]) after q291's
    * Kruskal–Wallis omnibus, on the same planted MACHINERY ladder:
    * the omnibus says MACHINERY's priorities differ — this says
    * WHICH PAIRS, on the same pooled ranks, Bonferroni-guarded at
    * the group's own m = 10 comparisons. The extreme-dose pairs
    * (1-URGENT vs 5-LOW) light up; adjacent doses don't — the
    * drill-down a segment owner actually reads.
    */
  private[graft] def dunnPosthocQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = substring(col("o_orderpriority"), 1, 1).cast("long")
    val cents = when(col("c_mktsegment") === "MACHINERY",
      floor(col("o_totalprice") * 100 *
        (lit(1.0) + w.cast("double") * 0.05)))
      .otherwise(floor(col("o_totalprice") * 100))
      .cast("long")
    val joined = o.join(broadcast(c),
      col("o_custkey") === col("c_custkey"))
    Analytics.dunnPosthoc(joined, Seq("c_mktsegment"),
        col("o_orderpriority"), cents)
      .orderBy("c_mktsegment", "cat_a", "cat_b")
  }

  /** Jonckheere–Terpstra ([[Analytics.jonckheereTerpstra]]) on
    * q291's exact MACHINERY dose ladder — the ORDERED question next
    * to KW's omnibus: KW asks "do any priorities differ" and spends
    * power on every permutation; JT bets the alternative is monotone
    * in the priority digit and reads the same plant with a sharper
    * z. MACHINERY fires, the un-planted segments stay quiet.
    */
  private[graft] def jonckheereQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = substring(col("o_orderpriority"), 1, 1).cast("long")
    val cents = when(col("c_mktsegment") === "MACHINERY",
      floor(col("o_totalprice") * 100 *
        (lit(1.0) + w.cast("double") * 0.05)))
      .otherwise(floor(col("o_totalprice") * 100))
      .cast("long")
    val joined = o.join(broadcast(c),
      col("o_custkey") === col("c_custkey"))
    Analytics.jonckheereTerpstra(joined, Seq("c_mktsegment"),
        w, cents)
      .orderBy("c_mktsegment")
  }

  /** Empirical-Bayes shrinkage of per-customer fulfillment rates
    * ([[Analytics.ebShrinkRates]], beta-binomial method-of-moments
    * prior): the 2/2-vs-950/1000 ranking fix.
    * The prior moments fold the SORTED customer-rate array, so the
    * float summation order is pinned for the oracle replay.
    */
  private[graft] def ebShrinkageQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.ebShrinkRates(t(s, dir, "orders"), "o_custkey",
        col("o_orderstatus") === "F")
      .orderBy("group")

  /** Friedman test ([[Analytics.friedmanTest]]) per user segment:
    * blocks = days, treatments = event types, cell = daily value
    * sum. TWO plants prove the blocked design: a ×3 whole-day shock
    * on every 7th day (all segments — a block-level effect Friedman
    * must be structurally BLIND to, where pooled-rank KW would read
    * it as signal), and a ×2.5 purchase boost in seg0 only, the
    * within-block consistent ordering that does fire. seg1/seg2 stay
    * quiet — daily type sums are exchangeable there.
    */
  /** Kendall's W ([[Analytics.kendallW]]) per order status: do the
    * five market segments (judges) agree on the spend ORDERING of
    * the five order priorities (items)? The agreement read next to
    * q306's Friedman verdict — same cells (judge × item exact-cent
    * spend sums), same doubled-rank machinery, W = Q/(b(k−1)).
    * TPC-H spend is priority-uniform by generator, so segments'
    * orderings are near-random and W sits close to 0 — the honest
    * no-concordance baseline a detector-panel W would be read
    * against.
    */
  private[graft] def kendallWQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
    Analytics.kendallW(o, Seq("o_orderstatus"),
        col("c_mktsegment"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100))
      .orderBy("o_orderstatus")
  }

  private[graft] def friedmanQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull &&
      col("user_id").isNotNull)
    val seg = concat(lit("seg"), (col("user_id") % 3).cast("string"))
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val shock = when(day % 7 === 0, lit(3.0)).otherwise(lit(1.0))
    val boost = when(col("user_id") % 3 === 0 &&
      col("event_type") === "purchase", lit(2.5)).otherwise(lit(1.0))
    val cents = floor(col("value") * 100 * shock * boost).cast("long")
    Analytics.friedmanTest(e.withColumn("segment", seg),
        Seq("segment"), day, col("event_type"), cents)
      .orderBy("segment")
  }

  /** Categorical association panel
    * ([[Analytics.categoricalAssociation]]) over two audited pairs
    * from ONE corpus scan (the explode(array(struct…)) long-frame
    * shape): event_type × weekday — independent by generator, the
    * near-zero V/U baseline — against event_type × value-bucket with
    * a ×2.2 purchase plant that drags purchase mass into the `high`
    * bucket: χ² says "dependent", V ≈ 0.3 says "moderately", and the
    * ASYMMETRY shows in U — knowing the bucket tells you little about
    * which of 5 types fired, knowing the type collapses much more of
    * the 3-level bucket's entropy.
    */
  private[graft] def assocPanelQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull &&
      col("event_type").isNotNull && col("ts").isNotNull)
    val vb = when(col("event_type") === "purchase",
      col("value") * 2.2).otherwise(col("value"))
    val bucket = when(vb < 25.0, "low").when(vb < 50.0, "mid")
      .otherwise("high")
    val dow = dayofweek(col("ts")).cast("string")
    val long = e.select(explode(array(
        struct(lit("type_x_dow").as("pair"),
          col("event_type").as("x"), dow.as("y")),
        struct(lit("type_x_bucket").as("pair"),
          col("event_type").as("x"), bucket.as("y")))).as("r"))
      .select(col("r.pair").as("pair"), col("r.x").as("x"),
        col("r.y").as("y"))
    Analytics.categoricalAssociation(long, "pair", "x", "y")
      .orderBy("pair")
  }

  /** Quantile-regression trend lines ([[Analytics.quantileRegPinball]])
    * of order value (cents) on order age (days since 1992-01-01) at
    * τ ∈ {10, 50, 90}%, slope grid ±5 cents/day in 1-cent steps —
    * the conditional-quantile drift monitor: diverging τ=90 and τ=10
    * slopes mean the SPREAD of order values is drifting even when the
    * median line is flat.
    */
  private[graft] def quantileRegQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.quantileRegPinball(
        t(s, dir, "orders")
          .where(col("o_orderdate").isNotNull &&
            col("o_totalprice").isNotNull),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")),
        floor(col("o_totalprice") * 100),
        tausPct = Seq(10, 50, 90),
        slopesMicro = (-5 to 5).map(_ * 1000000L))
      .orderBy("tau_pct")

  /** Hill tail-index panel ([[Analytics.hillTailIndex]]) of order
    * value per priority class, m = 100 top order statistics — the
    * tail-decay reading beside q255's Gini on the same spend data:
    * α ≈ 1–2 flags a Pareto-heavy tail where mean-based capacity
    * planning breaks.
    */
  private[graft] def hillTailQ(s: SparkSession, dir: String): DataFrame =
    Analytics.hillTailIndex(
        t(s, dir, "orders").where(col("o_totalprice").isNotNull),
        "o_orderpriority", floor(col("o_totalprice") * 100),
        col("o_orderkey"), m = 100)
      .orderBy("o_orderpriority")

  /** Quantile normalization ([[Analytics.quantileNormalize]]) of
    * order values onto the pooled all-segment distribution — the
    * batch-effect correction standard, ranked with [[Analytics
    * .rankByRange]] on both legs (the pooled leg under the constant
    * `__all` group, plan-gate pinned) so no single-task window ever
    * sorts the corpus.
    */
  private[graft] def quantileNormQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.quantileNormalize(
        t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .where(col("o_totalprice").isNotNull &&
            col("c_mktsegment").isNotNull),
        "o_orderkey", "c_mktsegment",
        floor(col("o_totalprice") * 100), col("o_orderkey"))
      .orderBy("o_orderkey")
}
