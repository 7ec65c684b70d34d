package graft.registry

import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Two-sample drift shelf — the KS, CvM, AD, Mann-Whitney, Welch,
  * Cliff's delta, variance/rate drift, permutation, Wilcoxon and
  * drift-panel / one-pager queries plus their DuckDB oracles. Split
  * from [[AnalyticsStatsShelf]] (round 16); the time-series /
  * monitoring family moved on to [[AnalyticsTimeSeriesShelf]] (round
  * 16 second wave). Member bodies are unchanged — this trait is mixed
  * back into the same [[AnalyticsRegistry]] object, so every
  * reference resolves exactly as before. Conventions: see
  * [[graft.SparkEntry]].
  */
private[graft] trait AnalyticsDriftShelf extends AnalyticsCore {

  private[graft] def driftQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q380_sinkhorn_transport" -> (sinkhornQ _),
    "q385_hbos_outliers" -> (hbosQ _),
    "q386_mahalanobis_outliers" -> (mahalanobisQ _),
    "q164_ks_drift" -> (ksDriftQ _),
    "q201_permutation_test" -> (permutationTestQ _),
    "q237_value_mw_drift" -> (mwDriftQ _),
    "q261_cvm_drift" -> (cvmDriftQ _),
    "q277_drift_panel" -> (driftPanelQ _),
    "q278_drift_panel_store" -> (driftPanelStoreQ _),
    "q281_wilcoxon_paired" -> (wilcoxonPairedQ _),
    "q292_effect_size" -> (effectSizeQ _),
    "q295_variance_drift" -> (varianceDriftQ _),
    "q298_rate_drift" -> (rateDriftQ _),
    "q299_drift_one_pager" -> (driftOnePagerQ _),
    "q301_one_pager_store" -> (onePagerStoreQ _),
    "q305_welch_ttest" -> (welchTQ _),
    "q315_ad_drift" -> (adDriftQ _),
    "q317_cliffs_delta" -> (cliffsDeltaQ _),
    "q338_wasserstein_drift" -> (wassersteinDriftQ _),
  )

  private[graft] def driftOracleSql: Map[String, String] = Map(
    // exact integer binning ((v−min)·bins div span+1), nano-floored
    // lns per (feature, bin), exact BIGINT score sums — the ranking
    // never touches a float
    "q385_hbos_outliers" ->
      """WITH b AS (
           SELECT o_orderkey AS id,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS price,
             CAST(date_diff('day', DATE '1992-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS day_,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS balance
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
             AND c_acctbal IS NOT NULL),
         lng AS (
           SELECT id, 'price' AS f, price AS v FROM b
           UNION ALL SELECT id, 'day', day_ FROM b
           UNION ALL SELECT id, 'balance', balance FROM b),
         rg AS (
           SELECT f, min(v) AS mn, max(v) AS mx,
             CAST(count(*) AS BIGINT) AS n
           FROM lng WHERE v IS NOT NULL GROUP BY 1),
         binned AS (
           SELECT id, lng.f, ((v - mn) * 20) // (mx - mn + 1) AS bn
           FROM lng JOIN rg USING (f) WHERE v IS NOT NULL),
         bc AS (SELECT f, bn, CAST(count(*) AS BIGINT) AS c
                FROM binned GROUP BY 1, 2),
         lt AS (
           SELECT f, bn,
             CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000000.0)
                 AS BIGINT)
               - CAST(floor(ln(CAST(c * 20 AS DOUBLE))
                 * 1000000000.0) AS BIGINT) AS lterm
           FROM bc JOIN rg USING (f))
         SELECT id AS o_orderkey,
           CAST(count(*) AS BIGINT) AS n_features,
           CAST(sum(lterm) AS BIGINT) AS hbos_nano
         FROM binned JOIN lt USING (f, bn)
         GROUP BY 1 ORDER BY hbos_nano DESC, o_orderkey LIMIT 40""",
    // exact HUGEINT centered moments; dx = n·x − Σx clears the mean
    // division; one mirrored double chain per row
    "q386_mahalanobis_outliers" ->
      """WITH b AS (
           SELECT o_orderkey AS id,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE o_totalprice IS NOT NULL AND c_acctbal IS NOT NULL),
         m AS (
           SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM b),
         c AS (
           SELECT n, sx, sy, n * sxx - sx * sx AS cxx,
             n * sxy - sx * sy AS cxy, n * syy - sy * sy AS cyy
           FROM m),
         sc AS (
           SELECT b.id, b.x, b.y,
             CAST(c.cxx AS DOUBLE) * CAST(c.cyy AS DOUBLE)
               - CAST(c.cxy AS DOUBLE) * CAST(c.cxy AS DOUBLE)
               AS det,
             CAST(c.cyy AS DOUBLE)
                 * (CAST(c.n * b.x - c.sx AS DOUBLE)
                   * CAST(c.n * b.x - c.sx AS DOUBLE))
               - 2.0 * CAST(c.cxy AS DOUBLE)
                 * (CAST(c.n * b.x - c.sx AS DOUBLE)
                   * CAST(c.n * b.y - c.sy AS DOUBLE))
               + CAST(c.cxx AS DOUBLE)
                 * (CAST(c.n * b.y - c.sy AS DOUBLE)
                   * CAST(c.n * b.y - c.sy AS DOUBLE)) AS num,
             CAST(c.n AS DOUBLE) AS nd
           FROM b CROSS JOIN c)
         SELECT id AS o_orderkey, x, y,
           round(CASE WHEN det > 0.0
             THEN num * (nd - 1.0) / (det * nd) END, 6) AS d2
         FROM sc ORDER BY d2 DESC NULLS LAST, o_orderkey LIMIT 40""",
    // the kernel is the ONLY transcendental, quantized once per cell;
    // u/v half-steps replayed as generated CTEs (the q369/q377
    // device) — (mass·1e12) // Σ K·v exact in HUGEINT throughout
    "q380_sinkhorn_transport" -> {
      def uStep(k: Int): String =
        s"""u$k AS (
           SELECT cells.i,
             CAST((CAST(pm.p AS HUGEINT) * 1000000000000)
               // sum(CAST(kk AS HUGEINT) * v${k - 1}.v) AS BIGINT)
               AS u
           FROM cells JOIN v${k - 1} USING (j)
           JOIN pm ON pm.i = cells.i
           GROUP BY cells.i, pm.p)"""
      def vStep(k: Int): String =
        s"""v$k AS (
           SELECT cells.j,
             CAST((CAST(qm.q AS HUGEINT) * 1000000000000)
               // sum(CAST(kk AS HUGEINT) * u$k.u) AS BIGINT) AS v
           FROM cells JOIN u$k USING (i)
           JOIN qm ON qm.j = cells.j
           GROUP BY cells.j, qm.q)"""
      s"""WITH o AS (
           SELECT o_orderpriority AS pr, CAST(o_orderdate AS DATE)
             AS d
           FROM orders
           WHERE o_orderpriority IS NOT NULL
             AND o_orderdate IS NOT NULL),
         pc AS (SELECT pr AS i, CAST(count(*) AS BIGINT) AS c
                FROM o WHERE d < DATE '1995-06-01' GROUP BY 1),
         qc AS (SELECT pr AS j, CAST(count(*) AS BIGINT) AS c
                FROM o WHERE d >= DATE '1995-06-01' GROUP BY 1),
         pt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM pc),
         qt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM qc),
         pm AS (SELECT i, (c * 1000000) // t AS p
                FROM pc CROSS JOIN pt),
         qm AS (SELECT j, (c * 1000000) // t AS q
                FROM qc CROSS JOIN qt),
         cc AS (
           SELECT i, j,
             abs(CAST(substr(i, 1, 1) AS BIGINT)
               - CAST(substr(j, 1, 1) AS BIGINT)) AS c
           FROM pm CROSS JOIN qm),
         cells AS (
           SELECT i, j, c,
             CAST(floor(exp(-CAST(c AS DOUBLE) * 2) * 1000000.0)
               AS BIGINT) AS kk
           FROM cc),
         v0 AS (SELECT j, CAST(1000000 AS BIGINT) AS v FROM qm),
         ${(1 to 3).map(k => uStep(k) + ",\n         " + vStep(k))
          .mkString(",\n         ")},
         plan AS (
           SELECT cells.i, cells.j, cells.c,
             ((CAST(u3.u AS HUGEINT) * kk // 1000000) * v3.v)
               // 1000000 AS pl
           FROM cells JOIN u3 ON u3.i = cells.i
           JOIN v3 ON v3.j = cells.j),
         tot AS (SELECT sum(pl * c) AS tc FROM plan)
         SELECT i AS src_label, j AS dst_label, c AS cost,
           CAST(pl AS BIGINT) AS plan_micro,
           CAST(tc AS BIGINT) AS ot_cost_micro
         FROM plan CROSS JOIN tot ORDER BY 1, 2"""
    },
    // MW-U replay: per-distinct-value counts -> half-unit average
    // ranks via the cumulative window -> exact BIGINT rank sum and
    // HUGEINT tie cubes -> the one double formula, op order mirrored
    "q237_value_mw_drift" ->
      """WITH ev AS (
           SELECT event_type,
             CASE WHEN event_id % 2 = 0 AND event_type = 'purchase'
               THEN value * 1.1 ELSE value END AS v,
             CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS b
           FROM events WHERE value IS NOT NULL),
         per AS (
           SELECT event_type, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT event_type, cb, cc, cb + cc AS t,
             coalesce(sum(cb + cc) OVER (PARTITION BY event_type
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS c
           FROM per),
         r AS (SELECT event_type, cb, t, 2 * c + t + 1 AS rank2
           FROM cum),
         agg AS (
           SELECT event_type,
             CAST(sum(cb) AS BIGINT) AS n1,
             CAST(sum(t - cb) AS BIGINT) AS n2,
             CAST(sum(cb * rank2) AS BIGINT) AS r12,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
           FROM r GROUP BY 1),
         f AS (
           SELECT event_type, n1, n2, r12 - n1 * (n1 + 1) AS u_half,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                 - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS sigma2
           FROM agg)
         SELECT event_type, n1 AS n_base, n2 AS n_cur, u_half,
           round(CAST(u_half AS DOUBLE) / 2.0, 1) AS u,
           round((CAST(u_half AS DOUBLE) / 2.0
             - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2), 6) AS z,
           CAST(abs((CAST(u_half AS DOUBLE) / 2.0
             - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2)) > 1.96
             AS INTEGER) AS drifted
         FROM f ORDER BY event_type""",
    // the q164 CTE machinery with the squared-gap HUGEINT sum in
    // place of the supremum; T = Σ t·(i·m − j·n)² / (nm(n+m)²), one
    // mirrored double division
    "q261_cvm_drift" ->
      """WITH base AS (
           SELECT o_orderpriority AS g, o_totalprice AS v
           FROM orders WHERE o_orderkey % 2 = 1),
         cur AS (
           SELECT o_orderpriority AS g,
             CASE WHEN o_orderpriority = '1-URGENT'
               THEN o_totalprice * 1.10 ELSE o_totalprice END AS v
           FROM orders WHERE o_orderkey % 2 = 0),
         u AS (
           SELECT g, v, 1 AS b FROM base
           UNION ALL SELECT g, v, 0 FROM cur),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM u GROUP BY g, v),
         cum AS (
           SELECT g, cb, cc,
             CAST(sum(cb) OVER w AS BIGINT) AS i,
             CAST(sum(cc) OVER w AS BIGINT) AS j,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n1,
             CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS n2
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         agg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             sum(CAST(cb + cc AS HUGEINT)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1))
               AS s
           FROM cum GROUP BY g)
         SELECT g AS o_orderpriority, n_base, n_cur,
           CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
             ELSE round(CAST(s AS DOUBLE)
               / CAST(CAST(n_base AS HUGEINT) * n_cur
                 * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE), 6)
             END AS cvm_t,
           CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
             WHEN CAST(s AS DOUBLE)
               / CAST(CAST(n_base AS HUGEINT) * n_cur
                 * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE)
               > 0.461 THEN 1 ELSE 0 END AS INT) AS drifted
         FROM agg ORDER BY o_orderpriority""",
    // the q237 rank machinery on |d| with signs: half-unit tie-
    // averaged ranks, HUGEINT rank sums and tie cubes, one mirrored
    // double z; exact-cents differences so d is integer-exact
    "q281_wilcoxon_paired" ->
      """WITH sp AS (
           SELECT c_mktsegment AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS b,
             CAST(floor(o_totalprice * 100) AS BIGINT)
               + (o_orderkey % 7 - 3)
               + CASE WHEN c_mktsegment = 'BUILDING'
                 THEN CAST(floor(o_totalprice) AS BIGINT)
                 ELSE 0 END AS c
           FROM orders JOIN customer ON o_custkey = c_custkey),
         pr AS (
           SELECT g, CAST(c AS DOUBLE) - CAST(b AS DOUBLE) AS d
           FROM sp),
         nz AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_zero
           FROM pr WHERE d = 0 GROUP BY g),
         per AS (
           SELECT g, abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS tp
           FROM pr WHERE d <> 0 GROUP BY g, abs(d)),
         cum AS (
           SELECT g, t, tp,
             coalesce(sum(t) OVER (PARTITION BY g ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS c
           FROM per),
         r AS (SELECT g, t, tp, 2 * c + t + 1 AS rank2 FROM cum),
         agg AS (
           SELECT g, CAST(sum(t) AS BIGINT) AS n_pairs,
             sum(CAST(tp AS HUGEINT) * rank2) AS w2,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
           FROM r GROUP BY g),
         f AS (
           SELECT g, n_pairs, w2,
             CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
               / 4.0 AS mu,
             CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
               * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0
               - CAST(ties AS DOUBLE) / 48.0 AS sigma2
           FROM agg)
         SELECT g AS c_mktsegment, n_pairs,
           coalesce(n_zero, 0) AS n_zero,
           CAST(w2 AS BIGINT) AS w_plus_half,
           CASE WHEN n_pairs < 1 OR sigma2 <= 0 THEN NULL
             ELSE round((CAST(w2 AS DOUBLE) / 2.0 - mu) / sqrt(sigma2),
               6) END AS z,
           CAST(CASE WHEN n_pairs < 1 OR sigma2 <= 0 THEN 0
             WHEN abs((CAST(w2 AS DOUBLE) / 2.0 - mu) / sqrt(sigma2))
               > 1.96 THEN 1 ELSE 0 END AS INT) AS drifted
         FROM f LEFT JOIN nz USING (g)
         ORDER BY c_mktsegment""",
    // the oracle is the RAW two-sample six-axis page: the engine's
    // shard-merged store path must land on identical statistics
    "q301_one_pager_store" ->
      """WITH b0 AS (
           SELECT event_type AS g,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
         c0 AS (
           SELECT event_type AS g,
             CAST(floor((CASE WHEN event_type = 'purchase'
               THEN value * 1.1 ELSE value END) * 100) AS BIGINT) AS v
           FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
         u AS (
           SELECT g, v, 1 AS b FROM b0
           UNION ALL SELECT g, v, 0 FROM c0),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM u GROUP BY g, v),
         cum AS (
           SELECT g, cb, cc,
             CAST(sum(cb) OVER w AS BIGINT) AS i,
             CAST(sum(cc) OVER w AS BIGINT) AS j,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n1,
             CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS n2
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         kagg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             max(abs(i * n2 - j * n1)) AS ks_scaled,
             sum(CAST(cb + cc AS HUGEINT)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1))
               AS s
           FROM cum GROUP BY g),
         ks AS (
           SELECT g, n_base, n_cur,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(ks_scaled AS DOUBLE)
                 / (n_base * n_cur), 6) END AS ks_d,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(ks_scaled AS DOUBLE) / (n_base * n_cur) >
                 1.358 * sqrt(CAST(n_base + n_cur AS DOUBLE)
                   / (n_base * n_cur)) THEN 1 ELSE 0 END AS INT)
               AS ks_drifted,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE),
                 6) END AS cvm_t,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE)
                 > 0.461 THEN 1 ELSE 0 END AS INT) AS cvm_drifted
           FROM kagg),
         mcum AS (
           SELECT g, cb, cb + cc AS t,
             coalesce(sum(cb + cc) OVER (PARTITION BY g
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS c
           FROM per),
         mr AS (SELECT g, cb, t, 2 * c + t + 1 AS rank2 FROM mcum),
         magg AS (
           SELECT g,
             CAST(sum(cb) AS BIGINT) AS n1,
             CAST(sum(t - cb) AS BIGINT) AS n2,
             CAST(sum(cb * rank2) AS BIGINT) AS r12,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
           FROM mr GROUP BY g),
         mf AS (
           SELECT g, n1, n2, r12 - n1 * (n1 + 1) AS u_half,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                 - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS sigma2
           FROM magg),
         mw AS (
           SELECT g,
             round((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2), 6)
               AS mw_z,
             CAST(abs((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2)) > 1.96
               AS INT) AS mw_drifted
           FROM mf),
         tot AS (
           SELECT g, CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(cc) AS BIGINT) AS nc
           FROM per GROUP BY g),
         rate AS (
           SELECT g,
             round(CASE WHEN nb > 0 AND nc > 0
               THEN CAST(nc AS DOUBLE) / CAST(nb AS DOUBLE) END, 4)
               AS rate_ratio,
             round(CASE WHEN nb + nc = 0 THEN NULL
               ELSE (CAST(nc AS DOUBLE) - CAST(nb AS DOUBLE))
                 / sqrt(CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) END,
               6) AS rate_z,
             CAST(coalesce(abs(CASE WHEN nb + nc = 0 THEN NULL
               ELSE (CAST(nc AS DOUBLE) - CAST(nb AS DOUBLE))
                 / sqrt(CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) END)
               > 1.96, FALSE) AS INT) AS rate_drifted
           FROM tot),
         mom AS (
           SELECT g, CAST(sum(cb) AS BIGINT) AS enb,
             CAST(sum(cc) AS BIGINT) AS enc,
             sum(CAST(v AS HUGEINT) * cb) AS sb,
             sum(CAST(v AS HUGEINT) * cc) AS sc,
             sum(CAST(v AS HUGEINT) * v * cb) AS qb,
             sum(CAST(v AS HUGEINT) * v * cc) AS qc
           FROM per GROUP BY g),
         eff0 AS (
           SELECT g, enb, enc,
             CAST(CAST(enb AS HUGEINT) * qb
                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
               / (CAST(enb AS DOUBLE) * (CAST(enb AS DOUBLE) - 1.0))
               AS s2b,
             CAST(CAST(enc AS HUGEINT) * qc
                 - CAST(sc AS HUGEINT) * sc AS DOUBLE)
               / (CAST(enc AS DOUBLE) * (CAST(enc AS DOUBLE) - 1.0))
               AS s2c,
             CAST(sb AS DOUBLE) AS sbd, CAST(sc AS DOUBLE) AS scd
           FROM mom),
         eff1 AS (
           SELECT g, enb, enc,
             ((CAST(enb AS DOUBLE) - 1.0) * s2b
               + (CAST(enc AS DOUBLE) - 1.0) * s2c)
               / (CAST(enb AS DOUBLE) + CAST(enc AS DOUBLE) - 2.0)
               AS pooled,
             scd / CAST(enc AS DOUBLE) - sbd / CAST(enb AS DOUBLE)
               AS meandiff
           FROM eff0),
         eff AS (
           SELECT g,
             round(CASE WHEN enb < 2 OR enc < 2 OR pooled <= 0
               THEN NULL ELSE meandiff / sqrt(pooled) END, 6) AS d,
             CAST(coalesce(abs(CASE WHEN enb < 2 OR enc < 2
               OR pooled <= 0 THEN NULL
               ELSE meandiff / sqrt(pooled) END) >= 0.2, FALSE)
               AS INT) AS d_material
           FROM eff1),
         med AS (
           SELECT c2.g,
             min(CASE WHEN i >= (nb + 1) // 2 THEN v END)
               + min(CASE WHEN i >= nb // 2 + 1 THEN v END) AS m2b,
             min(CASE WHEN j >= (nc + 1) // 2 THEN v END)
               + min(CASE WHEN j >= nc // 2 + 1 THEN v END) AS m2c
           FROM (SELECT g, v,
               CAST(sum(cb) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS i,
               CAST(sum(cc) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS j
             FROM per) c2
           JOIN tot ON tot.g = c2.g
           GROUP BY c2.g),
         dev AS (
           SELECT per.g,
             sum(CAST(cb AS HUGEINT) * abs(2 * v - m2b)) AS zsb,
             sum(CAST(cb AS HUGEINT) * abs(2 * v - m2b)
               * abs(2 * v - m2b)) AS zqb,
             sum(CAST(cc AS HUGEINT) * abs(2 * v - m2c)) AS zsc,
             sum(CAST(cc AS HUGEINT) * abs(2 * v - m2c)
               * abs(2 * v - m2c)) AS zqc
           FROM per JOIN med ON med.g = per.g
           GROUP BY per.g),
         bff AS (
           SELECT dev.g,
             (CAST(zsb AS DOUBLE) * CAST(zsb AS DOUBLE)
                 / CAST(nb AS DOUBLE)
               + CAST(zsc AS DOUBLE) * CAST(zsc AS DOUBLE)
                 / CAST(nc AS DOUBLE)
               - (CAST(zsb AS DOUBLE) + CAST(zsc AS DOUBLE))
                 * (CAST(zsb AS DOUBLE) + CAST(zsc AS DOUBLE))
                 / (CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)))
             * ((CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) - 2.0)
             / ((CAST(zqb AS DOUBLE) - CAST(zsb AS DOUBLE)
                 * CAST(zsb AS DOUBLE) / CAST(nb AS DOUBLE))
               + (CAST(zqc AS DOUBLE) - CAST(zsc AS DOUBLE)
                 * CAST(zsc AS DOUBLE) / CAST(nc AS DOUBLE))) AS f,
             (CAST(zqb AS DOUBLE) - CAST(zsb AS DOUBLE)
                 * CAST(zsb AS DOUBLE) / CAST(nb AS DOUBLE))
               + (CAST(zqc AS DOUBLE) - CAST(zsc AS DOUBLE)
                 * CAST(zsc AS DOUBLE) / CAST(nc AS DOUBLE)) AS ssw,
             nb, nc
           FROM dev JOIN tot ON tot.g = dev.g),
         bf AS (
           SELECT g,
             round(CASE WHEN nb < 2 OR nc < 2 OR ssw <= 0 THEN NULL
               ELSE f END, 6) AS bf_f,
             CAST(coalesce((CASE WHEN nb < 2 OR nc < 2 OR ssw <= 0
               THEN NULL ELSE f END) > 3.841459, FALSE) AS INT)
               AS var_drifted
           FROM bff)
         SELECT ks.g AS event_type, n_base, n_cur, ks_d,
           ks_drifted, cvm_t, cvm_drifted, mw_z, mw_drifted,
           d, d_material, bf_f, var_drifted, rate_ratio, rate_z,
           rate_drifted
         FROM ks JOIN mw ON mw.g = ks.g JOIN eff ON eff.g = ks.g
         JOIN bf ON bf.g = ks.g JOIN rate ON rate.g = ks.g
         ORDER BY event_type""",
    // ONE count CTE feeds all six axes: the q277 ks/cvm/mw blocks,
    // the q292 effect moments, the q295 median/deviation machinery
    // and the q298 rate z — the three plants re-seeded
    "q299_drift_one_pager" ->
      """WITH b0 AS (
           SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           FROM orders WHERE o_orderkey % 2 = 1),
         c0 AS (
           SELECT o_orderpriority AS g,
             CAST(floor((CASE WHEN o_orderpriority = '1-URGENT'
                 THEN o_totalprice * 1.10
               WHEN o_orderpriority = '2-HIGH'
                 THEN o_totalprice * (CASE WHEN o_orderkey % 4 = 0
                   THEN 1.6 ELSE 0.4 END)
               ELSE o_totalprice END) * 100) AS BIGINT) AS v
           FROM orders WHERE o_orderkey % 2 = 0
             AND NOT (o_orderpriority = '5-LOW'
               AND o_orderkey % 10 IN (0, 2, 4))),
         u AS (
           SELECT g, v, 1 AS b FROM b0
           UNION ALL SELECT g, v, 0 FROM c0),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM u GROUP BY g, v),
         cum AS (
           SELECT g, cb, cc,
             CAST(sum(cb) OVER w AS BIGINT) AS i,
             CAST(sum(cc) OVER w AS BIGINT) AS j,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n1,
             CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS n2
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         kagg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             max(abs(i * n2 - j * n1)) AS ks_scaled,
             sum(CAST(cb + cc AS HUGEINT)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1))
               AS s
           FROM cum GROUP BY g),
         ks AS (
           SELECT g, n_base, n_cur,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(ks_scaled AS DOUBLE)
                 / (n_base * n_cur), 6) END AS ks_d,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(ks_scaled AS DOUBLE) / (n_base * n_cur) >
                 1.358 * sqrt(CAST(n_base + n_cur AS DOUBLE)
                   / (n_base * n_cur)) THEN 1 ELSE 0 END AS INT)
               AS ks_drifted,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE),
                 6) END AS cvm_t,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE)
                 > 0.461 THEN 1 ELSE 0 END AS INT) AS cvm_drifted
           FROM kagg),
         mcum AS (
           SELECT g, cb, cb + cc AS t,
             coalesce(sum(cb + cc) OVER (PARTITION BY g
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS c
           FROM per),
         mr AS (SELECT g, cb, t, 2 * c + t + 1 AS rank2 FROM mcum),
         magg AS (
           SELECT g,
             CAST(sum(cb) AS BIGINT) AS n1,
             CAST(sum(t - cb) AS BIGINT) AS n2,
             CAST(sum(cb * rank2) AS BIGINT) AS r12,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
           FROM mr GROUP BY g),
         mf AS (
           SELECT g, n1, n2, r12 - n1 * (n1 + 1) AS u_half,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                 - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS sigma2
           FROM magg),
         mw AS (
           SELECT g,
             round((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2), 6)
               AS mw_z,
             CAST(abs((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2)) > 1.96
               AS INT) AS mw_drifted
           FROM mf),
         tot AS (
           SELECT g, CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(cc) AS BIGINT) AS nc
           FROM per GROUP BY g),
         rate AS (
           SELECT g,
             round(CASE WHEN nb > 0 AND nc > 0
               THEN CAST(nc AS DOUBLE) / CAST(nb AS DOUBLE) END, 4)
               AS rate_ratio,
             round(CASE WHEN nb + nc = 0 THEN NULL
               ELSE (CAST(nc AS DOUBLE) - CAST(nb AS DOUBLE))
                 / sqrt(CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) END,
               6) AS rate_z,
             CAST(coalesce(abs(CASE WHEN nb + nc = 0 THEN NULL
               ELSE (CAST(nc AS DOUBLE) - CAST(nb AS DOUBLE))
                 / sqrt(CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) END)
               > 1.96, FALSE) AS INT) AS rate_drifted
           FROM tot),
         mom AS (
           SELECT g, CAST(sum(cb) AS BIGINT) AS enb,
             CAST(sum(cc) AS BIGINT) AS enc,
             sum(CAST(v AS HUGEINT) * cb) AS sb,
             sum(CAST(v AS HUGEINT) * cc) AS sc,
             sum(CAST(v AS HUGEINT) * v * cb) AS qb,
             sum(CAST(v AS HUGEINT) * v * cc) AS qc
           FROM per GROUP BY g),
         eff0 AS (
           SELECT g, enb, enc,
             CAST(CAST(enb AS HUGEINT) * qb
                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
               / (CAST(enb AS DOUBLE) * (CAST(enb AS DOUBLE) - 1.0))
               AS s2b,
             CAST(CAST(enc AS HUGEINT) * qc
                 - CAST(sc AS HUGEINT) * sc AS DOUBLE)
               / (CAST(enc AS DOUBLE) * (CAST(enc AS DOUBLE) - 1.0))
               AS s2c,
             CAST(sb AS DOUBLE) AS sbd, CAST(sc AS DOUBLE) AS scd
           FROM mom),
         eff1 AS (
           SELECT g, enb, enc,
             ((CAST(enb AS DOUBLE) - 1.0) * s2b
               + (CAST(enc AS DOUBLE) - 1.0) * s2c)
               / (CAST(enb AS DOUBLE) + CAST(enc AS DOUBLE) - 2.0)
               AS pooled,
             scd / CAST(enc AS DOUBLE) - sbd / CAST(enb AS DOUBLE)
               AS meandiff
           FROM eff0),
         eff AS (
           SELECT g,
             round(CASE WHEN enb < 2 OR enc < 2 OR pooled <= 0
               THEN NULL ELSE meandiff / sqrt(pooled) END, 6) AS d,
             CAST(coalesce(abs(CASE WHEN enb < 2 OR enc < 2
               OR pooled <= 0 THEN NULL
               ELSE meandiff / sqrt(pooled) END) >= 0.2, FALSE)
               AS INT) AS d_material
           FROM eff1),
         med AS (
           SELECT c2.g,
             min(CASE WHEN i >= (nb + 1) // 2 THEN v END)
               + min(CASE WHEN i >= nb // 2 + 1 THEN v END) AS m2b,
             min(CASE WHEN j >= (nc + 1) // 2 THEN v END)
               + min(CASE WHEN j >= nc // 2 + 1 THEN v END) AS m2c
           FROM (SELECT g, v,
               CAST(sum(cb) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS i,
               CAST(sum(cc) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS j
             FROM per) c2
           JOIN tot ON tot.g = c2.g
           GROUP BY c2.g),
         dev AS (
           SELECT per.g,
             sum(CAST(cb AS HUGEINT) * abs(2 * v - m2b)) AS zsb,
             sum(CAST(cb AS HUGEINT) * abs(2 * v - m2b)
               * abs(2 * v - m2b)) AS zqb,
             sum(CAST(cc AS HUGEINT) * abs(2 * v - m2c)) AS zsc,
             sum(CAST(cc AS HUGEINT) * abs(2 * v - m2c)
               * abs(2 * v - m2c)) AS zqc
           FROM per JOIN med ON med.g = per.g
           GROUP BY per.g),
         bff AS (
           SELECT dev.g,
             (CAST(zsb AS DOUBLE) * CAST(zsb AS DOUBLE)
                 / CAST(nb AS DOUBLE)
               + CAST(zsc AS DOUBLE) * CAST(zsc AS DOUBLE)
                 / CAST(nc AS DOUBLE)
               - (CAST(zsb AS DOUBLE) + CAST(zsc AS DOUBLE))
                 * (CAST(zsb AS DOUBLE) + CAST(zsc AS DOUBLE))
                 / (CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)))
             * ((CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) - 2.0)
             / ((CAST(zqb AS DOUBLE) - CAST(zsb AS DOUBLE)
                 * CAST(zsb AS DOUBLE) / CAST(nb AS DOUBLE))
               + (CAST(zqc AS DOUBLE) - CAST(zsc AS DOUBLE)
                 * CAST(zsc AS DOUBLE) / CAST(nc AS DOUBLE))) AS f,
             (CAST(zqb AS DOUBLE) - CAST(zsb AS DOUBLE)
                 * CAST(zsb AS DOUBLE) / CAST(nb AS DOUBLE))
               + (CAST(zqc AS DOUBLE) - CAST(zsc AS DOUBLE)
                 * CAST(zsc AS DOUBLE) / CAST(nc AS DOUBLE)) AS ssw,
             nb, nc
           FROM dev JOIN tot ON tot.g = dev.g),
         bf AS (
           SELECT g,
             round(CASE WHEN nb < 2 OR nc < 2 OR ssw <= 0 THEN NULL
               ELSE f END, 6) AS bf_f,
             CAST(coalesce((CASE WHEN nb < 2 OR nc < 2 OR ssw <= 0
               THEN NULL ELSE f END) > 3.841459, FALSE) AS INT)
               AS var_drifted
           FROM bff)
         SELECT ks.g AS o_orderpriority, n_base, n_cur, ks_d,
           ks_drifted, cvm_t, cvm_drifted, mw_z, mw_drifted,
           d, d_material, bf_f, var_drifted, rate_ratio, rate_z,
           rate_drifted
         FROM ks JOIN mw ON mw.g = ks.g JOIN eff ON eff.g = ks.g
         JOIN bf ON bf.g = ks.g JOIN rate ON rate.g = ks.g
         ORDER BY o_orderpriority""",
    // exact counts into one mirrored score z and the log-scale band;
    // the 60% error-side drop re-seeded
    "q298_rate_drift" ->
      """WITH b AS (
           SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_base
           FROM events WHERE event_id % 2 = 1 GROUP BY 1),
         c AS (
           SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_cur
           FROM events WHERE event_id % 2 = 0
             AND NOT (event_type = 'error'
               AND event_id % 10 IN (0, 2, 4))
           GROUP BY 1),
         f AS (
           SELECT coalesce(b.g, c.g) AS g,
             coalesce(n_base, 0) AS n_base,
             coalesce(n_cur, 0) AS n_cur
           FROM b FULL OUTER JOIN c ON b.g = c.g),
         z AS (
           SELECT g, n_base, n_cur,
             CASE WHEN n_base + n_cur = 0 THEN NULL
               ELSE (CAST(n_cur AS DOUBLE) - CAST(n_base AS DOUBLE))
                 / sqrt(CAST(n_base AS DOUBLE)
                   + CAST(n_cur AS DOUBLE)) END AS z,
             CASE WHEN n_base > 0 AND n_cur > 0
               THEN CAST(n_cur AS DOUBLE) / CAST(n_base AS DOUBLE)
               END AS rr,
             CASE WHEN n_base > 0 AND n_cur > 0
               THEN sqrt(1.0 / CAST(n_base AS DOUBLE)
                 + 1.0 / CAST(n_cur AS DOUBLE)) END AS se
           FROM f)
         SELECT g AS event_type, n_base, n_cur,
           round(rr, 4) AS rate_ratio,
           round(exp(ln(rr) - 1.96 * se), 4) AS ci_lo,
           round(exp(ln(rr) + 1.96 * se), 4) AS ci_hi,
           round(z, 6) AS z,
           CAST(coalesce(abs(z) > 1.96, FALSE) AS INT)
             AS rate_drifted
         FROM z ORDER BY event_type""",
    // count-frame medians (2·med = lower + upper middles, exact),
    // |2x − med2| deviation moments in HUGEINT, one mirrored F;
    // the mean-preserving 2-HIGH widening re-seeded
    "q295_variance_drift" ->
      """WITH v AS (
           SELECT o_orderpriority AS g, o_orderkey % 2 AS side,
             CAST(floor((CASE WHEN o_orderkey % 2 = 0
               AND o_orderpriority = '2-HIGH'
               THEN o_totalprice * (CASE WHEN o_orderkey % 4 = 0
                 THEN 1.6 ELSE 0.4 END)
               ELSE o_totalprice END) * 100) AS BIGINT) AS x
           FROM orders),
         per AS (
           SELECT g, side, x, CAST(count(*) AS BIGINT) AS c
           FROM v GROUP BY 1, 2, 3),
         n AS (SELECT g, side, CAST(sum(c) AS BIGINT) AS n
           FROM per GROUP BY 1, 2),
         cum AS (
           SELECT per.g, per.side, x, c, n,
             CAST(sum(c) OVER (PARTITION BY per.g, per.side
               ORDER BY x) AS BIGINT) AS cum
           FROM per JOIN n ON n.g = per.g AND n.side = per.side),
         med AS (
           SELECT g, side, max(n) AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN x END)
               + min(CASE WHEN cum >= n // 2 + 1 THEN x END) AS med2
           FROM cum GROUP BY 1, 2),
         mom AS (
           SELECT per.g, per.side, max(med.n) AS n, max(med2) AS med2,
             sum(CAST(c AS HUGEINT) * abs(2 * x - med2)) AS s,
             sum(CAST(c AS HUGEINT) * abs(2 * x - med2)
               * abs(2 * x - med2)) AS q
           FROM per JOIN med ON med.g = per.g AND med.side = per.side
           GROUP BY 1, 2),
         j AS (
           SELECT b.g, b.n AS nb, c2.n AS nc,
             b.med2 AS m2b, c2.med2 AS m2c,
             CAST(b.s AS DOUBLE) AS sb, CAST(c2.s AS DOUBLE) AS sc,
             CAST(b.q AS DOUBLE) AS qb, CAST(c2.q AS DOUBLE) AS qc
           FROM mom b JOIN mom c2 ON c2.g = b.g
             AND b.side = 1 AND c2.side = 0),
         ff AS (
           SELECT g, nb, nc, m2b, m2c,
             (sb * sb / CAST(nb AS DOUBLE)
               + sc * sc / CAST(nc AS DOUBLE)
               - (sb + sc) * (sb + sc)
                 / (CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)))
             * ((CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE)) - 2.0)
             / ((qb - sb * sb / CAST(nb AS DOUBLE))
               + (qc - sc * sc / CAST(nc AS DOUBLE))) AS f,
             (qb - sb * sb / CAST(nb AS DOUBLE))
               + (qc - sc * sc / CAST(nc AS DOUBLE)) AS ssw
           FROM j)
         SELECT g AS o_orderpriority, nb AS n_base, nc AS n_cur,
           m2b AS med2_base, m2c AS med2_cur,
           CASE WHEN nb < 2 OR nc < 2 OR ssw <= 0 THEN NULL
             ELSE round(f, 6) END AS f,
           CAST(coalesce((CASE WHEN nb < 2 OR nc < 2 OR ssw <= 0
             THEN NULL ELSE f END) > 3.841459, FALSE) AS INT)
             AS var_drifted
         FROM ff ORDER BY o_orderpriority""",
    // exact integer moments per side (squares in HUGEINT before the
    // sum); d/g/band one mirrored double formula; the 1-URGENT +10%
    // plant re-seeded
    "q292_effect_size" ->
      """WITH v AS (
           SELECT o_orderpriority AS g, o_orderkey % 2 AS side,
             CAST(floor((CASE WHEN o_orderkey % 2 = 0
               AND o_orderpriority = '1-URGENT'
               THEN o_totalprice * 1.10 ELSE o_totalprice END) * 100)
               AS BIGINT) AS x
           FROM orders),
         mb AS (
           SELECT g, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(x) AS BIGINT) AS sb,
             sum(CAST(x AS HUGEINT) * x) AS qb
           FROM v WHERE side = 1 GROUP BY g),
         mc AS (
           SELECT g, CAST(count(*) AS BIGINT) AS nc,
             CAST(sum(x) AS BIGINT) AS sc,
             sum(CAST(x AS HUGEINT) * x) AS qc
           FROM v WHERE side = 0 GROUP BY g),
         f AS (
           SELECT mb.g, nb, nc,
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS meanb,
             CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS meanc,
             CAST(CAST(nb AS HUGEINT) * qb
                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
               / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))
               AS s2b,
             CAST(CAST(nc AS HUGEINT) * qc
                 - CAST(sc AS HUGEINT) * sc AS DOUBLE)
               / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1.0))
               AS s2c
           FROM mb JOIN mc ON mc.g = mb.g),
         dd AS (
           SELECT g, nb, nc, meanb, meanc,
             (meanc - meanb) / sqrt(
               ((CAST(nb AS DOUBLE) - 1.0) * s2b
                 + (CAST(nc AS DOUBLE) - 1.0) * s2c)
               / (CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE) - 2.0)) AS d,
             ((CAST(nb AS DOUBLE) - 1.0) * s2b
               + (CAST(nc AS DOUBLE) - 1.0) * s2c)
               / (CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE) - 2.0)
               AS pooled
           FROM f),
         ee AS (
           SELECT g, nb, nc, meanb, meanc, pooled, d,
             d * (1.0 - 3.0 / ((CAST(nb AS DOUBLE)
               + CAST(nc AS DOUBLE)) * 4.0 - 9.0)) AS gh,
             sqrt((CAST(nb AS DOUBLE) + CAST(nc AS DOUBLE))
                 / (CAST(nb AS DOUBLE) * CAST(nc AS DOUBLE))
               + d * d / ((CAST(nb AS DOUBLE)
                 + CAST(nc AS DOUBLE)) * 2.0)) AS se
           FROM dd)
         SELECT g AS o_orderpriority, nb AS n_base, nc AS n_cur,
           round(meanb, 4) AS mean_base, round(meanc, 4) AS mean_cur,
           CASE WHEN nb < 2 OR nc < 2 OR pooled <= 0 THEN NULL
             ELSE round(d, 6) END AS d,
           CASE WHEN nb < 2 OR nc < 2 OR pooled <= 0 THEN NULL
             ELSE round(gh, 6) END AS g,
           CASE WHEN nb < 2 OR nc < 2 OR pooled <= 0 THEN NULL
             ELSE round(d - 1.96 * se, 6) END AS ci_lo,
           CASE WHEN nb < 2 OR nc < 2 OR pooled <= 0 THEN NULL
             ELSE round(d + 1.96 * se, 6) END AS ci_hi,
           CAST(coalesce(abs(CASE WHEN nb < 2 OR nc < 2
               OR pooled <= 0 THEN NULL ELSE d END) >= 0.2, FALSE)
             AS INT) AS material
         FROM ee ORDER BY o_orderpriority""",
    // the q237 rank-identity chain through u_half, then
    // delta = 1 - u_half/(n1*n2) and the pinned magnitude bounds
    "q317_cliffs_delta" ->
      """WITH ev AS (
           SELECT o_orderpriority AS g, o_orderkey % 2 AS b,
             CASE WHEN o_orderkey % 2 = 0
               AND o_orderpriority = '1-URGENT'
               THEN o_totalprice * 2.0 ELSE o_totalprice END AS v
           FROM orders),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT g, cb, cc, cb + cc AS t,
             coalesce(sum(cb + cc) OVER (PARTITION BY g
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS c
           FROM per),
         r AS (SELECT g, cb, t, 2 * c + t + 1 AS rank2 FROM cum),
         agg AS (
           SELECT g,
             CAST(sum(cb) AS BIGINT) AS n1,
             CAST(sum(t - cb) AS BIGINT) AS n2,
             CAST(sum(cb * rank2) AS BIGINT) AS r12
           FROM r GROUP BY 1),
         f AS (
           SELECT g, n1, n2,
             CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
               ELSE 1.0 - CAST(r12 - n1 * (n1 + 1) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END
               AS delta
           FROM agg)
         SELECT g AS o_orderpriority, n1 AS n_base, n2 AS n_cur,
           round(delta, 6) AS delta,
           CASE WHEN delta IS NULL THEN NULL
             WHEN abs(delta) < 0.147 THEN 'negligible'
             WHEN abs(delta) < 0.33 THEN 'small'
             WHEN abs(delta) < 0.474 THEN 'medium'
             ELSE 'large' END AS magnitude
         FROM f ORDER BY o_orderpriority""",
    // the CvM count-frame chain with the AD tail weighting: exact
    // integer gaps, per-term division micro-floored before the
    // order-free sum, one mirrored division by n1*n2; B = N zeroed
    "q315_ad_drift" ->
      """WITH v AS (
           SELECT o_orderpriority AS g, o_orderkey % 2 AS side,
             CASE WHEN o_orderkey % 2 = 0
                 AND o_orderpriority = '1-URGENT'
                 AND o_totalprice > 300000.0
               THEN CAST(floor(o_totalprice * 1.3 * 100) AS BIGINT)
               ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
               END AS x
           FROM orders),
         per AS (
           SELECT g, CAST(x AS DOUBLE) AS v,
             CAST(sum(side) AS BIGINT) AS cb,
             CAST(sum(1 - side) AS BIGINT) AS cc
           FROM v GROUP BY 1, 2),
         cum AS (
           SELECT g, cb, cc,
             sum(cb) OVER (PARTITION BY g ORDER BY v) AS i,
             sum(cc) OVER (PARTITION BY g ORDER BY v) AS j,
             sum(cb) OVER (PARTITION BY g) AS n1,
             sum(cc) OVER (PARTITION BY g) AS n2
           FROM per),
         t AS (
           SELECT g, n1, n2,
             CASE WHEN i + j < n1 + n2 THEN
               CAST(floor(CAST(cb + cc AS DOUBLE)
                 * CAST(CAST(n1 + n2 AS HUGEINT) * i
                     - CAST(n1 AS HUGEINT) * (i + j) AS DOUBLE)
                 * CAST(CAST(n1 + n2 AS HUGEINT) * i
                     - CAST(n1 AS HUGEINT) * (i + j) AS DOUBLE)
                 / (CAST(i + j AS DOUBLE)
                   * CAST(n1 + n2 - i - j AS DOUBLE))
                 * 1000000.0) AS HUGEINT)
             ELSE CAST(0 AS HUGEINT) END AS term
           FROM cum),
         agg AS (
           SELECT g, CAST(max(n1) AS BIGINT) AS n_base,
             CAST(max(n2) AS BIGINT) AS n_cur,
             sum(term) AS s
           FROM t GROUP BY g)
         SELECT g AS o_orderpriority, n_base, n_cur,
           CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
             ELSE round(CAST(s AS DOUBLE) / 1000000.0
               / (CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE)), 6)
             END AS a2,
           CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN TRUE
             ELSE CAST(s AS DOUBLE) / 1000000.0
               / (CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE))
               > 3.88 END AS INT) AS drifted
         FROM agg ORDER BY o_orderpriority""",
    // exact per-side moments; Welch t + Satterthwaite df as one
    // mirrored double formula; both plants re-seeded
    "q305_welch_ttest" ->
      """WITH v AS (
           SELECT o_orderpriority AS g, o_orderkey % 2 AS side,
             CAST(floor((CASE
               WHEN o_orderkey % 2 = 0 AND o_orderpriority = '1-URGENT'
                 THEN o_totalprice * 1.25
               WHEN o_orderkey % 2 = 0 AND o_orderpriority = '2-HIGH'
                 THEN o_totalprice * (CASE WHEN o_orderkey % 4 = 0
                   THEN 1.6 ELSE 0.4 END)
               ELSE o_totalprice END) * 100) AS BIGINT) AS x
           FROM orders),
         mb AS (
           SELECT g, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(x) AS BIGINT) AS sb,
             sum(CAST(x AS HUGEINT) * x) AS qb
           FROM v WHERE side = 1 GROUP BY g),
         mc AS (
           SELECT g, CAST(count(*) AS BIGINT) AS nc,
             CAST(sum(x) AS BIGINT) AS sc,
             sum(CAST(x AS HUGEINT) * x) AS qc
           FROM v WHERE side = 0 GROUP BY g),
         f AS (
           SELECT mb.g, nb, nc,
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS meanb,
             CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS meanc,
             CAST(CAST(nb AS HUGEINT) * qb
                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
               / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))
               / CAST(nb AS DOUBLE) AS vb,
             CAST(CAST(nc AS HUGEINT) * qc
                 - CAST(sc AS HUGEINT) * sc AS DOUBLE)
               / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1.0))
               / CAST(nc AS DOUBLE) AS vc
           FROM mb JOIN mc ON mc.g = mb.g),
         dd AS (
           SELECT g, nb, nc, meanb, meanc,
             CASE WHEN nb < 2 OR nc < 2 OR vb + vc <= 0 THEN NULL
               ELSE (meanc - meanb) / sqrt(vb + vc) END AS t,
             CASE WHEN nb < 2 OR nc < 2 OR vb + vc <= 0 THEN NULL
               ELSE (vb + vc) * (vb + vc)
                 / (vb * vb / (CAST(nb AS DOUBLE) - 1.0)
                   + vc * vc / (CAST(nc AS DOUBLE) - 1.0)) END AS df
           FROM f)
         SELECT g AS o_orderpriority, nb AS n_base, nc AS n_cur,
           round(meanb, 4) AS mean_base, round(meanc, 4) AS mean_cur,
           round(t, 6) AS t, round(df, 4) AS df,
           CAST(coalesce(abs(t) > 1.96, FALSE) AS INT) AS shifted
         FROM dd ORDER BY o_orderpriority""",
    // the oracle is the RAW two-sample panel: the engine's
    // shard-merged count path must land on the identical statistics
    "q278_drift_panel_store" ->
      """WITH ev AS (
           SELECT event_type AS g,
             CASE WHEN event_id % 2 = 0 AND event_type = 'purchase'
               THEN value * 1.1 ELSE value END AS v,
             CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS b
           FROM events WHERE value IS NOT NULL),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM ev GROUP BY g, v),
         cum AS (
           SELECT g, cb, cc,
             CAST(sum(cb) OVER w AS BIGINT) AS i,
             CAST(sum(cc) OVER w AS BIGINT) AS j,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n1,
             CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS n2
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         kagg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             max(abs(i * n2 - j * n1)) AS ks_scaled,
             sum(CAST(cb + cc AS HUGEINT)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1))
               AS s
           FROM cum GROUP BY g),
         ks AS (
           SELECT g, n_base, n_cur,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(ks_scaled AS DOUBLE)
                 / (n_base * n_cur), 6) END AS ks_d,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(ks_scaled AS DOUBLE) / (n_base * n_cur) >
                 1.358 * sqrt(CAST(n_base + n_cur AS DOUBLE)
                   / (n_base * n_cur)) THEN 1 ELSE 0 END AS INT)
               AS ks_drifted,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE),
                 6) END AS cvm_t,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE)
                 > 0.461 THEN 1 ELSE 0 END AS INT) AS cvm_drifted
           FROM kagg),
         mcum AS (
           SELECT g, cb, cb + cc AS t,
             coalesce(sum(cb + cc) OVER (PARTITION BY g
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS c
           FROM per),
         mr AS (SELECT g, cb, t, 2 * c + t + 1 AS rank2 FROM mcum),
         magg AS (
           SELECT g,
             CAST(sum(cb) AS BIGINT) AS n1,
             CAST(sum(t - cb) AS BIGINT) AS n2,
             CAST(sum(cb * rank2) AS BIGINT) AS r12,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
           FROM mr GROUP BY g),
         mf AS (
           SELECT g, n1, n2, r12 - n1 * (n1 + 1) AS u_half,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                 - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS sigma2
           FROM magg),
         mw AS (
           SELECT g,
             round((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2), 6)
               AS mw_z,
             CAST(abs((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2)) > 1.96
               AS INT) AS mw_drifted
           FROM mf)
         SELECT g AS event_type, n_base, n_cur, ks_d, ks_drifted,
           cvm_t, cvm_drifted, mw_z, mw_drifted
         FROM ks JOIN mw USING (g)
         ORDER BY event_type""",
    // one shared per-(group, value) counts CTE feeds all three test
    // chains — the exact q164/q261/q237 math, joined on the group
    "q277_drift_panel" ->
      """WITH base AS (
           SELECT o_orderpriority AS g, o_totalprice AS v
           FROM orders WHERE o_orderkey % 2 = 1),
         cur AS (
           SELECT o_orderpriority AS g,
             CASE WHEN o_orderpriority = '1-URGENT'
               THEN o_totalprice * 1.10 ELSE o_totalprice END AS v
           FROM orders WHERE o_orderkey % 2 = 0),
         u AS (
           SELECT g, v, 1 AS b FROM base
           UNION ALL SELECT g, v, 0 FROM cur),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM u GROUP BY g, v),
         cum AS (
           SELECT g, cb, cc,
             CAST(sum(cb) OVER w AS BIGINT) AS i,
             CAST(sum(cc) OVER w AS BIGINT) AS j,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n1,
             CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS n2
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         kagg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             max(abs(i * n2 - j * n1)) AS ks_scaled,
             sum(CAST(cb + cc AS HUGEINT)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1)
               * (CAST(i AS HUGEINT) * n2 - CAST(j AS HUGEINT) * n1))
               AS s
           FROM cum GROUP BY g),
         ks AS (
           SELECT g, n_base, n_cur,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(ks_scaled AS DOUBLE)
                 / (n_base * n_cur), 6) END AS ks_d,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(ks_scaled AS DOUBLE) / (n_base * n_cur) >
                 1.358 * sqrt(CAST(n_base + n_cur AS DOUBLE)
                   / (n_base * n_cur)) THEN 1 ELSE 0 END AS INT)
               AS ks_drifted,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
               ELSE round(CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE),
                 6) END AS cvm_t,
             CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
               WHEN CAST(s AS DOUBLE)
                 / CAST(CAST(n_base AS HUGEINT) * n_cur
                   * (n_base + n_cur) * (n_base + n_cur) AS DOUBLE)
                 > 0.461 THEN 1 ELSE 0 END AS INT) AS cvm_drifted
           FROM kagg),
         mcum AS (
           SELECT g, cb, cb + cc AS t,
             coalesce(sum(cb + cc) OVER (PARTITION BY g
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS c
           FROM per),
         mr AS (SELECT g, cb, t, 2 * c + t + 1 AS rank2 FROM mcum),
         magg AS (
           SELECT g,
             CAST(sum(cb) AS BIGINT) AS n1,
             CAST(sum(t - cb) AS BIGINT) AS n2,
             CAST(sum(cb * rank2) AS BIGINT) AS r12,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
           FROM mr GROUP BY g),
         mf AS (
           SELECT g, n1, n2, r12 - n1 * (n1 + 1) AS u_half,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                 - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
                   * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS sigma2
           FROM magg),
         mw AS (
           SELECT g,
             round((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2), 6)
               AS mw_z,
             CAST(abs((CAST(u_half AS DOUBLE) / 2.0
               - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2)) > 1.96
               AS INT) AS mw_drifted
           FROM mf)
         SELECT g AS o_orderpriority, n_base, n_cur, ks_d, ks_drifted,
           cvm_t, cvm_drifted, mw_z, mw_drifted
         FROM ks JOIN mw USING (g)
         ORDER BY o_orderpriority""",
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
    // md5-keyed Bernoulli relabelings (the Carter-Wegman pattern all
    // dedup families use) — byte-identical assignment in any engine
    // with md5; per-replica means divide exact BIGINT sums once
    "q201_permutation_test" ->
      """WITH u0 AS (
           SELECT CAST(o_custkey AS VARCHAR) AS u,
             (c_mktsegment = 'BUILDING') AS a,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         units AS (SELECT u, a, CAST(sum(v) AS BIGINT) AS v
                   FROM u0 GROUP BY 1, 2),
         ob AS (SELECT
           CAST(sum(CASE WHEN a THEN v ELSE 0 END) AS BIGINT) AS sa,
           CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(sum(CASE WHEN NOT a THEN v ELSE 0 END) AS BIGINT)
             AS sb,
           CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
             AS nb
           FROM units),
         obs AS (SELECT na, nb,
           CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS obsd
           FROM ob),
         asg AS (
           SELECT u, v, r,
             CAST(('0x' || substr(md5('q201' || ':'
               || CAST(r AS VARCHAR) || ':' || u), 1, 8)) AS BIGINT)
               % 2 AS flip
           FROM units, LATERAL (SELECT
             unnest(generate_series(0, 198)) AS r) t),
         per AS (
           SELECT r,
             CAST(sum(CASE WHEN flip = 0 THEN v ELSE 0 END)
               AS BIGINT) AS sa,
             CAST(sum(CASE WHEN flip = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS na,
             CAST(sum(CASE WHEN flip = 1 THEN v ELSE 0 END)
               AS BIGINT) AS sb,
             CAST(sum(CASE WHEN flip = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS nb
           FROM asg GROUP BY r),
         d AS (SELECT CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS d
               FROM per WHERE na > 0 AND nb > 0),
         tl AS (SELECT count(*) AS r_valid,
                CAST(sum(CASE WHEN abs(d.d) >= abs(obs.obsd)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
                FROM d CROSS JOIN obs)
         SELECT obs.na AS n_a, obs.nb AS n_b,
           round(obs.obsd, 4) AS obs_diff,
           tl.r_valid, tl.n_extreme,
           round((CAST(tl.n_extreme AS DOUBLE) + 1.0)
             / (CAST(tl.r_valid AS DOUBLE) + 1.0), 6) AS p_value
         FROM obs CROSS JOIN tl""",
    // the q261 CTE machinery with |gap|·Δv in place of the squared
    // gap: W₁ = Σ |i·m − j·n|·(nextv − v) / (n·m), exact HUGEINT
    // segment sums, one mirrored double division
    "q338_wasserstein_drift" ->
      """WITH base AS (
           SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           FROM orders WHERE o_orderkey % 2 = 1),
         cur AS (
           SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderpriority = '1-URGENT'
                 THEN 7500 ELSE 0 END AS v
           FROM orders WHERE o_orderkey % 2 = 0),
         u AS (
           SELECT g, v, 1 AS b FROM base
           UNION ALL SELECT g, v, 0 FROM cur),
         per AS (
           SELECT g, v, CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(1 - b) AS BIGINT) AS cc
           FROM u GROUP BY g, v),
         cum AS (
           SELECT g, v, cb, cc,
             CAST(sum(cb) OVER w AS BIGINT) AS i,
             CAST(sum(cc) OVER w AS BIGINT) AS j,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n1,
             CAST(sum(cc) OVER (PARTITION BY g) AS BIGINT) AS n2,
             lead(v) OVER (PARTITION BY g ORDER BY v) AS nv
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         agg AS (
           SELECT g, max(n1) AS n_base, max(n2) AS n_cur,
             sum(CASE WHEN nv IS NULL THEN CAST(0 AS HUGEINT)
               ELSE abs(CAST(i AS HUGEINT) * n2
                 - CAST(j AS HUGEINT) * n1)
                 * CAST(nv - v AS HUGEINT) END) AS s
           FROM cum GROUP BY g)
         SELECT g AS o_orderpriority, n_base, n_cur,
           CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
             ELSE round(CAST(s AS DOUBLE)
               / CAST(CAST(n_base AS HUGEINT) * n_cur AS DOUBLE), 6)
             END AS w1_cents,
           CAST(CASE WHEN n_base = 0 OR n_cur = 0 THEN 1
             WHEN CAST(s AS DOUBLE)
               / CAST(CAST(n_base AS HUGEINT) * n_cur AS DOUBLE)
               > 1000.0 THEN 1 ELSE 0 END AS INT) AS drifted
         FROM agg ORDER BY o_orderpriority""",
  )

  /** Exact per-group KS drift test ([[graft.quality.Drift.ksTest]])
    * on a deterministically perturbed split: odd orderkeys are the
    * baseline, even the current batch with '1-URGENT' prices inflated
    * 5 % (the q162/q144 seeding treatment — the detector must flag
    * exactly that segment while fixed-bin PSI's shape stays put for
    * the rest). `ks_scaled` is the exact BIGINT supremum; `ks_d` and
    * the threshold are single float ops over exact longs.
    */

  /** The composed drift panel ([[graft.quality.Drift.driftPanel]] —
    * the q273 treatment for the drift shelf): KS, Cramér–von Mises
    * and Mann–Whitney over the q261 split (odd orders = baseline,
    * even = current with the urgent segment shifted ×1.10), all three
    * from ONE persisted per-(group, distinct value) count frame — at
    * warehouse scale the monitoring suite costs one scan-and-count,
    * not one per test. A plan spec pins the single shared pass.
    */

  /** Effect size of the q277 drift ([[graft.quality.Drift.cohensD]]):
    * the panel says the planted 1-URGENT +10% shift is SIGNIFICANT;
    * this says whether it is MATERIAL — Cohen's d / Hedges' g with a
    * 1.96·se band over the same orderkey-parity split, exact cents
    * moments into one mirrored double formula. At corpus scale
    * everything is significant; the d threshold is what a deletion
    * or retraining decision actually reads.
    */
  private[graft] def effectSizeQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.10).otherwise(col("o_totalprice")))
    graft.quality.Drift.cohensD(base, cur,
        floor(col("o_totalprice") * 100), Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  /** Variance drift ([[graft.quality.Drift.brownForsythe]]): the
    * spread axis the q277 panel lacks — a deterministic
    * MEAN-PRESERVING widening is planted on 2-HIGH (cur prices
    * ×1.6 / ×0.4 alternating by orderkey mod 4, re-seeded by the
    * oracle), the shift the location alarms are structurally blind
    * to. Robust |x − median| deviations; exact medians and moments;
    * one mirrored F with exactly two sides, so no cross-side float
    * accumulation exists to order.
    */
  private[graft] def varianceDriftQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "2-HIGH",
          col("o_totalprice") *
            when(col("o_orderkey") % 4 === 0, lit(1.6))
              .otherwise(lit(0.4)))
          .otherwise(col("o_totalprice")))
    graft.quality.Drift.brownForsythe(base, cur,
        floor(col("o_totalprice") * 100), Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  /** Rate (count) drift ([[graft.quality.Drift.rateRatio]]): the
    * axis every value-conditioned alarm misses — 60% of the error
    * type's current-side events are deterministically dropped
    * (event_id mod arithmetic the oracle re-seeds), a collapse the
    * KS/CvM/MW/effect-size family cannot see because the surviving
    * events' VALUES are untouched. The equal-exposure score test
    * reads it at z = −3.45 (sf0.001) / −16.2 (sf0.01) while clean
    * types sit within ±1.6.
    */
  private[graft] def rateDriftQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val base = e.where(col("event_id") % 2 === 1)
    val cur = e.where(col("event_id") % 2 === 0 &&
      !(col("event_type") === "error" &&
        (col("event_id") % 10).isin(0, 2, 4)))
    graft.quality.Drift.rateRatio(base, cur, Seq("event_type"))
      .orderBy("event_type")
  }

  /** The complete drift one-pager
    * ([[graft.quality.Drift.driftOnePager]]): six axes — KS, CvM,
    * MW, Cohen's d, Brown–Forsythe, rate — off ONE persisted count
    * frame built from one tagged-union scan. THREE different plants
    * in one dataset prove each axis answers its own question:
    * 1-URGENT ×1.10 (location — MW/d fire), 2-HIGH ×1.6/×0.4
    * mean-preserving (variance — BF fires where MW is blind), and a
    * 60% 5-LOW current-side drop (rate — invisible to every
    * value-conditioned test). The production monitoring shape: one
    * scan-and-count per snapshot for the whole page.
    */
  private[graft] def driftOnePagerQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o
      .where(col("o_orderkey") % 2 === 0 &&
        !(col("o_orderpriority") === "5-LOW" &&
          (col("o_orderkey") % 10).isin(0, 2, 4)))
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.10)
          .when(col("o_orderpriority") === "2-HIGH",
            col("o_totalprice") *
              when(col("o_orderkey") % 4 === 0, lit(1.6))
                .otherwise(lit(0.4)))
          .otherwise(col("o_totalprice")))
    graft.quality.Drift.driftOnePager(base, cur,
        floor(col("o_totalprice") * 100), Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  /** The six-axis one-pager fed from the STANDING COUNT STORE path
    * ([[graft.quality.Drift.driftOnePagerFromCounts]], the q278
    * resume==recompute treatment extended to the whole page): the
    * current side arrives as two separately-counted shard halves
    * (event_id ≡ 0 / 2 mod 4) merged by additive count sum, and the
    * result must equal the raw two-sample page — which is exactly
    * what the oracle computes. One (group, cents, n) store is the
    * sufficient statistic for ALL six axes: distribution tests,
    * effect size, variance and rate included, because moments and
    * medians are count-frame identities. q278's events split and
    * purchase ×1.1 plant, in exact cents.
    */
  private[graft] def onePagerStoreQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val base = e.where(col("event_id") % 2 === 1)
      .where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "cents")
      .agg(count(lit(1)).as("n"))
    val curRaw = e.where(col("event_id") % 2 === 0)
      .withColumn("value",
        when(col("event_type") === "purchase", col("value") * 1.1)
          .otherwise(col("value")))
      .where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"),
        col("event_id"))
    // two count shards, merged additively — the store-read shape
    val shard = (m: Int) => curRaw.where(col("event_id") % 4 === m)
      .groupBy("event_type", "cents").agg(count(lit(1)).as("n"))
    val cur = shard(0).unionByName(shard(2))
      .groupBy("event_type", "cents").agg(sum(col("n")).as("n"))
    graft.quality.Drift.driftOnePagerFromCounts(base, cur, "cents",
        "n", Seq("event_type"))
      .orderBy("event_type")
  }

  private[graft] def driftPanelQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.10).otherwise(col("o_totalprice")))
    graft.quality.Drift.driftPanel(base, cur, "o_totalprice",
        Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_base"), col("n_cur"),
        round(col("ks_d"), 6).as("ks_d"),
        col("ks_drifted").cast("int").as("ks_drifted"),
        col("cvm_t"),
        col("cvm_drifted").cast("int").as("cvm_drifted"),
        col("mw_z"),
        col("mw_drifted").cast("int").as("mw_drifted"))
      .orderBy("o_orderpriority")
  }

  /** The drift panel fed from the STANDING COUNT STORE path
    * ([[graft.quality.Drift.driftPanelFromCounts]], the q268
    * resume==recompute treatment): the current side arrives as two
    * separately-counted shard halves (event_id ≡ 0 / 2 mod 4, the
    * shapes a [[graft.streaming.EventStreams.mwDriftMaintenanceSink]]
    * store lands per batch) merged by additive count sum — and the
    * result must equal the raw two-sample panel, which is exactly
    * what the oracle computes. q237's events split and purchase
    * shift; one value-count store serves all three alarms.
    */
  private[graft] def driftPanelStoreQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val base = e.where(col("event_id") % 2 === 1)
      .where(col("value").isNotNull)
      .select(col("event_type"),
        col("value").cast("double").as("value"))
      .groupBy("event_type", "value")
      .agg(count(lit(1)).as("n"))
    val curRaw = e.where(col("event_id") % 2 === 0)
      .withColumn("value",
        when(col("event_type") === "purchase", col("value") * 1.1)
          .otherwise(col("value")))
      .where(col("value").isNotNull)
      .select(col("event_type"),
        col("value").cast("double").as("value"), col("event_id"))
    // two count shards, merged additively — the store-read shape
    val shard = (m: Int) => curRaw.where(col("event_id") % 4 === m)
      .groupBy("event_type", "value").agg(count(lit(1)).as("n"))
    val cur = shard(0).unionByName(shard(2))
      .groupBy("event_type", "value").agg(sum(col("n")).as("n"))
    graft.quality.Drift.driftPanelFromCounts(base, cur, "value", "n",
        Seq("event_type"))
      .select(col("event_type"), col("n_base"), col("n_cur"),
        round(col("ks_d"), 6).as("ks_d"),
        col("ks_drifted").cast("int").as("ks_drifted"),
        col("cvm_t"),
        col("cvm_drifted").cast("int").as("cvm_drifted"),
        col("mw_z"),
        col("mw_drifted").cast("int").as("mw_drifted"))
      .orderBy("event_type")
  }

  /** PAIRED drift ([[graft.quality.Drift.wilcoxonSignedRank]]): each
    * order RE-MEASURED — the same key twice, so between-key variance
    * cancels entirely — per market segment: the "current" reading is
    * the exact cents plus deterministic symmetric noise
    * (o_orderkey mod 7 − 3, mean zero, zeros drop as the Wilcoxon
    * contract), plus a planted +1% creep on the BUILDING segment.
    * The paired test flags BUILDING decisively while the clean
    * segments stay null-ish — exactly the small within-key shift the
    * pooled two-sample tests (q277) dilute below their thresholds.
    */
  private[graft] def wilcoxonPairedQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val cents = floor(col("o_totalprice") * 100).cast("long")
    val noise = col("o_orderkey") % 7 - 3
    val creep = when(col("c_mktsegment") === "BUILDING",
      floor(col("o_totalprice")).cast("long")).otherwise(0L)
    val pairs = o
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        cents.as("base_cents"),
        (cents + noise + creep).as("cur_cents"))
    graft.quality.Drift.wilcoxonSignedRank(pairs,
        "base_cents", "cur_cents", Seq("c_mktsegment"))
      .withColumn("drifted", col("drifted").cast("int"))
      .orderBy("c_mktsegment")
  }

  private[graft] def ksDriftQ(s: SparkSession, dir: String): DataFrame = {
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

  /** Theil–Sen robust daily trend ([[Analytics.theilSenTrend]]) of
    * event value per event type — the outlier-proof rate reading
    * beside q265's Holt state (one corrupted day can't move the
    * median-of-slopes); x is the day index from 2024-01-01, y the
    * day's exact cents sum. Bounded bucket² pair join, exact order
    * statistics, mirrored double slopes.
    */

  /** Welch's t ([[graft.quality.Drift.welchT]]) on the q292 split
    * shape with BOTH drift axes planted at once: 1-URGENT cur prices
    * ×1.25 (a location shift Welch flags at every SF) and 2-HIGH cur prices
    * ×1.6/×0.4 alternating by orderkey mod 4 (the q295
    * mean-preserving variance widening — the plant that makes the
    * POOLED t anticonservative; Welch's per-side variances absorb it
    * and the location flag stays quiet). Exact per-side (n, Σx, Σx²)
    * moments, one mirrored t + Welch–Satterthwaite df.
    */
  private[graft] def welchTQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.25)
        .when(col("o_orderpriority") === "2-HIGH",
          col("o_totalprice") *
            when(col("o_orderkey") % 4 === 0, lit(1.6))
              .otherwise(lit(0.4)))
        .otherwise(col("o_totalprice")))
    graft.quality.Drift.welchT(base, cur,
        floor(col("o_totalprice") * 100), Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  /** Cliff's δ ([[graft.quality.Drift.cliffsDelta]]) on the q292
    * split shape with a ×2 URGENT price plant: δ = 0.50 — literally
    * "a current-side URGENT order beats a baseline one 75% of the
    * time" — lands in the `large` bucket at every SF while the clean
    * priorities read negligible. The ordinal magnitude next to q292's
    * standardized d: when a feed's tails are heavy, d's pooled-sd
    * denominator inflates and hides a real shift; δ reads pure
    * dominance off the same rank identity MW uses and doesn't move.
    */
  private[graft] def cliffsDeltaQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 2.0).otherwise(col("o_totalprice")))
    graft.quality.Drift.cliffsDelta(base, cur, "o_totalprice",
        Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  /** Anderson–Darling drift ([[graft.quality.Drift.adTest]]) on the
    * q164/q261 split shape with a TAIL-ONLY plant: only URGENT cur
    * prices already above $400k get ×1.3 — the body of the
    * distribution is untouched, exactly where KS's single-worst-gap
    * reading is weakest and AD's B(N−B) tail weighting is the point.
    * The bar is 3.88 (the asymptotic 1% point, not the default 5%):
    * tail statistics on thin slices are noisy, and 5-LOW's natural
    * sf0.001 tail difference (A² = 2.87) calibrates the quiet side.
    */
  private[graft] def adDriftQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * 100)
        .cast("long"))
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("cents",
        when(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 300000.0,
          floor(col("o_totalprice") * 1.3 * 100).cast("long"))
          .otherwise(col("cents")))
    graft.quality.Drift.adTest(base, cur, "cents",
        Seq("o_orderpriority"), threshold = 3.88)
      .withColumn("drifted", col("drifted").cast("int"))
      .orderBy("o_orderpriority")
  }

  /** Cramér–von Mises drift ([[graft.quality.Drift.cvmTest]]) on the
    * q164 split shape (odd orders = baseline, even = current) with a
    * 1.10× shift planted into URGENT prices — twice q164's 1.05×,
    * which sits exactly AT the KS detection boundary at sf0.01
    * (D = 0.0499 vs threshold 0.0498); the stronger plant puts the
    * CvM statistic clearly past its asymptotic 0.461 bar, so the
    * query exhibits a flagged group next to four cleanly-null ones.
    * Exact integer gap sums in DECIMAL(38,0), one double division.
    */
  private[graft] def cvmDriftQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.10).otherwise(col("o_totalprice")))
    graft.quality.Drift.cvmTest(base, cur, "o_totalprice",
        Seq("o_orderpriority"))
      .withColumn("drifted", col("drifted").cast("int"))
      .orderBy("o_orderpriority")
  }

  /** Mann–Whitney U drift ([[graft.quality.Drift.mannWhitneyU]]) on
    * the q164 synthetic split (odd event ids = baseline, even =
    * current) with a 10% upward shift injected into `purchase`
    * values — the rank test flags the SHIFTED type and clears the
    * others, the location-drift reading KS blurs. Half-unit ranks
    * and tie cubes exact; one mirrored double formula for z.
    */
  private[graft] def mwDriftQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val base = e.where(col("event_id") % 2 === 1)
    val cur = e.where(col("event_id") % 2 === 0)
      .withColumn("value",
        when(col("event_type") === "purchase", col("value") * 1.1)
          .otherwise(col("value")))
    graft.quality.Drift.mannWhitneyU(base, cur, "value",
        Seq("event_type"))
      .withColumn("drifted", col("drifted").cast("int"))
      .orderBy("event_type")
  }

  /** Hash-randomization test ([[Analytics.permutationTest]]): does
    * BUILDING out-spend MACHINERY per customer beyond chance? 199
    * md5-keyed relabelings of per-customer exact-cents spend, the
    * observed mean difference ranked among them — the
    * cluster-randomized significance check with no RNG state.
    */
  private[graft] def permutationTestQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.permutationTest(
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long"),
        col("c_mktsegment") === "BUILDING",
        replicas = 199, salt = "q201")

  /** 1-Wasserstein drift ([[graft.quality.Drift.wassersteinTest]])
    * on the q164 split shape (odd orders = baseline, even = current)
    * with a flat +75.00 planted into URGENT prices — where q164's KS
    * answers "did it drift?", W₁ answers "by HOW MUCH, in cents":
    * the planted group must read ≈ 7500 (for a pure translation the
    * shift IS the distance) against a 1000-cent business bar, while
    * the clean groups read only the odd/even sampling noise. Exact
    * |i·m − j·n|·Δv segment sums in DECIMAL(38,0) over cents values;
    * one mirrored double division.
    */
  private[graft] def wassersteinDriftQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("cents",
        floor(col("o_totalprice") * 100).cast("long"))
    val base = o.where(col("o_orderkey") % 2 === 1)
    val cur = o.where(col("o_orderkey") % 2 === 0)
      .withColumn("cents",
        when(col("o_orderpriority") === "1-URGENT",
          col("cents") + 7500L).otherwise(col("cents")))
    graft.quality.Drift.wassersteinTest(base, cur, "cents",
        Seq("o_orderpriority"), threshold = 1000.0)
      .withColumnRenamed("w1", "w1_cents")
      .withColumn("drifted", col("drifted").cast("int"))
      .orderBy("o_orderpriority")
  }

  /** HBOS anomaly top-k ([[graft.quality.Anomaly.hbosTopK]]) over
    * three order features (value cents, order-day index, customer
    * balance cents): the rows whose per-feature histogram bins are
    * jointly thinnest — the cheap independence-assuming screen in
    * front of [[mahalanobisQ]]'s correlation-aware read. Scores are
    * exact nano-ln sums, so the ranking is float-free.
    */
  private[graft] def hbosQ(s: SparkSession, dir: String): DataFrame =
    graft.quality.Anomaly.hbosTopK(
      t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .where(col("o_totalprice").isNotNull &&
          col("o_orderdate").isNotNull && col("c_acctbal").isNotNull),
      "o_orderkey",
      Seq(
        "price" -> floor(col("o_totalprice") * 100),
        "day" -> datediff(to_date(col("o_orderdate")),
          lit("1992-01-01")).cast("long"),
        "balance" -> floor(col("c_acctbal") * 100)),
      bins = 20, topK = 40)

  /** Exact 2-D Mahalanobis top-k
    * ([[graft.quality.Anomaly.mahalanobis2d]]) on (order value,
    * customer balance) cents: the orders whose price–balance
    * COMBINATION is unusual even when each margin is ordinary —
    * exact DECIMAL moments, one mirrored division per row.
    */
  private[graft] def mahalanobisQ(
      s: SparkSession, dir: String): DataFrame =
    graft.quality.Anomaly.mahalanobis2d(
      t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .where(col("o_totalprice").isNotNull &&
          col("c_acctbal").isNotNull),
      "o_orderkey", floor(col("o_totalprice") * 100),
      floor(col("c_acctbal") * 100), topK = 40)

  /** Entropic optimal transport ([[Drift.sinkhornTransport]]) between
    * the priority-class mix of pre- and post-1995-06 orders, ordinal
    * cost |i−j| over the class digits — the WHERE-did-the-mass-move
    * plan beside q338's 1-D Wasserstein: near-uniform mixes transport
    * almost everything on the diagonal (cost 0) and `ot_cost_micro`
    * reads ≈ the earth-mover distance in micro mass·class units.
    */
  private[graft] def sinkhornQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .where(col("o_orderpriority").isNotNull &&
        col("o_orderdate").isNotNull)
    def marg(cond: Column) = o.where(cond)
      .groupBy(col("o_orderpriority").as("label"))
      .agg(count(lit(1)).as("cnt"))
    val half = to_date(col("o_orderdate")) < lit("1995-06-01")
    graft.quality.Drift.sinkhornTransport(
        marg(half), marg(!half),
        (i, j) => abs(substring(i, 1, 1).cast("long") -
          substring(j, 1, 1).cast("long")))
      .orderBy("src_label", "dst_label")
  }
}
