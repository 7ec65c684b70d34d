package graft.registry

import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fx
import graft.text.TextAnalysis
import org.apache.spark.sql.expressions.Window
import graft.registry.RegistryBase._

/** Causal-inference / experimentation / model-evaluation /
  * privacy-audit shelf — diff-in-differences, Page's ordered trend,
  * t-closeness, UCB1, and the family moved from
  * [[AnalyticsStatsShelf]] when it reached the ~3,000-line guideline
  * (ROC/AP/gains/scorecards, calibration/Brier, WoE, kappa, CUPED,
  * qini, disparate impact, Shapley/position attribution, Simpson,
  * Mantel–Haenszel, Breslow–Day, SRM) plus their DuckDB oracles.
  * Mixed into the same [[AnalyticsRegistry]] object; member bodies
  * unchanged by the move. Conventions: see [[graft.SparkEntry]].
  */
private[graft] trait AnalyticsInferenceShelf extends AnalyticsCore {

  private[graft] def inferenceQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q346_diff_in_diff" -> (diffInDiffQ _),
    "q348_page_trend" -> (pageTrendQ _),
    "q349_t_closeness" -> (tClosenessQ _),
    "q351_ucb1_allocation" -> (ucb1Q _),
    "q160_calibration_report" -> (calibrationReportQ _),
    "q188_position_attribution" -> (positionAttributionQ _),
    "q192_roc_auc" -> (rocAucQ _),
    "q193_gains_lift" -> (gainsLiftQ _),
    "q196_price_woe" -> (priceWoeQ _),
    "q197_quality_kappa" -> (qualityKappaQ _),
    "q199_isotonic_calibration" -> (isotonicCalibrationQ _),
    "q200_simpson_screen" -> (simpsonScreenQ _),
    "q203_cuped_adjustment" -> (cupedQ _),
    "q209_qini_uplift" -> (qiniUpliftQ _),
    "q214_disparate_impact" -> (disparateImpactQ _),
    "q263_mantel_haenszel" -> (mantelHaenszelQ _),
    "q271_shapley_attribution" -> (shapleyQ _),
    "q293_quality_auc" -> (qualityAucQ _),
    "q320_brier_decomposition" -> (brierDecompositionQ _),
    "q339_breslow_day" -> (breslowDayQ _),
    "q340_srm_check" -> (srmQ _),
    "q341_avg_precision" -> (avgPrecisionQ _),
    "q342_threshold_scorecard" -> (thresholdScorecardQ _),
    "q372_ipw_ate" -> (ipwAteQ _),
    "q377_ipf_raking" -> (ipfRakingQ _),
    "q389_hodges_lehmann" -> (hodgesLehmannQ _),
  )

  private[graft] def inferenceOracleSql: Map[String, String] = Map(
    // pairwise day-cell differences (domain-bounded), the house
    // order-statistic median (first doubled-cumulative ≥ n+1) —
    // exact integers only
    "q389_hodges_lehmann" ->
      """WITH e AS (
           SELECT event_type,
             (CAST(ts AS DATE) >= DATE '2024-01-15') AS post,
             CAST(ts AS DATE) AS day_,
             CAST(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-15'
                 AND event_type = 'purchase'
               THEN floor(value * 100 * 1.25)
               ELSE floor(value * 100) END AS BIGINT) AS v
           FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL
             AND ts IS NOT NULL),
         daily AS (
           SELECT event_type, post, day_,
             CAST(floor(CAST(sum(v) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
           FROM e GROUP BY 1, 2, 3),
         a AS (SELECT event_type, m AS va FROM daily WHERE NOT post),
         b AS (SELECT event_type, m AS vb FROM daily WHERE post),
         d AS (
           SELECT a.event_type, vb - va AS dd,
             CAST(count(*) AS BIGINT) AS c
           FROM a JOIN b USING (event_type) GROUP BY 1, 2),
         cum AS (
           SELECT event_type, dd, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY dd
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cm,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
               AS np
           FROM d),
         hl AS (
           SELECT event_type, min(dd) AS hl_shift_cents,
             max(np) AS n_pairs
           FROM cum WHERE cm * 2 >= np + 1 GROUP BY 1),
         sz AS (
           SELECT event_type,
             CAST(sum(CASE WHEN post THEN 0 ELSE 1 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN post THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
           FROM daily GROUP BY 1)
         SELECT sz.event_type, n_a, n_b,
           coalesce(n_pairs, 0) AS n_pairs, hl_shift_cents
         FROM sz LEFT JOIN hl USING (event_type)
         ORDER BY event_type""",
    // the q369 unrolled-iteration device: 6 generated half-step CTEs,
    // each w' = (w·target·1e6) // Σw_band exact in HUGEINT — the
    // engine's DECIMAL(38,0) mirror; all operands positive
    "q377_ipf_raking" -> {
      def half(k: Int): String = {
        val (ax, m) = if (k % 2 == 1) ("i", "rm") else ("j", "cm")
        s"""w$k AS (
           SELECT w.i, w.j,
             CAST((CAST(w.w AS HUGEINT) * m.target * 1000000)
               // s.sm AS BIGINT) AS w
           FROM w${k - 1} w
           JOIN (SELECT $ax, CAST(sum(w) AS HUGEINT) AS sm
                 FROM w${k - 1} GROUP BY 1) s ON s.$ax = w.$ax
           JOIN $m m ON m.$ax = w.$ax)"""
      }
      s"""WITH base AS (
           SELECT c_mktsegment AS i, o_orderstatus AS j,
             o_orderkey AS k
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment IS NOT NULL
             AND o_orderstatus IS NOT NULL),
         rm AS (SELECT i, CAST(count(*) AS BIGINT) AS target
                FROM base GROUP BY 1),
         cm AS (SELECT j, CAST(count(*) AS BIGINT) AS target
                FROM base GROUP BY 1),
         sc AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n
                FROM base WHERE k % 2 = 1 GROUP BY 1, 2),
         w0 AS (SELECT i, j, n * 1000000 AS w FROM sc),
         ${(1 to 6).map(half).mkString(",\n         ")}
         SELECT w6.i AS c_mktsegment, w6.j AS o_orderstatus,
           sc.n AS n_sample, w6.w AS w_micro,
           round(CAST(w6.w AS DOUBLE)
             / (CAST(sc.n AS DOUBLE) * 1000000.0), 6) AS weight_ratio
         FROM w6 JOIN sc ON sc.i = w6.i AND sc.j = w6.j
         ORDER BY 1, 2"""
    },
    // per-stratum exact integer cells; the __ALL row's Hájek-IPW sums
    // quantize per stratum BEFORE summing (HUGEINT mirror of the
    // engine's DECIMAL(38,0) contributions); all operands positive so
    // // == div
    "q372_ipw_ate" ->
      """WITH b AS (
           SELECT coalesce(CAST(c_mktsegment AS VARCHAR), 'null')
               || '|' || coalesce(CAST(o_orderstatus AS VARCHAR), 'null')
               AS stratum,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS t,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE o_totalprice IS NOT NULL),
         c AS (
           SELECT stratum, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS sy1,
             CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT)
               AS sy0
           FROM b WHERE t IS NOT NULL AND y IS NOT NULL GROUP BY 1),
         c2 AS (
           SELECT *, n - n1 AS n0,
             CASE WHEN n1 > 0 AND n - n1 > 0 THEN 1 ELSE 0 END
               AS in_support
           FROM c),
         per AS (
           SELECT stratum, n, n1,
             (n1 * 1000000) // n AS e_micro,
             CASE WHEN n1 > 0 THEN sy1 // n1 END AS mu1_cents,
             CASE WHEN n0 > 0 THEN sy0 // n0 END AS mu0_cents,
             CASE WHEN in_support = 1
               THEN (sy1 // n1) - (sy0 // n0) END AS ate_cents,
             in_support
           FROM c2),
         tot AS (
           SELECT sum(n) AS nt, sum(n1) AS n1t,
             sum((CAST(sy1 AS HUGEINT) * n) // n1) AS t1,
             sum((CAST(sy0 AS HUGEINT) * n) // n0) AS t0
           FROM c2 WHERE in_support = 1),
         tr AS (
           SELECT '__ALL' AS stratum, CAST(nt AS BIGINT) AS n,
             CAST(n1t AS BIGINT) AS n1,
             CAST((n1t * 1000000) // nt AS BIGINT) AS e_micro,
             CAST(t1 // nt AS BIGINT) AS mu1_cents,
             CAST(t0 // nt AS BIGINT) AS mu0_cents,
             CAST((t1 // nt) - (t0 // nt) AS BIGINT) AS ate_cents,
             1 AS in_support
           FROM tot)
         SELECT * FROM per UNION ALL SELECT * FROM tr
         ORDER BY stratum""",
    // four exact (treat × post) cell sums per type; each mean ONE
    // mirrored double division, did a fixed-order double expression
    "q346_diff_in_diff" ->
      """WITH b AS (
           SELECT event_type AS g, (user_id % 2 = 0) AS t,
             (CAST(ts AS DATE) >= DATE '2024-01-15') AS p,
             CAST(CASE WHEN user_id % 2 = 0
                 AND CAST(ts AS DATE) >= DATE '2024-01-15'
                 AND event_type = 'purchase'
               THEN floor(value * 100 * 1.25)
               ELSE floor(value * 100) END AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         agg AS (
           SELECT g,
             CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ctl_pre,
             CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ctl_post,
             CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END)
               AS BIGINT) AS n_treat_pre,
             CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END)
               AS BIGINT) AS n_treat_post,
             CAST(sum(CASE WHEN NOT t AND NOT p THEN y ELSE 0 END)
               AS BIGINT) AS s_c0,
             CAST(sum(CASE WHEN NOT t AND p THEN y ELSE 0 END)
               AS BIGINT) AS s_c1,
             CAST(sum(CASE WHEN t AND NOT p THEN y ELSE 0 END)
               AS BIGINT) AS s_t0,
             CAST(sum(CASE WHEN t AND p THEN y ELSE 0 END)
               AS BIGINT) AS s_t1
           FROM b GROUP BY g)
         SELECT g AS event_type, n_ctl_pre, n_ctl_post, n_treat_pre,
           n_treat_post,
           round(CASE WHEN n_ctl_pre > 0 THEN CAST(s_c0 AS DOUBLE)
             / CAST(n_ctl_pre AS DOUBLE) END, 4) AS mean_ctl_pre,
           round(CASE WHEN n_ctl_post > 0 THEN CAST(s_c1 AS DOUBLE)
             / CAST(n_ctl_post AS DOUBLE) END, 4) AS mean_ctl_post,
           round(CASE WHEN n_treat_pre > 0 THEN CAST(s_t0 AS DOUBLE)
             / CAST(n_treat_pre AS DOUBLE) END, 4) AS mean_treat_pre,
           round(CASE WHEN n_treat_post > 0 THEN CAST(s_t1 AS DOUBLE)
             / CAST(n_treat_post AS DOUBLE) END, 4)
             AS mean_treat_post,
           round(CASE WHEN n_ctl_pre > 0 AND n_ctl_post > 0
               AND n_treat_pre > 0 AND n_treat_post > 0 THEN
             (CAST(s_t1 AS DOUBLE) / CAST(n_treat_post AS DOUBLE)
               - CAST(s_t0 AS DOUBLE) / CAST(n_treat_pre AS DOUBLE))
             - (CAST(s_c1 AS DOUBLE) / CAST(n_ctl_post AS DOUBLE)
               - CAST(s_c0 AS DOUBLE) / CAST(n_ctl_pre AS DOUBLE))
             END, 4) AS did
         FROM agg ORDER BY event_type""",
    // the friedman doubled-rank machinery with the dose-index
    // weighting; L2/E2 exact BIGINTs, one mirrored z
    "q348_page_trend" ->
      """WITH cells AS (
           SELECT o_orderstatus AS g,
             CAST((year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1) AS BIGINT)
               AS b,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS dose,
             CAST(sum(CAST(floor(o_totalprice * 100
                 * (1.0 + CAST(substr(o_orderpriority, 1, 1)
                   AS BIGINT) * 0.1)) AS BIGINT)) AS BIGINT) AS y
           FROM orders GROUP BY 1, 2, 3),
         k AS (SELECT g, CAST(count(DISTINCT dose) AS BIGINT) AS k
               FROM cells GROUP BY g),
         complete AS (
           SELECT c.*, k.k,
             CAST(count(*) OVER (PARTITION BY c.g, c.b) AS BIGINT)
               AS bk
           FROM cells c JOIN k ON k.g = c.g),
         cf AS (SELECT * FROM complete WHERE bk = k),
         dj AS (
           SELECT g, dose, CAST(row_number() OVER (
             PARTITION BY g ORDER BY dose ASC) AS BIGINT) AS j
           FROM (SELECT DISTINCT g, dose FROM cf)),
         tiec AS (
           SELECT g, b, y, CAST(count(*) AS BIGINT) AS t
           FROM cf GROUP BY g, b, y),
         rk AS (
           SELECT g, b, y,
             2 * coalesce(CAST(sum(t) OVER (PARTITION BY g, b
               ORDER BY y ASC ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS rank2
           FROM tiec),
         wr AS (
           SELECT cf.g, cf.b, dj.j, rk.rank2
           FROM cf
           JOIN rk ON rk.g = cf.g AND rk.b = cf.b AND rk.y = cf.y
           JOIN dj ON dj.g = cf.g AND dj.dose = cf.dose),
         tot AS (
           SELECT g, CAST(count(DISTINCT b) AS BIGINT) AS n_blocks,
             CAST(max(j) AS BIGINT) AS n_doses,
             CAST(sum(CAST(j AS HUGEINT) * rank2) AS HUGEINT) AS l2
           FROM wr GROUP BY g)
         SELECT g AS o_orderstatus, n_blocks, n_doses,
           CAST(l2 AS BIGINT) AS l2,
           round(CASE WHEN n_blocks >= 2 AND n_doses >= 3 THEN
             (CAST(l2 AS DOUBLE)
               - CAST(CAST(n_blocks AS HUGEINT) * n_doses
                 * (n_doses + 1) * (n_doses + 1) AS DOUBLE) / 2.0)
             / (2.0 * sqrt(CAST(n_blocks AS DOUBLE)
               * CAST(n_doses AS DOUBLE) * CAST(n_doses AS DOUBLE)
               * (CAST(n_doses AS DOUBLE) + 1.0)
               * (CAST(n_doses AS DOUBLE) * CAST(n_doses AS DOUBLE)
                 - 1.0) / 144.0))
             END, 6) AS z,
           CAST(CASE WHEN n_blocks >= 2 AND n_doses >= 3 THEN
             CASE WHEN (CAST(l2 AS DOUBLE)
               - CAST(CAST(n_blocks AS HUGEINT) * n_doses
                 * (n_doses + 1) * (n_doses + 1) AS DOUBLE) / 2.0)
             / (2.0 * sqrt(CAST(n_blocks AS DOUBLE)
               * CAST(n_doses AS DOUBLE) * CAST(n_doses AS DOUBLE)
               * (CAST(n_doses AS DOUBLE) + 1.0)
               * (CAST(n_doses AS DOUBLE) * CAST(n_doses AS DOUBLE)
                 - 1.0) / 144.0)) > 1.645 THEN 1 ELSE 0 END
             END AS INT) AS increasing
         FROM tot ORDER BY o_orderstatus""",
    // per-(class, value) counts, the global domain cross-joined so
    // missing values still gap; exact HUGEINT cum-share gaps, one
    // division by Nc·Ng·(m−1)
    "q349_t_closeness" ->
      """WITH b AS (
           SELECT c_nationkey AS q1, c_mktsegment AS q2,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS v
           FROM customer),
         pc AS (
           SELECT q1, q2, v, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2, 3),
         vals AS (
           SELECT v, CAST(sum(c) AS BIGINT) AS gcnt
           FROM pc GROUP BY v),
         cls AS (
           SELECT q1, q2, CAST(sum(c) AS BIGINT) AS class_size
           FROM pc GROUP BY 1, 2),
         grid AS (
           SELECT cls.q1, cls.q2, cls.class_size, vals.v, vals.gcnt,
             coalesce(pc.c, 0) AS c
           FROM cls CROSS JOIN vals
           LEFT JOIN pc ON pc.q1 = cls.q1 AND pc.q2 = cls.q2
             AND pc.v = vals.v),
         cum AS (
           SELECT q1, q2, class_size,
             CAST(sum(c) OVER w AS BIGINT) AS cc,
             CAST(sum(gcnt) OVER w AS BIGINT) AS cg,
             CAST(sum(gcnt) OVER (PARTITION BY q1, q2) AS BIGINT)
               AS ng,
             CAST(count(*) OVER (PARTITION BY q1, q2) AS BIGINT) AS m
           FROM grid
           WINDOW w AS (PARTITION BY q1, q2 ORDER BY v ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         agg AS (
           SELECT q1, q2, class_size, max(ng) AS ng, max(m) AS m,
             sum(abs(CAST(cc AS HUGEINT) * ng
               - CAST(cg AS HUGEINT) * class_size)) AS s
           FROM cum GROUP BY 1, 2, 3)
         SELECT q1 AS c_nationkey, q2 AS c_mktsegment, class_size,
           round(CASE WHEN m > 1 THEN CAST(s AS DOUBLE)
             / CAST(CAST(class_size AS HUGEINT) * ng * (m - 1)
               AS DOUBLE) END, 6) AS emd,
           CAST(CASE WHEN m > 1 THEN CASE WHEN CAST(s AS DOUBLE)
             / CAST(CAST(class_size AS HUGEINT) * ng * (m - 1)
               AS DOUBLE) > 0.2 THEN 1 ELSE 0 END END AS INT)
             AS violates
         FROM agg ORDER BY c_nationkey, c_mktsegment""",
    // per-arm exact counts/sums; mean + scale·√(2·ln N/n) mirrored;
    // argmax by the shared score double, arm tie-break
    "q351_ucb1_allocation" ->
      """WITH per AS (
           SELECT CAST(date_diff('day', DATE '2024-01-01',
               CAST(ts AS DATE)) % 7 AS BIGINT) AS g,
             event_type AS arm, CAST(count(*) AS BIGINT) AS n_pulls,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS s
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         wn AS (
           SELECT *, CAST(sum(n_pulls) OVER (PARTITION BY g)
             AS BIGINT) AS bign
           FROM per),
         sc AS (
           SELECT g, arm, n_pulls,
             round(CAST(s AS DOUBLE) / CAST(n_pulls AS DOUBLE), 4)
               AS mean_reward,
             CAST(s AS DOUBLE) / CAST(n_pulls AS DOUBLE)
               + 500.0 * sqrt(2.0 * ln(CAST(bign AS DOUBLE))
                 / CAST(n_pulls AS DOUBLE)) AS score
           FROM wn),
         rk AS (
           SELECT *, row_number() OVER (PARTITION BY g
             ORDER BY score DESC, arm ASC) AS r
           FROM sc)
         SELECT g AS dow, arm, n_pulls, mean_reward,
           round(score, 4) AS ucb_score,
           CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS INT) AS chosen
         FROM rk ORDER BY dow, arm""",
    // the replayed quality score micro-floored, MW rank identity,
    // one mirrored division for AUC and Gini
    "q293_quality_auc" ->
      s"""$oracleMetricsCte,
         sc AS (
           SELECT source,
             CAST(floor(quality * 1000000.0) AS BIGINT) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM q WHERE text IS NOT NULL AND lang IS NOT NULL),
         per AS (
           SELECT source, s, CAST(sum(pos) AS BIGINT) AS cp,
             CAST(count(*) - sum(pos) AS BIGINT) AS cn
           FROM sc GROUP BY 1, 2),
         cum AS (
           SELECT source, cp, cn,
             coalesce(sum(cp + cn) OVER (PARTITION BY source ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bef
           FROM per),
         r AS (SELECT source, cp, cn, 2 * bef + (cp + cn) + 1
             AS rank2 FROM cum),
         agg AS (
           SELECT source, CAST(sum(cp) AS BIGINT) AS np,
             CAST(sum(cn) AS BIGINT) AS nn,
             sum(CAST(cp AS HUGEINT) * rank2) AS r2p
           FROM r GROUP BY source),
         f AS (
           SELECT source, np, nn,
             CASE WHEN np = 0 OR nn = 0 THEN NULL
               ELSE CAST(r2p - CAST(np AS HUGEINT) * (np + 1)
                 AS DOUBLE)
                 / CAST(CAST(np AS HUGEINT) * nn * 2 AS DOUBLE)
               END AS auc
           FROM agg)
         SELECT source, np AS n_pos, nn AS n_neg,
           round(auc, 6) AS auc,
           round(auc * 2.0 - 1.0, 6) AS gini
         FROM f ORDER BY source""",
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
    // the integer Holt recursion replayed as a recursive CTE; the
    // mirrored step floor((a·x + b·(l+t))/1000) is exact below 2^49
    // cents per bucket, so every emitted column is an exact BIGINT
    // the coalition lattice is GENERATED (32 VALUES rows for the 4
    // known channels); v's are one double division each, lattice-term
    // differences nano-floored before the exact integer-weighted sum
    "q271_shapley_attribution" -> {
      val channels = Seq("click", "error", "signup", "view")
      def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
      val k = channels.size
      val rows = (for {
        i <- channels
        rest = channels.filterNot(_ == i)
        bits <- 0 until (1 << (k - 1))
        t = rest.zipWithIndex.collect {
          case (c, j) if (bits & (1 << j)) != 0 => c
        }
      } yield s"('$i', '${t.mkString("|")}', " +
        s"'${(t :+ i).sorted.mkString("|")}', " +
        s"${fact(t.size) * fact(k - 1 - t.size)})")
        .mkString(",\n           ")
      s"""WITH r AS (
           SELECT user_id,
             CASE WHEN event_type <> 'purchase' THEN event_type END
               AS ch,
             (event_type = 'purchase') AS cv
           FROM events WHERE event_id % 29 = 0),
         pu AS (
           SELECT user_id,
             coalesce(list_sort(list(DISTINCT ch)
               FILTER (WHERE ch IS NOT NULL)), []) AS st,
             max(CASE WHEN cv THEN 1 ELSE 0 END) AS conv
           FROM r GROUP BY user_id),
         pk AS (SELECT coalesce(array_to_string(st, '|'), '') AS k,
                st, conv
           FROM pu),
         ss AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(conv) AS BIGINT) AS c FROM pk GROUP BY k),
         vv AS (SELECT k, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS v
                FROM ss),
         lat(channel, tk, tik, w) AS (VALUES
           $rows),
         t AS (
           SELECT lat.channel,
             CAST(floor((coalesce(va.v, 0.0) - coalesce(vb.v, 0.0))
               * 1000000000.0) AS BIGINT) * lat.w AS term
           FROM lat
           LEFT JOIN vv va ON va.k = lat.tik
           LEFT JOIN vv vb ON vb.k = lat.tk),
         phi AS (SELECT channel, CAST(sum(term) AS BIGINT) AS s1
                 FROM t GROUP BY channel),
         nu AS (
           SELECT ch2 AS channel, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(conv) AS BIGINT) AS n_conv
           FROM (SELECT unnest(st) AS ch2, conv FROM pk) GROUP BY 1)
         SELECT nu.channel, nu.n_users, nu.n_conv,
           round(CAST(phi.s1 AS DOUBLE) / ${fact(k)}.0
             / 1000000000.0, 6) AS shapley
         FROM nu JOIN phi ON phi.channel = nu.channel
         ORDER BY 1"""
    },
    // exact 2×2 counts per stratum; every pooled term an integral-
    // division micro-quantization (HUGEINT //, non-negative operands
    // — truncation identical to Spark's IntegralDivide), one double
    // division each for or_mh and the χ²
    "q263_mantel_haenszel" ->
      """WITH r AS (
           SELECT c_mktsegment AS s,
             (o_orderpriority = '1-URGENT') AS e,
             (o_orderstatus = 'F') AS o
           FROM orders JOIN customer ON o_custkey = c_custkey),
         per AS (
           SELECT s,
             CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
               AS BIGINT) AS d
           FROM r GROUP BY s),
         t AS (
           SELECT s, a, b, c, d,
             (CAST(a AS HUGEINT) * d * 1000000) // (a + b + c + d)
               AS rmu,
             (CAST(b AS HUGEINT) * c * 1000000) // (a + b + c + d)
               AS smu,
             (CAST(a + b AS HUGEINT) * (a + c) * 1000000)
               // (a + b + c + d) AS emu,
             CASE WHEN a + b + c + d > 1 THEN
               (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
                 * 1000000)
               // (CAST(a + b + c + d AS HUGEINT) * (a + b + c + d)
                 * (a + b + c + d - 1))
               ELSE 0 END AS vmu
           FROM per),
         strata AS (
           SELECT s AS st, a, b, c, d,
             CASE WHEN b * c > 0 THEN
               round(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                 / CAST(CAST(b AS HUGEINT) * c AS DOUBLE), 6) END
               AS odds_ratio,
             CAST(NULL AS DOUBLE) AS or_mh,
             CAST(NULL AS DOUBLE) AS cmh_chi2
           FROM t),
         tot AS (
           SELECT '__total__' AS st,
             CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b,
             CAST(sum(c) AS BIGINT) AS c, CAST(sum(d) AS BIGINT) AS d,
             CAST(NULL AS DOUBLE) AS odds_ratio,
             CASE WHEN sum(smu) > 0 THEN
               round(CAST(sum(rmu) AS DOUBLE)
                 / CAST(sum(smu) AS DOUBLE), 6) END AS or_mh,
             CASE WHEN sum(vmu) > 0 THEN
               round(CAST((sum(CAST(a AS HUGEINT) * 1000000)
                   - sum(emu))
                 * (sum(CAST(a AS HUGEINT) * 1000000) - sum(emu))
                 AS DOUBLE)
                 / (1000000.0 * CAST(sum(vmu) AS DOUBLE)), 6) END
               AS cmh_chi2
           FROM t)
         SELECT st AS c_mktsegment, a, b, c, d, odds_ratio, or_mh,
           cmh_chi2
         FROM (SELECT * FROM strata UNION ALL SELECT * FROM tot)
         ORDER BY c_mktsegment""",
    // q167's pairing CTEs with the 40/20/40 credit policy; middle
    // remainder on rank n-1, every conversion sums to 1000 exactly
    "q188_position_attribution" ->
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
           CAST(CASE WHEN n_touches = 1 THEN 1000
                WHEN n_touches = 2 THEN 500
                WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400
                ELSE 200 // (n_touches - 2)
                  + CASE WHEN touch_rank = n_touches - 1
                    THEN 200 % (n_touches - 2) ELSE 0 END
                END AS BIGINT) AS credit_milli
         FROM r ORDER BY conversion_id, touch_rank""",
    // exact micro-unit Brier numerator; per-bin rel/res numerators
    // divided once and nano-floored before order-free sums
    "q320_brier_decomposition" ->
      s"""$oracleMetricsCte,
         rws AS (
           SELECT source AS g,
             least(CAST(floor(quality * 10) AS INT), 9) AS bin,
             CAST(floor(quality * 1000000) AS BIGINT) AS p,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
           FROM q
           WHERE quality IS NOT NULL AND lang IS NOT NULL
             AND text IS NOT NULL),
         pb AS (
           SELECT g, bin, CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(p) AS BIGINT) AS sp,
             CAST(sum(o) AS BIGINT) AS so,
             sum(CAST(p - o * 1000000 AS HUGEINT)
               * (p - o * 1000000)) AS sq
           FROM rws GROUP BY 1, 2),
         tt AS (
           SELECT g, CAST(sum(nk) AS BIGINT) AS n,
             CAST(sum(so) AS BIGINT) AS sot, sum(sq) AS sqt
           FROM pb GROUP BY 1),
         terms AS (
           SELECT pb.g, n, sot, sqt,
             CAST(floor(
               CAST(CAST(sp AS HUGEINT) - CAST(so AS HUGEINT)
                 * 1000000 AS DOUBLE)
               * CAST(CAST(sp AS HUGEINT) - CAST(so AS HUGEINT)
                 * 1000000 AS DOUBLE)
               / CAST(nk AS DOUBLE)) AS HUGEINT) AS rel,
             CAST(floor(
               CAST(CAST(so AS HUGEINT) * n - CAST(sot AS HUGEINT)
                 * nk AS DOUBLE)
               * CAST(CAST(so AS HUGEINT) * n - CAST(sot AS HUGEINT)
                 * nk AS DOUBLE)
               / (CAST(nk AS DOUBLE) * CAST(n AS DOUBLE)
                 * CAST(n AS DOUBLE))
               * 1000000000000.0) AS HUGEINT) AS res
           FROM pb JOIN tt ON tt.g = pb.g),
         ag AS (
           SELECT g, max(n) AS n, max(sot) AS sot, max(sqt) AS sqt,
             CAST(count(*) AS BIGINT) AS n_bins,
             sum(rel) AS rels, sum(res) AS ress
           FROM terms GROUP BY g),
         f AS (
           SELECT g, n, n_bins,
             CAST(sqt AS DOUBLE) / 1000000000000.0
               / CAST(n AS DOUBLE) AS brier,
             CAST(rels AS DOUBLE) / 1000000000000.0
               / CAST(n AS DOUBLE) AS rel,
             CAST(ress AS DOUBLE) / 1000000000000.0
               / CAST(n AS DOUBLE) AS res,
             CAST(sot AS DOUBLE) / CAST(n AS DOUBLE) AS obar
           FROM ag)
         SELECT g AS source, n, n_bins,
           round(brier, 6) AS brier,
           round(rel, 6) AS reliability,
           round(res, 6) AS resolution,
           round(obar * (1.0 - obar), 6) AS uncertainty,
           round(brier - (rel - res + obar * (1.0 - obar)), 6)
             AS wb_gap
         FROM f ORDER BY source""",
    // distinct-score collapse + rank-sum identity: U·2 stays integer
    // (the +nn term is the doubled tie half-credit); AUC and Gini are
    // one double division each
    "q192_roc_auc" ->
      """WITH b AS (
           SELECT o_orderstatus AS g, o_totalprice AS s,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y
           FROM orders),
         bs AS (
           SELECT g, s,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn
           FROM b GROUP BY 1, 2),
         wb AS (
           SELECT g, np, nn,
             CAST(coalesce(sum(nn) OVER (PARTITION BY g ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
           FROM bs),
         u AS (
           SELECT g, CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             CAST(sum(np * (2 * below + nn)) AS BIGINT) AS u2
           FROM wb GROUP BY g)
         SELECT g AS o_orderstatus, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             round(CAST(u2 AS DOUBLE)
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
               6) END AS auc,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             round(CAST(u2 AS DOUBLE)
               / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) - 1.0,
               6) END AS gini_idx
         FROM u ORDER BY 1""",
    // ntile's fill rule (first n mod b bins take the extra row) is
    // ANSI-identical; every statistic is a ratio of exact counts
    "q193_gains_lift" ->
      """WITH lab AS (
           SELECT c_mktsegment, c_acctbal, c_custkey,
             (c_custkey IN (SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')) AS y
           FROM customer),
         b AS (
           SELECT c_mktsegment AS g,
             CAST(ntile(10) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS INT) AS bucket,
             y
           FROM lab),
         per AS (
           SELECT g, bucket, count(*) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
           FROM b GROUP BY 1, 2),
         cum AS (
           SELECT g, bucket, n, n_pos,
             CAST(sum(n) OVER (PARTITION BY g ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cn,
             CAST(sum(n_pos) OVER (PARTITION BY g ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cp,
             CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS tn,
             CAST(sum(n_pos) OVER (PARTITION BY g) AS BIGINT) AS tp
           FROM per)
         SELECT g AS c_mktsegment, bucket, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS response_rate,
           round(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE), 6)
             AS cum_gain,
           round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS lift,
           round((CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
             / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6)
             AS cum_lift
         FROM cum ORDER BY 1, 2""",
    // caller-supplied fixed-width bins (no global sort window);
    // Laplace 0.5 smoothing keeps one-class bins finite; the IV total
    // is a bins-sized rounded double sum
    "q196_price_woe" ->
      """WITH b AS (
           SELECT CAST(floor(o_totalprice / 30000.0) AS BIGINT) AS bin,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y
           FROM orders),
         per AS (SELECT bin,
           CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
           FROM b GROUP BY 1),
         tt AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
                CAST(sum(n_neg) AS BIGINT) AS tn, count(*) AS nb
                FROM per),
         sc AS (
           SELECT per.bin, per.n_pos, per.n_neg,
             (CAST(n_pos AS DOUBLE) + 0.5)
               / (CAST(tp AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)) AS ps,
             (CAST(n_neg AS DOUBLE) + 0.5)
               / (CAST(tn AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)) AS ns
           FROM per CROSS JOIN tt),
         w AS (SELECT bin, n_pos, n_neg, ln(ps / ns) AS woe,
               (ps - ns) * ln(ps / ns) AS iv FROM sc),
         ivt AS (SELECT CAST(sum(iv) AS DOUBLE) AS ivt FROM w)
         SELECT bin, n_pos, n_neg, round(woe, 6) AS woe,
           round(iv, 6) AS iv_term, round(ivt, 6) AS iv_total
         FROM w CROSS JOIN ivt ORDER BY bin""",
    // κ = (N·D − S)/(N² − S): every operand an exact BIGINT, one
    // double division per statistic; the metrics CTEs replay the
    // engine's quality/token formulas verbatim
    "q197_quality_kappa" ->
      (oracleMetricsCte + """,
         lab AS (
           SELECT CASE WHEN quality >= 0.6 THEN 'hi'
                       WHEN quality >= 0.3 THEN 'mid'
                       ELSE 'lo' END AS label_a,
                  CASE WHEN tokens >= 120 THEN 'hi'
                       WHEN tokens >= 40 THEN 'mid'
                       ELSE 'lo' END AS label_b
           FROM q),
         cells AS (SELECT label_a, label_b, count(*) AS n
                   FROM lab GROUP BY 1, 2),
         r AS (SELECT label_a, CAST(sum(n) AS BIGINT) AS r
               FROM cells GROUP BY 1),
         c AS (SELECT label_b, CAST(sum(n) AS BIGINT) AS c
               FROM cells GROUP BY 1),
         s AS (SELECT CAST(coalesce(sum(r.r * c.c), 0) AS BIGINT) AS s
               FROM r JOIN c ON r.label_a = c.label_b),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
               CAST(sum(CASE WHEN label_a = label_b THEN n ELSE 0 END)
                 AS BIGINT) AS d
               FROM cells)
         SELECT cells.label_a, cells.label_b, cells.n, t.nt AS n_total,
           round(CAST(d AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS po,
           round(CAST(s AS DOUBLE)
             / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)), 6) AS pe,
           round((CAST(nt AS DOUBLE) * CAST(d AS DOUBLE)
               - CAST(s AS DOUBLE))
             / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
               - CAST(s AS DOUBLE)), 6) AS kappa
         FROM cells CROSS JOIN t CROSS JOIN s ORDER BY 1, 2"""),
    // PAV via the min-max identity over interval averages of BIGINT
    // prefix sums — every average is one division, min/max over
    // doubles is order-free, so the fit is engine-deterministic
    "q199_isotonic_calibration" ->
      """WITH b AS (
           SELECT o_orderstatus AS g,
             CAST(floor(o_totalprice / 30000.0) AS BIGINT) AS bin,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y
           FROM orders),
         bins AS (SELECT g, bin, count(*) AS n,
           CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p
           FROM b GROUP BY 1, 2),
         arr AS (
           SELECT g, list(bin ORDER BY bin) AS bs,
             list(n ORDER BY bin) AS ns, list(p ORDER BY bin) AS ps,
             count(*) AS len
           FROM bins GROUP BY g),
         pre AS (
           SELECT g, bs, ns, ps, len,
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len), i ->
                 CAST(list_reduce(ns[1:i], (a, x) -> a + x)
                   AS BIGINT))) AS cn,
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len), i ->
                 CAST(list_reduce(ps[1:i], (a, x) -> a + x)
                   AS BIGINT))) AS cp
           FROM arr),
         iso AS (
           SELECT g, bs, ns, ps, len, cn, cp,
             list_transform(generate_series(1, len), i ->
               list_max(list_transform(generate_series(1, i), k ->
                 list_min(list_transform(generate_series(i, len), j ->
                   CAST(cp[j + 1] - cp[k] AS DOUBLE)
                     / CAST(cn[j + 1] - cn[k] AS DOUBLE)))))) AS iso
           FROM pre)
         SELECT g AS o_orderstatus, bs[i] AS bin, ns[i] AS n,
           ps[i] AS n_pos,
           round(CAST(ps[i] AS DOUBLE) / CAST(ns[i] AS DOUBLE), 6)
             AS raw_rate,
           round(iso[i], 6) AS iso_rate
         FROM iso, LATERAL (SELECT unnest(generate_series(1, len))
           AS i) t
         ORDER BY 1, 2""",
    // rates are one division of exact counts each; the reversal flag
    // multiplies two exact differences' signs; empty-cohort strata
    // report null rates and flag 0
    "q200_simpson_screen" ->
      """WITH b AS (
           SELECT (c_mktsegment = 'BUILDING') AS a,
             o_orderpriority AS s, (o_totalprice > 150000.0) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         st AS (SELECT s,
           CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN a AND y THEN 1 ELSE 0 END) AS BIGINT)
             AS pos_a,
           CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           CAST(sum(CASE WHEN (NOT a) AND y THEN 1 ELSE 0 END)
             AS BIGINT) AS pos_b
           FROM b GROUP BY s),
         ov AS (SELECT CAST(sum(n_a) AS BIGINT) AS ona,
                CAST(sum(pos_a) AS BIGINT) AS opa,
                CAST(sum(n_b) AS BIGINT) AS onb,
                CAST(sum(pos_b) AS BIGINT) AS opb FROM st),
         x AS (
           SELECT st.*,
             CASE WHEN n_a > 0 THEN CAST(pos_a AS DOUBLE)
               / CAST(n_a AS DOUBLE) END AS ra,
             CASE WHEN n_b > 0 THEN CAST(pos_b AS DOUBLE)
               / CAST(n_b AS DOUBLE) END AS rb,
             CASE WHEN ona > 0 THEN CAST(opa AS DOUBLE)
               / CAST(ona AS DOUBLE) END AS ora,
             CASE WHEN onb > 0 THEN CAST(opb AS DOUBLE)
               / CAST(onb AS DOUBLE) END AS orb
           FROM st CROSS JOIN ov)
         SELECT s AS stratum, n_a, pos_a, n_b, pos_b,
           round(ra, 6) AS rate_a, round(rb, 6) AS rate_b,
           round(ra - rb, 6) AS diff,
           round(ora - orb, 6) AS overall_diff,
           CAST(coalesce((ra - rb) * (ora - orb) < 0, FALSE) AS INT)
             AS reversal
         FROM x ORDER BY 1""",
    // every moment an exact BIGINT (whole-dollar units keep sum(x*y)
    // inside long); θ, ρ² and the adjusted means are fixed arithmetic
    // over those longs — long→double conversion is correctly rounded,
    // so both engines agree bit-for-bit
    "q203_cuped_adjustment" ->
      """WITH cust AS (
           SELECT c_custkey, (c_mktsegment = 'BUILDING') AS a
           FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         po AS (
           SELECT o_custkey,
             CAST(sum(CASE WHEN CAST(o_orderdate AS DATE)
               < DATE '1999-01-01'
               THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS x,
             CAST(sum(CASE WHEN CAST(o_orderdate AS DATE)
               >= DATE '1999-01-01'
               THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS y
           FROM orders GROUP BY 1),
         units AS (
           SELECT cust.a, coalesce(po.x, 0) AS x,
             coalesce(po.y, 0) AS y
           FROM cust LEFT JOIN po ON c_custkey = o_custkey),
         pooled AS (SELECT count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy,
           CAST(sum(x * y) AS BIGINT) AS sxy FROM units),
         arms AS (SELECT a, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
           FROM units GROUP BY a),
         calc AS (
           SELECT arms.a, arms.n,
             CAST(arms.ax AS DOUBLE) / CAST(arms.n AS DOUBLE) AS mx,
             CAST(arms.ay AS DOUBLE) / CAST(arms.n AS DOUBLE) AS my,
             CAST(pooled.sx AS DOUBLE) / CAST(pooled.n AS DOUBLE)
               AS gx,
             CAST(pooled.n AS DOUBLE) * CAST(pooled.sxy AS DOUBLE)
               - CAST(pooled.sx AS DOUBLE) * CAST(pooled.sy AS DOUBLE)
               AS covn,
             CAST(pooled.n AS DOUBLE) * CAST(pooled.sxx AS DOUBLE)
               - CAST(pooled.sx AS DOUBLE) * CAST(pooled.sx AS DOUBLE)
               AS varxn,
             CAST(pooled.n AS DOUBLE) * CAST(pooled.syy AS DOUBLE)
               - CAST(pooled.sy AS DOUBLE) * CAST(pooled.sy AS DOUBLE)
               AS varyn
           FROM arms CROSS JOIN pooled)
         SELECT CAST(a AS INT) AS cohort, n,
           round(mx, 4) AS mean_pre, round(my, 4) AS mean_post,
           round(my - (CASE WHEN varxn > 0 THEN covn / varxn END)
             * (mx - gx), 4) AS adjusted_mean,
           round(CASE WHEN varxn > 0 THEN covn / varxn END, 6)
             AS theta,
           round(CASE WHEN varxn > 0 AND varyn > 0
             THEN (covn * covn) / (varxn * varyn) END, 6) AS rho2
         FROM calc ORDER BY cohort""",
    // counts BIGINT; uplift and Qini divide once per row; cumulative
    // sums descend the score bins
    "q209_qini_uplift" ->
      """WITH lab AS (
           SELECT CAST(floor(c_acctbal / 1100.0) AS BIGINT) AS b,
             (c_mktsegment = 'BUILDING') AS t,
             (c_custkey IN (SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')) AS y
           FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         bins AS (SELECT b,
           CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
           CAST(sum(CASE WHEN t AND y THEN 1 ELSE 0 END) AS BIGINT)
             AS rt,
           CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
             AS nc,
           CAST(sum(CASE WHEN (NOT t) AND y THEN 1 ELSE 0 END)
             AS BIGINT) AS rc
           FROM lab GROUP BY b),
         cum AS (
           SELECT b, nt, rt, nc, rc,
             CAST(sum(nt) OVER (ORDER BY b DESC ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt,
             CAST(sum(rt) OVER (ORDER BY b DESC ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS crt,
             CAST(sum(nc) OVER (ORDER BY b DESC ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cnc,
             CAST(sum(rc) OVER (ORDER BY b DESC ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS crc
           FROM bins)
         SELECT b AS bin, nt AS n_treated, rt AS r_treated,
           nc AS n_control, rc AS r_control,
           round(CASE WHEN nt > 0 AND nc > 0 THEN
             CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE)
             - CAST(rc AS DOUBLE) / CAST(nc AS DOUBLE) END, 6)
             AS uplift,
           round(CASE WHEN cnc > 0 THEN CAST(crt AS DOUBLE)
             - CAST(crc AS DOUBLE)
               * (CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)) END, 4)
             AS cum_qini
         FROM cum ORDER BY bin DESC""",
    // the four-fifths flag is exact cross-multiplication over
    // BIGINTs; the most-favored group is the micro-quantized rate
    // argmax, smallest name on ties
    "q214_disparate_impact" ->
      """WITH lab AS (
           SELECT c_mktsegment AS g,
             (c_custkey IN (SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')) AS y
           FROM customer),
         per AS (SELECT g, count(*) AS n,
                 CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                   AS p
                 FROM lab GROUP BY g),
         rm AS (SELECT g, n, p,
                CAST(floor(1000000 * CAST(p AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS BIGINT) AS rm FROM per),
         mx AS (SELECT max(rm) AS mx FROM rm),
         best AS (SELECT n AS bn, p AS bp FROM rm CROSS JOIN mx
                  WHERE rm = mx ORDER BY g LIMIT 1)
         SELECT per.g AS c_mktsegment, per.n, per.p AS n_pos,
           round(CAST(p AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
           round((CAST(p AS DOUBLE) * CAST(bn AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(bp AS DOUBLE)), 6)
             AS impact_ratio,
           CAST(5 * p * bn < 4 * bp * n AS INT) AS four_fifths_flag
         FROM per CROSS JOIN best ORDER BY 1""",
    // q263's count CTE + the BD replay: ψ̂ from the same HUGEINT
    // micro divisions, the margin-box quadratic root and variance as
    // a fixed-order mirrored double chain, each χ² term micro-
    // FLOORED before the sum, one division by 10⁶ at the end
    "q339_breslow_day" ->
      """WITH r AS (
           SELECT c_mktsegment AS s,
             (o_orderpriority = '1-URGENT') AS e,
             (o_orderstatus = 'F') OR (c_mktsegment = 'BUILDING'
               AND o_orderpriority = '1-URGENT'
               AND o_orderkey % 3 = 0) AS o
           FROM orders JOIN customer ON o_custkey = c_custkey),
         per AS (
           SELECT s,
             CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
               AS BIGINT) AS d
           FROM r GROUP BY s),
         psi AS (
           SELECT CAST(sum((CAST(a AS HUGEINT) * d * 1000000)
               // (a + b + c + d)) AS DOUBLE)
             / CAST(sum((CAST(b AS HUGEINT) * c * 1000000)
               // (a + b + c + d)) AS DOUBLE) AS psi
           FROM per),
         q AS (
           SELECT per.*, psi.psi,
             CAST(a + b AS DOUBLE) AS n1, CAST(c + d AS DOUBLE) AS n2,
             CAST(a + c AS DOUBLE) AS m1,
             (a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0)
               AS valid
           FROM per CROSS JOIN psi),
         e1 AS (
           SELECT *, 1.0 - psi AS qa,
             (n2 - m1) + psi * (n1 + m1) AS qb,
             -(psi * n1 * m1) AS qc
           FROM q),
         e2 AS (SELECT *, qb * qb - 4.0 * qa * qc AS disc FROM e1),
         e3 AS (
           SELECT *, (-qb + sqrt(disc)) / (2.0 * qa) AS r1,
             (-qb - sqrt(disc)) / (2.0 * qa) AS r2,
             greatest(0.0, m1 - n2) AS lo, least(n1, m1) AS hi
           FROM e2),
         e4 AS (
           SELECT *, CASE WHEN abs(qa) < 1e-12 THEN -(qc / qb)
             WHEN r1 >= lo - 1e-9 AND r1 <= hi + 1e-9 THEN r1
             ELSE r2 END AS ea
           FROM e3),
         e5 AS (
           SELECT *, 1.0 / (1.0 / ea + 1.0 / (n1 - ea)
               + 1.0 / (m1 - ea) + 1.0 / (n2 - m1 + ea)) AS vr,
             CAST(a AS DOUBLE) - ea AS dnum
           FROM e4),
         t AS (
           SELECT s, a, b, c, d, valid,
             CASE WHEN valid THEN ea END AS ea,
             CASE WHEN valid THEN
               CAST(floor((dnum * dnum / vr) * 1000000.0) AS BIGINT)
               ELSE 0 END AS tmu,
             CASE WHEN valid THEN
               CAST(floor(dnum * 1000000.0) AS BIGINT)
               ELSE 0 END AS dmu,
             CASE WHEN valid THEN
               CAST(floor(vr * 1000000.0) AS BIGINT)
               ELSE 0 END AS vmu
           FROM e5),
         strata AS (
           SELECT s AS st, a, b, c, d,
             CASE WHEN b * c > 0 THEN
               round(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                 / CAST(CAST(b AS HUGEINT) * c AS DOUBLE), 6) END
               AS odds_ratio,
             round(ea, 4) AS expected_a,
             CAST(NULL AS DOUBLE) AS bd_chi2,
             CAST(NULL AS DOUBLE) AS bd_chi2_tarone,
             CAST(NULL AS BIGINT) AS df,
             CAST(NULL AS INT) AS heterogeneous
           FROM t),
         tot AS (
           SELECT '__total__' AS st,
             CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b,
             CAST(sum(c) AS BIGINT) AS c, CAST(sum(d) AS BIGINT) AS d,
             CAST(NULL AS DOUBLE) AS odds_ratio,
             CAST(NULL AS DOUBLE) AS expected_a,
             round(CAST(sum(tmu) AS DOUBLE) / 1000000.0, 6)
               AS bd_chi2,
             round(CASE WHEN sum(vmu) > 0 THEN
               CAST(sum(tmu) AS DOUBLE) / 1000000.0
                 - (CAST(sum(dmu) AS DOUBLE) / 1000000.0)
                 * (CAST(sum(dmu) AS DOUBLE) / 1000000.0)
                 / (CAST(sum(vmu) AS DOUBLE) / 1000000.0) END, 6)
               AS bd_chi2_tarone,
             greatest(CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END)
               AS BIGINT) - 1, 0) AS df,
             CAST(CASE WHEN CAST(sum(tmu) AS DOUBLE) / 1000000.0
               > 9.488 THEN 1 ELSE 0 END AS INT) AS heterogeneous
           FROM t)
         SELECT st AS c_mktsegment, a, b, c, d, odds_ratio,
           expected_a, bd_chi2, bd_chi2_tarone, df, heterogeneous
         FROM (SELECT * FROM strata UNION ALL SELECT * FROM tot)
         ORDER BY c_mktsegment""",
    // all-integer GOF: each arm's (n·W − nt·w)²·10⁶ div (nt·w·W)
    // term is an exact HUGEINT integral division; one Σ/10⁶
    "q340_srm_check" ->
      """WITH d AS (
           SELECT event_type AS g,
             CAST(event_id % 2 AS VARCHAR) AS arm
           FROM events
           WHERE NOT (event_type = 'purchase' AND event_id % 4 = 1)),
         counts AS (
           SELECT g, arm, CAST(count(*) AS BIGINT) AS n
           FROM d GROUP BY 1, 2),
         arms AS (SELECT * FROM (VALUES ('0', CAST(1 AS BIGINT)),
           ('1', CAST(1 AS BIGINT))) AS v(arm, w)),
         grps AS (SELECT DISTINCT g FROM counts),
         f AS (
           SELECT grps.g, arms.arm, arms.w,
             coalesce(counts.n, 0) AS n
           FROM grps CROSS JOIN arms
           LEFT JOIN counts ON counts.g = grps.g
             AND counts.arm = arms.arm),
         tt AS (
           SELECT g, arm, w, n,
             CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS nt
           FROM f),
         terms AS (
           SELECT *, CASE WHEN nt > 0 THEN
             (CAST(n AS HUGEINT) * 2 - CAST(nt AS HUGEINT) * w)
               * (CAST(n AS HUGEINT) * 2 - CAST(nt AS HUGEINT) * w)
               * 1000000 // (CAST(nt AS HUGEINT) * w * 2)
             ELSE 0 END AS tmu
           FROM tt),
         fin AS (
           SELECT g, arm, w, n, nt,
             CAST(sum(tmu) OVER (PARTITION BY g) AS DOUBLE)
               / 1000000.0 AS chi2
           FROM terms)
         SELECT g AS event_type, arm, n AS n_arm,
           round(CAST(nt AS DOUBLE) * w / 2.0, 2) AS expected_arm,
           round(chi2, 6) AS srm_chi2, CAST(1 AS BIGINT) AS df,
           CAST(CASE WHEN chi2 > 3.841 THEN 1 ELSE 0 END AS INT)
             AS mismatch
         FROM fin ORDER BY event_type, arm""",
    // the q192 ranking frame; each step's ΔTP·TP·10⁶ // (TP+FP) is
    // an exact HUGEINT integral division, one Σ/(10⁶·P) at the end
    "q341_avg_precision" ->
      """WITH b AS (
           SELECT o_orderstatus AS g, o_totalprice AS s,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y
           FROM orders),
         per AS (
           SELECT g, s,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn
           FROM b GROUP BY 1, 2),
         cum AS (
           SELECT g, np, nn,
             CAST(sum(np) OVER w AS BIGINT) AS tp,
             CAST(sum(nn) OVER w AS BIGINT) AS fp
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (
           SELECT g, np, nn,
             (CAST(np AS HUGEINT) * tp * 1000000) // (tp + fp) AS tmu
           FROM cum),
         agg AS (
           SELECT g, CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg, sum(tmu) AS smu
           FROM t GROUP BY g)
         SELECT g AS o_orderstatus, n_pos, n_neg,
           CASE WHEN n_pos > 0 THEN
             round(CAST(smu AS DOUBLE)
               / (1000000.0 * CAST(n_pos AS DOUBLE)), 6) END
             AS avg_precision,
           CASE WHEN n_pos + n_neg > 0 THEN
             round(CAST(n_pos AS DOUBLE)
               / CAST(n_pos + n_neg AS DOUBLE), 6) END AS prevalence
         FROM agg ORDER BY o_orderstatus""",
    // same frame; argmax over the exact F1-nano / J·PN lattices with
    // score-desc tie-break, mirrored double display metrics
    "q342_threshold_scorecard" ->
      """WITH b AS (
           SELECT o_orderstatus AS g, o_totalprice AS s,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y
           FROM orders),
         per AS (
           SELECT g, s,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn
           FROM b GROUP BY 1, 2),
         cum AS (
           SELECT g, s, np, nn,
             CAST(sum(np) OVER w AS BIGINT) AS tp,
             CAST(sum(nn) OVER w AS BIGINT) AS fp,
             CAST(sum(np) OVER (PARTITION BY g) AS BIGINT) AS p,
             CAST(sum(nn) OVER (PARTITION BY g) AS BIGINT) AS n
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         m AS (
           SELECT g, s, tp, fp, p, n, p - tp AS fn, n - fp AS tn,
             (CAST(tp AS HUGEINT) * 2 * 1000000000)
               // (2 * tp + fp + (p - tp)) AS f1n,
             CAST(tp AS HUGEINT) * n + CAST(n - fp AS HUGEINT) * p
               - CAST(p AS HUGEINT) * n AS jpn
           FROM cum),
         rk AS (
           SELECT *,
             row_number() OVER (PARTITION BY g
               ORDER BY f1n DESC, s DESC) AS rf,
             row_number() OVER (PARTITION BY g
               ORDER BY jpn DESC, s DESC) AS rj
           FROM m),
         u AS (
           SELECT 'max_f1' AS criterion, * FROM rk WHERE rf = 1
           UNION ALL
           SELECT 'max_j' AS criterion, * FROM rk WHERE rj = 1)
         SELECT g AS o_orderstatus, criterion, s AS threshold,
           tp, fp, fn, tn,
           round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)
             / CAST(tp + fp AS DOUBLE) END, 6) AS "precision",
           round(CASE WHEN p > 0 THEN CAST(tp AS DOUBLE)
             / CAST(p AS DOUBLE) END, 6) AS recall,
           round(CAST(f1n AS DOUBLE) / 1000000000.0, 6) AS f1,
           round(CASE WHEN p > 0 AND n > 0 THEN CAST(jpn AS DOUBLE)
             / CAST(CAST(p AS HUGEINT) * n AS DOUBLE) END, 6)
             AS youden_j,
           round(CASE WHEN sqrt(CAST(CAST(tp + fp AS HUGEINT)
               * (tp + (p - tp)) * ((n - fp) + fp)
               * ((n - fp) + (p - tp)) AS DOUBLE)) > 0.0 THEN
             CAST(CAST(tp AS HUGEINT) * (n - fp)
               - CAST(fp AS HUGEINT) * (p - tp) AS DOUBLE)
             / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + (p - tp))
               * ((n - fp) + fp) * ((n - fp) + (p - tp)) AS DOUBLE))
             END, 6) AS mcc
         FROM u ORDER BY o_orderstatus, criterion""",
  )

  /** Difference-in-differences ([[Analytics.diffInDiff]]) on the
    * event log: treat = even user ids, post = from 2024-01-15, a
    * ×1.25 lift PLANTED into treated-post purchase values (re-seeded
    * by the oracle) — the estimator must recover ≈ 25 % of the
    * purchase mean on the planted type and ≈ 0 on the clean ones,
    * with all four cell means emitted for the parallel-trends read.
    */
  private[graft] def diffInDiffQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val treat = col("user_id") % 2 === 0
    val post = to_date(col("ts")) >= lit("2024-01-15").cast("date")
    val cents = when(treat && post && col("event_type") === "purchase",
      floor(col("value") * 100 * 1.25))
      .otherwise(floor(col("value") * 100)).cast("long")
    Analytics.diffInDiff(e, Seq("event_type"), treat, post, cents)
      .orderBy("event_type")
  }

  /** Page's L ordered trend ([[Analytics.pageTrendTest]]): monthly
    * order-value cells per status, doses = the five priority tiers
    * (the digit prefix), with a deterministic ×(1 + dose/10) ramp
    * painted on so the monotone alternative is real — the ORDERED
    * question q306's Friedman can't ask ("do priorities differ" vs
    * "do they increase in tier order"). Doubled ranks exact; one
    * mirrored z.
    */
  private[graft] def pageTrendQ(
      s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val dose = substring(col("o_orderpriority"), 1, 1).cast("long")
    val monthIdx = (year(col("o_orderdate").cast("date")) * 12 +
      month(col("o_orderdate").cast("date")) - 1).cast("long")
    val cents = floor(col("o_totalprice") * 100 *
      (lit(1.0) + dose.cast("double") * 0.1)).cast("long")
    Analytics.pageTrendTest(o, Seq("o_orderstatus"), monthIdx, dose,
        cents)
      .orderBy("o_orderstatus")
  }

  /** t-closeness audit ([[graft.quality.Privacy.tClosenessReport]]):
    * quasi-identifiers (nation, segment), sensitive attribute =
    * account balance in 1000-unit buckets — does any linkable
    * customer class sit further than t = 0.2 (ordered EMD) from the
    * global balance distribution? The distributional disclosure
    * audit q170/q187 build toward. Exact cum-share gaps; one
    * division.
    */
  private[graft] def tClosenessQ(
      s: SparkSession, dir: String): DataFrame =
    graft.quality.Privacy.tClosenessReport(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"), t = 0.2)
      .orderBy("c_nationkey", "c_mktsegment")

  /** UCB1 allocation ([[Analytics.ucb1Allocation]]) over the event
    * log read as a bandit history: arms = event types, reward =
    * value cents, one cohort per day-of-week — which arm does the
    * policy pull next, per cohort? Deterministic optimism bonus
    * (scale 500 cents), replayable from warehouse counts — no RNG.
    */
  private[graft] def ucb1Q(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val dow = (datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date")) % 7).cast("long")
    Analytics.ucb1Allocation(
        e.withColumn("__dow", dow), Seq("__dow"), col("event_type"),
        floor(col("value") * 100).cast("long"), scaleCents = 500.0)
      .withColumnRenamed("__dow", "dow")
      .orderBy("dow", "arm")
  }

  /** U-shaped (40/20/40) attribution over the q167 conversion/touch
    * setup ([[Analytics.positionAttribution]]).
    */
  private[graft] def positionAttributionQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    Analytics.positionAttribution(
        e.where(col("event_type") === "purchase"),
        e.where(col("event_type").isin("view", "click")),
        "user_id", "ts", "event_id", windowDuration = "2 hours")
      .select(col("user_id"), col("conversion_id"), col("touch_id"),
        col("touch_rank"), col("n_touches"), col("credit_milli"))
      .orderBy("conversion_id", "touch_rank")
  }

  /** Calibration (reliability) report
    * ([[graft.text.QualityModel.calibrationReport]]) of the composite
    * quality score against the is-English slice: per decile bin the
    * mean predicted score vs the empirical rate, the gap, and the ECE
    * contribution — integer micro-unit sums keep every emitted double
    * a single exact-long division.
    */
  private[graft] def calibrationReportQ(
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

  /** Murphy decomposition of the Brier score
    * ([[graft.text.QualityModel.brierDecomposition]]) for the q293
    * task (quality score vs is-English, per source): q160's ECE says
    * the bins are off by X; this splits the TOTAL error into the
    * miscalibration q199's isotonic pass could fix (reliability),
    * the discrimination no recalibration can add (resolution), and
    * the base-rate floor (uncertainty) — with the within-bin
    * remainder emitted (`wb_gap`) so the identity is audited, not
    * asserted.
    */
  private[graft] def brierDecompositionQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .where(col("text").isNotNull && col("lang").isNotNull)
    graft.text.QualityModel.brierDecomposition(d, Seq("source"),
        TextAnalysis.qualityScore(col("text")),
        col("lang") === "en")
      .orderBy("source")
  }

  /** Language-bias audit of the composite quality score, per source
    * ([[graft.text.QualityModel.rocAuc]] against the is-English
    * label): a quality filter that implicitly ranks one language
    * higher silently skews the training mixture when a single floor
    * is applied corpus-wide. AUC ≈ 0.5 means no bias; here the
    * per-source AUCs scatter 0.2–0.7 around it, i.e. the heuristic
    * score is NOT an English classifier in disguise — the reading
    * that justifies q81's per-language (not global) floor. Exact
    * Mann–Whitney rank identity over micro-floored scores; one
    * mirrored division for AUC, Gini from the same division.
    */
  private[graft] def qualityAucQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .where(col("text").isNotNull && col("lang").isNotNull)
    graft.text.QualityModel.rocAuc(d, Seq("source"),
        TextAnalysis.qualityScore(col("text")),
        col("lang") === "en")
      .orderBy("source")
  }

  /** Shapley channel attribution ([[Analytics.shapleyAttribution]]):
    * the coalition-game credit for the four non-purchase event types
    * toward purchase conversion — the average-marginal-lift reading
    * beside q188's position heuristic. Per-user touch sets, empirical
    * coalition values, nano-floored lattice terms with exact integer
    * weights, one mirrored /k!/1e9 division.
    */
  private[graft] def shapleyQ(s: SparkSession, dir: String): DataFrame = {
    // deterministic 1/29 event subsample: with every event kept, all
    // users touch all channels and convert (v ≡ 1 — a degenerate
    // lattice); the thinned journeys vary both touch sets and
    // conversion, which is the shape the estimator exists for
    val e = events(s, dir).where(col("event_id") % 29 === 0)
    Analytics.shapleyAttribution(e, col("user_id"),
        when(col("event_type") =!= "purchase", col("event_type")),
        col("event_type") === "purchase")
      .orderBy("channel")
  }

  /** Mantel–Haenszel adjusted odds ratio + CMH χ²
    * ([[Analytics.mantelHaenszel]]) of urgent-priority → order-status-F
    * across market-segment strata — the inferential complement of
    * q200's Simpson screen on the same stratification shape: the
    * segment-adjusted common effect a pooled 2×2 would confound.
    * Exact per-stratum counts, integral-division micro terms, one
    * double division each for or_mh and χ².
    */
  private[graft] def mantelHaenszelQ(
      s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "orders").join(t(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    Analytics.mantelHaenszel(j, "c_mktsegment",
        col("o_orderpriority") === "1-URGENT",
        col("o_orderstatus") === "F")
      .orderBy("c_mktsegment")
  }

  /** Exact ROC-AUC ([[Analytics.rocAuc]]): can an order's total price
    * rank its priority? Per order status, the Mann–Whitney AUC of
    * `o_totalprice` as a score for the urgent/high label — the
    * rank-sum identity over distinct scores, never the O(n²) pair
    * join; ties count half in exact BIGINT.
    */
  private[graft] def rocAucQ(s: SparkSession, dir: String): DataFrame =
    Analytics.rocAuc(t(s, dir, "orders"), "o_orderstatus",
        col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy("o_orderstatus")

  /** Per-segment decile gains/lift table ([[Analytics.gainsTable]]):
    * customers ranked by account balance within each market segment,
    * response = placed at least one 1-URGENT order — the campaign-
    * targeting report (capture curve + lift vs the segment base rate),
    * every statistic a ratio of exact counts.
    */
  private[graft] def gainsLiftQ(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val scored = t(s, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"),
        col("o_custkey").isNotNull.as("__y"))
    Analytics.gainsTable(scored, "c_mktsegment", col("c_acctbal"),
        col("__y"), col("c_custkey"), buckets = 10)
      .orderBy("c_mktsegment", "bucket")
  }

  /** Weight-of-evidence / information-value scorecard screen
    * ([[Analytics.binnedWoe]]): fixed-width price bins of order totals
    * scored against the urgent/high label — the shuffle-free binning
    * (an equal-frequency cut would be a global sort window), smoothed
    * log-odds per bin, IV total on every row.
    */
  private[graft] def priceWoeQ(s: SparkSession, dir: String): DataFrame =
    Analytics.binnedWoe(t(s, dir, "orders"),
        floor(col("o_totalprice") / 30000.0).cast("long"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy("bin")

  /** Cohen's kappa inter-annotator agreement
    * ([[Analytics.cohenKappa]]): the composite quality score vs a
    * token-count-only annotator, both cut to hi/mid/lo tiers — does
    * the cheap labeler agree with the full one beyond chance? κ is an
    * exact integer ratio (N·D − S)/(N² − S).
    */
  private[graft] def qualityKappaQ(s: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityScore(col("text"))
    val tk = TextAnalysis.tokenCount(col("text"))
    val labeled = docs(s, dir).select(
      when(q >= 0.6, "hi").when(q >= 0.3, "mid").otherwise("lo").as("a"),
      when(tk >= 120, "hi").when(tk >= 40, "mid").otherwise("lo").as("b"))
    Analytics.cohenKappa(labeled, col("a"), col("b"))
      .orderBy("label_a", "label_b")
  }

  /** Isotonic calibration ([[Analytics.isotonicCalibration]]): the
    * urgent/high rate per fixed-width price bin, PAV-fitted monotone
    * non-decreasing via the min-max identity
    * max_{k≤i} min_{j≥i} avg(k..j) — distributed pool-adjacent-
    * violators with no sequential pooling loop, per order status.
    */
  private[graft] def isotonicCalibrationQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.isotonicCalibration(t(s, dir, "orders"), "o_orderstatus",
        floor(col("o_totalprice") / 30000.0).cast("long"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy("o_orderstatus", "bin")

  /** Simpson's-paradox screen ([[Analytics.simpsonScreen]]):
    * big-order rate of BUILDING vs MACHINERY customers, overall and
    * within each order priority — strata whose difference reverses
    * the aggregate's sign get flagged before anyone ships the
    * aggregate.
    */
  private[graft] def simpsonScreenQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.simpsonScreen(
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("c_mktsegment") === "BUILDING",
        col("o_orderpriority"),
        col("o_totalprice") > 150000.0)
      .orderBy("stratum")

  /** CUPED variance reduction ([[Analytics.cuped]]): per-customer
    * post-1999 spend adjusted by pre-1999 spend (whole dollars — the
    * Int64 moment contract), BUILDING vs MACHINERY as the two arms —
    * the A/B sensitivity lift with θ = cov/var from exact integer
    * moments.
    */
  private[graft] def cupedQ(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("__a"))
    val cut = to_date(lit("1999-01-01"))
    val po = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate").cast("date") < cut,
          floor(col("o_totalprice"))).otherwise(0L)).as("__x"),
        sum(when(col("o_orderdate").cast("date") >= cut,
          floor(col("o_totalprice"))).otherwise(0L)).as("__y"))
    val units = cust
      .join(po, col("c_custkey") === col("o_custkey"), "left")
      .select(col("__a"), coalesce(col("__x"), lit(0L)).as("__x"),
        coalesce(col("__y"), lit(0L)).as("__y"))
    Analytics.cuped(units, col("__a"), col("__x"), col("__y"))
      .orderBy("cohort")
  }

  /** Qini uplift curve ([[Analytics.qiniCurve]]): does targeting
    * high-balance customers create incremental urgent-order response
    * in BUILDING (treated) vs MACHINERY (control)? Fixed-width
    * balance bins descending, cumulative Qini per bin — the
    * incremental-response audit for a targeting policy.
    */
  private[graft] def qiniUpliftQ(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val scored = t(s, dir, "customer")
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left")
      .select(floor(col("c_acctbal") / 1100.0).cast("long").as("__b"),
        (col("c_mktsegment") === "BUILDING").as("__t"),
        col("o_custkey").isNotNull.as("__y"))
    Analytics.qiniCurve(scored, col("__b"), col("__t"), col("__y"))
      .orderBy(col("bin").desc)
  }

  /** Disparate-impact audit ([[Analytics.disparateImpact]]):
    * urgent-order rates by market segment, each group's impact ratio
    * vs the most-favored segment, with the EEOC four-fifths flag
    * decided by exact BIGINT cross-multiplication — a boundary group
    * can't flip with float rounding.
    */
  private[graft] def disparateImpactQ(
      s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val labeled = t(s, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"),
        col("o_custkey").isNotNull.as("__y"))
    Analytics.disparateImpact(labeled, "c_mktsegment", col("__y"))
      .orderBy("c_mktsegment")
  }

  /** Breslow–Day homogeneity screen ([[Analytics.breslowDay]]) on
    * q263's stratified 2×2 frame (stratum = market segment, exposure
    * = URGENT priority, outcome = F status) with heterogeneity
    * PLANTED: BUILDING's exposed rows with orderkey ≡ 0 (mod 3) have
    * their outcome forced true, lifting that stratum's odds ratio
    * far above the others' — the test must call the pooled q263
    * or_mh unrepresentative (heterogeneous = 1 against χ²₀.₀₅,₄ =
    * 9.488). ψ̂ from micro-quantized integral divisions; the root /
    * variance chain is a fixed-order mirrored double formula; each
    * stratum's χ² term micro-floored before the sum.
    */
  private[graft] def breslowDayQ(
      s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "orders").join(t(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    val planted = col("o_orderstatus") === "F" ||
      (col("c_mktsegment") === "BUILDING" &&
        col("o_orderpriority") === "1-URGENT" &&
        col("o_orderkey") % 3 === 0)
    Analytics.breslowDay(j, "c_mktsegment",
        col("o_orderpriority") === "1-URGENT", planted,
        criticalValue = 9.488)
      .withColumn("heterogeneous", col("heterogeneous").cast("int"))
      .orderBy("c_mktsegment")
  }

  /** Sample-ratio-mismatch gate ([[Analytics.srmCheck]]): events
    * hashed 50/50 by event-id parity, with an assignment bug PLANTED
    * on purchase (odd ids ≡ 1 mod 4 dropped — a crashing variant
    * eating a quarter of one arm's purchase traffic). The planted
    * type must flag against χ²₀.₀₅,₁ = 3.841; the other types read
    * their genuine parity imbalance honestly. All-integer χ² via
    * micro-quantized integral division (quantize-before-sum); the
    * ONE double step is the final Σ/10⁶.
    */
  private[graft] def srmQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(!(col("event_type") === "purchase" &&
      col("event_id") % 4 === 1))
    Analytics.srmCheck(e, Seq("event_type"),
        (col("event_id") % 2).cast("string"),
        Seq("0" -> 1L, "1" -> 1L), criticalValue = 3.841)
      .withColumn("mismatch", col("mismatch").cast("int"))
      .orderBy("event_type", "arm")
  }

  /** Average precision ([[Analytics.averagePrecision]]) on q192's
    * exact frame (score = total price, label = urgent/high priority,
    * grouped by order status) — the prevalence-weighted companion
    * the AUC reading needs when positives are rare: same ranking,
    * same groups, the metric that collapses when the TOP of the
    * ranking is polluted. Micro-quantized integral-division step
    * terms; one mirrored double division.
    */
  private[graft] def avgPrecisionQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.averagePrecision(t(s, dir, "orders"), "o_orderstatus",
        col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy("o_orderstatus")

  /** Operating-point selection ([[Analytics.thresholdScorecard]])
    * on the same q192/q341 frame: the exact max-F1 and max-Youden-J
    * price cuts per order status with the full confusion matrix and
    * the derived metrics at each cut — "the model ranks well; where
    * do we draw the line?". Argmax over exact integer lattices
    * (nano-quantized F1, J on the P·N scale), score-descending
    * tie-break; MCC's √ of an exact DECIMAL product is correctly
    * rounded on both engines.
    */
  private[graft] def thresholdScorecardQ(
      s: SparkSession, dir: String): DataFrame =
    Analytics.thresholdScorecard(t(s, dir, "orders"),
        "o_orderstatus", col("o_totalprice"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy("o_orderstatus", "criterion")

  /** Stratified IPW treatment effect ([[Analytics.ipwAte]]) of
    * urgent/high order priority on order value, confounder-adjusted
    * by (market segment × order status) — the observational
    * counterpart to q346's diff-in-diff on the same tables: exact
    * per-stratum propensities and means in integer cents, positivity
    * surfaced per stratum (`in_support`), and the `__ALL` row the
    * Hájek-normalized IPW estimate with per-stratum contributions
    * quantized before the sum.
    */
  private[graft] def ipwAteQ(s: SparkSession, dir: String): DataFrame =
    Analytics.ipwAte(
        t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey")),
        Seq("c_mktsegment", "o_orderstatus"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        floor(col("o_totalprice") * 100))

  /** Survey raking ([[Analytics.ipfRaking]]): calibrate the odd-key
    * half-sample's (segment × status) weights so both margins match
    * the FULL table's — the weighting move a panel/sample pipeline
    * runs before any estimate, and the mixture-calibration tool for
    * matching a training-data recipe's source × language margins.
    * 3 full iterations; weights land near the ~2× half-sample scale
    * with the exact-micro half-step arithmetic the oracle replays.
    */
  private[graft] def ipfRakingQ(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isNotNull &&
        col("o_orderstatus").isNotNull)
    val rm = base.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("target"))
    val cm = base.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("target"))
    Analytics.ipfRaking(base.where(col("o_orderkey") % 2 === 1),
        "c_mktsegment", "o_orderstatus", rm, cm, iters = 3)
      .orderBy("c_mktsegment", "o_orderstatus")
  }

  /** Hodges–Lehmann level shift ([[Analytics.hodgesLehmannShift]])
    * between pre- and post-2024-01-15 DAILY MEAN event values per
    * type, with q346's ×1.25 purchase plant in the post period — the
    * robust "by how much did the level move" beside q237's
    * Mann–Whitney verdict on the same split. Day cells bound the
    * pair frame (the op's domain-bounded contract); the median of
    * pairwise differences is the house exact order-statistic median.
    */
  private[graft] def hodgesLehmannQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull &&
      col("event_type").isNotNull && col("ts").isNotNull)
    val post = to_date(col("ts")) >= lit("2024-01-15").cast("date")
    val cents = when(post && col("event_type") === "purchase",
      floor(col("value") * 100 * 1.25))
      .otherwise(floor(col("value") * 100)).cast("long")
    val daily = e
      .groupBy(col("event_type"), post.as("__post"),
        to_date(col("ts")).as("__day"))
      .agg(sum(cents).as("__s"), count(lit(1)).as("__n"))
      .select(col("event_type"), col("__post"),
        floor(col("__s").cast("double") / col("__n").cast("double"))
          .cast("long").as("__m"))
    Analytics.hodgesLehmannShift(daily, Seq("event_type"),
        col("__post"), col("__m"))
      .orderBy("event_type")
  }
}
