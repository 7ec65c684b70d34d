package graft.registry

import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Time-series / monitoring shelf — the CUSUM, change-point, mSPRT,
  * seasonal (profile / decompose / Mann-Kendall), ACF, burstiness,
  * Holt, Theil-Sen, Mann-Kendall, Page-Hinkley, runs, Durbin-Watson,
  * Ljung-Box and Gumbel queries plus their DuckDB oracles. Split from
  * [[AnalyticsDriftShelf]] (round 16 second wave); member bodies are
  * unchanged — this trait is mixed back into the same
  * [[AnalyticsRegistry]] object, so every reference resolves exactly
  * as before. Conventions: see [[graft.SparkEntry]].
  */
private[graft] trait AnalyticsTimeSeriesShelf extends AnalyticsCore {

  private[graft] def tsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_cusum_shift" -> (cusumShiftQ _),
    "q195_seasonal_dow" -> (seasonalDowQ _),
    "q205_cusum_monitor" -> (cusumFixedQ _),
    "q206_change_point" -> (changePointQ _),
    "q215_msprt_monitor" -> (msprtQ _),
    "q244_event_acf" -> (eventAcfQ _),
    "q245_event_burstiness" -> (eventBurstinessQ _),
    "q265_holt_forecast" -> (holtForecastQ _),
    "q268_holt_resume" -> (holtResumeQ _),
    "q269_theil_sen_trend" -> (theilSenQ _),
    "q285_mann_kendall" -> (mannKendallQ _),
    "q286_page_hinkley" -> (pageHinkleyQ _),
    "q302_seasonal_mk" -> (seasonalMkQ _),
    "q304_runs_test" -> (runsTestQ _),
    "q309_durbin_watson" -> (durbinWatsonQ _),
    "q318_seasonal_decompose" -> (seasonalDecomposeQ _),
    "q388_sh_esd" -> (shEsdQ _),
    "q390_overdispersion" -> (overdispersionQ _),
    "q321_gumbel_maxima" -> (gumbelMaximaQ _),
    "q327_gumbel_store" -> (gumbelStoreQ _),
    "q328_ljung_box" -> (ljungBoxQ _),
    "q354_forecast_baselines" -> (forecastBaselinesQ _),
    "q360_holt_winters" -> (holtWintersQ _),
    "q362_holt_winters_resume" -> (holtWintersResumeQ _),
  )

  /** Incremental Holt–Winters ([[Analytics.holtWintersResume]]): a
    * standing state built from the first 20 days resumes over the
    * remaining days and lands EXACTLY where q360's full recompute
    * lands — the q268 left-fold identity extended to the seasonal
    * array (the oracle IS q360's full recursive CTE). The
    * never-rescan-history form of the seasonal forecast monitor.
    */
  private[graft] def holtWintersResumeQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val cents = floor(col("value") * 100 *
      (lit(1.0) + (day % 7).cast("double") * 0.1)).cast("long")
    val state = Analytics.holtWintersForecast(
      e.where(day < 21), Seq("event_type"), day, cents)
    Analytics.holtWintersResume(state, e.where(day >= 21),
        Seq("event_type"), day, cents)
      .orderBy("event_type")
  }

  /** Holt–Winters additive forecast
    * ([[Analytics.holtWintersForecast]]): daily event cents per type
    * with a deterministic weekly cycle painted on (the q302 paint —
    * ×(1 + (day mod 7)·0.1), re-seeded by the oracle) so the
    * seasonal slots are learnable and the 1/2/3-step forecasts carry
    * them — the seasonal completion of q265's Holt state against
    * q354's baselines. Exact milli-unit triple recursion; the oracle
    * replays the fold as a generated recursive CTE carrying all
    * seven seasonal columns.
    */
  private[graft] def holtWintersQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val cents = floor(col("value") * 100 *
      (lit(1.0) + (day % 7).cast("double") * 0.1)).cast("long")
    Analytics.holtWintersForecast(e, Seq("event_type"), day, cents)
      .orderBy("event_type")
  }

  /** Forecast-baseline scorecard ([[Analytics.forecastBaselines]]):
    * daily event cents per type, days 0–20 train / 21–29 holdout,
    * one-step-rolling naive vs seasonal-naive with MAE/RMSE/MASE —
    * the bar q265's Holt must clear before its forecasts are
    * trusted, in the only metric (MASE) that compares across types
    * with different volumes. Exact error sums off the zero-filled
    * grid; each metric one mirrored division.
    */
  private[graft] def forecastBaselinesQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    Analytics.forecastBaselines(e, Seq("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")),
        floor(col("value") * 100).cast("long"),
        cutBucket = 21, endBucket = 29, season = 7)
      .orderBy("event_type")
  }

  /** Shared Holt recursion oracle (q265; q268 resumes to the same
    * answer): the integer recursion replayed as a recursive CTE; the
    * mirrored step floor((a·x + b·(l+t))/1000) is exact below 2^49
    * cents per bucket, so every emitted column is an exact BIGINT.
    */
  private[graft] val oracleHoltSql: String =
    """WITH RECURSIVE x AS (
           SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS x
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         idx AS (
           SELECT g, x, CAST(row_number() OVER (
             PARTITION BY g ORDER BY day) AS BIGINT) AS i
           FROM x),
         rec AS (
           SELECT g, CAST(1 AS BIGINT) AS i, x AS l,
             CAST(0 AS BIGINT) AS t
           FROM idx WHERE i = 1
           UNION ALL
           SELECT r.g, r.i + 1,
             CAST(floor((300.0 * CAST(n.x AS DOUBLE)
               + 700.0 * CAST(r.l + r.t AS DOUBLE)) / 1000.0)
               AS BIGINT) AS l,
             CAST(floor((100.0 * CAST(
                 CAST(floor((300.0 * CAST(n.x AS DOUBLE)
                   + 700.0 * CAST(r.l + r.t AS DOUBLE)) / 1000.0)
                   AS BIGINT) - r.l AS DOUBLE)
               + 900.0 * CAST(r.t AS DOUBLE)) / 1000.0) AS BIGINT)
               AS t
           FROM rec r JOIN idx n ON n.g = r.g AND n.i = r.i + 1),
         fin AS (
           SELECT g, i, l, t, row_number() OVER (
             PARTITION BY g ORDER BY i DESC) AS rn
           FROM rec)
         SELECT g AS event_type, i AS n_buckets, l AS level,
           t AS trend, l + t AS forecast_1, l + 2 * t AS forecast_2,
           l + 3 * t AS forecast_3
         FROM fin WHERE rn = 1 ORDER BY event_type"""

  /** Generated Holt–Winters recursive-CTE oracle (q360): the Holt
    * oracle's shape carrying seven seasonal columns; the slot CASE,
    * the duplicated l′ subexpression inside t′/s′ (recursive CTEs
    * cannot alias-reference within a row) and the final forecast
    * CASEs are string-generated so the milli-unit arithmetic mirrors
    * [[Analytics.holtWintersForecast]] token for token.
    */
  private[graft] val oracleHwSql: String = {
    val sj = "(CASE r.i % 7 " + (0 until 7)
      .map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END)"
    val lNew = s"CAST(floor((300.0 * CAST(n.x - $sj AS DOUBLE) " +
      "+ 700.0 * CAST(r.l + r.t AS DOUBLE)) / 1000.0) AS BIGINT)"
    val tNew = s"CAST(floor((100.0 * CAST($lNew - r.l AS DOUBLE) " +
      "+ 900.0 * CAST(r.t AS DOUBLE)) / 1000.0) AS BIGINT)"
    val sNew = s"CAST(floor((200.0 * CAST(n.x - $lNew AS DOUBLE) " +
      s"+ 800.0 * CAST($sj AS DOUBLE)) / 1000.0) AS BIGINT)"
    val sCols = (0 until 7).map(k =>
      s"CASE WHEN r.i % 7 = $k THEN $sNew ELSE r.s$k END AS s$k")
      .mkString(",\n             ")
    val sInit = (0 until 7).map(k => s"CAST(0 AS BIGINT) AS s$k")
      .mkString(", ")
    def fc(h: Int): String =
      s"l + $h * t + (CASE (i + ${h - 1}) % 7 " + (0 until 7)
        .map(k => s"WHEN $k THEN s$k").mkString(" ") +
        s" END) AS forecast_$h"
    s"""WITH RECURSIVE x AS (
           SELECT event_type AS g,
             CAST(date_diff('day', DATE '2024-01-01',
               CAST(ts AS DATE)) AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100 * (1.0
               + CAST(date_diff('day', DATE '2024-01-01',
                   CAST(ts AS DATE)) % 7 AS DOUBLE) * 0.1))
               AS BIGINT)) AS BIGINT) AS x
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         idx AS (
           SELECT g, x, CAST(row_number() OVER (
             PARTITION BY g ORDER BY day) AS BIGINT) AS i
           FROM x),
         rec AS (
           SELECT g, CAST(1 AS BIGINT) AS i, x AS l,
             CAST(0 AS BIGINT) AS t, $sInit
           FROM idx WHERE i = 1
           UNION ALL
           SELECT r.g, r.i + 1,
             $lNew AS l,
             $tNew AS t,
             $sCols
           FROM rec r JOIN idx n ON n.g = r.g AND n.i = r.i + 1),
         fin AS (
           SELECT *, row_number() OVER (
             PARTITION BY g ORDER BY i DESC) AS rn
           FROM rec)
         SELECT g AS event_type, i AS n_buckets, l AS level,
           t AS trend,
           ${(0 until 7).map(k => s"s$k").mkString(", ")},
           ${fc(1)}, ${fc(2)}, ${fc(3)}
         FROM fin WHERE rn = 1 ORDER BY event_type"""
  }

  private[graft] def tsOracleSql: Map[String, String] = Map(
    "q360_holt_winters" -> oracleHwSql,
    // resume == full-recompute by the left-fold identity, so the
    // incremental query shares the SAME recursive-CTE oracle
    "q362_holt_winters_resume" -> oracleHwSql,
    // exact-integer ACF: zero-filled grid, lag equi-join, HUGEINT
    // moment identities (num·n² and den·n² = n(nQ − S²)), one double
    // division — mirrors the engine's DECIMAL(38,0) arithmetic
    "q244_event_acf" ->
      """WITH e AS (
           SELECT event_type AS ty,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS idx
           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         cnt AS (SELECT ty, idx, CAST(count(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2),
         rng AS (SELECT ty, min(idx) AS lo, max(idx) AS hi
           FROM cnt GROUP BY 1),
         gs AS (
           SELECT ty, unnest(generate_series(lo, hi)) AS idx
           FROM rng),
         grid AS MATERIALIZED (
           SELECT gs.ty, gs.idx, coalesce(cnt.c, 0) AS c
           FROM gs LEFT JOIN cnt
             ON cnt.ty = gs.ty AND cnt.idx = gs.idx),
         mom AS (
           SELECT ty, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             sum(CAST(c AS HUGEINT) * c) AS q
           FROM grid GROUP BY 1),
         lagged AS (
           SELECT g.ty, l.lag, g.c AS c1, g2.c AS c2
           FROM grid g,
             LATERAL (SELECT unnest(generate_series(1, 6)) AS lag) l
           JOIN grid g2 ON g2.ty = g.ty AND g2.idx = g.idx + l.lag),
         agg AS (
           SELECT lg.ty, lg.lag, max(m.n) AS n_buckets,
             CAST(count(*) AS BIGINT) AS n_pairs,
             sum((CAST(m.n AS HUGEINT) * lg.c1 - m.s)
               * (CAST(m.n AS HUGEINT) * lg.c2 - m.s)) AS num,
             max(CAST(m.n AS HUGEINT)
               * (CAST(m.n AS HUGEINT) * m.q
                 - CAST(m.s AS HUGEINT) * m.s)) AS den
           FROM lagged lg JOIN mom m ON m.ty = lg.ty
           GROUP BY 1, 2)
         SELECT ty AS event_type, CAST(lag AS INT) AS lag, n_buckets,
           n_pairs,
           round(CASE WHEN den > 0 THEN
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6) AS r
         FROM agg ORDER BY event_type, lag""",
    // Fano = (nQ − S²)/((n−1)S), burstiness = (σ−μ)/(σ+μ), both one
    // double step over HUGEINT-exact moments; formula order mirrored
    "q245_event_burstiness" ->
      """WITH e AS (
           SELECT event_type AS ty,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS idx
           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         cnt AS (SELECT ty, idx, CAST(count(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2),
         rng AS (SELECT ty, min(idx) AS lo, max(idx) AS hi
           FROM cnt GROUP BY 1),
         gs AS (
           SELECT ty, unnest(generate_series(lo, hi)) AS idx
           FROM rng),
         grid AS (
           SELECT gs.ty, gs.idx, coalesce(cnt.c, 0) AS c
           FROM gs LEFT JOIN cnt
             ON cnt.ty = gs.ty AND cnt.idx = gs.idx),
         mom AS (
           SELECT ty, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             sum(CAST(c AS HUGEINT) * c) AS q
           FROM grid GROUP BY 1),
         f AS (
           SELECT ty, n, s,
             CAST(CAST(n AS HUGEINT) * q
               - CAST(s AS HUGEINT) * s AS DOUBLE) AS varnum,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
           FROM mom),
         g2 AS (
           SELECT ty, n, s, varnum, mean,
             sqrt(varnum / (CAST(n AS DOUBLE)
               * (CAST(n AS DOUBLE) - 1.0))) AS sigma
           FROM f)
         SELECT ty AS event_type, n AS n_buckets, s AS n_events,
           round(mean, 6) AS mean_rate,
           round(CASE WHEN n > 1 AND s > 0 THEN
             varnum / ((CAST(n AS DOUBLE) - 1.0) * CAST(s AS DOUBLE))
             END, 6) AS fano,
           round(CASE WHEN n > 1 AND sigma + mean > 0.0 THEN
             (sigma - mean) / (sigma + mean) END, 6) AS burstiness
         FROM g2 ORDER BY event_type""",
    // bucket-sum points, every slope ONE double division of exact
    // longs, medians as exact order statistics of the sorted lists
    "q269_theil_sen_trend" ->
      """WITH x AS (
           SELECT event_type AS g,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS bx,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS y
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         sl AS (
           SELECT a.g,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.bx - a.bx AS DOUBLE)
               AS s
           FROM x a JOIN x b ON a.g = b.g AND a.bx < b.bx),
         m AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
             list(s ORDER BY s) AS ss
           FROM sl GROUP BY g),
         ms AS (
           SELECT g, n_pairs,
             CASE WHEN n_pairs % 2 = 1
               THEN ss[CAST((n_pairs + 1) // 2 AS INT)]
               ELSE (ss[CAST(n_pairs // 2 AS INT)]
                 + ss[CAST(n_pairs // 2 + 1 AS INT)]) / 2.0 END
               AS slope
           FROM m),
         r AS (
           SELECT x.g,
             CAST(x.y AS DOUBLE) - ms.slope * CAST(x.bx AS DOUBLE)
               AS r,
             ms.n_pairs, ms.slope
           FROM x LEFT JOIN ms ON ms.g = x.g),
         f AS (
           SELECT g, CAST(count(*) AS BIGINT) AS nb,
             any_value(n_pairs) AS n_pairs, any_value(slope) AS slope,
             list(r ORDER BY r) FILTER (WHERE r IS NOT NULL) AS rs
           FROM r GROUP BY g)
         SELECT g AS event_type, nb AS n_buckets,
           coalesce(n_pairs, 0) AS n_pairs,
           round(slope, 6) AS slope,
           round(CASE WHEN nb % 2 = 1
             THEN rs[CAST((nb + 1) // 2 AS INT)]
             ELSE (rs[CAST(nb // 2 AS INT)]
               + rs[CAST(nb // 2 + 1 AS INT)]) / 2.0 END, 4)
             AS intercept
         FROM f ORDER BY event_type""",
    "q265_holt_forecast" -> oracleHoltSql,
    // resume == full-recompute by the left-fold identity, so the
    // incremental query shares the SAME recursive-CTE oracle
    "q268_holt_resume" -> oracleHoltSql,
    // daily-sum self-join replays S exactly; tie cubes and the n³
    // variance numerator in HUGEINT; τ and z one mirrored division
    "q285_mann_kendall" ->
      """WITH x AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS day,
             CAST(sum(CASE WHEN event_type = 'purchase'
               THEN CAST(floor(value * 100 * (1.0 +
                 CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE)
                   / 10.0)) AS BIGINT)
               ELSE CAST(floor(value * 100) AS BIGINT) END)
               AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
           FROM x GROUP BY g),
         s AS (
           SELECT a.g, CAST(sum(CASE WHEN b.y > a.y THEN 1
             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
           FROM x a JOIN x b ON a.g = b.g AND a.day < b.day
           GROUP BY a.g),
         ties AS (
           SELECT g, sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
             AS ties
           FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS t
             FROM x GROUP BY g, y) GROUP BY g),
         f AS (
           SELECT n.g, n.n, coalesce(s.s, 0) AS s,
             CAST(CAST(n.n AS HUGEINT) * (n.n - 1) * (2 * n.n + 5)
               - coalesce(ties.ties, 0) AS BIGINT) AS var_num
           FROM n LEFT JOIN s ON s.g = n.g
           LEFT JOIN ties ON ties.g = n.g),
         fz AS (
           SELECT g, n, s, var_num,
             CASE WHEN var_num <= 0 THEN NULL
               WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                 / sqrt(CAST(var_num AS DOUBLE) / 18.0)
               WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                 / sqrt(CAST(var_num AS DOUBLE) / 18.0)
               ELSE 0.0 END AS z
           FROM f)
         SELECT g AS event_type, n AS n_buckets, s AS s_stat, var_num,
           CASE WHEN n < 2 THEN NULL
             ELSE round(CAST(s AS DOUBLE) * 2.0
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
             END AS tau,
           round(z, 6) AS z,
           CAST(coalesce(abs(z) > 1.96, FALSE) AS INT) AS trending
         FROM fz ORDER BY event_type""",
    // count-frame median, exact 2y − m2 signs, one lag window for
    // the run count, one mirrored z; the block oscillation re-seeded
    "q304_runs_test" ->
      """WITH x AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS day,
             CAST(sum(CASE WHEN event_type = 'purchase'
                 AND ((CAST(ts AS DATE) - DATE '2024-01-01') // 10)
                   % 2 = 0
               THEN CAST(floor(value * 100 * 5.0) AS BIGINT)
               ELSE CAST(floor(value * 100) AS BIGINT) END)
               AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         cnt AS (SELECT g, y, CAST(count(*) AS BIGINT) AS c
           FROM x GROUP BY 1, 2),
         n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
           FROM x GROUP BY g),
         med AS (
           SELECT c2.g,
             min(CASE WHEN cum >= (n + 1) // 2 THEN y END)
               + min(CASE WHEN cum >= n // 2 + 1 THEN y END) AS m2
           FROM (SELECT g, y, CAST(sum(c) OVER (
               PARTITION BY g ORDER BY y) AS BIGINT) AS cum
             FROM cnt) c2
           JOIN n ON n.g = c2.g GROUP BY c2.g),
         sg AS (
           SELECT x.g, day,
             CASE WHEN 2 * y - m2 > 0 THEN 1 ELSE 0 END AS s
           FROM x JOIN med ON med.g = x.g WHERE 2 * y - m2 <> 0),
         rr AS (
           SELECT g, s, lag(s) OVER (PARTITION BY g ORDER BY day)
             AS p
           FROM sg),
         agg AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(s) AS BIGINT) AS n_above,
             CAST(sum(CASE WHEN p IS NULL OR p <> s THEN 1 ELSE 0
               END) AS BIGINT) AS n_runs
           FROM rr GROUP BY g),
         f AS (
           SELECT g, n_kept, n_above, n_runs,
             CAST(n_above AS DOUBLE) AS n1,
             CAST(n_kept - n_above AS DOUBLE) AS n2,
             CAST(n_kept AS DOUBLE) AS nd
           FROM agg),
         z AS (
           SELECT g, n_kept, n_above, n_runs,
             CASE WHEN n_kept < 2 OR n1 <= 0 OR n2 <= 0
                 OR 2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)
                   / (nd * nd * (nd - 1.0)) <= 0 THEN NULL
               ELSE (CAST(n_runs AS DOUBLE)
                 - (2.0 * n1 * n2 / nd + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)
                   / (nd * nd * (nd - 1.0))) END AS z
           FROM f)
         SELECT g AS event_type, n_kept, n_above, n_runs,
           round(z, 6) AS z,
           CAST(coalesce(abs(z) > 1.96, FALSE) AS INT) AS clumped
         FROM z ORDER BY event_type""",
    // within-season pair signs and per-season variance numerators
    // summed; the cycle×growth cents floor re-seeded; z one mirrored
    // division
    "q302_seasonal_mk" ->
      """WITH x AS (
           SELECT event_type AS g,
             (CAST(ts AS DATE) - DATE '2024-01-01') % 7 AS se,
             CAST(ts AS DATE) - DATE '2024-01-01' AS day,
             CAST(sum(CAST(floor(value * 100
               * (1.0 + CAST((CAST(ts AS DATE) - DATE '2024-01-01')
                 % 7 AS DOUBLE) * 0.2)
               * (CASE WHEN event_type = 'purchase'
                 THEN 1.0 + CAST(CAST(ts AS DATE) - DATE '2024-01-01'
                   AS DOUBLE) / 5.0 ELSE 1.0 END)) AS BIGINT))
               AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
         cnts AS (
           SELECT g, CAST(count(DISTINCT se) AS BIGINT) AS n_seasons,
             CAST(count(*) AS BIGINT) AS n_buckets
           FROM x GROUP BY g),
         s AS (
           SELECT a.g, CAST(sum(CASE WHEN b.y > a.y THEN 1
             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
           FROM x a JOIN x b ON a.g = b.g AND a.se = b.se
             AND a.day < b.day
           GROUP BY a.g),
         sn AS (SELECT g, se, CAST(count(*) AS BIGINT) AS n
           FROM x GROUP BY 1, 2),
         st AS (
           SELECT g, se, sum(CAST(t AS HUGEINT) * (t - 1)
             * (2 * t + 5)) AS ties
           FROM (SELECT g, se, y, CAST(count(*) AS BIGINT) AS t
             FROM x GROUP BY 1, 2, 3) GROUP BY 1, 2),
         vn AS (
           SELECT sn.g,
             CAST(sum(CAST(sn.n AS HUGEINT) * (sn.n - 1)
               * (2 * sn.n + 5) - coalesce(st.ties, 0)) AS BIGINT)
               AS var_num
           FROM sn LEFT JOIN st ON st.g = sn.g AND st.se = sn.se
           GROUP BY sn.g),
         f AS (
           SELECT cnts.g, n_seasons, n_buckets,
             coalesce(s.s, 0) AS s, var_num
           FROM cnts LEFT JOIN s ON s.g = cnts.g
           JOIN vn ON vn.g = cnts.g),
         fz AS (
           SELECT g, n_seasons, n_buckets, s, var_num,
             CASE WHEN var_num <= 0 THEN NULL
               WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                 / sqrt(CAST(var_num AS DOUBLE) / 18.0)
               WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                 / sqrt(CAST(var_num AS DOUBLE) / 18.0)
               ELSE 0.0 END AS z
           FROM f)
         SELECT g AS event_type, n_seasons, n_buckets, s AS s_stat,
           var_num, round(z, 6) AS z,
           CAST(coalesce(abs(z) > 1.96, FALSE) AS INT) AS trending
         FROM fz ORDER BY event_type""",
    // the PH trace replayed: bucket mean and running mean are the
    // two mirrored floor-divisions, everything after is BIGINT; the
    // running-min window identity needs no recursion
    "q286_page_hinkley" ->
      """WITH per AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS bx,
             CAST(sum(CASE WHEN event_type = 'purchase'
               AND CAST(ts AS DATE) >= DATE '2024-01-21'
               THEN CAST(floor(value * 100 * 1.5) AS BIGINT)
               ELSE CAST(floor(value * 100) AS BIGINT) END)
               AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         x AS (
           SELECT g, bx, CAST(floor(CAST(s AS DOUBLE) * 1000000.0
             / CAST(c AS DOUBLE)) AS BIGINT) AS x
           FROM per),
         tr AS (
           SELECT g, bx, x,
             CAST(row_number() OVER (PARTITION BY g ORDER BY bx)
               AS BIGINT) AS t,
             CAST(sum(x) OVER (PARTITION BY g ORDER BY bx)
               AS BIGINT) AS cum
           FROM x),
         tm AS (
           SELECT g, bx,
             x - CAST(floor(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE))
               AS BIGINT) - 500000000 AS term
           FROM tr),
         m AS (
           SELECT g, bx, CAST(sum(term) OVER (
             PARTITION BY g ORDER BY bx) AS BIGINT) AS m
           FROM tm),
         ph AS (
           SELECT g, bx, m - min(m) OVER (
             PARTITION BY g ORDER BY bx) AS ph
           FROM m)
         SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(ph) AS BIGINT) AS ph_max,
           CAST(min(CASE WHEN ph >= 12000000000 THEN bx END)
             AS BIGINT) AS alarm_bucket,
           CAST(CASE WHEN min(CASE WHEN ph >= 12000000000 THEN bx END)
             IS NOT NULL THEN 1 ELSE 0 END AS INT) AS alarmed
         FROM ph GROUP BY g ORDER BY event_type""",
    // the q244 exact ACF chain over the duplicated-event union;
    // per-lag terms nano-floored before the order-free sum, the
    // dof-keyed pinned chi2 critical
    "q328_ljung_box" -> {
      val chi2CritCaseSqlDrift = "CASE dof " +
        graft.operators.Analytics.chi2Crit05
          .map { case (d, v) => s"WHEN $d THEN $v" }
          .mkString(" ") + " END"
      s"""WITH ev AS (
           SELECT event_type, ts FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL
           UNION ALL
           SELECT event_type, ts FROM events
           WHERE ts IS NOT NULL AND event_type = 'purchase'
             AND hour(CAST(ts AS TIMESTAMP)) % 2 = 0
           UNION ALL
           SELECT event_type, ts FROM events
           WHERE ts IS NOT NULL AND event_type = 'purchase'
             AND hour(CAST(ts AS TIMESTAMP)) % 2 = 0
           UNION ALL
           SELECT event_type, ts FROM events
           WHERE ts IS NOT NULL AND event_type = 'purchase'
             AND hour(CAST(ts AS TIMESTAMP)) % 2 = 0),
         e AS (
           SELECT event_type AS ty,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS idx
           FROM ev),
         cnt AS (SELECT ty, idx, CAST(count(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2),
         rng AS (SELECT ty, min(idx) AS lo, max(idx) AS hi
           FROM cnt GROUP BY 1),
         gs AS (
           SELECT ty, unnest(generate_series(lo, hi)) AS idx
           FROM rng),
         grid AS MATERIALIZED (
           SELECT gs.ty, gs.idx, coalesce(cnt.c, 0) AS c
           FROM gs LEFT JOIN cnt
             ON cnt.ty = gs.ty AND cnt.idx = gs.idx),
         mom AS (
           SELECT ty, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             sum(CAST(c AS HUGEINT) * c) AS q
           FROM grid GROUP BY 1),
         lagged AS (
           SELECT g.ty, l.lag, g.c AS c1, g2.c AS c2
           FROM grid g,
             LATERAL (SELECT unnest(generate_series(1, 6)) AS lag) l
           JOIN grid g2 ON g2.ty = g.ty AND g2.idx = g.idx + l.lag),
         agg AS (
           SELECT lg.ty, lg.lag, max(m.n) AS n_buckets,
             sum((CAST(m.n AS HUGEINT) * lg.c1 - m.s)
               * (CAST(m.n AS HUGEINT) * lg.c2 - m.s)) AS num,
             max(CAST(m.n AS HUGEINT)
               * (CAST(m.n AS HUGEINT) * m.q
                 - CAST(m.s AS HUGEINT) * m.s)) AS den
           FROM lagged lg JOIN mom m ON m.ty = lg.ty
           GROUP BY 1, 2),
         terms AS (
           SELECT ty, n_buckets,
             CASE WHEN den > 0 THEN
               CAST(floor(
                 CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                 * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                 / (CAST(n_buckets AS DOUBLE)
                   - CAST(lag AS DOUBLE))
                 * 1000000000.0) AS HUGEINT)
             END AS t
           FROM agg),
         f AS (
           SELECT ty, CAST(max(n_buckets) AS BIGINT) AS n_buckets,
             CAST(count(*) AS BIGINT) AS n_lags,
             sum(t) AS ts,
             CAST(sum(CASE WHEN t IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS bad
           FROM terms GROUP BY 1),
         g2 AS (
           SELECT ty, n_buckets, n_lags,
             CASE WHEN bad = 0 AND n_buckets >= 2 THEN
               (CAST(n_buckets AS DOUBLE)
                 * (CAST(n_buckets AS DOUBLE) + 2.0))
               * (CAST(ts AS DOUBLE) / 1000000000.0)
             END AS lb,
             CAST(n_lags AS INT) AS dof
           FROM f)
         SELECT ty AS event_type, n_buckets, n_lags,
           round(lb, 6) AS lb,
           CAST(coalesce(lb > $chi2CritCaseSqlDrift, FALSE) AS INT)
             AS serially_dependent
         FROM g2 ORDER BY event_type"""
    },
    // the q321 oracle VERBATIM: the shard-merged max store must
    // reproduce the raw fit exactly (max is mergeable)
    "q327_gumbel_store" -> {
      val c6pi = graft.quality.Drift.gumbelSqrt6OverPi
      val gam = graft.quality.Drift.eulerGamma
      val k30 = graft.quality.Drift.gumbelVariate(30)
      val k365 = graft.quality.Drift.gumbelVariate(365)
      s"""WITH bm AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS b,
             max(CAST(floor(value * 100) AS BIGINT)) AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         mo AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(max(m) AS BIGINT) AS mx,
             CAST(sum(m) AS BIGINT) AS s,
             sum(CAST(m AS HUGEINT) * m) AS q
           FROM bm GROUP BY 1),
         f AS (
           SELECT g, n, mx,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(CAST(n AS HUGEINT) * q
               - CAST(s AS HUGEINT) * s AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v
           FROM mo),
         gbeta AS (
           SELECT g, n, mx, mean, v, sqrt(v) * $c6pi AS beta
           FROM f),
         gmu AS (
           SELECT g, n, mx, mean, v, beta, mean - $gam * beta AS mu
           FROM gbeta)
         SELECT g AS event_type, n AS n_blocks, mx AS max_seen,
           round(mean, 4) AS mean_max,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(mu, 4) END AS mu,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(beta, 4) END AS beta,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(mu + beta * $k30, 4) END AS rl_30,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(mu + beta * $k365, 4) END AS rl_365
         FROM gmu ORDER BY event_type"""
    },
    // exact block-max moments; Gumbel constants are the SAME driver
    // doubles interpolated into both engines; +*/sqrt mirrored
    "q321_gumbel_maxima" -> {
      val c6pi = graft.quality.Drift.gumbelSqrt6OverPi
      val gam = graft.quality.Drift.eulerGamma
      val k30 = graft.quality.Drift.gumbelVariate(30)
      val k365 = graft.quality.Drift.gumbelVariate(365)
      s"""WITH bm AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS b,
             max(CAST(floor(value * 100) AS BIGINT)) AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         mo AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(max(m) AS BIGINT) AS mx,
             CAST(sum(m) AS BIGINT) AS s,
             sum(CAST(m AS HUGEINT) * m) AS q
           FROM bm GROUP BY 1),
         f AS (
           SELECT g, n, mx,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(CAST(n AS HUGEINT) * q
               - CAST(s AS HUGEINT) * s AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v
           FROM mo),
         gbeta AS (
           SELECT g, n, mx, mean, v, sqrt(v) * $c6pi AS beta
           FROM f),
         gmu AS (
           SELECT g, n, mx, mean, v, beta, mean - $gam * beta AS mu
           FROM gbeta)
         SELECT g AS event_type, n AS n_blocks, mx AS max_seen,
           round(mean, 4) AS mean_max,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(mu, 4) END AS mu,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(beta, 4) END AS beta,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(mu + beta * $k30, 4) END AS rl_30,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
             ELSE round(mu + beta * $k365, 4) END AS rl_365
         FROM gmu ORDER BY event_type"""
    },
    // centered-MA trend (full consecutive window only), per-phase
    // floor-mean seasonal, exact-integer residual; plant re-seeded
    // q318's seasonal CTEs (with the day-33 purchase spike) feeding
    // the shared ESD rounds ([[RegistryBase.esdRoundSql]]) on the
    // residual column — the whole composition replayed in one chain
    "q388_sh_esd" ->
      s"""WITH dm AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS b,
             CAST(floor(CAST(sum(CAST(floor(value * 100) AS BIGINT))
                 AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT)
               AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         per0 AS (
           SELECT g, b,
             CASE WHEN g = 'view'
               THEN CAST(floor(CAST(m AS DOUBLE)
                 * (1.0 + CAST(b AS DOUBLE) * 0.02)
                 * (CASE WHEN b % 7 = 5 THEN 2.5 ELSE 1.0 END))
                 AS BIGINT)
               ELSE m END AS y0
           FROM dm),
         per AS (
           SELECT g, b,
             CASE WHEN g = 'purchase' AND b = 33 THEN y0 * 6
               ELSE y0 END AS y
           FROM per0),
         tr AS (
           SELECT g, b, y,
             count(*) OVER w AS cnt,
             max(b) OVER w - min(b) OVER w AS span,
             sum(y) OVER w AS s7
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY b
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         tt AS (
           SELECT g, b, y,
             CASE WHEN cnt = 7 AND span = 6
               THEN CAST(floor(CAST(s7 AS DOUBLE) / 7.0) AS BIGINT)
               END AS trend
           FROM tr),
         dd AS (SELECT g, b, y, trend, y - trend AS det FROM tt),
         se AS (
           SELECT g, b % 7 AS ph,
             CAST(floor(CAST(sum(det) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seas
           FROM dd WHERE det IS NOT NULL GROUP BY 1, 2),
         c1 AS (
           SELECT dd.g, CAST(det - seas AS BIGINT) AS v, b AS k
           FROM dd LEFT JOIN se ON se.g = dd.g AND se.ph = dd.b % 7
           WHERE trend IS NOT NULL),
         ${esdRoundSql(1)},
         ${esdRoundSql(2)},
         ${esdRoundSql(3)}
         SELECT g AS event_type, round, n, removed_cents, r_stat
         FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2
           UNION ALL SELECT * FROM o3)
         ORDER BY event_type, round""",
    // exact moments; every statistic FLOOR-quantized from one
    // mirrored chain — no rounding boundary anywhere
    "q390_overdispersion" ->
      """WITH daily AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS d,
             CAST(count(*) AS BIGINT) AS c
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         x AS (
           SELECT g, d,
             CASE WHEN g = 'click' AND ((d % 3) + 3) % 3 = 0
               THEN c * 2 ELSE c END AS y
           FROM daily),
         m AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             sum(CAST(y AS HUGEINT) * y) AS q
           FROM x GROUP BY 1 HAVING count(*) >= 2),
         f AS (
           SELECT g, n, s,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
               AS vr
           FROM m)
         SELECT g AS event_type, n, s AS total,
           CAST(floor(mean * 1000.0) AS BIGINT) AS mean_milli,
           CASE WHEN mean > 0.0 THEN
             CAST(floor(vr / mean * 1000000.0) AS BIGINT) END
             AS dispersion_micro,
           CASE WHEN vr > mean THEN
             CAST(floor(mean * mean / (vr - mean) * 1000.0)
               AS BIGINT) END AS nb_r_milli,
           CASE WHEN vr > mean THEN
             CAST(floor(mean / vr * 1000000.0) AS BIGINT) END
             AS nb_p_micro
         FROM f ORDER BY event_type""",
    "q318_seasonal_decompose" ->
      """WITH dm AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS b,
             CAST(floor(CAST(sum(CAST(floor(value * 100) AS BIGINT))
                 AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT)
               AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         per AS (
           SELECT g, b,
             CASE WHEN g = 'view'
               THEN CAST(floor(CAST(m AS DOUBLE)
                 * (1.0 + CAST(b AS DOUBLE) * 0.02)
                 * (CASE WHEN b % 7 = 5 THEN 2.5 ELSE 1.0 END))
                 AS BIGINT)
               ELSE m END AS y
           FROM dm),
         tr AS (
           SELECT g, b, y,
             count(*) OVER w AS cnt,
             max(b) OVER w - min(b) OVER w AS span,
             sum(y) OVER w AS s7
           FROM per
           WINDOW w AS (PARTITION BY g ORDER BY b
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         tt AS (
           SELECT g, b, y,
             CASE WHEN cnt = 7 AND span = 6
               THEN CAST(floor(CAST(s7 AS DOUBLE) / 7.0) AS BIGINT)
               END AS trend
           FROM tr),
         dd AS (SELECT g, b, y, trend, y - trend AS det FROM tt),
         se AS (
           SELECT g, b % 7 AS ph,
             CAST(floor(CAST(sum(det) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seas
           FROM dd WHERE det IS NOT NULL GROUP BY 1, 2)
         SELECT dd.g AS event_type, b AS bucket, y AS value, trend,
           CASE WHEN trend IS NOT NULL THEN seas END AS seasonal,
           CASE WHEN trend IS NOT NULL THEN det - seas END
             AS residual
         FROM dd LEFT JOIN se ON se.g = dd.g AND se.ph = dd.b % 7
         ORDER BY 1, 2""",
    // exact OLS moments, one mirrored division each for slope and
    // intercept, residuals micro-floored BEFORE the Σe²/Σ(Δe)² sums
    "q309_durbin_watson" ->
      """WITH daily AS (
           SELECT event_type AS g,
             CAST(ts AS DATE) - DATE '2024-01-01' AS d,
             CAST(floor(CAST(sum(CAST(floor(value * 100) AS BIGINT))
                 AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT)
               AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         x AS (
           SELECT g, d,
             CASE WHEN g = 'purchase' AND (d // 10) % 2 = 0
                 THEN m * 5
               WHEN g = 'view'
                 THEN CAST(floor(CAST(m AS DOUBLE)
                   * (1.0 + CAST(d AS DOUBLE) * 0.05)) AS BIGINT)
               ELSE m END AS y
           FROM daily),
         ols AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(d AS HUGEINT) * y) AS sxy,
             sum(CAST(d AS HUGEINT) * d) AS sxx
           FROM x GROUP BY g),
         ab AS (
           SELECT g, n, sx, sy,
             CAST(CAST(n AS HUGEINT) * sxx
               - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS den,
             CAST(CAST(n AS HUGEINT) * sxy
                 - CAST(sx AS HUGEINT) * sy AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * sxx
                 - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b
           FROM ols),
         ab2 AS (
           SELECT g, n, den, b,
             (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
           FROM ab),
         eq AS (
           SELECT x.g, d, n, den, b,
             CAST(floor((CAST(y AS DOUBLE) - a - b
               * CAST(d AS DOUBLE)) * 1000000.0) AS HUGEINT) AS e
           FROM x JOIN ab2 ON ab2.g = x.g),
         lg AS (
           SELECT g, e, lag(e) OVER (PARTITION BY g ORDER BY d) AS p,
             n, den, b
           FROM eq),
         agg AS (
           SELECT g, CAST(max(n) AS BIGINT) AS n_buckets,
             max(den) AS den, max(b) AS b,
             sum(e * e) AS se2,
             sum(CASE WHEN p IS NULL THEN CAST(0 AS HUGEINT)
               ELSE (e - p) * (e - p) END) AS sd2
           FROM lg GROUP BY g),
         fin AS (
           SELECT g, n_buckets,
             CASE WHEN den > 0 THEN round(b, 6) END AS slope,
             CASE WHEN n_buckets >= 3 AND den > 0
                 AND CAST(se2 AS DOUBLE) > 0
               THEN CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE)
               END AS dw
           FROM agg)
         SELECT g AS event_type, n_buckets, slope,
           round(dw, 6) AS dw,
           round(CASE WHEN dw IS NULL THEN NULL
             ELSE 1.0 - dw / 2.0 END, 6) AS rho1,
           CAST(coalesce(dw < 1.2 OR dw > 2.8, FALSE) AS INT)
             AS autocorrelated
         FROM fin ORDER BY event_type""",
    // dense month grid (gaps are zeros); deviations scaled to whole
    // units n·c − Σc so the one-sided accumulations stay BIGINT; the
    // prefix identity replaces the sequential max(0, ·) recurrence
    "q194_cusum_shift" ->
      """WITH b AS (
           SELECT o_orderpriority AS g,
             year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS p
           FROM orders),
         c AS (SELECT g, p, count(*) AS c FROM b GROUP BY 1, 2),
         bounds AS (SELECT g, min(p) AS lo, max(p) AS hi
                    FROM c GROUP BY g),
         grid AS (SELECT g, CAST(unnest(generate_series(lo, hi))
                    AS BIGINT) AS p FROM bounds),
         dense AS (
           SELECT grid.g, grid.p,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c
           FROM grid LEFT JOIN c ON c.g = grid.g AND c.p = grid.p),
         tt AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot,
                count(*) AS n FROM dense GROUP BY g),
         st AS (
           SELECT dense.g, dense.p, dense.c, tt.tot, tt.n,
             CAST(sum(dense.c * tt.n - tt.tot) OVER (
               PARTITION BY dense.g ORDER BY dense.p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cs
           FROM dense JOIN tt USING (g)),
         sm AS (
           SELECT g, p, c, tot, n, cs,
             cs - least(CAST(min(cs) OVER (PARTITION BY g ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT), 0) AS sp,
             greatest(CAST(max(cs) OVER (PARTITION BY g ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT), 0) - cs AS sn
           FROM st)
         SELECT g AS o_orderpriority,
           CAST(CAST(floor(p / 12.0) AS BIGINT) AS VARCHAR) || '-'
             || lpad(CAST((p % 12) + 1 AS VARCHAR), 2, '0') AS month,
           c AS n,
           round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 4)
             AS cusum_pos,
           round(CAST(sn AS DOUBLE) / CAST(n AS DOUBLE), 4)
             AS cusum_neg,
           CAST(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
             > 5.0 * sqrt(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
             AS INT) AS shift_up,
           CAST(CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)
             > 5.0 * sqrt(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
             AS INT) AS shift_down
         FROM sm ORDER BY 1, 2""",
    // dense calendar (gap days are zeros in their weekday's profile);
    // weekday from epoch-day arithmetic, calendar-library-free; the
    // anomaly predicate compares doubles built identically from exact
    // integers
    "q195_seasonal_dow" ->
      """WITH b AS (
           SELECT o_orderstatus AS g,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
               AS BIGINT) AS p
           FROM orders),
         c AS (SELECT g, p, count(*) AS c FROM b GROUP BY 1, 2),
         bounds AS (SELECT g, min(p) AS lo, max(p) AS hi
                    FROM c GROUP BY g),
         grid AS (SELECT g, CAST(unnest(generate_series(lo, hi))
                    AS BIGINT) AS p FROM bounds),
         dense AS (
           SELECT grid.g, grid.p,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c,
             (grid.p + 3) % 7 AS dow
           FROM grid LEFT JOIN c ON c.g = grid.g AND c.p = grid.p),
         prof AS (SELECT g, dow, count(*) AS nd,
                  CAST(sum(c) AS BIGINT) AS s
                  FROM dense GROUP BY 1, 2),
         fl AS (
           SELECT dense.g, dense.dow, prof.nd, prof.s,
             abs(CAST(dense.c AS DOUBLE)
               - CAST(prof.s AS DOUBLE) / CAST(prof.nd AS DOUBLE))
               AS dev
           FROM dense JOIN prof
             ON prof.g = dense.g AND prof.dow = dense.dow)
         SELECT g AS o_orderstatus, dow,
           CAST(max(nd) AS BIGINT) AS n_days,
           CAST(max(s) AS BIGINT) AS total,
           round(CAST(max(s) AS DOUBLE) / CAST(max(nd) AS DOUBLE), 4)
             AS dow_mean,
           CAST(sum(CASE WHEN dev > 3.0 * sqrt(CAST(s AS DOUBLE)
             / CAST(nd AS DOUBLE)) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(max(dev), 4) AS max_abs_residual
         FROM fl GROUP BY 1, 2 ORDER BY 1, 2""",
    // the all-integer streamable CUSUM: d = 1000·c − target, both
    // one-sided sums by the prefix identity, decision vs hMilli —
    // no floats, so the streaming twin is bit-equal by construction
    "q205_cusum_monitor" ->
      """WITH b AS (
           SELECT event_type AS g,
             CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT) AS p
           FROM events),
         c AS (SELECT g, p, count(*) AS c FROM b GROUP BY 1, 2),
         bounds AS (SELECT g, min(p) AS lo, max(p) AS hi
                    FROM c GROUP BY g),
         grid AS (SELECT g, CAST(unnest(generate_series(lo, hi))
                    AS BIGINT) AS p FROM bounds),
         dense AS (
           SELECT grid.g, grid.p,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c
           FROM grid LEFT JOIN c ON c.g = grid.g AND c.p = grid.p),
         st AS (
           SELECT g, p, c,
             CAST(sum(c * 1000 - 16000) OVER (PARTITION BY g
               ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cs
           FROM dense),
         sm AS (
           SELECT g, p, c, cs,
             cs - least(CAST(min(cs) OVER (PARTITION BY g ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT), 0) AS sp,
             greatest(CAST(max(cs) OVER (PARTITION BY g ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT), 0) - cs AS sn
           FROM st)
         SELECT g AS event_type, p AS period, c AS n,
           sp AS cusum_pos_milli, sn AS cusum_neg_milli,
           CAST(sp > 60000 AS INT) AS shift_up,
           CAST(sn > 60000 AS INT) AS shift_down
         FROM sm ORDER BY 1, 2""",
    // bridge numerator |n·cs_t − t·S| is pure BIGINT: the argmax and
    // its smallest-t tie-break replay exactly; means divide once
    "q206_change_point" ->
      """WITH b AS (
           SELECT o_orderpriority AS g,
             year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS p
           FROM orders),
         c AS (SELECT g, p, count(*) AS c FROM b GROUP BY 1, 2),
         bounds AS (SELECT g, min(p) AS lo, max(p) AS hi
                    FROM c GROUP BY g),
         grid AS (SELECT g, CAST(unnest(generate_series(lo, hi))
                    AS BIGINT) AS p FROM bounds),
         dense AS (
           SELECT grid.g, grid.p,
             CAST(coalesce(c.c, 0) AS BIGINT) AS c
           FROM grid LEFT JOIN c ON c.g = grid.g AND c.p = grid.p),
         br AS (
           SELECT g, p,
             CAST(row_number() OVER (PARTITION BY g ORDER BY p)
               AS BIGINT) AS t,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cs,
             CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
             CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS s
           FROM dense),
         ranked AS (
           SELECT g, p, t, cs, n, s, abs(n * cs - t * s) AS bb,
             row_number() OVER (PARTITION BY g
               ORDER BY abs(n * cs - t * s) DESC, t ASC) AS rk
           FROM br WHERE t < n)
         SELECT g AS o_orderpriority, n AS n_periods, s AS total_n,
           t AS split_index,
           CAST(CAST(floor(p / 12.0) AS BIGINT) AS VARCHAR) || '-'
             || lpad(CAST((p % 12) + 1 AS VARCHAR), 2, '0')
             AS change_month,
           round(CAST(cs AS DOUBLE) / CAST(t AS DOUBLE), 4)
             AS before_mean,
           round(CAST(s - cs AS DOUBLE) / CAST(n - t AS DOUBLE), 4)
             AS after_mean,
           round(CAST(bb AS DOUBLE) / CAST(n AS DOUBLE), 4)
             AS bridge_height,
           round((CAST(bb AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS bridge_scaled
         FROM ranked WHERE rk = 1 ORDER BY 1""",
    // log-space mixture SPRT: exact BIGINT running sums, literal
    // σ²/τ²/p₀ spelled from the same doubles as the engine; log Λ is
    // O(10) so round(·,4) absorbs library ulp wobble where raw Λ
    // (up to 1e20+) would not
    "q215_msprt_monitor" ->
      s"""WITH b AS (
           SELECT o_orderpriority AS g,
             year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS p,
             (o_totalprice > 150000.0) AS y
           FROM orders),
         c AS (SELECT g, p, count(*) AS c,
               CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS s
               FROM b GROUP BY 1, 2),
         r AS (SELECT g, p,
           CAST(sum(c) OVER (PARTITION BY g ORDER BY p ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
           CAST(sum(s) OVER (PARTITION BY g ORDER BY p ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs
           FROM c),
         l AS (SELECT g, p, cn, cs,
           0.5 * ln(${0.33 * (1.0 - 0.33)}
               / (${0.33 * (1.0 - 0.33)}
                 + CAST(cn AS DOUBLE) * 0.0025))
             + (CAST(cn AS DOUBLE) * CAST(cn AS DOUBLE) * 0.0025
                 * (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) - 0.33)
                 * (CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) - 0.33))
               / (2.0 * ${0.33 * (1.0 - 0.33)}
                 * (${0.33 * (1.0 - 0.33)}
                   + CAST(cn AS DOUBLE) * 0.0025)) AS ll
           FROM r),
         m AS (SELECT g, p, cn, cs, ll,
           max(ll) OVER (PARTITION BY g ORDER BY p ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS llmax
           FROM l)
         SELECT g AS o_orderpriority,
           CAST(CAST(floor(p / 12.0) AS BIGINT) AS VARCHAR) || '-'
             || lpad(CAST((p % 12) + 1 AS VARCHAR), 2, '0') AS month,
           cn AS n_cum, cs AS pos_cum,
           round(CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE), 6) AS rate,
           round(ll, 4) AS log_lambda,
           round(least(1.0, exp(0.0 - llmax)), 6) AS always_valid_p,
           CAST(least(1.0, exp(0.0 - llmax)) < 0.05 AS INT)
             AS rejected_by_now
         FROM m ORDER BY 1, 2""",
    // zero-filled daily grid, two lag reads, exact error sums;
    // MASE cross-multiplies the two exact sums, one division each
    "q354_forecast_baselines" ->
      """WITH d AS (
           SELECT event_type AS g,
             CAST(date_diff('day', DATE '2024-01-01',
               CAST(ts AS DATE)) AS BIGINT) AS b,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS y
           FROM events WHERE value IS NOT NULL
             AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               BETWEEN 0 AND 29
           GROUP BY 1, 2),
         grid AS (
           SELECT g.g, gs.b, coalesce(d.y, 0) AS y
           FROM (SELECT DISTINCT g FROM d) g
           CROSS JOIN (SELECT unnest(generate_series(0, 29)) AS b) gs
           LEFT JOIN d ON d.g = g.g AND d.b = gs.b),
         lagged AS (
           SELECT g, b, y,
             lag(y, 1) OVER (PARTITION BY g ORDER BY b) AS l1,
             lag(y, 7) OVER (PARTITION BY g ORDER BY b) AS ls
           FROM grid),
         agg AS (
           SELECT g,
             CAST(sum(CASE WHEN b >= 21 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test,
             CAST(sum(CASE WHEN b >= 1 AND b < 21 THEN 1 ELSE 0 END)
               AS BIGINT) AS ntr,
             CAST(sum(CASE WHEN b >= 1 AND b < 21 THEN abs(y - l1)
               ELSE 0 END) AS BIGINT) AS dsum,
             CAST(sum(CASE WHEN b >= 21 THEN abs(y - l1) ELSE 0 END)
               AS BIGINT) AS e1,
             CAST(sum(CASE WHEN b >= 21 THEN abs(y - l1) * abs(y - l1)
               ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN b >= 21 THEN abs(y - ls) ELSE 0 END)
               AS BIGINT) AS es,
             CAST(sum(CASE WHEN b >= 21 THEN abs(y - ls) * abs(y - ls)
               ELSE 0 END) AS BIGINT) AS qs
           FROM lagged GROUP BY g)
         SELECT g AS event_type, n_test,
           round(CAST(e1 AS DOUBLE) / CAST(n_test AS DOUBLE), 4)
             AS mae_naive,
           round(sqrt(CAST(q1 AS DOUBLE) / CAST(n_test AS DOUBLE)), 4)
             AS rmse_naive,
           round(CASE WHEN dsum > 0 THEN
             CAST(CAST(e1 AS HUGEINT) * ntr AS DOUBLE)
             / CAST(CAST(dsum AS HUGEINT) * n_test AS DOUBLE) END, 6)
             AS mase_naive,
           round(CAST(es AS DOUBLE) / CAST(n_test AS DOUBLE), 4)
             AS mae_snaive,
           round(sqrt(CAST(qs AS DOUBLE) / CAST(n_test AS DOUBLE)), 4)
             AS rmse_snaive,
           round(CASE WHEN dsum > 0 THEN
             CAST(CAST(es AS HUGEINT) * ntr AS DOUBLE)
             / CAST(CAST(dsum AS HUGEINT) * n_test AS DOUBLE) END, 6)
             AS mase_snaive
         FROM agg ORDER BY event_type""",
  )

  /** Holt linear-trend forecast ([[Analytics.holtForecast]]) of daily
    * event value per event type (α = 0.3, β = 0.1 in milli units) —
    * level, trend, and the 1/2/3-step-ahead forecasts, all exact
    * cents BIGINTs from the mirrored integer recursion (oracle
    * replays it as a recursive CTE).
    */
  private[graft] def holtForecastQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    Analytics.holtForecast(e, Seq("event_type"),
        to_date(col("ts")), floor(col("value") * 100).cast("long"))
      .orderBy("event_type")
  }

  /** Mann–Kendall monotonic-trend test ([[Analytics.mannKendall]]) of
    * daily event value per event type — WHETHER the trend q269's
    * Theil–Sen slope measures is statistically real. A deterministic
    * +day/10 proportional growth is planted on the purchase type (the
    * cents floor re-seeded by the oracle), so the test must flag
    * purchase with a decisively positive τ; the un-planted types
    * report whatever the corpus actually does (at sf0.001 the error
    * type genuinely drifts down — the test reads it honestly).
    * S and the tie-corrected variance numerator are exact integers;
    * τ_a and the continuity-corrected z are each one mirrored double
    * division.
    */
  private[graft] def mannKendallQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val cents = when(col("event_type") === "purchase",
      floor(col("value") * 100 *
        (lit(1.0) + day.cast("double") / 10.0)))
      .otherwise(floor(col("value") * 100))
      .cast("long")
    Analytics.mannKendall(e, Seq("event_type"), day, cents)
      .orderBy("event_type")
  }

  /** Page–Hinkley change detection ([[Analytics.pageHinkley]]) of the
    * daily mean event value per event type — the self-calibrating
    * level monitor beside q205's fixed-target CUSUM: no reference
    * rate to configure, the series is tested against its own running
    * mean with δ = 500 cents of slack and a λ = 12 000-cent alarm
    * budget. A ×1.5 step is planted on purchase values from
    * 2024-01-21 (re-seeded by the oracle); the monitor must alarm on
    * purchase within the shifted window at every SF while the clean
    * types stay quiet. The whole trace is exact BIGINTs after two
    * mirrored floor-divisions.
    */
  private[graft] def pageHinkleyQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val cents = when(col("event_type") === "purchase" &&
        to_date(col("ts")) >= lit("2024-01-21").cast("date"),
      floor(col("value") * 100 * 1.5))
      .otherwise(floor(col("value") * 100))
      .cast("long")
    Analytics.pageHinkley(e, Seq("event_type"), day, cents,
        deltaMicro = 500000000L, lambdaMicro = 12000000000L)
      .orderBy("event_type")
  }

  /** Seasonal Mann–Kendall ([[Analytics.seasonalMannKendall]]) of
    * daily event value per event type, season = day mod 7: a STRONG
    * deterministic weekly cycle (×(1 + dow·0.2)) is painted over
    * EVERY type — constant within each season, so it cancels exactly
    * in the within-season signs — and a +day/5 purchase growth is
    * planted on top. The test must flag purchase through the cycle;
    * the integer day arithmetic makes the season split mirror
    * exactly in the oracle (no engine-dependent dayofweek origins).
    */
  private[graft] def seasonalMkQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val cycle = lit(1.0) + (day % 7).cast("double") * 0.2
    val growth = when(col("event_type") === "purchase",
      lit(1.0) + day.cast("double") / 5.0).otherwise(lit(1.0))
    val cents = floor(col("value") * 100 * cycle * growth)
      .cast("long")
    Analytics.seasonalMannKendall(e, Seq("event_type"), day % 7,
        day, cents)
      .orderBy("event_type")
  }

  /** Runs test ([[Analytics.runsTest]]) on daily event values per
    * type: the serial-dependence axis — a planted slow REGIME
    * oscillation (purchase ×5 in alternating 10-day blocks) leaves
    * each day's marginal distribution reasonable but collapses the
    * above/below-median sign sequence (the 10-day low block is one
    * single run) where ~16 runs are expected; the clean types' day-to-day noise reads as random.
    * Signs from exact 2x − med2 integers, one mirrored z.
    */
  private[graft] def runsTestQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val cents = when(col("event_type") === "purchase" &&
        (day / lit(10)).cast("long") % 2 === 0,
      floor(col("value") * 100 * 5.0))
      .otherwise(floor(col("value") * 100))
      .cast("long")
    Analytics.runsTest(e, Seq("event_type"), day, cents)
      .orderBy("event_type")
  }

  /** Gumbel block-maxima capacity fit
    * ([[graft.quality.Drift.gumbelBlockMaxima]]) on daily max event
    * values per type — "what single-event daily maximum should this
    * type's pipeline be provisioned for over a month / a year",
    * the extreme-value reading the mean/median monitors cannot give
    * and the block-maxima sibling of q204's Hill tail index. The
    * Gumbel constants are driver-computed literals shared verbatim
    * with the oracle, so both engines run identical float ops over
    * exact moments.
    */
  private[graft] def gumbelMaximaQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    graft.quality.Drift.gumbelBlockMaxima(e, Seq("event_type"),
        day, floor(col("value") * 100).cast("long"),
        returnPeriods = Seq(30, 365))
      .orderBy("event_type")
  }

  /** Ljung–Box portmanteau ([[Analytics.ljungBox]], h = 6) on hourly
    * event counts with purchase TRIPLED in even hours — a period-2
    * count alternation: the joint six-lag statistic reads it at 896
    * (sf0.01) over the 12.59 χ²₆ bar and keeps it the board's top
    * reading at every SF even where the sparse zero-filled grid
    * (λ ≈ 2/hour at sf0.001, adjacent zero-zero pairs correlate
    * POSITIVELY and eat the alternation) compresses it to 14.7;
    * clean types sit at honest 6–16 border readings — hourly counts
    * are not perfectly white, and the statistic says so. The multi-lag omnibus
    * beside q309's lag-1 residual read and q304's sign runs.
    */
  private[graft] def ljungBoxQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val dup = e.where(col("event_type") === "purchase" &&
      hour(col("ts")) % 2 === 0)
    Analytics.ljungBox(
        e.unionByName(dup).unionByName(dup).unionByName(dup),
        "ts", "event_type",
        bucketSeconds = 3600L, maxLag = 6)
      .orderBy("event_type")
  }

  /** q321's Gumbel fit off a STANDING block-max store
    * ([[graft.quality.Drift.gumbelFromBlockMaxima]]): the corpus
    * lands as two separately-pre-maxed shard halves (odd/even event
    * ids — the ingest-tree shape), merged by one more max. Max is
    * the mergeable statistic, so the shard path must land EXACTLY on
    * q321's raw fit — the oracle IS q321's oracle text; the extremes
    * monitor never rescans history, each day's shard just lands its
    * maxima (the q278/q301 one-store pattern).
    */
  private[graft] def gumbelStoreQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    def shard(p: Int): DataFrame = e
      .where(col("event_id") % 2 === p)
      .groupBy(col("event_type"), day.as("day"))
      .agg(max(floor(col("value") * 100).cast("long")).as("day_max"))
    val store = shard(0).unionByName(shard(1))
    graft.quality.Drift.gumbelFromBlockMaxima(store,
        Seq("event_type"), "day", "day_max",
        returnPeriods = Seq(30, 365))
      .orderBy("event_type")
  }

  /** Additive seasonal decomposition
    * ([[graft.quality.Drift.seasonalDecompose]], period 7) of daily
    * MEAN event values per type, with a compound plant on view: a
    * ×(1 + 0.02·day) ramp AND a ×2.5 every-phase-5 weekly spike —
    * the shape that confuses single-axis monitors (the ramp inflates
    * the spike's absolute size over time) and that the decomposition
    * separates: trend recovers the ramp, the phase-5 seasonal cell
    * carries the spike, and the residual is the series the serial
    * tests (q304/q309) should actually be fed. Centered-MA edges
    * null by contract.
    */
  /** Seasonal-hybrid ESD (the Twitter AnomalyDetection composition:
    * Hochenbaum et al. 2017) — q318's seasonal decomposition strips
    * trend and weekly shape, q332's generalized ESD then hunts
    * outliers in the RESIDUALS, where a spike no longer hides behind
    * the pattern. One lazy plan over the q318 machinery with an
    * extra ×6 spike planted on day 33 of the purchase series: the
    * raw-value ESD would burn its rounds on the 'view' weekly peaks;
    * the residual ESD pulls the planted spike first.
    */
  private[graft] def shEsdQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val daily = e
      .groupBy(col("event_type"), day.as("__d"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("event_type"), col("__d"),
        floor(col("__s").cast("double") / col("__n").cast("double"))
          .cast("long").as("__m"))
    val cents = when(col("event_type") === "view",
      floor(col("__m").cast("double") *
        (lit(1.0) + col("__d").cast("double") * 0.02) *
        when(col("__d") % 7 === 5, lit(2.5)).otherwise(lit(1.0)))
        .cast("long"))
      .otherwise(col("__m"))
    val spiked = when(col("event_type") === "purchase" &&
      col("__d") === 33, cents * 6L).otherwise(cents)
    val dec = graft.quality.Drift.seasonalDecompose(daily,
      Seq("event_type"), col("__d"), spiked, period = 7)
    // persist the residual frame: the ESD rounds (and their ranking
    // windows) read it repeatedly; without this the whole seasonal
    // chain re-executes per consumer
    Analytics.generalizedEsd(
        dec.where(col("residual").isNotNull)
          .transform(graft.core.CacheScope.disk),
        "event_type", col("residual"), col("bucket"), rounds = 3)
      .orderBy("event_type", "round")
  }

  /** Count-data overdispersion panel ([[Analytics.overdispersion]])
    * over daily event counts per type, with a clumping plant (click
    * counts double on every 3rd day): Poisson-ish types read
    * dispersion ≈ 1e6 micro and a null NB fit; the clumped type
    * reads D ≫ 1 with the method-of-moments (r, p) a rate monitor
    * would band with.
    */
  private[graft] def overdispersionQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .where(col("event_type").isNotNull && col("ts").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    val daily = e.groupBy(col("event_type"), day.as("__d"))
      .agg(count(lit(1)).as("__c"))
      .select(col("event_type"), col("__d"),
        when(col("event_type") === "click" && col("__d") % 3 === 0,
          col("__c") * 2L).otherwise(col("__c")).as("__y"))
    Analytics.overdispersion(daily, Seq("event_type"), col("__y"))
      .orderBy("event_type")
  }

  private[graft] def seasonalDecomposeQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    // daily MEANS (the q309 rationale): event-count fluctuation is
    // white noise that at small SF buries the weekly plant in a sum
    // series; the mean series carries it at every SF
    val daily = e
      .groupBy(col("event_type"), day.as("__d"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("event_type"), col("__d"),
        floor(col("__s").cast("double") / col("__n").cast("double"))
          .cast("long").as("__m"))
    val cents = when(col("event_type") === "view",
      floor(col("__m").cast("double") *
        (lit(1.0) + col("__d").cast("double") * 0.02) *
        when(col("__d") % 7 === 5, lit(2.5)).otherwise(lit(1.0)))
        .cast("long"))
      .otherwise(col("__m"))
    graft.quality.Drift.seasonalDecompose(daily, Seq("event_type"),
        col("__d"), cents, period = 7)
      .orderBy("event_type", "bucket")
  }

  /** Durbin–Watson ([[Analytics.durbinWatson]]) on daily event values
    * per type, the detrend-then-read companion of q304's runs test,
    * with plants chosen to SEPARATE the two: purchase carries q304's
    * 10-day regime oscillation (survives the linear detrend, drags
    * DW toward 0 — both alarms fire), while view carries a clean
    * ×(1 + 0.05·day) linear ramp — the runs test calls that clumped
    * (first half below median, second half above = 2 runs) but DW
    * detrends it away and reads the leftover noise as white
    * (dw ≈ 2, quiet). Residuals micro-floored before the sums.
    */
  private[graft] def durbinWatsonQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    // daily MEANS, not sums: the day-to-day event-count fluctuation
    // is white noise that at small SF drowns the regime plant in a
    // sum series; the mean series carries the same regime signal at
    // every SF (floor(Σcents/n) — one double division of two exact
    // longs, deterministic cross-engine)
    val daily = e
      .groupBy(col("event_type"), day.as("__d"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("event_type"), col("__d"),
        floor(col("__s").cast("double") / col("__n").cast("double"))
          .cast("long").as("__m"))
    val cents = when(col("event_type") === "purchase" &&
        (col("__d") / lit(10)).cast("long") % 2 === 0,
      col("__m") * 5L)
      .when(col("event_type") === "view",
        floor(col("__m").cast("double") *
          (lit(1.0) + col("__d").cast("double") * 0.05)).cast("long"))
      .otherwise(col("__m"))
    // n = 30 buckets puts the DW null sd near 2/sqrt(n) ~ 0.37, so
    // the quiet band is widened to (1.2, 2.8) — clean types sit in
    // it at all three SFs; the regime plant lands 0.27-1.03
    Analytics.durbinWatson(daily, Seq("event_type"), col("__d"),
        cents, dLo = 1.2)
      .orderBy("event_type")
  }

  private[graft] def theilSenQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    Analytics.theilSenTrend(e, Seq("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")),
        floor(col("value") * 100).cast("long"))
      .orderBy("event_type")
  }

  /** Incremental Holt ([[Analytics.holtResume]]): a standing state
    * built from the first 20 days resumes over the remaining days and
    * lands EXACTLY where q265's full recompute lands (the left-fold
    * identity; the oracle IS q265's full recursive CTE) — the
    * never-rescan-history form of the forecast monitor.
    */
  private[graft] def holtResumeQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    val cents = floor(col("value") * 100).cast("long")
    val cut = lit("2024-01-21").cast("date")
    val state = Analytics.holtForecast(
      e.where(to_date(col("ts")) < cut), Seq("event_type"),
      to_date(col("ts")), cents)
    Analytics.holtResume(state,
        e.where(to_date(col("ts")) >= cut), Seq("event_type"),
        to_date(col("ts")), cents)
      .orderBy("event_type")
  }

  /** Hourly-count autocorrelation at lags 1–6 per event type
    * ([[Analytics.autocorrelation]]): the exact-integer ACF (the
    * mean-centering multiplied through by n so every sum is a
    * DECIMAL-exact product sum) over zero-filled hourly buckets —
    * q174's cross-correlation turned on each series itself.
    */
  private[graft] def eventAcfQ(s: SparkSession, dir: String): DataFrame =
    Analytics.autocorrelation(events(s, dir), "ts", "event_type",
        bucketSeconds = 3600L, maxLag = 6)
      .orderBy("event_type", "lag")

  /** Fano factor + Goh–Barabási burstiness per event type
    * ([[Analytics.burstiness]]) over the same zero-filled hourly
    * grid — the "Poisson or clumped" readout.
    */
  private[graft] def eventBurstinessQ(s: SparkSession, dir: String): DataFrame =
    Analytics.burstiness(events(s, dir), "ts", "event_type",
        bucketSeconds = 3600L)
      .orderBy("event_type")

  /** CUSUM level-shift screen ([[Analytics.cusumShift]]): monthly
    * order counts per priority on a dense month grid (gap months are
    * zeros), one-sided cumulative deviations from the priority's mean
    * with a √mean-scaled decision threshold — the monitoring chart
    * behind "did volume step-change, and when?". The accumulation is
    * exact BIGINT via the `n·cᵢ − Σc` scaling; the prefix identity
    * S⁺ᵢ = csᵢ − min(0, min_{j≤i} csⱼ) replaces the sequential
    * recurrence with window functions.
    */
  private[graft] def cusumShiftQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderpriority"),
      (year(col("o_orderdate").cast("date")) * 12
        + month(col("o_orderdate").cast("date")) - 1).as("__m"))
    Analytics.cusumShift(o, "o_orderpriority", col("__m"))
      .select(col("o_orderpriority"),
        concat(floor(col("period") / 12).cast("string"), lit("-"),
          lpad(((col("period") % 12) + 1).cast("string"), 2, "0"))
          .as("month"),
        col("n"), col("cusum_pos"), col("cusum_neg"),
        col("shift_up"), col("shift_down"))
      .orderBy("o_orderpriority", "month")
  }

  /** Day-of-week seasonal profile ([[Analytics.seasonalProfile]]):
    * daily order counts per status on a dense calendar (gap days are
    * zeros), the per-weekday mean, and Poisson-scaled (3σ) anomaly
    * days — the weekly-rhythm baseline behind volume monitoring.
    */
  private[graft] def seasonalDowQ(s: SparkSession, dir: String): DataFrame =
    Analytics.seasonalProfile(t(s, dir, "orders"), "o_orderstatus",
        col("o_orderdate"))
      .orderBy("o_orderstatus", "dow")

  /** Fixed-target CUSUM monitor ([[Analytics.cusumFixedTarget]]):
    * event counts per 6-hour bucket per type against a fixed
    * 16-events-per-bucket reference — the all-integer, O(1)-state
    * form whose streaming twin
    * ([[graft.streaming.EventStreams.cusumStream]]) emits
    * bit-identical rows as the watermark closes each bucket.
    */
  private[graft] def cusumFixedQ(s: SparkSession, dir: String): DataFrame =
    Analytics.cusumFixedTarget(events(s, dir), "event_type",
        floor(unix_micros(col("ts")) / lit(21600000000L)).cast("long"),
        targetMilli = 16000L, hMilli = 60000L)
      .orderBy("event_type", "period")

  /** Change-point locator ([[Analytics.changePoint]]): the CUSUM-
    * bridge argmax over monthly order counts per priority — WHERE the
    * level most plausibly shifted; the bridge numerator is exact
    * BIGINT so the split and its tie-break replay bit-for-bit.
    */
  private[graft] def changePointQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderpriority"),
      (year(col("o_orderdate").cast("date")) * 12
        + month(col("o_orderdate").cast("date")) - 1).as("__m"))
    Analytics.changePoint(o, "o_orderpriority", col("__m"))
      .select(col("o_orderpriority"), col("n_periods"), col("total_n"),
        col("split_index"),
        concat(floor(col("change_period") / 12).cast("string"),
          lit("-"), lpad(((col("change_period") % 12) + 1)
            .cast("string"), 2, "0")).as("change_month"),
        col("before_mean"), col("after_mean"),
        col("bridge_height"), col("bridge_scaled"))
      .orderBy("o_orderpriority")
  }

  /** Always-valid sequential monitor ([[Analytics.msprtMonitor]]):
    * monthly big-order share per priority against p₀ = 0.33 — the
    * peeking-safe test whose p-value can be read EVERY period without
    * α inflation; the statistic rides in log space so rounding stays
    * engine-stable at any evidence level.
    */
  private[graft] def msprtQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderpriority"),
      (year(col("o_orderdate").cast("date")) * 12
        + month(col("o_orderdate").cast("date")) - 1).as("__m"),
      (col("o_totalprice") > 150000.0).as("__y"))
    Analytics.msprtMonitor(o, "o_orderpriority", col("__m"),
        col("__y"), p0 = 0.33, tau2 = 0.0025)
      .select(col("o_orderpriority"),
        concat(floor(col("period") / 12).cast("string"), lit("-"),
          lpad(((col("period") % 12) + 1).cast("string"), 2, "0"))
          .as("month"),
        col("n_cum"), col("pos_cum"), col("rate"), col("log_lambda"),
        col("always_valid_p"), col("rejected_by_now"))
      .orderBy("o_orderpriority", "month")
  }
}
