package graft.registry

import graft.operators.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Survival-comparison / multi-rater-agreement / calibration shelf
  * (round 16, second wave): the log-rank test over the q191 churn
  * frame, Krippendorff's alpha over three document annotators, and
  * the Hosmer–Lemeshow calibration table. Mixed into
  * [[AnalyticsRegistry]]; conventions: see [[graft.SparkEntry]].
  */
private[graft] trait AnalyticsSurvivalShelf extends AnalyticsCore {

  private[graft] def survivalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q329_log_rank" -> (logRankQ _),
    "q330_krippendorff_alpha" -> (krippendorffQ _),
    "q331_hosmer_lemeshow" -> (hosmerLemeshowQ _),
    "q332_generalized_esd" -> (generalizedEsdQ _),
    "q333_mood_median" -> (moodMedianQ _),
    "q334_power_analysis" -> (powerAnalysisQ _),
    "q347_weibull_fit" -> (weibullFitQ _),
    "q381_aalen_johansen" -> (aalenJohansenQ _),
    "q384_cox_ph" -> (coxPhQ _),
  )

  /** Cox proportional hazards ([[Analytics.coxPh]]) on the q191
    * churn frame per segment: does a customer's account balance
    * (covariate x = whole dollars / 1000) scale the churn hazard?
    * Two documented Newton steps, Breslow ties; β in exact nano
    * units, e^β the readable hazard ratio. On TPC-H's independent
    * generators the true β is ≈ 0 — the null-result baseline, with
    * the spec's planted-hazard fixture proving the estimator moves
    * when the hazard really does scale with x.
    */
  private[graft] def coxPhQ(s: SparkSession, dir: String): DataFrame = {
    val pc = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("g"), col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("f"),
        max(to_date(col("o_orderdate"))).as("l"),
        max(col("c_acctbal")).as("bal"))
    val mx = pc.agg(max(col("l")).as("mx"))
    val subj = pc.crossJoin(broadcast(mx))
      .select(col("g"), datediff(col("l"), col("f")).as("t"),
        (col("l") < date_sub(col("mx"), 90)).as("e"),
        floor(col("bal")).as("x"))
    Analytics.coxPh(subj, "g", col("t"), col("e"), col("x"))
      .withColumnRenamed("g", "c_mktsegment")
      .orderBy("c_mktsegment")
  }

  /** Aalen–Johansen competing-risks incidence
    * ([[Analytics.aalenJohansen]]): per user, time from first event
    * to whichever of PURCHASE (cause 1) or ERROR (cause 2) strikes
    * first — same-day ties resolve to purchase — censored at the
    * global horizon otherwise; cohorts = user-id parity. cif1 + cif2
    * + survival ≡ 1 at every step; treating errors as mere censoring
    * (the 1−KM mistake) would overstate purchase incidence exactly
    * where the error hazard is high.
    */
  private[graft] def aalenJohansenQ(
      s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("__d"),
        col("event_type"))
    val perUser = e.groupBy("user_id")
      .agg(min(col("__d")).as("__f"),
        min(when(col("event_type") === "purchase", col("__d")))
          .as("__fp"),
        min(when(col("event_type") === "error", col("__d")))
          .as("__fe"))
    val horizon = e.agg(max(col("__d")).as("__mx"))
    val subj = perUser.crossJoin(broadcast(horizon))
      .select((col("user_id") % 2).cast("int").as("cohort"),
        when(col("__fp").isNotNull &&
            (col("__fe").isNull || col("__fp") <= col("__fe")),
          datediff(col("__fp"), col("__f")))
          .when(col("__fe").isNotNull,
            datediff(col("__fe"), col("__f")))
          .otherwise(datediff(col("__mx"), col("__f"))).as("t"),
        when(col("__fp").isNotNull &&
            (col("__fe").isNull || col("__fp") <= col("__fe")), 1)
          .when(col("__fe").isNotNull, 2)
          .otherwise(0).as("cause"))
    Analytics.aalenJohansen(subj, "cohort", col("t"), col("cause"))
      .orderBy("cohort", "t")
  }

  /** Weibull median-rank fit ([[Analytics.weibullFit]]) of the
    * order-to-ship delay (days + 1) per order priority — is
    * fulfillment memoryless (shape ≈ 1), infant-mortality (< 1) or
    * aging (> 1), and what is its characteristic delay η? The
    * parametric reliability read beside q191's Kaplan–Meier curve
    * and q316's cumulative hazard. Nano-floored ln plot coordinates
    * into exact OLS sums (the q308 discipline).
    */
  private[graft] def weibullFitQ(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "lineitem").join(t(s, dir, "orders"),
      col("l_orderkey") === col("o_orderkey"))
    val days = datediff(to_date(col("l_shipdate")),
      to_date(col("o_orderdate"))) + 1
    Analytics.weibullFit(j, Seq("o_orderpriority"), days)
      .orderBy("o_orderpriority")
  }

  /** Generalized ESD outlier screen ([[Analytics.generalizedEsd]]):
    * three remove-and-recompute rounds over event values per type —
    * the masking-proof top-outlier report for the value monitor.
    * Extremes chosen by exact integer deviation, (value, event_id)
    * tie-broken.
    */
  private[graft] def generalizedEsdQ(s: SparkSession, dir: String): DataFrame =
    Analytics.generalizedEsd(
        events(s, dir).where(col("value").isNotNull),
        "event_type", floor(col("value") * 100).cast("long"),
        col("event_id"), rounds = 3)
      .orderBy("event_type", "round")

  /** Mood's median test ([[Analytics.moodMedianTest]]): within each
    * event type, do the seven day-phases (epoch-anchored, engine-
    * neutral `(days since 2024-01-01) mod 7`) share a common value
    * median? The outlier-immune weekday-location read beside q195's
    * seasonal profile; χ² emitted in exact nano units.
    */
  private[graft] def moodMedianQ(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).where(col("value").isNotNull)
    Analytics.moodMedianTest(e,
        "event_type",
        pmod(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")), lit(7)),
        floor(col("value") * 100).cast("long"))
      .orderBy("event_type")
  }

  /** Two-proportion power analysis ([[Analytics.powerAnalysis]]):
    * per order status, the observed urgent/high share as the
    * baseline rate and the per-arm sample size needed to detect
    * +1/+2/+5 pp lifts at α=0.05 / 80% power — the design table
    * before any experiment ships.
    */
  private[graft] def powerAnalysisQ(s: SparkSession, dir: String): DataFrame =
    Analytics.powerAnalysis(t(s, dir, "orders"), "o_orderstatus",
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy("o_orderstatus", "lift")

  /** Two-group log-rank test ([[Analytics.logRank]]) on the exact
    * q191/q316 churn-subject frame, split within each market segment
    * by account-balance sign: do delinquent (negative-balance)
    * customers churn on a different curve? O₁/E₁/V accumulate in
    * exact nano units; χ² renders once per stratum.
    */
  private[graft] def logRankQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
    val perCust = o.groupBy(col("c_mktsegment"),
        (col("c_acctbal") >= 0).as("__g1"), col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("__first"),
        max(col("o_orderdate").cast("date")).as("__last"))
    val mx = perCust.agg(max(col("__last")).as("__mx"))
    val subjects = perCust.crossJoin(broadcast(mx))
      .select(col("c_mktsegment"), col("__g1"),
        datediff(col("__last"), col("__first")).as("__dur"),
        (col("__last") < date_sub(col("__mx"), 90)).as("__event"))
    Analytics.logRank(subjects, "c_mktsegment", col("__g1"),
        col("__dur"), col("__event"))
      .orderBy("c_mktsegment")
  }

  /** Krippendorff's alpha ([[Analytics.krippendorffAlpha]]) per
    * language over three cheap document annotators, each rating a
    * quality tier 0/1/2: length (n_chars cuts), lexical diversity
    * (distinct-token ratio — integer cross-multiplied, no float
    * thresholds), and mean token length (non-space chars per token,
    * same integer discipline). The annotation-quality gate a labeled
    * training corpus ships with.
    */
  private[graft] def krippendorffQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .where(col("text").isNotNull && col("lang").isNotNull)
      .withColumn("__tk", size(split(col("text"), " ")).cast("long"))
      .withColumn("__dt",
        size(array_distinct(split(col("text"), " "))).cast("long"))
      .withColumn("__cs",
        length(translate(col("text"), " ", "")).cast("long"))
    val rA = when(col("n_chars") < 250, 0L)
      .when(col("n_chars") < 400, 1L).otherwise(2L)
    val rB = when(col("__dt") * 1000 < col("__tk") * 420, 0L)
      .when(col("__dt") * 1000 < col("__tk") * 580, 1L).otherwise(2L)
    val rC = when(col("__cs") * 1000 < col("__tk") * 4430, 0L)
      .when(col("__cs") * 1000 < col("__tk") * 4590, 1L).otherwise(2L)
    Analytics.krippendorffAlpha(d, "lang", Seq(rA, rB, rC))
      .orderBy("lang")
  }

  /** Hosmer–Lemeshow decile calibration ([[Analytics.hosmerLemeshow]])
    * of a rational price-based score p/(p+200k) against the
    * urgent/high label, per order status — the grouped
    * goodness-of-fit read next to q293's ROC-AUC (discrimination) and
    * the isotonic fit (recalibration). Scores nano-floored per row
    * before any sum.
    */
  private[graft] def hosmerLemeshowQ(s: SparkSession, dir: String): DataFrame = {
    val p = col("o_totalprice").cast("double")
    Analytics.hosmerLemeshow(t(s, dir, "orders"), "o_orderstatus",
        p / (p + lit(200000.0)),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        col("o_orderkey"), bins = 10)
      .orderBy("o_orderstatus", "bin")
  }

  private[graft] def survivalOracleSql: Map[String, String] = Map(
    // the two Newton steps replayed as generated CTE blocks (the
    // q369/q377 device): per-row e^{βx}·x^k terms nano-floored with
    // every float op token-identical, suffix risk-set sums exact
    // longs, per-time contributions floored once, β nano-quantized
    // between the steps
    "q384_cox_ph" -> {
      def step(tag: String, beta: String): String = {
        val x = "(CAST(s.x AS DOUBLE) / 1000.0)"
        val w = s"exp(b.b * $x)"
        s"""rw$tag AS (
           SELECT s.g, s.t, s.e, s.x,
             CAST(floor($w * 1000000000.0) AS BIGINT) AS wn,
             CAST(floor($x * $w * 1000000000.0) AS BIGINT) AS xwn,
             CAST(floor($x * $x * $w * 1000000000.0) AS BIGINT)
               AS x2wn
           FROM subj s JOIN $beta b ON b.g = s.g),
         bt$tag AS (
           SELECT g, t,
             CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN e THEN x ELSE 0 END) AS BIGINT)
               AS sxe,
             CAST(sum(wn) AS BIGINT) AS w0,
             CAST(sum(xwn) AS BIGINT) AS w1,
             CAST(sum(x2wn) AS BIGINT) AS w2
           FROM rw$tag GROUP BY 1, 2),
         sf$tag AS (
           SELECT g, t, d, sxe,
             CAST(sum(w0) OVER sfx AS BIGINT) AS s0,
             CAST(sum(w1) OVER sfx AS BIGINT) AS s1,
             CAST(sum(w2) OVER sfx AS BIGINT) AS s2
           FROM bt$tag
           WINDOW sfx AS (PARTITION BY g ORDER BY t ROWS BETWEEN
             CURRENT ROW AND UNBOUNDED FOLLOWING)),
         dv$tag AS (
           SELECT g,
             CAST(sum(sxe) AS BIGINT) * 1000000
               - CAST(sum(CASE WHEN d > 0 THEN
                   CAST(floor(CAST(d AS DOUBLE)
                     * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))
                     * 1000000000.0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS gg,
             CAST(sum(CASE WHEN d > 0 THEN
                 CAST(floor(CAST(d AS DOUBLE)
                   * ((CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE))
                     - (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)))
                   * 1000000000.0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS hh,
             CAST(sum(d) AS BIGINT) AS nev
           FROM sf$tag GROUP BY g)"""
      }
      s"""WITH pc AS (
           SELECT c_mktsegment AS g, o_custkey,
             min(CAST(o_orderdate AS DATE)) AS f,
             max(CAST(o_orderdate AS DATE)) AS l,
             max(c_acctbal) AS bal
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         mx AS (SELECT max(l) AS mx FROM pc),
         subj AS (
           SELECT g, date_diff('day', f, l) AS t, (l < mx - 90) AS e,
             CAST(floor(bal) AS BIGINT) AS x
           FROM pc CROSS JOIN mx),
         b0 AS (SELECT DISTINCT g, CAST(0.0 AS DOUBLE) AS b
                FROM subj),
         ${step("0", "b0")},
         b1 AS (
           SELECT g, CASE WHEN hh > 0 THEN
               CAST(floor(CAST(gg AS DOUBLE) / CAST(hh AS DOUBLE)
                 * 1000000000.0) AS BIGINT)
             ELSE 0 END AS b1n
           FROM dv0),
         b1f AS (SELECT g, CAST(b1n AS DOUBLE) / 1000000000.0 AS b
                 FROM b1),
         ${step("1", "b1f")},
         fin AS (
           SELECT b1.g AS c_mktsegment, dv0.nev AS n_events,
             b1.b1n AS beta1_nano,
             CASE WHEN dv1.hh > 0 THEN b1.b1n
               + CAST(floor(CAST(dv1.gg AS DOUBLE)
                 / CAST(dv1.hh AS DOUBLE) * 1000000000.0) AS BIGINT)
               END AS beta_nano
           FROM b1 JOIN dv0 ON dv0.g = b1.g
           JOIN dv1 ON dv1.g = b1.g)
         SELECT c_mktsegment, n_events, beta1_nano, beta_nano,
           round(exp(CAST(beta_nano AS DOUBLE) / 1000000000.0), 6)
             AS hazard_ratio
         FROM fin ORDER BY c_mktsegment"""
    },
    // the q191 scalar running-product device for S(t−) (DuckDB 1.0's
    // list_reduce corrupts STRUCT accumulators from the 3rd element —
    // so survival and the CIFs decompose into scalar folds); each CIF
    // term nano-floored once, cumulated as exact longs (order-free)
    "q381_aalen_johansen" ->
      """WITH e AS (
           SELECT user_id, CAST(ts AS DATE) AS d, event_type
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL),
         pu AS (
           SELECT user_id, min(d) AS f,
             min(CASE WHEN event_type = 'purchase' THEN d END) AS fp,
             min(CASE WHEN event_type = 'error' THEN d END) AS fe
           FROM e GROUP BY 1),
         mx AS (SELECT max(d) AS mx FROM e),
         subj AS (
           SELECT CAST(user_id % 2 AS INT) AS g,
             CASE WHEN fp IS NOT NULL
                 AND (fe IS NULL OR fp <= fe)
               THEN date_diff('day', f, fp)
               WHEN fe IS NOT NULL THEN date_diff('day', f, fe)
               ELSE date_diff('day', f, mx) END AS t,
             CASE WHEN fp IS NOT NULL
                 AND (fe IS NULL OR fp <= fe) THEN 1
               WHEN fe IS NOT NULL THEN 2 ELSE 0 END AS k
           FROM pu CROSS JOIN mx),
         bt AS (
           SELECT g, t,
             CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS d2,
             CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
           FROM subj GROUP BY 1, 2),
         rk AS (
           SELECT g, t, d1, d2, c,
             CAST(sum(d1 + d2 + c) OVER (PARTITION BY g) AS BIGINT)
               - CAST(coalesce(sum(d1 + d2 + c) OVER (PARTITION BY g
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n
           FROM bt),
         fl AS (
           SELECT g, list(CAST(n - d1 - d2 AS DOUBLE)
             / CAST(n AS DOUBLE) ORDER BY t) AS fs
           FROM rk GROUP BY g),
         rn AS (
           SELECT rk.*, CAST(row_number() OVER (PARTITION BY g
             ORDER BY t) AS INT) AS i
           FROM rk),
         terms AS (
           SELECT rn.g, rn.t, rn.n, rn.d1, rn.d2, rn.c,
             list_reduce(fl.fs[1:rn.i], (x, y) -> x * y) AS surv,
             CASE WHEN rn.i = 1 THEN CAST(1.0 AS DOUBLE)
               ELSE list_reduce(fl.fs[1:rn.i - 1], (x, y) -> x * y)
               END AS sprev
           FROM rn JOIN fl USING (g))
         SELECT g AS cohort, t, n AS n_at_risk, d1 AS n_cause1,
           d2 AS n_cause2, c AS n_censored,
           round(surv, 6) AS survival,
           CAST(sum(CAST(floor(sprev
               * (CAST(d1 AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000.0) AS BIGINT))
             OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cif1_nano,
           CAST(sum(CAST(floor(sprev
               * (CAST(d2 AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000.0) AS BIGINT))
             OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cif2_nano
         FROM terms ORDER BY cohort, t""",
    // the q191 churn CTE split by balance sign; E1/V increments
    // nano-floored before the stratum sums, one double chi2 at the end
    "q329_log_rank" ->
      """WITH pc AS (
           SELECT c_mktsegment AS s, (c_acctbal >= 0) AS g1, o_custkey,
             min(CAST(o_orderdate AS DATE)) AS f,
             max(CAST(o_orderdate AS DATE)) AS l
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2, 3),
         mx AS (SELECT max(l) AS mx FROM pc),
         subj AS (
           SELECT s, g1, date_diff('day', f, l) AS t,
             (l < mx - 90) AS e
           FROM pc CROSS JOIN mx),
         bt AS (
           SELECT s, g1, t,
             CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
           FROM subj GROUP BY 1, 2, 3),
         pt AS (
           SELECT s, t,
             CAST(sum(CASE WHEN g1 THEN d ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN g1 THEN c ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN NOT g1 THEN d ELSE 0 END) AS BIGINT)
               AS d0,
             CAST(sum(CASE WHEN NOT g1 THEN c ELSE 0 END) AS BIGINT)
               AS c0
           FROM bt GROUP BY 1, 2),
         rk AS (
           SELECT s, t, d1, d0,
             CAST(sum(d1 + c1) OVER (PARTITION BY s) AS BIGINT)
               AS tot1,
             CAST(sum(d0 + c0) OVER (PARTITION BY s) AS BIGINT)
               AS tot0,
             CAST(sum(d1 + c1) OVER (PARTITION BY s) AS BIGINT)
               - CAST(coalesce(sum(d1 + c1) OVER (PARTITION BY s
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n1,
             CAST(sum(d0 + c0) OVER (PARTITION BY s) AS BIGINT)
               - CAST(coalesce(sum(d0 + c0) OVER (PARTITION BY s
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n0
           FROM pt),
         rk2 AS (
           SELECT s, tot1, tot0, d1, n1, n0,
             n1 + n0 AS n, d1 + d0 AS d
           FROM rk WHERE d1 + d0 >= 1),
         inc AS (
           SELECT s, tot1, tot0, d1,
             CAST(floor(1e9 * CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
               / CAST(n AS DOUBLE)) AS BIGINT) AS e1,
             CASE WHEN n > 1 THEN
               CAST(floor(1e9 * CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
                 * CAST(n0 AS DOUBLE)
                 * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * (CAST(n AS DOUBLE) - 1.0))) AS BIGINT)
             ELSE 0 END AS v
           FROM rk2),
         ag AS (
           SELECT s, max(tot1) AS n1, max(tot0) AS n0,
             CAST(sum(d1) AS BIGINT) AS o1,
             CAST(sum(e1) AS BIGINT) AS e1_nano,
             CAST(sum(v) AS BIGINT) AS var_nano
           FROM inc GROUP BY s)
         SELECT s AS c_mktsegment, n1, n0, o1, e1_nano, var_nano,
           CASE WHEN var_nano > 0 THEN
             round((CAST(o1 AS DOUBLE) - CAST(e1_nano AS DOUBLE) / 1e9)
               * (CAST(o1 AS DOUBLE) - CAST(e1_nano AS DOUBLE) / 1e9)
               / (CAST(var_nano AS DOUBLE) / 1e9), 4)
           END AS chi2
         FROM ag ORDER BY c_mktsegment""",
    // integer-tier raters (cross-multiplied thresholds, no float);
    // alpha = 1 - (n-1)*do / (2*(n^2 - sum nc^2)) in one double pass
    "q330_krippendorff_alpha" ->
      """WITH d AS (
           SELECT lang, n_chars,
             CAST(length(string_split(text, ' ')) AS BIGINT) AS tk,
             CAST(length(list_distinct(string_split(text, ' ')))
               AS BIGINT) AS dt,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS cs
           FROM documents
           WHERE text IS NOT NULL AND lang IS NOT NULL),
         r AS (
           SELECT lang,
             CASE WHEN n_chars < 250 THEN 0
               WHEN n_chars < 400 THEN 1 ELSE 2 END AS r0,
             CASE WHEN dt * 1000 < tk * 420 THEN 0
               WHEN dt * 1000 < tk * 580 THEN 1 ELSE 2 END AS r1,
             CASE WHEN cs * 1000 < tk * 4430 THEN 0
               WHEN cs * 1000 < tk * 4590 THEN 1 ELSE 2 END AS r2
           FROM d),
         u AS (
           SELECT lang, r0, r1, r2,
             CAST(CASE WHEN r0 <> r1 THEN 2 ELSE 0 END
               + CASE WHEN r0 <> r2 THEN 2 ELSE 0 END
               + CASE WHEN r1 <> r2 THEN 2 ELSE 0 END AS BIGINT) AS x
           FROM r),
         don AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(x) AS BIGINT) AS do_pairs
           FROM u GROUP BY 1),
         vals AS (
           SELECT lang, unnest([r0, r1, r2]) AS v FROM u),
         nc AS (
           SELECT lang, v, CAST(count(*) AS BIGINT) AS c
           FROM vals GROUP BY 1, 2),
         de AS (
           SELECT lang, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * c) AS BIGINT) AS nc2
           FROM nc GROUP BY 1)
         SELECT don.lang, n_units, do_pairs,
           CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               - CAST(nc2 AS DOUBLE) > 0 THEN
             round(1.0 - (CAST(n AS DOUBLE) - 1.0)
               * CAST(do_pairs AS DOUBLE)
               / (2.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(nc2 AS DOUBLE))), 6)
           END AS alpha
         FROM don JOIN de USING (lang) ORDER BY lang""",
    // score nano-floored per row BEFORE the bucket sums (the
    // quantize-before-sum rule); deterministic ntile on (score, key)
    "q331_hosmer_lemeshow" ->
      """WITH b AS (
           SELECT o_orderstatus AS g,
             CAST(floor(CAST(o_totalprice AS DOUBLE)
               / (CAST(o_totalprice AS DOUBLE) + 200000.0) * 1e9)
               AS BIGINT) AS sn,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS y,
             o_orderkey AS tie
           FROM orders),
         nt AS (
           SELECT g, sn, y, ntile(10) OVER (
             PARTITION BY g ORDER BY sn, tie) AS bin
           FROM b),
         pb AS (
           SELECT g, bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS obs_pos,
             CAST(sum(sn) AS BIGINT) AS esum
           FROM nt GROUP BY 1, 2)
         SELECT g AS o_orderstatus, bin, n, obs_pos,
           round(CAST(esum AS DOUBLE) / 1e9, 4) AS exp_pos,
           CASE WHEN CAST(esum AS DOUBLE) / 1e9 > 0
               AND CAST(esum AS DOUBLE) / 1e9 < CAST(n AS DOUBLE) THEN
             round((CAST(obs_pos AS DOUBLE)
                 - CAST(esum AS DOUBLE) / 1e9)
               * (CAST(obs_pos AS DOUBLE) - CAST(esum AS DOUBLE) / 1e9)
               / ((CAST(esum AS DOUBLE) / 1e9)
                 * (1.0 - CAST(esum AS DOUBLE) / 1e9
                   / CAST(n AS DOUBLE))), 4)
           END AS hl_contrib
         FROM pb ORDER BY o_orderstatus, bin""",
    // three unrolled remove-and-recompute rounds ([[RegistryBase
    // .esdRoundSql]]); extreme picked by the exact HUGEINT deviation
    // |v*n - s|, (value, key) tie-broken
    "q332_generalized_esd" ->
      s"""WITH c1 AS (
           SELECT event_type AS g,
             CAST(floor(value * 100) AS BIGINT) AS v,
             event_id AS k
           FROM events WHERE value IS NOT NULL),
         ${esdRoundSql(1)},
         ${esdRoundSql(2)},
         ${esdRoundSql(3)}
         SELECT g AS event_type, round, n, removed_cents, r_stat
         FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2
           UNION ALL SELECT * FROM o3)
         ORDER BY event_type, round""",
    // pooled lower median from the distinct-value cumulative frame;
    // per-cell (O-E)^2/E nano-floored before the order-free sum
    "q333_mood_median" ->
      """WITH b AS (
           SELECT event_type AS s,
             ((date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               % 7) + 7) % 7 AS c,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
         bv AS (
           SELECT s, v, CAST(count(*) AS BIGINT) AS cnt
           FROM b GROUP BY 1, 2),
         cum AS (
           SELECT s, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY s ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY s) AS BIGINT) AS n
           FROM bv),
         med AS (
           SELECT s, min(v) AS m, max(n) AS n
           FROM cum WHERE cum * 2 >= n + 1 GROUP BY s),
         cells AS (
           SELECT b.s, c,
             CAST(sum(CASE WHEN v > m THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(sum(CASE WHEN v <= m THEN 1 ELSE 0 END) AS BIGINT)
               AS bb
           FROM b JOIN med USING (s) GROUP BY 1, 2),
         mg AS (
           SELECT s, c, a, bb,
             CAST(sum(a) OVER (PARTITION BY s) AS BIGINT) AS ca,
             CAST(sum(bb) OVER (PARTITION BY s) AS BIGINT) AS cb,
             CAST(count(*) OVER (PARTITION BY s) AS BIGINT) AS k
           FROM cells),
         chi AS (
           SELECT s, k, ca + cb AS n,
             (CASE WHEN CAST(a + bb AS DOUBLE) * CAST(ca AS DOUBLE)
                 / CAST(ca + cb AS DOUBLE) > 0 THEN
               CAST(floor(1e9 * (CAST(a AS DOUBLE)
                   - CAST(a + bb AS DOUBLE) * CAST(ca AS DOUBLE)
                     / CAST(ca + cb AS DOUBLE))
                 * (CAST(a AS DOUBLE)
                   - CAST(a + bb AS DOUBLE) * CAST(ca AS DOUBLE)
                     / CAST(ca + cb AS DOUBLE))
                 / (CAST(a + bb AS DOUBLE) * CAST(ca AS DOUBLE)
                   / CAST(ca + cb AS DOUBLE))) AS BIGINT)
             ELSE 0 END)
             + (CASE WHEN CAST(a + bb AS DOUBLE) * CAST(cb AS DOUBLE)
                 / CAST(ca + cb AS DOUBLE) > 0 THEN
               CAST(floor(1e9 * (CAST(bb AS DOUBLE)
                   - CAST(a + bb AS DOUBLE) * CAST(cb AS DOUBLE)
                     / CAST(ca + cb AS DOUBLE))
                 * (CAST(bb AS DOUBLE)
                   - CAST(a + bb AS DOUBLE) * CAST(cb AS DOUBLE)
                     / CAST(ca + cb AS DOUBLE))
                 / (CAST(a + bb AS DOUBLE) * CAST(cb AS DOUBLE)
                   / CAST(ca + cb AS DOUBLE))) AS BIGINT)
             ELSE 0 END) AS x
           FROM mg),
         ag AS (
           SELECT s, max(k) AS n_samples, max(n) AS n,
             CAST(sum(x) AS BIGINT) AS chi2_nano
           FROM chi GROUP BY s)
         SELECT ag.s AS event_type, med.m AS median_cents,
           n_samples, ag.n, chi2_nano, n_samples - 1 AS dof
         FROM ag JOIN med ON ag.s = med.s
         ORDER BY event_type""",
    // pinned z literals; the design formula is one fixed IEEE
    // sequence over exact counts, ceil'd to BIGINT
    "q334_power_analysis" ->
      """WITH a AS (
           SELECT o_orderstatus AS g, CAST(count(*) AS BIGINT)
               AS trials,
             CAST(sum(CASE WHEN o_orderpriority IN
               ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS successes
           FROM orders GROUP BY 1),
         l AS (
           SELECT g, trials, successes,
             unnest([0.01, 0.02, 0.05]) AS lift
           FROM a),
         p AS (
           SELECT g, trials, successes, lift,
             CAST(successes AS DOUBLE) / CAST(trials AS DOUBLE) AS p1,
             CAST(successes AS DOUBLE) / CAST(trials AS DOUBLE) + lift
               AS p2
           FROM l),
         f AS (
           SELECT g, trials, successes, lift, p1, p2,
             (p1 + p2) / 2.0 AS pbar
           FROM p)
         SELECT g AS o_orderstatus, trials, successes,
           round(p1, 6) AS baseline_rate, lift,
           CASE WHEN p2 < 1.0 THEN
             CAST(ceil(
               (1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
                 + 0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
               * (1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
                 + 0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
               / (lift * lift)) AS BIGINT)
           END AS n_per_arm
         FROM f ORDER BY o_orderstatus, lift""",
    // median-rank regression replay: the oracle ranks rows directly
    // (tie order is sum-invariant — tied rows share x), nano-floors
    // both ln plot coordinates, and mirrors the exact-OLS slope and
    // the exp intercept chain
    "q347_weibull_fit" ->
      """WITH b AS (
           SELECT o_orderpriority AS g,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
               CAST(l_shipdate AS DATE)) + 1 AS BIGINT) AS t
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         p AS (SELECT g, t FROM b WHERE t IS NOT NULL AND t > 0),
         md AS (SELECT g, CAST(count(DISTINCT t) AS BIGINT) AS md
                FROM p GROUP BY g),
         r AS (
           SELECT g, t,
             CAST(row_number() OVER (PARTITION BY g ORDER BY t)
               AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
           FROM p),
         q AS (
           SELECT g,
             CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000000.0)
               AS BIGINT) AS xq,
             CAST(floor(ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
               / (CAST(n AS DOUBLE) + 0.4))) * 1000000000.0)
               AS BIGINT) AS yq
           FROM r),
         s AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_fail,
             CAST(sum(xq) AS BIGINT) AS sx,
             CAST(sum(yq) AS BIGINT) AS sy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx
           FROM q GROUP BY g),
         f AS (
           SELECT s.g, s.n_fail, md.md,
             CAST(CAST(s.n_fail AS HUGEINT) * s.sxx
               - CAST(s.sx AS HUGEINT) * s.sx AS DOUBLE) AS den,
             CAST(CAST(s.n_fail AS HUGEINT) * s.sxy
               - CAST(s.sx AS HUGEINT) * s.sy AS DOUBLE) AS num,
             CAST(s.sx AS DOUBLE) / CAST(s.n_fail AS DOUBLE)
               / 1000000000.0 AS xbar,
             CAST(s.sy AS DOUBLE) / CAST(s.n_fail AS DOUBLE)
               / 1000000000.0 AS ybar
           FROM s JOIN md ON md.g = s.g)
         SELECT g AS o_orderpriority, n_fail,
           round(CASE WHEN md >= 3 AND den > 0.0 THEN num / den END,
             6) AS shape,
           round(CASE WHEN md >= 3 AND den > 0.0
               AND num / den > 0.0 THEN
             exp(xbar - ybar / (num / den)) END, 4) AS scale
         FROM f ORDER BY o_orderpriority""",
  )
}
