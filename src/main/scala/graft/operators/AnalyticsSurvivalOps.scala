package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival-comparison, multi-rater-agreement and calibration
  * goodness-of-fit operators (round 16, second wave). Self-typed to
  * and mixed back into [[Analytics]], so callers see one object.
  *
  * Shared discipline (the kaplanMeier/nelsonAalen conventions): every
  * input to float math is an exact integer from grouped counts +
  * windows; per-step double increments are nano-floored BEFORE any
  * running sum (quantize-before-sum, so both engines sum identical
  * longs); rendered statistics are one fixed sequence of IEEE ops over
  * those exact integers, written identically in the DuckDB oracle.
  */
private[graft] trait AnalyticsSurvivalOps { this: Analytics.type =>

  /** Two-group log-rank (Mantel–Cox) test per stratum: does group 1's
    * survival curve differ from group 0's?  At each event time t with
    * d events total and n at risk (n₁ in group 1): O₁ += d₁,
    * E₁ += d·n₁/n, V += d·n₁·n₀·(n−d) / (n²·(n−1)); the statistic is
    * χ² = (O₁−E₁)²/V on 1 df — the canonical A/B read over the
    * [[kaplanMeier]]/[[nelsonAalen]] churn curves.
    *
    * Exactness: risk sets are exact longs from one grouped count per
    * (stratum, group, t) collapsed to one row per (stratum, t), with
    * per-group at-risk counts from running windows over that
    * timepoint frame (the [[kaplanMeier]] shape — nothing
    * subject-sized survives the first combine). The E₁ and V
    * increments are each ONE double expression over exact longs,
    * nano-floored before the stratum sum; χ² renders from the two
    * nano sums at the end.
    *
    * Scale: timepoint-frame-sized windows per stratum; subjects
    * unbounded. Zero-variance strata (one group empty, or every
    * event time has n≤1) report null χ² rather than an IEEE NaN.
    */
  def logRank(
      df: DataFrame, strataCol: String, group1Col: Column,
      durationCol: Column, eventCol: Column): DataFrame = {
    val base = df.select(col(strataCol).as("__s"),
        group1Col.cast("boolean").as("__g1"),
        durationCol.cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"))
      .where(col("__t").isNotNull && col("__t") >= 0 &&
        col("__g1").isNotNull)
    val byTime = base.groupBy("__s", "__g1", "__t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("__c"))
    // one row per (stratum, t) with both groups' leave counts
    val perTime = byTime.groupBy("__s", "__t")
      .agg(
        sum(when(col("__g1"), col("__d")).otherwise(0L)).as("__d1"),
        sum(when(col("__g1"), col("__c")).otherwise(0L)).as("__c1"),
        sum(when(!col("__g1"), col("__d")).otherwise(0L)).as("__d0"),
        sum(when(!col("__g1"), col("__c")).otherwise(0L)).as("__c0"))
    val w = Window.partitionBy("__s").orderBy("__t")
    val whole = Window.partitionBy("__s")
    val risked = perTime
      .withColumn("__tot1", sum(col("__d1") + col("__c1")).over(whole))
      .withColumn("__tot0", sum(col("__d0") + col("__c0")).over(whole))
      .withColumn("__gone1", coalesce(sum(col("__d1") + col("__c1"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__gone0", coalesce(sum(col("__d0") + col("__c0"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n1", col("__tot1") - col("__gone1"))
      .withColumn("__n0", col("__tot0") - col("__gone0"))
      .withColumn("__n", col("__n1") + col("__n0"))
      .withColumn("__d", col("__d1") + col("__d0"))
      .where(col("__d") >= 1)
    val dD = col("__d").cast("double")
    val n1D = col("__n1").cast("double")
    val n0D = col("__n0").cast("double")
    val nD = col("__n").cast("double")
    val incs = risked
      .withColumn("__e1", floor(lit(1e9) * dD * n1D / nD).cast("long"))
      .withColumn("__v", when(col("__n") > 1,
        floor(lit(1e9) * dD * n1D * n0D *
            (nD - dD) / (nD * nD * (nD - lit(1.0d))))
          .cast("long")).otherwise(lit(0L)))
    val agg0 = incs.groupBy(col("__s"))
      .agg(max(col("__tot1")).as("n1"), max(col("__tot0")).as("n0"),
        sum(col("__d1")).as("o1"), sum(col("__e1")).as("e1_nano"),
        sum(col("__v")).as("var_nano"))
    val diff = col("o1").cast("double") -
      col("e1_nano").cast("double") / lit(1e9)
    agg0.select(col("__s").as(strataCol), col("n1"), col("n0"),
      col("o1"), col("e1_nano"), col("var_nano"),
      when(col("var_nano") > 0,
        round(diff * diff / (col("var_nano").cast("double") / lit(1e9)),
          4)).as("chi2"))
  }

  /** Krippendorff's alpha (nominal metric, complete ratings) per
    * group: chance-corrected agreement among m raters over N units,
    * 1 − D_o/D_e from the coincidence matrix. With every unit rated
    * by all m raters: D_o = Σ_u X_u/(m−1) where X_u = ordered
    * disagreeing rater pairs in unit u, and D_e = Σ_{c≠k} n_c·n_k
    * /(n−1) with n = m·N total values — so
    * α = 1 − (n−1)·ΣX_u / ((m−1)·(n² − Σ_c n_c²)).
    * [[AnalyticsInferenceOps.fleissKappa]]'s chance model fixes the
    * per-category marginals; alpha's coincidence model is the one
    * that stays comparable across corpora with different rater
    * counts — the standard annotation-quality gate for labeled
    * training data.
    *
    * Exactness: X_u is an integer expression per unit (pairwise
    * inequality count ×2), category totals n_c come from one
    * explode+count, and α is one double expression over the exact
    * longs at the end. n² stays exact in double below n ≈ 9·10⁷
    * values per group; beyond that move the two products to
    * decimal(38,0) — noted rather than paid, since a 100 TB corpus
    * is rated in strata anyway.
    *
    * Scale: one narrow projection per unit (no shuffle), one
    * explode → grouped count (category-sized), one final group-by.
    */
  def krippendorffAlpha(
      df: DataFrame, groupCol: String, raters: Seq[Column]): DataFrame = {
    require(raters.length >= 2, "krippendorffAlpha needs >= 2 raters")
    val m = raters.length
    val rated = df.select(col(groupCol).as("__g") +:
      raters.zipWithIndex.map { case (r, i) =>
        r.cast("long").as(s"__r$i") }: _*)
      .where((0 until m).map(i => col(s"__r$i").isNotNull)
        .reduce(_ && _))
    // ordered disagreeing pairs in the unit = 2 * count of unordered
    // unequal pairs among the m ratings
    val disag = (for {
      i <- 0 until m; j <- (i + 1) until m
    } yield when(col(s"__r$i") =!= col(s"__r$j"), 2L).otherwise(0L))
      .reduce(_ + _)
    val units = rated.withColumn("__x", disag)
    val doNum = units.groupBy("__g")
      .agg(count(lit(1)).as("n_units"), sum(col("__x")).as("do_pairs"))
    val values = units.select(col("__g"),
        explode(array((0 until m).map(i => col(s"__r$i")): _*))
          .as("__v"))
      .groupBy("__g", "__v").agg(count(lit(1)).as("__nc"))
    val deNum = values.groupBy("__g")
      .agg(sum(col("__nc")).as("__n"),
        sum(col("__nc") * col("__nc")).as("__nc2"))
    val nD = col("__n").cast("double")
    val dePairs = nD * nD - col("__nc2").cast("double")
    doNum.join(deNum, "__g")
      .select(col("__g").as(groupCol), col("n_units"),
        col("do_pairs"),
        when(dePairs > 0, round(
          lit(1.0d) - (nD - lit(1.0d)) *
            col("do_pairs").cast("double") /
            (lit((m - 1).toDouble) * dePairs), 6)).as("alpha"))
  }

  /** Hosmer–Lemeshow calibration table per group: rows ranked by a
    * probability-like score into `bins` equal-count buckets
    * (deterministic ntile over (score, tie-break)), each bucket
    * comparing observed positives vs the sum of predicted
    * probabilities — χ² contribution (O−E)²/(E·(1−E/n)) per bucket,
    * the grouped calibration read next to
    * [[AnalyticsStatsOps.isotonicCalibration]]'s monotone fit.
    *
    * Exactness: the score is nano-floored PER ROW before any sum
    * (pass a pure-rational score — one division, no exp — so both
    * engines floor the same double); bucket sums are exact longs;
    * each bucket's E, gap and χ² contribution are one double
    * expression at the end. Degenerate buckets (E=0 or E=n) emit a
    * null contribution rather than an IEEE Infinity.
    *
    * Scale: one ntile window per group (a sort — the price of
    * equal-count calibration bins; fixed-width binning via
    * [[AnalyticsStatsOps.binnedWoe]] is the shuffle-free
    * alternative), then a bucket-sized aggregate.
    */
  def hosmerLemeshow(
      df: DataFrame, groupCol: String, scoreCol: Column,
      labelCol: Column, tieCol: Column, bins: Int = 10): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        floor(scoreCol.cast("double") * lit(1e9)).cast("long")
          .as("__sn"),
        labelCol.cast("boolean").as("__y"), tieCol.as("__tie"))
      .where(col("__sn").isNotNull && col("__y").isNotNull)
    val binned = base.withColumn("__b",
      ntile(bins).over(Window.partitionBy("__g")
        .orderBy(col("__sn"), col("__tie"))))
    val perBin = binned.groupBy("__g", "__b")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("obs_pos"),
        sum(col("__sn")).as("__esum"))
    val nD = col("n").cast("double")
    val e = col("__esum").cast("double") / lit(1e9)
    val gap = col("obs_pos").cast("double") - e
    perBin.select(col("__g").as(groupCol),
      col("__b").cast("long").as("bin"),
      col("n"), col("obs_pos"),
      round(e, 4).as("exp_pos"),
      when(e > 0 && e < nD,
        round(gap * gap / (e * (lit(1.0d) - e / nD)), 4))
        .as("hl_contrib"))
  }

  /** Weibull fit by median-rank regression per group — the
    * parametric summary next to [[kaplanMeier]]'s curve: failure
    * times plotted as `ln(−ln(1−F_i))` against `ln(t_i)` with
    * Bernard's median ranks `F_i = (i − 0.3)/(n + 0.4)` are linear
    * iff the times are Weibull, and the OLS slope IS the shape k
    * (< 1 infant mortality, ≈ 1 memoryless, > 1 wear-out) with scale
    * `η = exp(x̄ − ȳ/k)` — the classic reliability-engineering
    * reading ("is our fulfillment delay memoryless or aging?").
    *
    * Exactness: the q308 zipfFit discipline — both plot coordinates
    * are nano-FLOORED (`⌊ln(·)·10⁹⌋`) into exact longs before the
    * OLS sums accumulate in DECIMAL(38,0), so slope and intercept
    * are each one mirrored double division over exact integers.
    * Rank assignment under tied times is sum-invariant (tied rows
    * share x, so Σxy/Σy don't depend on which tied row takes which
    * rank) — the ranks come from the per-distinct-time count frame,
    * never a row-sized window: cumulative-count B before each
    * distinct time, then `posexplode(sequence)` fans the tie block
    * back out to ranks B+1..B+c distributedly.
    *
    * Scale shape: one (group, time) grouped count (map-side
    * combined), one window over DISTINCT times per group, a
    * sequence-explode back to failure-sized rows with no ordering
    * requirement, one group-sized aggregate. Non-positive times are
    * excluded (ln); groups with < 3 distinct times report nulls.
    *
    * Returns `(group…, n_fail, shape, scale)`.
    */
  def weibullFit(
      df: DataFrame, groupCols: Seq[String], timeCol: Column)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val per = df
      .select(gc :+ timeCol.cast("long").as("__t"): _*)
      .where(col("__t").isNotNull && col("__t") > 0L)
      .groupBy(gc :+ col("__t"): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("__t").asc)
    val wAll = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val cum = per
      .withColumn("__before", coalesce(sum(col("__c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__mdist", count(lit(1)).over(wAll))
    val fanned = cum
      .withColumn("__off", explode(sequence(lit(1L), col("__c"))))
      .withColumn("__i", col("__before") + col("__off"))
    val f = (col("__i").cast("double") - 0.3) /
      (col("__n").cast("double") + 0.4)
    val xq = floor(log(col("__t").cast("double")) * 1e9).cast("long")
    val yq = floor(log(-log(lit(1.0) - f)) * 1e9).cast("long")
    val sums = fanned
      .select(gc ++ Seq(xq.as("__xq"), yq.as("__yq"),
        col("__mdist")): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_fail"),
        max(col("__mdist")).as("__md"),
        sum(col("__xq")).as("__sx"), sum(col("__yq")).as("__sy"),
        sum(dec(col("__xq")) * dec(col("__yq"))).as("__sxy"),
        sum(dec(col("__xq")) * dec(col("__xq"))).as("__sxx"))
    val m = col("n_fail").cast("decimal(38,0)")
    val den = (m * col("__sxx") - dec(col("__sx")) * dec(col("__sx")))
      .cast("double")
    val slope = (m * col("__sxy") -
      dec(col("__sx")) * dec(col("__sy"))).cast("double") / den
    val ok = col("__md") >= 3L && den > 0.0
    val xbar = col("__sx").cast("double") /
      col("n_fail").cast("double") / 1e9
    val ybar = col("__sy").cast("double") /
      col("n_fail").cast("double") / 1e9
    val scale = exp(xbar - ybar / slope)
    sums.select(gc ++ Seq(col("n_fail"),
      round(when(ok, slope), 6).as("shape"),
      round(when(ok && slope > 0.0, scale), 4).as("scale")): _*)
  }

  /** Aalen–Johansen cumulative incidence under two COMPETING risks —
    * the estimator that replaces 1−KM when subjects can fail in more
    * than one way (convert vs churn, dedup-drop vs quality-drop):
    * treating cause 2 as censoring inflates cause 1's incidence;
    * Aalen–Johansen prices each cause against the ALL-CAUSE survival,
    * so `cif1 + cif2 + S = 1` at every step (up to float rounding).
    *
    *   CIF_k(tᵢ) = Σ_{j≤i} S(tⱼ₋)·d_k(tⱼ)/n(tⱼ),
    *   S = all-cause Kaplan–Meier.
    *
    * Determinism: S(t−) is the q191 scalar running-product device
    * (a left fold of the sorted survival factors, seed 1.0 —
    * IEEE-exact against the oracle's seedless `list_reduce`), and
    * each CIF term S(t−)·d_k/n is nano-floored ONCE and the running
    * CIF is a cumulative sum of exact longs — order-free, so no
    * assumption about either engine's window-sum addition order (the
    * nelsonAalen `__h` discipline). (A single struct-accumulator
    * fold would be tighter — but DuckDB 1.0's `list_reduce` silently
    * corrupts struct accumulators from the third element on, so the
    * oracle CANNOT replay it; see the probe in this op's history.)
    *
    * Scale shape: one grouped (group, t) count, the [[kaplanMeier]]
    * at-risk windows, one per-group sorted factor array (guarded by
    * `maxTimepoints` — distinct TIMES, not rows), index-sliced scalar
    * folds, two group-partitioned running sums.
    * `causeCol`: 0 = censored, 1 / 2 = the competing causes.
    */
  def aalenJohansen(
      df: DataFrame, groupCol: String, durationCol: Column,
      causeCol: Column, maxTimepoints: Int = 10000): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        durationCol.cast("long").as("__t"),
        causeCol.cast("int").as("__k"))
      .where(col("__t").isNotNull && col("__t") >= 0 &&
        col("__k").isin(0, 1, 2))
    val byTime = base.groupBy("__g", "__t")
      .agg(sum(when(col("__k") === 1, 1L).otherwise(0L)).as("__d1"),
        sum(when(col("__k") === 2, 1L).otherwise(0L)).as("__d2"),
        sum(when(col("__k") === 0, 1L).otherwise(0L)).as("__c"))
    val w = Window.partitionBy("__g").orderBy("__t")
    val leave = col("__d1") + col("__d2") + col("__c")
    val risked = byTime
      .withColumn("__tot",
        sum(leave).over(Window.partitionBy("__g")))
      .withColumn("__gone", coalesce(sum(leave)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", col("__tot") - col("__gone"))
      .withColumn("__f",
        (col("__n") - col("__d1") - col("__d2")).cast("double") /
          col("__n").cast("double"))
      .withColumn("__h1",
        col("__d1").cast("double") / col("__n").cast("double"))
      .withColumn("__h2",
        col("__d2").cast("double") / col("__n").cast("double"))
    val fl = risked.groupBy(col("__g"))
      .agg(sort_array(collect_list(struct(col("__t"), col("__f"))))
        .as("__fts"))
      .withColumn("__fts",
        when(size(col("__fts")) > maxTimepoints,
          raise_error(lit("aalenJohansen: distinct event times per " +
            "group exceed maxTimepoints; coarsen the duration " +
            "granularity")).cast("array<struct<__t:bigint," +
            "__f:double>>"))
          .otherwise(col("__fts")))
      .select(col("__g"),
        transform(col("__fts"), r => r.getField("__f")).as("__fs"))
    val wi = Window.partitionBy("__g").orderBy("__t")
    val wCum = wi.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    risked
      .withColumn("__i", row_number().over(wi))
      .join(fl, Seq("__g"))
      .withColumn("__sprev",
        aggregate(slice(col("__fs"), lit(1), col("__i") - 1),
          lit(1.0d), (acc, x) => acc * x))
      .withColumn("__surv",
        aggregate(slice(col("__fs"), lit(1), col("__i")),
          lit(1.0d), (acc, x) => acc * x))
      .withColumn("__t1n",
        floor(col("__sprev") * col("__h1") * 1e9).cast("long"))
      .withColumn("__t2n",
        floor(col("__sprev") * col("__h2") * 1e9).cast("long"))
      .select(col("__g").as(groupCol), col("__t").as("t"),
        col("__n").as("n_at_risk"),
        col("__d1").as("n_cause1"), col("__d2").as("n_cause2"),
        col("__c").as("n_censored"),
        round(col("__surv"), 6).as("survival"),
        // EXACT nano units (the kaplanMeier cum_hazard_nano lesson:
        // a nano sum / 1e9 can land exactly on a 6-decimal rounding
        // boundary where the engines' half-up disagree by one ulp)
        sum(col("__t1n")).over(wCum).as("cif1_nano"),
        sum(col("__t2n")).over(wCum).as("cif2_nano"))
  }

  /** Cox proportional-hazards fit (single covariate, Breslow ties,
    * TWO Newton–Raphson steps from β = 0) — THE survival regression:
    * how does the hazard scale per unit of x, as a multiplicative
    * hazard ratio e^β, without choosing a baseline hazard shape
    * (Weibull q347 must; Cox doesn't). Two steps from 0 carry Newton
    * within O((Δ)³) of the optimum for the near-quadratic partial
    * likelihoods real covariates give — and the fit is the
    * DOCUMENTED contract (the q275 trainer discipline: the iteration
    * count is part of the estimator's definition, replayed exactly
    * by the oracle).
    *
    * Breslow partial-likelihood derivatives at β:
    *   grad = Σ_events x_i − Σ_times d_t·(S1/S0)
    *   hess = Σ_times d_t·(S2/S0 − (S1/S0)²),
    *   S_k(t) = Σ_{t_j ≥ t} x_j^k·e^{βx_j}.
    *
    * Exactness: x is an exact MILLI integer; per-row e^{βx}·x^k
    * terms are nano-floored ONCE (every float op mirrored
    * token-for-token, so the floored longs are identical
    * cross-engine); S_k are
    * suffix sums of exact longs over the per-distinct-time frame;
    * each time's grad/hess contribution is ONE mirrored double chain
    * floored to nano; β quantizes to nano between steps so step 2
    * evaluates e^{βx} from the identical double on both engines.
    *
    * Scale shape: one grouped (group, time) pass, two suffix windows
    * over distinct-time rows, group-domain joins carrying β — the
    * corpus is scanned once per Newton step. Groups are independent
    * fits.
    */
  def coxPh(
      df: DataFrame, groupCol: String, durationCol: Column,
      eventCol: Column, xMilli: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        durationCol.cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"),
        xMilli.cast("long").as("__x"))
      .where(col("__t").isNotNull && col("__t") >= 0 &&
        col("__x").isNotNull)
      .transform(graft.core.CacheScope.disk)
    val wSuf = Window.partitionBy("__g").orderBy("__t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    /** (grad_nano, hess_nano) per group at the given β column
      * (joined on __g; pass a lit-0.0 frame for step 0).
      */
    def derivs(beta: DataFrame, tag: String): DataFrame = {
      val x = col("__x").cast("double") / 1000.0
      val w = exp(col("__b") * x)
      val rows = base.join(beta, Seq("__g"))
        .withColumn("__wn", floor(w * 1e9).cast("long"))
        .withColumn("__xwn", floor(x * w * 1e9).cast("long"))
        .withColumn("__x2wn", floor(x * x * w * 1e9).cast("long"))
      val byTime = rows.groupBy("__g", "__t")
        .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
          sum(when(col("__e"), col("__x")).otherwise(0L)).as("__sxe"),
          sum(col("__wn")).as("__w0"), sum(col("__xwn")).as("__w1"),
          sum(col("__x2wn")).as("__w2"))
      val suf = byTime
        .withColumn("__s0", sum(col("__w0")).over(wSuf))
        .withColumn("__s1", sum(col("__w1")).over(wSuf))
        .withColumn("__s2", sum(col("__w2")).over(wSuf))
      val r1 = col("__s1").cast("double") / col("__s0").cast("double")
      val r2 = col("__s2").cast("double") / col("__s0").cast("double")
      suf.groupBy("__g")
        .agg(
          sum(col("__sxe")).as("__sxev"),
          sum(when(col("__d") > 0L,
            floor(col("__d").cast("double") * r1 * 1e9).cast("long"))
            .otherwise(0L)).as("__gsub"),
          sum(when(col("__d") > 0L,
            floor(col("__d").cast("double") * (r2 - r1 * r1) * 1e9)
              .cast("long")).otherwise(0L)).as("__h"),
          sum(col("__d")).as("__nev"))
        .select(col("__g"),
          (col("__sxev") * lit(1000000L) - col("__gsub"))
            .as(s"__g$tag"),
          col("__h").as(s"__h$tag"), col("__nev"))
    }

    val b0 = base.select(col("__g")).distinct()
      .withColumn("__b", lit(0.0d))
    val d0 = derivs(b0, "0")
    // β₁ = grad₀/hess₀, nano-quantized so step 2's e^{βx} is the
    // identical double on both engines
    val b1 = d0.select(col("__g"),
      when(col("__h0") > 0L,
        floor(col("__g0").cast("double") / col("__h0").cast("double")
          * 1e9).cast("long")).otherwise(lit(0L)).as("__b1n"))
    val d1 = derivs(
      b1.select(col("__g"),
        (col("__b1n").cast("double") / 1e9).as("__b")), "1")
    d0.join(b1, Seq("__g")).join(d1.drop("__nev"), Seq("__g"))
      .select(col("__g").as(groupCol), col("__nev").as("n_events"),
        col("__b1n").as("beta1_nano"),
        when(col("__h1") > 0L,
          col("__b1n") +
            floor(col("__g1").cast("double") /
              col("__h1").cast("double") * 1e9).cast("long"))
          .as("beta_nano"))
      // β in EXACT nano units (the cum_hazard_nano boundary lesson);
      // e^β is irrational — never on a rounding boundary — so the
      // readable hazard ratio is safe to round
      .withColumn("hazard_ratio",
        round(exp(col("beta_nano").cast("double") / 1e9), 6))
  }
}
