package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / sequential-monitoring operator shelf — the
  * cross-correlation, mSPRT, CUSUM, change-point, seasonal-profile,
  * Holt, Theil-Sen and bucket-grid ACF/Ljung-Box/burstiness
  * operators. Split from [[AnalyticsStatsOps]] (round 16); member
  * bodies are unchanged — this trait is mixed back into the same
  * [[Analytics]] object, so every `Analytics.x` reference resolves
  * exactly as before.
  */
private[graft] trait AnalyticsTimeSeriesOps { this: Analytics.type =>


  /** Lagged cross-correlation of two event streams: Pearson
    * correlation of series A's per-bucket counts against series B's
    * counts `lag` buckets later, for every lag in [−maxLag, maxLag] —
    * the lead/lag screen ("does signup activity LEAD purchase
    * activity, and by how many hours?") behind alerting and
    * attribution hypotheses. A positive-lag peak means A leads B.
    *
    * Shape: events collapse map-side to one row per time bucket
    * (conditional counts — cost scales with event volume once, then
    * everything downstream is BUCKET-sized: span/width rows, not
    * events); the full bucket grid is generated from the min/max
    * scalar so silent gaps count as zeros instead of vanishing from
    * the alignment (the resample lesson); the (2·maxLag+1) lags
    * attach by one generated column and one self-join on
    * `idx + lag` — (2k+1)·buckets rows total, one aggregation.
    * Zero-variance windows yield null correlation (both engines'
    * convention). Output: (lag, n_buckets, corr).
    */
  def crossCorrelation(
      df: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, bucketSeconds: Long = 3600L,
      maxLag: Int = 6): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxLag >= 0, "maxLag must be >= 0")
    val micros = bucketSeconds * 1000000L
    val cnt = df
      .where(col(tsCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div $micros").as("__idx"),
        col(typeCol).as("__t"))
      .groupBy("__idx")
      .agg(sum(when(col("__t") === typeA, 1L).otherwise(0L)).as("__a"),
        sum(when(col("__t") === typeB, 1L).otherwise(0L)).as("__b"))
    val bounds = cnt.agg(min(col("__idx")).as("__lo"),
      max(col("__idx")).as("__hi"))
    val grid = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__idx"))
      .join(cnt, Seq("__idx"), "left")
      .select(col("__idx"), coalesce(col("__a"), lit(0L)).as("__a"),
        coalesce(col("__b"), lit(0L)).as("__b"))
      .transform(graft.core.CacheScope.disk)
    val lagged = grid
      .select(col("__idx"), col("__a"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .withColumn("__bidx", col("__idx") + col("lag"))
      .join(grid.select(col("__idx").as("__bidx"), col("__b")),
        Seq("__bidx"))
    lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_buckets"),
        corr(col("__a").cast("double"), col("__b").cast("double"))
          .as("corr"))
  }

  /** Mixture-SPRT sequential monitor (Johari et al., "Peeking at A/B
    * tests") — the always-valid alternative to fixed-horizon tests:
    * per group, the cumulative conversion evidence at every period as
    * the Gaussian-mixture likelihood ratio
    * Λₙ = √(σ²/(σ²+n·τ²)) · exp(n²τ²(x̄−p₀)² / (2σ²(σ²+n·τ²)))
    * with the always-valid p-value min(1, 1/max_{m≤n} Λₘ) —
    * monotone, so "look every period" costs no α.
    *
    * Determinism: n and successes are exact BIGINT running sums
    * (rows-frame windows over a per-period pre-aggregation); x̄ and
    * the LOG likelihood ratio recompute per row from those integers
    * with literal σ², τ², p₀ in both engines. The statistic is
    * carried in LOG space on purpose: raw Λ reaches 10²⁰⁺ where
    * `round(·, 4)` can no longer absorb a 1-ulp exp() wobble, while
    * log Λ stays O(10¹) and the p-value exp(−max log Λ) is in [0, 1]
    * — both round-stable.
    *
    * Shape: rows collapse map-side to (group, period) counts; the
    * windows run over period-count-sized frames. One data-sized
    * shuffle.
    */
  def msprtMonitor(
      df: DataFrame, groupCol: String, periodCol: Column,
      labelCol: Column, p0: Double, tau2: Double,
      alpha: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1, "p0 in (0, 1)")
    require(tau2 > 0, "tau2 must be positive")
    val s2 = p0 * (1.0 - p0)
    val base = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__p").isNotNull && col("__y").isNotNull)
      .groupBy("__g", "__p")
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__s"))
    val w = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val nD = col("__cn").cast("double")
    val xbar = col("__cs").cast("double") / nD
    val llam = lit(0.5) * log(lit(s2) / (lit(s2) + nD * lit(tau2))) +
      ((nD * nD * lit(tau2) * (xbar - lit(p0)) * (xbar - lit(p0)))
        / (lit(2.0) * lit(s2) * (lit(s2) + nD * lit(tau2))))
    base
      .withColumn("__cn", sum("__c").over(w))
      .withColumn("__cs", sum("__s").over(w))
      .withColumn("__ll", llam)
      .withColumn("__llmax", max(col("__ll")).over(w))
      .select(col("__g").as(groupCol), col("__p").as("period"),
        col("__cn").as("n_cum"), col("__cs").as("pos_cum"),
        round(xbar, 6).as("rate"),
        round(col("__ll"), 4).as("log_lambda"),
        round(least(lit(1.0), exp(lit(0.0) - col("__llmax"))), 6)
          .as("always_valid_p"),
        (least(lit(1.0), exp(lit(0.0) - col("__llmax"))) < alpha)
          .cast("int").as("rejected_by_now"))
  }

  /** CUSUM level-shift detection per group over a dense integer
    * period grid: row counts per (group, period), gaps zero-filled
    * (the resample lesson — a silent month IS a signal), deviations
    * from the group mean accumulated one-sidedly in both directions,
    * with a √mean-scaled decision threshold.
    *
    * Exactness: the recurrence S⁺ᵢ = max(0, S⁺ᵢ₋₁ + dᵢ) is computed
    * by its prefix identity S⁺ᵢ = csᵢ − min(0, min_{j≤i} csⱼ) — pure
    * window functions, no sequential fold. Deviations are scaled to
    * whole units `dᵢ = n·cᵢ − Σc` (BIGINT; exact mean-centering with
    * no division), so the entire accumulation is integer; the final
    * report divides by n once. Needs `periods · Σcount < 2⁶³` —
    * ~9·10¹⁸ row-periods, comfortably above any monthly grid.
    *
    * Shape: rows collapse map-side to (group, period) counts; the
    * dense grid generates from a group-sized bounds frame; windows
    * run over period-count-sized frames per group. At 100 TB the
    * only data-sized stage is the first grouped count.
    */
  def cusumShift(
      df: DataFrame, groupCol: String, periodCol: Column,
      threshold: Double = 5.0): DataFrame = {
    val counts = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val grid = bounds.select(col("__g"),
      explode(sequence(col("__lo"), col("__hi"))).as("__p"))
    val dense = grid.join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = dense.groupBy("__g")
      .agg(sum("__c").as("__tot"), count(lit(1)).as("__n"))
    val w = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val stepped = dense.join(broadcast(tot), Seq("__g"))
      .withColumn("__d", col("__c") * col("__n") - col("__tot"))
      .withColumn("__cs", sum(col("__d")).over(w))
      .withColumn("__sp",
        col("__cs") - least(min(col("__cs")).over(w), lit(0L)))
      .withColumn("__sn",
        greatest(max(col("__cs")).over(w), lit(0L)) - col("__cs"))
    val h = lit(threshold) * sqrt(col("__tot").cast("double")
      / col("__n").cast("double"))
    stepped.select(col("__g").as(groupCol), col("__p").as("period"),
      col("__c").as("n"),
      round(col("__sp").cast("double") / col("__n").cast("double"), 4)
        .as("cusum_pos"),
      round(col("__sn").cast("double") / col("__n").cast("double"), 4)
        .as("cusum_neg"),
      (col("__sp").cast("double") / col("__n").cast("double") > h)
        .cast("int").as("shift_up"),
      (col("__sn").cast("double") / col("__n").cast("double") > h)
        .cast("int").as("shift_down"))
  }

  /** Fixed-target CUSUM per group — the STREAMABLE variant of
    * [[cusumShift]]: deviations accumulate against a caller-supplied
    * reference rate (`targetMilli` milli-events per period) instead
    * of the realized mean, so the statistic needs no second pass over
    * the data and a streaming monitor can maintain it with O(1) state
    * per group ([[graft.streaming.EventStreams.cusumStream]] is the
    * twin; the spec pins row equality).
    *
    * Fully integer: dᵢ = 1000·cᵢ − targetMilli, the prefix identity
    * gives both one-sided sums in BIGINT, and the decision compares
    * against `hMilli` exactly — no floats anywhere, so batch and
    * stream agree bit-for-bit by construction.
    *
    * Same dense-grid shape as [[cusumShift]]: gap periods are zeros,
    * grid spans the group's observed min..max period.
    */
  def cusumFixedTarget(
      df: DataFrame, groupCol: String, periodCol: Column,
      targetMilli: Long, hMilli: Long): DataFrame = {
    val counts = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val dense = bounds
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi")))
        .as("__p"))
      .join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val w = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    dense
      .withColumn("__cs",
        sum(col("__c") * lit(1000L) - lit(targetMilli)).over(w))
      .withColumn("__sp",
        col("__cs") - least(min(col("__cs")).over(w), lit(0L)))
      .withColumn("__sn",
        greatest(max(col("__cs")).over(w), lit(0L)) - col("__cs"))
      .select(col("__g").as(groupCol), col("__p").as("period"),
        col("__c").as("n"),
        col("__sp").as("cusum_pos_milli"),
        col("__sn").as("cusum_neg_milli"),
        (col("__sp") > hMilli).cast("int").as("shift_up"),
        (col("__sn") > hMilli).cast("int").as("shift_down"))
  }

  /** Single change-point locator per group (binary segmentation,
    * first split): the CUSUM-bridge argmax
    * t* = argmax_t |cs_t − t·Σc/n| over the dense period grid —
    * WHERE the level most plausibly shifted, complementing
    * [[cusumShift]]'s WHETHER/WHEN-detected. Emits the split index,
    * its period, the before/after means, and the bridge height both
    * raw and √S̄-scaled.
    *
    * Exactness: the bridge numerator B_t = |n·cs_t − t·S| is pure
    * BIGINT (needs periods²·Σc < 2⁶³ — any monthly grid qualifies),
    * so the argmax and its smallest-t tie-break are engine-exact via
    * one `min_by((−B, t))` aggregate; the means and the scaled height
    * divide once at the end.
    *
    * Shape: identical to [[cusumShift]] — map-side-combined counts,
    * group-sized grid generation, one per-group window pass, one
    * argmax aggregate. The only data-sized stage is the first count.
    */
  def changePoint(
      df: DataFrame, groupCol: String, periodCol: Column): DataFrame = {
    val counts = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val dense = bounds
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi")))
        .as("__p"))
      .join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val ord = Window.partitionBy("__g").orderBy("__p")
    val full = Window.partitionBy("__g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bridged = dense
      .withColumn("__t", row_number().over(ord).cast("long"))
      .withColumn("__cs", sum(col("__c"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(full))
      .withColumn("__s", sum(col("__c")).over(full))
      .withColumn("__b",
        abs(col("__n") * col("__cs") - col("__t") * col("__s")))
      .where(col("__t") < col("__n")) // a split needs both sides
    bridged.groupBy("__g")
      .agg(max(col("__n")).as("n_periods"), max(col("__s")).as("total_n"),
        min_by(struct(col("__t"), col("__p"), col("__cs"), col("__b")),
          struct((col("__b") * -1).as("nb"), col("__t"))).as("__best"))
      .select(col("__g").as(groupCol), col("n_periods"), col("total_n"),
        col("__best.__t").as("split_index"),
        col("__best.__p").as("change_period"),
        round(col("__best.__cs").cast("double")
          / col("__best.__t").cast("double"), 4).as("before_mean"),
        round((col("total_n") - col("__best.__cs")).cast("double")
          / (col("n_periods") - col("__best.__t")).cast("double"), 4)
          .as("after_mean"),
        round(col("__best.__b").cast("double")
          / col("n_periods").cast("double"), 4).as("bridge_height"),
        round((col("__best.__b").cast("double")
            / col("n_periods").cast("double"))
          / sqrt(col("total_n").cast("double")
            / col("n_periods").cast("double")), 6).as("bridge_scaled"))
  }

  /** Day-of-week seasonal profile per group over a dense calendar:
    * daily row counts (gap days are zeros — a silent Sunday IS part of
    * the Sunday profile), the per-weekday mean, and how many days
    * deviate from their weekday's mean by more than `sigma`·√mean
    * (the Poisson-scaled anomaly screen).
    *
    * Exactness: weekday means are ratios of BIGINT sums; the anomaly
    * predicate compares `|c − s/n|` against `sigma·√(s/n)` — every
    * operand one correctly-rounded IEEE op from exact integers, so
    * the flag is engine-deterministic. Weekday derives from the epoch
    * day (`(epochDay + 3) mod 7`, 0 = Monday) — calendar-library-free
    * and portable.
    *
    * Shape: rows collapse map-side to (group, day); the dense grid
    * generates from a group-sized bounds frame; the weekday profile
    * is a (groups × 7)-row aggregate broadcast back onto the day
    * frame for flagging, then re-aggregated. The only data-sized
    * stage is the first grouped count.
    */
  def seasonalProfile(
      df: DataFrame, groupCol: String, dateCol: Column,
      sigma: Double = 3.0): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val counts = df.select(col(groupCol).as("__g"),
        datediff(dateCol.cast("date"), epoch).cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val dense = bounds
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi")))
        .as("__p"))
      .join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("__dow", pmod(col("__p") + 3, lit(7)))
    val profile = dense.groupBy("__g", "__dow")
      .agg(count(lit(1)).as("__nd"), sum("__c").as("__s"))
    val mean = col("__s").cast("double") / col("__nd").cast("double")
    val flagged = dense.join(broadcast(profile), Seq("__g", "__dow"))
      .withColumn("__dev", abs(col("__c").cast("double") - mean))
      .withColumn("__anom",
        (col("__dev") > lit(sigma) * sqrt(mean)).cast("long"))
    flagged.groupBy("__g", "__dow")
      .agg(max(col("__nd")).as("n_days"), max(col("__s")).as("total"),
        sum(col("__anom")).as("n_anomalies"),
        max(col("__dev")).as("__maxdev"))
      .select(col("__g").as(groupCol), col("__dow").as("dow"),
        col("n_days"), col("total"),
        round(col("total").cast("double")
          / col("n_days").cast("double"), 4).as("dow_mean"),
        col("n_anomalies"),
        round(col("__maxdev"), 4).as("max_abs_residual"))
  }

  /** Holt linear-trend forecast (double exponential smoothing) per
    * group — the one-step-ahead "where is this series heading"
    * reading [[ewma]]'s level-only smoothing can't give (a steady
    * ramp reads as constant lag in EWMA; Holt carries an explicit
    * trend state): `l ← (α·x + (1000−α)(l+t))/1000`,
    * `t ← (β·(l−l_prev) + (1000−β)t)/1000` with milli-unit integer
    * smoothing weights, initialized `l₀ = x₀, t₀ = 0`; the h-step
    * forecast is `l + h·t`.
    *
    * Exactness: the recursion is integer-valued throughout — each
    * update is ONE mirrored `floor((a·x + b·s)/1000)` where the
    * double intermediate is exact for |cents| below ~2^49 (≈ $5.6
    * billion per bucket — document the bound, don't feed lifetime
    * totals), and floor-toward-−∞ is engine-identical, so level,
    * trend, and every forecast are exact BIGINTs cross-engine.
    *
    * Scale shape: one (group, bucket) map-side-combined sum, then
    * ONE collect_list per group bounded by the group's BUCKET count
    * (a time-bucketed series — days/hours — never row-count-sized;
    * that bound is the caller's contract), folded by a single
    * `aggregate` expression. Output is group-domain-sized.
    *
    * Returns `(group…, n_buckets, level, trend, forecast_1,
    * forecast_2, forecast_3)` — all cents BIGINTs.
    */
  def holtForecast(
      df: DataFrame, groupCols: Seq[String], bucket: Column,
      valueCents: Column, alphaMilli: Int = 300,
      betaMilli: Int = 100): DataFrame = {
    val series = holtSeries(df, groupCols, bucket, valueCents)
    holtEmit(groupCols, series.select(groupCols.map(col) :+ holtFold(
      col("__xs"),
      struct(lit(0L).as("l"), lit(0L).as("t"), lit(0).as("i")),
      alphaMilli, betaMilli).as("__st"): _*))
  }

  /** Resume [[holtForecast]] from a STANDING state instead of
    * rescanning history — the incremental form: `state` is a prior
    * holt output (`group…, n_buckets, level, trend`) and `df` carries
    * only the NEW buckets, which must all sort AFTER the buckets the
    * state consumed (the caller's watermark contract — a standing
    * daily monitor appends whole days, exactly this shape). Because
    * the recursion is a left fold, resume(state(prefix), suffix) ==
    * full(prefix ++ suffix) EXACTLY — the spec pins the equality, so
    * a monitor never re-reads history to extend a forecast.
    *
    * Groups in `state` with no new buckets pass through unchanged;
    * groups appearing only in `df` are NEW series and initialize
    * exactly as [[holtForecast]] does.
    */
  def holtResume(
      state: DataFrame, df: DataFrame, groupCols: Seq[String],
      bucket: Column, valueCents: Column, alphaMilli: Int = 300,
      betaMilli: Int = 100): DataFrame = {
    val series = holtSeries(df, groupCols, bucket, valueCents)
    val st = state.select(groupCols.map(col) ++ Seq(
      col("level").as("__l0"), col("trend").as("__t0"),
      col("n_buckets").cast("int").as("__i0")): _*)
    val joined = series.join(st, groupCols.toSeq, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        coalesce(col("__xs"), array().cast("array<long>")).as("__xs"),
        coalesce(col("__l0"), lit(0L)).as("__l0"),
        coalesce(col("__t0"), lit(0L)).as("__t0"),
        coalesce(col("__i0"), lit(0)).as("__i0")): _*)
    holtEmit(groupCols, joined.select(groupCols.map(col) :+ holtFold(
      col("__xs"),
      struct(col("__l0").as("l"), col("__t0").as("t"),
        col("__i0").as("i")),
      alphaMilli, betaMilli).as("__st"): _*))
  }

  /** Theil–Sen robust trend per group — the median of all pairwise
    * slopes over a BUCKETED series: the outlier-proof answer to "what
    * is this series' underlying rate" that OLS loses to one bad day
    * and [[holtForecast]] partially smooths into its state (its
    * breakdown point is ~29% contaminated buckets). Intercept is the
    * median residual `y − slope·x` at the chosen slope.
    *
    * Exactness: per-bucket sums are exact BIGINTs; each slope is ONE
    * double division of exact longs and each median is an exact order
    * statistic of the sorted slope array (odd: the middle; even: the
    * mean of the two middles — one more double op), all mirrored.
    *
    * Scale contract — BUCKETED SERIES: the pair join is bucket² per
    * group (30 daily buckets → 435 slope pairs; the collect_list is
    * pair-count-bounded). This is the [[kendallTauB]] trade: bounded
    * domains buy row-count independence; don't feed row-level
    * timestamps, feed the time buckets a monitor actually tracks.
    *
    * Returns `(group…, n_buckets, n_pairs, slope, intercept)`; null
    * slope for single-bucket groups.
    */
  def theilSenTrend(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column): DataFrame = {
    val per = df
      .select(groupCols.map(col) ++ Seq(
        bucketIdx.cast("long").as("__bx"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__bx").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__bx"): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val b = per.select(groupCols.map(col) ++ Seq(
      col("__bx").as("__bx2"), col("__y").as("__y2")): _*)
    val slopes = per.join(b, groupCols)
      .where(col("__bx") < col("__bx2"))
      .select(groupCols.map(col) :+
        ((col("__y2") - col("__y")).cast("double") /
          (col("__bx2") - col("__bx")).cast("double")).as("__s"): _*)
    def medianOf(sorted: Column, n: Column): Column = {
      val odd = element_at(sorted, ((n + lit(1L)) / lit(2L)).cast("int"))
      val evn = (element_at(sorted, (n / lit(2L)).cast("int")) +
        element_at(sorted, (n / lit(2L) + lit(1L)).cast("int"))) / 2.0
      when(n % 2L === 1L, odd).otherwise(evn)
    }
    val med = slopes.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sort_array(collect_list(col("__s"))).as("__ss"))
      .select(groupCols.map(col) ++ Seq(col("n_pairs"),
        medianOf(col("__ss"), col("n_pairs")).as("__slope")): _*)
    val withSlope = per.join(med, groupCols.toSeq, "left")
      .select(groupCols.map(col) ++ Seq(col("n_pairs"), col("__slope"),
        (col("__y").cast("double") -
          col("__slope") * col("__bx").cast("double")).as("__r")): _*)
    withSlope.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        first(col("n_pairs")).as("n_pairs"),
        first(col("__slope")).as("__slope"),
        sort_array(collect_list(col("__r"))).as("__rs"))
      .select(groupCols.map(col) ++ Seq(
        col("n_buckets"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        round(col("__slope"), 6).as("slope"),
        round(medianOf(col("__rs"), col("n_buckets")), 4)
          .as("intercept")): _*)
  }

  /** Per-(group, bucket) sums collected into the bucket-ordered value
    * array the Holt fold consumes.
    */
  private def holtSeries(
      df: DataFrame, groupCols: Seq[String], bucket: Column,
      valueCents: Column): DataFrame = df
    .select(groupCols.map(col) ++ Seq(bucket.as("__b"),
      valueCents.cast("long").as("__x")): _*)
    .where(col("__b").isNotNull && col("__x").isNotNull)
    .groupBy(groupCols.map(col) :+ col("__b"): _*)
    .agg(sum(col("__x")).as("__x"))
    .groupBy(groupCols.map(col): _*)
    .agg(transform(
      sort_array(collect_list(struct(col("__b"), col("__x")))),
      s => s.getField("__x")).as("__xs"))

  /** The Holt left fold over a value array from an arbitrary
    * (l, t, i) state — shared verbatim by [[holtForecast]] (zero
    * state) and [[holtResume]] (standing state), which is WHY
    * resume == full holds bit-for-bit.
    */
  private def holtFold(
      xs: Column, init: Column, alphaMilli: Int,
      betaMilli: Int): Column = {
    require(alphaMilli >= 1 && alphaMilli <= 999, "alphaMilli in [1,999]")
    require(betaMilli >= 1 && betaMilli <= 999, "betaMilli in [1,999]")
    def step(num: Column): Column =
      floor(num / lit(1000.0)).cast("long")
    aggregate(xs, init, (acc, x) => {
      val l = acc.getField("l")
      val t = acc.getField("t")
      val i = acc.getField("i")
      val lNew = step(lit(alphaMilli.toDouble) * x.cast("double") +
        lit((1000 - alphaMilli).toDouble) * (l + t).cast("double"))
      val tNew = step(lit(betaMilli.toDouble) *
        (lNew - l).cast("double") +
        lit((1000 - betaMilli).toDouble) * t.cast("double"))
      struct(
        when(i === 0, x).otherwise(lNew).as("l"),
        when(i === 0, lit(0L)).otherwise(tNew).as("t"),
        (i + lit(1)).as("i"))
    })
  }

  private def holtEmit(
      groupCols: Seq[String], folded: DataFrame): DataFrame =
    folded.select(groupCols.map(col) ++ Seq(
      col("__st").getField("i").cast("long").as("n_buckets"),
      col("__st").getField("l").as("level"),
      col("__st").getField("t").as("trend"),
      (col("__st").getField("l") + col("__st").getField("t"))
        .as("forecast_1"),
      (col("__st").getField("l") + lit(2L) * col("__st").getField("t"))
        .as("forecast_2"),
      (col("__st").getField("l") + lit(3L) * col("__st").getField("t"))
        .as("forecast_3")): _*)

  /** Zero-filled per-type bucket counts: every type's [min, max]
    * bucket range densified (a silent hour is c = 0, not a missing
    * row — skipping gaps would splice distant buckets together and
    * corrupt every lag statistic). Shared by [[autocorrelation]] and
    * [[burstiness]]; the [[crossCorrelation]] grid, per type.
    */
  private def bucketCounts(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long): DataFrame = {
    val micros = bucketSeconds * 1000000L
    val cnt = df
      .where(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("__ty"),
        expr(s"unix_micros($tsCol) div $micros").as("__idx"))
      .groupBy("__ty", "__idx").agg(count(lit(1)).as("__c"))
    cnt.groupBy("__ty")
      .agg(min(col("__idx")).as("__lo"), max(col("__idx")).as("__hi"))
      .select(col("__ty"),
        explode(sequence(col("__lo"), col("__hi"))).as("__idx"))
      .join(cnt, Seq("__ty", "__idx"), "left")
      .select(col("__ty"), col("__idx"),
        coalesce(col("__c"), lit(0L)).as("__c"))
  }

  /** Per-type autocorrelation of bucketed event counts at lags
    * 1..maxLag — [[crossCorrelation]] turned on a single series: the
    * seasonality/self-excitation readout (a daily cycle spikes lag
    * 24 on hourly buckets; retry storms decay geometrically from lag
    * 1) that decides resampling windows and anomaly baselines.
    *
    * Exactness — unlike [[crossCorrelation]]'s float `corr`, the ACF
    * here is an exact integer identity until ONE double division:
    * with n buckets and count sum S, `r_k·(den·n²) = num_k·n²` where
    * `num_k·n² = Σ_{t≤n−k} (n·c_t − S)(n·c_{t+k} − S)` and
    * `den·n² = Σ_t (n·c_t − S)²` — both DECIMAL(38,0) sums of exact
    * products (mean-centering multiplied through by n, so no
    * rational mean ever materializes). Order-free integer sums →
    * bit-identical cross-engine. Constant series (den = 0) emit null
    * r. Buckets are ZERO-FILLED over each type's [min, max] range
    * (gap-skipping would corrupt every lag alignment).
    *
    * Scale shape: one bucketed count (map-side combined), one
    * per-type grid explode, the lag fan-out (grid × maxLag rows)
    * joined back on (type, idx+lag) — equi-join, never pairwise over
    * events — and per-(type, lag) aggregates; per-type one-row
    * moment frames broadcast. Output is types × lags.
    *
    * Returns `(event_type, lag, n_buckets, n_pairs, r)`.
    */
  def autocorrelation(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long = 3600L, maxLag: Int = 6): DataFrame =
    acfRaw(df, tsCol, typeCol, bucketSeconds, maxLag)
      .select(col("__ty").as("event_type"), col("lag"),
        col("n_buckets"), col("n_pairs"),
        round(when(col("__den") > 0,
          col("__num").cast("double") / col("__den").cast("double")),
          6).as("r"))

  /** The [[autocorrelation]] core pre-rounding: per (type, lag) the
    * exact DECIMAL numerator/denominator — shared with [[ljungBox]],
    * whose statistic must consume the UNROUNDED rₖ.
    */
  private def acfRaw(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long, maxLag: Int): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxLag >= 1 && maxLag <= 512, "maxLag in [1, 512]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val grid = bucketCounts(df, tsCol, typeCol, bucketSeconds)
      .transform(graft.core.CacheScope.disk)
    val moments = grid.groupBy("__ty")
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__q"))
    // den·n² = Σ(n·c − S)² = n²Q − 2nS·S + nS² = n·(n·Q − S²)
    val den = dec(col("__n")) *
      (dec(col("__n")) * col("__q") - dec(col("__s")) * dec(col("__s")))
    val lagged = grid
      .select(col("__ty"), col("__idx"), col("__c"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("__jidx", col("__idx") + col("lag"))
      .join(grid.select(col("__ty"), col("__idx").as("__jidx"),
        col("__c").as("__c2")), Seq("__ty", "__jidx"))
    lagged
      .join(broadcast(moments), Seq("__ty"))
      .groupBy(col("__ty"), col("lag"))
      .agg(max(col("__n")).as("n_buckets"),
        count(lit(1)).as("n_pairs"),
        sum((dec(col("__n")) * dec(col("__c")) - dec(col("__s"))) *
          (dec(col("__n")) * dec(col("__c2")) - dec(col("__s"))))
          .as("__num"),
        max(den).as("__den"))
  }

  /** Ljung–Box portmanteau test per type over the [[autocorrelation]]
    * machinery: is the bucket-count series white noise ACROSS the
    * first h lags jointly? The multi-lag omnibus beside the lag-1
    * readings (DW reads residual lag-1, runs reads sign clumping —
    * a seasonal process with a ZERO lag-1 correlation sails past
    * both and lights up here). Q_LB = n(n+2)·Σₖ rₖ²/(n−k) against
    * the pinned χ²₀.₀₅ critical for dof = h.
    *
    * Exactness: rₖ's numerator/denominator stay the exact DECIMAL
    * identities of the ACF core (never the rounded display value);
    * each lag's rₖ²/(n−k) term is one mirrored double expression
    * nano-floored before the order-free per-type sum; one final
    * mirrored multiplication. Zero-variance series (den = 0) emit
    * null.
    * Scale: identical to [[autocorrelation]] — the lag fan-out is
    * grid × h equi-joined, never pairwise.
    */
  def ljungBox(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long = 3600L, maxLag: Int = 6): DataFrame = {
    val raw = acfRaw(df, tsCol, typeCol, bucketSeconds, maxLag)
    val rk = col("__num").cast("double") / col("__den").cast("double")
    val nD = col("n_buckets").cast("double")
    val term = when(col("__den") > 0,
      floor(rk * rk / (nD - col("lag").cast("double")) * 1e9)
        .cast("decimal(38,0)"))
      .otherwise(lit(null).cast("decimal(38,0)"))
    val agg = raw
      .withColumn("__t", term)
      .groupBy(col("__ty"))
      .agg(max(col("n_buckets")).as("n_buckets"),
        count(lit(1)).as("n_lags"),
        sum(col("__t")).as("__ts"),
        sum(when(col("__t").isNull, 1L).otherwise(0L)).as("__bad"))
    val lb = (col("n_buckets").cast("double") *
      (col("n_buckets").cast("double") + 2.0)) *
      (col("__ts").cast("double") / 1e9)
    val ok = col("__bad") === 0L && col("n_buckets") >= 2L
    val lbSafe = when(ok, lb).otherwise(lit(null).cast("double"))
    val dof = col("n_lags").cast("int")
    val crit = chi2Crit05.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(dof === d, lit(v)).otherwise(acc)
    }
    agg.select(col("__ty").as("event_type"),
      col("n_buckets"), col("n_lags"),
      round(lbSafe, 6).as("lb"),
      coalesce(lbSafe > crit, lit(false)).cast("int")
        .as("serially_dependent"))
  }

  /** Per-type burstiness of bucketed event counts — the Fano factor
    * `var/mean` (1 = Poisson; ≫ 1 = clumped arrivals; < 1 =
    * regular/paced) and the Goh–Barabási burstiness
    * `B = (σ − μ)/(σ + μ)` ∈ (−1, 1) — the two standard "is this
    * stream machine-like or bursty" numbers behind rate-limit
    * sizing and bot screening, over the same zero-filled grid as
    * [[autocorrelation]].
    *
    * Exactness: with n buckets, S = Σc, Q = Σc² (DECIMAL-exact),
    * sample variance multiplies through as `(n·Q − S²)/(n(n−1))` and
    * `fano = (n·Q − S²)/((n−1)·S)` — each one double division of
    * exact decimals; σ is one correctly-rounded sqrt and B one
    * mirrored formula. Degenerate cases are null: fano for S = 0,
    * both for n < 2, B when σ + μ = 0.
    *
    * Scale shape: one map-side-combined bucketed count, the per-type
    * grid explode, one type-domain-sized aggregate.
    *
    * Returns `(event_type, n_buckets, n_events, mean_rate, fano,
    * burstiness)`.
    */
  def burstiness(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = bucketCounts(df, tsCol, typeCol, bucketSeconds)
      .groupBy("__ty")
      .agg(count(lit(1)).as("n_buckets"), sum(col("__c")).as("n_events"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__q"))
    val n = col("n_buckets")
    val s = col("n_events")
    val varNum = (dec(n) * col("__q") - dec(s) * dec(s)).cast("double")
    val mean = s.cast("double") / n.cast("double")
    val variance = varNum / (n.cast("double") * (n.cast("double") - 1.0))
    val sigma = sqrt(variance)
    m.select(col("__ty").as("event_type"), n, s,
      round(mean, 6).as("mean_rate"),
      round(when(n > 1 && s > 0,
        varNum / ((n.cast("double") - 1.0) * s.cast("double"))), 6)
        .as("fano"),
      round(when(n > 1 && sigma + mean > 0.0,
        (sigma - mean) / (sigma + mean)), 6).as("burstiness"))
  }

  /** Holt–Winters additive seasonal forecast per group — the
    * seasonal completion of [[holtForecast]]: level, trend AND an
    * m-slot seasonal state updated by the classic triple recursion
    * (`l' = α(x − s_j) + (1−α)(l+t)`, `t' = β(l'−l) + (1−β)t`,
    * `s_j' = γ(x − l') + (1−γ)s_j`, j the bucket's season slot), so
    * a weekly-cycled volume series forecasts next MONDAY from Monday
    * state — where plain Holt averages the cycle away and q354's
    * seasonal-naive can't learn a trend through it.
    *
    * Exactness, the [[holtForecast]] discipline verbatim: milli-unit
    * smoothing weights, every step `⌊num/1000⌋` over exact longs, so
    * the whole state is exact BIGINTs and the oracle replays the
    * fold as a generated recursive CTE bit-for-bit. Initialization
    * is the monitor convention, not an R-ets replication (documented
    * so the oracle pins it): first observation seeds the level,
    * trend 0, seasonals learned FROM ZERO by the γ recursion — after
    * a few cycles the slots carry the pattern; the emitted state
    * makes convergence inspectable.
    *
    * Scale shape identical to [[holtForecast]]: one grouped bucket
    * sum, one per-group sorted array fold (bucket-domain-sized —
    * a group's history must fit an array, the explicit contract of
    * the Holt family), group-domain output. Returns `(group…,
    * n_buckets, level, trend, s0…s{m−1}, forecast_1/2/3)` where
    * `forecast_h = level + h·trend + s_{(n+h−1) mod m}`.
    */
  def holtWintersForecast(
      df: DataFrame, groupCols: Seq[String], bucket: Column,
      valueCents: Column, alphaMilli: Int = 300, betaMilli: Int = 100,
      gammaMilli: Int = 200, season: Int = 7): DataFrame = {
    require(alphaMilli >= 1 && alphaMilli <= 999, "alpha in [1,999]")
    require(betaMilli >= 1 && betaMilli <= 999, "beta in [1,999]")
    require(gammaMilli >= 1 && gammaMilli <= 999, "gamma in [1,999]")
    require(season >= 2 && season <= 64, "season in [2,64]")
    val series = holtSeries(df, groupCols, bucket, valueCents)
    val init = struct(lit(0L).as("l"), lit(0L).as("t"),
      array_repeat(lit(0L), season).as("s"), lit(0).as("i"))
    val folded = series.select(groupCols.map(col) :+
      hwFold(col("__xs"), init, alphaMilli, betaMilli, gammaMilli,
        season).as("__st"): _*)
    hwEmit(groupCols, folded, season)
  }

  /** The Holt–Winters left fold from an arbitrary (l, t, s, i)
    * state — shared verbatim by [[holtWintersForecast]] (zero state)
    * and [[holtWintersResume]] (standing state), which is WHY
    * resume == full holds bit-for-bit (the [[holtFold]] identity
    * with a seasonal array).
    */
  private def hwFold(
      xs: Column, init: Column, alphaMilli: Int, betaMilli: Int,
      gammaMilli: Int, season: Int): Column = {
    def step(num: Column): Column =
      floor(num / lit(1000.0)).cast("long")
    aggregate(xs, init, (acc, x) => {
      val l = acc.getField("l")
      val t = acc.getField("t")
      val s = acc.getField("s")
      val i = acc.getField("i")
      val j = i % season
      val sj = element_at(s, j + 1)
      val lNew = step(lit(alphaMilli.toDouble) *
        (x - sj).cast("double") +
        lit((1000 - alphaMilli).toDouble) * (l + t).cast("double"))
      val tNew = step(lit(betaMilli.toDouble) *
        (lNew - l).cast("double") +
        lit((1000 - betaMilli).toDouble) * t.cast("double"))
      val sNew = step(lit(gammaMilli.toDouble) *
        (x - lNew).cast("double") +
        lit((1000 - gammaMilli).toDouble) * sj.cast("double"))
      val sArr = transform(s,
        (v, idx) => when(idx === j, sNew).otherwise(v))
      struct(
        when(i === 0, x).otherwise(lNew).as("l"),
        when(i === 0, lit(0L)).otherwise(tNew).as("t"),
        when(i === 0, s).otherwise(sArr).as("s"),
        (i + lit(1)).as("i"))
    })
  }

  private def hwEmit(
      groupCols: Seq[String], folded: DataFrame, season: Int)
      : DataFrame = {
    val st = col("__st")
    val n = st.getField("i")
    def slot(h: Int): Column =
      element_at(st.getField("s"), ((n + lit(h - 1)) % season) + 1)
    folded.select(groupCols.map(col) ++ Seq(
      n.cast("long").as("n_buckets"),
      st.getField("l").as("level"),
      st.getField("t").as("trend")) ++
      (0 until season).map(k =>
        element_at(st.getField("s"), k + 1).as(s"s$k")) ++
      (1 to 3).map(h =>
        (st.getField("l") + lit(h.toLong) * st.getField("t") +
          slot(h)).as(s"forecast_$h")): _*)
  }

  /** Incremental Holt–Winters: resume the triple recursion over new
    * buckets from a STANDING state table (a [[holtWintersForecast]]
    * output) and land EXACTLY where the full recompute lands — the
    * [[holtResume]] left-fold identity extended to the seasonal
    * array, so a daily monitor folds yesterday's buckets into
    * yesterday's state instead of rescanning history. Groups present
    * in the state but with no new buckets pass through unchanged;
    * groups appearing only in the new data fold from the zero state
    * (they ARE their own full history). Output schema identical to
    * [[holtWintersForecast]].
    */
  def holtWintersResume(
      state: DataFrame, df: DataFrame, groupCols: Seq[String],
      bucket: Column, valueCents: Column, alphaMilli: Int = 300,
      betaMilli: Int = 100, gammaMilli: Int = 200, season: Int = 7)
      : DataFrame = {
    val series = holtSeries(df, groupCols, bucket, valueCents)
    val stateSel = state.select(groupCols.map(col) ++ Seq(
      col("level").as("__l0"), col("trend").as("__t0"),
      array((0 until season).map(k => col(s"s$k")): _*).as("__s0"),
      col("n_buckets").cast("int").as("__i0")): _*)
    val joined = series.join(stateSel, groupCols, "full")
    val init = struct(
      coalesce(col("__l0"), lit(0L)).as("l"),
      coalesce(col("__t0"), lit(0L)).as("t"),
      coalesce(col("__s0"), array_repeat(lit(0L), season)).as("s"),
      coalesce(col("__i0"), lit(0)).as("i"))
    val folded = joined.select(groupCols.map(col) :+
      hwFold(coalesce(col("__xs"), array().cast("array<bigint>")),
        init, alphaMilli, betaMilli, gammaMilli, season)
        .as("__st"): _*)
    hwEmit(groupCols, folded, season)
  }

  /** Forecast-baseline scorecard per group — the M-competition
    * discipline the [[holtForecast]] monitor owes its consumers:
    * before any model forecast is trusted, it must beat the free
    * baselines on a holdout, measured in MASE (error relative to the
    * in-sample naive error — the only scale-free metric that
    * compares across groups with different volumes). Buckets
    * `[0, cutBucket)` are training; `[cutBucket, endBucket]` is the
    * holdout, scored one-step-rolling (forecasts use actual previous
    * values, the standard sNaive evaluation): naive = y(t−1),
    * seasonal-naive = y(t−season). The grid is ZERO-FILLED over
    * `[0, endBucket]` — missing buckets are real zeros to a volume
    * monitor, not holes.
    *
    * Exactness: the bucket sums, absolute errors, squared errors and
    * the in-sample naive error sum are all exact BIGINTs off the
    * zero-filled grid; each reported metric is ONE mirrored double
    * division (MASE cross-multiplies the two exact sums:
    * `Σe·n_train / (Σe_insample·n_test)`), so every number is
    * bit-identical cross-engine.
    *
    * Scale shape: one grouped bucket sum (map-side combined), a
    * per-group sequence-explode grid join (bucket-domain-sized), two
    * lag windows over the per-group grid, one group-sized reduce.
    *
    * Returns `(group…, n_test, mae_naive, rmse_naive, mase_naive,
    * mae_snaive, rmse_snaive, mase_snaive)`.
    */
  def forecastBaselines(
      df: DataFrame, groupCols: Seq[String], bucket: Column,
      valueCents: Column, cutBucket: Int, endBucket: Int,
      season: Int): DataFrame = {
    require(season >= 1 && cutBucket > season,
      "cutBucket must exceed season")
    require(endBucket >= cutBucket, "empty holdout")
    val gc = groupCols.map(col)
    val sums = df
      .select(gc ++ Seq(bucket.cast("long").as("__b"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__b").isNotNull && col("__y").isNotNull &&
        col("__b") >= 0L && col("__b") <= endBucket.toLong)
      .groupBy(gc :+ col("__b"): _*)
      .agg(sum(col("__y")).as("__y"))
    val grid = sums.select(gc: _*).distinct()
      .withColumn("__b", explode(sequence(lit(0L),
        lit(endBucket.toLong))))
      .join(sums, groupCols :+ "__b", "left")
      .withColumn("__y", coalesce(col("__y"), lit(0L)))
    val w = Window.partitionBy(gc: _*).orderBy(col("__b").asc)
    val lagged = grid
      .withColumn("__l1", lag(col("__y"), 1).over(w))
      .withColumn("__ls", lag(col("__y"), season).over(w))
    val isTrain = col("__b") >= 1L && col("__b") < cutBucket.toLong
    val isTest = col("__b") >= cutBucket.toLong
    val e1 = abs(col("__y") - col("__l1"))
    val eS = abs(col("__y") - col("__ls"))
    val agg = lagged.groupBy(gc: _*)
      .agg(
        sum(when(isTest, 1L).otherwise(0L)).as("n_test"),
        sum(when(isTrain, 1L).otherwise(0L)).as("__n_tr"),
        sum(when(isTrain, e1).otherwise(0L)).as("__d"),
        sum(when(isTest, e1).otherwise(0L)).as("__e1"),
        sum(when(isTest, e1 * e1).otherwise(0L)).as("__q1"),
        sum(when(isTest, eS).otherwise(0L)).as("__es"),
        sum(when(isTest, eS * eS).otherwise(0L)).as("__qs"))
    val nT = col("n_test").cast("double")
    def mase(e: String): Column =
      when(col("__d") > 0L,
        (col(e).cast("decimal(38,0)") * col("__n_tr"))
          .cast("double") /
          (col("__d").cast("decimal(38,0)") * col("n_test"))
            .cast("double"))
    agg.select(gc ++ Seq(col("n_test"),
      round(col("__e1").cast("double") / nT, 4).as("mae_naive"),
      round(sqrt(col("__q1").cast("double") / nT), 4)
        .as("rmse_naive"),
      round(mase("__e1"), 6).as("mase_naive"),
      round(col("__es").cast("double") / nT, 4).as("mae_snaive"),
      round(sqrt(col("__qs").cast("double") / nT), 4)
        .as("rmse_snaive"),
      round(mase("__es"), 6).as("mase_snaive")): _*)
  }

  /** Count-data overdispersion panel per group: the dispersion index
    * D = s²/x̄ (Poisson ⇒ D ≈ 1; D ≫ 1 = clumped arrivals) and the
    * method-of-moments negative-binomial fit r = x̄²/(s² − x̄),
    * p = x̄/s² — the distributional verdict a rate monitor needs
    * BEFORE alerting off Poisson bands that clumped traffic would
    * trip constantly. Input rows are count cells (e.g. per-day event
    * counts — the caller aggregates first).
    *
    * Exactness: one grouped pass of exact moments (n, Σv, Σv² in
    * DECIMAL(38,0)); every reported statistic is FLOOR-quantized from
    * one mirrored double chain (milli for the mean/r, micro for
    * D/p) — floors, not rounds, so no value ever sits on a rounding
    * boundary. `r/p` null when s² ≤ x̄ (under- or equi-dispersed —
    * the NB fit does not exist there).
    */
  def overdispersion(
      df: DataFrame, groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    val gc = groupCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = df.select(gc :+ valueCol.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__s"),
        sum(dec(col("__v")) * dec(col("__v"))).as("__q"))
      .where(col("n") >= 2L)
    val nD = col("n").cast("double")
    val mean = col("__s").cast("double") / nD
    val vr = (nD * col("__q").cast("double") -
      col("__s").cast("double") * col("__s").cast("double")) /
      (nD * (nD - 1.0))
    val over = vr > mean
    m.select(gc ++ Seq(col("n"),
      col("__s").as("total"),
      floor(mean * 1e3).cast("long").as("mean_milli"),
      when(mean > 0.0, floor(vr / mean * 1e6).cast("long"))
        .as("dispersion_micro"),
      when(over, floor(mean * mean / (vr - mean) * 1e3).cast("long"))
        .as("nb_r_milli"),
      when(over, floor(mean / vr * 1e6).cast("long"))
        .as("nb_p_micro")): _*)
  }
}
