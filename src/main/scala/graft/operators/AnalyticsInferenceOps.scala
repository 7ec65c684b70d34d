package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired/ordered inference operators added round 16: McNemar's test
  * (paired binary detectors), Mann–Kendall (monotonic-trend
  * significance — the test companion of [[AnalyticsStatsOps.theilSenTrend]]'s
  * slope estimate), Cochran–Armitage (dose–response trend in
  * proportions across ordered categories), and Page–Hinkley
  * sequential change detection. All follow the shelf's exactness
  * discipline:
  * counts and test-statistic numerators are exact integers (DECIMAL
  * casts BEFORE any product that could pass 2^63), doubles appear only
  * in one final mirrored division/sqrt per emitted statistic.
  */
private[graft] trait AnalyticsInferenceOps { this: Analytics.type =>

  /** McNemar's test for two PAIRED binary detectors over the same
    * items: did detector A and detector B fire at different marginal
    * rates? Only the discordant cells carry signal — b = A-only,
    * c = B-only; χ² = (b−c)²/(b+c) and the continuity-corrected
    * variant (|b−c|−1)²/(b+c), each exact-integer in the numerator
    * with one double division. `differs` uses the corrected statistic
    * against χ²₀.₀₅,₁ = 3.841.
    *
    * Scale: one grouped count over the item frame — the contingency
    * cells, not the items, flow past the aggregation. The classic use
    * here is comparing dedup detectors on their candidate-pair union
    * (q284): the input is already the pair frame, so the test adds one
    * shuffle on the group keys.
    */
  def mcnemar(
      df: DataFrame, groupCols: Seq[String], aCol: String, bCol: String,
      chi2Alpha: Double = 3.841): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n_a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n_b_only"))
    val nb = col("n_a_only")
    val nc = col("n_b_only")
    val disc = nb + nc
    // (b−c)² in decimal: b of a trillion-pair corpus squares past 2^63
    val chi2 = (dec(nb - nc) * dec(nb - nc)).cast("double") /
      disc.cast("double")
    val ccNum = greatest(abs(nb - nc) - 1L, lit(0L))
    val chi2cc = (dec(ccNum) * dec(ccNum)).cast("double") /
      disc.cast("double")
    agg.select(groupCols.map(col) ++ Seq(
      col("n_both"), nb, nc,
      when(disc === 0L, lit(null).cast("double"))
        .otherwise(round(chi2, 6)).as("chi2"),
      when(disc === 0L, lit(null).cast("double"))
        .otherwise(round(chi2cc, 6)).as("chi2_cc"),
      coalesce(
        when(disc === 0L, lit(false)).otherwise(chi2cc > chi2Alpha),
        lit(false)).cast("int").as("differs")): _*)
  }

  /** Cochran's Q test for k PAIRED binary detectors over the same
    * items — [[mcnemar]]'s generalization past two: do ANY of the k
    * detectors fire at different marginal rates?
    * Q = (k−1)(k·ΣGⱼ² − T²)/(k·T − ΣLᵢ²) with Gⱼ the per-detector
    * totals, Lᵢ the per-item flag counts, T their common sum —
    * EVERY term an exact integer (DECIMAL products), one double
    * division, compared against the pinned χ² critical for
    * dof = k−1 ([[chi2Crit05]]). All-concordant data (every Lᵢ ∈
    * {0, k}) has zero denominator — null Q, no evidence either way.
    *
    * Scale: one aggregation over the item frame (the per-item Lᵢ²
    * fold rides it) — detector-count arithmetic after.
    */
  def cochranQ(
      df: DataFrame, groupCols: Seq[String], flagCols: Seq[String]): DataFrame = {
    require(flagCols.size >= 2, "need at least two detectors")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val k = flagCols.size
    val flags = flagCols.map(f => col(f).cast("boolean").cast("long"))
    val l = flags.reduce(_ + _)
    val aggCols = Seq(sum(dec(l) * dec(l)).as("__l2")) ++
      flags.zip(flagCols).map { case (f, name) =>
        sum(f).as(s"g_$name")
      }
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_items"), aggCols: _*)
    val gs = flagCols.map(f => col(s"g_$f"))
    val tTot = gs.reduce(_ + _)
    val g2 = gs.map(g => dec(g) * dec(g)).reduce(_ + _)
    val num = (lit(k - 1).cast("decimal(38,0)") *
      (lit(k).cast("decimal(38,0)") * g2 - dec(tTot) * dec(tTot)))
      .cast("double")
    val den = (lit(k).cast("decimal(38,0)") * dec(tTot) - col("__l2"))
      .cast("double")
    val q = num / den
    val qSafe = when(den <= 0.0, lit(null).cast("double")).otherwise(q)
    val crit = chi2Crit05.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(lit(k - 1) === d, lit(v)).otherwise(acc)
    }
    agg.select(groupCols.map(col) ++ Seq(col("n_items")) ++ gs ++ Seq(
      round(qSafe, 6).as("q"),
      lit(k - 1).as("dof"),
      coalesce(qSafe > crit, lit(false)).cast("int")
        .as("differs")): _*)
  }

  /** Mann–Kendall monotonic-trend test per group over a bucketed
    * series: S = Σ_{i<j} sign(y_j − y_i) on the bucket sums, the
    * tie-corrected variance numerator
    * varNum = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (Var(S) = varNum/18),
    * Kendall's τ_a = 2S/(n(n−1)), and the continuity-corrected
    * z = (S∓1)/√(varNum/18). The inferential companion of
    * [[AnalyticsStatsOps.theilSenTrend]]: the slope says HOW FAST,
    * this says WHETHER the monotone trend is real.
    *
    * Exactness: S, varNum, and every count are exact integers (the
    * cubic tie terms computed in DECIMAL before the sum); τ and z are
    * each one mirrored double division. Scale: the pair join is
    * buckets² per group — buckets are DAYS (or another coarse grain),
    * so a 10-year daily series is ~6.7M pairs per group, shuffled on
    * the group key only; the corpus itself is touched once by the
    * bucket-sum aggregation. The n³-sized varNum stays well inside
    * BIGINT to ~10⁶ buckets per group (documented Int64 contract).
    */
  def mannKendall(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column, zAlpha: Double = 1.96): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val per = df
      .select(groupCols.map(col) ++ Seq(
        bucketIdx.cast("long").as("__bx"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__bx").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__bx"): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val counts = per.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"))
    val b = per.select(groupCols.map(col) ++ Seq(
      col("__bx").as("__bx2"), col("__y").as("__y2")): _*)
    val s = per.join(b, groupCols)
      .where(col("__bx") < col("__bx2"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(col("__y2") > col("__y"), 1L)
        .when(col("__y2") < col("__y"), -1L).otherwise(0L))
        .as("s_stat"))
    val t = col("__t")
    val ties = per.groupBy(groupCols.map(col) :+ col("__y"): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(dec(t) * dec(t - 1L) * dec(t * 2L + 5L)).as("__ties"))
    val n = col("n_buckets")
    val varNum = (dec(n) * dec(n - 1L) * dec(n * 2L + 5L) -
      coalesce(col("__ties"), lit(0L).cast("decimal(38,0)")))
      .cast("long")
    val sv = coalesce(col("s_stat"), lit(0L))
    val sD = sv.cast("double")
    val sd = sqrt(col("var_num").cast("double") / 18.0)
    val z = when(sv > 0L, (sD - 1.0) / sd)
      .when(sv < 0L, (sD + 1.0) / sd)
      .otherwise(lit(0.0))
    val zSafe = when(col("var_num") <= 0L, lit(null).cast("double"))
      .otherwise(z)
    val tau = sD * 2.0 / (n.cast("double") * (n.cast("double") - 1.0))
    counts
      .join(s, groupCols, "left")
      .join(ties, groupCols, "left")
      .withColumn("var_num", varNum)
      .select(groupCols.map(col) ++ Seq(
        n, sv.as("s_stat"), col("var_num"),
        when(n < 2L, lit(null).cast("double"))
          .otherwise(round(tau, 6)).as("tau"),
        round(zSafe, 6).as("z"),
        coalesce(abs(zSafe) > zAlpha, lit(false)).cast("int")
          .as("trending")): _*)
  }

  /** Seasonal Mann–Kendall (Hirsch–Slack) per group: [[mannKendall]]
    * computed WITHIN each season and combined — S = Σ Sₛ,
    * varNum = Σ varNumₛ (seasons are disjoint samples, so variances
    * add) — which cancels any periodic pattern exactly: a weekly
    * cycle contributes ZERO to every within-season sign because the
    * cycle's multiplier is constant inside a season, while plain MK
    * would mix cycle phases into the pair signs. The trend test to
    * run on anything with a day-of-week shape, i.e. every event
    * series.
    *
    * Same exactness as [[mannKendall]] (S and varNum exact through
    * DECIMAL, one mirrored z); the pair join is per-(group, season)
    * — (buckets/seasons)² each — strictly smaller than plain MK's.
    */
  def seasonalMannKendall(
      df: DataFrame, groupCols: Seq[String], seasonCol: Column,
      bucketIdx: Column, valueCents: Column,
      zAlpha: Double = 1.96): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val per = df
      .select(groupCols.map(col) ++ Seq(
        seasonCol.cast("long").as("__se"),
        bucketIdx.cast("long").as("__bx"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__se").isNotNull && col("__bx").isNotNull &&
        col("__y").isNotNull)
      .groupBy(groupCols.map(col) ++ Seq(col("__se"), col("__bx")): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val counts = per.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col("__se")).as("n_seasons"),
        count(lit(1)).as("n_buckets"))
    val b = per.select(groupCols.map(col) ++ Seq(
      col("__se"), col("__bx").as("__bx2"), col("__y").as("__y2")): _*)
    val joinKeys = groupCols :+ "__se"
    val s = per.join(b, joinKeys)
      .where(col("__bx") < col("__bx2"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(col("__y2") > col("__y"), 1L)
        .when(col("__y2") < col("__y"), -1L).otherwise(0L))
        .as("s_stat"))
    val t = col("__t")
    val seasonN = per.groupBy(groupCols.map(col) :+ col("__se"): _*)
      .agg(count(lit(1)).as("__n"))
    val seasonTies = per
      .groupBy(groupCols.map(col) ++ Seq(col("__se"), col("__y")): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(groupCols.map(col) :+ col("__se"): _*)
      .agg(sum(dec(t) * dec(t - 1L) * dec(t * 2L + 5L)).as("__ties"))
    val n = col("__n")
    val varNum = seasonN
      .join(seasonTies, joinKeys, "left")
      .withColumn("__vn",
        dec(n) * dec(n - 1L) * dec(n * 2L + 5L) -
          coalesce(col("__ties"), lit(0L).cast("decimal(38,0)")))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__vn")).cast("long").as("var_num"))
    val sv = coalesce(col("s_stat"), lit(0L))
    val sD = sv.cast("double")
    val sd = sqrt(col("var_num").cast("double") / 18.0)
    val z = when(sv > 0L, (sD - 1.0) / sd)
      .when(sv < 0L, (sD + 1.0) / sd)
      .otherwise(lit(0.0))
    val zSafe = when(col("var_num") <= 0L, lit(null).cast("double"))
      .otherwise(z)
    counts
      .join(s, groupCols, "left")
      .join(varNum, groupCols)
      .select(groupCols.map(col) ++ Seq(
        col("n_seasons"), col("n_buckets"), sv.as("s_stat"),
        col("var_num"),
        round(zSafe, 6).as("z"),
        coalesce(abs(zSafe) > zAlpha, lit(false)).cast("int")
          .as("trending")): _*)
  }

  /** Wald–Wolfowitz runs test per group over a bucketed series:
    * is the sequence of above/below-median signs RANDOM, or does it
    * clump? The serial-dependence axis none of the point tests read —
    * a slow regime oscillation leaves every marginal distribution
    * identical while collapsing the run count. Signs come from the
    * exact integers 2x − med2 (the count-frame median identity;
    * exact-median buckets drop, the classical contract); R counts
    * sign changes via one ordered window; E[R] = 2n₁n₂/n + 1 and
    * Var[R] = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)) are one mirrored double
    * formula over exact counts.
    *
    * Scale: one grouped bucket-sum, one value-ordered window for the
    * median, one bucket-ordered window for the runs — all
    * bucket-domain-sized.
    */
  def runsTest(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column, zAlpha: Double = 1.96): DataFrame = {
    val per = df
      .select(groupCols.map(col) ++ Seq(
        bucketIdx.cast("long").as("__bx"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__bx").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__bx"): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    // exact 2·median off the per-(group, value) counts
    val counts = per.groupBy(groupCols.map(col) :+ col("__y"): _*)
      .agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__y").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = per.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val med = counts.withColumn("__cum", sum(col("__c")).over(wv))
      .join(n, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg((min(when(col("__cum") >=
          floor((col("__n") + 1L).cast("double") / 2.0).cast("long"),
          col("__y"))) +
        min(when(col("__cum") >=
          floor(col("__n").cast("double") / 2.0).cast("long") + 1L,
          col("__y")))).as("__m2"))
    val signed = per.join(med, groupCols)
      .withColumn("__s", col("__y") * 2L - col("__m2"))
      .where(col("__s") =!= 0L)
      .withColumn("__sg", (col("__s") > 0L).cast("int"))
    val wb = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bx").asc)
    val runs = signed
      .withColumn("__prev", lag(col("__sg"), 1).over(wb))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("__sg").cast("long")).as("n_above"),
        (sum(when(col("__prev").isNull ||
          col("__prev") =!= col("__sg"), 1L).otherwise(0L)))
          .as("n_runs"))
    val n1 = col("n_above").cast("double")
    val n2 = (col("n_kept") - col("n_above")).cast("double")
    val nD = col("n_kept").cast("double")
    val eR = lit(2.0) * n1 * n2 / nD + 1.0
    val varR = lit(2.0) * n1 * n2 *
      (lit(2.0) * n1 * n2 - nD) / (nD * nD * (nD - 1.0))
    val z = (col("n_runs").cast("double") - eR) / sqrt(varR)
    val ok = col("n_kept") >= 2L && n1 > 0.0 && n2 > 0.0 && varR > 0.0
    val zSafe = when(ok, z).otherwise(lit(null).cast("double"))
    runs.select(groupCols.map(col) ++ Seq(
      col("n_kept"), col("n_above"), col("n_runs"),
      round(zSafe, 6).as("z"),
      coalesce(abs(zSafe) > zAlpha, lit(false)).cast("int")
        .as("clumped")): _*)
  }

  /** Cochran–Armitage trend-in-proportions test per group: across
    * ordered dose levels w with nᵢ items and rᵢ successes each, is
    * the success rate monotonically drifting with the dose?
    * T·N = N·Σwrᵢ − R·Σwnᵢ (exact), Var(T·N) =
    * R(N−R)(N·Σw²nᵢ − (Σwnᵢ)²)/(N−1), z = num/√var — every moment an
    * exact integer (DECIMAL products), one mirrored double division +
    * sqrt. The binary-outcome sibling of [[mannKendall]]: that one
    * tests a measured series, this one a conversion ladder (the
    * "does quality-bucket rank predict rejection rate" reading).
    *
    * Scale: one grouped count to the (group, dose) level table —
    * everything after is level-cardinality-sized.
    */
  def cochranArmitage(
      df: DataFrame, groupCols: Seq[String], doseCol: Column,
      flagCol: Column, zAlpha: Double = 1.96): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val lvl = df
      .select(groupCols.map(col) ++ Seq(
        doseCol.cast("long").as("__w"),
        flagCol.cast("long").as("__f")): _*)
      .where(col("__w").isNotNull && col("__f").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__w"): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__f")).as("__r"))
    val w = col("__w")
    val agg = lvl.groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__r")).as("n_pos"),
        sum(dec(w) * dec(col("__n"))).as("__swn"),
        sum(dec(w) * dec(col("__r"))).as("__swr"),
        sum(dec(w) * dec(w) * dec(col("__n"))).as("__sw2n"),
        count(lit(1)).as("n_levels"))
    val nD = col("n").cast("decimal(38,0)")
    val rD = col("n_pos").cast("decimal(38,0)")
    val num = (nD * col("__swr") - rD * col("__swn")).cast("double")
    val varD = ((rD * (nD - rD)) *
      (nD * col("__sw2n") - col("__swn") * col("__swn")))
      .cast("double") / (col("n") - 1L).cast("double")
    val z = num / sqrt(varD)
    val zSafe = when(col("n") < 2L || col("n_pos") === 0L ||
        col("n_pos") === col("n") || col("n_levels") < 2L,
      lit(null).cast("double")).otherwise(z)
    agg.select(groupCols.map(col) ++ Seq(
      col("n"), col("n_pos"), col("n_levels"),
      round(zSafe, 6).as("z"),
      coalesce(abs(zSafe) > zAlpha, lit(false)).cast("int")
        .as("trending")): _*)
  }

  /** χ²₀.₀₅ critical values for df 1..10, pinned as literals shared
    * verbatim with the DuckDB oracle (a [[kruskalWallis]] group's
    * threshold depends on its own category count).
    */
  val chi2Crit05: Seq[(Int, Double)] = Seq(
    1 -> 3.841459, 2 -> 5.991465, 3 -> 7.814728, 4 -> 9.487729,
    5 -> 11.070498, 6 -> 12.591587, 7 -> 14.06714, 8 -> 15.507313,
    9 -> 16.918978, 10 -> 18.307038)

  /** Kruskal–Wallis rank test per group: do ANY of the k categories'
    * value distributions differ? The k-sample generalization of the
    * Mann–Whitney machinery ([[graft.quality.Drift.mannWhitneyU]]):
    * pooled tie-averaged half-unit ranks from per-(group, value)
    * counts (rank2 = 2·before + t + 1, shared by every category at a
    * tied value), per-category rank sums R2ᵢ exact in DECIMAL, then
    * H = 3·Σ R2ᵢ²/nᵢ / (N(N+1)) − 3(N+1) with the tie correction
    * C = 1 − Σ(t³−t)/(N³−N) and H' = H/C. The per-category χ² terms
    * are mirrored doubles µ-floored into DECIMAL before the
    * order-free sum; `differs` compares H' against the pinned
    * χ²₀.₀₅ critical value for the group's own dof = k−1 (null H'
    * or dof > 10 → 0).
    *
    * Scale: one grouped count to (group, category, value) cells, one
    * window over the (group, value) totals — value-domain-sized, not
    * row-sized — then category-cardinality arithmetic.
    */
  def kruskalWallis(
      df: DataFrame, groupCols: Seq[String], catCol: Column,
      valueCol: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .select(groupCols.map(col) ++ Seq(
        catCol.as("__cat"), valueCol.cast("long").as("__v")): _*)
      .where(col("__cat").isNotNull && col("__v").isNotNull)
      .groupBy(groupCols.map(col) ++ Seq(col("__cat"), col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .transform(graft.core.CacheScope.disk)
    val perV = cells.groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__c")).as("__tv"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV
      .withColumn("__before", coalesce(sum(col("__tv")).over(w), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__before") + col("__tv") + 1L)
    val perCat = cells
      .join(ranked, groupCols :+ "__v")
      .groupBy(groupCols.map(col) :+ col("__cat"): _*)
      .agg(sum(col("__c")).as("__ni"),
        sum(dec(col("__c")) * dec(col("__rank2"))).as("__r2"))
    // per-category χ² term, mirrored doubles µ-floored into DECIMAL
    // (R2² of a billion-row group passes 2^63 — the term must live in
    // decimal, and floor(double) only re-enters integers via decimal)
    val term = floor(col("__r2").cast("double") *
      col("__r2").cast("double") / col("__ni").cast("double") * 1e6)
      .cast("decimal(38,0)")
    val sums = perCat
      .withColumn("__term", term)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__ni")).as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("__term")).as("__terms"))
    val ties = perV.groupBy(groupCols.map(col): _*)
      .agg(sum(dec(col("__tv")) * dec(col("__tv")) * dec(col("__tv")) -
        dec(col("__tv"))).as("__ties"))
    val nD = col("n").cast("double")
    val h = lit(3.0) * (col("__terms").cast("double") / 1e6) /
      (nD * (nD + 1.0)) - lit(3.0) * (nD + 1.0)
    val c = lit(1.0) - col("__ties").cast("double") /
      (nD * nD * nD - nD)
    val hSafe = when(col("n") < 2L || col("n_cats") < 2L,
      lit(null).cast("double")).otherwise(h)
    val hAdj = when(hSafe.isNull || c <= 0.0,
      lit(null).cast("double")).otherwise(hSafe / c)
    val dof = (col("n_cats") - 1L).cast("int")
    val crit = chi2Crit05.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(dof === d, lit(v)).otherwise(acc)
    }
    sums.join(ties, groupCols)
      .select(groupCols.map(col) ++ Seq(
        col("n"), col("n_cats"), dof.as("dof"),
        round(hSafe, 6).as("h"),
        round(hAdj, 6).as("h_adj"),
        coalesce(hAdj > crit, lit(false)).cast("int")
          .as("differs")): _*)
  }

  /** Bonferroni-adjusted two-sided z critical values for m = k(k−1)/2
    * pairwise comparisons (α = 0.05), pinned as literals shared
    * verbatim with the DuckDB oracle — [[dunnPosthoc]]'s significance
    * threshold depends on the group's own comparison count.
    */
  val zBonf05: Seq[(Int, Double)] = Seq(
    1 -> 1.9599639845400536, 3 -> 2.3939797998185104,
    6 -> 2.638257273476751, 10 -> 2.8070337683438114,
    15 -> 2.9351994688666982, 21 -> 3.038074304924211,
    28 -> 3.123734630323846, 36 -> 3.1969502291312533,
    45 -> 3.260767488420533)

  /** Dunn's post-hoc test after [[kruskalWallis]]: the omnibus says
    * SOME category differs — this says WHICH PAIRS, on the same
    * pooled tie-averaged ranks (never per-pair re-ranking, which
    * would change the question): z_ij = (R̄ᵢ − R̄ⱼ) / √(V·(1/nᵢ+1/nⱼ))
    * with the tie-corrected V = (N(N+1) − Σ(t³−t)/(N−1))/12, and
    * significance against the Bonferroni critical value pinned for
    * the group's own m = k(k−1)/2 comparisons (null for k > 10).
    *
    * Exactness: rank sums R2ᵢ and tie cubes exact in DECIMAL, mean
    * ranks and z one mirrored double formula. Scale: the same cell
    * frames as [[kruskalWallis]], plus a category×category pair join
    * — category-domain-bounded, never data-sized.
    */
  def dunnPosthoc(
      df: DataFrame, groupCols: Seq[String], catCol: Column,
      valueCol: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .select(groupCols.map(col) ++ Seq(
        catCol.as("__cat"), valueCol.cast("long").as("__v")): _*)
      .where(col("__cat").isNotNull && col("__v").isNotNull)
      .groupBy(groupCols.map(col) ++ Seq(col("__cat"), col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .transform(graft.core.CacheScope.disk)
    val perV = cells.groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__c")).as("__tv"))
      .transform(graft.core.CacheScope.disk)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV
      .withColumn("__before", coalesce(sum(col("__tv")).over(w), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__before") + col("__tv") + 1L)
    val perCat = cells
      .join(ranked, groupCols :+ "__v")
      .groupBy(groupCols.map(col) :+ col("__cat"): _*)
      .agg(sum(col("__c")).as("__ni"),
        sum(dec(col("__c")) * dec(col("__rank2"))).as("__r2"))
      .transform(graft.core.CacheScope.disk)
    val gTot = perV.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__tv")).as("__n"),
        sum(dec(col("__tv")) * dec(col("__tv")) * dec(col("__tv")) -
          dec(col("__tv"))).as("__ties"))
      .join(perCat.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("__k")), groupCols)
    val a = perCat.select(groupCols.map(col) ++ Seq(
      col("__cat").as("cat_a"), col("__ni").as("n_a"),
      col("__r2").as("__r2a")): _*)
    val b = perCat.select(groupCols.map(col) ++ Seq(
      col("__cat").as("cat_b"), col("__ni").as("n_b"),
      col("__r2").as("__r2b")): _*)
    val pairs = a.join(b, groupCols)
      .where(col("cat_a") < col("cat_b"))
      .join(gTot, groupCols)
    val nD = col("__n").cast("double")
    // mean ranks from half-unit rank sums
    val ra = col("__r2a").cast("double") / 2.0 / col("n_a").cast("double")
    val rb = col("__r2b").cast("double") / 2.0 / col("n_b").cast("double")
    val vTies = (nD * (nD + 1.0) -
      col("__ties").cast("double") / (nD - 1.0)) / 12.0
    val z = (ra - rb) / sqrt(vTies *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    val ok = col("__n") >= 2L && vTies > 0.0
    val zSafe = when(ok, z).otherwise(lit(null).cast("double"))
    val m = (col("__k") * (col("__k") - 1L) / lit(2L)).cast("long")
    val crit = zBonf05.foldLeft(lit(null).cast("double")) {
      case (acc, (mm, v)) => when(m === mm.toLong, lit(v)).otherwise(acc)
    }
    pairs.select(groupCols.map(col) ++ Seq(
      col("cat_a"), col("cat_b"), col("n_a"), col("n_b"),
      round(zSafe, 6).as("z"),
      coalesce(abs(zSafe) > crit, lit(false)).cast("int")
        .as("significant")): _*)
  }

  /** Page–Hinkley sequential change detection per group over a
    * bucketed measured series: each bucket's mean (µ-quantized) is
    * compared against the RUNNING mean of the series so far, the
    * slack-discounted deviations accumulate, and the alarm fires when
    * the cumulative sum rises `lambdaMicro` above its own running
    * minimum. The measured-value sibling of
    * [[AnalyticsStatsOps.cusumFixedTarget]]: CUSUM monitors an event
    * RATE against a fixed target, this monitors a value LEVEL against
    * its own history — no reference rate to configure, so it fits a
    * metric whose baseline is unknown up front.
    *
    * PH_t = m_t − min_{s≤t} m_s with
    * m_t = Σ_{i≤t} (x̄ᵢµ − floor(Sᵢµ/i) − δµ): every quantity after
    * the two mirrored floor-divisions (bucket mean, running mean) is
    * an exact BIGINT, so the whole trace — including the alarm bucket
    * — replays bit-for-bit in any engine with IEEE doubles. The
    * running-min identity is the same window trick the CUSUM shelf
    * uses: no recursion, no UDF, one window pass per group.
    *
    * Scale: one grouped aggregation to (group, bucket), one window
    * over buckets per group. Int64 contract: per-bucket cents × 10⁶
    * must stay inside 2⁵³ for the quantization to be exact
    * (≈ $90M/bucket — pass coarser units past that).
    */
  def pageHinkley(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column, deltaMicro: Long, lambdaMicro: Long): DataFrame =
    pageHinkleyTrace(df, groupCols, bucketIdx, valueCents, deltaMicro,
        lambdaMicro)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("ph_micro")).as("ph_max"),
        min(when(col("alarmed") === 1, col("bucket")))
          .as("alarm_bucket"))
      .select(groupCols.map(col) ++ Seq(
        col("n_buckets"), col("ph_max"), col("alarm_bucket"),
        col("alarm_bucket").isNotNull.cast("int").as("alarmed")): _*)

  /** The per-bucket PH trace behind [[pageHinkley]] — exposed so the
    * streaming twin ([[graft.streaming.EventStreams.pageHinkleyStream]])
    * can pin row-equality against the batch plan. One row per
    * OBSERVED bucket (a value series has no zero-fill: an absent day
    * has no mean, unlike the CUSUM count grid): the bucket's µ-mean,
    * the PH statistic, and whether it sits at or above `lambdaMicro`.
    */
  def pageHinkleyTrace(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column, deltaMicro: Long, lambdaMicro: Long): DataFrame = {
    val per = df
      .select(groupCols.map(col) ++ Seq(
        bucketIdx.cast("long").as("__bx"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__bx").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__bx"): _*)
      .agg(sum(col("__y")).as("__s"), count(lit(1)).as("__c"))
      // bucket mean in µ-cents: multiply AFTER the double cast (the
      // Holt treatment) so the long product can't wrap
      .withColumn("__x", floor(col("__s").cast("double") * 1e6 /
        col("__c").cast("double")).cast("long"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ord = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bx"))
    per
      .withColumn("__t", row_number().over(ord).cast("long"))
      .withColumn("__cum", sum(col("__x")).over(w))
      .withColumn("__term", col("__x") -
        floor(col("__cum").cast("double") / col("__t").cast("double"))
          .cast("long") - lit(deltaMicro))
      .withColumn("__m", sum(col("__term")).over(w))
      // the running min includes the current row, so PH_t ≥ 0 always
      .withColumn("__ph", col("__m") - min(col("__m")).over(w))
      .select(groupCols.map(col) ++ Seq(
        col("__bx").as("bucket"), col("__c").as("n"),
        col("__x").as("x_micro"), col("__ph").as("ph_micro"),
        (col("__ph") >= lambdaMicro).cast("int").as("alarmed")): _*)
  }

  /** Jonckheere–Terpstra ordered-alternative test per group: across
    * k ORDERED dose levels, do values trend monotonically WITH the
    * dose? The measured-outcome sibling of [[cochranArmitage]]
    * (which reads a binary rate along the ladder) and the sharper
    * question next to [[kruskalWallis]]'s omnibus: KW spends power on
    * every permutation of "some dose differs"; JT bets on the
    * ordering and wins that power back when the alternative really is
    * monotone — the "does quality-bucket rank predict the metric"
    * reading. J = Σᵢ<ⱼ Uᵢⱼ over dose pairs, each Uᵢⱼ the
    * Mann–Whitney count of (lower-dose value < higher-dose value)
    * with exact tie half-credit.
    *
    * Exactness: doubled units throughout — J2 = Σ cⱼ(v)·(2·cbᵢ(v) +
    * cᵢ(v)) over the dense (value × dose) grid is an exact DECIMAL
    * integer, E2 = (N² − Σnᵢ²)/2 likewise; z = (J2 − E2)/(2σ) with
    * the classical no-tie σ² = (N²(2N+3) − Σnᵢ²(2nᵢ+3))/72 (heavy
    * ties overstate σ slightly — conservative; the statistic itself
    * carries exact tie credit).
    *
    * Scale: one (group, dose, value) count; the dense grid is
    * |values|·k rows (value-domain-sized, never row-sized); the
    * dose-pair join multiplies by k²/2 — k is a handful of ordered
    * buckets by construction.
    */
  def jonckheereTerpstra(
      df: DataFrame, groupCols: Seq[String], doseCol: Column,
      valueCents: Column, zAlpha: Double = 1.96): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val cells = df
      .select(gc ++ Seq(doseCol.cast("long").as("__w"),
        valueCents.cast("long").as("__v")): _*)
      .where(col("__w").isNotNull && col("__v").isNotNull)
      .groupBy(gc ++ Seq(col("__w"), col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .transform(graft.core.CacheScope.disk)
    val vals = cells.select(gc :+ col("__v"): _*).distinct()
    val doses = cells.select(gc :+ col("__w"): _*).distinct()
    val grid = vals.join(doses, groupCols)
      .join(cells, groupCols ++ Seq("__w", "__v"), "left")
      .na.fill(0L, Seq("__c"))
    val wv = Window.partitionBy(gc :+ col("__w"): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCb = grid
      .withColumn("__cb", coalesce(sum(col("__c")).over(wv), lit(0L)))
      .transform(graft.core.CacheScope.disk)
    val hi = withCb.select(
      gc ++ Seq(col("__v"), col("__w").as("__wj"),
        col("__c").as("__cj")): _*)
    val j2 = withCb.join(hi,
        groupCols ++ Seq("__v")
          // (groupCols ++ v) equi-keys; the dose inequality below
          ).where(col("__w") < col("__wj"))
      .groupBy(gc: _*)
      .agg(sum(dec(col("__cj")) *
        (dec(col("__cb")) * 2 + dec(col("__c")))).as("__j2"))
    val perDose = cells.groupBy(gc :+ col("__w"): _*)
      .agg(sum(col("__c")).as("__ni"))
    val moments = perDose.groupBy(gc: _*)
      .agg(sum(col("__ni")).as("n"),
        count(lit(1)).as("n_doses"),
        sum(dec(col("__ni")) * dec(col("__ni"))).as("__sn2"),
        sum(dec(col("__ni")) * dec(col("__ni")) *
          (dec(col("__ni")) * 2 + 3)).as("__sn23"))
    val nD = col("n").cast("decimal(38,0)")
    val e2 = (nD * nD - col("__sn2")).cast("double") / 2.0
    val varJ = ((nD * nD * (nD * 2 + 3)) - col("__sn23"))
      .cast("double") / 72.0
    val z = (col("__j2").cast("double") - e2) /
      (lit(2.0) * sqrt(varJ))
    val ok = col("n") >= 2L && col("n_doses") >= 2L && varJ > 0.0
    val zSafe = when(ok, z).otherwise(lit(null).cast("double"))
    j2.join(moments, groupCols)
      .select(gc ++ Seq(
        col("n"), col("n_doses"),
        col("__j2").cast("long").as("j2"),
        round(zSafe, 6).as("z"),
        coalesce(zSafe > zAlpha, lit(false)).cast("int")
          .as("trending")): _*)
  }

  /** Cronbach's α scale reliability per group: do the k item columns
    * (sub-scores of a composite) measure ONE construct, or is the
    * composite adding noise to signal? α = k/(k−1)·(1 − Σσᵢ²/σₜ²)
    * with σₜ² the variance of the item SUM — the audit a composite
    * quality score owes its consumers: α near 1 says the items
    * co-vary (one underlying quality axis), α near 0 says the
    * composite is averaging unrelated things, negative α says items
    * point in OPPOSITE directions (a sign error in one component).
    *
    * Exactness: with items as exact longs, each variance numerator
    * nQᵢ − Sᵢ² is an exact DECIMAL integer and the n(n−1)
    * denominators CANCEL in Σσᵢ²/σₜ², so α is k/(k−1)·(1 − one
    * double division of two exact integers) — no quantization, no
    * accumulation order. Rows with any null item drop (complete-case,
    * the classical contract).
    *
    * Scale: ONE grouped aggregation over the rows (2k+3 mergeable
    * moments); group-sized arithmetic after. The moments are
    * shard-mergeable, so a standing reliability monitor never
    * rescans history.
    */
  def cronbachAlpha(
      df: DataFrame, groupCols: Seq[String],
      items: Seq[(String, Column)]): DataFrame = {
    require(items.size >= 2, "cronbachAlpha needs >= 2 items")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val k = items.size
    val gc = groupCols.map(col)
    val proj = df.select(gc ++ items.map { case (n, c) =>
      c.cast("long").as(s"__i_$n") }: _*)
      .where(items.map(i => col(s"__i_${i._1}").isNotNull)
        .reduce(_ && _))
      .withColumn("__t", items.map(i => col(s"__i_${i._1}"))
        .reduce(_ + _))
    val aggs =
      items.flatMap { case (n, _) => Seq(
        sum(col(s"__i_$n")).as(s"__s_$n"),
        sum(dec(col(s"__i_$n")) * dec(col(s"__i_$n"))).as(s"__q_$n"))
      } ++ Seq(
        sum(col("__t")).as("__st"),
        sum(dec(col("__t")) * dec(col("__t"))).as("__qt"))
    val agg = proj.groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
    val nD = col("n").cast("decimal(38,0)")
    def varNum(s: String, q: String): Column =
      nD * col(q) - dec(col(s)) * dec(col(s))
    val sumItemVar = items.map { case (n, _) =>
      varNum(s"__s_$n", s"__q_$n") }.reduce(_ + _)
    val totVar = varNum("__st", "__qt")
    val ratio = sumItemVar.cast("double") / totVar.cast("double")
    val alpha = lit(k.toDouble / (k - 1.0)) * (lit(1.0) - ratio)
    val ok = col("n") >= 2L && totVar.cast("double") > 0.0
    agg.select(gc ++ Seq(
      col("n"), lit(k).as("k_items"),
      round(when(ok, ratio).otherwise(lit(null).cast("double")), 6)
        .as("var_ratio"),
      round(when(ok, alpha).otherwise(lit(null).cast("double")), 6)
        .as("alpha")): _*)
  }

  /** Fleiss' κ multi-rater agreement per group over k binary raters
    * (detectors) on shared subjects: [[cochranQ]] asks "do the
    * raters' marginal RATES differ?" — this asks the complementary
    * "how much do they AGREE item-by-item beyond chance?" (three
    * detectors can have identical rates and still disagree on every
    * single item; Q reads clean, κ reads 0). For binary categories
    * each subject reduces to s = #raters-flagging: Pᵢ =
    * (s² + (k−s)² − k)/(k(k−1)), P̄ₑ = p₁² + p₀², κ =
    * (P̄ − P̄ₑ)/(1 − P̄ₑ). `substantial` flags κ ≥ 0.61 (the
    * Landis–Koch lower bound for "substantial").
    *
    * Exactness: the only corpus-sized reductions are N, Σs and
    * Σ(s² + (k−s)²) — exact integers (squares in DECIMAL); κ is one
    * mirrored double formula. All-one-category input (1 − P̄ₑ ≤ 0)
    * guards κ to null.
    *
    * Domain note: called on a flagged-UNION frame (the review-queue
    * shape — subjects someone flagged), κ deliberately EXCLUDES the
    * all-quiet subjects that would inflate agreement; state the
    * subject frame when reporting.
    */
  def fleissKappa(
      df: DataFrame, groupCols: Seq[String], rateCols: Seq[String],
      substantialAt: Double = 0.61): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val k = rateCols.size
    val s = rateCols.map(c => col(c).cast("boolean").cast("long"))
      .reduce(_ + _)
    val gc = groupCols.map(col)
    val agg = df
      .select(gc :+ s.as("__s"): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_items"),
        sum(col("__s")).as("__s1"),
        sum(dec(col("__s")) * dec(col("__s")) +
          dec(lit(k.toLong) - col("__s")) *
            dec(lit(k.toLong) - col("__s"))).as("__sq"))
    val nD = col("n_items").cast("double")
    val kD = lit(k.toDouble)
    val pbar = (col("__sq").cast("double") - kD * nD) /
      ((kD * (kD - 1.0)) * nD)
    val p1 = col("__s1").cast("double") / (kD * nD)
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    val kap = (pbar - pe) / (lit(1.0) - pe)
    val kapSafe = when(lit(1.0) - pe <= 0.0 || col("n_items") < 1L,
      lit(null).cast("double")).otherwise(kap)
    agg.select(gc ++ Seq(
      col("n_items"), lit(k).as("n_raters"),
      round(p1, 6).as("p_flag"),
      round(pbar, 6).as("p_bar"),
      round(pe, 6).as("p_e"),
      round(kapSafe, 6).as("kappa"),
      coalesce(kapSafe >= substantialAt, lit(false)).cast("int")
        .as("substantial")): _*)
  }

  /** Durbin–Watson serial-correlation test per group over a bucketed
    * series: after fitting the LINEAR TREND, do the residuals still
    * remember their neighbors? The parametric companion of
    * [[runsTest]] — runs reads sign clumping around the median (trend
    * itself trips it), DW detrends FIRST and then reads lag-1
    * autocorrelation in what remains, so a clean steady drift scores
    * DW ≈ 2 here while a regime oscillation survives the detrend and
    * drags DW toward 0. d = Σ(eᵢ−eᵢ₋₁)²/Σeᵢ², in [0,4]; 2 = no
    * autocorrelation; the flag fires outside [dLo, 4−dLo]
    * (conservative fixed bounds, the classical table's safe side).
    * Also emits the lag-1 residual autocorrelation ρ̂ ≈ 1 − d/2.
    *
    * Exactness: the bucket sums are exact integers; slope and
    * intercept are each ONE mirrored double division of exact
    * HUGEINT/DECIMAL OLS moments; each residual is a per-row double
    * expression of those two scalars (no accumulation), micro-floored
    * to an exact integer BEFORE the Σe² / Σ(Δe)² sums — the
    * quantize-before-sum discipline, so both engines sum identical
    * integers in any order. One final double division for d.
    *
    * Scale: one grouped bucket-sum (bucket-domain-sized), one
    * group-sized OLS join, one bucket-ordered window for the lag —
    * nothing row-sized past the first combine.
    */
  def durbinWatson(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column, dLo: Double = 1.5): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val per = df
      .select(gc ++ Seq(bucketIdx.cast("long").as("__x"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(gc :+ col("__x"): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val ols = per.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(dec(col("__x")) * dec(col("__y"))).as("__sxy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"))
      .withColumn("__den",
        (dec(col("n_buckets")) * col("__sxx") -
          dec(col("__sx")) * dec(col("__sx"))).cast("double"))
      .withColumn("__b",
        (dec(col("n_buckets")) * col("__sxy") -
          dec(col("__sx")) * dec(col("__sy"))).cast("double") /
          col("__den"))
      .withColumn("__a",
        (col("__sy").cast("double") -
          col("__b") * col("__sx").cast("double")) /
          col("n_buckets").cast("double"))
    val res = per.join(
        ols.select(gc ++ Seq(col("n_buckets"), col("__den"),
          col("__b"), col("__a")): _*), groupCols)
      .withColumn("__eq",
        floor((col("__y").cast("double") - col("__a") -
          col("__b") * col("__x").cast("double")) * 1e6)
          .cast("decimal(38,0)"))
    val wb = Window.partitionBy(gc: _*).orderBy(col("__x").asc)
    val agg = res
      .withColumn("__prev", lag(col("__eq"), 1).over(wb))
      .groupBy(gc: _*)
      .agg(first(col("n_buckets")).as("n_buckets"),
        first(col("__den")).as("__den"),
        first(col("__b")).as("__b"),
        sum(col("__eq") * col("__eq")).as("__se2"),
        sum(when(col("__prev").isNotNull,
          (col("__eq") - col("__prev")) * (col("__eq") - col("__prev")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("__sd2"))
    val d = col("__sd2").cast("double") / col("__se2").cast("double")
    val ok = col("n_buckets") >= 3L && col("__den") > 0.0 &&
      col("__se2").cast("double") > 0.0
    val dSafe = when(ok, d).otherwise(lit(null).cast("double"))
    agg.select(gc ++ Seq(
      col("n_buckets"),
      round(when(col("__den") > 0.0, col("__b"))
        .otherwise(lit(null).cast("double")), 6).as("slope"),
      round(dSafe, 6).as("dw"),
      round(when(ok, lit(1.0) - d / 2.0)
        .otherwise(lit(null).cast("double")), 6).as("rho1"),
      coalesce(dSafe < dLo || dSafe > lit(4.0) - dLo, lit(false))
        .cast("int").as("autocorrelated")): _*)
  }

  /** Friedman rank test per group: across b complete blocks (e.g.
    * days), are the k treatments' (e.g. event types') values
    * CONSISTENTLY ordered, after removing every block-level effect?
    * The blocked companion of [[kruskalWallis]] — KW pools all rows
    * and a day-level shift (a campaign day, a fleet outage) reads as
    * fake treatment signal; Friedman ranks WITHIN each block, so
    * anything that moves a whole day cancels by construction.
    *
    * Only complete blocks (all k treatments present) enter — the
    * classical contract; `n_blocks` reports how many survived. Ranks
    * are tie-averaged half-units kept as exact 2·rank integers
    * (rank2 = 2·before + t + 1 off per-(block, value) counts), and
    * the tie-corrected statistic reduces to a ratio of two exact
    * integers in those doubled units:
    * Q = (k−1)·Σⱼ(R2ⱼ − b(k+1))² / (Σᵢⱼ rank2ᵢⱼ² − b·k·(k+1)²),
    * one double division at the end. `differs` compares against the
    * pinned χ²₀.₀₅ critical value for dof = k−1 (dof > 10 → 0).
    *
    * Scale: one grouped sum to (group, block, treatment) cells —
    * block-domain-sized, not row-sized — one within-block window for
    * the ranks, then treatment-cardinality arithmetic. The cell frame
    * is the only shuffle that grows with time, and it grows by one
    * row per (block, treatment).
    */
  def friedmanTest(
      df: DataFrame, groupCols: Seq[String], blockCol: Column,
      catCol: Column, valueCents: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val cells = df
      .select(gc ++ Seq(blockCol.cast("long").as("__b"),
        catCol.as("__cat"), valueCents.cast("long").as("__y")): _*)
      .where(col("__b").isNotNull && col("__cat").isNotNull &&
        col("__y").isNotNull)
      .groupBy(gc ++ Seq(col("__b"), col("__cat")): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val k = cells.groupBy(gc: _*)
      .agg(countDistinct(col("__cat")).as("__k"))
    val complete = cells
      .join(k, groupCols)
      .withColumn("__bk", count(lit(1)).over(
        Window.partitionBy(gc :+ col("__b"): _*)))
      .where(col("__bk") === col("__k"))
    // tie-averaged doubled ranks within each block: per-(block, y)
    // tie counts, then rank2 = 2·(# strictly below) + ties + 1
    val tieC = complete.groupBy(gc ++ Seq(col("__b"), col("__y")): _*)
      .agg(count(lit(1)).as("__t"))
    val wv = Window.partitionBy(gc :+ col("__b"): _*)
      .orderBy(col("__y").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = tieC
      .withColumn("__before", coalesce(sum(col("__t")).over(wv), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__before") + col("__t") + 1L)
    val withRanks = complete
      .join(ranked.select(gc ++ Seq(col("__b"), col("__y"),
        col("__rank2")): _*), groupCols ++ Seq("__b", "__y"))
    val perCat = withRanks
      .groupBy(gc :+ col("__cat"): _*)
      .agg(sum(col("__rank2")).as("__r2"),
        sum(dec(col("__rank2")) * dec(col("__rank2"))).as("__q2"),
        count(lit(1)).as("__bcat"))
    // k and b are needed BEFORE the Σⱼ(R2ⱼ − b(k+1))² sum — one
    // group-sized pass for them, joined back (complete blocks make
    // every category's block count identical, so first() is exact)
    val kb = perCat.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_cats"),
        first(col("__bcat")).as("n_blocks"),
        sum(col("__q2")).as("__sq2"))
    val totals = perCat
      .join(kb, groupCols)
      .withColumn("__dev", dec(col("__r2")) -
        dec(col("n_blocks")) * (dec(col("n_cats")) + lit(1)))
      .groupBy(gc: _*)
      .agg(first(col("n_cats")).as("n_cats"),
        first(col("n_blocks")).as("n_blocks"),
        first(col("__sq2")).as("__sq2"),
        sum(col("__dev") * col("__dev")).as("__num"))
    val b = col("n_blocks").cast("decimal(38,0)")
    val kc = col("n_cats").cast("decimal(38,0)")
    val den = (col("__sq2") - b * kc * (kc + 1) * (kc + 1))
      .cast("double")
    val num = ((kc - 1) * col("__num")).cast("double")
    val qStat = when(col("n_blocks") < 2L || col("n_cats") < 2L ||
        den <= 0.0, lit(null).cast("double"))
      .otherwise(num / den)
    val dof = (col("n_cats") - 1L).cast("int")
    val crit = chi2Crit05.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(dof === d, lit(v)).otherwise(acc)
    }
    totals.select(gc ++ Seq(
      col("n_blocks"), col("n_cats"), dof.as("dof"),
      round(qStat, 6).as("q"),
      coalesce(qStat > crit, lit(false)).cast("int")
        .as("differs")): _*)
  }

  /** Kendall's coefficient of concordance W per group: across b
    * JUDGES (detectors, segments, annotators) each scoring the same
    * k ITEMS, how close is the panel to one shared ranking? The
    * agreement companion of [[friedmanTest]] — Friedman asks "do the
    * items differ at all", W answers "and how concordant are the
    * judges", on the identity W = Q/(b·(k−1)) with Q the
    * tie-corrected Friedman statistic, so W ∈ [0, 1] with 1 = every
    * judge orders the items identically. The multi-judge
    * generalization of the two-rater κ family (q311's Fleiss reads
    * binary flags; W reads full rankings).
    *
    * Only complete judges (all k items scored) enter — the classical
    * complete-block contract shared with [[friedmanTest]]. Exactness,
    * the Friedman scheme verbatim: tie-averaged doubled ranks
    * (rank2 = 2·before + t + 1, exact integers), Σⱼ(R2ⱼ − b(k+1))²
    * and the tie-corrected denominator Σrank2² − b·k·(k+1)² exact in
    * DECIMAL(38,0); W = num/(b·den) and Q = (k−1)·num/den are each
    * ONE double division. `significant` compares Q against the
    * pinned χ²₀.₀₅ critical for dof = k−1.
    *
    * Scale: identical to [[friedmanTest]] — one grouped sum to
    * (group, judge, item) cells, one within-judge window for ranks,
    * item-cardinality arithmetic after.
    */
  def kendallW(
      df: DataFrame, groupCols: Seq[String], judgeCol: Column,
      itemCol: Column, valueCents: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val cells = df
      .select(gc ++ Seq(judgeCol.cast("string").as("__b"),
        itemCol.as("__cat"), valueCents.cast("long").as("__y")): _*)
      .where(col("__b").isNotNull && col("__cat").isNotNull &&
        col("__y").isNotNull)
      .groupBy(gc ++ Seq(col("__b"), col("__cat")): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val k = cells.groupBy(gc: _*)
      .agg(countDistinct(col("__cat")).as("__k"))
    val complete = cells
      .join(k, groupCols)
      .withColumn("__bk", count(lit(1)).over(
        Window.partitionBy(gc :+ col("__b"): _*)))
      .where(col("__bk") === col("__k"))
    val tieC = complete.groupBy(gc ++ Seq(col("__b"), col("__y")): _*)
      .agg(count(lit(1)).as("__t"))
    val wv = Window.partitionBy(gc :+ col("__b"): _*)
      .orderBy(col("__y").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = tieC
      .withColumn("__before", coalesce(sum(col("__t")).over(wv), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__before") + col("__t") + 1L)
    val withRanks = complete
      .join(ranked.select(gc ++ Seq(col("__b"), col("__y"),
        col("__rank2")): _*), groupCols ++ Seq("__b", "__y"))
    val perCat = withRanks
      .groupBy(gc :+ col("__cat"): _*)
      .agg(sum(col("__rank2")).as("__r2"),
        sum(dec(col("__rank2")) * dec(col("__rank2"))).as("__q2"),
        count(lit(1)).as("__bcat"))
    val kb = perCat.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_items"),
        first(col("__bcat")).as("n_judges"),
        sum(col("__q2")).as("__sq2"))
    val totals = perCat
      .join(kb, groupCols)
      .withColumn("__dev", dec(col("__r2")) -
        dec(col("n_judges")) * (dec(col("n_items")) + lit(1)))
      .groupBy(gc: _*)
      .agg(first(col("n_items")).as("n_items"),
        first(col("n_judges")).as("n_judges"),
        first(col("__sq2")).as("__sq2"),
        sum(col("__dev") * col("__dev")).as("__num"))
    val b = col("n_judges").cast("decimal(38,0)")
    val kc = col("n_items").cast("decimal(38,0)")
    val den = (col("__sq2") - b * kc * (kc + 1) * (kc + 1))
      .cast("double")
    val ok = col("n_judges") >= 2L && col("n_items") >= 2L &&
      den > 0.0
    val w = when(ok, col("__num").cast("double") /
      (col("n_judges").cast("double") * den))
    val qStat = when(ok, ((kc - 1) * col("__num")).cast("double") / den)
    val dof = (col("n_items") - 1L).cast("int")
    val crit = chi2Crit05.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(dof === d, lit(v)).otherwise(acc)
    }
    totals.select(gc ++ Seq(
      col("n_judges"), col("n_items"), dof.as("dof"),
      round(w, 6).as("w"),
      round(qStat, 6).as("q"),
      coalesce(qStat > crit, lit(false)).cast("int")
        .as("significant")): _*)
  }

  /** Generalized ESD (Rosner) outlier screen per group: `rounds`
    * iterations of "find the most extreme studentized deviation,
    * report it, remove it, recompute" — the multi-outlier procedure
    * that survives masking (a second outlier inflating the sd that
    * hides the first; one Grubbs pass misses it, the remove-and-
    * recompute rounds don't). Emits the test statistic
    * Rᵢ = max|x − x̄|/s per round with the removed point; comparing
    * against λᵢ criticals needs t-quantiles — a consumer-side table
    * lookup on (n, i), deliberately not baked in.
    *
    * Exactness: the extreme point is chosen by the EXACT integer
    * deviation |x·n − S| (decimal products — no float enters the
    * ordering), ties broken (value, key) for a total order; Rᵢ is one
    * double expression over exact longs/decimals per round.
    *
    * Scale: each round is one grouped aggregate + one broadcast-sized
    * join + one window over the group — `rounds` is a small constant
    * (default 3), so the lazy plan is k stacked single-shuffle passes,
    * the BPE-trainer discipline. Values stay row-sized; no collect.
    */
  def generalizedEsd(
      df: DataFrame, groupCol: String, valueCents: Column,
      keyCol: Column, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds must be in [1, 8]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    var cur = df.select(col(groupCol).as("__g"),
        valueCents.cast("long").as("__v"), keyCol.as("__k"))
      .where(col("__v").isNotNull)
    val outs = (1 to rounds).map { i =>
      val stats = cur.groupBy("__g")
        .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
          sum(dec(col("__v")) * dec(col("__v"))).as("__q"))
      val joined = cur.join(stats, "__g")
        .withColumn("__dev",
          abs(dec(col("__v")) * dec(col("__n")) - dec(col("__s"))))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__g").orderBy(col("__dev").desc,
            col("__v").asc, col("__k").asc)))
      val nD = col("__n").cast("double")
      val sD = col("__s").cast("double")
      val qD = col("__q").cast("double")
      val devD = col("__dev").cast("double")
      val r = (devD / nD) / sqrt((nD * qD - sD * sD) /
        (nD * (nD - lit(1.0d))))
      val top = joined.where(col("__rn") === 1 && col("__n") > 2)
        .select(col("__g"), lit(i.toLong).as("round"), col("__n").as("n"),
          col("__v").as("removed_cents"), round(r, 6).as("r_stat"))
      // NOT checkpointed between rounds on purpose: each round's
      // re-execution of the previous rounds' (group-domain-sized)
      // ranking is cheaper than materializing survivors — measured
      // on q332, where a per-round localCheckpoint DOUBLED the
      // query. Callers with an EXPENSIVE input persist it first
      // (q388 caches its seasonal-decomposition residuals).
      cur = joined.where(col("__rn") =!= 1)
        .select(col("__g"), col("__v"), col("__k"))
      top
    }
    outs.reduce(_ unionByName _)
      .withColumnRenamed("__g", groupCol)
  }

  /** Mood's median test per stratum: do the k samples share a common
    * median? Counts above/not-above the stratum's pooled lower median
    * M (the exact ⌈n/2⌉-th order statistic — no interpolation, so
    * both engines pick the same value) form a k×2 table scored by
    * Pearson's χ² against the margin products. The robust k-sample
    * location read when [[kruskalWallis]]'s rank machinery is more
    * than the question needs — only the side of the median matters,
    * so a 1000× value outlier moves nothing.
    *
    * Exactness: M comes from a distinct-value cumulative count (never
    * a subject-sized sort window); cell counts are exact longs; each
    * cell's (O−E)²/E is nano-floored before the order-free stratum
    * sum and the statistic is EMITTED in exact nano units (the q316
    * boundary lesson — a rational χ² can land exactly on a rounding
    * boundary; the nano integer can't disagree).
    *
    * Scale: one grouped count to the distinct-value frame, one
    * running window over it per stratum, one grouped count per
    * (stratum, sample), then table-sized arithmetic.
    */
  def moodMedianTest(
      df: DataFrame, strataCol: String, sampleCol: Column,
      valueCents: Column): DataFrame = {
    val base = df.select(col(strataCol).as("__s"),
        sampleCol.as("__c"), valueCents.cast("long").as("__v"))
      .where(col("__v").isNotNull && col("__c").isNotNull)
      .transform(graft.core.CacheScope.disk)
    val byVal = base.groupBy("__s", "__v")
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy("__s").orderBy("__v")
    val med = byVal
      .withColumn("__cum",
        sum(col("__cnt")).over(w.rowsBetween(
          Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("__cnt"))
        .over(Window.partitionBy("__s")))
      .where(col("__cum") * 2 >= col("__n") + 1)
      .groupBy("__s")
      .agg(min(col("__v")).as("__m"), max(col("__n")).as("__n"))
    val cells = base.join(med, "__s")
      .groupBy(col("__s"), col("__c"))
      .agg(sum(when(col("__v") > col("__m"), 1L).otherwise(0L))
        .as("__a"),
        sum(when(col("__v") <= col("__m"), 1L).otherwise(0L))
        .as("__b"))
    val margins = cells
      .withColumn("__ca", sum(col("__a"))
        .over(Window.partitionBy("__s")))
      .withColumn("__cb", sum(col("__b"))
        .over(Window.partitionBy("__s")))
      .withColumn("__k", count(lit(1))
        .over(Window.partitionBy("__s")))
    val nD = (col("__ca") + col("__cb")).cast("double")
    val rD = (col("__a") + col("__b")).cast("double")
    def cellNano(o: Column, c: Column): Column = {
      val e = rD * c.cast("double") / nD
      when(e > 0,
        floor(lit(1e9) * (o.cast("double") - e) *
          (o.cast("double") - e) / e).cast("long")).otherwise(lit(0L))
    }
    margins
      .withColumn("__chi", cellNano(col("__a"), col("__ca")) +
        cellNano(col("__b"), col("__cb")))
      .groupBy(col("__s"))
      .agg(max(col("__k")).as("n_samples"),
        max(col("__ca") + col("__cb")).as("n"),
        sum(col("__chi")).as("chi2_nano"))
      .join(med.select(col("__s"), col("__m").as("median_cents")), "__s")
      .select(col("__s").as(strataCol), col("median_cents"),
        col("n_samples"), col("n"), col("chi2_nano"),
        (col("n_samples") - 1L).as("dof"))
  }

  /** Two-proportion power analysis per group: from the observed
    * baseline rate p₁ (exact counts), the required sample size per
    * arm to detect each absolute lift δ at two-sided α = 0.05 with
    * 80% power — n = (z_α·√(2p̄q̄) + z_β·√(p₁q₁ + p₂q₂))² / δ², the
    * standard normal-approximation design formula. The planning
    * companion of [[AnalyticsStatsOps.proportionTest]] (which judges
    * the experiment after the fact): every monitored rate gets a
    * "how long must the A/B run" row before anyone flips a flag.
    *
    * Exactness: p₁ is one division of exact longs; z constants are
    * pinned public literals (1.959964, 0.841621); each n is one fixed
    * double expression → ceil → long (both engines run the identical
    * IEEE sequence). Lifts that would push p₂ past 1 emit null.
    *
    * Scale: one grouped count, then a constant-width literal explode —
    * group-count-sized everything.
    */
  def powerAnalysis(
      df: DataFrame, groupCol: String, successCol: Column,
      lifts: Seq[Double] = Seq(0.01, 0.02, 0.05),
      zAlpha: Double = 1.959964, zBeta: Double = 0.841621): DataFrame = {
    val agg = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("trials"),
        sum(when(successCol.cast("boolean"), 1L).otherwise(0L))
          .as("successes"))
    val p1 = col("successes").cast("double") /
      col("trials").cast("double")
    val lifted = agg.select(col("__g"), col("trials"),
        col("successes"),
        explode(array(lifts.map(lit): _*)).as("lift"))
    val p2 = p1 + col("lift")
    val pBar = (p1 + p2) / lit(2.0d)
    val nArm = ceil(
      (lit(zAlpha) * sqrt(lit(2.0d) * pBar * (lit(1.0d) - pBar)) +
        lit(zBeta) * sqrt(p1 * (lit(1.0d) - p1) +
          p2 * (lit(1.0d) - p2))) *
      (lit(zAlpha) * sqrt(lit(2.0d) * pBar * (lit(1.0d) - pBar)) +
        lit(zBeta) * sqrt(p1 * (lit(1.0d) - p1) +
          p2 * (lit(1.0d) - p2))) /
      (col("lift") * col("lift"))).cast("long")
    lifted.select(col("__g").as(groupCol), col("trials"),
      col("successes"), round(p1, 6).as("baseline_rate"),
      col("lift"),
      when(p2 < 1.0d, nArm).as("n_per_arm"))
  }

  /** Difference-in-differences estimator per group — the
    * observational-causal workhorse [[cuped]]'s experiment shelf
    * lacks: when assignment was NOT randomized (a feature shipped to
    * one cohort, a policy changed on one date), the treated group's
    * pre→post change is corrected by the control group's pre→post
    * change, so any shared trend (seasonality, inflation, product
    * growth) cancels and what remains estimates the treatment
    * effect — under the parallel-trends assumption, which is why the
    * four cell means are emitted for inspection, not just the
    * difference.
    *
    * Exactness: the four (treat × post) cells aggregate to exact
    * BIGINT sums/counts; each mean is ONE mirrored double division,
    * and `did = (m_t1 − m_t0) − (m_c1 − m_c0)` is a fixed-order
    * double expression over the four — bit-identical cross-engine.
    * A group missing any cell reports null did (no counterfactual to
    * difference). One grouped aggregate, map-side combined; output
    * is group-domain-sized.
    *
    * Returns `(group…, n_ctl_pre, n_ctl_post, n_treat_pre,
    * n_treat_post, mean_ctl_pre, mean_ctl_post, mean_treat_pre,
    * mean_treat_post, did)` (means and did in the value's units,
    * rounded to 4).
    */
  def diffInDiff(
      df: DataFrame, groupCols: Seq[String], treat: Column,
      post: Column, valueCents: Column): DataFrame = {
    val gc = groupCols.map(col)
    val base = df.select(gc ++ Seq(treat.cast("boolean").as("__t"),
        post.cast("boolean").as("__p"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__t").isNotNull && col("__p").isNotNull &&
        col("__y").isNotNull)
    def cellN(t: Boolean, p: Boolean): Column =
      sum(when(col("__t") === t && col("__p") === p, 1L)
        .otherwise(0L))
    def cellS(t: Boolean, p: Boolean): Column =
      sum(when(col("__t") === t && col("__p") === p, col("__y"))
        .otherwise(0L))
    val agg = base.groupBy(gc: _*).agg(
      cellN(t = false, p = false).as("n_ctl_pre"),
      cellN(t = false, p = true).as("n_ctl_post"),
      cellN(t = true, p = false).as("n_treat_pre"),
      cellN(t = true, p = true).as("n_treat_post"),
      cellS(t = false, p = false).as("__s_c0"),
      cellS(t = false, p = true).as("__s_c1"),
      cellS(t = true, p = false).as("__s_t0"),
      cellS(t = true, p = true).as("__s_t1"))
    def mean(s: String, n: String): Column =
      col(s).cast("double") / col(n).cast("double")
    val complete = col("n_ctl_pre") > 0L && col("n_ctl_post") > 0L &&
      col("n_treat_pre") > 0L && col("n_treat_post") > 0L
    val did = (mean("__s_t1", "n_treat_post") -
      mean("__s_t0", "n_treat_pre")) -
      (mean("__s_c1", "n_ctl_post") - mean("__s_c0", "n_ctl_pre"))
    agg.select(gc ++ Seq(
      col("n_ctl_pre"), col("n_ctl_post"), col("n_treat_pre"),
      col("n_treat_post"),
      round(when(col("n_ctl_pre") > 0L,
        mean("__s_c0", "n_ctl_pre")), 4).as("mean_ctl_pre"),
      round(when(col("n_ctl_post") > 0L,
        mean("__s_c1", "n_ctl_post")), 4).as("mean_ctl_post"),
      round(when(col("n_treat_pre") > 0L,
        mean("__s_t0", "n_treat_pre")), 4).as("mean_treat_pre"),
      round(when(col("n_treat_post") > 0L,
        mean("__s_t1", "n_treat_post")), 4).as("mean_treat_post"),
      round(when(complete, did), 4).as("did")): _*)
  }

  /** Page's L trend test per group — [[friedmanTest]]'s ORDERED
    * alternative: Friedman asks "do the k treatments differ at
    * all?"; Page asks "do they increase in a PRE-SPECIFIED dose
    * order?" (`L = Σ_j j·R_j` over within-block treatment ranks,
    * dose index j from `doseCol`'s natural order), which has far
    * more power when the alternative is monotone — price tiers,
    * model-size ladders, dosage steps. Only blocks containing every
    * dose participate (the Friedman completeness rule).
    *
    * Exactness: ranks are tie-averaged HALF-UNIT integers (the
    * doubled-rank device shared with [[friedmanTest]]), so
    * `L2 = Σ j·R2_j` and `E2 = b·k(k+1)²/2` are exact BIGINTs
    * (`k(k+1)²` is always even); the z statistic
    * `(L2 − E2) / (2·√(b·k²(k+1)(k²−1)/144))` is one mirrored double
    * chain over exact integers (the no-tie variance, the standard
    * practice under light ties). `increasing` flags z > zCrit.
    *
    * Scale shape: one (group, block, dose)-grained aggregate, the
    * [[friedmanTest]] tie-rank windows over block-sized frames, one
    * group-sized reduce. Returns `(group…, n_blocks, n_doses, l2,
    * z, increasing)`.
    */
  def pageTrendTest(
      df: DataFrame, groupCols: Seq[String], blockCol: Column,
      doseCol: Column, valueCents: Column,
      zCrit: Double = 1.645): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val cells = df
      .select(gc ++ Seq(blockCol.cast("long").as("__b"),
        doseCol.cast("long").as("__dose"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__b").isNotNull && col("__dose").isNotNull &&
        col("__y").isNotNull)
      .groupBy(gc ++ Seq(col("__b"), col("__dose")): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val k = cells.groupBy(gc: _*)
      .agg(countDistinct(col("__dose")).as("__k"))
    val complete = cells
      .join(k, groupCols)
      .withColumn("__bk", count(lit(1)).over(
        Window.partitionBy(gc :+ col("__b"): _*)))
      .where(col("__bk") === col("__k"))
    // dose index j = rank of the dose among the group's distinct
    // doses (domain-sized window)
    val doseIdx = complete.select(gc :+ col("__dose"): _*).distinct()
      .withColumn("__j", row_number().over(
        Window.partitionBy(gc: _*).orderBy(col("__dose").asc)))
    // tie-averaged doubled ranks within each block (the friedmanTest
    // device)
    val tieC = complete
      .groupBy(gc ++ Seq(col("__b"), col("__y")): _*)
      .agg(count(lit(1)).as("__t"))
    val wv = Window.partitionBy(gc :+ col("__b"): _*)
      .orderBy(col("__y").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = tieC
      .withColumn("__before",
        coalesce(sum(col("__t")).over(wv), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__before") + col("__t")
        + 1L)
    val withRanks = complete
      .join(ranked.select(gc ++ Seq(col("__b"), col("__y"),
        col("__rank2")): _*), groupCols ++ Seq("__b", "__y"))
      .join(doseIdx, groupCols :+ "__dose")
    val totals = withRanks.groupBy(gc: _*)
      .agg(countDistinct(col("__b")).as("n_blocks"),
        max(col("__k")).as("n_doses"),
        sum(dec(col("__j")) * dec(col("__rank2"))).as("__l2"))
    val b = col("n_blocks").cast("double")
    val kd = col("n_doses").cast("double")
    val e2 = (dec(col("n_blocks")) * dec(col("n_doses")) *
      (dec(col("n_doses")) + lit(1)) * (dec(col("n_doses")) + lit(1)))
      .cast("double") / 2.0
    val varL = b * kd * kd * (kd + 1.0) * (kd * kd - 1.0) / 144.0
    val z = (col("__l2").cast("double") - e2) /
      (lit(2.0) * sqrt(varL))
    val ok = col("n_blocks") >= 2L && col("n_doses") >= 3L
    totals.select(gc ++ Seq(
      col("n_blocks"), col("n_doses"),
      col("__l2").cast("long").as("l2"),
      round(when(ok, z), 6).as("z"),
      when(ok, (z > zCrit).cast("int")).otherwise(lit(null)
        .cast("int")).as("increasing")): _*)
  }

  /** UCB1 allocation scores per group — the deterministic bandit
    * policy next to the [[msprtMonitor]]/[[powerAnalysis]] shelf:
    * given each arm's pull count and mean reward, the next pull goes
    * to `argmax mean_i + c·√(2·ln N / n_i)` (Auer et al. 2002) — the
    * optimism bonus shrinks as an arm is explored, so allocation
    * shifts from exploration to exploitation with a proven
    * logarithmic regret bound. Unlike Thompson sampling it needs NO
    * randomness, which is what makes it replayable from warehouse
    * counts: this operator IS the policy, computed from the event
    * log. `scaleCents` calibrates the bonus to the reward's range
    * (UCB1's [0,1] theory scaled to cents). The arm domain IS the
    * observed event log: arms are derived by grouping the events, so
    * every emitted arm has `n_pulls >= 1` by construction. An arm
    * that has never been pulled simply does not appear — callers who
    * need the canonical play-each-arm-once initialization must seed
    * the log with one row per arm before calling this (the
    * null-score guard below is defensive only and cannot fire on
    * the grouped domain).
    *
    * Exactness: counts/sums exact; mean is one mirrored double
    * division; the bonus is a fixed-order mirrored double chain
    * (ln and √ correctly rounded on both engines); the argmax
    * row_number orders by the shared score double with an arm-name
    * tie-break. Returns `(group…, arm, n_pulls, mean_reward,
    * ucb_score, chosen)` — one `chosen = 1` row per group.
    */
  def ucb1Allocation(
      df: DataFrame, groupCols: Seq[String], armCol: Column,
      rewardCents: Column, scaleCents: Double): DataFrame = {
    val gc = groupCols.map(col)
    val per = df
      .select(gc ++ Seq(armCol.cast("string").as("arm"),
        rewardCents.cast("long").as("__y")): _*)
      .where(col("arm").isNotNull && col("__y").isNotNull)
      .groupBy(gc :+ col("arm"): _*)
      .agg(count(lit(1)).as("n_pulls"), sum(col("__y")).as("__s"))
    val wAll = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val withN = per.withColumn("__bign",
      sum(col("n_pulls")).over(wAll))
    val mean = col("__s").cast("double") / col("n_pulls")
      .cast("double")
    val score = mean + lit(scaleCents) *
      sqrt(lit(2.0) * log(col("__bign").cast("double")) /
        col("n_pulls").cast("double"))
    val scored = withN
      .withColumn("mean_reward", round(mean, 4))
      .withColumn("__score", when(col("n_pulls") > 0L, score))
    val pick = row_number().over(Window.partitionBy(gc: _*)
      .orderBy(col("__score").desc_nulls_first, col("arm").asc))
    scored.select(gc ++ Seq(col("arm"), col("n_pulls"),
      col("mean_reward"),
      round(col("__score"), 4).as("ucb_score"),
      (pick === 1).cast("int").as("chosen")): _*)
  }

  /** Stratified inverse-propensity-weighted (IPW) treatment-effect
    * estimate — the workhorse observational-causal estimator next to
    * [[diffInDiff]]: within each confounder stratum the propensity is
    * the exact treated share ê_s = n1_s/n_s, and the Hájek-normalized
    * IPW means are
    *   μ̂₁ = Σ_s Σ_{treated}(y/ê_s) / Σ_s Σ_{treated}(1/ê_s),
    *   μ̂₀ the control mirror on 1−ê_s.
    * With stratum-constant propensities the weighted sums collapse
    * exactly: Σ_{treated∈s} y/ê_s = sy1_s·n_s/n1_s and the Hájek
    * denominator telescopes to Σ_s n_s — so the estimator computes as
    * per-stratum exact integer contributions with NO per-row weight
    * float, and (by that same collapse) coincides with the classic
    * stratification estimator Σ n_s·(ȳ1_s − ȳ0_s)/N. Positivity is
    * enforced structurally: strata with no treated or no control rows
    * can't contribute (their weight is undefined) and are emitted
    * with `in_support = 0` so the analyst sees what the estimate
    * ignores.
    *
    * Output: one row per stratum — (stratum, n, n1, e_micro,
    * mu1_cents, mu0_cents, ate_cents, in_support) where the mus are
    * exact floor divisions of stratum sums — plus one `__ALL` row
    * whose mus are the Hájek-IPW estimates over the supported strata
    * (T1 = Σ sy1·n div n1 quantized per stratum BEFORE the sum, the
    * house quantize-before-sum discipline) and whose ate_cents is
    * their exact difference.
    *
    * Scale: one grouped pass builds the (stratum) cells — map-side
    * combined, cell-domain-sized everything after; the `__ALL` row is
    * a cell-domain aggregation. No window, no join against the corpus.
    */
  def ipwAte(
      df: DataFrame, strataCols: Seq[String], treated: Column,
      yCents: Column): DataFrame = {
    require(strataCols.nonEmpty, "ipwAte: need at least one stratum column")
    val stratum = concat_ws("|",
      strataCols.map(c => coalesce(col(c).cast("string"), lit("null"))): _*)
    val cells = df
      .select(stratum.as("stratum"),
        treated.cast("boolean").as("__t"),
        yCents.cast("long").as("__y"))
      .where(col("__t").isNotNull && col("__y").isNotNull)
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__sy1"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__sy0"))
      .withColumn("n0", col("n") - col("n1"))
      .withColumn("in_support",
        (col("n1") > 0L && col("n0") > 0L).cast("int"))
    val per = cells.select(col("stratum"), col("n"), col("n1"),
      expr("(n1 * 1000000) div n").as("e_micro"),
      when(col("n1") > 0L, expr("__sy1 div n1")).as("mu1_cents"),
      when(col("n0") > 0L, expr("__sy0 div n0")).as("mu0_cents"),
      when(col("in_support") === 1,
        expr("(__sy1 div n1) - (__sy0 div n0)")).as("ate_cents"),
      col("in_support"))
    // per-stratum contributions in DECIMAL(38,0): sy1·n at petabyte
    // stratum sizes overflows BIGINT long before the cells do
    val total = cells.where(col("in_support") === 1)
      .agg(sum(col("n")).as("__nt"),
        sum(col("n1")).as("__n1t"),
        sum(expr("(CAST(__sy1 AS DECIMAL(38,0)) * n) div n1"))
          .as("__t1"),
        sum(expr("(CAST(__sy0 AS DECIMAL(38,0)) * n) div n0"))
          .as("__t0"))
      .select(lit("__ALL").as("stratum"), col("__nt").as("n"),
        col("__n1t").as("n1"),
        expr("(__n1t * 1000000) div __nt").as("e_micro"),
        expr("CAST(__t1 div __nt AS BIGINT)").as("mu1_cents"),
        expr("CAST(__t0 div __nt AS BIGINT)").as("mu0_cents"),
        expr("CAST((__t1 div __nt) - (__t0 div __nt) AS BIGINT)")
          .as("ate_cents"),
        lit(1).as("in_support"))
    per.unionByName(total).orderBy("stratum")
  }

  /** Iterative proportional fitting (IPF / raking, Deming & Stephan
    * 1940): calibrate a sample's (row × column) cell weights so the
    * weighted margins match caller-supplied population targets — the
    * survey-weighting standard, and the training-data-mixture tool
    * for "reweight my sample so source × language margins match the
    * target recipe" next to [[graft.sampling.Sampling.mixture]].
    * Alternating half-steps scale each row band to its row target,
    * then each column band to its column target; the procedure
    * converges geometrically to the max-entropy table with the
    * required margins whenever the sample supports them.
    *
    * Exact micro fixed-point (the q369 iteration discipline): weights
    * live in micro units, every half-step is
    * `w' = (w · target · 1e6) div Σw_band` computed in DECIMAL(38,0)
    * (petabyte band sums overflow BIGINT) and floored back to a micro
    * long — bit-identical cross-engine, so an unrolled-CTE oracle
    * replays the whole iteration. After the final (column) half-step
    * the column margins are exact to one floor residue per cell; row
    * margins carry the usual IPF iteration error.
    *
    * Scale shape: ONE grouped pass builds the cell table; every
    * iteration after is cell-domain-sized (a band-keyed grouped sum +
    * two broadcast-able margin joins per half-step), checkpointed per
    * half-step so the plan depth stays constant. Margins must cover
    * the sample's levels (inner joins — an uncovered level is a
    * caller error surfaced by the cell disappearing, pinned in spec).
    */
  def ipfRaking(
      sample: DataFrame, rowCol: String, colCol: String,
      rowMargins: DataFrame, colMargins: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "ipfRaking: iters must be >= 1")
    val cells0 = sample
      .where(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("n_sample"))
      .withColumn("__w", col("n_sample") * lit(1000000L))
    val rm = broadcast(rowMargins
      .select(col(rowCol), col("target").cast("long").as("__rt")))
    val cm = broadcast(colMargins
      .select(col(colCol), col("target").cast("long").as("__ct")))
    var cells = cells0.join(rm, Seq(rowCol)).join(cm, Seq(colCol))
      .localCheckpoint(true)
    for (_ <- 1 to iters; axis <- Seq(rowCol, colCol)) {
      val t = if (axis == rowCol) "__rt" else "__ct"
      val sums = cells.groupBy(col(axis))
        .agg(sum(col("__w").cast("decimal(38,0)")).as("__sm"))
      cells = cells.join(sums, Seq(axis))
        .withColumn("__w", expr(
          s"CAST((CAST(__w AS DECIMAL(38,0)) * $t * 1000000) " +
            "div __sm AS BIGINT)"))
        .drop("__sm")
        .localCheckpoint(true)
    }
    cells.select(col(rowCol), col(colCol), col("n_sample"),
      col("__w").as("w_micro"),
      round(col("__w").cast("double") /
        (col("n_sample").cast("double") * 1e6), 6).as("weight_ratio"))
  }

  /** Hodges–Lehmann shift estimator per group: the MEDIAN of all
    * pairwise differences b − a between two samples — the robust
    * "how much did the level move" companion to the Mann–Whitney
    * test (q237 says WHETHER it moved; this says BY HOW MUCH, in the
    * original units, immune to the outliers that drag a
    * difference-of-means). Exact end to end: differences are exact
    * longs and the median is the house ⌈(n+1)/2⌉-th order statistic
    * (the q333 device: first value whose doubled cumulative count
    * reaches n+1 — the upper median on even counts) over the grouped
    * difference distribution — no floats anywhere.
    *
    * Caller contract (the pair discipline): input rows must be
    * DOMAIN-BOUNDED cells — daily/bucket aggregates, never raw
    * events — because the per-group pair frame is |A|·|B|. The join
    * itself is group-keyed; the caller bounds the blow-up by what it
    * aggregates first (the q333/q178 shape).
    */
  def hodgesLehmannShift(
      df: DataFrame, groupCols: Seq[String], sideB: Column,
      valueCents: Column): DataFrame = {
    val gc = groupCols.map(col)
    val base = df.select(gc ++ Seq(sideB.cast("boolean").as("__sb"),
        valueCents.cast("long").as("__v")): _*)
      .where(col("__sb").isNotNull && col("__v").isNotNull)
    val a = base.where(!col("__sb"))
      .select(gc :+ col("__v").as("__va"): _*)
    val b = base.where(col("__sb"))
      .select(gc :+ col("__v").as("__vb"): _*)
    val diffs = a.join(b, groupCols)
      .groupBy(gc :+ (col("__vb") - col("__va")).as("__d"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(gc: _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gc: _*)
    val hl = diffs
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__np", sum(col("__c")).over(wAll))
      .where(col("__cum") * 2 >= col("__np") + 1)
      .groupBy(gc: _*)
      .agg(min(col("__d")).as("hl_shift_cents"),
        max(col("__np")).as("n_pairs"))
    val sizes = base.groupBy(gc: _*)
      .agg(sum(when(!col("__sb"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__sb"), 1L).otherwise(0L)).as("n_b"))
    sizes.join(hl, groupCols, "left")
      .select(gc ++ Seq(col("n_a"), col("n_b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("hl_shift_cents")): _*)
  }
}
