package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two snapshots of the same
  * column — the "did this feed change shape since last load?" check a
  * pipeline runs before trusting new data (the ML-ops twin of the
  * schema-level `tableDiff`).
  *
  * Method: Population Stability Index over baseline-quantile bins.
  * The BASELINE's exact interpolated quantiles define `bins` buckets
  * (so the baseline distribution is ~uniform across them by
  * construction); both snapshots are counted into those buckets and
  * PSI = Σ (p_c − p_b)·ln(p_c / p_b). Bucket shares are
  * Laplace-smoothed — (n + 0.5) / (N + bins/2) — so an empty bucket
  * contributes a large-but-finite term instead of ±∞. Conventional
  * reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift.
  *
  * Determinism: bin edges are rounded to 4 decimals before binning
  * (an interpolated edge that IS a data value survives rounding
  * exactly, and between-value edges can't collide with data on a
  * coarser grid), and the bucket rule is `edges_below(x) = #{e : x ≥
  * e}` — reproducible across engines bit-for-bit.
  *
  * Scale: one aggregation on the baseline for the edges (the ≤
  * bins−1 doubles pass through the driver as literals, like the Bloom
  * bytes), then one narrow grouped count per snapshot. Nothing wider
  * than (bin, count) ever shuffles. Edges default to
  * `percentile_approx` (Greenwald–Khanna sketch: bounded aggregation
  * state — the whole baseline column lands in ONE aggregate group
  * here, so the exact percentile's every-value buffer is the one
  * shape that cannot survive a 100 TB baseline; rank error ≤
  * n/approxAccuracy, edges are actual data values). `exact = true`
  * swaps in the exact interpolated `percentile` for moderate
  * baselines and cross-engine oracle checks.
  */
object Drift {

  /** Per-bin drift report: (`bin`, `n_base`, `n_cur`, `p_base`,
    * `p_cur`, `psi_term`), bins 0..bins−1; Σ psi_term is the PSI.
    * Null values are excluded from both sides (they are a
    * completeness concern, not a distribution one).
    */
  def psiBins(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      bins: Int = 10, exact: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    val quant =
      if (exact) percentile(col(valueCol), typedlit(probs))
      else percentile_approx(col(valueCol), typedlit(probs),
        lit(approxAccuracy))
    val edgesRaw = baseline
      .where(col(valueCol).isNotNull)
      .agg(quant.cast("array<double>").as("__e"))
      .head().getSeq[Double](0)
    require(edgesRaw != null,
      s"baseline has no non-null '$valueCol' values — no quantile " +
        "edges to bin against")
    val edges = edgesRaw
      .map(e => BigDecimal(e).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    def binOf(c: Column): Column = edges
      .map(e => when(c >= lit(e), 1).otherwise(0))
      .reduce(_ + _)
    def counts(df: DataFrame, as: String) = df
      .where(col(valueCol).isNotNull)
      .select(binOf(col(valueCol)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(as))
    val spark = baseline.sparkSession
    import scala.jdk.CollectionConverters._
    val allBins = spark.createDataFrame(
      (0 until bins).map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.IntegerType))))
    // persisted: the totals action below AND the returned result both
    // read it — without persist each snapshot's grouped count runs
    // twice (the repo's multi-consumer convention)
    val joined = graft.core.CacheScope.disk(allBins
      .join(counts(baseline, "n_base"), Seq("bin"), "left")
      .join(counts(current, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur")))
    val tot = joined.agg(
      sum("n_base").as("__tb"), sum("n_cur").as("__tc")).head()
    val (tb, tc) = (tot.getLong(0), tot.getLong(1))
    val half = lit(0.5)
    val pB = (col("n_base").cast("double") + half) /
      lit(tb.toDouble + 0.5 * bins)
    val pC = (col("n_cur").cast("double") + half) /
      lit(tc.toDouble + 0.5 * bins)
    joined
      .withColumn("p_base", round(pB, 6))
      .withColumn("p_cur", round(pC, 6))
      .withColumn("psi_term", round((pC - pB) * log(pC / pB), 6))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group — the
    * distribution-level drift test PSI's fixed bins can miss (a shift
    * entirely inside one bin moves no bin share but moves the KS
    * supremum): D = sup_x |F_base(x) − F_cur(x)|, with the flag
    * `drifted` = [D exceeds the asymptotic α-threshold
    * c(α)·√((n1+n2)/(n1·n2))].
    *
    * Exactness: D is computed SCALED — D·n1·n2 = max over distinct
    * values of |i·n2 − j·n1| where i, j are inclusive cumulative
    * counts — so the supremum and its argmax are exact BIGINT
    * arithmetic, engine- and partition-independent; the single final
    * division (and the threshold compare) are the only floats. Ties
    * across samples are handled correctly by construction: cumulative
    * counts advance per DISTINCT value with both samples'
    * contributions applied together.
    *
    * Scale: per-(group, value) pre-aggregation collapses duplicate
    * values map-side; the cumulative window runs over DISTINCT values
    * per group (bounded by value cardinality, not row count); one
    * shuffle on the group key. Output: (group, n_base, n_cur,
    * ks_scaled, ks_d, threshold, drifted).
    */
  /** Per-(group, DISTINCT value) two-snapshot counts — the shared
    * sufficient statistic of the whole two-sample family ([[ksTest]],
    * [[cvmTest]], [[mannWhitneyU]] all start here): `__cb` baseline
    * rows at the value, `__cc` current rows. Collapses duplicates
    * map-side; output is bounded by value cardinality, not row count.
    */
  private def pairedCounts(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    val tag = (df: DataFrame, b: Int) => df
      .where(col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        col(valueCol).cast("double").as("__v"), lit(b).as("__b")): _*)
    tag(baseline, 1).unionByName(tag(current, 0))
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__b")).cast("long").as("__cb"),
        sum(lit(1) - col("__b")).cast("long").as("__cc"))
  }

  def ksTest(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], cAlpha: Double = 1.358): DataFrame =
    ksTestCore(
      pairedCounts(baseline, current, valueCol, groupCols),
      groupCols, cAlpha)

  private def ksTestCore(
      per: DataFrame, groupCols: Seq[String],
      cAlpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // group totals ride the SAME exchange as the running sums (an
    // unordered full-partition frame needs no extra shuffle or join)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = per
      .withColumn("__i", sum(col("__cb")).over(w))
      .withColumn("__j", sum(col("__cc")).over(w))
      .withColumn("__n1", sum(col("__cb")).over(wAll))
      .withColumn("__n2", sum(col("__cc")).over(wAll))
    val agg = cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n1")).as("n_base"), max(col("__n2")).as("n_cur"),
        max(abs(col("__i") * col("__n2") - col("__j") * col("__n1")))
          .as("ks_scaled"))
    // a group present in only ONE of baseline/current has n_base or
    // n_cur = 0: D is undefined (0/0), but the signal is the
    // strongest drift there is — flag it rather than letting the
    // null division silently un-flag it
    val oneSided = col("n_base") === 0L || col("n_cur") === 0L
    val ksD = col("ks_scaled").cast("double") /
      (col("n_base") * col("n_cur"))
    val thr = lit(cAlpha) * sqrt((col("n_base") + col("n_cur"))
      .cast("double") / (col("n_base") * col("n_cur")))
    agg.select(groupCols.map(col) ++ Seq(
      col("n_base"), col("n_cur"), col("ks_scaled"),
      when(oneSided, lit(null).cast("double")).otherwise(ksD)
        .as("ks_d"),
      when(oneSided, lit(null).cast("double")).otherwise(thr)
        .as("threshold"),
      when(oneSided, lit(true)).otherwise(ksD > thr).as("drifted")): _*)
  }

  /** Exact two-sample Cramér–von Mises statistic per group — the
    * third member of the drift family: where [[ksTest]] reads only
    * the single worst CDF gap and [[mannWhitneyU]] only a location
    * shift, CvM integrates the SQUARED gap over the whole pooled
    * sample, so it flags distributed, many-small-gaps drift both
    * siblings under-read (e.g. a variance change symmetric about the
    * median). `T = n·m/(n+m)² · Σ_points (F_n(x) − G_m(x))²`, flagged
    * against the asymptotic α = 0.05 critical value 0.461 by default.
    *
    * Exactness: the per-distinct-value gap is the exact integer
    * `D = i·m − j·n` (inclusive cumulative counts, the ksTest shape),
    * and `Σ t·D²` accumulates in DECIMAL(38,0), so
    * `T = Σ t·D² / (n·m·(n+m)²)` is ONE double division of exact
    * decimals — bit-identical cross-engine. Bound: `t·D² ≤ n³m²`
    * stays inside 38 digits for groups up to ~10⁷ rows per side
    * (past that the decimal overflows to null rather than misreads —
    * size drift windows, not lifetime corpora, into a single group).
    *
    * Scale shape and one-sided contract identical to [[ksTest]]:
    * per-(group, value) map-side counts, one running window over
    * DISTINCT values, one grouped aggregate; one-sided groups flag
    * `drifted` with null T.
    *
    * Returns `(group…, n_base, n_cur, cvm_t, drifted)`.
    */
  def cvmTest(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], threshold: Double = 0.461): DataFrame =
    cvmTestCore(
      pairedCounts(baseline, current, valueCol, groupCols),
      groupCols, threshold)

  private def cvmTestCore(
      per: DataFrame, groupCols: Seq[String],
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val cum = per
      .withColumn("__i", sum(col("__cb")).over(w))
      .withColumn("__j", sum(col("__cc")).over(w))
      .withColumn("__n1", sum(col("__cb")).over(wAll))
      .withColumn("__n2", sum(col("__cc")).over(wAll))
    val gap = dec(col("__i")) * dec(col("__n2")) -
      dec(col("__j")) * dec(col("__n1"))
    val agg = cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n1")).as("n_base"), max(col("__n2")).as("n_cur"),
        sum(dec(col("__cb") + col("__cc")) * gap * gap).as("__s"))
    val n1 = col("n_base")
    val n2 = col("n_cur")
    val oneSided = n1 === 0L || n2 === 0L
    val denom = (dec(n1) * dec(n2) * dec(n1 + n2) * dec(n1 + n2))
      .cast("double")
    val t = col("__s").cast("double") / denom
    agg.select(groupCols.map(col) ++ Seq(
      n1, n2,
      when(oneSided, lit(null).cast("double"))
        .otherwise(round(t, 6)).as("cvm_t"),
      when(oneSided, lit(true)).otherwise(t > threshold)
        .as("drifted")): _*)
  }

  /** Anderson–Darling two-sample test between two snapshots, per
    * group — the third member of the ECDF-gap family and the
    * TAIL-WEIGHTED one: KS reads the single worst gap (center-heavy
    * by construction), CvM integrates the squared gap uniformly,
    * AD divides each gap by B(N−B) so the SAME absolute gap counts
    * ~N²/4 ÷ B(N−B) times more in the tails — the alarm for a feed
    * whose body is stable while its extremes quietly shift (price
    * caps, outlier filters, truncation bugs). Discrete/tied form
    * (Scholz–Stephens 1987, k = 2): A² = Σⱼ lⱼ·(N·Mⱼ − n₁·Bⱼ)² /
    * (Bⱼ(N−Bⱼ)) / (n₁n₂) over distinct pooled values (the last
    * block, B = N, contributes zero and is excluded). Under H₀
    * E[A²] = 1; `drifted` compares against `threshold` (default
    * 2.492, the asymptotic 5% point of the one-sample A² law — the
    * standard conservative proxy for k = 2).
    *
    * Exactness: Mⱼ/Bⱼ/lⱼ and the gap numerator are exact DECIMAL
    * integers off the shared per-(group, distinct value) count frame;
    * each term's one division is micro-floored to an integer BEFORE
    * the order-free sum (quantize-before-sum — the numerator square
    * passes 2^53, so the term is double-rounded identically on both
    * engines), then one mirrored double division by n₁n₂.
    * One-sided groups (a snapshot empty) report null A² and
    * drifted = true, the [[ksTest]] contract.
    *
    * Scale shape, identical to [[ksTest]]/[[cvmTest]]: per-(group,
    * value) counts map-side combined, one running sum over DISTINCT
    * values, one group-sized aggregate.
    */
  /** Exact two-sample 1-Wasserstein (earth-mover) distance per
    * group — the fourth member of the ECDF-gap family, and the one
    * in VALUE units: [[ksTest]] reads the single worst gap,
    * [[cvmTest]]/[[adTest]] integrate squared gaps over the pooled
    * COUNT measure, W₁ integrates |F_n − G_m| over the VALUE axis
    * (`W₁ = ∫|F_n(x) − G_m(x)|dx = Σ_k |F(v_k) − G(v_k)| ·
    * (v_{k+1} − v_k)` over sorted distinct pooled values), so its
    * magnitude is directly actionable — "the average row moved 124
    * cents" — which makes it the standard distribution-shift metric
    * for training-data monitoring where "did it drift" needs a
    * units-bearing answer, not a p-value.
    *
    * Exactness: `valueCol` must be integer-valued (cents, micros —
    * the caller quantizes; fractional values still compute but lose
    * the cross-engine guarantee). The per-segment term is the exact
    * integer `|i·m − j·n| · Δv` accumulated in DECIMAL(38,0) (i, j
    * inclusive cumulative counts, the [[ksTest]] shape; Δv the gap
    * to the NEXT distinct value, so the final segment contributes
    * zero by construction — there i·m = j·n), and `W₁ = Σ/(n·m)` is
    * ONE double division of exact decimals — bit-identical
    * cross-engine. Bound: `|i·m − j·n|·Δv ≤ n·m·range`, inside 38
    * digits for any realistic snapshot (10⁹ rows a side over a
    * 10¹²-unit range still fits).
    *
    * No distribution-free null law exists for W₁ (its scale is the
    * data's), so `drifted` compares against a caller-set `threshold`
    * in the SAME units as the value column — the business bar ("alarm
    * past 50 cents"), which is exactly how W₁ is used in production
    * monitors. One-sided groups (a snapshot empty) report null W₁
    * and drifted = true, the [[ksTest]] contract.
    *
    * Scale shape identical to [[ksTest]]: per-(group, value) counts
    * map-side combined, one ordered window over DISTINCT values per
    * group (`lead` supplies Δv on the same sort), one group-sized
    * aggregate. Returns `(group…, n_base, n_cur, w1, drifted)`.
    */
  def wassersteinTest(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val per = pairedCounts(baseline, current, valueCol, groupCols)
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
    val w = wOrd
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val cum = per
      .withColumn("__i", sum(col("__cb")).over(w))
      .withColumn("__j", sum(col("__cc")).over(w))
      .withColumn("__n1", sum(col("__cb")).over(wAll))
      .withColumn("__n2", sum(col("__cc")).over(wAll))
      .withColumn("__dv", lead(col("__v"), 1).over(wOrd) - col("__v"))
    val gap = dec(col("__i")) * dec(col("__n2")) -
      dec(col("__j")) * dec(col("__n1"))
    val agg = cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n1")).as("n_base"), max(col("__n2")).as("n_cur"),
        sum(when(col("__dv").isNotNull, abs(gap) * dec(col("__dv")))
          .otherwise(dec(lit(0)))).as("__s"))
    val n1 = col("n_base")
    val n2 = col("n_cur")
    val oneSided = n1 === 0L || n2 === 0L
    val w1 = col("__s").cast("double") /
      (dec(n1) * dec(n2)).cast("double")
    agg.select(groupCols.map(col) ++ Seq(
      n1, n2,
      when(oneSided, lit(null).cast("double"))
        .otherwise(round(w1, 6)).as("w1"),
      when(oneSided, lit(true)).otherwise(w1 > threshold)
        .as("drifted")): _*)
  }

  def adTest(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], threshold: Double = 2.492): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val per = pairedCounts(baseline, current, valueCol, groupCols)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val cum = per
      .withColumn("__i", sum(col("__cb")).over(w))
      .withColumn("__j", sum(col("__cc")).over(w))
      .withColumn("__n1", sum(col("__cb")).over(wAll))
      .withColumn("__n2", sum(col("__cc")).over(wAll))
      .withColumn("__bt", col("__i") + col("__j"))
      .withColumn("__nt", col("__n1") + col("__n2"))
    val numD = (dec(col("__nt")) * dec(col("__i")) -
      dec(col("__n1")) * dec(col("__bt"))).cast("double")
    val denD = col("__bt").cast("double") *
      (col("__nt") - col("__bt")).cast("double")
    // the B = N block is excluded by ZEROING, not filtering — a
    // single-distinct-value group must still emit its row (a2 = 0)
    val term = when(col("__bt") < col("__nt"),
      floor((col("__cb") + col("__cc")).cast("double") *
        numD * numD / denD * 1e6))
      .otherwise(lit(0.0)).cast("decimal(38,0)")
    val agg = cum
      .withColumn("__term", term)
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__n1")).as("n_base"), max(col("__n2")).as("n_cur"),
        sum(col("__term")).as("__s"))
    val n1 = col("n_base"); val n2 = col("n_cur")
    val oneSided = n1 === 0L || n2 === 0L
    val a2 = col("__s").cast("double") / 1e6 /
      (n1.cast("double") * n2.cast("double"))
    agg.select(groupCols.map(col) ++ Seq(
      n1, n2,
      when(oneSided, lit(null).cast("double"))
        .otherwise(round(a2, 6)).as("a2"),
      when(oneSided, lit(true)).otherwise(a2 > threshold)
        .as("drifted")): _*)
  }

  /** Mann–Whitney U rank-sum test between two snapshots, per group —
    * the rank-based sibling of [[ksTest]]: where KS asks "did the
    * SHAPE change anywhere", MW-U asks "did values systematically
    * SHIFT up or down" — the right alarm for a feed whose median
    * creeps while its spread stays put (KS is weak exactly there).
    *
    * Exact integer core: ranks come from the [[ksTest]] per-distinct-
    * value cumulative shape (counts per (group, value), running sums
    * ordered by value — never a per-row window), held in HALF-UNITS so
    * ties stay integral: a distinct value spanning positions
    * `[c+1, c+t]` has average rank `(2c + t + 1)/2`, so `rank2 = 2c +
    * t + 1` is BIGINT-exact and the baseline rank-sum doubles to
    * `R1_2 = Σ cb·rank2`. `U1 = R1 − n1(n1+1)/2` is emitted in half
    * units (`u_half = R1_2 − n1(n1+1)`, exact; `u = u_half/2` as a
    * rounded double for reading). The normal approximation
    * `z = (U1 − n1n2/2) / σ` uses the tie-corrected variance
    * `σ² = n1n2/12·((n+1) − Σ(t³−t)/(n(n−1)))` — every Σ is an exact
    * BIGINT/DECIMAL identity before the one double division, so z is
    * bit-reproducible across engines (`t³` accumulates in
    * DECIMAL(38,0): a fully-tied million-row group overflows 2^63).
    *
    * One-sided groups (all rows in one snapshot) follow the
    * [[ksTest]] contract: strongest-possible drift — `drifted = true`,
    * null z. Degenerate σ = 0 (every value tied, or n < 2) likewise
    * yields null z and `drifted = false` (no evidence of SHIFT — a
    * constant column that changed VALUE is a ksTest catch).
    *
    * Scale shape, identical to [[ksTest]]: per-(group, value) counts
    * (map-side combined), a group-partitioned running sum over
    * DISTINCT values (bounded by the group's distinct-value count,
    * not its row count), one group-sized aggregate. `drifted` flags
    * `|z| > zAlpha` (default 1.96, two-sided 5%).
    *
    * Returns `(group…, n_base, n_cur, u_half, u, z, drifted)`.
    */
  def mannWhitneyU(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], zAlpha: Double = 1.96): DataFrame =
    mannWhitneyUCore(
      pairedCounts(baseline, current, valueCol, groupCols),
      groupCols, zAlpha)

  /** The whole two-sample drift family over ONE pass: the shared
    * per-(group, distinct value) count frame is computed and persisted
    * once, and KS (worst single CDF gap), CvM (integrated squared
    * gap) and Mann-Whitney (location shift) all read it — the
    * production monitoring shape: at warehouse scale the three tests
    * cost one scan-and-count of each snapshot, not three. Output one
    * row per group: (group…, n_base, n_cur, ks_d, ks_drifted, cvm_t,
    * cvm_drifted, mw_z, mw_drifted); each statistic keeps its own
    * one-sided/degenerate-null contract from the standalone test.
    */
  def driftPanel(
      baseline: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], cAlpha: Double = 1.358,
      cvmThreshold: Double = 0.461, zAlpha: Double = 1.96): DataFrame = {
    val per = pairedCounts(baseline, current, valueCol, groupCols)
      .transform(graft.core.CacheScope.disk)
    val gc = groupCols.map(col)
    val ks = ksTestCore(per, groupCols, cAlpha)
      .select(gc ++ Seq(col("n_base"), col("n_cur"),
        col("ks_d"), col("drifted").as("ks_drifted")): _*)
    val cvm = cvmTestCore(per, groupCols, cvmThreshold)
      .select(gc ++ Seq(col("cvm_t"),
        col("drifted").as("cvm_drifted")): _*)
    val mw = mannWhitneyUCore(per, groupCols, zAlpha)
      .select(gc ++ Seq(col("z").as("mw_z"),
        col("drifted").as("mw_drifted")): _*)
    ks.join(cvm, groupCols).join(mw, groupCols)
  }

  /** [[mannWhitneyU]] from PRE-AGGREGATED per-distinct-value counts —
    * the entry a standing count store feeds (the streaming
    * maintenance sink lands `(group…, value, n)` shards; their merge
    * plus a baseline count frame IS the test's sufficient statistic,
    * so the monitor never rescans raw history). Both inputs carry
    * `groupCols ++ (valueCol, countCol)`; rows with non-positive
    * counts are ignored. Identical output contract to
    * [[mannWhitneyU]] — equality is spec-pinned.
    */
  def mannWhitneyUFromCounts(
      baseCounts: DataFrame, curCounts: DataFrame, valueCol: String,
      countCol: String, groupCols: Seq[String],
      zAlpha: Double = 1.96): DataFrame =
    mannWhitneyUCore(
      pairedCountsFromCounts(baseCounts, curCounts, valueCol,
        countCol, groupCols),
      groupCols, zAlpha)

  /** [[pairedCounts]] from PRE-AGGREGATED per-distinct-value counts
    * (the standing count-store shape): counts are additive, so a
    * shard-merged store frame and a raw recount produce the identical
    * sufficient statistic.
    */
  private def pairedCountsFromCounts(
      baseCounts: DataFrame, curCounts: DataFrame, valueCol: String,
      countCol: String, groupCols: Seq[String]): DataFrame = {
    val side = (df: DataFrame, isBase: Boolean) => df
      .where(col(valueCol).isNotNull && col(countCol) > 0)
      .select(groupCols.map(col) ++ Seq(
        col(valueCol).cast("double").as("__v"),
        (if (isBase) col(countCol) else lit(0L)).cast("long").as("__cb"),
        (if (isBase) lit(0L) else col(countCol)).cast("long")
          .as("__cc")): _*)
    side(baseCounts, true).unionByName(side(curCounts, false))
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__cb")).as("__cb"), sum(col("__cc")).as("__cc"))
  }

  /** [[driftPanel]] from PRE-AGGREGATED per-distinct-value counts —
    * what a [[graft.streaming.EventStreams.mwDriftMaintenanceSink]]
    * store feeds: ONE standing (group…, value, n) store is the
    * sufficient statistic for the whole two-sample family, so the
    * same shards serve KS, CvM and MW without ever rescanning raw
    * history. Identical output contract to [[driftPanel]]; counts
    * additivity means shard-merged input ≡ raw recount input.
    */
  def driftPanelFromCounts(
      baseCounts: DataFrame, curCounts: DataFrame, valueCol: String,
      countCol: String, groupCols: Seq[String], cAlpha: Double = 1.358,
      cvmThreshold: Double = 0.461, zAlpha: Double = 1.96): DataFrame = {
    val per = pairedCountsFromCounts(baseCounts, curCounts, valueCol,
        countCol, groupCols)
      .transform(graft.core.CacheScope.disk)
    val gc = groupCols.map(col)
    val ks = ksTestCore(per, groupCols, cAlpha)
      .select(gc ++ Seq(col("n_base"), col("n_cur"),
        col("ks_d"), col("drifted").as("ks_drifted")): _*)
    val cvm = cvmTestCore(per, groupCols, cvmThreshold)
      .select(gc ++ Seq(col("cvm_t"),
        col("drifted").as("cvm_drifted")): _*)
    val mw = mannWhitneyUCore(per, groupCols, zAlpha)
      .select(gc ++ Seq(col("z").as("mw_z"),
        col("drifted").as("mw_drifted")): _*)
    ks.join(cvm, groupCols).join(mw, groupCols)
  }

  /** Wilcoxon signed-rank test per group — the PAIRED sibling of
    * [[mannWhitneyU]]: where MW compares two independent snapshots,
    * this scores matched before/after pairs (the same key measured
    * twice — a re-crawled document's quality, a customer's spend in
    * two periods), which removes between-key variance and flags
    * shifts MW's pooled ranks dilute.
    *
    * Input: one row per pair carrying `baseCol` and `curCol`. Zero
    * differences drop (the standard Wilcoxon treatment); |d| ranks
    * are tie-averaged HALF-UNIT integers from the per-distinct-|d|
    * cumulative shape (the [[mannWhitneyU]] rank machinery — counts
    * per (group, |d|), never a per-row window), so
    * W⁺·2 = Σ_{d>0} rank2 is an exact BIGINT; the normal
    * approximation z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    * is ONE mirrored double formula with the tie cubes exact in
    * DECIMAL(38,0). Groups whose every difference is zero are ABSENT
    * (no usable pairs — nothing to test); a degenerate σ² ≤ 0 (all
    * |d| in one tie block) emits null z with drifted = false.
    *
    * Returns `(group…, n_pairs, n_zero, w_plus_half, z, drifted)`.
    * Scale: one pair-keyed aggregate to build differences, one
    * grouped count per distinct |d| (bounded by value cardinality),
    * one group-sized aggregate.
    */
  /** The COMPLETE drift one-pager off ONE count frame: KS (worst CDF
    * gap), CvM (integrated squared gap), Mann–Whitney (location),
    * Cohen's d (magnitude), Brown–Forsythe (variance) and the
    * equal-exposure rate test — six axes, one persisted
    * per-(group, distinct cents) count frame, computed from ONE
    * tagged-union scan of the two snapshots. Every axis is a
    * DERIVATION from the shared frame: the panel cores read it
    * directly; the rate test is its count sums; the effect size's
    * moments are Σv·c and Σv²·c; the medians and |x − med|
    * deviation moments are count-window identities. At warehouse
    * scale the whole page costs one scan-and-count per snapshot —
    * nobody runs six scans — and the same frame is the shape a
    * standing count store maintains incrementally.
    *
    * Exactness discipline inherited from every constituent: exact
    * integer sufficient statistics (DECIMAL products), one mirrored
    * double formula per emitted statistic, each axis keeping its
    * standalone null/one-sided contract.
    */
  def driftOnePager(
      base: DataFrame, cur: DataFrame, cents: Column,
      groupCols: Seq[String], cAlpha: Double = 1.358,
      cvmThreshold: Double = 0.461, zAlpha: Double = 1.96,
      dThreshold: Double = 0.2, fAlpha: Double = 3.841459): DataFrame = {
    val tag = (df: DataFrame, b: Int) => df
      .select(groupCols.map(col) :+ cents.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
      .withColumn("__b", lit(b))
    val per = tag(base, 1).unionByName(tag(cur, 0))
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__b")).cast("long").as("__cb"),
        sum(lit(1) - col("__b")).cast("long").as("__cc"))
      .transform(graft.core.CacheScope.disk)
    driftOnePagerCore(per, groupCols, cAlpha, cvmThreshold, zAlpha,
      dThreshold, fAlpha)
  }

  /** [[driftOnePager]] from PRE-AGGREGATED per-distinct-cents counts
    * — what a standing count store feeds (the
    * [[driftPanelFromCounts]] contract extended to all six axes):
    * ONE `(group…, cents, n)` store is the sufficient statistic for
    * the ENTIRE page — distribution tests, effect size, variance
    * test and rate alarm included, because moments and medians are
    * count-frame identities. Counts additivity means shard-merged
    * input ≡ raw recount input; rows with non-positive counts are
    * ignored. Identical output contract to [[driftOnePager]].
    */
  def driftOnePagerFromCounts(
      baseCounts: DataFrame, curCounts: DataFrame, valueCol: String,
      countCol: String, groupCols: Seq[String], cAlpha: Double = 1.358,
      cvmThreshold: Double = 0.461, zAlpha: Double = 1.96,
      dThreshold: Double = 0.2, fAlpha: Double = 3.841459): DataFrame = {
    val side = (df: DataFrame, isBase: Boolean) => df
      .where(col(valueCol).isNotNull && col(countCol) > 0)
      .select(groupCols.map(col) ++ Seq(
        col(valueCol).cast("long").as("__v"),
        (if (isBase) col(countCol) else lit(0L)).cast("long")
          .as("__cb"),
        (if (isBase) lit(0L) else col(countCol)).cast("long")
          .as("__cc")): _*)
    val per = side(baseCounts, true).unionByName(side(curCounts, false))
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__cb")).as("__cb"), sum(col("__cc")).as("__cc"))
      .transform(graft.core.CacheScope.disk)
    driftOnePagerCore(per, groupCols, cAlpha, cvmThreshold, zAlpha,
      dThreshold, fAlpha)
  }

  /** The six-axis derivation shared by [[driftOnePager]] (raw
    * snapshots) and [[driftOnePagerFromCounts]] (standing store):
    * everything reads the one persisted `(group…, __v, __cb, __cc)`
    * frame.
    */
  private def driftOnePagerCore(
      per: DataFrame, groupCols: Seq[String], cAlpha: Double,
      cvmThreshold: Double, zAlpha: Double, dThreshold: Double,
      fAlpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    // panel legs: the q277 cores on the shared frame
    val ks = ksTestCore(per, groupCols, cAlpha)
      .select(gc ++ Seq(col("n_base"), col("n_cur"),
        round(col("ks_d"), 6).as("ks_d"),
        col("drifted").cast("int").as("ks_drifted")): _*)
    val cvm = cvmTestCore(per, groupCols, cvmThreshold)
      .select(gc ++ Seq(round(col("cvm_t"), 6).as("cvm_t"),
        col("drifted").cast("int").as("cvm_drifted")): _*)
    val mw = mannWhitneyUCore(per, groupCols, zAlpha)
      .select(gc ++ Seq(col("z").as("mw_z"),
        col("drifted").cast("int").as("mw_drifted")): _*)
    // shared side totals (also the rate test's whole input)
    val tot = per.groupBy(gc: _*)
      .agg(sum(col("__cb")).as("__nb"), sum(col("__cc")).as("__nc"))
      .transform(graft.core.CacheScope.disk)
    val nbD = col("__nb").cast("double")
    val ncD = col("__nc").cast("double")
    val rateZ = (ncD - nbD) / sqrt(nbD + ncD)
    val rateZSafe = when(col("__nb") + col("__nc") === 0L,
      lit(null).cast("double")).otherwise(rateZ)
    val rrOk = col("__nb") > 0L && col("__nc") > 0L
    val rate = tot.select(gc ++ Seq(
      round(when(rrOk, ncD / nbD)
        .otherwise(lit(null).cast("double")), 4).as("rate_ratio"),
      round(rateZSafe, 6).as("rate_z"),
      coalesce(abs(rateZSafe) > zAlpha, lit(false)).cast("int")
        .as("rate_drifted")): _*)
    // effect-size leg: the cohensD moments as count-frame sums
    val mom = per.groupBy(gc: _*)
      .agg(
        sum(col("__cb")).as("__enb"), sum(col("__cc")).as("__enc"),
        sum(dec(col("__v")) * dec(col("__cb"))).as("__sb"),
        sum(dec(col("__v")) * dec(col("__cc"))).as("__sc"),
        sum(dec(col("__v")) * dec(col("__v")) * dec(col("__cb")))
          .as("__qb"),
        sum(dec(col("__v")) * dec(col("__v")) * dec(col("__cc")))
          .as("__qc"))
    val enbD = col("__enb").cast("double")
    val encD = col("__enc").cast("double")
    val s2b = (dec(col("__enb")) * col("__qb") -
      dec(col("__sb")) * dec(col("__sb"))).cast("double") /
      (enbD * (enbD - 1.0))
    val s2c = (dec(col("__enc")) * col("__qc") -
      dec(col("__sc")) * dec(col("__sc"))).cast("double") /
      (encD * (encD - 1.0))
    val pooled = ((enbD - 1.0) * s2b + (encD - 1.0) * s2c) /
      (enbD + encD - 2.0)
    val dVal = (col("__sc").cast("double") / encD -
      col("__sb").cast("double") / enbD) / sqrt(pooled)
    val dOk = col("__enb") >= 2L && col("__enc") >= 2L && pooled > 0.0
    val dSafe = when(dOk, dVal).otherwise(lit(null).cast("double"))
    val effect = mom.select(gc ++ Seq(
      round(dSafe, 6).as("d"),
      coalesce(abs(dSafe) >= dThreshold, lit(false)).cast("int")
        .as("d_material")): _*)
    // Brown–Forsythe leg: medians and deviation moments off the frame
    val w = Window.partitionBy(gc: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum2 = per
      .withColumn("__ib", sum(col("__cb")).over(w))
      .withColumn("__ic", sum(col("__cc")).over(w))
      .join(tot, groupCols)
    val med = cum2.groupBy(gc: _*)
      .agg(
        (min(when(col("__ib") >=
            floor((col("__nb") + 1L).cast("double") / 2.0)
              .cast("long"), col("__v"))) +
          min(when(col("__ib") >=
            floor(col("__nb").cast("double") / 2.0).cast("long") + 1L,
            col("__v")))).as("__m2b"),
        (min(when(col("__ic") >=
            floor((col("__nc") + 1L).cast("double") / 2.0)
              .cast("long"), col("__v"))) +
          min(when(col("__ic") >=
            floor(col("__nc").cast("double") / 2.0).cast("long") + 1L,
            col("__v")))).as("__m2c"))
    val zb = abs(col("__v") * 2L - col("__m2b"))
    val zc = abs(col("__v") * 2L - col("__m2c"))
    val dev = per.join(med, groupCols)
      .groupBy(gc: _*)
      .agg(
        sum(dec(col("__cb")) * dec(zb)).as("__zsb"),
        sum(dec(col("__cb")) * dec(zb) * dec(zb)).as("__zqb"),
        sum(dec(col("__cc")) * dec(zc)).as("__zsc"),
        sum(dec(col("__cc")) * dec(zc) * dec(zc)).as("__zqc"))
      .join(tot, groupCols)
    val sb = col("__zsb").cast("double")
    val sc = col("__zsc").cast("double")
    val qb = col("__zqb").cast("double")
    val qc = col("__zqc").cast("double")
    val nD = nbD + ncD
    val ssb = sb * sb / nbD + sc * sc / ncD -
      (sb + sc) * (sb + sc) / nD
    val ssw = (qb - sb * sb / nbD) + (qc - sc * sc / ncD)
    val fVal = ssb * (nD - 2.0) / ssw
    val fOk = col("__nb") >= 2L && col("__nc") >= 2L && ssw > 0.0
    val fSafe = when(fOk, fVal).otherwise(lit(null).cast("double"))
    val bf = dev.select(gc ++ Seq(
      round(fSafe, 6).as("bf_f"),
      coalesce(fSafe > fAlpha, lit(false)).cast("int")
        .as("var_drifted")): _*)
    ks.join(cvm, groupCols).join(mw, groupCols)
      .join(effect, groupCols).join(bf, groupCols)
      .join(rate, groupCols)
  }

  /** Gumbel block-maxima fit per group — the EXTREME-value reading
    * the mean/median monitors structurally cannot give: capacity
    * planning asks "what daily maximum should we provision for over
    * the next year", and the answer comes from the distribution of
    * BLOCK MAXIMA, which converges to Gumbel for light-tailed
    * parents (Fisher–Tippett). Method-of-moments fit over the
    * per-bucket maxima: β̂ = s·√6/π, µ̂ = m̄ − γ·β̂, return level
    * x_T = µ̂ + β̂·(−ln(−ln(1 − 1/T))) per requested period. The
    * block-maxima sibling of q204's Hill index (that one estimates
    * the heavy-tail exponent from upper order statistics; this one
    * assumes the light-tailed domain and prices its extremes).
    *
    * Exactness: block maxima are exact longs (max of exact cents);
    * (n, Σm, Σm²) moments exact in DECIMAL; the Gumbel constants
    * (γ, √6/π, each period's Gumbel variate) are computed ONCE on
    * the driver and embedded as double literals in BOTH engines — so
    * the only runtime float ops are correctly-rounded +·/√ over
    * exact moments, bit-identical cross-engine.
    * Scale: one grouped max (map-side combined, bucket-domain-sized),
    * one group rollup.
    */
  def gumbelBlockMaxima(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column,
      returnPeriods: Seq[Int] = Seq(30, 365)): DataFrame = {
    require(returnPeriods.nonEmpty && returnPeriods.forall(_ >= 2),
      "return periods must be >= 2 blocks")
    val gc = groupCols.map(col)
    val bm = df
      .select(gc ++ Seq(bucketIdx.cast("long").as("__b"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__b").isNotNull && col("__y").isNotNull)
      .groupBy(gc :+ col("__b"): _*)
      .agg(max(col("__y")).as("__m"))
    gumbelFitCore(bm, groupCols, returnPeriods)
  }

  /** [[gumbelBlockMaxima]] off a STANDING per-(group, bucket) max
    * store — max is the mergeable statistic, so shard rows landed by
    * any ingest tree merge by one more max and the fit lands exactly
    * where the raw recompute lands (the q278/q301 one-store pattern
    * for the extremes monitor: history is never rescanned, each
    * day's shard just lands its maxima).
    */
  def gumbelFromBlockMaxima(
      shards: DataFrame, groupCols: Seq[String], bucketCol: String,
      maxCol: String,
      returnPeriods: Seq[Int] = Seq(30, 365)): DataFrame = {
    val gc = groupCols.map(col)
    val bm = shards
      .select(gc ++ Seq(col(bucketCol).cast("long").as("__b"),
        col(maxCol).cast("long").as("__m")): _*)
      .where(col("__b").isNotNull && col("__m").isNotNull)
      .groupBy(gc :+ col("__b"): _*)
      .agg(max(col("__m")).as("__m"))
    gumbelFitCore(bm, groupCols, returnPeriods)
  }

  private def gumbelFitCore(
      bm: DataFrame, groupCols: Seq[String],
      returnPeriods: Seq[Int]): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val agg = bm.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_blocks"),
        max(col("__m")).as("max_seen"),
        sum(col("__m")).as("__s"),
        sum(dec(col("__m")) * dec(col("__m"))).as("__q"))
    val nD = col("n_blocks").cast("double")
    val mean = col("__s").cast("double") / nD
    val varN = (dec(col("n_blocks")) * col("__q") -
      dec(col("__s")) * dec(col("__s"))).cast("double") /
      (nD * (nD - 1.0))
    val beta = sqrt(varN) * lit(Drift.gumbelSqrt6OverPi)
    val mu = mean - lit(Drift.eulerGamma) * beta
    val ok = col("n_blocks") >= 2L && varN > 0.0
    def safe(c: Column): Column =
      round(when(ok, c).otherwise(lit(null).cast("double")), 4)
    val rls = returnPeriods.map { t =>
      safe(mu + beta * lit(Drift.gumbelVariate(t))).as(s"rl_$t") }
    agg.select(gc ++ Seq(
      col("n_blocks"), col("max_seen"),
      round(mean, 4).as("mean_max"),
      safe(mu).as("mu"), safe(beta).as("beta")) ++ rls: _*)
  }

  /** Euler–Mascheroni constant — the Gumbel MoM location shift. */
  val eulerGamma: Double = 0.5772156649015329
  /** √6/π — the Gumbel MoM scale factor; computed once, embedded as
    * the same literal in the engine plan and the oracle SQL.
    */
  val gumbelSqrt6OverPi: Double = math.sqrt(6.0) / math.Pi
  /** The Gumbel standard variate −ln(−ln(1 − 1/T)) for a return
    * period of T blocks; driver-computed so both engines consume one
    * literal.
    */
  def gumbelVariate(t: Int): Double =
    -math.log(-math.log(1.0 - 1.0 / t))

  /** Classical additive seasonal decomposition per group over a
    * bucketed series: y = trend + seasonal + residual with trend the
    * CENTERED period-length moving average and seasonal the per-phase
    * mean of the detrended values — the decomposition that turns
    * "daily volume wiggles" into three columns a monitor can alarm on
    * separately (Holt/CUSUM watch the trend, the q302 seasonal-MK
    * watches the seasonal AXIS, and the residual is what the q304/
    * q309 serial tests should really be fed). Buckets without a full
    * centered window report null trend/seasonal/residual (the
    * classical edge contract — no padding invention).
    *
    * Exactness: bucket sums are exact longs; trend is
    * floor(window-sum / period) (one mirrored double division +
    * floor); the per-phase seasonal is floor(Σ detrended / count)
    * (floor toward −∞ on BOTH engines — detrended values go
    * negative); residual is exact integer subtraction of the two.
    * Scale: one grouped bucket-sum, one bucket-ordered window, one
    * phase-domain aggregation joined back — nothing row-sized past
    * the first combine.
    */
  def seasonalDecompose(
      df: DataFrame, groupCols: Seq[String], bucketIdx: Column,
      valueCents: Column, period: Int = 7): DataFrame = {
    require(period >= 2 && period % 2 == 1,
      "seasonalDecompose: odd period required (centered window)")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val half = period / 2
    val per = df
      .select(gc ++ Seq(bucketIdx.cast("long").as("__b"),
        valueCents.cast("long").as("__y")): _*)
      .where(col("__b").isNotNull && col("__y").isNotNull)
      .groupBy(gc :+ col("__b"): _*)
      .agg(sum(col("__y")).as("__y"))
      .transform(graft.core.CacheScope.disk)
    val wb = Window.partitionBy(gc: _*).orderBy(col("__b").asc)
      .rowsBetween(-half, half)
    // a full centered window: exactly `period` CONSECUTIVE buckets
    // (row count alone would accept gapped series)
    val trended = per
      .withColumn("__cnt", count(lit(1)).over(wb))
      .withColumn("__span",
        max(col("__b")).over(wb) - min(col("__b")).over(wb))
      .withColumn("__trend",
        when(col("__cnt") === period && col("__span") === (period - 1),
          floor(sum(col("__y")).over(wb).cast("double") /
            lit(period.toDouble)).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("__det", col("__y") - col("__trend"))
    val seasonal = trended
      .where(col("__det").isNotNull)
      .groupBy(gc :+ (col("__b") % period).as("__ph"): _*)
      .agg(floor(sum(col("__det")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("__seas"))
    val seasR = seasonal.select(
      groupCols.map(g => col(g).as(s"__g_$g")) ++
        Seq(col("__ph"), col("__seas")): _*)
    trended
      .join(seasR,
        groupCols.map(g => col(g) === col(s"__g_$g"))
          .foldLeft((col("__b") % period) === col("__ph"))(_ && _),
        "left")
      .select(gc ++ Seq(
        col("__b").as("bucket"), col("__y").as("value"),
        col("__trend").as("trend"),
        when(col("__trend").isNotNull, col("__seas"))
          .otherwise(lit(null).cast("long")).as("seasonal"),
        when(col("__trend").isNotNull, col("__det") - col("__seas"))
          .otherwise(lit(null).cast("long")).as("residual")): _*)
  }

  /** Cliff's δ ordinal effect size between two snapshots per group —
    * the nonparametric MAGNITUDE companion of [[cohensD]] exactly as
    * [[mannWhitneyU]] is the nonparametric companion of the t-test:
    * δ = P(cur > base) − P(base > cur) ∈ [−1, 1] reads dominance
    * directly, with no variance to pool and no normality story —
    * heavy tails and outliers that inflate d's denominator (hiding a
    * real shift) leave δ untouched. `magnitude` buckets |δ| at the
    * conventional 0.147 / 0.33 / 0.474 bounds (Romano et al. 2006).
    *
    * Exactness: δ = 1 − u_half/(n₁n₂) off [[mannWhitneyU]]'s exact
    * half-unit rank identity (ties split exactly, never enumerated
    * pairwise) — one double division of exact integers. Same
    * count-frame scale shape as every two-sample test here.
    */
  def cliffsDelta(
      base: DataFrame, cur: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    val mw = mannWhitneyU(base, cur, valueCol, groupCols)
    val nn = col("n_base").cast("double") * col("n_cur").cast("double")
    val delta = lit(1.0) - col("u_half").cast("double") / nn
    val ok = col("n_base") > 0L && col("n_cur") > 0L
    val dSafe = when(ok, delta).otherwise(lit(null).cast("double"))
    val mag = when(dSafe.isNull, lit(null).cast("string"))
      .when(abs(dSafe) < 0.147, "negligible")
      .when(abs(dSafe) < 0.33, "small")
      .when(abs(dSafe) < 0.474, "medium")
      .otherwise(lit("large"))
    mw.select(groupCols.map(col) ++ Seq(
      col("n_base"), col("n_cur"),
      round(dSafe, 6).as("delta"),
      mag.as("magnitude")): _*)
  }

  /** Cohen's d / Hedges' g effect size between two snapshots per
    * group — the MAGNITUDE axis the drift panel's tests don't carry:
    * at corpus scale every real shift is "significant", and the
    * decision input is whether it is MATERIAL (|d| ≥ `dThreshold`,
    * default 0.2 = the conventional small-effect floor). Reports the
    * standardized mean difference, its small-sample-corrected g, and
    * the 1.96·se confidence band.
    *
    * Exactness: each side reduces to exact integer moments (n, Σx,
    * Σx² with the square computed in DECIMAL before the sum); d, g
    * and the band are one mirrored double formula over those moments.
    * Groups present on only one side are absent (no comparison).
    * Scale: one grouped aggregation per side, group-sized arithmetic
    * after.
    */
  def cohensD(
      base: DataFrame, cur: DataFrame, cents: Column,
      groupCols: Seq[String], dThreshold: Double = 0.2): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def moments(df: DataFrame, tag: String): DataFrame = df
      .select(groupCols.map(col) :+ cents.cast("long").as("__x"): _*)
      .where(col("__x").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(col("__x")).as(s"__s_$tag"),
        sum(dec(col("__x")) * dec(col("__x"))).as(s"__q_$tag"))
    val nb = col("n_base"); val nc = col("n_cur")
    val nbD = nb.cast("double"); val ncD = nc.cast("double")
    val meanB = col("__s_base").cast("double") / nbD
    val meanC = col("__s_cur").cast("double") / ncD
    // n·Σx² − (Σx)² stays exact in decimal; the variance is one
    // mirrored division of it
    def varOf(tag: String, n: Column, nD: Column): Column =
      (dec(n) * col(s"__q_$tag") -
        dec(col(s"__s_$tag")) * dec(col(s"__s_$tag"))).cast("double") /
        (nD * (nD - 1.0))
    val s2b = varOf("base", nb, nbD)
    val s2c = varOf("cur", nc, ncD)
    val pooled = ((nbD - 1.0) * s2b + (ncD - 1.0) * s2c) /
      (nbD + ncD - 2.0)
    val d = (meanC - meanB) / sqrt(pooled)
    val g = d * (lit(1.0) - lit(3.0) / ((nbD + ncD) * 4.0 - 9.0))
    val se = sqrt((nbD + ncD) / (nbD * ncD) +
      d * d / ((nbD + ncD) * 2.0))
    val ok = nb >= 2L && nc >= 2L && pooled > 0.0
    val dSafe = when(ok, d).otherwise(lit(null).cast("double"))
    moments(base, "base").join(moments(cur, "cur"), groupCols)
      .select(groupCols.map(col) ++ Seq(
        nb, nc,
        round(meanB, 4).as("mean_base"),
        round(meanC, 4).as("mean_cur"),
        round(dSafe, 6).as("d"),
        round(when(ok, g).otherwise(lit(null).cast("double")), 6)
          .as("g"),
        round(when(ok, d - lit(1.96) * se)
          .otherwise(lit(null).cast("double")), 6).as("ci_lo"),
        round(when(ok, d + lit(1.96) * se)
          .otherwise(lit(null).cast("double")), 6).as("ci_hi"),
        coalesce(abs(dSafe) >= dThreshold, lit(false)).cast("int")
          .as("material")): _*)
  }

  /** Welch's unequal-variance t-test between two snapshots per
    * group — the parametric location axis [[cohensD]] deliberately
    * does not decide: d reports MAGNITUDE (is the shift material?),
    * this reports EVIDENCE (is the shift real given each side's own
    * variance?). Welch's form matters precisely when the two
    * snapshots have different spreads — a variance widening alongside
    * a mean shift makes the pooled-variance t anticonservative, while
    * t = (x̄c − x̄b)/√(s²b/nb + s²c/nc) stays calibrated. Also emits
    * the Welch–Satterthwaite df; at corpus-scale n the df is far past
    * 30, so the decision compares |t| against the normal `zAlpha`
    * (the classical large-sample reading, noted here because the
    * flag is NOT a small-sample t-table lookup).
    *
    * Exactness: each side reduces to exact integer moments (n, Σx,
    * Σx² with the square computed in DECIMAL before the sum); t and
    * df are one mirrored double formula over those moments — no
    * cross-row float accumulation exists to order. Groups present on
    * only one side are absent (no comparison).
    * Scale: one grouped aggregation per side, group-sized arithmetic
    * after — the same two-scan shape as [[cohensD]], and the moments
    * are mergeable, so a standing monitor keeps (n, Σx, Σx²) per
    * shard and never rescans history.
    */
  def welchT(
      base: DataFrame, cur: DataFrame, cents: Column,
      groupCols: Seq[String], zAlpha: Double = 1.96): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def moments(df: DataFrame, tag: String): DataFrame = df
      .select(groupCols.map(col) :+ cents.cast("long").as("__x"): _*)
      .where(col("__x").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(col("__x")).as(s"__s_$tag"),
        sum(dec(col("__x")) * dec(col("__x"))).as(s"__q_$tag"))
    val nb = col("n_base"); val nc = col("n_cur")
    val nbD = nb.cast("double"); val ncD = nc.cast("double")
    val meanB = col("__s_base").cast("double") / nbD
    val meanC = col("__s_cur").cast("double") / ncD
    def varOf(tag: String, n: Column, nD: Column): Column =
      (dec(n) * col(s"__q_$tag") -
        dec(col(s"__s_$tag")) * dec(col(s"__s_$tag"))).cast("double") /
        (nD * (nD - 1.0))
    val vb = varOf("base", nb, nbD) / nbD
    val vc = varOf("cur", nc, ncD) / ncD
    val tStat = (meanC - meanB) / sqrt(vb + vc)
    val df = (vb + vc) * (vb + vc) /
      (vb * vb / (nbD - 1.0) + vc * vc / (ncD - 1.0))
    val ok = nb >= 2L && nc >= 2L && (vb + vc) > 0.0
    val tSafe = when(ok, tStat).otherwise(lit(null).cast("double"))
    moments(base, "base").join(moments(cur, "cur"), groupCols)
      .select(groupCols.map(col) ++ Seq(
        nb, nc,
        round(meanB, 4).as("mean_base"),
        round(meanC, 4).as("mean_cur"),
        round(tSafe, 6).as("t"),
        round(when(ok, df).otherwise(lit(null).cast("double")), 4)
          .as("df"),
        coalesce(abs(tSafe) > zAlpha, lit(false)).cast("int")
          .as("shifted")): _*)
  }

  /** Brown–Forsythe variance-shift test between two snapshots per
    * group — the VARIANCE axis of the drift family: MW reads location,
    * KS/CvM read shape, this reads spread (a mean-preserving widening
    * is invisible to all three MW-style alarms). Robust by
    * construction: the one-way F runs on |x − median| deviations, so
    * heavy tails don't masquerade as variance shifts the way they do
    * under Levene's mean-centered form.
    *
    * Exactness: each side's median comes from the per-(group, value)
    * count frame (2·median = lower + upper middle values — exact
    * BIGINTs, even-n safe); deviations are the exact integers
    * |2x − 2·med|; each side reduces to exact (n, Σz, Σz²) moments
    * (squares in DECIMAL), and with exactly TWO sides the F formula
    * is one mirrored double expression — no cross-side float
    * accumulation exists to order. F compares against χ²₀.₀₅,₁
    * (the k=2 large-sample bound).
    *
    * Scale: one grouped count per side (value-domain-sized frames),
    * one window over values per (group, side), group-sized
    * arithmetic after. Returns (group…, n_base, n_cur, med2_base,
    * med2_cur, f, var_drifted).
    */
  def brownForsythe(
      base: DataFrame, cur: DataFrame, cents: Column,
      groupCols: Seq[String], fAlpha: Double = 3.841459): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def sideStats(df: DataFrame, tag: String): DataFrame = {
      val per = df
        .select(groupCols.map(col) :+ cents.cast("long").as("__v"): _*)
        .where(col("__v").isNotNull)
        .groupBy(groupCols.map(col) :+ col("__v"): _*)
        .agg(count(lit(1)).as("__c"))
        .transform(graft.core.CacheScope.disk)
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val n = per.groupBy(groupCols.map(col): _*)
        .agg(sum(col("__c")).as("__n"))
      // exact integer middle ranks: lower = floor((n+1)/2),
      // upper = floor(n/2)+1 (equal when n is odd)
      val cum = per.withColumn("__cum", sum(col("__c")).over(w))
        .join(n, groupCols)
        .withColumn("__lo",
          floor((col("__n") + 1L).cast("double") / 2.0).cast("long"))
        .withColumn("__hi",
          floor(col("__n").cast("double") / 2.0).cast("long") + 1L)
      val med2 = cum.groupBy(groupCols.map(col): _*)
        .agg(
          first(col("__n")).as(s"n_$tag"),
          (min(when(col("__cum") >= col("__lo"), col("__v"))) +
            min(when(col("__cum") >= col("__hi"), col("__v"))))
            .as(s"med2_$tag"))
      // deviation moments in doubled units: z = |2v − med2| exact
      val z = abs(col("__v") * 2L - col(s"med2_$tag"))
      per.join(med2, groupCols)
        .groupBy(groupCols.map(col): _*)
        .agg(
          first(col(s"n_$tag")).as(s"n_$tag"),
          first(col(s"med2_$tag")).as(s"med2_$tag"),
          sum(dec(col("__c")) * dec(z)).as(s"__s_$tag"),
          sum(dec(col("__c")) * dec(z) * dec(z)).as(s"__q_$tag"))
    }
    val joined = sideStats(base, "base")
      .join(sideStats(cur, "cur"), groupCols)
    val nb = col("n_base"); val nc = col("n_cur")
    val nbD = nb.cast("double"); val ncD = nc.cast("double")
    val sb = col("__s_base").cast("double")
    val sc = col("__s_cur").cast("double")
    val qb = col("__q_base").cast("double")
    val qc = col("__q_cur").cast("double")
    val nD = nbD + ncD
    val ssb = sb * sb / nbD + sc * sc / ncD -
      (sb + sc) * (sb + sc) / nD
    val ssw = (qb - sb * sb / nbD) + (qc - sc * sc / ncD)
    val f = ssb * (nD - 2.0) / ssw
    val ok = nb >= 2L && nc >= 2L && ssw > 0.0
    val fSafe = when(ok, f).otherwise(lit(null).cast("double"))
    joined.select(groupCols.map(col) ++ Seq(
      nb, nc, col("med2_base"), col("med2_cur"),
      round(fSafe, 6).as("f"),
      coalesce(fSafe > fAlpha, lit(false)).cast("int")
        .as("var_drifted")): _*)
  }

  /** Equal-exposure rate (count) drift per group — the axis every
    * value-conditioned alarm misses: a group whose event RATE
    * collapsed but whose per-event value distribution is unchanged
    * reads clean on KS/CvM/MW/effect-size, and THIS is the alarm
    * that fires. Under equal exposure the conditional score test is
    * z = (c₂ − c₁)/√(c₁ + c₂) — exact integers into one mirrored
    * division — plus the rate ratio with its log-scale 1.96 band
    * (mirrored doubles over the exact counts). Groups empty on one
    * side report ratio null (the z still reads the imbalance).
    *
    * Scale: one grouped count per side; group-sized arithmetic.
    */
  def rateRatio(
      base: DataFrame, cur: DataFrame, groupCols: Seq[String],
      zAlpha: Double = 1.96): DataFrame = {
    def cnt(df: DataFrame, tag: String): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as(s"n_$tag"))
    val c1 = col("n_base").cast("double")
    val c2 = col("n_cur").cast("double")
    val z = (c2 - c1) / sqrt(c1 + c2)
    val zSafe = when(col("n_base") + col("n_cur") === 0L,
      lit(null).cast("double")).otherwise(z)
    val rr = c2 / c1
    val se = sqrt(lit(1.0) / c1 + lit(1.0) / c2)
    val rrOk = col("n_base") > 0L && col("n_cur") > 0L
    cnt(base, "base").join(cnt(cur, "cur"), groupCols, "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .select(groupCols.map(col) ++ Seq(
        col("n_base"), col("n_cur"),
        round(when(rrOk, rr).otherwise(lit(null).cast("double")), 4)
          .as("rate_ratio"),
        round(when(rrOk, exp(log(rr) - lit(1.96) * se))
          .otherwise(lit(null).cast("double")), 4).as("ci_lo"),
        round(when(rrOk, exp(log(rr) + lit(1.96) * se))
          .otherwise(lit(null).cast("double")), 4).as("ci_hi"),
        round(zSafe, 6).as("z"),
        coalesce(abs(zSafe) > zAlpha, lit(false)).cast("int")
          .as("rate_drifted")): _*)
  }

  def wilcoxonSignedRank(
      pairs: DataFrame, baseCol: String, curCol: String,
      groupCols: Seq[String], zAlpha: Double = 1.96): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (col(curCol).cast("double") - col(baseCol).cast("double"))
      .as("__d")
    val rows = pairs
      .where(col(baseCol).isNotNull && col(curCol).isNotNull)
      .select(groupCols.map(col) :+ d: _*)
    val zeros = rows.where(col("__d") === 0.0)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_zero"))
    val per = rows.where(col("__d") =!= 0.0)
      .groupBy(groupCols.map(col) :+ abs(col("__d")).as("__ad"): _*)
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__d") > 0.0, 1L).otherwise(0L)).as("__tp"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__ad").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = per
      .withColumn("__c", coalesce(sum(col("__t")).over(w), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__c") + col("__t") + 1L)
    val agg = cum.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__t")).as("n_pairs"),
        sum(dec(col("__tp")) * dec(col("__rank2"))).as("__w2"),
        sum(dec(col("__t")) * dec(col("__t")) * dec(col("__t")) -
          dec(col("__t"))).as("__ties"))
    val n = col("n_pairs")
    val nD = n.cast("double")
    val mu = nD * (nD + 1.0) / 4.0
    val sigma2 = nD * (nD + 1.0) * (nD * 2.0 + 1.0) / 24.0 -
      col("__ties").cast("double") / 48.0
    val z = (col("__w2").cast("double") / 2.0 - mu) / sqrt(sigma2)
    val zSafe = when(n < 1L || sigma2 <= 0.0,
      lit(null).cast("double")).otherwise(z)
    agg
      .join(zeros, groupCols, "left")
      .select(groupCols.map(col) ++ Seq(
        n, coalesce(col("n_zero"), lit(0L)).as("n_zero"),
        col("__w2").cast("long").as("w_plus_half"),
        round(zSafe, 6).as("z"),
        coalesce(abs(zSafe) > zAlpha, lit(false)).as("drifted")): _*)
  }

  /** Shared MW-U tail over the `(group…, __v, __cb, __cc)`
    * per-distinct-value count frame.
    */
  private def mannWhitneyUCore(
      per: DataFrame, groupCols: Seq[String],
      zAlpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("__cb") + col("__cc")
    val cum = per
      // positions before this value's tie block, within the group
      .withColumn("__c", coalesce(sum(t).over(w), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__c") + t + lit(1L))
    val agg = cum.groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__cb")).as("n_base"),
        sum(col("__cc")).as("n_cur"),
        // rank sum Σ cb·rank2 — cast BEFORE multiplying, same rule as
        // the tie cubes below: a single cb·rank2 product of a heavily
        // tied billion-row group passes 2^63, and the group SUM wraps
        // BIGINT around ~2·10⁹ rows even without ties
        sum(col("__cb").cast("decimal(38,0)") *
          col("__rank2").cast("decimal(38,0)")).as("__r1_2"),
        // tie correction Σ(t³ − t) — cast BEFORE multiplying: t³ of a
        // fully-tied multi-million-row group overflows BIGINT, so the
        // cube must be computed in decimal, not merely stored there
        sum(t.cast("decimal(38,0)") * t.cast("decimal(38,0)") *
          t.cast("decimal(38,0)") - t.cast("decimal(38,0)"))
          .as("__ties"))
    val n1 = col("n_base")
    val n2 = col("n_cur")
    val nn = n1 + n2
    val oneSided = n1 === 0L || n2 === 0L
    // exact in decimal throughout (n1·(n1+1) also passes 2^63 past
    // ~3·10⁹ baseline rows); the OUTPUT u_half column stays BIGINT —
    // u_half = 2U ≤ 2·n1·n2, in-range for any group a single report
    // row can describe, and changing the column type would break every
    // downstream schema
    val uHalf = col("__r1_2") -
      n1.cast("decimal(38,0)") * (n1 + lit(1L)).cast("decimal(38,0)")
    val nD = nn.cast("double")
    // n1·n2 also passes 2^63 for two ~3·10⁹-row sides — multiply in
    // decimal, round to double once (same value as long→double where
    // both are defined)
    val n12 = (n1.cast("decimal(38,0)") * n2.cast("decimal(38,0)"))
      .cast("double")
    val sigma2 = n12 / 12.0 *
      ((nn + lit(1L)).cast("double") -
        col("__ties").cast("double") / (nD * (nD - 1.0)))
    val z = (uHalf.cast("double") / 2.0 - n12 / 2.0) / sqrt(sigma2)
    val zSafe = when(oneSided || nn < 2L || sigma2 <= 0.0,
      lit(null).cast("double")).otherwise(z)
    agg.select(groupCols.map(col) ++ Seq(
      n1, n2,
      when(oneSided, lit(null).cast("long"))
        .otherwise(uHalf.cast("long")).as("u_half"),
      when(oneSided, lit(null).cast("double"))
        .otherwise(round(uHalf.cast("double") / 2.0, 1)).as("u"),
      round(zSafe, 6).as("z"),
      when(oneSided, lit(true))
        .otherwise(coalesce(abs(zSafe) > zAlpha, lit(false)))
        .as("drifted")): _*)
  }

  /** Mergeable per-shard quantile sketches
    * ([[graft.expressions.KllQuantile]]): per (group cols × shard) a
    * KLL sketch of `value` plus an exact count — the quantile row of
    * the corpus-datasheet algebra (HLL covers distincts; counts are
    * additive; percentiles are NEITHER, so a standing "p95 doc length
    * per language" that updates per ingest batch without rescanning
    * history needs a mergeable sketch). Shards build independently —
    * one scan of the batch each — and combine under
    * [[mergeQuantileShards]] in any merge tree.
    */
  def quantileShards(
      df: DataFrame, groupCols: Seq[String], value: Column,
      shard: Column, k: Int = 8192): DataFrame = {
    val rows = df
      .select(groupCols.map(col) ++ Seq(shard.as("__shard"),
        value.cast("double").as("__v")): _*)
      .where(col("__v").isNotNull)
    rows.groupBy((groupCols.map(col) :+ col("__shard")): _*)
      .agg(count(lit(1)).as("n"),
        graft.expressions.KllQuantile.kllSketch(k)(col("__v"))
          .as("q_sketch"))
  }

  /** Merge shard quantile sketches to per-group quantiles at the given
    * ranks (columns `p<rank·100>`, e.g. `p50`, `p95`) plus the exact
    * merged count. Sketch-union is order-independent; in the exact
    * regime (group size below the sketch's first compaction) each
    * emitted quantile is the exact INCLUSIVE order statistic — the
    * smallest value whose cumulative fraction ≥ rank.
    */
  /** Column name for a quantile rank: whole percents keep the short
    * `p50`/`p95` form; fractional percents append the fraction after
    * an underscore (`0.995` → `p99_5`, `0.501` → `p50_1`) so ranks
    * that round to the same integer percent can no longer collide
    * into duplicate column names (an AnalysisException downstream).
    */
  private[quality] def rankColName(r: Double): String = {
    val hundredths = math.round(r * 10000) // percent × 100
    val whole = hundredths / 100
    val frac = hundredths % 100
    if (frac == 0L) s"p$whole"
    else if (frac % 10 == 0L) s"p${whole}_${frac / 10}"
    else s"p${whole}_$frac"
  }

  def mergeQuantileShards(
      shards: DataFrame, groupCols: Seq[String],
      ranks: Seq[Double], k: Int = 8192): DataFrame = {
    require(ranks.nonEmpty, "at least one rank")
    val names = ranks.map(rankColName)
    require(names.distinct.size == names.size,
      s"ranks collide after naming: ${names.mkString(", ")}")
    val merged = shards.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        graft.expressions.KllQuantile.kllUnion(k)(col("q_sketch"))
          .as("__m"))
    val qCols = ranks.zip(names).map { case (r, nm) =>
      graft.expressions.KllQuantile.kllQuantile(col("__m"), r).as(nm)
    }
    merged.select(groupCols.map(col) ++ (col("n") +: qCols): _*)
  }

  /** Sketch-PRESERVING shard compaction (the
    * [[graft.text.TextAnalysis.compactDatasheetShards]] analogue):
    * many shard rows collapse to one valid shard row per group, so
    * compaction composes with further appends and merges under the
    * same algebra.
    */
  def compactQuantileShards(
      shards: DataFrame, groupCols: Seq[String], shardId: Long,
      k: Int = 8192): DataFrame =
    shards.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        graft.expressions.KllQuantile.kllUnion(k)(col("q_sketch"))
          .as("q_sketch"))
      .select(groupCols.map(col) ++ Seq(lit(shardId).as("__shard"),
        col("n"), col("q_sketch")): _*)

  /** Entropic optimal transport between two categorical distributions
    * (Sinkhorn–Knopp, Cuturi 2013) with a caller-supplied cell cost —
    * the drift reading the whole divergence shelf can't give: PSI/KS/
    * χ² say "mass moved", the transport PLAN says mass moved FROM
    * category i TO category j and prices it by the cost matrix (for
    * ordinal categories, |i−j| makes the earth-mover reading exact).
    * Sinkhorn is IPF ([[graft.operators.Analytics.ipfRaking]]) on the
    * Gibbs kernel K = exp(−c/ε): alternately scale rows to P and
    * columns to Q.
    *
    * Exact micro fixed-point: the ONLY transcendental is the kernel
    * itself, quantized ONCE per cell (`floor(exp(−c/ε)·1e6)` —
    * mirrored token-for-token); masses quantize to micro shares; each
    * half-step is `u' = (p·1e12) div Σⱼ K·v` (resp. v'), all exact
    * BIGINT/DECIMAL — so the oracle replays the iteration as
    * generated CTEs and every u, v, plan cell, and the OT cost are
    * bit-identical. Positive operands throughout (div == floor).
    *
    * Scale shape: two grouped scans build the marginal counts;
    * everything after lives on the |A|×|B| cell domain (the kernel, 6
    * half-steps of domain-sized joins, the plan/cost assembly).
    *
    * `src`/`dst`: (label, cnt) frames; `costOf(i, j)` must be a pure
    * Column arithmetic over the two label columns (mirrorable in
    * SQL). Returns per-cell rows with the transport plan in micro
    * mass units plus the global `ot_cost_micro` (Σ plan·cost,
    * cost-weighted micro mass).
    */
  def sinkhornTransport(
      src: DataFrame, dst: DataFrame,
      costOf: (Column, Column) => Column,
      epsInverse: Int = 2, iters: Int = 3): DataFrame = {
    require(iters >= 1, "sinkhornTransport: iters must be >= 1")
    val p = src.select(col("label").as("__i"),
      col("cnt").cast("long").as("__pc"))
    val q = dst.select(col("label").as("__j"),
      col("cnt").cast("long").as("__qc"))
    val pt = p.agg(sum(col("__pc")).as("__ptot"))
    val qt = q.agg(sum(col("__qc")).as("__qtot"))
    val pm = p.crossJoin(broadcast(pt))
      .select(col("__i"), expr("(__pc * 1000000) div __ptot")
        .as("__p"))
    val qm = q.crossJoin(broadcast(qt))
      .select(col("__j"), expr("(__qc * 1000000) div __qtot")
        .as("__q"))
    val cells = pm.crossJoin(qm)
      .withColumn("__c", costOf(col("__i"), col("__j")).cast("long"))
      .withColumn("__kk",
        floor(exp(-col("__c").cast("double") * epsInverse) * 1e6)
          .cast("long"))
      .localCheckpoint(true)
    var u = pm.select(col("__i"), lit(1000000L).as("__u"))
    var v = qm.select(col("__j"), lit(1000000L).as("__v"))
    // cells already carries __p/__q from the marginal cross — no
    // re-join against pm/qm (it would duplicate the columns)
    for (_ <- 1 to iters) {
      u = cells.join(v, Seq("__j"))
        .groupBy(col("__i"), col("__p"))
        .agg(sum(col("__kk").cast("decimal(38,0)") * col("__v"))
          .as("__kv"))
        .select(col("__i"), expr(
          "CAST((CAST(__p AS DECIMAL(38,0)) * 1000000000000) " +
            "div __kv AS BIGINT)").as("__u"))
        .localCheckpoint(true)
      v = cells.join(u, Seq("__i"))
        .groupBy(col("__j"), col("__q"))
        .agg(sum(col("__kk").cast("decimal(38,0)") * col("__u"))
          .as("__ku"))
        .select(col("__j"), expr(
          "CAST((CAST(__q AS DECIMAL(38,0)) * 1000000000000) " +
            "div __ku AS BIGINT)").as("__v"))
        .localCheckpoint(true)
    }
    val plan = cells.join(u, Seq("__i")).join(v, Seq("__j"))
      .withColumn("__plan", expr(
        "((CAST(__u AS DECIMAL(38,0)) * __kk div 1000000) * __v) " +
          "div 1000000"))
      .withColumn("__pc2",
        (col("__plan") * col("__c")).cast("decimal(38,0)"))
    val total = plan.agg(sum(col("__pc2")).as("__tc"))
    plan.crossJoin(broadcast(total))
      .select(col("__i").as("src_label"), col("__j").as("dst_label"),
        col("__c").as("cost"),
        col("__plan").cast("long").as("plan_micro"),
        expr("CAST(__tc AS BIGINT)").as("ot_cost_micro"))
  }
}
