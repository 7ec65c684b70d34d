package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned-model-shaped quality scoring: a logistic (sigmoid) linear
  * classifier over cheap, fully-declarative text features — the
  * "fastText-style quality filter" stage of a training-data pipeline,
  * expressed so the entire scoring pass is map-only column arithmetic
  * inside whole-stage codegen (no UDF, no shuffle, no model server).
  *
  * Weights are supplied by the caller (trained offline, or heuristic);
  * the FEATURES are fixed and documented so a model trained against
  * them scores identically here and in any other engine implementing
  * the same definitions.
  */
object QualityModel {

  /** Classifier weights: one per named feature plus bias. Unknown
    * feature names are rejected up front rather than silently ignored.
    */
  final case class Weights(
      byFeature: Map[String, Double], bias: Double) {
    require(
      byFeature.keySet.subsetOf(featureNames.toSet),
      s"unknown features: ${byFeature.keySet -- featureNames.toSet} " +
        s"(known: ${featureNames.mkString(", ")})")
  }

  /** The fixed feature vector (all null-safe, all in stable ranges):
    *   - `log_tokens`: ln(1 + token count) — volume, dampened
    *   - `punct_ratio`: punctuation chars / all chars (0 on empty)
    *   - `stop_ratio`: stopword tokens / tokens (0 on empty)
    *   - `mean_word_len`: alnum chars / tokens (0 on empty)
    */
  val featureNames: Seq[String] =
    Seq("log_tokens", "punct_ratio", "stop_ratio", "mean_word_len")

  def features(text: Column): Map[String, Column] = {
    val tokens = TextAnalysis.tokenCount(text).cast("double")
    Map(
      "log_tokens" -> log1p(tokens),
      "punct_ratio" -> coalesce(TextAnalysis.punctRatio(text), lit(0.0)),
      "stop_ratio" ->
        coalesce(TextAnalysis.stopwordRatio(text), lit(0.0)),
      "mean_word_len" ->
        coalesce(
          length(regexp_replace(lower(text), "[^a-z0-9]", ""))
            .cast("double") / nullif(tokens, lit(0.0)),
          lit(0.0)))
  }

  /** σ(w·x + b) in double precision. Feature order in the dot product
    * is the fixed [[featureNames]] order, so summation is
    * deterministic and engine-reproducible.
    */
  def score(text: Column, w: Weights): Column = {
    val fs = features(text)
    val z = featureNames
      .flatMap(n => w.byFeature.get(n).map(lit(_) * fs(n)))
      .foldLeft(lit(w.bias): Column)(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Adaptive per-group quality floor: each group keeps only rows at or
    * above its own `p`-quantile of `scoreCol` — per-language (or
    * per-source) cutoffs instead of one global threshold, so a
    * low-resource language is not filtered by a high-resource
    * language's score distribution.
    *
    * By default the cutoff is `percentile_approx` (Greenwald–Khanna
    * sketch: bounded aggregation state per group regardless of group
    * size — the only shape that survives a dominant language holding
    * half a 100 TB corpus; rank error ≤ group_size/approxAccuracy, and
    * the sketch returns an actual data value). `exact = true` swaps in
    * Spark's exact interpolated `percentile` — an unbounded-state
    * aggregate that buffers every score of a group in one buffer, for
    * moderate cardinalities and cross-engine oracle checks where the
    * interpolated definition must match bit-for-bit.
    *
    * Either way: one shuffle on the group key; the cutoff table is one
    * narrow row per group and joins back without a broadcast hint
    * (group cardinality is data-dependent — AQE broadcasts it when
    * actually small). Rows in groups absent from the cutoff table
    * cannot exist (the cutoffs are computed FROM the data), so the
    * inner join loses nothing; null group keys form a group of their
    * own via the null-safe join.
    *
    * Returns the kept rows with their group's `cutoff` column appended.
    */
  def adaptiveQualityFloor(
      df: DataFrame, groupCol: String, scoreCol: String,
      p: Double, exact: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0, 1), got $p")
    require(!df.columns.contains("cutoff") && !df.columns.contains("__g"),
      "input must not have columns named cutoff or __g")
    val cut =
      if (exact) percentile(col(scoreCol), lit(p))
      else percentile_approx(col(scoreCol), lit(p), lit(approxAccuracy))
    val cutoffs = df
      .groupBy(col(groupCol).as("__g"))
      .agg(cut.cast("double").as("cutoff"))
    df.join(cutoffs, col(groupCol) <=> col("__g"))
      .where(col(scoreCol) >= col("cutoff"))
      .drop("__g")
  }

  /** Calibration (reliability) report for a probabilistic classifier:
    * scores in [0, 1] bucket into `bins` equal-width bins; per bin
    * the row count, mean predicted score, empirical positive rate,
    * the calibration gap, and the bin's contribution to expected
    * calibration error (ECE = Σ |gap|·n/N) — the standing audit that
    * tells a pipeline whether "quality ≥ 0.9" means what the
    * threshold assumes before millions of documents are kept or
    * dropped by it.
    *
    * Determinism at scale: mean score is NOT a float sum (partial
    * aggregation order varies by partitioning) — scores quantize to
    * integer micro-units per row (`floor(score·10⁶)`, the q153/DSIR
    * treatment) and the bin sums are exact BIGINT; every emitted
    * double is a single division/subtraction of exact integers, so
    * any engine and any partitioning produce identical bytes. One
    * scan, one bins-sized aggregation; the total-rows scalar rides a
    * broadcast one-row frame. Scores exactly 1.0 fold into the top
    * bin; null scores or labels are excluded (reported upstream by
    * completeness rules, not silently binned).
    */
  /** ROC-AUC of a score against a binary label, per group — the
    * ranking-power companion of [[calibrationReport]]'s honesty check:
    * calibration says the score's VALUES mean what they claim, AUC
    * says its ORDER separates the classes. Computed by the exact
    * Mann–Whitney rank identity — scores micro-floored, pooled
    * tie-averaged half-unit ranks from per-(group, score) counts,
    * AUC = (R2₊ − n₊(n₊+1)) / (2·n₊·n₋) — every numerator an exact
    * integer (DECIMAL products), one mirrored double division; Gini
    * = 2·AUC − 1 from the same division. Groups with a single class
    * emit null (nothing to separate).
    *
    * Scale: one grouped count to (group, score) cells, one window
    * over them (score-domain-sized), group-sized arithmetic after.
    */
  def rocAuc(
      df: DataFrame, groupCols: Seq[String], scoreCol: Column,
      label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val sc = df.where(scoreCol.isNotNull && label.isNotNull)
      .select(groupCols.map(col) ++ Seq(
        floor(scoreCol * 1000000.0).cast("long").as("__s"),
        label.cast("int").cast("long").as("__p")): _*)
    val per = sc.groupBy(groupCols.map(col) :+ col("__s"): _*)
      .agg(sum(col("__p")).as("__cp"),
        (count(lit(1)) - sum(col("__p"))).as("__cn"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("__cp") + col("__cn")
    val ranked = per
      .withColumn("__bef", coalesce(sum(t).over(w), lit(0L)))
      .withColumn("__rank2", lit(2L) * col("__bef") + t + 1L)
    val agg = ranked.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cp")).as("n_pos"),
        sum(col("__cn")).as("n_neg"),
        sum(dec(col("__cp")) * dec(col("__rank2"))).as("__r2p"))
    val np = col("n_pos"); val nn = col("n_neg")
    val auc = (col("__r2p") - dec(np) * dec(np + 1L)).cast("double") /
      (dec(np) * dec(nn) * lit(2L).cast("decimal(38,0)"))
        .cast("double")
    val aucSafe = when(np === 0L || nn === 0L,
      lit(null).cast("double")).otherwise(auc)
    agg.select(groupCols.map(col) ++ Seq(
      np, nn,
      round(aucSafe, 6).as("auc"),
      round(aucSafe * 2.0 - 1.0, 6).as("gini")): _*)
  }

  def calibrationReport(
      df: DataFrame, scoreCol: String, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val s = col(scoreCol).cast("double")
    val rows = df
      .where(s.isNotNull && label.isNotNull)
      .select(
        least(floor(s * bins).cast("int"), lit(bins - 1)).as("bin"),
        floor(s * 1000000L).cast("long").as("__micro"),
        label.cast("int").cast("long").as("__pos"))
    val perBin = rows.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("__micro")).as("__sum_micro"),
        sum(col("__pos")).as("n_positive"))
    val total = perBin.agg(sum(col("n")).as("__total"))
    perBin.crossJoin(broadcast(total))
      .select(col("bin"), col("n"), col("n_positive"),
        (col("__sum_micro").cast("double") /
          (col("n") * 1000000L)).as("mean_score"),
        (col("n_positive").cast("double") / col("n"))
          .as("frac_positive"),
        ((col("__sum_micro").cast("double") / (col("n") * 1000000L)) -
          (col("n_positive").cast("double") / col("n"))).as("gap"),
        (abs((col("__sum_micro").cast("double") /
          (col("n") * 1000000L)) -
          (col("n_positive").cast("double") / col("n"))) *
          col("n") / col("__total")).as("ece_contrib"))
  }

  /** Murphy decomposition of the Brier score per group:
    * Brier = reliability − resolution + uncertainty (+ the within-bin
    * variance the binned form leaves behind, emitted as `wb_gap` so
    * the identity is AUDITABLE, not asserted). The calibration
    * reading [[calibrationReport]]'s ECE can't give: ECE says "the
    * bins are off by X on average"; this says how much of the score's
    * total error is MISCALIBRATION (reliability — fixable by
    * isotonic/Platt recalibration, q199's job) vs missing
    * DISCRIMINATION (low resolution — no recalibration can help, the
    * model needs features) vs irreducible base-rate noise
    * (uncertainty).
    *
    * Exactness: scores micro-floored, so the raw Brier numerator
    * Σ(p_µ − o·10⁶)² is an exact DECIMAL integer; the per-bin
    * reliability/resolution numerators are exact integers divided
    * once per bin and nano-floored before the order-free sums; one
    * mirrored double division each at the end.
    * Scale: one row pass (grouped moments), bin-domain arithmetic
    * after — same shape as [[calibrationReport]].
    */
  def brierDecomposition(
      df: DataFrame, groupCols: Seq[String], scoreCol: Column,
      label: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gc = groupCols.map(col)
    val s = scoreCol.cast("double")
    val rows = df
      .where(s.isNotNull && label.isNotNull)
      .select(gc ++ Seq(
        least(floor(s * bins).cast("int"), lit(bins - 1)).as("__bin"),
        floor(s * 1000000L).cast("long").as("__p"),
        label.cast("int").cast("long").as("__o")): _*)
    val perBin = rows.groupBy(gc :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__nk"),
        sum(col("__p")).as("__sp"),
        sum(col("__o")).as("__so"),
        sum((dec(col("__p")) - dec(col("__o")) * 1000000L) *
          (dec(col("__p")) - dec(col("__o")) * 1000000L))
          .as("__sq"))
    val tot = perBin.groupBy(gc: _*)
      .agg(sum(col("__nk")).as("n"), sum(col("__so")).as("__sot"),
        sum(col("__sq")).as("__sqt"))
    val joined = perBin.join(tot, groupCols)
    // reliability numerator per bin: (Sp − So·1e6)²/n_k in µ² units
    val relNum = (dec(col("__sp")) - dec(col("__so")) * 1000000L)
    val relTerm = floor(relNum.cast("double") * relNum.cast("double") /
      col("__nk").cast("double")).cast("decimal(38,0)")
    // resolution numerator per bin: (So_k·N − So·n_k)²/(n_k·N²) in
    // label units — scaled to µ² (×1e12) before the floor
    val resNum = (dec(col("__so")) * dec(col("n")) -
      dec(col("__sot")) * dec(col("__nk")))
    val resTerm = floor(resNum.cast("double") * resNum.cast("double") /
      (col("__nk").cast("double") * col("n").cast("double") *
        col("n").cast("double")) * 1e12).cast("decimal(38,0)")
    val agg = joined
      .withColumn("__rel", relTerm).withColumn("__res", resTerm)
      .groupBy(gc: _*)
      .agg(first(col("n")).as("n"), first(col("__sot")).as("__sot"),
        first(col("__sqt")).as("__sqt"),
        count(lit(1)).as("n_bins"),
        sum(col("__rel")).as("__rels"), sum(col("__res")).as("__ress"))
    val nD = col("n").cast("double")
    val brier = col("__sqt").cast("double") / 1e12 / nD
    val rel = col("__rels").cast("double") / 1e12 / nD
    val res = col("__ress").cast("double") / 1e12 / nD
    val obar = col("__sot").cast("double") / nD
    val unc = obar * (lit(1.0) - obar)
    agg.select(gc ++ Seq(
      col("n"), col("n_bins"),
      round(brier, 6).as("brier"),
      round(rel, 6).as("reliability"),
      round(res, 6).as("resolution"),
      round(unc, 6).as("uncertainty"),
      round(brier - (rel - res + unc), 6).as("wb_gap")): _*)
  }
}
