package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unsupervised multivariate anomaly scoring — the row-level outlier
  * family next to the univariate shelf (robust z q181, generalized
  * ESD q332): HBOS prices each row by how thinly populated its
  * per-feature histogram bins are (features independent — the cheap
  * high-dimensional screen), Mahalanobis prices the 2-D correlation
  * structure exactly (the "price is normal, balance is normal, the
  * COMBINATION is not" detector).
  */
object Anomaly {

  /** Histogram-Based Outlier Score (Goldstein & Dengel 2012) over
    * exact-integer feature columns: each feature is binned into
    * `bins` equal-width buckets between its own min and max
    * (`bin = ((v − min)·bins) div (max − min + 1)` — exact integer
    * arithmetic, every row in [0, bins)), and a row's score is
    * Σ_features [ln N − ln(count_bin · bins)] — the negative log of
    * its bins' relative density, 0 for perfectly uniform features,
    * large when any feature lands in a sparse bin. Each ln is
    * nano-floored ONCE per bin (the q308 device), so scores are exact
    * BIGINT sums and the top-k ranking is float-free.
    *
    * Scale shape: one grouped min/max per feature (map-side
    * combined), one (feature, bin) count — bins·|features| rows —
    * broadcast back over ONE corpus scan; top-k plans as
    * TakeOrderedAndProject. Independence is the POINT of HBOS (linear
    * scan, no covariance); [[mahalanobis2d]] covers the correlated
    * pair case.
    */
  def hbosTopK(
      df: DataFrame, idCol: String, features: Seq[(String, Column)],
      bins: Int = 20, topK: Int = 40): DataFrame = {
    require(features.nonEmpty, "hbosTopK: need at least one feature")
    require(bins >= 2, "hbosTopK: need >= 2 bins")
    val nanoLn = (c: Column) =>
      floor(log(c.cast("double")) * 1e9).cast("long")
    // long layout: one row per (id, feature, value)
    val long = df.select(col(idCol),
        explode(array(features.map { case (name, c) =>
          struct(lit(name).as("__f"), c.cast("long").as("__v"))
        }: _*)).as("__fv"))
      .select(col(idCol), col("__fv.__f").as("__f"),
        col("__fv.__v").as("__v"))
      .where(col("__v").isNotNull)
      .transform(graft.core.CacheScope.disk)
    val ranges = long.groupBy("__f")
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        count(lit(1)).as("__n"))
    val binned = long.join(broadcast(ranges), Seq("__f"))
      .withColumn("__bin",
        expr(s"((__v - __mn) * $bins) div (__mx - __mn + 1)"))
    val binCounts = binned.groupBy("__f", "__bin")
      .agg(count(lit(1)).as("__c"))
      .join(broadcast(ranges.select(col("__f"), col("__n"))),
        Seq("__f"))
      .select(col("__f"), col("__bin"),
        (nanoLn(col("__n")) - nanoLn(col("__c") * lit(bins.toLong)))
          .as("__lterm"))
    binned
      .join(broadcast(binCounts), Seq("__f", "__bin"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(col("__lterm")).as("hbos_nano"))
      .orderBy(col("hbos_nano").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Exact 2-D Mahalanobis outlier ranking: squared distance
    * d² = (n·[Syy·dx² − 2·Sxy·dx·dy + Sxx·dy²]) / (Sxx·Syy − Sxy²)
    * with dx = n·x − Σx (the mean cleared of division), S__ the
    * CENTERED second-moment sums n·Σab − Σa·Σb — every operand an
    * exact DECIMAL(38,0) from one moment pass, ONE mirrored double
    * division per row at the end. Top-k by d² (the χ²₂-distributed
    * score under normality — d² > 13.8 ≈ p < 0.001).
    *
    * Scale shape: one ungrouped moment aggregation (6 sums), the
    * 1-row result broadcast over ONE scan, top-k via
    * TakeOrderedAndProject. The 2-D closed form needs no matrix
    * inversion and no per-row float accumulation.
    */
  def mahalanobis2d(
      df: DataFrame, idCol: String, xCol: Column, yCol: Column,
      topK: Int = 40): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(idCol), xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val m = base.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"),
      sum(dec(col("__x")) * dec(col("__y"))).as("__sxy"),
      sum(dec(col("__y")) * dec(col("__y"))).as("__syy"))
    val n = dec(col("__n"))
    val cxx = n * col("__sxx") - dec(col("__sx")) * dec(col("__sx"))
    val cxy = n * col("__sxy") - dec(col("__sx")) * dec(col("__sy"))
    val cyy = n * col("__syy") - dec(col("__sy")) * dec(col("__sy"))
    val dx = (n * dec(col("__x")) - dec(col("__sx"))).cast("double")
    val dy = (n * dec(col("__y")) - dec(col("__sy"))).cast("double")
    // det in DOUBLE from the (exact) centered sums: cxx·cyy at
    // corpus scale overflows DECIMAL(38,0)/HUGEINT long before the
    // sums themselves do
    val det = cxx.cast("double") * cyy.cast("double") -
      cxy.cast("double") * cxy.cast("double")
    val num = cyy.cast("double") * (dx * dx) -
      lit(2.0) * cxy.cast("double") * (dx * dy) +
      cxx.cast("double") * (dy * dy)
    base.crossJoin(broadcast(m))
      .select(col(idCol), col("__x").as("x"), col("__y").as("y"),
        // d² = n(n−1)·numᵥ/(n²·det) with numᵥ in dx = n·v units:
        // the n² from dx² cancels one n — net (n−1)/(n·det)
        round(when(det > 0.0,
          num * (n.cast("double") - 1.0) /
            (det * n.cast("double"))), 6).as("d2"))
      .orderBy(col("d2").desc_nulls_last, col(idCol).asc)
      .limit(topK)
  }
}
