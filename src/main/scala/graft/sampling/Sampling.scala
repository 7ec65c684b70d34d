package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-splitting operators for
  * training-data pipelines: hash-based train/val/test splits, exact
  * stratified samples, and per-group samples.
  *
  * Everything here keys on a content hash (md5 of a salt + the row's
  * id), never on `rand()` or row position:
  *   - reproducible across runs, engines, partitionings, and cluster
  *     sizes — the split a 100 TB job computes today is the split it
  *     recomputes next month;
  *   - rows keep their assignment when the table grows (new ids hash
  *     independently), so incremental pipelines never reshuffle old
  *     rows between train and test — the property position-based or
  *     rand()-based splits cannot give;
  *   - salt changes produce an independent resample.
  *
  * Scale: [[splitColumn]] / [[hashSplit]] are pure column expressions
  * (no shuffle, whole-stage codegen); [[stratifiedSampleExact]] and
  * [[perGroupSample]] pay one shuffle on the stratum key with a
  * per-partition sort — their hash-threshold variant
  * [[stratifiedSampleByHash]] is shuffle-free and the 100 TB default
  * when exact per-stratum counts aren't mandated.
  */
object Sampling {

  /** Uniform [0, 1) hash of a row id: first 8 hex chars of
    * md5(salt || id) scaled by 2^32 — engine-portable (DuckDB md5 of
    * the same string yields the same hex) and uniform to ~9 decimal
    * digits, plenty for split fractions.
    */
  def hashFraction(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long") / lit(4294967296.0)

  /** Split-label column: assigns each row to the first split whose
    * cumulative weight bound exceeds the row's [[hashFraction]].
    * `splits` are (label, weight) with weights summing to ~1.0 (the
    * last split absorbs rounding).
    */
  def splitColumn(
      id: Column, splits: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(splits.nonEmpty, "at least one split")
    val h = hashFraction(id, salt)
    // pin cumulative bounds to 9 decimals: 0.8 + 0.1 accumulates to
    // 0.9000000000000001 in binary, and the bound must equal the
    // literal another engine would write (h's 2^-32 granularity can't
    // distinguish them, but the pinned value removes the question)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(b => math.rint(b * 1e9) / 1e9)
    val init: Column = lit(splits.last._1)
    splits.init.zip(bounds.init).reverse.foldLeft(init) {
      case (acc, ((label, _), bound)) => when(h < bound, label).otherwise(acc)
    }
  }

  /** Tag every row with its split label (e.g. train/val/test). Pure
    * projection — no shuffle, no action, stable under any partitioning.
    */
  def hashSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits, salt))

  /** Approximate stratified sample: keeps each row whose
    * [[hashFraction]] < `fraction`, independently per row. Per-stratum
    * counts are binomial around fraction·n (not exact), but the
    * operator is a shuffle-free scan — the scale default.
    */
  def stratifiedSampleByHash(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    df.where(hashFraction(col(idCol), salt) < fraction)

  /** EXACT stratified sample: for each stratum, keeps exactly
    * ceil(fraction · stratum_size) rows — the ones with the smallest
    * hash (deterministic, id tie-break). One shuffle on the stratum
    * key + per-partition sort; prefer [[stratifiedSampleByHash]] when
    * binomial counts are acceptable.
    */
  def stratifiedSampleExact(
      df: DataFrame, idCol: String, stratumCols: Seq[String],
      fraction: Double, salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(hashFraction(col(idCol), salt).asc, col(idCol).asc)
    val cw = Window.partitionBy(stratumCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .where(col("__rn") <= ceil(col("__n") * lit(fraction)))
      .drop("__rn", "__n")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-RES): each row gets the key ln(u)/w with
    * u = [[hashFraction]] and w = its weight; the k largest keys are
    * the sample, so inclusion probability scales with weight while
    * membership stays pinned by the hash — reproducible across runs,
    * engines, and partitionings, like every sampler here. Rows with
    * null or non-positive weight are excluded.
    *
    * Scale: the top-k plans as TakeOrderedAndProject (per-partition
    * top-k, k·partitions rows to the driver merge) — no global sort,
    * no shuffle of the corpus.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k >= 1, "k must be positive")
    require(!df.columns.contains("__wkey"),
      "input must not have a column named __wkey")
    val w = col(weightCol).cast("double")
    df.where(w.isNotNull && w > 0)
      .withColumn("__wkey", log(hashFraction(col(idCol), salt)) / w)
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }

  /** Deterministic n-per-group sample (the distributed analogue of
    * reservoir sampling with a fixed seed): the `n` rows with the
    * smallest hash in each group. One shuffle on the group key.
    */
  def perGroupSample(
      df: DataFrame, idCol: String, groupCols: Seq[String], n: Int,
      salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashFraction(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }
}
