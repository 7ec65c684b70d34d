package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters as a MERGEABLE shard store — the
  * deterministic-guarantee sibling of [[CountMin]] on the sketch
  * shelf (Bloom = membership, HLL = distincts, KLL = quantiles,
  * CMS = frequencies-by-hash, MG = top-frequency candidates), under
  * the same shard algebra as the datasheet/KLL/CMS families: build a
  * bounded summary per shard, merge shards pairwise/any-tree, compact
  * shards into one, verify exactly at the end.
  *
  * Shard representation: `(__shard, value, wt)` — the residual MG
  * counters of that shard's items (≤ k rows per shard; weights are
  * lower bounds on the shard-local true counts). Merging sums
  * counters by value then applies the counter-subtraction rule of
  * Agarwal et al., "Mergeable Summaries" (PODS 2012): subtract the
  * (k+1)-th largest combined weight from everything, drop the
  * non-positive. The union bound survives any merge tree: after
  * merging shards covering N total items, every value with true count
  * > N/(k+1) is present.
  *
  * Determinism contract: the COUNTER VALUES depend on encounter order
  * (inherent to MG), so shard maps are not reproducible across
  * partitionings — but the candidate-retention guarantee is, and
  * [[verifyHeavyHitters]]'s exact second pass makes the final result
  * fully deterministic: candidates are re-counted exactly and cut at
  * the caller's threshold, so sketch noise can neither add a
  * below-threshold value nor (by the retention bound) lose a true
  * heavy hitter. The oracle for the end-to-end query is therefore
  * plain `GROUP BY` SQL — no sketch replay needed.
  */
object HeavyHitters {

  /** Per-shard MG counter rows `(__shard, value, wt)`: one bounded
    * aggregation — partial buffers hold ≤ k counters per partition
    * ([[graft.expressions.MisraGriesCounters]]), so the shuffle
    * payload is ≤ k rows per partition regardless of distinct-value
    * count. Nulls carry no frequency information and are skipped.
    */
  def mgShards(
      df: DataFrame, item: Column, shard: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    df.select(shard.as("__shard"), item.cast("string").as("__v"))
      .groupBy("__shard")
      .agg(graft.expressions.MisraGriesSketch.counters(k)(col("__v"))
        .as("__m"))
      .select(col("__shard"), explode(col("__m")).as(Seq("value", "wt")))
  }

  /** Merge shard rows into one ≤ k-counter summary: sum by value,
    * then the PODS-2012 subtraction — `cut` = the (k+1)-th largest
    * combined weight (0 if fewer than k+1 values survive the sum),
    * computed as a broadcast one-row frame off a `limit(k+1)`
    * TakeOrdered, never a global sort or a driver collect.
    */
  def mergeMgShards(shards: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val combined = shards.groupBy("value").agg(sum(col("wt")).as("wt"))
      .transform(graft.core.CacheScope.disk)
    val cut = combined.orderBy(col("wt").desc).limit(k + 1)
      .agg(when(count(lit(1)) === k + 1, min(col("wt")))
        .otherwise(lit(0L)).as("__cut"))
    combined.crossJoin(broadcast(cut))
      .where(col("wt") > col("__cut"))
      .select(col("value"), (col("wt") - col("__cut")).as("wt"))
  }

  /** Shard-preserving compaction: merged counters re-tagged as one
    * valid shard, so compaction composes with further appends and
    * merges (the datasheet/KLL/CMS treatment).
    */
  def compactMgShards(
      shards: DataFrame, k: Int, shardId: Long): DataFrame =
    mergeMgShards(shards, k)
      .select(lit(shardId).as("__shard"), col("value"), col("wt"))

  /** Exact second pass: re-count ONLY candidate-matching rows and keep
    * those above `minFraction` of the total. Soundness requires
    * `minFraction ≥ 1/(k+1)` (enforced): below that, the sketch's
    * retention bound no longer covers the threshold and a true heavy
    * hitter could be missing from `merged`. Both engines compare
    * `cnt > minFraction · N` in double (same multiply form as the
    * oracle, so boundary rounding is identical).
    *
    * Returns `(item, cnt, frac)`, exact — the candidate join is a
    * broadcast of ≤ k values; the grouped count collapses map-side to
    * ≤ k groups.
    */
  def verifyHeavyHitters(
      rows: DataFrame, itemCol: String, merged: DataFrame,
      minFraction: Double, k: Int): DataFrame = {
    require(minFraction > 0 && minFraction < 1,
      s"minFraction must be in (0, 1), got $minFraction")
    require(minFraction * (k + 1) >= 1.0,
      s"minFraction=$minFraction below the retention bound 1/(k+1) " +
        s"for k=$k: candidates are not guaranteed complete")
    val n1 = rows.agg(count(col(itemCol)).as("__n"))
    rows.select(col(itemCol))
      .join(broadcast(merged.select(col("value").as(itemCol))),
        Seq(itemCol))
      .groupBy(itemCol)
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n1))
      .where(col("cnt").cast("double") >
        lit(minFraction) * col("__n").cast("double"))
      .select(col(itemCol), col("cnt"),
        round(col("cnt").cast("double") / col("__n").cast("double"), 6)
          .as("frac"))
  }
}
