package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as plain DataFrame aggregation — the mergeable
  * frequency sketch that estimates per-item counts in fixed space
  * (Cormode–Muthukrishnan), completing the engine's sketch shelf
  * (Bloom = membership, HLL = distincts, KLL = quantiles, CMS =
  * frequencies). The use at 100 TB: per-token / per-entity frequency
  * tracking over a stream or sharded corpus WITHOUT materializing the
  * vocabulary — state is a `depth × width` integer grid per shard, no
  * matter how many distinct items flow through.
  *
  * Representation: one row per non-empty grid cell `(d, w_idx, cnt)`.
  * Row `d`'s hash is md5-derived (`md5("cms<d>:" || item)` first 8 hex
  * chars mod width) — engine-portable, so a DuckDB oracle replays the
  * sketch bit-for-bit. Cells are exact integer counts: shards build
  * with one map-side-combined aggregation each, merge by cell-wise
  * sum (order-independent, associative — any merge tree), and the
  * estimate for an item is `min_d cnt[d][hash_d(item)]` with absent
  * cells counting 0. The classic guarantee holds exactly: the
  * estimate never undercounts, and overcounts only by hash-collision
  * mass (≤ εN with probability 1−δ at width = ⌈e/ε⌉, depth =
  * ⌈ln 1/δ⌉).
  */
object CountMin {

  private def bucket(d: Column, item: Column, width: Int): Column =
    conv(substring(md5(
      concat(lit("cms"), d.cast("string"), lit(":"), item)), 1, 8),
      16, 10).cast("long") % width

  /** Per-shard sketch grid: `(__shard, d, w_idx, cnt)` — one scan of
    * the batch, the explode fans each item to `depth` narrow rows that
    * collapse map-side to at most `depth × width` cells per partition
    * before the shuffle. Null items are excluded (count them
    * separately if they matter).
    */
  def cmsShards(
      df: DataFrame, item: Column, shard: Column,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth in [1, 16]")
    require(width >= 16 && width <= (1 << 20), "width in [16, 2^20]")
    df.select(shard.as("__shard"), item.cast("string").as("__v"))
      .where(col("__v").isNotNull)
      .select(col("__shard"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"), col("__v"))
      .select(col("__shard"), col("d"),
        bucket(col("d"), col("__v"), width).as("w_idx"))
      .groupBy(col("__shard"), col("d"), col("w_idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge shard grids to the corpus sketch: cell-wise sum. */
  def mergeCmsShards(shards: DataFrame): DataFrame =
    shards.groupBy(col("d"), col("w_idx"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Shard-preserving compaction: many shard rows collapse to one
    * valid shard (cell-wise sum under `shardId`), so compaction
    * composes with further appends and merges — the datasheet/KLL
    * treatment.
    */
  def compactCmsShards(shards: DataFrame, shardId: Long): DataFrame =
    shards.groupBy(col("d"), col("w_idx"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(lit(shardId).as("__shard"), col("d"), col("w_idx"),
        col("cnt"))

  /** Point estimates for a probe set: `est = min_d cnt[d][hash_d]`,
    * absent cells = 0. The merged grid is at most `depth × width`
    * rows — broadcast — so probing any number of items is one
    * broadcast join, no shuffle of the probe side. `depth`/`width`
    * must match the build (the hash seeds are positional).
    */
  def cmsEstimate(
      merged: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 512): DataFrame =
    items
      .select(col(itemCol))
      .where(col(itemCol).isNotNull)
      .select(col(itemCol),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("w_idx",
        bucket(col("d"), col(itemCol).cast("string"), width))
      .join(broadcast(merged), Seq("d", "w_idx"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
