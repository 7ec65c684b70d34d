package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-layout operators for training pipelines: token-budget shard
  * packing (the "concat-then-chunk" sequence-packing shape LLM
  * pretraining uses) and per-group token-budget selection (spend a
  * token budget per language/source on the highest-quality documents).
  *
  * Both are deterministic — id-ordered, hash-free — so the shard a
  * document lands in today is the shard it lands in on every rerun
  * and on every engine.
  */
object Packing {

  /** Token-budget shard packing: documents are laid end-to-end in
    * ascending id order and the token stream is cut into
    * `budget`-token shards; each document is assigned to the shard
    * its FIRST token lands in (documents may straddle a boundary —
    * exactly the concat-then-chunk semantics of sequence packing, so
    * shard token sums hover at `budget` instead of undershooting).
    * Adds `token_offset` (the document's global start offset in the
    * concatenated token stream) and `shard`.
    *
    * Scale: a single global cumulative sum would be one unbounded
    * window partition — the classic non-scalable shape. This is the
    * PARTITIONED prefix sum instead: ids are cut into
    * `bucketWidth`-wide coarse ranges, each bucket's internal cumsum
    * runs partition-parallel, and only the per-bucket totals (one row
    * per bucket) pass through the tiny single-partition offset cumsum
    * that stitches buckets together. The unbounded window touches
    * #buckets rows, never the corpus.
    *
    * Null/absent token counts count as 0 (they advance no offset).
    */
  def packIntoShards(
      df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!df.columns.exists(Set("__bkt", "__cum", "__off")),
      "input must not have columns named __bkt, __cum or __off")
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    // persisted: the bucketed projection feeds the within-bucket
    // cumsum AND the bucket-totals aggregate — without it both legs
    // re-scan the corpus (and recompute any upstream token-count
    // expression) once each
    val withB = df.withColumn("__bkt",
      floor(col(idCol).cast("long") / lit(bucketWidth)).cast("long"))
      .transform(graft.core.CacheScope.disk)
    // partition-parallel inclusive cumsum within each id bucket
    val inBkt = Window.partitionBy("__bkt").orderBy(col(idCol).asc)
    val cum = withB.withColumn("__cum", sum(tok).over(inBkt))
    // bucket offsets: one row per bucket through the only unbounded
    // window (tiny by construction); AQE broadcasts it back
    val offW = Window.orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy("__bkt").agg(sum(tok).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .select("__bkt", "__off")
    cum.join(offsets, Seq("__bkt"))
      .withColumn("token_offset", col("__off") + col("__cum") - tok)
      .withColumn("shard",
        floor(col("token_offset") / lit(budget.toDouble)).cast("long"))
      .drop("__bkt", "__cum", "__off")
  }

  /** Per-group token-budget selection: within each group (language,
    * source, domain), walk documents in `orderBy` order (best first)
    * and keep them while the INCLUSIVE running token total stays
    * ≤ `budget` — i.e. spend each group's token budget on its best
    * documents. Strict-budget semantics: a document that would
    * overflow the budget is excluded even if some budget remains (and
    * a document larger than the whole budget is never kept) — a
    * training mix that must not exceed per-source token quotas wants
    * the hard bound, not best-effort.
    *
    * One shuffle on the group key + per-group window sort. Group
    * cardinality bounds the sort partitions; for pathological
    * single-group corpora, pre-split the group or raise
    * parallelism upstream.
    */
  def takeUntilBudget(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      tokenCol: String, budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(budget > 0, "budget must be positive")
    require(!df.columns.contains("__cum"),
      "input must not have a column named __cum")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderBy: _*)
    df.withColumn("__cum",
      sum(coalesce(col(tokenCol).cast("long"), lit(0L))).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }
}
