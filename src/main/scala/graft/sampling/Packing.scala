package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

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
    * Scale: the naive form is `sum(tokens) over (partition by group
    * order by …)` — each group's ENTIRE row set through one
    * window-sort task, so grouping a web corpus by language puts the
    * dominant language (≈ half the corpus) on a single executor.
    * This is the two-phase form instead: a bounded per-group
    * histogram of the primary sort key (`bins` token subtotals per
    * group, never the rows) locates the first bin whose inclusive
    * running total strictly exceeds the budget, and only rows at or
    * before that bin — ~one budget's worth of documents plus one bin
    * of slack, REGARDLESS of group size — reach the exact inclusive
    * window. The prefilter set is downward-closed under the full sort
    * order (the bin index is monotone in the primary key, ties share
    * a bin), so every kept row's running total is computed over
    * exactly its true prefix, and every pruned row's total provably
    * exceeds the budget: results are bit-identical to the naive form,
    * including range-frame tie semantics.
    *
    * The sketch needs a numeric primary sort key (cast-to-double is
    * monotone, so decimals/floats are fine; direction and null
    * ordering are read from the `Column`'s sort order — nulls-first
    * rows are always prefiltered in, nulls-last/NaN rows only when
    * the budget provably reaches them). Groups that fit entirely
    * within the budget cross no bin and skip pruning; negative token
    * counts in a group (running totals no longer monotone) disable
    * that group's cut; a non-numeric primary key falls back to the
    * exact single-window form for the whole frame.
    */
  def takeUntilBudget(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      tokenCol: String, budget: Long, bins: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(budget > 0, "budget must be positive")
    require(bins >= 2, "bins must be at least 2")
    val reserved = Set("__cum", "__bin", "__cross", "__rawcross",
      "__kmin", "__kmax", "__btok", "__btokmin", "__tokmin", "__run") ++
      groupCols.flatMap(c => Seq("__g_" + c, "__h_" + c))
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val pruned = budgetPrune(df, groupCols, orderBy, tokenCol, budget, bins)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderBy: _*)
    pruned.withColumn("__cum",
      sum(coalesce(col(tokenCol).cast("long"), lit(0L))).over(w))
      .where(col("__cum") <= budget)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Phase 1 of [[takeUntilBudget]]: filter `df` to a downward-closed
    * (under the full `orderBy` order) superset of each group's
    * budget prefix, bounded per group by the budget-crossing bin of a
    * `bins`-bucket token histogram over the primary sort key. Returns
    * `df` unchanged when the primary key is non-numeric (exact-path
    * fallback). Package-private so specs can assert boundedness.
    */
  private[sampling] def budgetPrune(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      tokenCol: String, budget: Long, bins: Int): DataFrame = {
    val (firstKey, descending, nullsFirst) = primarySortKey(orderBy.head)
    val numericKey = df.select(firstKey).schema.head.dataType match {
      case _: NumericType => true
      case _              => false
    }
    if (!numericKey) return df

    // persisted: feeds the stats agg, the histogram agg AND the final
    // window leg — without it each leg recomputes the (often
    // expensive) upstream expressions once each
    val base = graft.core.CacheScope.disk(df)
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    val keyd = firstKey.cast("double")
    // normalized key: ascending in scan order regardless of direction
    val k = if (descending) -keyd else keyd
    val gcols = groupCols.map(col)
    val gRenamed = groupCols.map(c => col("__g_" + c))

    // per-group finite-key range + bin index (nulls/NaN get sentinel
    // bins matching their position in Spark's sort order)
    val finiteK = when(keyd.isNotNull && !isnan(keyd), k)
    val stats = base.groupBy(gcols: _*)
      .agg(min(finiteK).as("__kmin"), max(finiteK).as("__kmax"))
    val statsR = groupCols.foldLeft(stats) {
      (d, c) => d.withColumnRenamed(c, "__g_" + c)
    }
    val statsCond = groupCols.map(c => col(c) <=> col("__g_" + c))
      .reduce(_ && _)
    val nullBin = if (nullsFirst) -1 else bins
    val nanBin = if (descending) -1 else bins // NaN sorts as the max key
    val width = (col("__kmax") - col("__kmin")) / bins
    val binExpr = when(keyd.isNull, nullBin)
      .when(isnan(keyd), nanBin)
      .when(col("__kmin").isNull || col("__kmax") <= col("__kmin"), 0)
      .otherwise(greatest(lit(0L),
        least(lit((bins - 1).toLong), floor((k - col("__kmin")) / width))))
      .cast("int")
    val binned = base.join(statsR, statsCond).withColumn("__bin", binExpr)

    // bounded histogram: `bins`+2 token subtotals per group; the
    // budget-crossing bin is the first whose INCLUSIVE running total
    // STRICTLY exceeds the budget (strict, so a zero-token row beyond
    // the cut can never have a qualifying running total)
    val runW = Window.partitionBy(gRenamed: _*).orderBy(col("__bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = binned
      .groupBy((gRenamed :+ col("__bin")): _*)
      .agg(sum(tok).as("__btok"), min(tok).as("__btokmin"))
      .withColumn("__run", sum(col("__btok")).over(runW))
      .groupBy(gRenamed: _*)
      .agg(min(when(col("__run") > budget, col("__bin"))).as("__rawcross"),
        min(col("__btokmin")).as("__tokmin"))
      // negative tokens break running-total monotonicity → no cut for
      // that group (exact window over all of its rows)
      .withColumn("__cross", when(col("__tokmin") < 0, lit(null))
        .otherwise(col("__rawcross")))
    val cutsR = groupCols.foldLeft(
        cuts.select((gRenamed :+ col("__cross")): _*)) {
      (d, c) => d.withColumnRenamed("__g_" + c, "__h_" + c)
    }
    val cutCond = groupCols.map(c => col(c) <=> col("__h_" + c))
      .reduce(_ && _)
    binned.join(cutsR, cutCond)
      .where(col("__cross").isNull || col("__bin") <= col("__cross"))
  }

  /** Padding-waste report — the max_len sizing question asked before
    * any batching scheme is frozen: at each candidate sequence
    * length, how many tokens survive truncation, how much padding the
    * one-doc-per-row baseline burns, and what utilization
    * concat-and-chunk packing ([[packIntoShards]]) would reach
    * instead. The gap between `utilization` and `packed_utilization`
    * IS the packing win.
    *
    * Pure aggregation over (docs × candidate lengths) — no window, no
    * join; every statistic is exact BIGINT sums with one division at
    * the end (`div` == positive `//`, oracle-replayable).
    */
  def paddingWasteReport(
      df: DataFrame, tokenCol: Column,
      maxLens: Seq[Int]): DataFrame = {
    require(maxLens.nonEmpty && maxLens.forall(_ >= 1),
      "maxLens must be non-empty, each ≥ 1")
    df.select(tokenCol.cast("long").as("__t"))
      .where(col("__t").isNotNull && col("__t") >= 0)
      .select(col("__t"),
        explode(typedLit(maxLens.sorted)).as("max_len"))
      .groupBy("max_len")
      .agg(count(lit(1)).as("n_docs"),
        sum("__t").as("total_tokens"),
        sum(least(col("__t"), col("max_len").cast("long")))
          .as("kept_tokens"),
        sum(greatest(col("__t") - col("max_len"), lit(0L)))
          .as("truncated_tokens"),
        sum(col("max_len").cast("long")
          - least(col("__t"), col("max_len").cast("long")))
          .as("padding_tokens"))
      .withColumn("utilization",
        round(col("kept_tokens").cast("double")
          / (col("n_docs") * col("max_len")).cast("double"), 6))
      .withColumn("packed_batches",
        expr("(kept_tokens + max_len - 1) div max_len"))
      .withColumn("packed_utilization",
        round(col("kept_tokens").cast("double")
          / (col("packed_batches") * col("max_len")).cast("double"), 6))
  }

  /** Primary sort key of an `orderBy` head: (child column, descending?,
    * nulls first?). A bare column sorts ascending-nulls-first, matching
    * Spark's `Window.orderBy` default.
    */
  // package-private so PackingSpec can pin the reflective read: the
  // class-name match below is against Spark-internal naming, and the
  // spec makes a rename/move fail LOUDLY (wrong direction detected)
  // instead of silently dropping into the bare-column fallback
  private[sampling] def primarySortKey(c: Column): (Column, Boolean, Boolean) = {
    val n = c.node
    // sql.internal.SortOrder is private[sql] at the Scala level but its
    // case-class accessors are public bytecode — reflection is the
    // supported-surface-only way to read the direction off a Column
    if (n.getClass.getName == "org.apache.spark.sql.internal.SortOrder") {
      def field(name: String): AnyRef =
        n.getClass.getMethod(name).invoke(n)
      // ColumnNode is unnameable outside org.apache.spark.sql; a
      // type-parameter witness carries the inferred type through the cast
      def as[A](x: AnyRef, witness: A): A = x.asInstanceOf[A]
      (new Column(as(field("child"), n)),
        field("sortDirection").getClass.getName.endsWith("Descending$"),
        field("nullOrdering").getClass.getName.endsWith("NullsFirst$"))
    } else (new Column(n), false, true)
  }
}
