package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PackingSpec extends SparkSpec {

  private def toks(rows: (Int, java.lang.Integer)*) = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("tokens", IntegerType))),
    rows.map { case (i, t) => Row(i, t) })

  test("packIntoShards assigns each doc to the shard of its first " +
      "token (concat-then-chunk), docs may straddle boundaries") {
    val d = toks((1, 3), (2, 4), (3, 2), (4, 5), (5, 1), (6, 2))
    // offsets: 0, 3, 7, 9, 14, 15 → budget 5 → shards 0,0,1,1,2,3
    val out = Packing.packIntoShards(d, "id", "tokens", budget = 5)
      .orderBy("id")
      .select("id", "token_offset", "shard")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1, 0L, 0L), (2, 3L, 0L), (3, 7L, 1L),
      (4, 9L, 1L), (5, 14L, 2L), (6, 15L, 3L)))
  }

  test("packIntoShards is invariant to the bucket width (partitioned " +
      "prefix sum == global prefix sum)") {
    val d = toks((0 until 50).map(i => (i * 3, Integer.valueOf(i % 7 + 1))): _*)
    val expect = Packing.packIntoShards(d, "id", "tokens", 10,
        bucketWidth = 1L << 20)
      .select("id", "token_offset", "shard").collect().map(_.toSeq).toSet
    for (w <- Seq(1L, 2L, 17L, 64L)) {
      val got = Packing.packIntoShards(d, "id", "tokens", 10,
          bucketWidth = w)
        .select("id", "token_offset", "shard")
        .collect().map(_.toSeq).toSet
      assert(got == expect, s"bucketWidth=$w")
    }
  }

  test("packIntoShards treats null token counts as 0 (no offset " +
      "advance, doc still lands in a shard)") {
    val d = toks((1, 4), (2, null), (3, 4))
    val out = Packing.packIntoShards(d, "id", "tokens", budget = 5)
      .orderBy("id")
      .select("id", "token_offset", "shard")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 0L, 0L), (2, 4L, 0L), (3, 4L, 0L)))
  }

  test("packIntoShards plan: the single-partition stitch window " +
      "receives only per-bucket aggregates — the corpus itself never " +
      "passes through a SinglePartition exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val d = toks((0 until 1000).map(i =>
      (i, Integer.valueOf(i % 9 + 1))): _*)
    val out = Packing.packIntoShards(d, "id", "tokens", 50,
      bucketWidth = 100)
    assert(out.collect().length == 1000)
    def singlePartitionInputs(p: SparkPlan): Seq[Seq[String]] = p.collect {
      case a: AdaptiveSparkPlanExec => singlePartitionInputs(a.executedPlan)
      case q: QueryStageExec => singlePartitionInputs(q.plan)
      case s: ShuffleExchangeExec
          if s.outputPartitioning.numPartitions == 1 =>
        Seq(s.output.map(_.name))
    }.flatten
    val sp = singlePartitionInputs(out.queryExecution.executedPlan)
    assert(sp.nonEmpty, "expected the bucket-offset stitch exchange")
    sp.foreach { cols =>
      // only the (bucket, total) aggregate rows — never id/tokens rows
      assert(cols.forall(c => c.startsWith("__")),
        s"corpus columns entered a single-partition exchange: $cols")
    }
  }

  private def groupedDocs = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("g", StringType),
      StructField("q", DoubleType),
      StructField("tokens", IntegerType))),
    Seq(
      Row(1, "en", 0.9, 100), Row(2, "en", 0.8, 120), // cum 220
      Row(3, "en", 0.7, 100), // cum 320 > 300 → excluded
      Row(4, "en", 0.6, 10),  // after overflow → also excluded
      Row(5, "de", 0.5, 400), // larger than the whole budget → excluded
      Row(6, "de", 0.4, 250))) // cum(kept) restarts? no — strict prefix

  test("takeUntilBudget keeps the best-prefix per group under a strict " +
      "inclusive token budget (overflow doc and everything after it " +
      "excluded)") {
    val out = Packing.takeUntilBudget(
        groupedDocs, Seq("g"), Seq(col("q").desc, col("id").asc),
        "tokens", budget = 300)
      .select("id").collect().map(_.getInt(0)).toSet
    // en: 1 (100) + 2 (220) kept, 3 overflows, 4 blocked by prefix rule
    // de: 5 oversized (400 > 300) → its cum poisons the whole group's
    //     prefix — NOTHING from de is kept (strict prefix semantics)
    assert(out == Set(1, 2))
  }

  test("takeUntilBudget keeps a whole group that fits entirely") {
    val out = Packing.takeUntilBudget(
        groupedDocs, Seq("g"), Seq(col("q").desc, col("id").asc),
        "tokens", budget = 10000)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(out == Set(1, 2, 3, 4, 5, 6))
  }

  // the naive exact form takeUntilBudget must stay bit-identical to
  private def naiveTake(
      d: org.apache.spark.sql.DataFrame, groups: Seq[String],
      ord: Seq[org.apache.spark.sql.Column], tokenCol: String,
      budget: Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groups.map(col): _*).orderBy(ord: _*)
    d.withColumn("__naive",
      sum(coalesce(col(tokenCol).cast("long"), lit(0L))).over(w))
      .where(col("__naive") <= budget)
      .drop("__naive")
  }

  private def messyDocs = {
    val rng = new scala.util.Random(7)
    df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g", StringType),
        StructField("q", DoubleType),
        StructField("tokens", IntegerType))),
      (0 until 400).map { i =>
        val g = i % 5 match {
          case 0 => null; case 1 => "en"; case 2 => "en"
          case 3 => "de"; case _ => "fr"
        }
        // coarse quality → plenty of exact ties across the budget cut
        val q: java.lang.Double =
          if (i % 11 == 0) null else math.floor(rng.nextDouble() * 8) / 8.0
        val t: java.lang.Integer =
          if (i % 13 == 0) null else Integer.valueOf(rng.nextInt(40))
        Row(i, g, q, t)
      })
  }

  test("takeUntilBudget equals the naive single-window form on messy " +
      "data (ties, null keys, null groups, null tokens; asc and desc; " +
      "nulls first and last; several budgets and bin counts)") {
    val orders = Seq(
      Seq(col("q").desc, col("id").asc),
      Seq(col("q").asc, col("id").asc),
      Seq(col("q").desc_nulls_first, col("id").asc),
      Seq(col("q").asc_nulls_last, col("id").asc))
    for (ord <- orders; budget <- Seq(50L, 300L, 100000L);
         bins <- Seq(2, 8, 64)) {
      val got = Packing.takeUntilBudget(
          messyDocs, Seq("g"), ord, "tokens", budget, bins)
        .select("id").collect().map(_.getInt(0)).toSet
      val want = naiveTake(messyDocs, Seq("g"), ord, "tokens", budget)
        .select("id").collect().map(_.getInt(0)).toSet
      assert(got == want, s"ord=$ord budget=$budget bins=$bins")
    }
  }

  test("takeUntilBudget prefilter is bounded: a dominant group reaches " +
      "the exact window with ~one budget of rows, not the whole group") {
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g", StringType),
        StructField("q", DoubleType),
        StructField("tokens", IntegerType))),
      (0 until 10000).map(i => Row(i, "en", i / 10000.0, 10)))
    val ord = Seq(col("q").desc, col("id").asc)
    // budget 200 → 20 docs kept; 64 bins over 10k rows ≈ 157 rows/bin
    val pruned = Packing.budgetPrune(d, Seq("g"), ord, "tokens",
      budget = 200, bins = 64)
    val n = pruned.count()
    assert(n < 500, s"prefilter passed $n of 10000 rows")
    val kept = Packing.takeUntilBudget(d, Seq("g"), ord, "tokens", 200)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(kept == (9980 until 10000).toSet)
  }

  test("takeUntilBudget with MULTI-column group keys (null components " +
      "included) equals the naive form") {
    val rng = new scala.util.Random(17)
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g1", StringType, nullable = true),
        StructField("g2", IntegerType, nullable = true),
        StructField("q", DoubleType),
        StructField("tokens", IntegerType))),
      (0 until 300).map { i =>
        Row(i,
          if (i % 4 == 0) null else s"s${i % 3}",
          if (i % 5 == 0) null else Integer.valueOf(i % 2),
          math.floor(rng.nextDouble() * 6) / 6.0,
          Integer.valueOf(rng.nextInt(30)))
      })
    val ord = Seq(col("q").desc, col("id").asc)
    val got = Packing.takeUntilBudget(d, Seq("g1", "g2"), ord,
        "tokens", 120)
      .select("id").collect().map(_.getInt(0)).toSet
    val want = naiveTake(d, Seq("g1", "g2"), ord, "tokens", 120)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got == want)
  }

  test("takeUntilBudget with negative token counts (non-monotone " +
      "running totals) still equals the naive form — the cut is " +
      "disabled for that group") {
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g", StringType),
        StructField("q", DoubleType),
        StructField("tokens", IntegerType))),
      (0 until 100).map(i =>
        Row(i, if (i % 2 == 0) "a" else "b", i / 100.0,
          Integer.valueOf(if (i % 7 == 0) -5 else 10))))
    val ord = Seq(col("q").desc, col("id").asc)
    val got = Packing.takeUntilBudget(d, Seq("g"), ord, "tokens", 60)
      .select("id").collect().map(_.getInt(0)).toSet
    val want = naiveTake(d, Seq("g"), ord, "tokens", 60)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got == want)
  }

  test("takeUntilBudget falls back to the exact path on a non-numeric " +
      "primary sort key and still matches the naive form") {
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g", StringType),
        StructField("name", StringType),
        StructField("tokens", IntegerType))),
      (0 until 60).map(i =>
        Row(i, if (i < 30) "a" else "b", s"doc_${i % 17}",
          Integer.valueOf(7))))
    val ord = Seq(col("name").asc, col("id").asc)
    // prefilter is the identity for a string key
    assert(Packing.budgetPrune(d, Seq("g"), ord, "tokens", 50, 64)
      .columns.toSeq == d.columns.toSeq)
    val got = Packing.takeUntilBudget(d, Seq("g"), ord, "tokens", 50)
      .select("id").collect().map(_.getInt(0)).toSet
    val want = naiveTake(d, Seq("g"), ord, "tokens", 50)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(got == want)
  }
  test("primarySortKey reads direction and null ordering off Spark's " +
      "SortOrder node — a Spark-internals rename must break HERE, " +
      "loudly, not silently fall back to ascending") {
    // (column, expected descending, expected nullsFirst); Spark
    // defaults: asc => nulls first, desc => nulls last
    val cases = Seq(
      (col("x"),                 false, true),
      (col("x").asc,             false, true),
      (col("x").desc,            true,  false),
      (col("x").asc_nulls_last,  false, false),
      (col("x").desc_nulls_first, true, true))
    for ((c, wantDesc, wantNullsFirst) <- cases) {
      val (key, desc, nullsFirst) = Packing.primarySortKey(c)
      assert(desc == wantDesc && nullsFirst == wantNullsFirst,
        s"primarySortKey($c) = (desc=$desc, nullsFirst=$nullsFirst), " +
          s"want (desc=$wantDesc, nullsFirst=$wantNullsFirst) — if this " +
          "fails after a Spark upgrade, the reflective SortOrder read " +
          "in Packing.primarySortKey no longer matches Spark internals")
      // the extracted child must be the bare column (sortable again)
      val d = df(
        StructType(Seq(StructField("x", IntegerType))),
        Seq(Row(2), Row(1), Row(3)))
      assert(d.orderBy(key).collect().map(_.getInt(0)).toSeq ==
        Seq(1, 2, 3))
    }
  }

  test("paddingWasteReport: hand-computed truncation, padding and " +
      "packed utilization at two candidate lengths") {
    val d = df(
      StructType(Seq(StructField("t", LongType))),
      Seq(Row(10L), Row(100L)))
    val out = Packing.paddingWasteReport(d, col("t"),
        maxLens = Seq(50, 200))
      .orderBy("max_len").collect()
    // M = 50: kept 10 + 50, truncated 50, padding 40; one-per-row
    // utilization 60/100; packed ⌈60/50⌉ = 2 batches → 60/100
    val m50 = out(0)
    assert(m50.getLong(1) === 2L && m50.getLong(2) === 110L)
    assert(m50.getLong(3) === 60L && m50.getLong(4) === 50L)
    assert(m50.getLong(5) === 40L)
    assert(m50.getDouble(6) === 0.6)
    assert(m50.getLong(7) === 2L && m50.getDouble(8) === 0.6)
    // M = 200: nothing truncates; padding 290; packing wins 2×
    val m200 = out(1)
    assert(m200.getLong(3) === 110L && m200.getLong(4) === 0L)
    assert(m200.getLong(5) === 290L)
    assert(m200.getDouble(6) === 0.275)
    assert(m200.getLong(7) === 1L && m200.getDouble(8) === 0.55)
  }
}
