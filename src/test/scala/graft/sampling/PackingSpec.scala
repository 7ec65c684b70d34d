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
}
