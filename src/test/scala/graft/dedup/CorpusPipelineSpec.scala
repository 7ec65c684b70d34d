package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CorpusPipelineSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat watches from the warm window sill nearby and then " +
    "both animals settle down for a long afternoon nap in the sun"

  private def docs(rows: (Int, String)*) = df(
    StructType(Seq(
      StructField("doc_id", IntegerType),
      StructField("text", StringType))),
    rows.map { case (i, t) => Row(i, t) })

  test("pipeline drops exact dups, near-dups, and low-quality docs") {
    val d = docs(
      (1, base),
      (2, base.toUpperCase), // exact dup after normalization
      (3, base.replace("lazy", "sleepy")), // near-dup of 1
      (4, "!!! ### $$$"), // low quality
      (5, "catalyst rewrites logical plans with rules while tungsten " +
        "manages memory and code generation for the executors running " +
        "on the cluster and the scheduler assigns the tasks"))
    // r=2 banding (bands=8): high recall at the low 0.3 threshold —
    // the default r=4 s-curve targets 0.8+ near-dups
    val out = CorpusPipeline.prepareTrainingCorpus(
      d, "doc_id", "text", minQuality = 0.3, bands = 8, threshold = 0.3)
    val kept = out.select("doc_id").collect().map(_.getInt(0)).toSeq.sorted
    assert(kept == Seq(1, 5))
    assert(out.columns.contains("predicted"))
    assert(out.columns.contains("quality"))
  }

  test("near-dup removal keeps the lowest id of a verified pair") {
    val d = docs((7, base), (9, base.replace("lazy", "sleepy")))
    val drops = CorpusPipeline.nearDupDropIds(
      d, "doc_id", "text", bands = 8, threshold = 0.3)
    assert(drops.collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("chained near-dups a~b~c keep exactly ONE survivor " +
      "(connected components, not greedy pairs)") {
    // a~b and b~c are near-dups but a~c may fall below threshold — the
    // chain case greedy keep-lowest-id gets wrong (keeps both ends)
    val d = docs(
      (1, base),
      (2, base.replace("lazy", "sleepy")),
      (3, base.replace("lazy", "sleepy").replace("warm", "cold")))
    val drops = CorpusPipeline.nearDupDropIds(
      d, "doc_id", "text", bands = 8, threshold = 0.3)
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(drops == Seq(2, 3)) // component {1,2,3} → survivor 1
  }

  test("clean distinct corpus passes through unchanged") {
    val d = docs(
      (1, base),
      (2, "catalyst rewrites logical plans with rules while tungsten " +
        "manages memory and code generation for all the executors in " +
        "the cluster and the scheduler hands out tasks to everyone"))
    val out = CorpusPipeline.prepareTrainingCorpus(
      d, "doc_id", "text", minQuality = 0.1)
    assert(out.count() == 2)
  }

  test("the full pipeline plan contains no cartesian or nested-loop " +
      "joins (the scale-killer shapes) at any stage") {
    val d = docs(
      (1, base), (2, base.replace("lazy", "sleepy")), (3, "other text"))
    val out = CorpusPipeline.prepareTrainingCorpus(
      d, "doc_id", "text", minQuality = 0.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }

  test("end-to-end composition (dedup → mixture → shard packing, the " +
      "q73 chain): no cartesian, and the corpus never crosses the " +
      "packing stitch's single-partition exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val alt = "catalyst rewrites logical plans with rules while " +
      "tungsten manages memory and code generation for the executors"
    val d = df(
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("source", StringType))),
      (1L to 40L).map { i =>
        val t = if (i % 7 == 0) base // exact-dup family
                else s"$alt variant $i with padding tokens " +
                  (1 to 20).map(j => s"w${(i * 31 + j) % 97}").mkString(" ")
        Row(i, t, if (i % 3 == 0) "src0" else if (i % 3 == 1) "src1"
                  else "srcX")
      })
    val exact = Dedup.exactDedupSemi(d, "doc_id", "text")
    val drops = CorpusPipeline.nearDupDropIds(
      d, "doc_id", "text", n = 3, numHashes = 16, bands = 4,
      threshold = 0.8)
    val slim = exact.join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"),
        graft.text.TextAnalysis.tokenCount(col("text")).as("tokens"))
    val mixed = graft.sampling.Sampling.mixture(slim, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.25))
    val seqd = mixed.withColumn("seq_id",
      col("doc_id") * lit(8L) + col("epoch"))
    val out = graft.sampling.Packing.packIntoShards(
      seqd, "seq_id", "tokens", budget = 200, bucketWidth = 64)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
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
      assert(cols.forall(_.startsWith("__")),
        s"corpus columns entered a single-partition exchange: $cols")
    }
  }
}
