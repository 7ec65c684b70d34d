package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_compact").toString +
      "/t"

  test("compaction merges many small files, data byte-identical") {
    import spark.implicits._
    val path = freshDir()
    // 40 tiny files via repartition(40)
    (1 to 2000).toDF("v").repartition(40)
      .write.parquet(path)
    val before = spark.read.parquet(path)
      .agg(count(lit(1)), sum("v")).head()
    val (nBefore, nAfter) = Compaction.compactParquet(
      spark, path, targetFileBytes = 1L << 30)
    assert(nBefore >= 40L && nAfter == 1L)
    val after = spark.read.parquet(path)
      .agg(count(lit(1)), sum("v")).head()
    assert(after == before)
    // no temp/trash residue
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("__compact")))
  }

  test("target sizing: small target yields multiple balanced files") {
    import spark.implicits._
    val path = freshDir()
    (1 to 50000).map(i => (i, "x" * 50)).toDF("v", "pad")
      .repartition(60).write.parquet(path)
    val bytes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = bytes / 4
    val (_, nAfter) = Compaction.compactParquet(spark, path, target)
    assert(nAfter >= 4L && nAfter <= 6L, s"got $nAfter files")
    assert(spark.read.parquet(path).count() == 50000L)
  }

  test("empty directory is rejected, not silently emptied") {
    val path = freshDir()
    new java.io.File(path).mkdirs()
    intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, path)
    }
  }

  private def hfs(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  test("crash between the two renames (data stranded in __compact_old " +
      "+ complete rewrite in __compact_tmp): next run completes the " +
      "swap and loses nothing") {
    import spark.implicits._
    val path = freshDir()
    (1 to 500).toDF("v").repartition(10).write.parquet(path)
    val (hPath, fs) = hfs(path)
    // simulate the exact crash state: tmp write finished, first
    // rename done, second rename never happened
    val tmp = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "__compact_tmp")
    val trash = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "__compact_old")
    spark.read.parquet(path).repartition(2)
      .write.parquet(tmp.toString)
    assert(fs.rename(hPath, trash))
    assert(!fs.exists(hPath))
    val (_, nAfter) = Compaction.compactParquet(
      spark, path, targetFileBytes = 1L << 30)
    assert(nAfter == 1L)
    assert(spark.read.parquet(path)
      .agg(sum("v")).head().getLong(0) == 500L * 501 / 2)
    val residue = new java.io.File(path).getParentFile
      .listFiles().map(_.getName)
    assert(!residue.exists(_.contains("__compact")))
  }

  test("compactZOrdered merges small files AND Z-orders them in one " +
      "rewrite: single exchange in the layout plan, per-file Z-ranges " +
      "disjoint, data byte-identical") {
    import spark.implicits._
    import graft.operators.Analytics
    val path = freshDir()
    val rng = new scala.util.Random(5)
    (0 until 20000).map(i =>
        (i, rng.nextInt(1000), rng.nextInt(1000)))
      .toDF("id", "a", "b")
      .repartition(50).write.parquet(path)
    val before = spark.read.parquet(path)
      .agg(count(lit(1)), sum("id"), sum("a"), sum("b")).head()
    // the exact layout plan the rewrite executes: ONE shuffle exchange
    // (range on the Morton key) — compact-then-cluster would pay two
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val layout = Analytics.clusterByZOrder(
      spark.read.parquet(path), "a", "b", 4)
    assert(layout.count() == 20000)
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case ad: AdaptiveSparkPlanExec => unwrap(ad.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => Seq(other)
    }.flatten
    val shuffles = unwrap(layout.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size == 1,
      s"expected the single range exchange, got ${shuffles.size}")
    // the actual maintenance job: sized to ~4 files via target bytes
    val bytes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (nBefore, nAfter) = Compaction.compactZOrdered(
      spark, path, "a", "b", targetFileBytes = bytes / 4)
    assert(nBefore >= 50L && nAfter >= 3L && nAfter <= 6L,
      s"$nBefore -> $nAfter files")
    val after = spark.read.parquet(path)
      .agg(count(lit(1)), sum("id"), sum("a"), sum("b")).head()
    assert(after == before)
    // Z-locality: per-FILE Morton-key ranges are (near) disjoint —
    // the zone-map property the layout exists for
    val ranges = spark.read.parquet(path)
      .select(input_file_name().as("f"),
        Analytics.zorderKey(col("a"), col("b")).as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1,
          s"file Z-ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
  }

  test("crash before the tmp rewrite survived (only __compact_old " +
      "left): next run rolls the original back") {
    import spark.implicits._
    val path = freshDir()
    (1 to 300).toDF("v").repartition(5).write.parquet(path)
    val (hPath, fs) = hfs(path)
    val trash = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "__compact_old")
    assert(fs.rename(hPath, trash))
    val (_, nAfter) = Compaction.compactParquet(
      spark, path, targetFileBytes = 1L << 30)
    assert(nAfter == 1L)
    assert(spark.read.parquet(path)
      .agg(sum("v")).head().getLong(0) == 300L * 301 / 2)
  }
}
