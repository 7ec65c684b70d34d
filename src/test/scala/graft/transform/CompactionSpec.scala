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
