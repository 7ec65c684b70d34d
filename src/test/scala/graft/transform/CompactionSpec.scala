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
}
