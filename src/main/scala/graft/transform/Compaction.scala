package graft.transform

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories — the table-
  * maintenance job that keeps scan parallelism healthy: a directory
  * accumulated by incremental appends (micro-batch sinks, per-batch
  * upserts) degrades into thousands of KB-sized files whose per-file
  * open/footer cost dominates reads; compaction rewrites it into
  * files sized for the scanner.
  *
  * Sizing: target output count = ceil(actual on-disk bytes /
  * `targetFileBytes`) — measured from the file listing, not guessed
  * from row counts, so compression ratio is accounted for.
  * `repartition(n)` (round-robin) balances rows evenly across output
  * files; callers who also want multi-dimensional clustering run
  * [[graft.operators.Analytics.clusterByZOrder]] INSTEAD — both end
  * in one shuffle, so compact-then-cluster would pay two.
  *
  * Atomicity: the compacted data is written to a sibling temp
  * directory and swapped in with two renames (old → trash, temp →
  * path, trash deleted). A reader holding the OLD listing mid-swap
  * can fail and retry — same guarantee bare-parquet overwrites have
  * anywhere; table formats with snapshot isolation are the upgrade
  * path, not in scope on plain directories.
  *
  * Crash recovery: a crash BETWEEN the two renames strands the only
  * copies in `__compact_old` (the original) and `__compact_tmp` (the
  * complete rewrite — the tmp write always finishes before the first
  * rename). The next run detects the orphaned state and completes the
  * swap (or rolls the original back if tmp is somehow gone) before
  * doing anything else, so no compaction crash ever loses the table.
  *
  * Returns (filesBefore, filesAfter).
  */
object Compaction {

  def compactParquet(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) =
    rewrite(spark, path, targetFileBytes)((df, n) => df.repartition(n))

  /** [[compactParquet]] + Z-order clustering in the SAME rewrite:
    * output file count is sized from on-disk bytes exactly like
    * compactParquet, but rows lay out via
    * [[graft.operators.Analytics.clusterByZOrder]]'s range partition
    * on the Morton key of (`aCol`, `bCol`) instead of round-robin —
    * small files merge AND every output file holds a compact Z-curve
    * segment (both columns zone-map-prunable), for the price of the
    * ONE range exchange. Running compactParquet then clusterByZOrder
    * would pay two shuffles for the same result; this is why the two
    * maintenance jobs compose here rather than sequentially. Same
    * atomic swap and crash recovery as compactParquet.
    */
  def compactZOrdered(
      spark: SparkSession, path: String, aCol: String, bCol: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) =
    rewrite(spark, path, targetFileBytes)((df, n) =>
      graft.operators.Analytics.clusterByZOrder(df, aCol, bCol, n))

  private def rewrite(
      spark: SparkSession, path: String, targetFileBytes: Long)(
      layout: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.DataFrame): (Long, Long) = {
    require(targetFileBytes >= 1, "targetFileBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "__compact_tmp")
    val trash = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "__compact_old")
    // recover a previous run that crashed mid-swap: the data lives in
    // trash (and, if the crash hit between the renames, a COMPLETE
    // rewrite in tmp — the tmp write finishes before the first rename)
    if (!fs.exists(hPath) && fs.exists(trash)) {
      if (fs.exists(tmp))
        require(fs.rename(tmp, hPath), s"recovery failed: $tmp -> $path")
      else
        require(fs.rename(trash, hPath),
          s"recovery failed: $trash -> $path")
    }
    val dataFiles = fs.listStatus(hPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    require(dataFiles.nonEmpty, s"no parquet files under $path")
    val bytes = dataFiles.map(_.getLen).sum
    val filesBefore = dataFiles.size.toLong
    val nOut = math.max(1L,
      math.ceil(bytes.toDouble / targetFileBytes).toLong).toInt
    fs.delete(tmp, true); fs.delete(trash, true)
    layout(spark.read.parquet(path), nOut)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(tmp.toString)
    require(fs.rename(hPath, trash), s"swap failed: $path -> $trash")
    require(fs.rename(tmp, hPath), s"swap failed: $tmp -> $path")
    fs.delete(trash, true)
    val filesAfter = fs.listStatus(hPath).toSeq
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .toLong
    (filesBefore, filesAfter)
  }
}
