package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},
  *    "runs":{...},"failed":[...],"load":[start,end],"sf":...}
  *
  * - `queries.<name>` is the min over SUCCESSFUL runs (this box is
  *   shared; a GC pause or neighbor burst can inflate one run 5-10x,
  *   so min-of-n reports the achievable time).
  * - `runs.<name>` is the full per-run array — so noise (one slow run)
  *   is distinguishable from regression (all runs slow) when comparing
  *   rounds, instead of being thrown away by the min.
  * - Failed runs contribute NO time; a query with zero successful runs
  *   lands in `failed` and is excluded from `queries` and the total.
  * - `load` is the OS 1-minute load average sampled at bench start and
  *   end (-1.0 where the JVM can't read it). A contended box inflates
  *   wall-clock without any code regressing — the load field lets a
  *   reader discount a run recorded under heavy neighbor activity
  *   instead of misreading contention as a slowdown.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_RUNS (runs per query, default 2), SPARK_GRAFT_ONLY
  * (comma-separated query-name filter — for profiling one query).
  */
object Bench {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val spark = graft.core.Sessions.configure(
        SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (untimed): footer reads/file listing for the benchmarked
    // sfDir's tables (count(*) over parquet is metadata-served) plus one
    // real query for JIT/codegen warmup
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val runTimes = selected.map { case (name, fn) =>
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // cache hygiene: operators persist intermediates (signature /
        // shingle tables); drop them so runs time independently
        spark.catalog.clearCache()
        if (ok) Some(elapsed) else None
      }
      if (times.isEmpty) failed += name
      name -> times
    }
    val succeeded = runTimes.collect {
      case (name, times) if times.nonEmpty => name -> times
    }
    val qs = succeeded.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val runsJson = succeeded.map { case (k, v) =>
      s"\"" + k + "\":" + v.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = succeeded.map(_._2.min).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadEnd = osBean.getSystemLoadAverage
    val loadJson = f"[$loadStart%.2f,$loadEnd%.2f]"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"failed":$failedJson,"load":$loadJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
