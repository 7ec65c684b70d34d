package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print one `SparkEntry.queries` entry's
  * `.explain("formatted")` plan (the pre-execution physical plan —
  * Exchange count, join strategy, PushedFilters/ReadSchema) followed by
  * the AQE-final executed plan. Usage:
  * `runMain graft.Explain <queryName> <sfDir>`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir) = args
    val spark = graft.core.Sessions.configure(
        SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // comma-separated list: one JVM, one session, N plan dumps (the
    // bulk-audit mode; caches are scoped per query like Verify's loop)
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      graft.core.CacheScope.withScope {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println("=== explain(\"formatted\") (" + name + ") ===")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        // dev/debug harness only (never on a query path): materializing
        // on the driver is what forces the AQE-final executedPlan
        df.collect()
        println("=== EXECUTED PLAN (" + name + ") ===")
        println(df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
