package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the AQE-final executed plan of one
  * `SparkEntry.queries` entry. Usage:
  * `runMain graft.Explain <queryName> <sfDir>`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = graft.core.Sessions.configure(
        SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // dev/debug harness only (never on a query path): materializing on
    // the driver is what forces the AQE-final executedPlan we print
    df.collect()
    println("=== EXECUTED PLAN (" + name + ") ===")
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head)
    spark.stop()
  }
}
