package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's canonical configuration.
  *
  * Pins the semantics the rest of the engine depends on:
  *   - UTC session timezone (reference parses all timestamps as UTC,
  *     /root/reference/src/extractors/usgs.py:128)
  *   - ANSI off, so casts coerce to null like the reference's
  *     `pd.to_numeric(errors="coerce")` (world_bank.py:152)
  *   - AQE on (runtime shuffle coalescing + skew-join handling — the
  *     100 TB-scale posture; harmless locally)
  *   - shuffle partitions sized to the machine, not the 200 default
  */
object Sessions {

  /** Apply the canonical engine configuration to any builder. */
  def configure(
      b: SparkSession.Builder,
      shufflePartitions: Int = 32): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) is
      // rejected by default in Spark 4 — read as nanosecond longs and
      // normalize with Fx.nanosToTimestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and CLI mains. */
  def local(cores: String = "*", shufflePartitions: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
