package graft

import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is an operator of the engine exercised over the
  * driver's test tables, with an equivalent DuckDB oracle in
  * [[SparkEntry.oracleSql]]. Conventions for oracle hash-fidelity:
  * output columns are strings / ints / longs / doubles only (no raw
  * timestamps or booleans), aggregate doubles are rounded, every query
  * has a total deterministic ORDER BY on both sides, and sums are always
  * over doubles (DuckDB sum(BIGINT) would widen to HUGEINT and break the
  * schema compare).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation with the
    * dimension side broadcast.
    */
  def entry(spark: SparkSession): DataFrame =
    revenueByNation(spark, "/root/testdata/sf0.001")


  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.registry.ParityRegistry.queries ++
    graft.registry.AnalyticsRegistry.queries ++
    graft.registry.TextRegistry.queries ++
    graft.registry.DedupRegistry.queries ++
    graft.registry.SimilarityRegistry.queries ++
    graft.registry.MultimodalRegistry.queries ++
    graft.registry.SamplingRegistry.queries

  def oracleSql: Map[String, String] =
    graft.registry.ParityRegistry.oracleSql ++
    graft.registry.AnalyticsRegistry.oracleSql ++
    graft.registry.TextRegistry.oracleSql ++
    graft.registry.DedupRegistry.oracleSql ++
    graft.registry.SimilarityRegistry.oracleSql ++
    graft.registry.MultimodalRegistry.oracleSql ++
    graft.registry.SamplingRegistry.oracleSql
}
