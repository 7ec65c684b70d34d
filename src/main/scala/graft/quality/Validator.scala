package graft.quality

import graft.core.{RuleResult, ValidationReport}
import org.apache.spark.sql.DataFrame

/** Orchestrates rule evaluation into a [[ValidationReport]]
  * (/root/reference/src/quality/validator.py:20-67).
  *
  * `fused = true` (default) runs all fusable rules in a single scan
  * (see [[RuleSet.evaluateFused]]); `fused = false` is the faithful
  * one-job-per-rule mode. Row count comes from the same fused pass when
  * possible — here we issue one cheap `count()` (Parquet footer-served
  * for unfiltered scans, so effectively free).
  */
final class DataValidator(datasetName: String = "dataset") {
  private val ruleSet = new RuleSet(datasetName)

  def addRule(rule: Rule): DataValidator = { ruleSet.add(rule); this }
  def addRules(rules: Seq[Rule]): DataValidator = {
    rules.foreach(ruleSet.add); this
  }
  def ruleCount: Int = ruleSet.size

  def validate(df: DataFrame, fused: Boolean = true): ValidationReport = {
    val t0 = System.nanoTime()
    val results: Seq[RuleResult] =
      if (fused) ruleSet.evaluateFused(df) else ruleSet.evaluate(df)
    val report = ValidationReport(
      datasetName = datasetName,
      rowCount = df.count(),
      columnCount = df.columns.length,
      results = results,
      durationSeconds = (System.nanoTime() - t0) / 1e9)
    report
  }
}
