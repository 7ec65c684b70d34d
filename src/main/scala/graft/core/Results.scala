package graft.core

import org.apache.spark.sql.DataFrame

/** Result envelopes mirroring the reference's dataclasses
  * (/root/reference/src/extractors/result.py:15-48,
  * src/transformers/base_transformer.py:18-27,
  * src/quality/rules.py:15-25, src/quality/report.py:14-73).
  *
  * JSON rendering is hand-rolled (no extra deps); `data` is excluded from
  * `toDict` like the reference excludes the DataFrame payload
  * (result.py:35-48, tests/test_collector.py:131-148).
  */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(v: Any): String = v match {
    case null          => "null"
    case None          => "null"
    case Some(x)       => render(x)
    case s: String     => quote(s)
    case b: Boolean    => b.toString
    case d: Double     => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float      => render(f.toDouble)
    case n: Number     => n.toString
    case m: Map[_, _]  =>
      m.map { case (k, x) => quote(k.toString) + ": " + render(x) }
        .mkString("{", ", ", "}")
    case it: Iterable[_] => it.map(render).mkString("[", ", ", "]")
    case other         => quote(other.toString)
  }
}

/** Outcome of one source extraction (result.py:15-48). */
final case class ExtractionResult(
    source: String,
    success: Boolean,
    data: Option[DataFrame],
    rowCount: Long,
    durationSeconds: Double,
    apiCalls: Int = 0,
    cacheHits: Int = 0,
    errors: Seq[String] = Nil,
    metadata: Map[String, Any] = Map.empty) {

  def toDict: Map[String, Any] = Map(
    "source" -> source,
    "success" -> success,
    "row_count" -> rowCount,
    "duration_seconds" -> durationSeconds,
    "api_calls" -> apiCalls,
    "cache_hits" -> cacheHits,
    "errors" -> errors,
    "metadata" -> metadata)

  def toJson: String = Json.render(toDict)
}

/** Outcome of a star-schema build (base_transformer.py:18-27). */
final case class TransformationResult(
    transformer: String,
    success: Boolean,
    tablesCreated: Seq[String],
    rowsByTable: Map[String, Long],
    outputPaths: Map[String, String],
    durationSeconds: Double,
    errors: Seq[String] = Nil) {

  def totalRows: Long = rowsByTable.values.sum

  def toDict: Map[String, Any] = Map(
    "transformer" -> transformer,
    "success" -> success,
    "tables_created" -> tablesCreated,
    "rows_by_table" -> rowsByTable,
    "output_paths" -> outputPaths,
    "total_rows" -> totalRows,
    "duration_seconds" -> durationSeconds,
    "errors" -> errors)

  def toJson: String = Json.render(toDict)
}

/** Outcome of one data-quality rule (rules.py:15-25). */
final case class RuleResult(
    ruleName: String,
    passed: Boolean,
    column: Option[String],
    details: Map[String, Any] = Map.empty) {

  def severity: String = if (passed) "PASS" else "FAIL"

  def toDict: Map[String, Any] = Map(
    "rule_name" -> ruleName,
    "passed" -> passed,
    "column" -> column,
    "details" -> details)
}

/** Aggregated validation report (report.py:14-99). */
final case class ValidationReport(
    datasetName: String,
    rowCount: Long,
    columnCount: Int,
    results: Seq[RuleResult],
    durationSeconds: Double) {

  def passed: Boolean = results.forall(_.passed)
  def passCount: Int = results.count(_.passed)
  def failCount: Int = results.count(!_.passed)
  def failures: Seq[RuleResult] = results.filterNot(_.passed)

  /** Mirrors the reference report.py:52-73 to_dict layout exactly:
    * counts nested under 'summary', per-result keys rule/severity.
    */
  def toDict: Map[String, Any] = Map(
    "name" -> datasetName,
    "passed" -> passed,
    "summary" -> Map(
      "total_rules" -> results.size,
      "passed" -> passCount,
      "failed" -> failCount,
      "rows_checked" -> rowCount,
      "columns_checked" -> columnCount),
    "results" -> results.map(r => Map(
      "rule" -> r.ruleName,
      "severity" -> r.severity,
      "column" -> r.column,
      "details" -> r.details)))

  def toJson: String = Json.render(toDict)

  /** Failure details renderer (report.py:84-99): one block per failed
    * rule with its column and detail key/values.
    */
  def failuresDetail: String =
    if (failures.isEmpty) "  No failures."
    else {
      val blocks = failures.map { r =>
        val col = r.column.map(c => s"\n        column: $c").getOrElse("")
        val details = r.details
          .map { case (k, v) => s"\n        $k: $v" }.mkString
        s"  FAIL  ${r.ruleName}$col$details"
      }
      (s"  Failures ($failCount):" +: blocks).mkString("\n")
    }

  /** One-line-per-rule summary (report.py:52-68). */
  def summary: String = {
    val header =
      s"Validation report: $datasetName — ${rowCount} rows x ${columnCount} cols; " +
        s"$passCount passed, $failCount failed"
    val lines = results.map { r =>
      s"  [${r.severity}] ${r.ruleName}" +
        r.column.map(c => s" (column: $c)").getOrElse("")
    }
    (header +: lines).mkString("\n")
  }
}
