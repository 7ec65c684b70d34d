package graft.quality

import graft.core.RuleResult
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Data-quality rules with the exact semantics of
  * /root/reference/src/quality/rules.py — but compiled to Spark `Column`
  * aggregate expressions instead of eager pandas passes.
  *
  * Scale design: every built-in rule exposes its checks as a flat list of
  * aggregate `Column`s ([[Rule.aggExprs]]), so a whole [[RuleSet]] fuses
  * into ONE `df.agg(...)` — a single shuffle-free scan of the table
  * regardless of rule count. The reference evaluates each rule as its own
  * full pass (rules.py:256-257); at 100 TB that difference is the whole
  * ballgame. Missing-column handling is resolved from `df.schema` on the
  * driver before any job launches (rules.py:57-58,91-98,137-143).
  */
sealed trait Rule {
  def name: String

  /** Aggregate expressions this rule needs, or None if the rule cannot
    * run (missing columns / custom logic). Paired with [[interpret]].
    */
  def aggExprs(df: DataFrame): Option[Seq[Column]]

  /** Build the result from the values produced by [[aggExprs]] (same
    * order). Only called when aggExprs returned Some.
    */
  def interpret(values: Seq[Any]): RuleResult

  /** Standalone evaluation (one job per rule — the faithful mode). */
  def evaluate(df: DataFrame): RuleResult = aggExprs(df) match {
    case Some(exprs) =>
      val row = df.agg(exprs.head, exprs.tail: _*).head()
      interpret(Row.unapplySeq(row).get)
    case None => fallback(df)
  }

  /** Result when aggExprs is None (missing column, or CustomRule). */
  def fallback(df: DataFrame): RuleResult
}

private object RuleUtil {
  def asLong(v: Any): Long = v match {
    case null => 0L
    case n: Number => n.longValue()
  }
  def asDoubleOpt(v: Any): Option[Double] = v match {
    case null => None
    case n: Number => Some(n.doubleValue())
  }
  /** Python round() is banker's rounding; ratios here are k/n so
    * HALF_EVEN on the decimal repr matches round(x, 4). */
  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
}

/** Required columns have ≥ threshold non-null ratio (rules.py:40-76).
  * Empty frame ⇒ ratio 1.0 ⇒ passes.
  */
final case class CompletenessRule(
    columns: Seq[String],
    threshold: Double = 1.0,
    nameOverride: Option[String] = None) extends Rule {
  import RuleUtil._

  val name: String =
    nameOverride.getOrElse(s"completeness_${columns.mkString(",")}")

  private def present(df: DataFrame): Seq[String] =
    columns.filter(df.columns.contains)

  def aggExprs(df: DataFrame): Option[Seq[Column]] =
    if (present(df).size == columns.size)
      Some(count(lit(1)) +: columns.map(c => count(col(c))))
    else None

  def interpret(values: Seq[Any]): RuleResult = {
    val total = asLong(values.head)
    val failures = columns.zip(values.tail).flatMap { case (c, v) =>
      val nonNull = asLong(v)
      val ratio = if (total > 0) nonNull.toDouble / total else 1.0
      if (ratio < threshold)
        Some(c -> Map(
          "completeness" -> round4(ratio),
          "null_count" -> (total - nonNull),
          "threshold" -> threshold))
      else None
    }.toMap
    RuleResult(name, failures.isEmpty, Some(columns.mkString(",")),
      if (failures.nonEmpty) Map("failures" -> failures) else Map.empty)
  }

  def fallback(df: DataFrame): RuleResult = {
    // Some named columns missing: report those as errors, still check the
    // rest (rules.py:57-60 continues per-column).
    val missing = columns.filterNot(df.columns.contains)
    val presentCols = present(df)
    val base: Map[String, Any] =
      missing.map(c => c -> Map("error" -> "column not found")).toMap
    val failures: Map[String, Any] =
      if (presentCols.isEmpty) base
      else {
        val exprs = count(lit(1)) +: presentCols.map(c => count(col(c)))
        val row = df.agg(exprs.head, exprs.tail: _*).head()
        val vals = Row.unapplySeq(row).get
        val total = asLong(vals.head)
        base ++ presentCols.zip(vals.tail).flatMap { case (c, v) =>
          val nonNull = asLong(v)
          val ratio = if (total > 0) nonNull.toDouble / total else 1.0
          if (ratio < threshold)
            Some(c -> Map(
              "completeness" -> round4(ratio),
              "null_count" -> (total - nonNull),
              "threshold" -> threshold))
          else None
        }
      }
    RuleResult(name, passed = false, Some(columns.mkString(",")),
      Map("failures" -> failures))
  }
}

/** Key columns contain no duplicate rows (rules.py:79-113).
  * `duplicated(keep=False).sum()` counts ALL members of any duplicate
  * group — not just the extras. Null keys compare equal (pandas NaN==NaN
  * in duplicated; Spark groupBy groups nulls together — aligned).
  * Expressed as a sub-aggregation (one shuffle on the key) rather than a
  * raw-row pass; result is joined into the fused scan via a scalar agg.
  */
final case class UniquenessRule(
    columns: Seq[String],
    nameOverride: Option[String] = None) extends Rule {
  import RuleUtil._

  val name: String =
    nameOverride.getOrElse(s"uniqueness_${columns.mkString(",")}")

  // Duplicate counting needs a groupBy, which cannot fuse into a plain
  // scalar agg over the raw rows... except it can: rows-in-dup-groups =
  // total - number of (key-groups with exactly one row) requires two
  // levels. We keep it as its own (single) aggregation job.
  def aggExprs(df: DataFrame): Option[Seq[Column]] = None

  def interpret(values: Seq[Any]): RuleResult =
    throw new IllegalStateException("uniqueness evaluates standalone")

  def fallback(df: DataFrame): RuleResult = {
    val missing = columns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      return RuleResult(name, passed = false, Some(columns.mkString(",")),
        Map("error" -> s"missing columns: ${missing.mkString("[", ", ", "]")}"))
    // One job: groupBy keys → per-group counts → sum counts where n>1,
    // plus total. Shuffle carries one row per distinct key.
    val row = df.groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L)).as("dups"),
        coalesce(sum(col("__n")), lit(0L)).as("total"))
      .head()
    val dupCount = asLong(row.get(0))
    val total = asLong(row.get(1))
    RuleResult(name, dupCount == 0, Some(columns.mkString(",")), Map(
      "duplicate_rows" -> dupCount,
      "unique_rows" -> (total - dupCount),
      "total_rows" -> total))
  }
}

/** Numeric values within [minVal, maxVal], nulls ignored
  * (rules.py:116-166). Violations counted on the non-null subset.
  */
final case class RangeRule(
    column: String,
    minVal: Option[Double] = None,
    maxVal: Option[Double] = None,
    nameOverride: Option[String] = None) extends Rule {
  import RuleUtil._

  val name: String = nameOverride.getOrElse(s"range_$column")

  def aggExprs(df: DataFrame): Option[Seq[Column]] =
    if (!df.columns.contains(column)) None
    else {
      val c = col(column)
      val below = minVal.map(m =>
        count(when(c.isNotNull && c < lit(m), 1))).getOrElse(lit(0L))
      val above = maxVal.map(m =>
        count(when(c.isNotNull && c > lit(m), 1))).getOrElse(lit(0L))
      Some(Seq(below, above, count(c), min(c).cast("double"),
        max(c).cast("double")))
    }

  def interpret(values: Seq[Any]): RuleResult = {
    val violations = asLong(values(0)) + asLong(values(1))
    val checked = asLong(values(2))
    RuleResult(name, violations == 0, Some(column), Map(
      "violations" -> violations,
      "checked" -> checked,
      "min_found" -> asDoubleOpt(values(3)),
      "max_found" -> asDoubleOpt(values(4)),
      "min_allowed" -> minVal,
      "max_allowed" -> maxVal))
  }

  def fallback(df: DataFrame): RuleResult =
    RuleResult(name, passed = false, Some(column),
      Map("error" -> s"column '$column' not found"))
}

/** String values match an anchored regex (rules.py:169-204).
  * pandas `str.match` anchors at the START only — replicated by wrapping
  * the pattern as `^(?:pattern)` (plain `"^" + pattern` would mis-anchor
  * top-level alternations). Non-null values are cast to string first
  * (`astype(str)`), so numeric columns validate their decimal rendering.
  */
final case class PatternRule(
    column: String,
    pattern: String,
    nameOverride: Option[String] = None) extends Rule {
  import RuleUtil._

  val name: String = nameOverride.getOrElse(s"pattern_$column")
  private def anchored = "^(?:" + pattern + ")"

  def aggExprs(df: DataFrame): Option[Seq[Column]] =
    if (!df.columns.contains(column)) None
    else {
      val s = col(column).cast("string")
      Some(Seq(
        count(when(s.isNotNull && !s.rlike(anchored), 1)),
        count(s)))
    }

  def interpret(values: Seq[Any]): RuleResult = {
    val mismatches = asLong(values(0))
    RuleResult(name, mismatches == 0, Some(column), Map(
      "mismatches" -> mismatches,
      "checked" -> asLong(values(1)),
      "pattern" -> pattern))
  }

  def fallback(df: DataFrame): RuleResult =
    RuleResult(name, passed = false, Some(column),
      Map("error" -> s"column '$column' not found"))
}

/** User-defined whole-frame predicate (rules.py:207-243): a Scala
  * function over the DataFrame returning (passed, details). The function
  * runs its own Spark aggregations — it is NOT a row UDF.
  */
final case class CustomRule(
    func: DataFrame => (Boolean, Map[String, Any]),
    name: String = "custom_rule",
    column: Option[String] = None) extends Rule {

  def aggExprs(df: DataFrame): Option[Seq[Column]] = None
  def interpret(values: Seq[Any]): RuleResult =
    throw new IllegalStateException("custom rule evaluates standalone")

  def fallback(df: DataFrame): RuleResult = {
    val (passed, details) = func(df)
    RuleResult(name, passed, column, details)
  }
}

/** Named, composable collection of rules (rules.py:246-260). */
final class RuleSet(val name: String = "default") {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Rule]

  def add(rule: Rule): RuleSet = { buf += rule; this }
  def rules: Seq[Rule] = buf.toSeq
  def size: Int = buf.size

  /** Faithful mode: one job per rule, in insertion order. */
  def evaluate(df: DataFrame): Seq[RuleResult] =
    rules.map(_.evaluate(df))

  /** Fused mode: every fusable rule's aggregates run in ONE scan; the
    * rest (uniqueness/custom/missing-column) evaluate standalone.
    * Results keep insertion order.
    */
  def evaluateFused(df: DataFrame): Seq[RuleResult] = {
    val plan = rules.zipWithIndex.map { case (r, i) => (i, r, r.aggExprs(df)) }
    // Keyed by position in `plan`, never by rule name — two rules may share
    // a (default) name and must still report independently.
    val fusable = plan.collect { case (i, r, Some(exprs)) => (i, r, exprs) }
    val fusedResults: Map[Int, RuleResult] =
      if (fusable.isEmpty) Map.empty
      else {
        val allExprs = fusable.flatMap(_._3)
        val row = df.agg(allExprs.head, allExprs.tail: _*).head()
        val values = Row.unapplySeq(row).get
        var offset = 0
        fusable.map { case (i, r, exprs) =>
          val slice = values.slice(offset, offset + exprs.size)
          offset += exprs.size
          i -> r.interpret(slice)
        }.toMap
      }
    plan.map {
      case (i, _, Some(_)) => fusedResults(i)
      case (_, r, None) => r.fallback(df)
    }
  }
}
