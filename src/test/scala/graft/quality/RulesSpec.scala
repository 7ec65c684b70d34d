package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors /root/reference/tests/test_rules.py behaviors against Spark. */
class RulesSpec extends SparkSpec {

  // -- CompletenessRule (test_rules.py:10-45) ------------------------- //

  test("completeness passes on clean data") {
    val r = CompletenessRule(Seq("id", "name")).evaluate(cleanDf)
    assert(r.passed)
  }

  test("completeness fails on nulls with exact null_count") {
    val r = CompletenessRule(Seq("id")).evaluate(messyDf)
    assert(!r.passed)
    val failures = r.details("failures").asInstanceOf[Map[String, Any]]
    val idInfo = failures("id").asInstanceOf[Map[String, Any]]
    assert(idInfo("null_count") == 1L)
    assert(idInfo("completeness") == 0.8)
  }

  test("completeness threshold 0.7 passes 4/5 non-null") {
    val r = CompletenessRule(Seq("id"), threshold = 0.7).evaluate(messyDf)
    assert(r.passed)
  }

  test("completeness on empty frame passes (ratio 1.0)") {
    val r = CompletenessRule(Seq("id")).evaluate(cleanDf.limit(0))
    assert(r.passed)
  }

  test("completeness missing column fails with error, still checks the rest") {
    val r = CompletenessRule(Seq("id", "nope")).evaluate(messyDf)
    assert(!r.passed)
    val failures = r.details("failures").asInstanceOf[Map[String, Any]]
    assert(failures.contains("nope"))
    assert(failures.contains("id")) // present column still evaluated
  }

  // -- UniquenessRule (test_rules.py:48-79) --------------------------- //

  test("uniqueness passes on unique keys") {
    val r = UniquenessRule(Seq("id")).evaluate(cleanDf)
    assert(r.passed)
    assert(r.details("duplicate_rows") == 0L)
  }

  test("uniqueness counts ALL members of duplicate groups (keep=False)") {
    val r = UniquenessRule(Seq("id")).evaluate(messyDf)
    assert(!r.passed)
    assert(r.details("duplicate_rows") == 2L) // both id=2 rows
    assert(r.details("total_rows") == 5L)
    assert(r.details("unique_rows") == 3L)
  }

  test("uniqueness on composite key") {
    val r = UniquenessRule(Seq("id", "name")).evaluate(messyDf)
    assert(r.passed) // (2,bob) vs (2,carol) differ on name
  }

  test("uniqueness missing column fails with error") {
    val r = UniquenessRule(Seq("nope")).evaluate(cleanDf)
    assert(!r.passed)
    assert(r.details.contains("error"))
  }

  // -- RangeRule (test_rules.py:82-116) ------------------------------- //

  test("range passes in-bounds") {
    val r = RangeRule("score", Some(0), Some(100)).evaluate(cleanDf)
    assert(r.passed)
  }

  test("range counts violations on both sides") {
    val r = RangeRule("score", Some(0), Some(100)).evaluate(messyDf)
    assert(!r.passed)
    assert(r.details("violations") == 2L) // 120 and -5
    assert(r.details("checked") == 5L)
    assert(r.details("min_found") == Some(-5.0))
    assert(r.details("max_found") == Some(120.0))
  }

  test("range min-only and max-only") {
    assert(!RangeRule("score", minVal = Some(0)).evaluate(messyDf).passed)
    assert(RangeRule("score", minVal = Some(-100)).evaluate(messyDf).passed)
  }

  test("range ignores nulls") {
    val d = cleanDf.withColumn("score",
      when(col("id") === 1, lit(null).cast("int")).otherwise(col("score")))
    val r = RangeRule("score", Some(0), Some(100)).evaluate(d)
    assert(r.passed)
    assert(r.details("checked") == 4L)
  }

  // -- PatternRule (test_rules.py:119-150) ---------------------------- //

  test("pattern passes valid emails") {
    val r = PatternRule("email", "[\\w.]+@[\\w.]+\\.\\w+").evaluate(cleanDf)
    assert(r.passed)
  }

  test("pattern counts mismatches, skips nulls") {
    val r = PatternRule("email", "[\\w.]+@[\\w.]+\\.\\w+").evaluate(messyDf)
    assert(!r.passed)
    assert(r.details("mismatches") == 1L) // "bad-email"; null skipped
    assert(r.details("checked") == 4L)
  }

  test("pattern anchors at start only (pandas str.match)") {
    // 'a|b' must match only values STARTING with a or b, not containing
    val d = df(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))),
      Seq(org.apache.spark.sql.Row("apple"),
        org.apache.spark.sql.Row("xa")))
    val r = PatternRule("v", "a|b").evaluate(d)
    assert(!r.passed)
    assert(r.details("mismatches") == 1L) // "xa" doesn't start with a|b
  }

  test("pattern validates 10-digit CIK and ticker on financial fixture") {
    assert(PatternRule("cik", "\\d{10}$").evaluate(financialDf).passed)
    assert(PatternRule("ticker", "[A-Z]{1,5}$").evaluate(financialDf).passed)
  }

  // -- CustomRule (test_rules.py:153-176) ----------------------------- //

  test("custom rule runs arbitrary frame predicate") {
    val r = CustomRule(
      d => {
        val n = d.count()
        (n >= 5, Map("row_count" -> n))
      },
      name = "min_rows").evaluate(cleanDf)
    assert(r.passed)
    assert(r.details("row_count") == 5L)
  }

  // -- RuleSet / fusion ----------------------------------------------- //

  test("fused evaluation matches per-rule evaluation") {
    val rs = new RuleSet()
      .add(CompletenessRule(Seq("id", "email")))
      .add(UniquenessRule(Seq("id")))
      .add(RangeRule("score", Some(0), Some(100)))
      .add(PatternRule("email", "[\\w.]+@[\\w.]+\\.\\w+"))
    val faithful = rs.evaluate(messyDf)
    val fused = rs.evaluateFused(messyDf)
    assert(faithful.map(r => (r.ruleName, r.passed, r.details)) ==
      fused.map(r => (r.ruleName, r.passed, r.details)))
  }

  test("fused evaluation keeps same-named rules distinct (ADVICE r01)") {
    // Two RangeRules on the same column share the default name but have
    // different bounds — each must report its own verdict.
    val rs = new RuleSet()
      .add(RangeRule("score", Some(0), Some(100)))   // fails on messy
      .add(RangeRule("score", Some(-100), Some(200))) // passes
    val out = rs.evaluateFused(messyDf)
    assert(out.map(_.passed) == Seq(false, true))
  }
}
