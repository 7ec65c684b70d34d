package graft.quality

import graft.SparkSpec

/** Mirrors /root/reference/tests/test_validator.py. */
class ValidatorSpec extends SparkSpec {

  private def validator = new DataValidator("test_ds")
    .addRule(CompletenessRule(Seq("id")))
    .addRule(UniquenessRule(Seq("id")))
    .addRule(RangeRule("score", Some(0), Some(100)))

  test("report structure and counts on clean data") {
    val rep = validator.validate(cleanDf)
    assert(rep.passed)
    assert(rep.passCount == 3 && rep.failCount == 0)
    assert(rep.rowCount == 5 && rep.columnCount == 4)
    assert(rep.results.size == 3)
  }

  test("report counts failures on messy data") {
    val rep = validator.validate(messyDf)
    assert(!rep.passed)
    assert(rep.failCount == 3)
    assert(rep.failures.size == 3)
  }

  test("fused and faithful modes agree") {
    val a = validator.validate(messyDf, fused = true)
    val b = validator.validate(messyDf, fused = false)
    assert(a.results.map(r => (r.ruleName, r.passed)) ==
      b.results.map(r => (r.ruleName, r.passed)))
  }

  test("toDict matches reference report.py layout (ADVICE r01)") {
    val rep = validator.validate(cleanDf)
    val d = rep.toDict
    assert(d.keySet == Set("name", "passed", "summary", "results"))
    val s = d("summary").asInstanceOf[Map[String, Any]]
    assert(s("total_rules") == 3)
    assert(s("passed") == 3)
    assert(s("failed") == 0)
    assert(s("rows_checked") == 5L)
    assert(s("columns_checked") == 4)
    val r0 = d("results").asInstanceOf[Seq[Map[String, Any]]].head
    assert(r0.keySet == Set("rule", "severity", "column", "details"))
    assert(r0("severity") == "PASS")
  }

  test("failuresDetail renders failed rules with details (report.py:84-99)") {
    val rep = validator.validate(messyDf)
    val out = rep.failuresDetail
    assert(out.contains("Failures (3):"))
    assert(out.contains("FAIL  uniqueness_id"))
    assert(out.contains("duplicate_rows: 2"))
    assert(validator.validate(cleanDf).failuresDetail == "  No failures.")
  }

  test("toJson renders without error and carries the summary") {
    val j = validator.validate(cleanDf).toJson
    assert(j.contains("\"summary\""))
    assert(j.contains("\"total_rules\": 3"))
  }
}
