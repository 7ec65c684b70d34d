package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PiiIncidenceSpec extends SparkSpec {

  private def docs(rows: Seq[(String, String)]) = df(
    StructType(Seq(
      StructField("src", StringType),
      StructField("text", StringType, nullable = true))),
    rows.map { case (s, t) => Row(s, t) })

  private def run(rows: Seq[(String, String)]) =
    TextAnalysis.piiIncidence(docs(rows), "text", Seq("src"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("per-type counts: docs with, total matches, fraction") {
    val out = run(Seq(
      ("a", "mail me at x@y.com or z@w.org"), // 2 emails, 1 doc
      ("a", "ssn 123-45-6789 and 987-65-4321"), // 2 ssns
      ("a", "clean"),
      ("b", "call 555-123-4567")))
    assert(out(("a", "email")) === ((3L, 1L, 2L)))
    assert(out(("a", "ssn")) === ((3L, 1L, 2L)))
    assert(out(("a", "phone")) === ((3L, 0L, 0L)))
    assert(out(("b", "phone")) === ((1L, 1L, 1L)))
    assert(out(("b", "email")) === ((1L, 0L, 0L)))
  }

  test("SSN and phone patterns do not double-count each other") {
    // 3-2-4 digits is SSN only; 3-3-4 is phone only
    val out = run(Seq(("a", "123-45-6789 555-123-4567")))
    assert(out(("a", "ssn"))._3 === 1L)
    assert(out(("a", "phone"))._3 === 1L)
  }

  test("null text counts as a clean document") {
    val out = run(Seq(("a", null), ("a", "x@y.com")))
    assert(out(("a", "email")) === ((2L, 1L, 1L)))
  }

  test("every group emits all three types (zeros included)") {
    val out = run(Seq(("a", "nothing here")))
    assert(out.keySet === Set(("a", "email"), ("a", "ssn"),
      ("a", "phone")))
  }
}
