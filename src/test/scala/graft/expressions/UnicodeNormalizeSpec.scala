package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `graft_normalize` ([[UnicodeNormalize]]). All non-ASCII is spelled
  * as \\u escapes — composed and decomposed forms are visually
  * identical, so literal source text would be unreviewable.
  */
class UnicodeNormalizeSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("s", StringType)))

  private val decomposed = "cafe\u0301" // e + COMBINING ACUTE
  private val composed = "caf\u00e9"    // precomposed é

  private def norm(s: String, form: String): String =
    df(schema, Seq(Row(s)))
      .select(call_function("graft_normalize", col("s"), lit(form)))
      .collect()(0).getString(0)

  test("NFC composes e + combining acute; NFD decomposes the " +
      "precomposed form; both are idempotent") {
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    assert(norm(composed, "NFC") == composed)
    assert(norm(decomposed, "NFD") == decomposed)
  }

  test("NFKC folds compatibility characters (ligature fi, full-width " +
      "digits) where NFC preserves them") {
    assert(norm("\ufb01le", "NFKC") == "file")
    assert(norm("\ufb01le", "NFC") == "\ufb01le")
    assert(norm("\uff11\uff12\uff13", "NFKC") == "123")
  }

  test("non-composable trailing characters stay decomposed under NFC") {
    assert(norm("xyzt\u0301", "NFC") == "xyzt\u0301")
    assert(norm("end.\u0301", "NFC") == "end.\u0301")
  }

  test("null input yields null; bad form fails analysis") {
    val got = df(schema, Seq(Row(null)))
      .select(call_function("graft_normalize", col("s"), lit("NFC")))
      .collect()(0)
    assert(got.isNullAt(0))
    val err = intercept[Exception] {
      df(schema, Seq(Row("x")))
        .select(call_function("graft_normalize", col("s"), lit("NFX")))
        .collect()
    }
    assert(err.getMessage.contains("graft_normalize"))
  }

  test("the expression evaluates inside whole-stage codegen") {
    val d = df(schema, Seq(Row(decomposed), Row("plain")))
      .select(call_function("graft_normalize", col("s"), lit("NFC"))
        .as("n"))
    // `*(1)` is the whole-stage-codegen stage marker in the plan
    // string — the projection containing graft_normalize runs compiled
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_normalize"), plan)
    assert(d.collect().map(_.getString(0)).toSet ==
      Set(composed, "plain"))
  }
}
