package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[JaroWinkler]] — bit-exact agreement with DuckDB 1.0's
  * `jaro_winkler_similarity` on pinned reference values (generated
  * from DuckDB itself), the SQL registration / codegen path, and
  * null semantics.
  */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  // (a, b, DuckDB 1.0 jaro_winkler_similarity(a, b)) — exact doubles
  private val reference = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("duane", "dwayne", 0.8400000000000001),
    ("abc", "abc", 1.0),
    ("", "", 0.0), // DuckDB: either-empty → 0, even when equal
    ("a", "", 0.0),
    ("abc", "xyz", 0.0), // no matches
    ("lawn mower green", "lawn mower olive", 0.9),
    ("STANDARD plum", "STANDARD pl", 0.9692307692307692))

  test("static path reproduces DuckDB's doubles bit-for-bit") {
    for ((a, b, want) <- reference) {
      val got = JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(java.lang.Double.doubleToRawLongBits(got) ===
        java.lang.Double.doubleToRawLongBits(want),
        s"jw($a, $b): got $got want $want")
      // symmetry (the matching loop is orientation-symmetric)
      val rev = JaroWinkler.similarity(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(rev === got, s"jw($b, $a) != jw($a, $b)")
    }
  }

  test("SQL registration + codegen path agree with the static path") {
    // parallelize (not a local Seq) so the plan is a real scan —
    // local relations constant-fold through the INTERPRETED path and
    // would never exercise doGenCode
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType)))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          reference.map { case (a, b, _) => Row(a, b) }, 2), schema)
      .withColumn("jw", expr("graft_jaro_winkler(a, b)"))
    // the expression survives whole-stage codegen (no fallback node)
    assert(df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    for ((a, b, want) <- reference) {
      assert(java.lang.Double.doubleToRawLongBits(got((a, b))) ===
        java.lang.Double.doubleToRawLongBits(want),
        s"via codegen: ($a, $b)")
    }
  }

  test("null on either side is null, and the boost threshold gate " +
      "holds at the 0.7 boundary") {
    val df = Seq[(String, String)](
      (null, "abc"), ("abc", null), (null, null))
      .toDF("a", "b")
      .withColumn("jw", expr("graft_jaro_winkler(a, b)"))
    assert(df.collect().forall(_.isNullAt(2)))
    // jaro("abc","xbc") vs ("abc","abx"): prefix 0 vs 2 — only the
    // shared-prefix pair gets the Winkler boost
    val noPrefix = JaroWinkler.similarity(
      UTF8String.fromString("abcdef"), UTF8String.fromString("xbcdef"))
    val prefix = JaroWinkler.similarity(
      UTF8String.fromString("abcdef"), UTF8String.fromString("abcdex"))
    assert(prefix > noPrefix)
  }
}
