package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Percentile clipping ([[Analytics.winsorize]]). */
class WinsorizeSpec extends SparkSpec {

  test("winsorize clamps into the exact per-group quantile range; " +
      "nulls pass through untouched") {
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g", StringType),
        StructField("v", DoubleType, nullable = true))),
      ((1 to 100).map(i => Row(i, "a", i.toDouble)) ++
        (101 to 200).map(i => Row(i, "b", (i - 100) * 10.0)) :+
        Row(999, "a", null)))
    val out = Analytics.winsorize(d, "v", pLo = 0.1, pHi = 0.9,
        groupCols = Seq("g"), exact = true)
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(r.fieldIndex("v_w"))) None
         else Some(r.getDouble(r.fieldIndex("v_w"))))).toMap
    def near(got: Option[Double], want: Double) =
      got.exists(g => math.abs(g - want) < 1e-9)
    // group a = 1..100: interpolated p10 = 10.9, p90 = 90.1
    assert(near(out(1), 10.9) && near(out(5), 10.9))
    assert(near(out(100), 90.1) && near(out(95), 90.1))
    assert(out(50) == Some(50.0)) // interior untouched
    // group b = 10..1000 step 10: its OWN cutoffs, 10x scale
    assert(near(out(101), 109.0) && near(out(200), 901.0))
    assert(out(999).isEmpty, "null must stay null, not become the floor")
  }

  test("winsorize global mode; approx default agrees with exact when " +
      "the quantiles land on data values") {
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("v", DoubleType))),
      (0 to 100).map(i => Row(i, i.toDouble)))
    // 0..100: p05/p95 land exactly on 5 and 95 → approx == exact
    val ex = Analytics.winsorize(d, "v", 0.05, 0.95, exact = true)
      .agg(sum("v_w")).head().getDouble(0)
    val ap = Analytics.winsorize(d, "v", 0.05, 0.95)
      .agg(sum("v_w")).head().getDouble(0)
    assert(ex == ap)
    assert(ex == (0 to 100).map(x => math.min(math.max(x, 5), 95)).sum)
  }
}
