package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.hodgesLehmannShift]] — hand-computed pairwise-diff
  * medians, robustness against a planted outlier, the lower-median
  * convention on even pair counts, and one-sided degenerates.
  */
class HodgesLehmannSpec extends SparkSpec {

  private def frame(rows: (String, Boolean, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("post", BooleanType),
      StructField("v", LongType))),
    rows.map { case (g, p, v) => Row(g, p, v) })

  private def run(rows: (String, Boolean, Long)*) =
    Analytics.hodgesLehmannShift(frame(rows: _*), Seq("g"),
        col("post"), col("v")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap

  test("hand-computed shift: full pairwise enumeration and the " +
      "ceil((n+1)/2) order-statistic median") {
    // a = {1, 11}; b = {10, 20, 30}
    // diffs sorted: -1,9,9,19,19,29; n=6 -> the q333 convention
    // (first value with 2*cum >= n+1, cum >= 4) picks the 4th: 19
    val rows = Seq(("g", false, 1L), ("g", false, 11L),
      ("g", true, 10L), ("g", true, 20L), ("g", true, 30L))
    val r = run(rows: _*)("g")
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("hl_shift_cents") == 19L)
    // odd pair count: drop one a-cell -> diffs {9,19,29}, median 19
    val odd = Seq(("g", false, 1L),
      ("g", true, 10L), ("g", true, 20L), ("g", true, 30L))
    assert(run(odd: _*)("g").getAs[Long]("hl_shift_cents") == 19L)
  }

  test("robust: one wild post outlier barely moves the HL shift " +
      "while it wrecks the difference of means") {
    val a = (1 to 9).map(i => ("g", false, 100L + i))
    val clean = (1 to 8).map(i => ("g", true, 110L + i))
    val wild = Seq(("g", true, 100000L))
    val r = run((a ++ clean ++ wild): _*)("g")
    val hl = r.getAs[Long]("hl_shift_cents")
    assert(hl >= 5L && hl <= 15L) // ~10, not dragged to ~11000
  }

  test("exact shift recovery: b = a + 42 for every cell") {
    val a = Seq(3L, 8L, 1L, 99L, 40L)
    val rows = a.map(v => ("g", false, v)) ++
      a.map(v => ("g", true, v + 42L))
    assert(run(rows: _*)("g").getAs[Long]("hl_shift_cents") == 42L)
  }

  test("a group with an empty side reports zero pairs and a null " +
      "shift") {
    val rows = Seq(("g", false, 1L), ("g", false, 2L),
      ("h", false, 1L), ("h", true, 5L))
    val out = run(rows: _*)
    val g = out("g")
    assert(g.getAs[Long]("n_pairs") == 0L)
    assert(g.isNullAt(g.fieldIndex("hl_shift_cents")))
    assert(out("h").getAs[Long]("hl_shift_cents") == 4L)
  }
}
