package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Closed-form checks for the causal/calibration family: isotonic
  * (PAV) calibration via the min-max identity, the Simpson's-paradox
  * screen, and the md5-keyed randomization test.
  */
class CausalEvalSpec extends SparkSpec {

  // ---- isotonicCalibration ----

  private def binned(rows: Seq[(String, Long, Boolean)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("b", LongType),
      StructField("y", BooleanType))),
    rows.map { case (g, b, y) => Row(g, b, y) })

  private def iso(rows: Seq[(String, Long, Boolean)], maxBins: Int = 256) =
    Analytics.isotonicCalibration(binned(rows), "g", col("b"), col("y"),
      maxBins)

  test("isotonic: already-monotone rates pass through unchanged") {
    // rates 0.25, 0.5, 0.75 over bins 1..3
    val rows = Seq(
      ("g", 1L, true), ("g", 1L, false), ("g", 1L, false), ("g", 1L, false),
      ("g", 2L, true), ("g", 2L, false),
      ("g", 3L, true), ("g", 3L, true), ("g", 3L, true), ("g", 3L, false))
    val out = iso(rows).orderBy("bin").collect()
    assert(out.map(_.getDouble(4)).toSeq === Seq(0.25, 0.5, 0.75))
    assert(out.map(_.getDouble(5)).toSeq === Seq(0.25, 0.5, 0.75))
  }

  test("isotonic: a violating pair pools to its weighted average") {
    // bin 1: 1/2, bin 2: 0/2 → pooled (1+0)/(2+2) = 0.25 on both
    val rows = Seq(("g", 1L, true), ("g", 1L, false),
      ("g", 2L, false), ("g", 2L, false))
    val out = iso(rows).orderBy("bin").collect()
    assert(out.map(_.getDouble(5)).toSeq === Seq(0.25, 0.25))
    // unequal weights: 1/1 then 0/3 → pooled 1/4
    val w = Seq(("g", 1L, true), ("g", 2L, false), ("g", 2L, false),
      ("g", 2L, false))
    val wo = iso(w).orderBy("bin").collect()
    assert(wo.map(_.getDouble(5)).toSeq === Seq(0.25, 0.25))
  }

  test("isotonic: textbook three-bin partial pool, per group") {
    // rates {0.2, 0.6, 0.4} × 10 → PAV pools bins 2,3 to 0.5;
    // a second already-flat group is untouched
    val mk = (b: Long, pos: Int) =>
      (1 to pos).map(_ => ("g", b, true)) ++
        (1 to 10 - pos).map(_ => ("g", b, false))
    val rows = mk(1L, 2) ++ mk(2L, 6) ++ mk(3L, 4) ++
      Seq(("h", 1L, true), ("h", 2L, true))
    val out = iso(rows).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(out(("g", 1L)) === 0.2)
    assert(out(("g", 2L)) === 0.5)
    assert(out(("g", 3L)) === 0.5)
    assert(out(("h", 1L)) === 1.0 && out(("h", 2L)) === 1.0)
  }

  test("isotonic: the maxBins guard fires") {
    val rows = (1L to 5L).map(b => ("g", b, true))
    val e = intercept[Exception] {
      iso(rows, maxBins = 3).collect()
    }
    assert(e.getMessage != null)
  }

  // ---- simpsonScreen ----

  private def cohorts(rows: Seq[(Boolean, String, Boolean)]) = df(
    StructType(Seq(
      StructField("a", BooleanType),
      StructField("s", StringType),
      StructField("y", BooleanType))),
    rows.map { case (a, s, y) => Row(a, s, y) })

  test("simpsonScreen: the kidney-stone reversal flags both strata") {
    // A wins in each stratum, loses overall (classic numbers)
    def block(a: Boolean, s: String, pos: Int, n: Int) =
      (1 to pos).map(_ => (a, s, true)) ++
        (1 to n - pos).map(_ => (a, s, false))
    val rows = block(true, "small", 81, 87) ++
      block(false, "small", 234, 270) ++
      block(true, "large", 192, 263) ++
      block(false, "large", 55, 80)
    val out = Analytics.simpsonScreen(cohorts(rows), col("a"),
        col("s"), col("y"))
      .orderBy("stratum").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getDouble(7) > 0) // per-stratum: A better
      assert(r.getDouble(8) < 0) // overall: A worse
      assert(r.getInt(9) === 1)
    }
  }

  test("simpsonScreen: an empty cohort reports null rates, flag 0") {
    val rows = Seq((true, "s1", true), (true, "s1", false),
      (false, "s2", true), (true, "s2", false))
    val out = Analytics.simpsonScreen(cohorts(rows), col("a"),
        col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s1").isNullAt(6)) // no B units in s1
    assert(out("s1").getInt(9) === 0)
    assert(out("s2").getDouble(5) === 0.0) // A present, rate 0
  }

  // ---- permutationTest ----

  private def valued(rows: Seq[(String, Long, Boolean)]) = df(
    StructType(Seq(
      StructField("u", StringType),
      StructField("v", LongType),
      StructField("a", BooleanType))),
    rows.map { case (u, v, a) => Row(u, v, a) })

  test("permutationTest: identical cohorts give p = 1") {
    val rows = (1 to 10).map(i => (s"a$i", 100L, true)) ++
      (1 to 10).map(i => (s"b$i", 100L, false))
    val out = Analytics.permutationTest(valued(rows), col("u"),
      col("v"), col("a")).collect().head
    assert(out.getLong(0) === 10L && out.getLong(1) === 10L)
    assert(out.getDouble(2) === 0.0)
    assert(out.getDouble(5) === 1.0) // every |d| ≥ 0
  }

  test("permutationTest: a strong effect is significant and " +
      "deterministic") {
    val rows = (1 to 15).map(i => (s"a$i", 1000L, true)) ++
      (1 to 15).map(i => (s"b$i", 0L, false))
    val run1 = Analytics.permutationTest(valued(rows), col("u"),
      col("v"), col("a")).collect().head
    assert(run1.getDouble(2) === 1000.0)
    assert(run1.getDouble(5) < 0.05)
    val run2 = Analytics.permutationTest(valued(rows), col("u"),
      col("v"), col("a")).collect().head
    assert(run1 === run2) // md5 assignment: no RNG state, bit-stable
  }

  // ---- cuped ----

  private def prePost(rows: Seq[(Boolean, Long, Long)]) = df(
    StructType(Seq(
      StructField("a", BooleanType),
      StructField("x", LongType),
      StructField("y", LongType))),
    rows.map { case (a, x, y) => Row(a, x, y) })

  test("cuped: hand-computed θ, ρ² and adjusted means") {
    // A: (1,3),(3,5); B: (2,1),(4,3) → θ = 0.4, ρ² = 0.1,
    // adj(A) = 4.2, adj(B) = 1.8
    val rows = Seq((true, 1L, 3L), (true, 3L, 5L),
      (false, 2L, 1L), (false, 4L, 3L))
    val out = Analytics.cuped(prePost(rows), col("a"), col("x"),
        col("y"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getDouble(4) === 4.2)
    assert(out(0).getDouble(4) === 1.8)
    assert(out(1).getDouble(5) === 0.4)
    assert(out(1).getDouble(6) === 0.1)
  }

  test("cuped: a perfectly-predictive covariate equalizes the arms") {
    // y = x exactly → θ = 1, ρ² = 1, both adjusted means collapse to
    // the pooled mean
    val rows = Seq((true, 10L, 10L), (true, 20L, 20L),
      (false, 30L, 30L), (false, 40L, 40L))
    val out = Analytics.cuped(prePost(rows), col("a"), col("x"),
        col("y"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getDouble(5) === 1.0 && out(1).getDouble(6) === 1.0)
    assert(out(1).getDouble(4) === 25.0)
    assert(out(0).getDouble(4) === 25.0)
  }

  test("cuped: zero-variance covariate reports null θ, not IEEE junk") {
    val rows = Seq((true, 5L, 1L), (true, 5L, 2L),
      (false, 5L, 3L), (false, 5L, 4L))
    val out = Analytics.cuped(prePost(rows), col("a"), col("x"),
      col("y")).collect()
    out.foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }

  // ---- bootstrapRatioCI ----

  private def ratios(rows: Seq[(String, Long, Long)]) = df(
    StructType(Seq(
      StructField("u", StringType),
      StructField("num", LongType),
      StructField("den", LongType))),
    rows.map { case (u, n, d) => Row(u, n, d) })

  test("bootstrapRatioCI: a constant per-unit ratio collapses the " +
      "interval to the point") {
    // every unit has num = 7·den → every replicate ratio is exactly 7
    val rows = (1 to 30).map(i => (s"u$i", 7L * i, i.toLong))
    val out = Analytics.bootstrapRatioCI(ratios(rows), col("u"),
      col("num"), col("den"), replicas = 49).collect().head
    assert(out.getLong(0) === 30L)
    assert(out.getDouble(2) === 7.0)
    assert(out.getDouble(3) === 7.0)
    assert(out.getDouble(4) === 7.0 && out.getDouble(5) === 7.0)
  }

  test("bootstrapRatioCI: deterministic, ordered, and covering") {
    val rows = (1 to 40).map(i => (s"u$i", (i * 13 % 97).toLong, 1L))
    val a = Analytics.bootstrapRatioCI(ratios(rows), col("u"),
      col("num"), col("den")).collect().head
    val b = Analytics.bootstrapRatioCI(ratios(rows), col("u"),
      col("num"), col("den")).collect().head
    assert(a === b) // md5 weights: no RNG state
    assert(a.getDouble(4) <= a.getDouble(5))
    assert(a.getDouble(2) >= a.getDouble(4) &&
      a.getDouble(2) <= a.getDouble(5))
    assert(a.getLong(1) <= 199L && a.getLong(1) > 150L)
    intercept[IllegalArgumentException] {
      Analytics.bootstrapRatioCI(ratios(rows), col("u"), col("num"),
        col("den"), replicas = 5)
    }
  }

  // ---- qiniCurve ----

  test("qiniCurve: hand-computed two-bin curve, descending bins") {
    val rows = Seq(
      // bin 2 (high score): treated respond, control don't
      (true, 2L, true), (true, 2L, true),
      (false, 2L, false), (false, 2L, false),
      // bin 1: the reverse
      (true, 1L, false), (true, 1L, false),
      (false, 1L, true), (false, 1L, true))
      .map { case (t, b, y) => (b, t, y) }
    val in = df(
      StructType(Seq(StructField("b", LongType),
        StructField("t", BooleanType), StructField("y", BooleanType))),
      rows.map { case (b, t, y) => Row(b, t, y) })
    val out = Analytics.qiniCurve(in, col("b"), col("t"), col("y"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 1L)) // descending
    assert(out(0).getDouble(5) === 1.0) // uplift at the top bin
    assert(out(1).getDouble(5) === -1.0)
    assert(out(0).getDouble(6) === 2.0) // Qini: 2 − 0·(2/2)
    assert(out(1).getDouble(6) === 0.0) // fully cumulated: 2 − 2·1
  }

  test("qiniCurve: a control-free prefix reports null Qini, not ±Inf") {
    val in = df(
      StructType(Seq(StructField("b", LongType),
        StructField("t", BooleanType), StructField("y", BooleanType))),
      Seq(Row(2L, true, true), Row(1L, false, true)))
    val out = Analytics.qiniCurve(in, col("b"), col("t"), col("y"))
      .collect()
    assert(out(0).isNullAt(5) && out(0).isNullAt(6))
    assert(!out(1).isNullAt(6))
  }

  test("permutationTest: units aggregate before relabeling") {
    // one unit with three rows must move atomically: two units total
    // → every replica has at most singleton sides; with equal unit
    // sums the diff is 0 or ±0 — p stays 1
    val rows = Seq(("u1", 40L, true), ("u1", 30L, true),
      ("u1", 30L, true), ("u2", 100L, false))
    val out = Analytics.permutationTest(valued(rows), col("u"),
      col("v"), col("a")).collect().head
    assert(out.getLong(0) === 1L && out.getLong(1) === 1L)
    assert(out.getDouble(2) === 0.0)
    assert(out.getDouble(5) === 1.0)
  }
}
