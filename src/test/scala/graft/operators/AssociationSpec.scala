package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Closed-form checks for the association / agreement / seasonality
  * family: seasonal day-of-week profile, binned WOE/IV, Cohen's
  * kappa, and the χ²/Cramér's-V/MI association report.
  */
class AssociationSpec extends SparkSpec {

  // ---- seasonalProfile ----

  private def dated(rows: Seq[(String, String)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("d", StringType))),
    rows.map { case (g, d) => Row(g, d) })

  test("seasonalProfile: weekday mapping, dense grid, exact means") {
    // 1970-01-01 is a Thursday → dow 3 under Monday=0
    val rows = Seq(("g", "1970-01-01"), ("g", "1970-01-01"),
      ("g", "1970-01-08")) // next Thursday; the 6 days between are gaps
    val out = Analytics.seasonalProfile(dated(rows), "g", col("d"))
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out.keySet === (0L to 6L).toSet)
    // Thursday: two days with counts {2, 1} → mean 1.5
    assert(out(3L).getLong(2) === 2L)
    assert(out(3L).getLong(3) === 3L)
    assert(out(3L).getDouble(4) === 1.5)
    // every other weekday: one zero-count gap day
    (0L to 6L).filter(_ != 3L).foreach { d =>
      assert(out(d).getLong(2) === 1L && out(d).getLong(3) === 0L)
      assert(out(d).getDouble(4) === 0.0)
    }
  }

  test("seasonalProfile: an outlier day is flagged at 3σ") {
    // eight Mondays at 10, one Monday at 100 → mean = 20,
    // dev 80 > 3·√20 ≈ 13.4; quiet Mondays dev 10 < 13.4
    val mondays = (0 until 9).map(i =>
      java.time.LocalDate.of(2024, 1, 1).plusWeeks(i).toString)
    val rows = mondays.take(8).flatMap(d => Seq.fill(10)(("g", d))) ++
      Seq.fill(100)(("g", mondays.last))
    val out = Analytics.seasonalProfile(dated(rows), "g", col("d"))
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(0L).getLong(5) === 1L) // one anomalous Monday
    assert(out(0L).getDouble(6) === 80.0) // max |residual|
    // other weekdays are all-zero gap days: mean 0, no anomalies
    assert(out(2L).getLong(5) === 0L)
  }

  // ---- binnedWoe ----

  private def binned(rows: Seq[(Long, Boolean)]) = df(
    StructType(Seq(
      StructField("b", LongType),
      StructField("y", BooleanType))),
    rows.map { case (b, y) => Row(b, y) })

  test("binnedWoe: hand-computed smoothed log-odds and IV") {
    // bin 1: 3 pos / 1 neg; bin 2: 1 pos / 3 neg; totals P=4, N=4
    val rows = Seq((1L, true), (1L, true), (1L, true), (1L, false),
      (2L, true), (2L, false), (2L, false), (2L, false))
    val out = Analytics.binnedWoe(binned(rows), col("b"), col("y"))
      .orderBy("bin").collect()
    val ps1 = 3.5 / 5.0; val ns1 = 1.5 / 5.0
    val woe1 = math.log(ps1 / ns1)
    assert(math.abs(out(0).getDouble(3) - woe1) < 1e-6)
    // symmetric data → antisymmetric WOE, equal IV contributions
    assert(out(0).getDouble(3) === -out(1).getDouble(3))
    assert(out(0).getDouble(4) === out(1).getDouble(4))
    val iv = 2 * (ps1 - ns1) * woe1
    assert(math.abs(out(0).getDouble(5) - iv) < 1e-6)
    assert(out(0).getDouble(5) === out(1).getDouble(5)) // total on every row
  }

  test("binnedWoe: a one-class bin stays finite via smoothing") {
    val rows = Seq((1L, true), (1L, true), (2L, false), (2L, false))
    val out = Analytics.binnedWoe(binned(rows), col("b"), col("y"))
      .orderBy("bin").collect()
    assert(out.forall(r => !r.getDouble(3).isInfinite &&
      !r.getDouble(3).isNaN))
    assert(out(0).getDouble(3) > 0 && out(1).getDouble(3) < 0)
  }

  // ---- cohenKappa ----

  private def labeled(rows: Seq[(String, String)]) = df(
    StructType(Seq(
      StructField("a", StringType),
      StructField("b", StringType))),
    rows.map { case (a, b) => Row(a, b) })

  test("cohenKappa: perfect agreement is 1, constant-vs-varied is 0") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z"))
    val p = Analytics.cohenKappa(labeled(perfect), col("a"), col("b"))
      .collect().head
    assert(p.getDouble(4) === 1.0) // po
    assert(p.getDouble(6) === 1.0) // kappa
    // annotator B always says "x": po equals pe → κ = 0
    val const = Seq(("x", "x"), ("x", "x"), ("y", "x"), ("z", "x"))
    val c = Analytics.cohenKappa(labeled(const), col("a"), col("b"))
      .collect().head
    assert(c.getDouble(6) === 0.0)
  }

  test("cohenKappa: textbook 2×2 case") {
    // classic: a=20 yes/yes, b=5 yes/no, c=10 no/yes, d=15 no/no
    // po = 35/50 = .7; pe = (25·30 + 25·20)/2500 = .5; κ = .4
    val rows = Seq.fill(20)(("yes", "yes")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes")) ++
      Seq.fill(15)(("no", "no"))
    val out = Analytics.cohenKappa(labeled(rows), col("a"), col("b"))
      .collect()
    assert(out.length === 4) // full confusion matrix
    val r = out.head
    assert(r.getLong(3) === 50L)
    assert(r.getDouble(4) === 0.7)
    assert(r.getDouble(5) === 0.5)
    assert(r.getDouble(6) === 0.4)
  }

  // ---- disparateImpact ----

  private def outcomes(rows: Seq[(String, Boolean)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("y", BooleanType))),
    rows.map { case (g, y) => Row(g, y) })

  test("disparateImpact: rates, ratios, and the four-fifths flag") {
    // A: 8/10 (favored), B: 4/10 → ratio 0.5 → flagged
    val rows = (1 to 8).map(_ => ("A", true)) ++
      (1 to 2).map(_ => ("A", false)) ++
      (1 to 4).map(_ => ("B", true)) ++ (1 to 6).map(_ => ("B", false))
    val out = Analytics.disparateImpact(outcomes(rows), "g", col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(3) === 0.8)
    assert(out("A").getDouble(4) === 1.0)
    assert(out("A").getInt(5) === 0)
    assert(out("B").getDouble(4) === 0.5)
    assert(out("B").getInt(5) === 1)
  }

  test("disparateImpact: a group EXACTLY at 0.8 does not flag — the " +
      "cross-multiplied comparison is exact") {
    // A: 5/5 = 1.0; B: 4/5 = 0.8 → 5·4·5 < 4·5·5 is FALSE (equal)
    val rows = (1 to 5).map(_ => ("A", true)) ++
      (1 to 4).map(_ => ("B", true)) :+ (("B", false))
    val out = Analytics.disparateImpact(outcomes(rows), "g", col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("B").getDouble(4) === 0.8)
    assert(out("B").getInt(5) === 0)
    // just below the line flags: C: 7/9 ≈ 0.777…
    val rows2 = rows ++ (1 to 7).map(_ => ("C", true)) ++
      (1 to 2).map(_ => ("C", false))
    val out2 = Analytics.disparateImpact(outcomes(rows2), "g", col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out2("C").getInt(5) === 1)
  }

  // ---- associationReport ----

  test("associationReport: independent columns → zero χ², V and MI") {
    // perfectly independent 2×2: every cell = 25
    val rows = for (a <- Seq("p", "q"); b <- Seq("u", "v");
                    _ <- 1 to 25) yield (a, b)
    val out = Analytics.associationReport(labeled(rows),
      col("a"), col("b")).collect().head
    assert(out.getLong(0) === 100L)
    assert(out.getLong(1) === 2L && out.getLong(2) === 2L)
    assert(out.getDouble(3) === 0.0)
    assert(out.getDouble(4) === 0.0)
    assert(out.getDouble(5) === 0.0)
  }

  test("associationReport: perfect association → V = 1, U = 1, MI = H") {
    val rows = Seq.fill(30)(("p", "u")) ++ Seq.fill(70)(("q", "v"))
    val out = Analytics.associationReport(labeled(rows),
      col("a"), col("b")).collect().head
    assert(out.getDouble(4) === 1.0) // Cramér's V
    // MI equals the (equal) marginal entropies → both U coefficients 1
    val h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert(math.abs(out.getDouble(5) - h) < 1e-6)
    assert(out.getDouble(6) === 1.0 && out.getDouble(7) === 1.0)
  }

  test("associationReport: hand-computed 2×2 χ² via the sparse identity") {
    // cells: (p,u)=10 (p,v)=20 (q,u)=30 (q,v)=40 → N=100
    // χ² = N·(Σ n²/(r·c) − 1) = 100·(100/1200 + 400/1800
    //      + 900/2800 + 1600/4200 − 1)
    val rows = Seq.fill(10)(("p", "u")) ++ Seq.fill(20)(("p", "v")) ++
      Seq.fill(30)(("q", "u")) ++ Seq.fill(40)(("q", "v"))
    val out = Analytics.associationReport(labeled(rows),
      col("a"), col("b")).collect().head
    val chi = 100.0 * (100.0 / 1200 + 400.0 / 1800 + 900.0 / 2800 +
      1600.0 / 4200 - 1.0)
    assert(math.abs(out.getDouble(3) - chi) < 1e-3)
  }
}
