package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Analytics.bradleyTerry]] — exact fixed-point preference
  * strengths, and [[Analytics.msprtMonitor]] — the always-valid
  * sequential test.
  */
class BradleyTerrySpec extends SparkSpec {

  private def comps(rows: Seq[(String, String)]) = df(
    StructType(Seq(
      StructField("w", StringType),
      StructField("l", StringType))),
    rows.map { case (w, l) => Row(w, l) })

  test("bradleyTerry: a dominance chain orders strengths; strengths " +
      "average to 1") {
    val rows =
      (1 to 9).map(_ => ("A", "B")) ++ Seq(("B", "A")) ++
        (1 to 9).map(_ => ("B", "C")) ++ Seq(("C", "B")) ++
        (1 to 9).map(_ => ("A", "C")) ++ Seq(("C", "A"))
    val out = Analytics.bradleyTerry(comps(rows), "w", "l")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(3) > out("B").getLong(3))
    assert(out("B").getLong(3) > out("C").getLong(3))
    assert(out("A").getLong(1) === 18L) // wins
    assert(out("A").getLong(2) === 20L) // comparisons
    // normalization: micro strengths sum to ~3·1e6 (floor slack ≤ 3)
    val tot = out.values.map(_.getLong(3)).sum
    assert(math.abs(tot - 3000000L) <= 3L)
  }

  test("bradleyTerry: an even pair splits evenly; runs are " +
      "bit-identical") {
    val rows = (1 to 5).flatMap(_ => Seq(("X", "Y"), ("Y", "X")))
    val a = Analytics.bradleyTerry(comps(rows), "w", "l").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a("X") === a("Y"))
    val b = Analytics.bradleyTerry(comps(rows), "w", "l").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a === b)
  }

  test("bradleyTerry: a never-winning item floors at 1 micro-unit, " +
      "never 0 (a later pair would divide by zero)") {
    val rows = (1 to 10).map(_ => ("A", "B"))
    val out = Analytics.bradleyTerry(comps(rows), "w", "l")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("B") === 1L)
    assert(out("A") > 1000000L)
  }

  // ---- kmvOverlap ----

  private def members(rows: Seq[(String, String)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("id", StringType))),
    rows.map { case (g, id) => Row(g, id) })

  test("kmvOverlap: below k the sketch is exact — estimates equal " +
      "exact counts; disjoint groups clamp to zero") {
    val rows = (1 to 30).map(i => ("A", s"u$i")) ++
      (21 to 50).map(i => ("B", s"u$i")) ++
      (100 to 119).map(i => ("C", s"u$i"))
    val out = Analytics.kmvOverlap(members(rows), "g", "id", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getLong(2) === 30L && ab.getLong(3) === 30L)
    assert(ab.getLong(4) === 10L) // u21..u30
    assert(ab.getDouble(6) === 30.0 && ab.getDouble(8) === 50.0)
    assert(ab.getDouble(9) === 10.0) // exact regime intersection
    assert(ab.getInt(10) === 1)
    val ac = out(("A", "C"))
    assert(ac.getLong(4) === 0L)
    assert(ac.getDouble(9) === 0.0 && ac.getInt(10) === 1)
  }

  test("kmvOverlap: the sketch regime estimates within the audited " +
      "tolerance and runs are bit-identical") {
    // 300 + 300 members, 150 shared, k = 64 → estimation kicks in
    val rows = (1 to 300).map(i => ("A", s"m$i")) ++
      (151 to 450).map(i => ("B", s"m$i"))
    val a = Analytics.kmvOverlap(members(rows), "g", "id", k = 64)
      .collect().head
    assert(a.getLong(4) === 150L)
    assert(a.getInt(10) === 1) // within 3/√k of the union + slack
    assert(a.getDouble(8) > 300.0) // union estimate is in range
    val b = Analytics.kmvOverlap(members(rows), "g", "id", k = 64)
      .collect().head
    assert(a === b)
  }

  // ---- msprtMonitor ----

  private def outcomes(rows: Seq[(String, Long, Boolean)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("p", LongType),
      StructField("y", BooleanType))),
    rows.map { case (g, p, y) => Row(g, p, y) })

  test("msprt: data exactly at p0 never rejects — p stays 1") {
    val rows = (1L to 10L).flatMap(p =>
      Seq(("g", p, true), ("g", p, false))) // rate 0.5 every period
    val out = Analytics.msprtMonitor(outcomes(rows), "g", col("p"),
        col("y"), p0 = 0.5, tau2 = 0.01)
      .orderBy("period").collect()
    out.foreach { r =>
      assert(r.getDouble(6) === 1.0)
      assert(r.getInt(7) === 0)
    }
    assert(out.last.getLong(2) === 20L) // cumulative n
  }

  test("msprt: a strong persistent effect rejects, and the " +
      "always-valid p never increases") {
    val rows = (1L to 12L).flatMap(p =>
      (1 to 9).map(_ => ("g", p, true)) :+ (("g", p, false)))
    val out = Analytics.msprtMonitor(outcomes(rows), "g", col("p"),
        col("y"), p0 = 0.3, tau2 = 0.01)
      .orderBy("period").collect()
    val ps = out.map(_.getDouble(6)).toSeq
    assert(ps.sliding(2).forall(s => s.last <= s.head + 1e-12))
    assert(out.last.getInt(7) === 1)
  }
}
