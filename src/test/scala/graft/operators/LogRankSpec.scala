package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.logRank]] — hand-computed O/E/V increments, null-χ²
  * degenerate strata, and the zero statistic on identical curves.
  */
class LogRankSpec extends SparkSpec {

  private def subjects(rows: (String, Boolean, Long, Boolean)*) = df(
    StructType(Seq(
      StructField("s", StringType),
      StructField("g1", BooleanType),
      StructField("t", LongType),
      StructField("e", BooleanType))),
    rows.map { case (s, g, t, e) => Row(s, g, t, e) })

  private def lr(rows: (String, Boolean, Long, Boolean)*) =
    Analytics.logRank(subjects(rows: _*), "s", col("g1"), col("t"),
      col("e"))

  test("hand-computed: events at t=1 (both groups) and t=3 (group 0)") {
    // t=1: n1=2 n0=2 d=2 d1=1 -> E1 += 2*2/4 = 1, V += 16/48
    // t=3: n1=0 (g1's t=2 censor left) n0=1 d=1 d1=0 -> adds nothing
    val out = lr(
      ("s", true, 1L, true), ("s", true, 2L, false),
      ("s", false, 1L, true), ("s", false, 3L, true)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L) // n1, n0
    assert(r.getLong(3) == 1L)                       // o1
    assert(r.getLong(4) == 1000000000L)              // e1_nano
    assert(r.getLong(5) == 333333333L)               // var_nano
    assert(r.getDouble(6) == 0.0)                    // chi2: O1 == E1
  }

  test("one-group stratum: zero variance -> null chi2, not NaN") {
    val out = lr(("s", true, 1L, true), ("s", true, 2L, true)).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 0L)
    assert(out.head.isNullAt(6))
  }

  test("separated curves score a larger chi2 than identical ones") {
    // identical: both groups event at t=1,2
    val same = lr(
      ("s", true, 1L, true), ("s", true, 2L, true),
      ("s", false, 1L, true), ("s", false, 2L, true))
      .collect().head
    assert(same.getDouble(6) == 0.0)
    // separated: group1 events late, group0 early
    val apart = lr(
      ("s", true, 10L, true), ("s", true, 11L, true),
      ("s", true, 12L, true),
      ("s", false, 1L, true), ("s", false, 2L, true),
      ("s", false, 3L, true))
      .collect().head
    assert(apart.getDouble(6) > 3.0, s"chi2 = ${apart.getDouble(6)}")
  }

  test("censoring reduces the risk set but adds no events") {
    val out = lr(
      ("s", true, 5L, false), ("s", true, 6L, false),
      ("s", false, 1L, true), ("s", false, 2L, true)).collect().head
    assert(out.getLong(3) == 0L) // o1: no group-1 events
    // t=1: n1=2 n0=2 d=1 -> E1 += 1*2/4 = .5
    // t=2: n1=2 n0=1 d=1 -> E1 += 1*2/3
    assert(out.getLong(4) == 500000000L + 666666666L)
  }
}
