package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.generalizedEsd]] — hand-computed rounds, the exact
  * integer-deviation tie-break, and the n≤2 stop guard.
  */
class GeneralizedEsdSpec extends SparkSpec {

  private def values(rows: (String, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("v", LongType),
      StructField("k", LongType))),
    rows.map { case (g, v, k) => Row(g, v, k) })

  private def esd(rounds: Int, rows: (String, Long, Long)*) =
    Analytics.generalizedEsd(values(rows: _*), "g", col("v"),
      col("k"), rounds)

  test("hand-computed: outlier first, then value-asc tie-break, " +
      "then the n<=2 stop") {
    val out = esd(3,
      ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 100L, 4L))
      .orderBy("round").collect()
    // round 3 has n=2 -> suppressed
    assert(out.length == 2)
    assert(out(0).getLong(3) == 100L) // removed_cents
    // R1 = (294/4)/sqrt((4*10014-106^2)/12)
    val r1 = (294.0 / 4) / math.sqrt((4.0 * 10014 - 106.0 * 106) / 12)
    assert(math.abs(out(0).getDouble(4) - r1) < 1e-6)
    // round 2: [1,2,3], devs |1*3-6|=3 and |3*3-6|=3 tie -> value asc
    assert(out(1).getLong(3) == 1L)
    assert(math.abs(out(1).getDouble(4) - 1.0) < 1e-6)
  }

  test("groups are independent: removal in one leaves the other") {
    val out = esd(1,
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 50L, 3L), ("a", 3L, 4L),
      ("b", 5L, 1L), ("b", 6L, 2L), ("b", 7L, 3L))
      .collect()
    val byG = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byG("a") == 50L)
    assert(byG("b") == 5L || byG("b") == 7L)
  }

  test("constant group: zero variance -> NaN-free handling") {
    // sd = 0 -> r is NaN in IEEE; the row still emits with the exact
    // removed value (consumers gate on r_stat's NaN), n stays honest
    val out = esd(1, ("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L),
      ("g", 5L, 4L)).collect()
    assert(out.length == 1 && out.head.getLong(2) == 4L)
    assert(out.head.getLong(3) == 5L)
  }
}
