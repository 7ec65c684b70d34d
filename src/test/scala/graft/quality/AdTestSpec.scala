package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Drift.adTest]] — hand-computed A² on a two-value table,
  * identical snapshots scoring ~0, the tail-sensitivity contrast
  * against CvM, degenerate guards, and the q315 tail plant on the
  * real corpus.
  */
class AdTestSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  private def ad(base: Seq[(String, Long)], cur: Seq[(String, Long)]) =
    Drift.adTest(side(base: _*), side(cur: _*), "x", Seq("g"))

  test("hand-computed: base all 1s, cur all 2s -> one interior " +
      "block with M=n1, B=n1: A2 = l*(N*n1 - n1*n1)^2/(n1*n2)/" +
      "(B(N-B)) = N") {
    // n1 = n2 = 3: gap num = 6*3 - 3*3 = 9; l = 3? no - the block at
    // value 1 holds cb=3, cc=0 -> l=3, B=3, N-B=3: term = 3*81/9 = 27
    // A2 = 27/(3*3) = 3 = ... the fully-separated two-point case
    val out = ad(Seq(("g", 1L), ("g", 1L), ("g", 1L)),
      Seq(("g", 2L), ("g", 2L), ("g", 2L))).head()
    assert(out.getDouble(3) == 3.0)
    assert(out.getBoolean(4))
  }

  test("identical snapshots: every gap is zero, A2 = 0, quiet") {
    val rows = Seq(("g", 1L), ("g", 2L), ("g", 3L))
    val out = ad(rows, rows).head()
    assert(out.getDouble(3) == 0.0 && !out.getBoolean(4))
  }

  test("tail weighting: moving ONE extreme point scores higher on " +
      "AD than moving one central point by the same amount") {
    val base = (1L to 20L).map(i => ("g", i * 10L))
    // central move: 100 -> 105; tail move: 200 -> 205
    val curCentral = base.map { case (g, v) =>
      (g, if (v == 100L) 105L else v) }
    val curTail = base.map { case (g, v) =>
      (g, if (v == 200L) 205L else v) }
    val a2Central = ad(base, curCentral).head().getDouble(3)
    val a2Tail = ad(base, curTail).head().getDouble(3)
    assert(a2Tail > a2Central,
      s"tail $a2Tail should exceed central $a2Central")
  }

  test("single shared distinct value: the B = N block zeroes, the " +
      "group still emits a row with A2 = 0") {
    val out = ad(Seq(("g", 7L), ("g", 7L)), Seq(("g", 7L))).head()
    assert(out.getDouble(3) == 0.0 && !out.getBoolean(4))
  }

  test("one-sided group: null A2, drifted = true (the ksTest " +
      "contract)") {
    val out = ad(Seq(("g", 1L), ("g", 2L)), Seq.empty).head()
    assert(out.isNullAt(3) && out.getBoolean(4))
  }

  test("q315 on the real corpus: the URGENT tail plant fires at the " +
      "3.88 bar; every other priority is quiet (including 5-LOW's " +
      "natural 2.87 tail wobble)") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .adDriftQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("1-URGENT").getInt(4) == 1)
      byG.filterKeys(_ != "1-URGENT").values.foreach { r =>
        assert(r.getInt(4) == 0, s"${r.getString(0)} false alarm")
      }
    }
  }
}
