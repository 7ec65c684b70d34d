package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.friedmanTest]] — hand-ranked blocks, tie averaging in
  * doubled-rank units, the incomplete-block drop, the whole-block
  * shift invariance that distinguishes it from Kruskal–Wallis, and
  * the q306 dual plant on the real corpus.
  */
class FriedmanSpec extends SparkSpec {

  private def cells(rows: (String, Long, String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("b", LongType),
      StructField("cat", StringType),
      StructField("y", LongType))),
    rows.map { case (g, b, c, y) => Row(g, b, c, y) })

  private def ft(rows: (String, Long, String, Long)*) =
    Analytics.friedmanTest(cells(rows: _*), Seq("g"), col("b"),
      col("cat"), col("y"))

  test("hand-computed: 3 blocks where A<B<C every time -> the " +
      "maximal statistic Q = 2b(k-1)/... = 6 for b=3,k=3") {
    val rows = for {
      b <- 1L to 3L
      (c, y) <- Seq(("A", 1L + b), ("B", 10L + b), ("C", 20L + b))
    } yield ("g", b, c, y)
    val out = ft(rows: _*).head()
    assert(out.getLong(1) == 3L && out.getLong(2) == 3L)
    // perfect ordering: R_A=3, R_B=6, R_C=9; Q = 12/(bk(k+1))ΣR² -
    // 3b(k+1) = 12/36*126 - 36 = 6 (no ties -> correction is 1)
    assert(out.getDouble(4) == 6.0)
  }

  test("tie averaging: a block where two treatments tie shares the " +
      "doubled rank and Q stays finite") {
    val out = ft(
      ("g", 1L, "A", 1L), ("g", 1L, "B", 1L), ("g", 1L, "C", 5L),
      ("g", 2L, "A", 1L), ("g", 2L, "B", 2L), ("g", 2L, "C", 5L),
      ("g", 3L, "A", 2L), ("g", 3L, "B", 1L), ("g", 3L, "C", 5L))
      .head()
    // C is always top; A and B split the bottom (one tie block)
    assert(out.getLong(1) == 3L)
    assert(!out.isNullAt(4) && out.getDouble(4) > 0.0)
  }

  test("incomplete blocks drop: a block missing one treatment does " +
      "not enter n_blocks") {
    val out = ft(
      ("g", 1L, "A", 1L), ("g", 1L, "B", 2L),
      ("g", 2L, "A", 1L), ("g", 2L, "B", 2L), ("g", 2L, "C", 3L),
      ("g", 3L, "A", 1L), ("g", 3L, "B", 2L), ("g", 3L, "C", 3L))
      .head()
    // k=3 overall, so block 1 (only A,B) is incomplete and drops
    assert(out.getLong(1) == 2L)
  }

  test("whole-block shifts are invisible: scaling one block's every " +
      "cell leaves Q unchanged (the anti-KW property)") {
    val base = Seq(
      ("g", 1L, "A", 1L), ("g", 1L, "B", 5L), ("g", 1L, "C", 3L),
      ("g", 2L, "A", 2L), ("g", 2L, "B", 6L), ("g", 2L, "C", 4L),
      ("g", 3L, "A", 3L), ("g", 3L, "B", 5L), ("g", 3L, "C", 4L))
    val shocked = base.map { case (g, b, c, y) =>
      if (b == 2L) (g, b, c, y * 1000L) else (g, b, c, y) }
    val q1 = ft(base: _*).head().getDouble(4)
    val q2 = ft(shocked: _*).head().getDouble(4)
    assert(q1 == q2)
  }

  test("q306 on the real corpus: seg0's purchase boost fires; " +
      "seg1/seg2 stay quiet despite the x3 whole-day shock") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .friedmanQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("seg0").getInt(5) == 1)
      assert(byG("seg1").getInt(5) == 0, "seg1 false alarm")
      assert(byG("seg2").getInt(5) == 0, "seg2 false alarm")
    }
  }
}
