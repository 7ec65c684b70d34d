package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Drift.cliffsDelta]] — the dominance extremes, exact tie
  * half-credit, outlier robustness vs Cohen's d, and the q317 plant
  * on the real corpus.
  */
class CliffsDeltaSpec extends SparkSpec {

  private def side(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  private def cd(base: Seq[(String, Long)], cur: Seq[(String, Long)]) =
    Drift.cliffsDelta(side(base: _*), side(cur: _*), "x", Seq("g"))

  test("complete dominance: every cur above every base -> delta = 1, " +
      "large; reversed -> -1") {
    val up = cd(Seq(("g", 1L), ("g", 2L)), Seq(("g", 10L), ("g", 20L)))
      .head()
    assert(up.getDouble(3) == 1.0 && up.getString(4) == "large")
    val dn = cd(Seq(("g", 10L), ("g", 20L)), Seq(("g", 1L), ("g", 2L)))
      .head()
    assert(dn.getDouble(3) == -1.0)
  }

  test("identical samples: delta = 0 via exact tie half-credit") {
    val rows = Seq(("g", 5L), ("g", 7L), ("g", 7L))
    val out = cd(rows, rows).head()
    assert(out.getDouble(3) == 0.0 && out.getString(4) == "negligible")
  }

  test("hand-computed mixed: base {1,5}, cur {3,7} -> wins 3 of 4 " +
      "pairs, loses 1 -> delta = 0.5") {
    val out = cd(Seq(("g", 1L), ("g", 5L)), Seq(("g", 3L), ("g", 7L)))
      .head()
    assert(out.getDouble(3) == 0.5)
  }

  test("outlier robustness: one huge baseline outlier crushes " +
      "Cohen's d but leaves delta untouched") {
    val base = (1L to 20L).map(i => ("g", i))
    val cur = (1L to 20L).map(i => ("g", i + 10L))
    val baseOut = base :+ ("g", 1000000L)
    val d1 = cd(base, cur).head().getDouble(3)
    val d2 = cd(baseOut, cur).head().getDouble(3)
    // the outlier flips at most its own 20 pair comparisons
    assert(math.abs(d1 - d2) < 0.12)
    val cohen1 = Drift.cohensD(side(base: _*), side(cur: _*),
      org.apache.spark.sql.functions.col("x"), Seq("g"))
      .head().getDouble(5)
    val cohen2 = Drift.cohensD(side(baseOut: _*), side(cur: _*),
      org.apache.spark.sql.functions.col("x"), Seq("g"))
      .head().getDouble(5)
    assert(math.abs(cohen2) < math.abs(cohen1) / 5.0,
      s"d should collapse: $cohen1 -> $cohen2")
  }

  test("q317 on the real corpus: the x2 URGENT plant reads large " +
      "(delta ~ 0.5); every clean priority reads negligible") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .cliffsDeltaQ(spark, "/root/testdata/sf0.001").collect()
      val byG = rows.map(r => r.getString(0) -> r).toMap
      assert(byG("1-URGENT").getString(4) == "large")
      assert(byG("1-URGENT").getDouble(3) > 0.45)
      byG.filterKeys(_ != "1-URGENT").values.foreach { r =>
        assert(r.getString(4) == "negligible",
          s"${r.getString(0)} reads ${r.getString(4)}")
      }
    }
  }
}
