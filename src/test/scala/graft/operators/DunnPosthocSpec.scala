package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.dunnPosthoc]] — the k=2 closed form, the pooled-rank
  * (not re-ranked) contract, the m-keyed Bonferroni guard, and the
  * q300 dose-ladder drill-down on the real corpus.
  */
class DunnPosthocSpec extends SparkSpec {

  private def samplesDf(rows: (String, String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("cat", StringType),
      StructField("v", LongType))),
    rows.map { case (g, c, v) => Row(g, c, v) })

  private def dunn(rows: (String, String, Long)*) =
    Analytics.dunnPosthoc(samplesDf(rows: _*), Seq("g"),
      org.apache.spark.sql.functions.col("cat"),
      org.apache.spark.sql.functions.col("v"))

  test("k=2 closed form, no ties: A={1,2} B={3,4} gives mean ranks " +
      "1.5 vs 3.5 and z = -2/sqrt(20/12)") {
    val out = dunn(("g", "A", 1L), ("g", "A", 2L),
      ("g", "B", 3L), ("g", "B", 4L)).head()
    assert(out.getString(1) == "A" && out.getString(2) == "B")
    val want = -2.0 / math.sqrt(4.0 * 5.0 / 12.0 * (0.5 + 0.5))
    assert(out.getDouble(5) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // m=1 -> plain 1.96 threshold; |z| = 1.549 is NOT significant
    assert(out.getInt(6) == 0)
  }

  test("ranks are POOLED across all categories, not re-ranked per " +
      "pair: adding category C changes the A-B mean ranks") {
    val ab = dunn(("g", "A", 1L), ("g", "A", 2L),
      ("g", "B", 3L), ("g", "B", 4L)).head().getDouble(5)
    val abc = dunn(("g", "A", 1L), ("g", "A", 2L),
      ("g", "B", 3L), ("g", "B", 4L),
      ("g", "C", 10L), ("g", "C", 11L))
      .collect().find(r => r.getString(1) == "A" &&
        r.getString(2) == "B").get.getDouble(5)
    assert(ab != abc)
  }

  test("k=3 emits exactly the 3 ordered pairs with the m=3 " +
      "Bonferroni threshold") {
    val rows = (1 to 8).flatMap(i => Seq(
      ("g", "A", i.toLong), ("g", "B", i.toLong + 20L),
      ("g", "C", i.toLong + 40L)))
    val out = dunn(rows: _*).collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getString(1), r.getString(2))).toSet ==
      Set(("A", "B"), ("A", "C"), ("B", "C")))
    // A vs C spans the whole pooled range: decisively significant
    val ac = out.find(r => r.getString(1) == "A" &&
      r.getString(2) == "C").get
    assert(math.abs(ac.getDouble(5)) > 2.394 && ac.getInt(6) == 1)
  }

  test("q300 on the real corpus: within MACHINERY the extreme dose " +
      "pairs are significant, adjacent ones are not, and clean " +
      "segments have no significant pairs at all") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .dunnPosthocQ(spark, "/root/testdata/sf0.01").collect()
      val mach = rows.filter(_.getString(0) == "MACHINERY")
        .map(r => (r.getString(1), r.getString(2)) -> r.getInt(6))
        .toMap
      assert(mach(("1-URGENT", "5-LOW")) == 1)
      assert(mach(("1-URGENT", "4-NOT SPECIFIED")) == 1)
      assert(mach(("4-NOT SPECIFIED", "5-LOW")) == 0)
      assert(mach(("1-URGENT", "2-HIGH")) == 0)
      assert(rows.filter(_.getString(0) != "MACHINERY")
        .forall(_.getInt(6) == 0), "clean-segment false positive")
    }
  }
}
