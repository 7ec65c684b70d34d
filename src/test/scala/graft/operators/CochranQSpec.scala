package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.cochranQ]] — hand-computed Q, the k=2 McNemar
  * reduction, the all-concordant guard, and the q303 detector-bench
  * reading on the real corpus.
  */
class CochranQSpec extends SparkSpec {

  private def flagsDf(rows: (Boolean, Boolean, Boolean)*) = df(
    StructType(Seq(
      StructField("a", BooleanType),
      StructField("b", BooleanType),
      StructField("c", BooleanType))),
    rows.map { case (x, y, z) => Row(x, y, z) })

  test("hand-computed Q on a 4-item 3-detector table") {
    // items: (1,1,0), (1,0,0), (1,1,1), (0,0,0)
    // G = (3,2,1), T = 6, sumG2 = 14, L = (2,1,3,0), sumL2 = 14
    // Q = 2*(3*14 - 36)/(3*6 - 14) = 2*6/4 = 3
    val out = Analytics.cochranQ(
      flagsDf((true, true, false), (true, false, false),
        (true, true, true), (false, false, false)),
      Seq.empty, Seq("a", "b", "c")).head()
    assert(out.getLong(0) == 4L)
    assert(out.getLong(1) == 3L && out.getLong(2) == 2L &&
      out.getLong(3) == 1L)
    assert(out.getDouble(4) == 3.0)
    assert(out.getInt(5) == 2)
    assert(out.getInt(6) == 0) // 3 < 5.991
  }

  test("k=2 reduces to McNemar's uncorrected chi2 on the same data") {
    // 9 a-only, 1 b-only, 3 both -> McNemar chi2 = 6.4
    val rows = Seq.fill(9)((true, false)) ++ Seq((false, true)) ++
      Seq.fill(3)((true, true))
    val out = Analytics.cochranQ(
      df(StructType(Seq(StructField("a", BooleanType),
        StructField("b", BooleanType))),
        rows.map { case (x, y) => Row(x, y) }),
      Seq.empty, Seq("a", "b")).head()
    assert(out.getDouble(3) == 6.4)
    assert(out.getInt(5) == 1)
  }

  test("all-concordant items: zero denominator is guarded, null Q") {
    val out = Analytics.cochranQ(
      flagsDf((true, true, true), (false, false, false)),
      Seq.empty, Seq("a", "b", "c")).head()
    assert(out.isNullAt(4) && out.getInt(6) == 0)
  }

  test("q303 on the real corpus: the loose 1-bit detector fires on " +
      "every banded candidate while the exact verifies don't — the " +
      "bench genuinely differs") {
    graft.core.CacheScope.withScope {
      val out = graft.registry.DedupRegistry
        .cochranQDetectorsQ(spark, "/root/testdata/sf0.001").head()
      assert(out.getInt(6) == 1)
      // the 1-bit column dominates both exact verifies
      assert(out.getLong(3) > out.getLong(1))
      assert(out.getLong(3) > out.getLong(2))
    }
  }
}
