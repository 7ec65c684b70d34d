package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.mcnemar]] — closed form on hand-built contingency
  * cells, the zero-discordant guard, grouping, and the q284 detector
  * reading's consistency with the q280 capture counts.
  */
class McNemarSpec extends SparkSpec {

  private def flagsDf(rows: (String, Boolean, Boolean)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("a", BooleanType),
      StructField("b", BooleanType))),
    rows.map { case (g, a, b) => Row(g, a, b) })

  test("closed form: b=9 a-only, c=1 b-only gives chi2 = 64/10, " +
      "chi2_cc = 49/10, differs") {
    val rows = Seq.fill(9)(("g", true, false)) ++
      Seq(("g", false, true)) ++ Seq.fill(3)(("g", true, true))
    val out = Analytics.mcnemar(flagsDf(rows: _*), Seq("g"), "a", "b")
      .head()
    assert(out.getLong(1) == 3L) // n_both
    assert(out.getLong(2) == 9L && out.getLong(3) == 1L)
    assert(out.getDouble(4) == 6.4)
    assert(out.getDouble(5) == 4.9)
    assert(out.getInt(6) == 1)
  }

  test("all-concordant group: chi2 null, differs 0 — no evidence " +
      "either way is NOT evidence of equality-violation") {
    val out = Analytics.mcnemar(
      flagsDf(("g", true, true), ("g", true, true),
        ("g", false, false)),
      Seq("g"), "a", "b").head()
    assert(out.isNullAt(4) && out.isNullAt(5) && out.getInt(6) == 0)
  }

  test("grouped: each group's cells are independent; the |b−c|=1 " +
      "group's corrected statistic is exactly zero") {
    val out = Analytics.mcnemar(
      flagsDf(("x", true, false), ("x", false, true),
        ("x", true, false),
        ("y", true, false), ("y", true, false)),
      Seq("g"), "a", "b").collect().map(r => r.getString(0) -> r).toMap
    // x: b=2, c=1 -> cc numerator (|1|-1)^2 = 0
    assert(out("x").getDouble(5) == 0.0 && out("x").getInt(6) == 0)
    // y: b=2, c=0 -> chi2 = 4/2 = 2, below 3.841
    assert(out("y").getDouble(4) == 2.0 && out("y").getInt(6) == 0)
  }

  test("q284 on the real corpus: cells are consistent with the q280 " +
      "capture counts (n_both = overlap, margins match)") {
    graft.core.CacheScope.withScope {
      val dir = "/root/testdata/sf0.001"
      val mc = graft.registry.DedupRegistry
        .mcnemarDetectorsQ(spark, dir).head()
      val cr = graft.registry.DedupRegistry
        .dedupCaptureRecaptureQ(spark, dir).head()
      val (nBoth, mhOnly, spOnly) =
        (mc.getLong(0), mc.getLong(1), mc.getLong(2))
      assert(nBoth == cr.getAs[Long]("n_overlap"))
      assert(nBoth + mhOnly == cr.getAs[Long]("n_minhash"))
      assert(nBoth + spOnly == cr.getAs[Long]("n_simhash"))
    }
  }
}
