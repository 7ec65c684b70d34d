package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.fleissKappa]] — hand-computed κ on perfect agreement,
  * maximal disagreement, the all-one-category guard, and the q311
  * three-detector frame on the real corpus (κ must agree with the
  * oracle's reading that the detectors disagree beyond chance on the
  * flagged union).
  */
class FleissKappaSpec extends SparkSpec {

  private def flags(rows: (Boolean, Boolean, Boolean)*) = df(
    StructType(Seq(
      StructField("a", BooleanType),
      StructField("b", BooleanType),
      StructField("c", BooleanType))),
    rows.map { case (x, y, z) => Row(x, y, z) })

  private def fk(rows: (Boolean, Boolean, Boolean)*) =
    Analytics.fleissKappa(flags(rows: _*), Seq.empty,
      Seq("a", "b", "c"))

  test("perfect agreement on a MIXED frame: kappa = 1") {
    val out = fk((true, true, true), (false, false, false),
      (true, true, true), (false, false, false)).head()
    assert(out.getDouble(5) == 1.0 && out.getInt(6) == 1)
  }

  test("all-one-category input guards kappa to null (P_e = 1)") {
    val out = fk((true, true, true), (true, true, true)).head()
    assert(out.isNullAt(5) && out.getInt(6) == 0)
  }

  test("hand-computed split verdicts: every subject 2-vs-1 -> " +
      "P_bar = 1/3; kappa = (P_bar - P_e)/(1 - P_e) exactly") {
    // 4 subjects, each with s = 2 (two flag, one doesn't)
    val out = fk((true, true, false), (true, false, true),
      (false, true, true), (true, true, false)).head()
    // s = 2: P_i = (4 + 1 - 3)/6 = 1/3; p1 = 8/12 = 2/3
    val pbar = 1.0 / 3.0
    val pe = 4.0 / 9.0 + 1.0 / 9.0
    val want = (pbar - pe) / (1.0 - pe)
    assert(out.getDouble(5) ==
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(out.getLong(0) == 4L && out.getInt(1) == 3)
  }

  test("q311 on the real corpus: the flagged-union frame yields a " +
      "below-chance kappa (the detectors tile the union more than " +
      "they overlap) and the computation stays null-safe") {
    graft.core.CacheScope.withScope {
      val out = graft.registry.DedupRegistry
        .fleissKappaDetectorsQ(spark, "/root/testdata/sf0.001").head()
      assert(out.getLong(0) > 0L)
      assert(!out.isNullAt(5))
      assert(out.getDouble(5) < 0.61)
      assert(out.getInt(6) == 0)
    }
  }
}
