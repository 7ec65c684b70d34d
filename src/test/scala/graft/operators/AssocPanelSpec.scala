package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.categoricalAssociation]] — hand-computed measures on
  * a perfectly-dependent table and an independent one, the Theil's U
  * asymmetry on a many-to-one mapping, zero-cell χ² participation,
  * and the q310 plant on the real corpus.
  */
class AssocPanelSpec extends SparkSpec {

  private def longDf(rows: (String, String, String)*) = df(
    StructType(Seq(
      StructField("pair", StringType),
      StructField("x", StringType),
      StructField("y", StringType))),
    rows.map { case (p, x, y) => Row(p, x, y) })

  private def assoc(rows: (String, String, String)*) =
    Analytics.categoricalAssociation(longDf(rows: _*), "pair", "x", "y")

  test("perfect dependence (identity mapping): V = 1, both U = 1, " +
      "MI = H = ln 2 for a balanced binary pair") {
    val rows = Seq.fill(10)(("p", "a", "1")) ++
      Seq.fill(10)(("p", "b", "2"))
    val out = assoc(rows: _*).head()
    assert(out.getDouble(5) == 1.0) // cramers_v
    assert(out.getDouble(7) == 1.0 && out.getDouble(8) == 1.0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // nano-floor can shave the last decimal; accept 1 ulp at 1e-6
    assert(math.abs(out.getDouble(6) - ln2) <= 1e-6)
  }

  test("independence: a balanced product table scores chi2 = 0, " +
      "V = 0, MI = 0") {
    val rows = for {
      x <- Seq("a", "b"); y <- Seq("1", "2"); _ <- 1 to 5
    } yield ("p", x, y)
    val out = assoc(rows: _*).head()
    assert(out.getDouble(4) == 0.0 && out.getDouble(5) == 0.0)
    assert(math.abs(out.getDouble(6)) <= 1e-6)
  }

  test("many-to-one asymmetry: x determines y but not conversely -> " +
      "U(y|x) = 1, U(x|y) < 1") {
    // x in {a,b,c}; y = (x == 'a' ? 'g1' : 'g2')
    val rows = Seq.fill(6)(("p", "a", "g1")) ++
      Seq.fill(6)(("p", "b", "g2")) ++ Seq.fill(6)(("p", "c", "g2"))
    val out = assoc(rows: _*).head()
    assert(out.getDouble(7) == 1.0)
    assert(out.getDouble(8) < 1.0 && out.getDouble(8) > 0.0)
  }

  test("zero observed cells still contribute their expected count " +
      "to chi2 (the diagonal-only table)") {
    // 2x2 with mass only on the diagonal: chi2 = N exactly
    val rows = Seq.fill(8)(("p", "a", "1")) ++
      Seq.fill(8)(("p", "b", "2"))
    val out = assoc(rows: _*).head()
    assert(out.getDouble(4) == 16.0)
  }

  test("q310 on the real corpus: the planted bucket pair dominates " +
      "the natural dow pair on every normalized measure") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .assocPanelQ(spark, "/root/testdata/sf0.001").collect()
      val byP = rows.map(r => r.getString(0) -> r).toMap
      val planted = byP("type_x_bucket")
      val natural = byP("type_x_dow")
      assert(planted.getDouble(5) > natural.getDouble(5) * 2.0)
      assert(planted.getDouble(7) > natural.getDouble(7) * 3.0)
      // the asymmetry direction: type (5 levels) -> bucket (3) keeps
      // more of the bucket's entropy than the reverse
      assert(planted.getDouble(7) > planted.getDouble(8))
    }
  }
}
