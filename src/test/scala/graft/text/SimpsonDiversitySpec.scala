package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.simpsonDiversity]] — closed forms on hand counts,
  * the degenerate guards, and the q289 corpus invariants.
  */
class SimpsonDiversitySpec extends SparkSpec {

  private def docsDf(rows: (String, String)*) = df(
    StructType(Seq(
      StructField("lang", StringType),
      StructField("text", StringType))),
    rows.map { case (l, t) => Row(l, t) })

  test("closed form: 'a a a b' gives simpson = 6/12 = 0.5, " +
      "inv = 2, berger = 3/4") {
    val out = TextAnalysis.simpsonDiversity(
      docsDf(("g", "a a a b")), "lang", "text").head()
    assert(out.getLong(1) == 4L && out.getLong(2) == 2L)
    assert(out.getDouble(3) == 0.5)
    assert(out.getDouble(4) == 2.0)
    assert(out.getDouble(5) == 0.75)
  }

  test("uniform k types: inv_simpson equals... (k tokens all " +
      "distinct -> lambda = 0, inv null, simpson 0)") {
    val out = TextAnalysis.simpsonDiversity(
      docsDf(("g", "a b c d")), "lang", "text").head()
    assert(out.getDouble(3) == 0.0 && out.isNullAt(4))
    assert(out.getDouble(5) == 0.25)
  }

  test("single token: simpson and inv_simpson null, berger 1") {
    val out = TextAnalysis.simpsonDiversity(
      docsDf(("g", "solo")), "lang", "text").head()
    assert(out.isNullAt(3) && out.isNullAt(4))
    assert(out.getDouble(5) == 1.0)
  }

  test("q289 on the real corpus: 31-type template vocabulary, " +
      "effective size below the type count, per language") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .simpsonDiversityQ(spark, "/root/testdata/sf0.001").collect()
      assert(rows.length == 5)
      rows.foreach { r =>
        assert(r.getLong(2) == 31L)
        assert(r.getDouble(4) > 1.0 && r.getDouble(4) <= 31.0)
        assert(r.getDouble(5) >= 1.0 / 31.0)
      }
    }
  }
}
