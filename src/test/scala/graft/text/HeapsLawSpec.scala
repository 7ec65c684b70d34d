package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.heapsLawFit]] — exact curve counts on a hand-built
  * growing corpus, the pure-power-law recovery, checkpoint boundary
  * arithmetic, and the saturated real corpus (q288).
  */
class HeapsLawSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
    rows.map { case (id, t) => Row(id, t) })

  test("hand-built growth: doc i brings i tokens of which one is " +
      "new — curve counts are exact at every checkpoint") {
    // doc 1: "w1"; doc 2: "w1 w2"; doc 3: "w1 w2 w3"; doc 4: all 4
    val d = docsDf(
      (1L, "w1"), (2L, "w1 w2"), (3L, "w1 w2 w3"),
      (4L, "w1 w2 w3 w4"))
    val out = TextAnalysis.heapsLawFit(d, "doc_id", "text",
      checkpoints = 4).orderBy("checkpoint").collect()
    assert(out.length == 4)
    // boundaries: 0 + (4*k)/4 = k
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 3L, 6L, 10L))
    assert(out.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L, 4L))
    // growing vocab -> positive beta, shared by every row
    assert(out.forall(_.getDouble(5) > 0.4))
    assert(out.map(_.getDouble(5)).distinct.length == 1)
  }

  test("pure power law V = n is recovered with beta = 1 and K = 1") {
    // each doc is one token, always new: V(n) = n exactly
    val d = docsDf((1L to 16L).map(i => (i, s"word$i")): _*)
    val out = TextAnalysis.heapsLawFit(d, "doc_id", "text",
      checkpoints = 8).head()
    assert(out.getDouble(5) == 1.0)
    assert(out.getDouble(6) == 1.0)
  }

  test("a single checkpoint cannot fit: beta and k_coef null") {
    val d = docsDf((1L, "a b"), (2L, "a c"))
    val out = TextAnalysis.heapsLawFit(d, "doc_id", "text",
      checkpoints = 1).head()
    assert(out.isNullAt(5) && out.isNullAt(6))
  }

  test("q288 on the real corpus: the template vocabulary saturates " +
      "immediately — flat V, beta 0, and the curve says so") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .heapsLawQ(spark, "/root/testdata/sf0.001")
        .orderBy("checkpoint").collect()
      assert(rows.length == 12)
      val toks = rows.map(_.getLong(3))
      assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
      assert(rows.map(_.getLong(4)).distinct.length == 1,
        "vocab should be saturated on the template corpus")
      assert(rows.head.getDouble(5) == 0.0)
    }
  }
}
