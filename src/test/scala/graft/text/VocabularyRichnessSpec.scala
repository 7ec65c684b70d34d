package graft.text

import graft.SparkSpec

/** [[TextAnalysis.vocabularyRichness]] — hand-computed Chao1 and
  * coverage, the f2 = 0 bias-corrected form, saturation reading, and
  * group independence.
  */
class VocabularyRichnessSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: (String, String)*) =
    TextAnalysis.vocabularyRichness(
        rows.toSeq.toDF("lang", "text"), "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap

  test("hand-computed: t=3 types, f1=2, f2=1 gives chao1 = t + " +
      "f1(f1-1)/(2(f2+1)) = 3.5") {
    // counts: a=2, b=1, c=1  → t=3, f1=2, f2=1, n=4
    val out = run(("en", "a a b c"))("en")
    assert(out.getAs[Long]("n_tokens") === 4L)
    assert(out.getAs[Long]("n_types") === 3L)
    assert(out.getAs[Long]("f1") === 2L)
    assert(out.getAs[Long]("f2") === 1L)
    assert(out.getAs[Double]("chao1") === 3.5)
    assert(out.getAs[Double]("coverage") === 0.5) // 1 - 2/4
  }

  test("f2 = 0 stays finite via the bias-corrected form") {
    // every type a singleton: t=3, f1=3, f2=0 → chao1 = 3 + 6/2 = 6
    val out = run(("en", "x y z"))("en")
    assert(out.getAs[Double]("chao1") === 6.0)
    assert(out.getAs[Double]("coverage") === 0.0)
  }

  test("a saturated sample reads chao1 = t and coverage = 1") {
    // no singletons at all
    val out = run(("en", "a a b b b a"))("en")
    assert(out.getAs[Long]("f1") === 0L)
    assert(out.getAs[Double]("chao1") ===
      out.getAs[Long]("n_types").toDouble)
    assert(out.getAs[Double]("coverage") === 1.0)
  }

  test("groups count independently; tokenization lowercases") {
    val out = run(("en", "Dog dog"), ("fr", "chat"))
    assert(out("en").getAs[Long]("n_types") === 1L)
    assert(out("en").getAs[Long]("f2") === 1L)
    assert(out("fr").getAs[Long]("f1") === 1L)
  }
}
