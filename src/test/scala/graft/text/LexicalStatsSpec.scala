package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.pmiCollocations]], [[TextAnalysis.lexicalDiversity]]
  * and [[TextAnalysis.langUnigramDivergence]] — closed-form small
  * corpora, the µ-quantization bias bound, and the count-floor /
  * degenerate contracts.
  */
class LexicalStatsSpec extends SparkSpec {

  import spark.implicits._

  test("pmi: a perfectly-bound pair outranks a frequent-word pair") {
    // "zig zag" always adjacent and only adjacent; "the cat"/"the dog"
    // dilute each other through the shared "the"
    val docs = Seq.fill(6)("zig zag the cat the dog").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
      minPairCount = 2, topK = 10).collect()
    assert(out.head.getString(0) === "zig")
    assert(out.head.getString(1) === "zag")
    // closed form: n_uni = 36, n_bi = 30, n_zig_zag = 6,
    // n_zig = n_zag = 6 → pmi = ln(6·36² / (30·36)) = ln(36/5)
    val want = math.log(6.0 * 36 * 36 / (30.0 * 6 * 6))
    assert(math.abs(out.head.getAs[Double]("pmi") - want) < 1e-6)
  }

  test("pmi: the count floor drops hapax pairs entirely") {
    val docs = Seq((1L, "aa bb aa bb aa bb"), (2L, "cc dd"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
      minPairCount = 2, topK = 10).collect()
    assert(out.forall(r => r.getString(0) != "cc"))
    assert(out.map(_.getLong(2)).forall(_ >= 2))
  }

  test("lexicalDiversity: closed forms for uniform and constant docs") {
    val docs = Seq(
      (1L, "a b c d"),       // all distinct: H = ln 4, norm 1
      (2L, "x x x x"),       // constant: H = 0, norm 0
      (3L, "w"))             // single token: norm null
      .toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") === 4L)
    assert(d1.getAs[Long]("n_types") === 4L)
    assert(d1.getAs[Double]("ttr") === 1.0)
    assert(d1.getAs[Double]("hapax_frac") === 1.0)
    assert(math.abs(d1.getAs[Double]("entropy") - math.log(4)) < 1e-5)
    assert(d1.getAs[Double]("norm_entropy") === 1.0)
    val d2 = out(2L)
    // c·ln c = 4 ln 4 floors once; H = ln 4 − (⌊4·ln4·1e6⌋/1e6)/4 ≈ 0
    assert(math.abs(d2.getAs[Double]("entropy")) < 1e-5)
    assert(d2.getAs[Double]("hapax_frac") === 0.0)
    val d3 = out(3L)
    assert(d3.getAs[Double]("entropy") === 0.0)
    assert(d3.isNullAt(d3.fieldIndex("norm_entropy")))
  }

  test("lexicalDiversity: quantization bias is bounded by one " +
      "µ-unit per distinct word") {
    val words = Seq("a", "a", "a", "b", "b", "c", "d", "d", "d", "d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect()(0)
    val n = words.size.toDouble
    val exact = math.log(n) - words.groupBy(identity).values
      .map(g => g.size * math.log(g.size)).sum / n
    val got = out.getAs[Double]("entropy")
    // floor-quantization UNDERcounts Σ c·ln c, so H overshoots by at
    // most (types × 1µ)/n; ±5e-7 more for the 6-decimal rounding
    assert(got >= exact - 1e-6)
    assert(got <= exact + 4e-6 / n + 1e-6)
  }

  test("langUnigramDivergence: identical slices diverge by zero and " +
      "a skewed slice is positive") {
    val same = Seq(("en", "a b c"), ("fr", "a b c"))
      .toDF("lang", "text")
    val out = TextAnalysis.langUnigramDivergence(same, "lang", "text")
      .collect()
    // each lang's distribution equals the corpus's: every ln term is
    // 0 → kl_nano exactly 0
    assert(out.forall(_.getAs[Long]("kl_nano") === 0L))

    val skew = Seq(("en", "a a a a b"), ("fr", "b b b b a"))
      .toDF("lang", "text")
    val out2 = TextAnalysis.langUnigramDivergence(skew, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    // symmetric construction → equal positive divergences
    assert(out2("en").getAs[Long]("kl_nano") ===
      out2("fr").getAs[Long]("kl_nano"))
    assert(out2("en").getAs[Double]("kl") > 0.15)
    // closed form: 0.8·ln(1.6) + 0.2·ln(0.4), nano-floored per term
    val want = 0.8 * math.log(1.6) + 0.2 * math.log(0.4)
    assert(math.abs(out2("en").getAs[Double]("kl") - want) < 1e-5)
  }

  test("langUnigramDivergence: token and type counts are per-slice") {
    val df = Seq(("en", "a a b"), ("fr", "c")).toDF("lang", "text")
    val out = TextAnalysis.langUnigramDivergence(df, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("n_tokens") === 3L)
    assert(out("en").getAs[Long]("n_types") === 2L)
    assert(out("fr").getAs[Long]("n_tokens") === 1L)
    // fr = {c} only, corpus share of c is 1/4 → kl = ln 4 > 1
    assert(out("fr").getAs[Double]("kl") > 1.0)
  }
}
