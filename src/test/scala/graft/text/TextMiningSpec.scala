package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.dunningCollocations]], [[TextAnalysis.readabilityScores]]
  * and [[TextAnalysis.rakeKeywords]] — hand-computed G² tables, the
  * Flesch formulas replayed in scala.math, and the classic RAKE
  * degree/frequency ranking.
  */
class TextMiningSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
    rows.map { case (i, t) => Row(i, t) })

  test("dunning: a pair occurring every time it can scores above " +
      "a pair that also occurs apart") {
    val d = docs(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"),
      (3L, "alpha beta eta theta"), (4L, "alpha beta iota kappa"),
      (5L, "alpha beta lambda mu"),
      (6L, "gamma delta alpha nu gamma xi"),
      (7L, "gamma omicron delta pi"))
    val out = TextAnalysis.dunningCollocations(d, "text",
      minPairCount = 2, topK = 10).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(5)).toMap
    assert(byPair(("alpha", "beta")) > byPair(("gamma", "delta")))
  }

  test("dunning: hand-computed 2x2 table on a tiny corpus") {
    // bigrams: (a b) x3, (b a) x3, (a c) x1 -> N=7
    val d = docs((1L, "a b a b a c"), (2L, "a b a"))
    val out = TextAnalysis.dunningCollocations(d, "text",
      minPairCount = 3, topK = 5).collect()
    assert(out.length == 2) // (a b) and (b a) both pass the floor
    val r = out.filter(x =>
      x.getString(0) == "a" && x.getString(1) == "b").head
    assert(r.getLong(2) == 3L) // n_pair
    assert(r.getLong(3) == 4L) // a as first: (a b)x3 + (a c)
    assert(r.getLong(4) == 3L) // b as second
    // table a=3 b=1 c=0 d=3, N=7
    def t(o: Double, row: Double, c: Double): Double =
      if (o > 0) o * math.log(o * 7.0 / (row * c)) else 0.0
    val g2 = 2.0 * (t(3, 4, 3) + t(1, 4, 4) + t(0, 3, 3) + t(3, 3, 4))
    assert(math.abs(r.getDouble(5) - g2) < 1e-4)
  }

  test("readability: formulas replayed in scala.math") {
    val d = df(
      StructType(Seq(
        StructField("g", StringType),
        StructField("text", StringType))),
      Seq(Row("en", "the cat sat on the mat. it was flat!"),
        Row("en", "a dog ran")))
    val out = TextAnalysis.readabilityScores(d, "g", "text")
      .collect().head
    val w = out.getLong(2).toDouble
    val s = out.getLong(3).toDouble
    val y = out.getLong(4).toDouble
    assert(w == 12.0 && s == 3.0) // 2 sentence runs + min-1 doc
    val flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    assert(math.abs(out.getDouble(5) - flesch) < 1e-3)
    val fk = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
    assert(math.abs(out.getDouble(6) - fk) < 1e-3)
  }

  test("readability: punctuation-free corpus reads one sentence " +
      "per document") {
    val d = df(
      StructType(Seq(
        StructField("g", StringType),
        StructField("text", StringType))),
      Seq(Row("x", "plain words only here"), Row("x", "more words")))
    val out = TextAnalysis.readabilityScores(d, "g", "text")
      .collect().head
    assert(out.getLong(3) == 2L)
  }

  test("rake: multiword phrase outscores its member words alone") {
    val d = docs(
      (1L, "deep learning of the deep learning stack"),
      (2L, "deep learning is a stack"),
      (3L, "the stack and the learning"))
    val out = TextAnalysis.rakeKeywords(d, "doc_id", "text", topK = 10)
      .collect()
    val scores = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    // "deep learning" carries both words' degree scores
    assert(scores("deep learning stack") > scores("deep learning"))
    assert(scores("deep learning") > scores("stack"))
    // phrase boundaries: stopwords never appear inside a phrase
    assert(out.forall(r => !r.getString(0).split(" ")
      .exists(TextAnalysis.stopwords.contains)))
  }

  test("rake: hand-computed degree/freq scores") {
    // doc: "x y of x" -> phrases: "x y" (1), "x" (1)
    // freq: x=2 y=1; deg: x=2+1=3, y=2
    // scores(micro): x=1500000, y=2000000
    // "x y" = 3500000, "x" = 1500000
    val out = TextAnalysis.rakeKeywords(docs((1L, "x y of x")),
      "doc_id", "text", topK = 10).collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(m("x y") == (1L, 3500000L))
    assert(m("x") == (1L, 1500000L))
  }
}
