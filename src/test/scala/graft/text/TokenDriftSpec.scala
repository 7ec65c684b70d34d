package graft.text

import graft.SparkSpec

/** [[TextAnalysis.tokenDriftLeaderboard]] — hand-computed χ², planted
  * drift ranking, one-sided tokens, and the k cap.
  */
class TokenDriftSpec extends SparkSpec {

  import spark.implicits._

  private def run(base: Seq[String], cur: Seq[String], k: Int = 20) =
    TextAnalysis.tokenDriftLeaderboard(
      base.toDF("text"), cur.toDF("text"), "text", k)
      .collect()

  test("hand-computed chi2 for a 2x2 with known margins") {
    // base: a a b   cur: a b b b  → token a: (2,1), others (1,3)
    val out = run(Seq("a a b"), Seq("a b b b"))
      .map(r => r.getString(0) -> r).toMap
    val a = 2.0; val bb = 1.0; val c = 1.0; val d = 3.0
    val n = a + bb + c + d
    val want = n * math.pow(a * d - bb * c, 2) /
      ((a + bb) * (c + d) * (a + c) * (bb + d))
    assert(math.abs(out("a").getAs[Double]("chi2") -
      math.floor(want * 10000) / 10000) < 1.1e-4)
    assert(out("a").getAs[Long]("cnt_base") === 2L)
    assert(out("a").getAs[Long]("cnt_cur") === 1L)
  }

  test("a token present on ONE side only tops the board when its " +
      "mass dominates") {
    val base = Seq.fill(30)("common words here")
    val cur = Seq.fill(30)("common words here planted")
    val out = run(base, cur)
    assert(out.head.getString(0) === "planted")
    assert(out.head.getAs[Long]("cnt_base") === 0L)
    assert(out.head.getAs[Long]("cnt_cur") === 30L)
    // balanced tokens score (near) zero
    val common = out.find(_.getString(0) == "common").get
    assert(common.getAs[Double]("chi2") < out.head.getAs[Double]("chi2") / 10)
  }

  test("the k cap limits output; order is chi2 desc then token asc") {
    val out = run(Seq("x y z w v u t s"), Seq("x y z w v u t s q"), k = 3)
    assert(out.length === 3)
    val chis = out.map(_.getAs[Double]("chi2"))
    assert(chis.sameElements(chis.sortBy(-_)))
  }
}
