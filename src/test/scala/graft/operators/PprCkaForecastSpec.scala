package graft.operators

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** [[Analytics.personalizedPageRank]], [[Similarity.linearCka]],
  * [[Analytics.forecastBaselines]] — seed-locality, the CKA
  * orthogonal-invariance / truncation contracts, and hand-computed
  * MASE arithmetic.
  */
class PprCkaForecastSpec extends SparkSpec {

  import spark.implicits._

  test("personalizedPageRank: mass concentrates near the seed, " +
      "and a far component gets only pass-through") {
    // two chains: a->b->c and x->y->z, all bidirectional; seed = a
    val und = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val seeds = Seq("a").toDF("node")
    val ranks = Analytics.personalizedPageRank(edges, "s", "d",
      seeds, iters = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("a") > ranks("b") && ranks("b") > ranks("c"),
      ranks.toString)
    // the x-y-z component is unreachable from the seed: zero mass
    assert(ranks("x") == 0L && ranks("y") == 0L && ranks("z") == 0L)
  }

  test("personalizedPageRank: with every node seeded it matches " +
      "plain pageRank's teleport structure") {
    val und = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val all = Seq("a", "b", "c").toDF("node")
    val ppr = Analytics.personalizedPageRank(edges, "s", "d", all,
      iters = 6).collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val pr = Analytics.pageRank(edges, "s", "d", iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // identical graph + uniform teleport: the two iterations agree
    for (n <- Seq("a", "b", "c"))
      assert(math.abs(ppr(n) - pr(n)) <= 3L, s"$n ${ppr(n)} ${pr(n)}")
  }

  /** Full-rank deterministic pseudo-noise (a sin generator would be
    * rank-2 across dims — sin(a+b) expands over two basis rows — and
    * truncation would then lose nothing).
    */
  private def vecs(n: Int, d: Int): Seq[Array[Float]] =
    (1 to n).map(i => Array.tabulate(d)(k =>
      (((i * 2654435761L + k * 40503L + i * k * 69427L) % 1997L)
        / 1997.0f - 0.5f)))

  test("linearCka: an orthogonal re-embedding (reverse + sign-flip) " +
      "scores ~1; truncating half the dims scores well below") {
    val xs = vecs(60, 16)
    val rot = xs.map(v => Array.tabulate(16)(k =>
      (if (k % 2 == 0) v(15 - k) else -v(15 - k))))
    val cut = xs.map(v =>
      Array.tabulate(16)(k => if (k < 8) v(k) else 0.0f))
    val dfRot = xs.zip(rot).toDF("x", "y")
    val dfCut = xs.zip(cut).toDF("x", "y")
    val ckaRot = Similarity.linearCka(dfRot, "x", "y")
      .collect()(0).getAs[Double]("cka")
    val ckaCut = Similarity.linearCka(dfCut, "x", "y")
      .collect()(0).getAs[Double]("cka")
    assert(ckaRot > 0.999, s"rot $ckaRot")
    assert(ckaCut < 0.9 && ckaCut > 0.0, s"cut $ckaCut")
  }

  test("linearCka: identity scores 1 up to quantization, and the " +
      "row count and dims are reported") {
    val xs = vecs(40, 8)
    val r = Similarity.linearCka(xs.zip(xs).toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(r.getAs[Double]("cka") > 0.9999)
    assert(r.getAs[Long]("n") == 40L)
    assert(r.getAs[Int]("d_x") == 8 && r.getAs[Int]("d_y") == 8)
  }

  test("linearCka: ragged rows are EXCLUDED, not mis-summed — " +
      "adding short vectors leaves the result identical") {
    val xs = vecs(40, 8)
    val clean = xs.zip(xs).toDF("x", "y")
    val ragged = (xs.zip(xs) ++ Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(3.0f), Array(3.0f, 4.0f, 5.0f)))).toDF("x", "y")
    val a = Similarity.linearCka(clean, "x", "y").collect()(0)
    val b = Similarity.linearCka(ragged, "x", "y").collect()(0)
    assert(a.getAs[Long]("n") == 40L && b.getAs[Long]("n") == 40L)
    assert(a.getAs[Double]("cka") == b.getAs[Double]("cka"))
    assert(b.getAs[Int]("d_x") == 8 && b.getAs[Int]("d_y") == 8)
  }

  test("forecastBaselines: hand-computed MASE on a planted series — " +
      "seasonal-naive nails a pure weekly cycle, naive pays for it") {
    // y(t) = 100 if t mod 7 == 0 else 10; cut 14, end 20, season 7
    val rows = (0 to 20).map(t =>
      ("g", t.toLong, if (t % 7 == 0) 100L else 10L))
    val r = Analytics.forecastBaselines(rows.toDF("g", "b", "y"),
      Seq("g"), col("b"), col("y"), cutBucket = 14, endBucket = 20,
      season = 7).collect()(0)
    // snaive: y(t-7) == y(t) exactly -> zero error
    assert(r.getAs[Double]("mae_snaive") == 0.0)
    assert(r.getAs[Double]("mase_snaive") == 0.0)
    // naive holdout t=14..20: errors |y(t)-y(t-1)| = 90,90,0,0,0,0,0
    assert(math.abs(r.getAs[Double]("mae_naive") - 180.0 / 7) < 1e-4)
    // in-sample naive t=1..13: errors at t=1,7,8 -> 90·3/13
    val maseWant = (180.0 / 7) / (270.0 / 13)
    assert(math.abs(r.getAs[Double]("mase_naive") - maseWant) < 1e-6)
    assert(r.getAs[Long]("n_test") == 7L)
  }

  test("forecastBaselines: missing buckets are zero-filled, not " +
      "skipped") {
    // only even buckets present: odd ones must read 0
    val rows = (0 to 20 by 2).map(t => ("g", t.toLong, 50L))
    val r = Analytics.forecastBaselines(rows.toDF("g", "b", "y"),
      Seq("g"), col("b"), col("y"), cutBucket = 14, endBucket = 20,
      season = 7).collect()(0)
    // naive error is |50-0| = 50 at every holdout bucket
    assert(r.getAs[Double]("mae_naive") == 50.0)
  }
}
