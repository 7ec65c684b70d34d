package graft.similarity

import graft.SparkSpec

/** [[Similarity.rankBiasedOverlap]] — identity/disjoint closed forms,
  * the naive-reference equality, and the top-weighting property that
  * distinguishes RBO from plain set overlap.
  */
class RankBiasedOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def rnk(ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) => (1L, id, i + 1) }
      .toDF("q", "id", "rank")

  private def run(a: Seq[Long], b: Seq[Long], k: Int = 10) =
    Similarity.rankBiasedOverlap(rnk(a), rnk(b), "q", "id", "rank", k)
      .head()

  /** Naive truncated-normalized RBO with p = 9/10 in exact rationals. */
  private def naive(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    def pow(x: Long, e: Int) = (1 to e).foldLeft(1L)((m, _) => m * x)
    val dBig = pow(10, k) - pow(9, k)
    val nano = (1 to k).map { d =>
      val x = (a.take(d).toSet & b.take(d).toSet).size
      val c = pow(9, d - 1) * pow(10, k - d)
      BigInt(x) * c * 1000000000L / (BigInt(d) * dBig) // floor div
    }.sum
    (BigDecimal(nano) / 1000000000L).toDouble
  }

  test("identical rankings score exactly 1; disjoint score 0 and " +
      "still appear (domain = union)") {
    val ids = (1L to 10L).toSeq
    assert(run(ids, ids).getAs[Double]("rbo") === 1.0)
    val d = run(ids, (11L to 20L).toSeq)
    assert(d.getAs[Double]("rbo") === 0.0)
    assert(d.getAs[Long]("n_common") === 0L)
  }

  test("matches the naive rational reference on partial overlaps") {
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    val b = Seq(2L, 1L, 3L, 11L, 5L, 12L, 7L, 13L, 9L, 4L)
    val got = run(a, b).getAs[Double]("rbo")
    val want = naive(a, b, 10)
    // operator rounds to 6; the reference is unrounded
    assert(math.abs(got - want) < 6e-7, s"got $got want $want")
    assert(run(a, b).getAs[Long]("n_common") === 7L)
  }

  test("RBO is TOP-weighted: a swap at ranks 1-2 costs more than " +
      "the same swap at ranks 9-10") {
    val base = (1L to 10L).toSeq
    val topSwap = Seq(2L, 1L) ++ (3L to 10L)
    val tailSwap = (1L to 8L) ++ Seq(10L, 9L)
    val top = run(base, topSwap).getAs[Double]("rbo")
    val tail = run(base, tailSwap).getAs[Double]("rbo")
    assert(top < tail, s"top=$top tail=$tail")
    assert(tail < 1.0)
  }

  test("queries are independent and ranks past k are ignored; a " +
      "short list is penalized (its deep prefixes stay small)") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1),
      (2L, 21L, 2), (1L, 99L, 7)).toDF("q", "id", "rank")
    val b = Seq((1L, 10L, 1), (1L, 12L, 2), (2L, 20L, 1),
      (2L, 21L, 2)).toDF("q", "id", "rank")
    val out = Similarity.rankBiasedOverlap(a, b, "q", "id", "rank",
        k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("rbo")).toMap
    assert(out(2L) === 1.0) // both full prefixes agree
    assert(out(1L) > 0.0 && out(1L) < 1.0)
    // one-item lists at k=2: X_1 = X_2 = 1 → 10/19 + 9/38 = 0.763158
    val short = Seq((9L, 5L, 1)).toDF("q", "id", "rank")
    val r = Similarity.rankBiasedOverlap(short, short, "q", "id",
      "rank", k = 2).head()
    assert(r.getAs[Double]("rbo") === 0.763158)
  }
}
