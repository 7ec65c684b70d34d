package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MmrSpec extends SparkSpec {

  private def cands(rows: Seq[(Long, Seq[Double], Double)]) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(DoubleType)),
      StructField("rel", DoubleType))),
    rows.map { case (i, v, r) => Row(i, v, r) })

  private def rerank(rows: Seq[(Long, Seq[Double], Double)], k: Int,
      lambdaMilli: Int = 700) =
    Similarity.mmrRerank(cands(rows), "id", "v", "rel", k, lambdaMilli)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .map(_._2)

  test("diversity kicks in: the near-duplicate of the top hit is " +
      "deferred behind a less-relevant but novel result") {
    val rows = Seq(
      1L -> (Seq(1.0, 0.0), 0.95),   // top relevance
      2L -> (Seq(0.999, 0.01), 0.94), // near-dup of 1
      3L -> (Seq(0.0, 1.0), 0.60))    // orthogonal, lower rel
    val out = rerank(rows.map(t => (t._1, t._2._1, t._2._2)), k = 3)
    assert(out.head === 1L)
    // pure relevance would pick 2 next; MMR penalizes its ~1.0
    // cosine to the selected 1 (0.7*0.94 - 0.3*1.0 < 0.7*0.6 - 0)
    assert(out(1) === 3L)
    assert(out(2) === 2L)
  }

  test("lambda = 1000 degenerates to pure relevance order") {
    val rows = Seq[(Long, Seq[Double], Double)](
      (1L, Seq(1.0, 0.0), 0.5), (2L, Seq(0.99, 0.01), 0.9),
      (3L, Seq(0.0, 1.0), 0.7))
    assert(rerank(rows, k = 3, lambdaMilli = 1000) ===
      Seq(2L, 3L, 1L))
  }

  test("deterministic across partitionings; ties to the smaller id") {
    val rows = (1L to 12L).map(i =>
      (i, Seq((i % 4).toDouble + 0.1, (i % 3).toDouble),
        0.5 + (i % 5) * 0.1))
    def run(parts: Int) =
      Similarity.mmrRerank(cands(rows).repartition(parts), "id", "v",
          "rel", k = 5)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(run(1) === run(7))
    // identical rows -> identical objective: smaller id wins
    val tied = rerank(Seq[(Long, Seq[Double], Double)](
      (9L, Seq(1.0, 0.0), 0.8), (4L, Seq(1.0, 0.0), 0.8)), k = 1)
    assert(tied === Seq(4L))
  }

  test("fewer candidates than k emits exactly the candidates, no " +
      "null ranks") {
    val out = rerank(Seq[(Long, Seq[Double], Double)](
      (1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.0, 1.0), 0.8)), k = 5)
    assert(out === Seq(1L, 2L))
  }
}
