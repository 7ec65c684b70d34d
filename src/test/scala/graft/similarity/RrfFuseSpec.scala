package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Reciprocal-rank fusion ([[Similarity.rrfFuse]]). */
class RrfFuseSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("q", IntegerType),
    StructField("item", IntegerType),
    StructField("rank", IntegerType)))

  private def ranking(rows: (Int, Int, Int)*) =
    df(schema, rows.map { case (q, i, r) => Row(q, i, r) })

  private def fuse(
      rankings: Seq[org.apache.spark.sql.DataFrame], topN: Int = 10) =
    Similarity.rrfFuse(rankings, "q", "item", "rank", k = 60,
        topN = topN)
      .orderBy("q", "fused_rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))

  test("item ranked well by both systems beats split verdicts") {
    // item 1: rank 2 + rank 2; item 2: rank 1 + rank 30; item 3:
    // rank 3 + rank 1. RRF favors consistent item 1 over spiky 2
    val a = ranking((1, 1, 2), (1, 2, 1), (1, 3, 3))
    val b = ranking((1, 1, 2), (1, 2, 30), (1, 3, 1))
    val out = fuse(Seq(a, b))
    assert(out.map(x => (x._2, x._3)).toSeq ==
      Seq((3, 1), (1, 2), (2, 3)))
    // 1/62 + 1/62 for item 1
    assert(math.abs(out(1)._5 - (1.0 / 62 + 1.0 / 62)) < 1e-6)
  }

  test("items missing from one ranking contribute only their present terms") {
    val a = ranking((1, 1, 1))
    val b = ranking((1, 2, 1))
    val out = fuse(Seq(a, b))
    assert(out.length == 2)
    assert(out.forall(_._4 == 1L)) // n_rankings = 1 each
    // equal scores → item id breaks the tie
    assert(out.map(_._2).toSeq == Seq(1, 2))
  }

  test("queries fuse independently and topN truncates per query") {
    val a = ranking((1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 9, 1))
    val out = fuse(Seq(a), topN = 2)
    assert(out.count(_._1 == 1) == 2)
    assert(out.count(_._1 == 2) == 1)
  }
}
