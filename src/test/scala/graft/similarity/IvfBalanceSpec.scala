package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Similarity.ivfBalanceReport]] — the index-ops skew diagnostic. */
class IvfBalanceSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Seq[Double])]) = df(
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType)))),
    rows.map { case (id, v) => Row(id, v) })

  test("population conserved, shares sum to 1, imbalance = share·k") {
    val rows = (1L to 12L).map(i =>
      i -> Seq(math.cos(i.toDouble), math.sin(i.toDouble), 0.5))
    val out = Similarity.ivfBalanceReport(vecs(rows), "vec_id",
      "embedding", nlist = 4).collect()
    assert(out.length === 4)
    assert(out.map(_.getLong(1)).sum === 12L)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2) * 4) < 1e-3)
      assert(r.getLong(4) === 4L)
    }
    val mx = out.map(_.getDouble(3)).max
    out.foreach(r => assert(r.getDouble(5) === mx))
  }

  test("an identical corpus collapses to one bucket; empty buckets " +
      "densify to zero rows") {
    val rows = (1L to 8L).map(i => i -> Seq(1.0, 2.0, 3.0))
    val out = Similarity.ivfBalanceReport(vecs(rows), "vec_id",
      "embedding", nlist = 3).collect()
    assert(out.length === 3)
    // every vector ties on cosine → all land on the smallest
    // centroid_id; the other buckets report EXACT zero, not absence
    assert(out.map(_.getLong(1)).sorted.toSeq === Seq(0L, 0L, 8L))
    assert(out.count(_.getDouble(2) === 0.0) === 2)
    assert(out.map(_.getDouble(5)).toSet === Set(3.0)) // 8/8·3
  }
}
