package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[DensityCluster.gridDbscan]] — hand-built clusters/noise, border
  * attachment, cross-cell and negative-coordinate pairs (the stencil
  * and floor-div cell contracts), and the √n-adaptive eps.
  */
class GridDbscanSpec extends SparkSpec {

  private def frame(rows: (Long, Seq[Float])*) = df(
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))),
    rows.map { case (id, v) => Row(id, v) })

  private def run(eps: Long, minPts: Int, rows: (Long, Seq[Float])*) =
    DensityCluster.gridDbscan(frame(rows: _*), "vec_id", "embedding",
        dimX = 0, dimY = 1, epsMicro = eps, minPts = minPts)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_neighbors"), r.getAs[Int]("is_core"),
          r.getAs[Long]("cluster"))))
      .toMap

  private def p(id: Long, x: Double, y: Double) =
    (id, Seq(x.toFloat, y.toFloat))

  test("two hand-built clusters plus an isolated noise point") {
    val blobA = Seq(p(0, 0.0, 0.0), p(1, 0.1, 0.0), p(2, 0.0, 0.1),
      p(3, 0.1, 0.1), p(4, 0.05, 0.05))
    val blobB = Seq(p(10, 2.0, 2.0), p(11, 2.1, 2.0), p(12, 2.0, 2.1),
      p(13, 2.1, 2.1), p(14, 2.05, 2.05))
    val noise = Seq(p(99, -3.0, -3.0))
    val out = run(150000L, 5, (blobA ++ blobB ++ noise): _*)
    blobA.foreach { case (id, _) =>
      assert(out(id) == ((5L, 1, 0L))) }
    blobB.foreach { case (id, _) =>
      assert(out(id) == ((5L, 1, 10L))) }
    assert(out(99L) == ((1L, 0, -1L)))
  }

  test("border point: non-core within eps of a core joins that " +
      "core's cluster") {
    // 4 mutual points at pairwise <= eps are core at minPts 4; the
    // 5th sits within eps of ONLY point 3 -> 2 neighbors -> border
    val pts = Seq(p(0, 0.0, 0.0), p(1, 0.1, 0.0), p(2, 0.0, 0.1),
      p(3, 0.1, 0.1), p(20, 0.24, 0.1))
    val out = run(150000L, 4, pts: _*)
    assert(out(3L)._2 == 1)
    assert(out(20L) == ((2L, 0, 0L)))
  }

  test("a pair straddling a cell boundary is still found (stencil " +
      "contract), including across negative coordinates") {
    // eps = 150000: qx 149999 lands in cell 0, 150001 in cell 1
    val straddle = Seq(p(0, 0.149999, 0.0), p(1, 0.150001, 0.0))
    // cells -21 and -20 on both axes (floor division, not
    // truncation), far from the straddle pair
    val neg = Seq(p(10, -3.01, -3.01), p(11, -2.99, -2.99))
    val out = run(150000L, 5, (straddle ++ neg): _*)
    assert(out(0L)._1 == 2L && out(1L)._1 == 2L)
    assert(out(10L)._1 == 2L && out(11L)._1 == 2L)
  }

  test("vectors missing a projected dim are excluded; ids with both " +
      "dims all appear exactly once") {
    val pts = Seq(p(0, 0.0, 0.0), p(1, 0.05, 0.0),
      (7L, Seq(0.3f)), (8L, null: Seq[Float]))
    val out = run(150000L, 2, pts: _*)
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == ((2L, 1, 0L)))
  }

  test("adaptive eps (epsMicro = 0) equals the fixed 352000 div " +
      "isqrt(n) radius") {
    // n = 4 -> isqrt = 2 -> eps = 176000
    val pts = Seq(p(0, 0.0, 0.0), p(1, 0.17, 0.0), p(2, 0.0, 0.17),
      p(3, 0.5, 0.5))
    val adaptive = DensityCluster.gridDbscan(frame(pts: _*), "vec_id",
      "embedding", epsMicro = 0L, minPts = 3).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_neighbors"),
        r.getAs[Int]("is_core"), r.getAs[Long]("cluster"))).sortBy(_._1)
    val fixed = DensityCluster.gridDbscan(frame(pts: _*), "vec_id",
      "embedding", epsMicro = 176000L, minPts = 3).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_neighbors"),
        r.getAs[Int]("is_core"), r.getAs[Long]("cluster"))).sortBy(_._1)
    assert(adaptive.toSeq == fixed.toSeq)
    assert(adaptive.find(_._1 == 0L).get._3 == 1) // 0 sees 1,2,self
  }
}
