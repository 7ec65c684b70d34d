package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Triangle counting ([[Analytics.triangleCounts]]) and
  * resource-allocation link prediction
  * ([[Analytics.resourceAllocationScores]]).
  */
class GraphShapeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("s", LongType),
    StructField("d", LongType)))

  private def edges(es: (Long, Long)*) =
    df(schema, es.map { case (a, b) => Row(a, b) })

  private def tri(es: (Long, Long)*) =
    Analytics.triangleCounts(edges(es: _*), "s", "d")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3))))
      .toMap

  test("K4: every node has degree 3, 3 triangles, coefficient 1.0") {
    val got = tri(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    got.values.foreach { case (deg, t, c) =>
      assert(deg == 3L && t == 3L && c == 1.0)
    }
  }

  test("each triangle counts once: one triangle + pendant sums to 3 " +
      "corner credits") {
    val got = tri(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    assert(got.values.map(_._2).sum == 3L)
    assert(got(4L) == ((1L, 0L, 0.0))) // degree-1 guard: 0.0, not NaN
    assert(got(3L) == ((3L, 1L, round6(2.0 / 6.0))))
  }

  private def round6(x: Double) = math.rint(x * 1e6) / 1e6

  test("duplicate, reversed and self edges collapse to the canonical " +
      "simple graph") {
    val clean = tri(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val noisy = tri(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 1L -> 3L,
      1L -> 1L, 1L -> 2L)
    assert(clean == noisy)
  }

  private def ra(k: Int, maxDeg: Int, es: (Long, Long)*) =
    Analytics.resourceAllocationScores(edges(es: _*), "s", "d", k,
        maxDeg)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap

  test("4-cycle: the two diagonals score 2 common neighbors x " +
      "(1e6 div 2) exactly") {
    val got = ra(10, 1024, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    assert(got == Map(
      (1L, 3L) -> ((2L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L))))
  }

  test("adjacent pairs never appear: a triangle yields no candidates") {
    assert(ra(10, 1024, 1L -> 2L, 2L -> 3L, 1L -> 3L).isEmpty)
  }

  test("maxCenterDeg drops super-hub centers; below the cap the star " +
      "scores every leaf pair at 1e6 div deg") {
    val star = Seq(9L -> 1L, 9L -> 2L, 9L -> 3L, 9L -> 4L, 9L -> 5L)
    assert(ra(20, 4, star: _*).isEmpty)
    val got = ra(20, 1024, star: _*)
    assert(got.size == 10) // C(5,2) leaf pairs
    got.values.foreach(v => assert(v == ((1L, 200000L))))
  }
}
