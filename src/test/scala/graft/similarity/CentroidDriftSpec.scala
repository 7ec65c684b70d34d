package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group centroids (vector mean) and the pairwise centroid-drift
  * report ([[Similarity.groupCentroids]] / [[Similarity.centroidDrift]]).
  */
class CentroidDriftSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType),
    StructField("vec", ArrayType(FloatType), nullable = true)))

  private def vecs(rows: (String, Seq[Float])*) =
    df(schema, rows.map { case (g, v) =>
      Row(g, if (v == null) null else v)
    })

  test("centroid is the per-dimension mean, assembled in order") {
    val out = Similarity.groupCentroids(
        vecs(("a", Seq(1f, 2f, 3f)), ("a", Seq(3f, 4f, 5f)),
          ("b", Seq(10f, 0f, 0f))),
        "g", "vec")
      .orderBy("group").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(out(0).getSeq[Double](1) == Seq(2.0, 3.0, 4.0))
    assert(out(0).getLong(2) == 2L)
    assert(out(1).getSeq[Double](1) == Seq(10.0, 0.0, 0.0))
    assert(out(1).getLong(2) == 1L)
  }

  test("null vectors are excluded from mean and count") {
    val out = Similarity.groupCentroids(
        vecs(("a", Seq(2f, 2f)), ("a", null)), "g", "vec")
      .collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Double](1) == Seq(2.0, 2.0))
    assert(out.head.getLong(2) == 1L)
  }

  test("drift: identical distributions → sim 1, orthogonal → sim 0") {
    val out = Similarity.centroidDrift(
        vecs(
          ("a", Seq(1f, 0f)), ("a", Seq(3f, 0f)),
          ("b", Seq(2f, 0f)),
          ("c", Seq(0f, 5f))),
        "g", "vec")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 1L, 1.0),
      ("a", "c", 2L, 1L, 0.0),
      ("b", "c", 1L, 1L, 0.0)))
  }

  test("each unordered group pair appears exactly once") {
    val out = Similarity.centroidDrift(
      vecs(("a", Seq(1f)), ("b", Seq(1f)), ("c", Seq(1f)),
        ("d", Seq(1f))), "g", "vec")
    assert(out.count() == 6) // C(4,2)
  }

  test("mean rounding makes the centroid partition-order independent") {
    // 101 vectors whose float sum depends on association order
    val rows = (1 to 101).map(i => ("a", Seq(1.0f / i, 0.1f)))
    val one = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (g, v) => Row(g, v) }, 1), schema)
    val many = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.reverse.map { case (g, v) => Row(g, v) }, 7), schema)
    val c1 = Similarity.groupCentroids(one, "g", "vec")
      .collect().head.getSeq[Double](1)
    val c2 = Similarity.groupCentroids(many, "g", "vec")
      .collect().head.getSeq[Double](1)
    assert(c1 == c2)
  }
}
