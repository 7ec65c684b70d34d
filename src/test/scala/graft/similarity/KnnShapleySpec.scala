package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[DataValuation.knnShapley]] — a full naive-Scala replication of
  * the Jia et al. recurrence, the efficiency property (per-test value
  * sum = KNN accuracy), discrimination on a clustered fixture (helpful
  * same-label neighbors positive, a planted mislabeled point
  * negative), and the magnitude-first division contract.
  */
class KnnShapleySpec extends SparkSpec {

  private def frame(rows: (Long, Seq[Float], Int, Boolean)*) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType)),
      StructField("y", IntegerType),
      StructField("t", BooleanType))),
    rows.map { case (id, v, y, t) => Row(id, v, y, t) })

  private def run(k: Int, rows: (Long, Seq[Float], Int, Boolean)*) =
    DataValuation.knnShapley(frame(rows: _*), "id", "v", "y",
      col("t"), k = k)

  /** Independent replication with plain Scala sorts and longs. */
  private def naive(rows: Seq[(Long, Seq[Float], Int, Boolean)],
      k: Int): Map[Long, Long] = {
    val q = (v: Seq[Float]) =>
      v.map(x => math.floor(x.toDouble * 1e6).toLong)
    val tst = rows.filter(_._4).map(r => (r._1, q(r._2), r._3))
    val trn = rows.filterNot(_._4).map(r => (r._1, q(r._2), r._3))
    val acc = collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((_, tv, ty) <- tst) {
      val sorted = trn.map { case (rid, rv, ry) =>
        (tv.zip(rv).map { case (a, b) => (a - b) * (a - b) }.sum,
          rid, ry)
      }.sorted
      val n = sorted.size
      var s = 0L
      for (i <- n to 1 by -1) {
        val (_, rid, ry) = sorted(i - 1)
        val mi = if (ry == ty) 1L else 0L
        s = if (i == n) mi * (1000000000L / n)
        else {
          val mn = if (sorted(i)._3 == ty) 1L else 0L
          s + (mi - mn) * (1000000000L / math.max(k.toLong, i))
        }
        acc(rid) += s
      }
    }
    acc.toMap
  }

  // two tight clusters in 2-D: label 0 near the origin, label 1 near
  // (1, 1); train point 99 sits ON test point 11 with label 0
  // (mislabeled) — inside test 11's top-K, where it displaces a
  // correct neighbor and the recurrence prices the harm
  private val clustered = Seq(
    (0L, Seq(0.00f, 0.01f), 0, false), (1L, Seq(0.02f, 0.00f), 0, false),
    (2L, Seq(0.01f, 0.02f), 0, false), (3L, Seq(1.00f, 1.01f), 1, false),
    (4L, Seq(1.02f, 1.00f), 1, false), (5L, Seq(1.01f, 1.02f), 1, false),
    (99L, Seq(1.01f, 1.01f), 0, false),
    (10L, Seq(0.01f, 0.01f), 0, true), (11L, Seq(1.01f, 1.01f), 1, true))

  test("full naive replication on the clustered fixture (K = 2)") {
    val out = run(2, clustered: _*).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("shap_sum_nano"))
      .toMap
    assert(out == naive(clustered, 2))
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 99L))
  }

  test("discrimination: same-label near neighbors are positive, the " +
      "planted mislabeled point is negative") {
    val out = run(2, clustered: _*).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("shap")).toMap
    assert(out(0L) > 0.0 && out(3L) > 0.0)
    assert(out(99L) < 0.0)
  }

  test("efficiency: per test point the value sum telescopes to the " +
      "KNN vote share of the correct label") {
    // single test point makes the identity directly checkable
    val one = clustered.filterNot(_._4) :+
      (10L, Seq(0.01f, 0.01f), 0, true)
    val out = run(2, one: _*).collect()
    val total = out.map(_.getAs[Long]("shap_sum_nano")).sum
    // top-2 train for test 10 are ids 0,2 (both label 0 = correct):
    // sum_i s_i = (2/2)·1e9 up to the floored-division residue
    assert(math.abs(total - 1000000000L) < 10L)
  }

  test("K = 1 against the naive replication (exercise max(K, i) = i " +
      "everywhere past rank 1)") {
    val out = run(1, clustered: _*).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("shap_sum_nano"))
      .toMap
    assert(out == naive(clustered, 1))
  }

  test("null vectors / labels / flags are excluded; n_tests counts " +
      "the eval sample") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType)),
      StructField("y", IntegerType),
      StructField("t", BooleanType)))
    val withNulls = frame(clustered: _*).unionByName(df(schema, Seq(
      Row(50L, null, 0, false),                 // null vector
      Row(51L, Seq(0.5f, 0.5f), null, false),   // null label
      Row(52L, Seq(0.5f, 0.5f), 0, null))))     // null flag
    val out = DataValuation.knnShapley(withNulls, "id", "v", "y",
      col("t"), k = 2).collect()
    assert(out.map(_.getAs[Long]("id")).toSet ==
      Set(0L, 1L, 2L, 3L, 4L, 5L, 99L))
    assert(out.forall(_.getAs[Long]("n_tests") == 2L))
  }
}
