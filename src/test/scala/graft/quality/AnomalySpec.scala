package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Anomaly.hbosTopK]] and [[Anomaly.mahalanobis2d]] — naive-Scala
  * replications, ranking semantics, and the degenerate guards.
  */
class AnomalySpec extends SparkSpec {

  private def frame2(rows: (Long, Long, Long)*) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("a", LongType),
      StructField("b", LongType))),
    rows.map { case (i, a, b) => Row(i, a, b) })

  // ---------------- HBOS ----------------

  private def naiveHbos(rows: Seq[(Long, Long, Long)], bins: Int)
      : Map[Long, Long] = {
    def nanoLn(v: Long) = math.floor(math.log(v.toDouble) * 1e9).toLong
    def feature(vs: Seq[(Long, Long)]): Map[Long, Long] = {
      val (mn, mx, n) = (vs.map(_._2).min, vs.map(_._2).max, vs.size)
      val bin = (v: Long) => (v - mn) * bins / (mx - mn + 1)
      val counts = vs.groupBy(r => bin(r._2)).view
        .mapValues(_.size.toLong).toMap
      vs.map { case (id, v) =>
        id -> (nanoLn(n.toLong) - nanoLn(counts(bin(v)) * bins))
      }.toMap
    }
    val f1 = feature(rows.map(r => (r._1, r._2)))
    val f2 = feature(rows.map(r => (r._1, r._3)))
    rows.map(r => r._1 -> (f1(r._1) + f2(r._1))).toMap
  }

  test("HBOS: full naive replication and the extreme point on top") {
    val rows = (1L to 19L).map(i => (i, 100L + i, 200L + 2 * i)) :+
      ((99L, 5000L, 210L))
    val out = Anomaly.hbosTopK(frame2(rows: _*), "id",
        Seq("a" -> col("a"), "b" -> col("b")), bins = 10, topK = 20)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("hbos_nano"))
    val exp = naiveHbos(rows, 10)
    out.foreach { case (id, s) => assert(s == exp(id), s"id $id") }
    // the planted extreme sits alone in its 'a' bin -> highest score
    assert(out.head._1 == 99L)
  }

  test("HBOS: a uniform feature contributes ~0; scores are additive " +
      "across features") {
    // 'a' perfectly uniform over 10 bins, 'b' has a sparse tail
    val rows = (0L until 20L).map(i =>
      (i, i * 10L, if (i == 7L) 900L else 100L + i % 3))
    val out = Anomaly.hbosTopK(frame2(rows: _*), "id",
        Seq("a" -> col("a"), "b" -> col("b")), bins = 10, topK = 20)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("hbos_nano")).toMap
    assert(out == naiveHbos(rows, 10))
    assert(out(7L) == out.values.max)
  }

  // ---------------- Mahalanobis ----------------

  private def naiveMaha(rows: Seq[(Long, Long, Long)])
      : Map[Long, Option[Double]] = {
    val n = rows.size.toLong
    val sx = rows.map(_._2).sum
    val sy = rows.map(_._3).sum
    val sxx = rows.map(r => BigInt(r._2) * r._2).sum
    val sxy = rows.map(r => BigInt(r._2) * r._3).sum
    val syy = rows.map(r => BigInt(r._3) * r._3).sum
    val cxx = BigInt(n) * sxx - BigInt(sx) * sx
    val cxy = BigInt(n) * sxy - BigInt(sx) * sy
    val cyy = BigInt(n) * syy - BigInt(sy) * sy
    val det = cxx.toDouble * cyy.toDouble - cxy.toDouble * cxy.toDouble
    rows.map { case (id, x, y) =>
      val dx = (BigInt(n) * x - sx).toDouble
      val dy = (BigInt(n) * y - sy).toDouble
      val num = cyy.toDouble * (dx * dx) -
        2.0 * cxy.toDouble * (dx * dy) + cxx.toDouble * (dy * dy)
      id -> (if (det > 0)
        Some(math.rint(num * (n - 1.0) / (det * n) * 1e6) / 1e6)
      else None)
    }.toMap
  }

  test("Mahalanobis: naive replication; the against-correlation " +
      "point outranks a farther on-axis point") {
    val cloud = (1L to 20L).map(i => (i, i * 10L, i * 10L + i % 3))
    val offAxis = (98L, 100L, -100L)  // against the x=y correlation
    val onAxis = (99L, 400L, 401L)    // far but ON the axis
    val rows = cloud :+ offAxis :+ onAxis
    val out = Anomaly.mahalanobis2d(frame2(rows: _*), "id",
        col("a"), col("b"), topK = 30).collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("d2")).map(_.asInstanceOf[Double]))
    val exp = naiveMaha(rows)
    out.foreach { case (id, d) => assert(d == exp(id), s"id $id") }
    assert(out.head._1 == 98L)
    val rank = out.map(_._1).toSeq
    assert(rank.indexOf(98L) < rank.indexOf(99L))
  }

  test("Mahalanobis: perfectly collinear data -> det 0, d2 null") {
    val rows = (1L to 10L).map(i => (i, i, 2 * i))
    val out = Anomaly.mahalanobis2d(frame2(rows: _*), "id",
        col("a"), col("b"), topK = 10).collect()
    out.foreach(r => assert(r.isNullAt(r.fieldIndex("d2"))))
  }
}
