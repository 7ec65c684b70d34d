package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class KCenterSpec extends SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Float])]) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType)))),
    rows.map { case (i, v) => Row(i, v) })

  /** Driver-side replay: quantize (round half away from zero, scale =
    * maxabs/127) then greedy farthest-point on integer squared L2 —
    * the operator's documented arithmetic.
    */
  private def reference(
      rows: Seq[(Long, Seq[Float])], k: Int): Seq[(Int, Long)] = {
    val codes = rows.map { case (id, v) =>
      val maxabs = v.map(x => math.abs(x.toDouble)).max
      val q =
        if (maxabs == 0.0) v.map(_ => 0L)
        else v.map(x => math.round(x.toDouble / (maxabs / 127.0)))
      id -> q
    }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var selected = Seq(codes.keys.min)
    var mind = (codes - selected.head).map { case (id, q) =>
      id -> d2(q, codes(selected.head))
    }
    while (selected.size < k) {
      val (nid, _) = mind.maxBy { case (id, d) => (d, -id) }
      selected :+= nid
      mind = (mind - nid).map { case (id, d) =>
        id -> math.min(d, d2(codes(id), codes(nid)))
      }
    }
    selected.zipWithIndex.map { case (id, i) => (i + 1, id) }
  }

  private val cluster: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(1f, 0f), 2L -> Seq(0.99f, 0.01f), 3L -> Seq(0f, 1f),
    4L -> Seq(-1f, 0f), 5L -> Seq(0.98f, 0.02f), 6L -> Seq(0f, -1f))

  test("farthest-point picks the spread, not the crowd") {
    val out = Similarity.kCenterSelect(emb(cluster), "id", "v", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // seed = 1; the three near-duplicates of 1 (ids 2, 5) must lose
    // to the spread points (3, 4, 6)
    assert(out.map(_._2).take(1) === Seq(1L))
    assert(!out.map(_._2).exists(Set(2L, 5L)))
    assert(out.toSeq === reference(cluster, 4))
  }

  test("matches the driver replay on a larger deterministic set") {
    val rows = (1L to 40L).map { i =>
      i -> Seq((i % 7).toFloat - 3f, (i % 5).toFloat - 2f,
        (i % 3).toFloat)
    }
    val out = Similarity.kCenterSelect(emb(rows), "id", "v", k = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === reference(rows, 8))
  }

  test("radius sequence is non-increasing from round 3 on") {
    val rows = (1L to 30L).map(i =>
      i -> Seq((i * 37 % 11).toFloat, (i * 53 % 13).toFloat))
    val out = Similarity.kCenterSelect(emb(rows), "id", "v", k = 6)
      .collect().sortBy(_.getInt(0))
    val radii = out.drop(1).map(_.getLong(3))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii not monotone: ${radii.mkString(",")}")
  }

  test("k beyond the number of distinct rows: exhausted rounds are " +
      "dropped, not emitted as null-id centers") {
    val rows: Seq[(Long, Seq[Float])] =
      Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(-1f, 0f))
    val out = Similarity.kCenterSelect(emb(rows), "id", "v", k = 6)
      .collect().sortBy(_.getInt(0))
    assert(out.length === 3)
    assert(out.forall(!_.isNullAt(1)))
    assert(out.map(_.getLong(1)).toSet === Set(1L, 2L, 3L))
  }

  test("string ids: seed and tie-breaks follow the natural string " +
      "ordering (no numeric negation in the argmax)") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("v", ArrayType(FloatType))))
    // b and c are identical: equidistant from seed a, tie -> "b"
    val frame = df(schema, Seq(
      Row("a", Seq(1f, 0f)), Row("c", Seq(0f, 1f)),
      Row("b", Seq(0f, 1f))))
    val out = Similarity.kCenterSelect(frame, "id", "v", k = 2)
      .collect().sortBy(_.getInt(0)).map(_.getString(1))
    assert(out === Array("a", "b"))
  }

  test("the k ceiling is enforced with a scan-cost rationale") {
    val e = intercept[IllegalArgumentException] {
      Similarity.kCenterSelect(emb(cluster), "id", "v", k = 257)
    }
    assert(e.getMessage.contains("pre-sample"))
  }

  test("partition-layout invariance") {
    val rows = (1L to 25L).map(i =>
      i -> Seq((i * 31 % 17).toFloat, (i * 41 % 19).toFloat))
    def run(parts: Int) =
      Similarity.kCenterSelect(emb(rows).repartition(parts), "id", "v",
          k = 5)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(run(1) === run(8))
  }
}
