package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Similarity.hardNegatives]] — IVF-routed wrong-label top-k for
  * contrastive-training negative mining.
  */
class HardNegativesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", IntegerType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("label", IntegerType)))

  private def frame(rows: (Int, Seq[Double], Integer)*) =
    df(schema, rows.map { case (i, v, l) => Row(i, v, l) })

  test("nearest same-label row is excluded; the top negative is the " +
      "nearest WRONG-label row, ranked by cosine desc / id asc") {
    // query 1 (label 0) at x-axis; id 2 is nearly identical but SAME
    // label; id 3 (label 1) is close; id 4 (label 1) is orthogonal
    val d = frame(
      (1, Seq(1.0, 0.0, 0.0), 0),
      (2, Seq(0.99, 0.01, 0.0), 0),
      (3, Seq(0.9, 0.3, 0.0), 1),
      (4, Seq(0.0, 1.0, 0.0), 1))
    val cents = Similarity.hashKCentroids(d, "vec_id", "embedding", 4)
    val got = Similarity.hardNegatives(
        d.where(col("vec_id") === 1), d, "vec_id", "embedding",
        "label", k = 2, cents, nprobe = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getInt(5)))
    assert(got.toSeq == Seq((3, 1, 1), (4, 1, 2)))
  }

  test("null-label rows pair with nothing on either side") {
    val d = frame(
      (1, Seq(1.0, 0.0), 0),
      (2, Seq(0.99, 0.1), null),
      (3, Seq(0.9, 0.2), 1))
    val cents = Similarity.hashKCentroids(d, "vec_id", "embedding", 3)
    val out = Similarity.hardNegatives(d, d, "vec_id", "embedding",
      "label", k = 3, cents, nprobe = 3).collect()
    // id 2 appears neither as query nor negative
    assert(!out.exists(r => r.getInt(0) == 2 || r.getInt(2) == 2))
    // 1 and 3 are each other's (only) negatives
    assert(out.map(r => (r.getInt(0), r.getInt(2))).toSet ==
      Set((1, 3), (3, 1)))
  }

  test("nprobe = nlist equals the brute-force reference on the real " +
      "embeddings, and routed results at nprobe=3 are a subset of " +
      "brute-force candidates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 8)
    val cents = Similarity.hashKCentroids(e, "vec_id", "embedding", 16)
    def key(r: Row) = (r.getLong(0), r.getLong(2), r.getInt(5))
    val full = Similarity.hardNegatives(q, e, "vec_id", "embedding",
        "label", k = 10, cents, nprobe = 16)
      .collect().map(key).toSet
    val brute = Similarity.hardNegativesBruteForce(q, e, "vec_id",
        "embedding", "label", k = 10)
      .collect().map(key).toSet
    assert(full == brute)
    assert(full.nonEmpty)
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val routed = Similarity.hardNegatives(q, e, "vec_id", "embedding",
        "label", k = 10, cents, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(routed.nonEmpty)
    // routing narrows the candidate pool but never violates the
    // contract: no self-pairs, never a same-label negative
    routed.foreach { case (qid, nid) =>
      assert(qid != nid && labels(qid) != labels(nid), s"($qid, $nid)")
    }
  }
}
