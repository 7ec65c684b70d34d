package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.labelNoiseScreen]] — hand-computed distances, the
  * planted-outlier ranking, and the degenerate-label guard.
  */
class LabelNoiseSpec extends SparkSpec {

  import spark.implicits._

  test("a planted outlier ranks first with the hand-computed exact " +
      "distance and ratio") {
    // label 0: three vectors at (0,0) and one planted at (3,0).
    // Quantized units (1e4): elements 0 → 30000. Centroid per dim =
    // floor(sum/4): dim0 = 30000/4 = 7500, dim1 = 0 (offsets cancel).
    // sq_dist: inliers 7500² = 56_250_000; outlier 22500² =
    // 506_250_000. mean = (3·56.25e6 + 506.25e6)/4 = 168_750_000.
    val e = Seq(
      (1L, Array(0f, 0f), 0),
      (2L, Array(0f, 0f), 0),
      (3L, Array(0f, 0f), 0),
      (4L, Array(3f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelNoiseScreen(e, "vec_id", "embedding",
        "label", topK = 4)
      .orderBy("rank")
      .collect()
    assert(r.head.getLong(1) == 4L) // the planted outlier
    assert(r.head.getLong(2) == 506250000L)
    assert(r.head.getLong(3) == 168750000L)
    assert(r.head.getLong(4) == 3000000L) // exactly 3× the mean
    assert(r.head.getInt(5) == 1)
    // inliers tie on distance → id breaks ties
    assert(r.map(_.getLong(1)).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(r(1).getLong(2) == 56250000L)
  }

  test("negative elements quantize with FLOOR (not truncation) so the " +
      "offset shift cancels exactly") {
    // x = ±0.25 (exactly representable — a non-dyadic literal like
    // 0.15f would floor to its float neighbor) → floor(±2500.0);
    // symmetric about 0 → centroid dim = floor((−2500+2500+2·2^24)/2)
    // = 2^24 and the two distances are equal
    val e = Seq(
      (1L, Array(-0.25f), 7),
      (2L, Array(0.25f), 7)).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelNoiseScreen(e, "vec_id", "embedding",
        "label", topK = 2).collect()
    assert(r.map(_.getLong(2)).distinct.length == 1)
    assert(r.map(_.getLong(2)).head == 2500L * 2500L)
  }

  test("a degenerate label (every vector IS the centroid) reports " +
      "null ratio, not a division error") {
    val e = Seq(
      (1L, Array(0.5f, 0.5f), 1),
      (2L, Array(0.5f, 0.5f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelNoiseScreen(e, "vec_id", "embedding",
        "label", topK = 2).collect()
    assert(r.forall(_.getLong(2) == 0L))
    assert(r.forall(_.isNullAt(4)))
  }

  test("null/empty vectors and null labels are excluded; labels " +
      "screen independently") {
    val e = Seq(
      (1L, Array(0f), Some(0)),
      (2L, Array(1f), Some(0)),
      (3L, Array(9f), Some(1)),
      (4L, Array(8f), Some(1)),
      (5L, Array.empty[Float], Some(0)),
      (6L, Array(7f), None)).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelNoiseScreen(e, "vec_id", "embedding",
      "label", topK = 5)
    assert(r.count() == 4)
    assert(r.where(col("id").isin(5L, 6L)).count() == 0)
    // per-label top-k: both labels report their own two rows
    assert(r.groupBy("label").count().collect()
      .forall(_.getLong(1) == 2L))
  }

  test("a ragged corpus (vector length != label dimension) fails " +
      "loudly instead of emitting null-distance ranked rows") {
    val e = Seq(
      (1L, Array(0f, 0f), 0),
      (2L, Array(1f, 1f), 0),
      (3L, Array(2f), 0)).toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      Similarity.labelNoiseScreen(e, "vec_id", "embedding", "label",
        topK = 3).collect()
    }
    // the raise_error message names the offending row
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("ragged vector")))
  }
}
