package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.embeddingGram]] and [[Similarity.centroidSilhouette]]
  * — closed-form small corpora, separation/overlap direction, and the
  * degenerate contracts.
  */
class GramSilhouetteSpec extends SparkSpec {

  import spark.implicits._

  test("embeddingGram: closed-form moments on an exact corpus") {
    // values exactly representable at micro precision
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingGram(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(out.size === 3) // (0,0) (0,1) (1,1)
    val g00 = out((0, 0))
    assert(g00.getAs[Long]("n") === 2L)
    // E[x0²] = (1 + 9)/2 = 5; cov = 5 − 2² = 1
    assert(g00.getAs[Double]("gram") === 5.0)
    assert(g00.getAs[Double]("cov") === 1.0)
    val g01 = out((0, 1))
    // E[x0x1] = (2 − 3)/2 = −0.5; cov = −0.5 − 2·0.5 = −1.5
    assert(g01.getAs[Double]("gram") === -0.5)
    assert(g01.getAs[Double]("cov") === -1.5)
    val g11 = out((1, 1))
    // E[x1²] = (4 + 1)/2 = 2.5; cov = 2.5 − 0.25 = 2.25
    assert(g11.getAs[Double]("gram") === 2.5)
    assert(g11.getAs[Double]("cov") === 2.25)
  }

  test("embeddingGram: a constant dimension has zero covariance " +
      "(positive zero, not −0.0)") {
    val df = Seq((1L, Seq(1.0f, 7.0f)), (2L, Seq(2.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingGram(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    val c = out((1, 1)).getAs[Double]("cov")
    assert(c === 0.0 &&
      java.lang.Double.doubleToRawLongBits(c) === 0L)
  }

  test("centroidSilhouette: well-separated labels score near 1, " +
      "interleaved labels score near 0 or below") {
    def corpus(shift: Float) = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(0.2f, 0.0f), 0),
      (3L, Seq(0.0f, 0.2f), 0),
      (4L, Seq(shift, shift), 1), (5L, Seq(shift + 0.2f, shift), 1),
      (6L, Seq(shift, shift + 0.2f), 1))
      .toDF("vec_id", "embedding", "label")
    val far = Similarity.centroidSilhouette(
      corpus(100.0f), "vec_id", "embedding", "label").collect()
    assert(far.forall(_.getAs[Double]("mean_silhouette") > 0.9))
    val near = Similarity.centroidSilhouette(
      corpus(0.1f), "vec_id", "embedding", "label").collect()
    assert(near.forall(_.getAs[Double]("mean_silhouette") < 0.5))
  }

  test("centroidSilhouette: a single-label corpus has null mean " +
      "(no rival centroid) but still reports n and own spread") {
    val df = Seq((1L, Seq(0.0f, 0.0f), 7), (2L, Seq(1.0f, 0.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidSilhouette(df, "vec_id", "embedding",
      "label").collect()(0)
    assert(out.getAs[Long]("n") === 2L)
    assert(out.getAs[Long]("mean_sq_own") > 0L)
    assert(out.isNullAt(out.fieldIndex("mean_silhouette")))
  }

  test("centroidSilhouette: a vector sitting on a rival centroid " +
      "scores negative") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(0.4f, 0.0f), 0),
      // label-1 cluster far away, plus one member AT label 0's heart
      (3L, Seq(10.0f, 10.0f), 1), (4L, Seq(10.4f, 10.0f), 1),
      (5L, Seq(0.2f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidSilhouette(df, "vec_id", "embedding",
      "label").collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getAs[Double]("mean_silhouette") > 0.5)
    // label 1's mean drags negative-ward from the planted stray
    assert(out(1).getAs[Double]("mean_silhouette") <
      out(0).getAs[Double]("mean_silhouette"))
  }

  test("centroidSilhouette: a ragged vector fails loudly") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(1.0f), 0),
      (3L, Seq(5.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.centroidSilhouette(df, "vec_id", "embedding", "label")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("ragged")))
  }
}
