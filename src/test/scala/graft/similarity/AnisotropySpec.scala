package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.embeddingAnisotropy]] — the sum-vector identity
  * against brute force, the orientation closed forms, and the
  * degenerate/total-row contracts.
  */
class AnisotropySpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Int, Seq[Float])]) =
    Similarity.embeddingAnisotropy(
      rows.toDF("label", "embedding"), "embedding", "label")
      .collect().map(r => r.getString(0) -> r).toMap

  test("closed forms: orthogonal → 0, parallel → 1, " +
      "anti-parallel → −1 mean cosine") {
    val out = run(Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (1, Seq(1.0f, 0.0f)), (1, Seq(1.0f, 0.0f)),
      (2, Seq(1.0f, 0.0f)), (2, Seq(-1.0f, 0.0f))))
    assert(out("0").getAs[Double]("mean_pairwise_dot") === 0.0)
    assert(out("0").getAs[Double]("mean_cos") === 0.0)
    assert(out("1").getAs[Double]("mean_pairwise_dot") === 1.0)
    assert(out("1").getAs[Double]("mean_cos") === 1.0)
    assert(out("2").getAs[Double]("mean_pairwise_dot") === -1.0)
    assert(out("2").getAs[Double]("mean_cos") === -1.0)
    assert(out("1").getAs[Double]("mean_norm") === 1.0)
  }

  test("the identity matches brute force on an arbitrary corpus") {
    val vecs = (1 to 9).map { i =>
      Seq(((i * 37) % 11 - 5) / 7.0f, ((i * 53) % 13 - 6) / 9.0f,
        ((i * 71) % 7 - 3) / 5.0f)
    }
    val out = run(vecs.map((7, _)))("7")
    val dots = for {
      i <- vecs.indices; j <- vecs.indices if i != j
    } yield vecs(i).zip(vecs(j)).map { case (a, b) =>
      a.toDouble * b.toDouble }.sum
    val want = dots.sum / dots.size
    assert(math.abs(out.getAs[Double]("mean_pairwise_dot") - want)
      < 1e-3) // micro-quantization of components
  }

  test("the __all__ row spans labels and a singleton label is null") {
    val out = run(Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (9, Seq(3.0f, 4.0f))))
    val s = out("9")
    assert(s.getAs[Long]("n") === 1L)
    assert(s.getAs[Double]("mean_norm") === 5.0)
    assert(s.isNullAt(s.fieldIndex("mean_pairwise_dot")))
    assert(s.isNullAt(s.fieldIndex("mean_cos")))
    val all = out("__all__")
    assert(all.getAs[Long]("n") === 3L)
    // Σ_{i≠j} dots over the pooled 3 = 2·(0 + 3 + 4) = 14; /6
    assert(math.abs(all.getAs[Double]("mean_pairwise_dot") -
      14.0 / 6) < 1e-4)
  }
}
