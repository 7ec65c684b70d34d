package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.fellegiSunterWeights]] — closed-form m/u estimates,
  * null-safe agreement, Laplace smoothing at the edges, and weight
  * ordering for discriminative vs useless fields.
  */
class FellegiSunterSpec extends SparkSpec {

  import spark.implicits._

  // records: brand discriminates (matches share it, non-matches
  // don't), size is constant (agrees on everything = useless)
  private val records = Seq(
    (1L, "acme", 5), (2L, "acme", 5),
    (3L, "bolt", 5), (4L, "cogs", 5))
    .toDF("id", "brand", "size")

  private val pairs = Seq(
    (1L, 2L, 1),   // match, brands agree
    (1L, 3L, 0), (2L, 4L, 0), (3L, 4L, 0)) // non-matches, disagree
    .toDF("id_a", "id_b", "is_match")

  test("closed-form m/u and weights") {
    val out = Dedup.fellegiSunterWeights(pairs, "id_a", "id_b",
      "is_match", records, "id", Seq("brand", "size"))
      .collect().map(r => r.getString(0) -> r).toMap
    val b = out("brand")
    assert(b.getAs[Long]("n_match") === 1L)
    assert(b.getAs[Long]("n_nonmatch") === 3L)
    // m = (1 + .5)/(1 + 1) = 0.75; u = (0 + .5)/(3 + 1) = 0.125
    assert(b.getAs[Double]("m") === 0.75)
    assert(b.getAs[Double]("u") === 0.125)
    assert(math.abs(b.getAs[Double]("w_agree") - math.log(6.0)) < 1e-6)
    assert(math.abs(b.getAs[Double]("w_disagree") -
      math.log(0.25 / 0.875)) < 1e-6)
    // size agrees everywhere: near-zero weight (useless comparator);
    // m = 1.5/2, u = 3.5/4 — smoothing denominators differ, so it's
    // near zero, not exactly zero
    val s = out("size")
    assert(s.getAs[Double]("m") === 0.75)
    assert(s.getAs[Double]("u") === 0.875)
    assert(math.abs(s.getAs[Double]("w_agree")) <
      b.getAs[Double]("w_agree"))
  }

  test("null-safe agreement: both-null agrees, one-null disagrees") {
    val recs = Seq[(Long, java.lang.Integer)](
      (1L, null), (2L, null), (3L, 7), (4L, null))
      .toDF("id", "f")
    val prs = Seq((1L, 2L, 1), (3L, 4L, 1)).toDF("a", "b", "m")
    val out = Dedup.fellegiSunterWeights(prs, "a", "b", "m",
      recs, "id", Seq("f")).collect()(0)
    // 2 match pairs: (null,null) agrees, (7,null) disagrees
    assert(out.getAs[Double]("m") === (1 + 0.5) / (2 + 1.0))
  }

  test("smoothing keeps weights finite when a field always or " +
      "never agrees") {
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("id", "f")
    val prs = Seq((1L, 2L, 1), (3L, 4L, 0)).toDF("a", "b", "m")
    val out = Dedup.fellegiSunterWeights(prs, "a", "b", "m",
      recs, "id", Seq("f")).collect()(0)
    assert(!out.getAs[Double]("w_agree").isInfinite)
    assert(!out.getAs[Double]("w_disagree").isInfinite)
    assert(out.getAs[Double]("w_agree") > 0)
    assert(out.getAs[Double]("w_disagree") < 0)
  }

  test("fields report in declaration order") {
    val out = Dedup.fellegiSunterWeights(pairs, "id_a", "id_b",
      "is_match", records, "id", Seq("size", "brand"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("size", "brand"))
  }
}
