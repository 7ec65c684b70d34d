package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.basketAffinity]] — market-basket pair co-occurrence
  * with support / confidence / lift.
  */
class BasketAffinitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("basket", LongType),
    StructField("item", StringType)))

  private def run(rows: Seq[Row], maxBasket: Int = 64,
      minPairCount: Long = 1L) =
    Analytics.basketAffinity(df(schema, rows), "basket", "item",
        maxBasket, minPairCount)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) -> r)
      .toMap

  // 3 baskets: {a,b}, {a,b,c}, {b,c}
  private val corpus = Seq(
    Row(1L, "a"), Row(1L, "b"),
    Row(2L, "a"), Row(2L, "b"), Row(2L, "c"),
    Row(3L, "b"), Row(3L, "c"))

  test("closed-form counts, support, confidence, and lift") {
    val out = run(corpus)
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("pair_count") == 2L)
    assert(ab.getAs[Double]("support") == 2.0 / 3)
    assert(ab.getAs[Double]("confidence") == 2.0 / 2) // P(b | a)
    assert(ab.getAs[Double]("lift") == (2.0 * 3) / (2 * 3))
    val ac = out(("a", "c"))
    assert(ac.getAs[Long]("pair_count") == 1L)
    assert(ac.getAs[Double]("lift") == (1.0 * 3) / (2 * 2))
    val bc = out(("b", "c"))
    assert(bc.getAs[Double]("confidence") == 2.0 / 3)
    assert(bc.getAs[Double]("lift") == (2.0 * 3) / (3 * 2))
  }

  test("duplicate (basket, item) observations count once; nulls drop") {
    val out = run(corpus ++ Seq(
      Row(1L, "a"), Row(1L, "a"), // repeat purchases, same basket
      Row(null, "a"), Row(4L, null)))
    assert(out(("a", "b")).getAs[Long]("pair_count") == 2L)
    assert(out(("a", "b")).getAs[Double]("support") == 2.0 / 3)
  }

  test("maxBasket cap keeps the lexicographically smallest items") {
    // basket 1 = {a,b,c,d,e} capped at 3 -> {a,b,c}; basket 2 = {d,e}
    val rows = Seq("a", "b", "c", "d", "e").map(Row(1L, _)) ++
      Seq(Row(2L, "d"), Row(2L, "e"))
    val out = run(rows, maxBasket = 3)
    assert(out.keySet ==
      Set(("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")))
    // item counts are over the CAPPED set: d appears once (basket 2)
    assert(out(("d", "e")).getAs[Double]("confidence") == 1.0)
    assert(out(("d", "e")).getAs[Double]("lift") == (1.0 * 2) / (1 * 1))
  }

  test("minPairCount prunes singleton pairs") {
    val out = run(corpus, minPairCount = 2L)
    assert(out.keySet == Set(("a", "b"), ("b", "c")))
  }

  test("pairs are emitted once, ordered item_a < item_b") {
    val out = run(corpus)
    assert(out.keys.forall { case (a, b) => a < b })
  }
}
