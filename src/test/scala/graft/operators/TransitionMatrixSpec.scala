package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.transitionMatrix]] — first-order Markov transitions
  * over per-key ordered sequences.
  */
class TransitionMatrixSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("t", LongType),
    StructField("s", StringType)))

  private def run(rows: Seq[Row], minCount: Long = 1L) =
    Analytics.transitionMatrix(df(schema, rows), "k", "s",
        Seq(col("t").asc), minCount)
      .collect()
      .map(r => (r.getAs[String]("from_state"), r.getAs[String]("to_state"))
        -> r)
      .toMap

  // user 1: a->b->a->c; user 2: b->a
  private val corpus = Seq(
    Row(1L, 10L, "a"), Row(1L, 20L, "b"), Row(1L, 30L, "a"),
    Row(1L, 40L, "c"),
    Row(2L, 10L, "b"), Row(2L, 20L, "a"))

  test("closed-form transition counts and row-conditional probabilities") {
    val out = run(corpus)
    assert(out.keySet ==
      Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(out(("a", "b")).getAs[Long]("transitions") == 1L)
    assert(out(("a", "b")).getAs[Double]("prob") == 0.5) // a -> {b, c}
    assert(out(("a", "c")).getAs[Double]("prob") == 0.5)
    assert(out(("b", "a")).getAs[Long]("transitions") == 2L)
    assert(out(("b", "a")).getAs[Double]("prob") == 1.0)
  }

  test("sequences never cross key boundaries") {
    // last of user 1 is c, first of user 2 is b: no c->b transition
    assert(!run(corpus).contains(("c", "b")))
  }

  test("null keys and states drop before the lag (sequence skips them)") {
    val out = run(corpus ++ Seq(
      Row(1L, 25L, null), // between b(20) and a(30): b->a NOT b->null->a
      Row(null, 10L, "a")))
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(out(("b", "a")).getAs[Long]("transitions") == 2L)
  }

  test("minCount prunes pairs but totals keep probabilities true") {
    val out = run(corpus, minCount = 2L)
    assert(out.keySet == Set(("b", "a")))
    assert(out(("b", "a")).getAs[Double]("prob") == 1.0)
  }

  test("single-event keys emit nothing") {
    assert(run(Seq(Row(1L, 10L, "a"))).isEmpty)
  }
}
