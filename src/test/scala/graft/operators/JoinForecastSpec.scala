package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.joinSizeForecast]] — the forecast must equal the join
  * it predicts, exactly, and the top-N cut must be deterministic.
  */
class JoinForecastSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    ("a", 1), ("a", 2), ("a", 3), // hot key: 3 left rows
    ("b", 4), ("b", 5),
    ("c", 6), // unmatched on the right
    (null.asInstanceOf[String], 7)).toDF("k", "payload")
  private val right = Seq(
    ("a", 10), ("a", 11), ("a", 12), ("a", 13), // hot: 4 right rows
    ("b", 14),
    ("d", 15), // unmatched on the left
    (null.asInstanceOf[String], 16)).toDF("k", "v")

  test("total_out_rows equals the actual inner-join cardinality and " +
      "per-key products decompose it") {
    val f = Analytics.joinSizeForecast(left, right, "k", "k", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val actual = left.join(right, Seq("k")).count()
    assert(f.forall(_._5 == actual)) // total rides every row
    assert(f.map(_._4).sum == actual) // per-key products sum to it
    assert(actual == 3L * 4 + 2L * 1)
    // hot key first, exact decomposition
    assert(f.head == ("a", 3L, 4L, 12L, 14L, 2L, 857142L))
    assert(f(1) == ("b", 2L, 1L, 2L, 14L, 2L, 142857L))
    assert(f.length == 2) // unmatched and null keys never forecast
  }

  test("topN cuts on (out_rows desc, key) deterministically") {
    val l = Seq(("x", 1), ("y", 2), ("z", 3)).toDF("k", "p")
    val r = Seq(("x", 1), ("y", 2), ("z", 3)).toDF("k", "p")
    val f = Analytics.joinSizeForecast(l, r, "k", "k", topN = 2)
      .select("key").as[String].collect()
    assert(f.toSeq == Seq("x", "y")) // all tie at 1 → key order breaks
  }

  test("null keys are excluded — an equi-join never matches them") {
    val l = Seq[(Option[String], Int)]((None, 1), (None, 2),
      (Some("a"), 3)).toDF("k", "p")
    val f = Analytics.joinSizeForecast(l, l, "k", "k")
    assert(f.select("key").as[String].collect().toSeq == Seq("a"))
  }
}
