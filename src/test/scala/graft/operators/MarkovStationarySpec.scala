package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.markovStationary]] — damped fixed-point stationary
  * distribution over weighted transition counts.
  */
class MarkovStationarySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("f", StringType),
    StructField("t", StringType),
    StructField("n", LongType)))

  private def trans(rows: (String, String, Long)*) =
    df(schema, rows.map { case (f, t, n) => Row(f, t, n) })

  /** Exact driver replay of the documented integer recurrence. */
  private def replay(
      rows: Seq[(String, String, Long)], iters: Int,
      damping: Int = 900): Map[String, Long] = {
    val scale = 1000000000L
    val counts = rows.groupBy(r => (r._1, r._2))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    val tot = counts.groupBy(_._1._1)
      .map { case (f, xs) => f -> xs.values.sum }
    val p = counts.map { case ((f, t), n) =>
      (f, t) -> (n * scale) / tot(f)
    }
    val states = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    val n = states.length
    val teleport = ((1000L - damping) * scale / 1000L) / n
    var pi = states.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = p.toSeq.groupBy(_._1._2).map { case (t, es) =>
        t -> es.map { case ((f, _), pp) =>
          ((damping * pi(f)) / 1000L) * pp / scale
        }.sum
      }
      pi = states.map(s => s -> (teleport + in.getOrElse(s, 0L))).toMap
    }
    pi
  }

  private def run(rows: Seq[(String, String, Long)], iters: Int) =
    Analytics.markovStationary(trans(rows: _*), "f", "t", "n",
        iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches the exact integer replay on a weighted 3-state chain") {
    val rows = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L),
      ("b", "c", 2L), ("c", "a", 5L))
    assert(run(rows, 8) === replay(rows, 8))
  }

  test("a heavy self-looping state accumulates the most mass") {
    val rows = Seq(("hub", "hub", 9L), ("hub", "x", 1L),
      ("x", "hub", 1L))
    val pi = run(rows, 10)
    assert(pi("hub") > pi("x"))
    assert(pi === replay(rows, 10))
  }

  test("absorbing states drop their damped mass (the pageRank " +
      "contract) but still receive teleport + inflow") {
    // c has inflow but no outgoing row
    val rows = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L))
    val pi = run(rows, 4)
    assert(pi === replay(rows, 4))
    assert(pi("c") > 0L)
    val scale = 1000000000L
    assert(pi.values.sum < scale) // dropped mass is visible
  }

  test("duplicate transition rows collapse; partition invariance") {
    val rows = Seq(("a", "b", 2L), ("a", "b", 3L), ("b", "a", 4L))
    val merged = Seq(("a", "b", 5L), ("b", "a", 4L))
    assert(run(rows, 5) === replay(merged, 5))
    val big = (1 to 30).map(i =>
      (s"s${i % 6}", s"s${(i * 7) % 6}", (i % 4 + 1).toLong))
    val one = Analytics.markovStationary(
        trans(big: _*).repartition(1), "f", "t", "n", iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = Analytics.markovStationary(
        trans(big: _*).repartition(7), "f", "t", "n", iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
    assert(one === replay(big, 6))
  }
}
