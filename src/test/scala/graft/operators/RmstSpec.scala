package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.rmst]] — hand-computed areas under the KM step curve,
  * the τ-clipping semantics, the all-events ≡ sample-mean identity,
  * and agreement with [[Analytics.kaplanMeier]]'s curve integrated
  * naively.
  */
class RmstSpec extends SparkSpec {

  private def subjects(rows: (String, Long, Boolean)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("t", LongType),
      StructField("e", BooleanType))),
    rows.map { case (g, t, e) => Row(g, t, e) })

  private def run(tau: Long, rows: (String, Long, Boolean)*) =
    Analytics.rmst(subjects(rows: _*), "g", col("t"), col("e"), tau)

  // durations [2 event, 4 censor, 6 event]: S = 2/3 on [2,6), 0 after
  private val mixed = Seq(("g", 2L, true), ("g", 4L, false),
    ("g", 6L, true))

  test("hand-computed: head 2 days at S=1, then 4 days at " +
      "floor(2/3·1e9), zero after the last event — τ=10") {
    val r = run(10L, mixed: _*).collect()(0)
    // 2·1e9 + 666666666·(4−2) + 666666666·(6−4) + 0·(10−6)
    assert(r.getAs[Long]("rmst_nano") ==
      2000000000L + 666666666L * 4)
    assert(r.getAs[Long]("tau") == 10L)
    assert(r.getAs[Long]("n_times") == 3L)
    assert(r.getAs[Double]("rmst_days") == 4.666666664)
  }

  test("τ clips segments mid-step: τ=5 cuts the censoring step at " +
      "one day and drops everything beyond") {
    val r = run(5L, mixed: _*).collect()(0)
    // 2·1e9 + 666666666·(4−2) + 666666666·(5−4)
    assert(r.getAs[Long]("rmst_nano") ==
      2000000000L + 666666666L * 3)
  }

  test("τ before the first event time: the area is τ at S=1 exactly") {
    val r = run(2L, mixed: _*).collect()(0)
    assert(r.getAs[Long]("rmst_nano") == 2000000000L)
    assert(r.getAs[Double]("rmst_days") == 2.0)
  }

  test("all events, τ ≥ max duration: RMST equals the sample mean " +
      "up to the one-ulp nano floors") {
    val r = run(100L, ("g", 1L, true), ("g", 2L, true),
      ("g", 3L, true)).collect()(0)
    // mean = 2; 1·1e9 + 666666666·1 + 333333333·1 = 1999999999
    assert(r.getAs[Long]("rmst_nano") == 1999999999L)
  }

  test("groups are independent, and a group whose subjects all " +
      "outlive τ accrues exactly τ") {
    val out = run(3L,
      ("a", 2L, true), ("a", 9L, true),
      ("b", 7L, false), ("b", 8L, false))
      .orderBy("g").collect()
    // a: 2 days at 1 + 1 day at 1/2 = 2.5
    assert(out(0).getAs[Long]("rmst_nano") == 2500000000L)
    // b: first step at t=7 > τ — the head segment alone covers [0,τ)
    assert(out(1).getAs[Long]("rmst_nano") == 3000000000L)
  }

  test("agreement with kaplanMeier: integrating the emitted curve " +
      "naively (rounded survival) matches rmst_days within 1e-5 on " +
      "a 60-subject mixed fixture") {
    val rows = (1 to 60).map(i =>
      ("g", (i * 7 % 23 + 1).toLong, i % 3 != 0))
    val tau = 15L
    val km = Analytics.kaplanMeier(subjects(rows: _*), "g",
        col("t"), col("e")).orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Double]("survival")))
    val ts = km.map(_._1)
    val naive = {
      val head = math.min(ts.head, tau).toDouble
      val body = km.zipWithIndex.map { case ((t, s), i) =>
        val nt = if (i + 1 < ts.length) ts(i + 1) else tau
        s * math.max(0L, math.min(nt, tau) - t)
      }.sum
      head + body
    }
    val r = run(tau, rows: _*).collect()(0)
    assert(math.abs(r.getAs[Double]("rmst_days") - naive) < 1e-5,
      s"naive=$naive got=${r.getAs[Double]("rmst_days")}")
  }
}
