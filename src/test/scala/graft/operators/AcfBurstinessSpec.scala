package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.autocorrelation]] and [[Analytics.burstiness]] —
  * closed-form rational ACFs, zero-fill semantics, and degenerate
  * contracts over synthetic hourly streams.
  */
class AcfBurstinessSpec extends SparkSpec {

  import spark.implicits._

  /** counts(k) events in hour k for type `ty`. */
  private def stream(ty: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)((ty, h.toLong * 3600L))
    }.toDF("event_type", "sec")
      .select(col("event_type"), col("sec").cast("timestamp").as("ts"))

  test("closed-form ACF of an alternating series is exactly " +
      "rational") {
    // counts 3,1,3,1: devs ±1 around mean 2 → r1 = −3/4, r2 = 2/4
    val out = Analytics.autocorrelation(stream("a", Seq(3, 1, 3, 1)),
      "ts", "event_type", maxLag = 2).collect()
      .map(r => r.getAs[Int]("lag") -> r).toMap
    assert(out(1).getAs[Double]("r") === -0.75)
    assert(out(1).getAs[Long]("n_pairs") === 3L)
    assert(out(2).getAs[Double]("r") === 0.5)
    assert(out(2).getAs[Long]("n_buckets") === 4L)
  }

  test("silent hours are zero-filled, not skipped") {
    // events in hours 0 and 2 only → series [1,0,1], NOT [1,1]:
    // r1 = −4/6 with the gap, +... without it the lag alignment lies
    val out = Analytics.autocorrelation(stream("a", Seq(1, 0, 1)),
      "ts", "event_type", maxLag = 1).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_buckets") === 3L)
    assert(out(0).getAs[Double]("r") === -0.666667)
  }

  test("a constant series has null ACF (zero variance), per type " +
      "independently") {
    val df = stream("flat", Seq(2, 2, 2, 2))
      .unionByName(stream("wave", Seq(3, 1, 3, 1)))
    val out = Analytics.autocorrelation(df, "ts", "event_type",
      maxLag = 1).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("flat").isNullAt(out("flat").fieldIndex("r")))
    assert(out("wave").getAs[Double]("r") === -0.75)
  }

  test("burstiness closed form: Fano and Goh–Barabási B") {
    val out = Analytics.burstiness(stream("a", Seq(3, 1, 3, 1)),
      "ts", "event_type").collect()(0)
    assert(out.getAs[Long]("n_buckets") === 4L)
    assert(out.getAs[Long]("n_events") === 8L)
    assert(out.getAs[Double]("mean_rate") === 2.0)
    // nQ − S² = 80 − 64 = 16; fano = 16/(3·8)
    assert(out.getAs[Double]("fano") === 0.666667)
    val sigma = math.sqrt(16.0 / (4.0 * 3.0))
    val want = (sigma - 2.0) / (sigma + 2.0)
    assert(math.abs(out.getAs[Double]("burstiness") - want) < 1e-6)
  }

  test("degenerate streams: single bucket → null fano/burstiness; " +
      "a paced stream scores below a clumped one") {
    val single = Analytics.burstiness(stream("s", Seq(5)), "ts",
      "event_type").collect()(0)
    assert(single.isNullAt(single.fieldIndex("fano")))
    assert(single.isNullAt(single.fieldIndex("burstiness")))
    val paced = Analytics.burstiness(stream("p", Seq(2, 2, 2, 2, 2, 2)),
      "ts", "event_type").collect()(0)
    // one trailing event pins the observed range to 6 buckets (the
    // grid spans [min, max] of OBSERVED events)
    val clumped = Analytics.burstiness(
      stream("c", Seq(11, 0, 0, 0, 0, 1)), "ts", "event_type")
      .collect()(0)
    // constant pacing: σ = 0 → B = −1; one-burst stream → B near +
    assert(paced.getAs[Double]("burstiness") === -1.0)
    assert(clumped.getAs[Double]("fano") >
      paced.getAs[Double]("fano"))
    assert(clumped.getAs[Double]("burstiness") > 0.0)
  }
}
