package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class CrossCorrelationSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String)]) = df(
    StructType(Seq(
      StructField("ts", TimestampType),
      StructField("kind", StringType))),
    rows.map { case (sec, k) =>
      Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(sec)), k)
    })

  private def xc(rows: Seq[(Long, String)], maxLag: Int = 2) =
    Analytics.crossCorrelation(ev(rows), "ts", "kind", "a", "b",
        bucketSeconds = 10L, maxLag = maxLag)
      .collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap

  test("a perfectly lagged copy peaks at exactly that lag") {
    // b mirrors a's bucket counts one bucket later: buckets 0..5
    // a counts: 3,1,2,0,1,0 ; b counts: 0,3,1,2,0,1
    val a = Seq.fill(3)(5L) ++ Seq(15L) ++ Seq.fill(2)(25L) ++
      Seq(45L)
    val b = Seq.fill(3)(15L) ++ Seq(25L) ++ Seq.fill(2)(35L) ++
      Seq(55L)
    val out = xc(a.map(_ -> "a") ++ b.map(_ -> "b"))
    assert(out(1L)._2.exists(c => math.abs(c - 1.0) < 1e-9),
      s"lag 1 should be a perfect match, got ${out(1L)}")
    assert(out(0L)._2.forall(c => c < 0.999))
  }

  test("gap buckets count as zeros, not missing alignment rows") {
    // events only in buckets 0 and 4: the grid spans 0..4, so each
    // lag-0 pair set has 5 buckets
    val out = xc(Seq((0L, "a"), (0L, "b"), (40L, "a"), (40L, "b")))
    assert(out(0L)._1 === 5L)
    // a == b everywhere (incl. the zero gaps): perfect correlation
    assert(out(0L)._2.exists(c => math.abs(c - 1.0) < 1e-9))
  }

  test("zero-variance windows yield null correlation, not NaN rows " +
      "that differ by engine") {
    // a is constant 1 per bucket; corr undefined
    val out = xc(Seq((0L, "a"), (10L, "a"), (20L, "a"), (0L, "b"),
      (10L, "b"), (10L, "b")), maxLag = 0)
    assert(out(0L)._2.isEmpty ||
      out(0L)._2.exists(_.isNaN))
  }

  test("lag windows shrink at the edges: |pairs| = buckets - |lag|") {
    val rows = (0L until 6L).flatMap(i =>
      Seq((i * 10, "a"), (i * 10, "b"), (i * 10 + 1, "b")))
    val out = xc(rows, maxLag = 2)
    assert(out(2L)._1 === 4L)
    assert(out(-2L)._1 === 4L)
    assert(out(0L)._1 === 6L)
  }
}
