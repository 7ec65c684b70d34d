package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Drift.mannWhitneyU]] — closed-form rank sums, tie averaging
  * against a naive reference, and the one-sided / degenerate
  * contracts inherited from [[Drift.ksTest]].
  */
class MannWhitneySpec extends SparkSpec {

  import spark.implicits._

  private def mw(base: Seq[Double], cur: Seq[Double],
      zAlpha: Double = 1.96) = {
    val b = base.map(v => ("g", v)).toDF("g", "v")
    val c = cur.map(v => ("g", v)).toDF("g", "v")
    Drift.mannWhitneyU(b, c, "v", Seq("g"), zAlpha).collect()(0)
  }

  test("closed form: fully separated samples score U = 0 and " +
      "z = -4.5/sqrt(5.25)") {
    val r = mw(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
    assert(r.getAs[Long]("n_base") === 3L)
    assert(r.getAs[Long]("n_cur") === 3L)
    // ranks of baseline are 1,2,3 → R1 = 6, U = 6 − 6 = 0
    assert(r.getAs[Long]("u_half") === 0L)
    assert(r.getAs[Double]("u") === 0.0)
    val wantZ = (0.0 - 4.5) / math.sqrt(3.0 * 3.0 / 12.0 * 7.0)
    assert(math.abs(r.getAs[Double]("z") - wantZ) < 1e-6)
    assert(r.getAs[Boolean]("drifted")) // |z| ≈ 1.964 > 1.96
  }

  test("tie averaging matches the naive average-rank reference") {
    val base = Seq(1.0, 2.0, 2.0, 3.0)
    val cur = Seq(2.0, 3.0, 3.0, 5.0)
    val all = (base.map((_, 1)) ++ cur.map((_, 0))).sortBy(_._1)
    // naive average ranks over the pooled sorted sample
    val avgRank = all.map(_._1).distinct.map { v =>
      val idx = all.zipWithIndex.filter(_._1._1 == v).map(_._2 + 1)
      v -> idx.sum.toDouble / idx.size
    }.toMap
    val r1 = base.map(avgRank).sum
    val u1 = r1 - base.size * (base.size + 1) / 2.0
    val r = mw(base, cur)
    assert(r.getAs[Long]("u_half") === (2 * u1).round)
    assert(r.getAs[Double]("u") === u1)
  }

  test("a one-sided group is flagged with null z") {
    val b = Seq(("g", 1.0), ("h", 2.0)).toDF("g2", "v")
      .withColumnRenamed("g2", "g")
    val c = Seq(("g", 3.0)).toDF("g", "v")
    val rows = Drift.mannWhitneyU(b, c, "v", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    val h = rows("h")
    assert(h.getAs[Boolean]("drifted"))
    assert(h.isNullAt(h.fieldIndex("z")))
    assert(h.isNullAt(h.fieldIndex("u_half")))
    assert(!rows("g").isNullAt(rows("g").fieldIndex("u_half")))
  }

  test("all-tied samples (zero variance) yield null z, not drifted") {
    val r = mw(Seq(7.0, 7.0), Seq(7.0, 7.0, 7.0))
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(!r.getAs[Boolean]("drifted"))
    // u_half is still well-defined: one tie block of 5 → rank2 = 6
    assert(r.getAs[Long]("u_half") === 2L * 6 - 2 * 3)
  }

  test("billions-scale counts stay exact: the rank sum and n1(n1+1) " +
      "compute in decimal, past 2^63") {
    // via the pre-aggregated entry: 4e9 baseline rows all at value 1,
    // 4e9 current rows all at value 2. The rank-sum product
    // cb·rank2 = 4e9·(4e9+1) ≈ 1.6e19 exceeds Long.MaxValue — the old
    // BIGINT accumulation wrapped (or threw under ANSI); in decimal
    // the complete separation lands exactly at u_half = 0.
    val n = 4_000_000_000L
    val base = Seq(("g", 1.0, n)).toDF("g", "v", "c")
    val cur = Seq(("g", 2.0, n)).toDF("g", "v", "c")
    val r = Drift.mannWhitneyUFromCounts(base, cur, "v", "c", Seq("g"))
      .collect()(0)
    assert(r.getAs[Long]("n_base") === n)
    assert(r.getAs[Long]("u_half") === 0L)
    assert(r.getAs[Double]("u") === 0.0)
    assert(r.getAs[Double]("z") < -1000.0) // complete separation
    assert(r.getAs[Boolean]("drifted"))
  }

  test("symmetry: swapping the samples negates z") {
    val a = Seq(1.0, 3.0, 5.0, 7.0)
    val b = Seq(2.0, 4.0, 6.0, 8.0)
    val z1 = mw(a, b).getAs[Double]("z")
    val z2 = mw(b, a).getAs[Double]("z")
    assert(math.abs(z1 + z2) < 1e-9)
  }
}
