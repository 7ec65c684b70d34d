package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PSI distribution drift ([[Drift.psiBins]]). */
class DriftSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("v", DoubleType, nullable = true)))

  private def vals(xs: Seq[Double]) =
    df(schema, xs.map(x => Row(x: java.lang.Double)))

  test("identical distributions give PSI ~ 0 in every bin") {
    val xs = (1 to 1000).map(_.toDouble)
    val out = Drift.psiBins(vals(xs), vals(xs), "v", bins = 10)
      .collect()
    assert(out.length == 10)
    // identical snapshots: p_base == p_cur exactly → every term 0
    assert(out.forall(_.getAs[Double]("psi_term") == 0.0))
  }

  test("a shifted distribution produces a large PSI") {
    val base = (1 to 1000).map(_.toDouble)
    val shifted = base.map(_ + 800.0)
    val psi = Drift.psiBins(vals(base), vals(shifted), "v", 10)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(psi > 0.25, s"expected major-shift PSI, got $psi")
  }

  test("baseline bins itself near-uniformly (deciles by construction)") {
    val base = (1 to 1000).map(_.toDouble)
    val out = Drift.psiBins(vals(base), vals(base), "v", 10)
      .collect()
    assert(out.forall(r => math.abs(r.getAs[Long]("n_base") - 100L) <= 1))
  }

  test("empty current bins stay finite via smoothing") {
    val base = (1 to 100).map(_.toDouble)
    val narrow = Seq.fill(100)(50.5) // all mass in one bin
    val out = Drift.psiBins(vals(base), vals(narrow), "v", 10)
      .collect()
    assert(out.count(_.getAs[Long]("n_cur") == 0L) == 9)
    assert(out.forall(r => !r.getAs[Double]("psi_term").isNaN &&
      !r.getAs[Double]("psi_term").isInfinite))
  }

  test("bounded-state default equals exact mode when the deciles land " +
      "on data values") {
    // 0..100: (n-1)*p is an integer for every decile, so the exact
    // interpolated edge IS a data value; GK at accuracy 10000 returns
    // the same value → identical bins, counts, and PSI terms
    val base = (0 to 100).map(_.toDouble)
    val cur = (0 to 100).map(x => (x * 7 % 101).toDouble)
    val approx = Drift.psiBins(vals(base), vals(cur), "v", 10)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    val ex = Drift.psiBins(vals(base), vals(cur), "v", 10, exact = true)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(approx == ex)
  }

  test("nulls are excluded from both sides") {
    val d = df(schema,
      Seq(Row(1.0: java.lang.Double), Row(null), Row(2.0: java.lang.Double)))
    val out = Drift.psiBins(d, d, "v", 2)
    assert(out.agg(sum("n_base")).head().getLong(0) == 2L)
  }
}
