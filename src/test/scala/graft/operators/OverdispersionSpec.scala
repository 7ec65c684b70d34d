package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.overdispersion]] — hand/naive-computed moments, the
  * Poisson-vs-clumped split, the var ≤ mean null contract, and the
  * n ≥ 2 drop.
  */
class OverdispersionSpec extends SparkSpec {

  private def frame(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("v", LongType))),
    rows.map { case (g, v) => Row(g, v) })

  private def run(rows: (String, Long)*) =
    Analytics.overdispersion(frame(rows: _*), Seq("g"), col("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap

  private def naive(vs: Seq[Long]) = {
    val n = vs.size.toDouble
    val mean = vs.sum.toDouble / n
    val vr = (n * vs.map(v => BigInt(v) * v).sum.toDouble -
      vs.sum.toDouble * vs.sum.toDouble) / (n * (n - 1.0))
    (mean, vr)
  }

  test("naive replication of every floored statistic on a clumped " +
      "sample") {
    val vs = Seq(10L, 30L, 10L, 30L, 10L, 30L, 100L)
    val r = run(vs.map(("g", _)): _*)("g")
    val (mean, vr) = naive(vs)
    assert(r.getAs[Long]("mean_milli") ==
      math.floor(mean * 1000.0).toLong)
    assert(r.getAs[Long]("dispersion_micro") ==
      math.floor(vr / mean * 1e6).toLong)
    assert(r.getAs[Long]("nb_r_milli") ==
      math.floor(mean * mean / (vr - mean) * 1000.0).toLong)
    assert(r.getAs[Long]("nb_p_micro") ==
      math.floor(mean / vr * 1e6).toLong)
    assert(r.getAs[Long]("total") == vs.sum)
  }

  test("equidispersed-or-under samples get a null NB fit; the " +
      "dispersion index still reads") {
    // constant counts: var 0, mean 7 -> D = 0, no NB
    val r = run((1 to 6).map(_ => ("g", 7L)): _*)("g")
    assert(r.getAs[Long]("dispersion_micro") == 0L)
    assert(r.isNullAt(r.fieldIndex("nb_r_milli")))
    assert(r.isNullAt(r.fieldIndex("nb_p_micro")))
  }

  test("a clumped series reads D >> 1e6 micro while a smooth one " +
      "reads near 1e6") {
    // Poisson-ish: small jitter around 50 -> D well under 1e6;
    // clumped: alternating 10/200 -> D far over
    val smooth = (1 to 30).map(i => ("s", 49L + i % 3))
    val clumped = (1 to 30).map(i =>
      ("c", if (i % 2 == 0) 10L else 200L))
    val out = run((smooth ++ clumped): _*)
    assert(out("s").getAs[Long]("dispersion_micro") < 100000L)
    assert(out("c").getAs[Long]("dispersion_micro") > 10000000L)
    assert(out("c").getAs[Long]("nb_r_milli") > 0L)
  }

  test("groups with fewer than 2 cells are dropped (variance " +
      "undefined)") {
    val out = run(("solo", 5L), ("pair", 5L), ("pair", 6L))
    assert(out.keySet == Set("pair"))
  }
}
