package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.coxPh]] — a full naive-Scala replication of both
  * quantized Newton steps, the planted-hazard direction, the
  * constant-covariate degenerate, and approximate sign symmetry.
  */
class CoxPhSpec extends SparkSpec {

  private def frame(rows: (String, Long, Boolean, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("t", LongType),
      StructField("e", BooleanType),
      StructField("x", LongType))),
    rows.map { case (g, t, e, x) => Row(g, t, e, x) })

  private def run(rows: (String, Long, Boolean, Long)*) =
    Analytics.coxPh(frame(rows: _*), "g", col("t"), col("e"),
        col("x")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap

  /** Independent replication of the two quantized Newton steps. */
  private def naive(rows: Seq[(Long, Boolean, Long)]): (Long, Option[Long]) = {
    def derivs(b: Double): (Long, Long) = {
      val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
      val terms = byT.map { case (t, rs) =>
        val wn = rs.map { case (_, _, xm) =>
          val x = xm.toDouble / 1000.0
          (math.floor(math.exp(b * x) * 1e9).toLong,
            math.floor(x * math.exp(b * x) * 1e9).toLong,
            math.floor(x * x * math.exp(b * x) * 1e9).toLong)
        }
        val d = rs.count(_._2).toLong
        val sxe = rs.filter(_._2).map(_._3).sum
        (t, d, sxe, wn.map(_._1).sum, wn.map(_._2).sum,
          wn.map(_._3).sum)
      }
      var (g, h) = (0L, 0L)
      for (i <- terms.indices) {
        val (_, d, sxe, _, _, _) = terms(i)
        val s0 = terms.drop(i).map(_._4).sum
        val s1 = terms.drop(i).map(_._5).sum
        val s2 = terms.drop(i).map(_._6).sum
        val r1 = s1.toDouble / s0.toDouble
        val r2 = s2.toDouble / s0.toDouble
        g += sxe * 1000000L
        if (d > 0) {
          g -= math.floor(d.toDouble * r1 * 1e9).toLong
          h += math.floor(d.toDouble * (r2 - r1 * r1) * 1e9).toLong
        }
      }
      (g, h)
    }
    val (g0, h0) = derivs(0.0)
    val b1n = if (h0 > 0)
      math.floor(g0.toDouble / h0.toDouble * 1e9).toLong else 0L
    val (g1, h1) = derivs(b1n.toDouble / 1e9)
    (b1n, if (h1 > 0)
      Some(b1n + math.floor(g1.toDouble / h1.toDouble * 1e9).toLong)
    else None)
  }

  private val planted: Seq[(String, Long, Boolean, Long)] =
    // x = 1 subjects fail early; x = 0 subjects censor late
    (1 to 8).map(i => ("g", i.toLong, true, 1000L)) ++
      (1 to 8).map(i => ("g", (20 + i).toLong, false, 0L)) ++
      (1 to 2).map(i => ("g", (15 + i).toLong, true, 0L))

  test("naive replication of both Newton steps on the planted " +
      "fixture") {
    val r = run(planted: _*)("g")
    val (b1n, b2n) = naive(planted.map(p => (p._2, p._3, p._4)))
    assert(r.getAs[Long]("beta1_nano") == b1n)
    assert(Option(r.getAs[Any]("beta_nano")).map(_.asInstanceOf[Long])
      == b2n)
    assert(r.getAs[Long]("n_events") == 10L)
  }

  test("planted hazard reads a clearly positive beta and hazard " +
      "ratio > 1") {
    val r = run(planted: _*)("g")
    assert(r.getAs[Long]("beta_nano") > 500000000L) // beta > 0.5
    assert(r.getAs[Double]("hazard_ratio") > 1.5)
  }

  test("constant covariate: gradient and hessian vanish exactly -> " +
      "beta1 0, beta null") {
    val rows = (1 to 10).map(i =>
      ("g", i.toLong, i % 2 == 0, 500L))
    val r = run(rows: _*)("g")
    assert(r.getAs[Long]("beta1_nano") == 0L)
    assert(r.isNullAt(r.fieldIndex("beta_nano")))
  }

  test("negating the covariate approximately negates beta") {
    val pos = run(planted: _*)("g").getAs[Long]("beta_nano")
    val neg = run(planted.map(p => p.copy(_4 = -p._4)): _*)("g")
      .getAs[Long]("beta_nano")
    assert(math.abs(pos + neg) < 1000000L) // within 1e-3 of mirror
  }

  test("groups fit independently") {
    val rows = planted ++ planted.map(p => p.copy(_1 = "h"))
    val out = run(rows: _*)
    assert(out("g").getAs[Long]("beta_nano") ==
      out("h").getAs[Long]("beta_nano"))
  }
}
