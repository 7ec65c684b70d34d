package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.groupTrend]] — per-group closed-form OLS from exact
  * decimal sufficient statistics.
  */
class GroupTrendSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("x", LongType),
    StructField("y", LongType)))

  private def run(rows: Seq[Row]) =
    Analytics.groupTrend(df(schema, rows), Seq("k"), "x", "y")
      .orderBy("k").collect()
      .map(r => r.getAs[String]("k") -> r).toMap

  test("perfect line recovers slope, intercept, and r2 = 1") {
    val out = run(Seq(
      Row("a", 0L, 5L), Row("a", 1L, 7L), Row("a", 2L, 9L)))
    val a = out("a")
    assert(a.getAs[Long]("n") == 3L)
    assert(a.getAs[Double]("slope") == 2.0)
    assert(a.getAs[Double]("intercept") == 5.0)
    assert(a.getAs[Double]("r2") == 1.0)
  }

  test("symmetric tent has zero slope and zero r2") {
    val out = run(Seq(
      Row("a", 0L, 0L), Row("a", 1L, 6L), Row("a", 2L, 0L)))
    val a = out("a")
    assert(a.getAs[Double]("slope") == 0.0)
    assert(a.getAs[Double]("intercept") == 2.0) // mean of y
    assert(a.getAs[Double]("r2") == 0.0)
  }

  test("matches the driver-side closed form on irregular data") {
    val pts = Seq((19700L, 101303L), (19711L, 250099L),
      (19730L, 99999L), (19731L, 430001L), (19760L, 7L))
    val out = run(pts.map { case (x, y) => Row("a", x, y) })
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val c = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val slope = c.toDouble / vx.toDouble
    val intercept = (sy.toDouble - slope * sx.toDouble) / n
    val r2 = (c.toDouble * c.toDouble) / (vx.toDouble * vy.toDouble)
    val a = out("a")
    assert(a.getAs[Double]("slope") == slope)
    assert(a.getAs[Double]("intercept") == intercept)
    assert(a.getAs[Double]("r2") == r2)
  }

  test("degenerate groups guard to null: single point, zero x-variance, zero y-variance") {
    val out = run(Seq(
      Row("one", 5L, 10L),
      Row("samex", 3L, 1L), Row("samex", 3L, 9L),
      Row("samey", 0L, 4L), Row("samey", 10L, 4L)))
    val one = out("one")
    assert(one.getAs[Long]("n") == 1L)
    assert(one.isNullAt(one.fieldIndex("slope")))
    assert(one.isNullAt(one.fieldIndex("r2")))
    val samex = out("samex")
    assert(samex.isNullAt(samex.fieldIndex("slope")))
    val samey = out("samey")
    assert(samey.getAs[Double]("slope") == 0.0) // flat line fits exactly
    assert(samey.getAs[Double]("intercept") == 4.0)
    assert(samey.isNullAt(samey.fieldIndex("r2"))) // vy = 0
  }

  test("null x or y rows are excluded; groups are independent") {
    val out = run(Seq(
      Row("a", 0L, 0L), Row("a", 1L, 2L), Row("a", null, 99L),
      Row("a", 9L, null),
      Row("b", 0L, 100L), Row("b", 1L, 90L)))
    assert(out("a").getAs[Long]("n") == 2L)
    assert(out("a").getAs[Double]("slope") == 2.0)
    assert(out("b").getAs[Double]("slope") == -10.0)
  }
}
