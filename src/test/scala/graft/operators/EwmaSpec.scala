package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.ewma]] — k-lag adjusted EWMA as a time-ordered fold. */
class EwmaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("k", StringType),
    StructField("ts", TimestampType),
    StructField("v", LongType)))

  private def at(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  private def run(rows: Seq[Row], alpha: Double, lags: Int) =
    Analytics.ewma(df(schema, rows), "k", "ts", "v", alpha, lags,
        tieCols = Seq("id"))
      .orderBy("id").collect()

  /** Driver-side replay of the adjusted-EWMA closed form over the
    * last `lags` values (pandas `ewm(alpha, adjust=True).mean()`).
    */
  private def expected(vals: Seq[Long], alpha: Double, lags: Int): Double = {
    val tail = vals.takeRight(lags)
    val ws = tail.indices.map(i => math.pow(1 - alpha, tail.size - 1 - i))
    tail.indices.map(i => tail(i) * ws(i)).sum / ws.sum
  }

  test("matches the adjusted-EWMA closed form at every prefix") {
    val vals = Seq(100L, 200L, 50L, 400L, 25L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Row(i, "a", at(i * 10L), v)
    }
    val out = run(rows, alpha = 0.5, lags = 20)
    vals.indices.foreach { i =>
      assert(out(i).getAs[Double]("ewma") ==
        expected(vals.take(i + 1), 0.5, 20), s"prefix $i")
      assert(out(i).getAs[Long]("ewma_n") == (i + 1).toLong)
    }
    // first row is its own average
    assert(out(0).getAs[Double]("ewma") == 100.0)
  }

  test("lags truncates the frame: old observations stop contributing") {
    val vals = Seq(1000000L, 100L, 200L, 300L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Row(i, "a", at(i * 10L), v)
    }
    val out = run(rows, alpha = 0.5, lags = 2)
    assert(out(3).getAs[Long]("ewma_n") == 2L)
    assert(out(3).getAs[Double]("ewma") ==
      expected(Seq(200L, 300L), 0.5, 2))
    // the distant spike is fully outside row 3's frame
    assert(out(3).getAs[Double]("ewma") < 300.0)
  }

  test("equal timestamps order by the tie column, keys are independent") {
    val rows = Seq(
      Row(0, "a", at(0), 100L), Row(1, "a", at(0), 300L),
      Row(2, "b", at(0), 7L))
    val out = run(rows, alpha = 0.5, lags = 20)
    // id tie-break: row 1 sees [100, 300], row 0 only itself
    assert(out(0).getAs[Double]("ewma") == 100.0)
    assert(out(1).getAs[Double]("ewma") == expected(Seq(100L, 300L), 0.5, 20))
    assert(out(2).getAs[Double]("ewma") == 7.0)
  }

  test("dyadic alpha over integer values folds exactly: fold equals power-weight sum bit-for-bit") {
    // adversarial magnitudes: the fold stays inside the 53-bit significand
    val vals = Seq(4900200L, 1L, 3L, 2500000L, 7L, 999999L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Row(i, "a", at(i * 10L), v)
    }
    val out = run(rows, alpha = 0.5, lags = 20)
    vals.indices.foreach { i =>
      val tail = vals.take(i + 1)
      val num = tail.indices.map(j =>
        tail(j).toDouble * math.pow(0.5, tail.size - 1 - j)).sum
      val den = tail.indices.map(j =>
        math.pow(0.5, tail.size - 1 - j)).sum
      assert(out(i).getAs[Double]("ewma") == num / den, s"prefix $i")
    }
  }

  test("null ts and null value rows are dropped") {
    val rows = Seq(
      Row(0, "a", at(0), 100L), Row(1, "a", null, 999L),
      Row(2, "a", at(20), null), Row(3, "a", at(30), 200L))
    val out = run(rows, alpha = 0.5, lags = 20)
    assert(out.map(_.getAs[Int]("id")).toSeq == Seq(0, 3))
    assert(out(1).getAs[Double]("ewma") == expected(Seq(100L, 200L), 0.5, 20))
  }
}
