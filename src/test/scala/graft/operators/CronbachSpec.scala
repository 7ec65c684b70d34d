package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.cronbachAlpha]] — hand-computed α on perfectly
  * parallel items, independent items, a sign-flipped item, the
  * complete-case drop, and the q314 quality-scale audit on the real
  * corpus.
  */
class CronbachSpec extends SparkSpec {

  private def items(rows: (String, Long, Long, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("i1", LongType),
      StructField("i2", LongType),
      StructField("i3", LongType))),
    rows.map { case (g, a, b, c) => Row(g, a, b, c) })

  private def ca(rows: (String, Long, Long, Long)*) =
    Analytics.cronbachAlpha(items(rows: _*), Seq("g"),
      Seq("i1" -> col("i1"), "i2" -> col("i2"), "i3" -> col("i3")))

  test("perfectly parallel items (identical columns): " +
      "var_ratio = k*var/(k^2*var) = 1/3, alpha = 1") {
    val out = ca(("g", 1L, 1L, 1L), ("g", 5L, 5L, 5L),
      ("g", 9L, 9L, 9L)).head()
    assert(out.getDouble(3) ==
      BigDecimal(1.0 / 3.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getDouble(4) == 1.0)
  }

  test("a sign-flipped item drives alpha negative") {
    val out = ca(("g", 1L, 1L, 9L), ("g", 5L, 5L, 5L),
      ("g", 9L, 9L, 1L)).head()
    assert(out.getDouble(4) < 0.0)
  }

  test("hand-computed mixed case: exact alpha from the integer " +
      "moment identity") {
    val rows = Seq(("g", 2L, 3L, 1L), ("g", 4L, 5L, 2L),
      ("g", 6L, 6L, 5L), ("g", 8L, 9L, 6L))
    val out = ca(rows: _*).head()
    def varNum(xs: Seq[Long]): BigInt = {
      val n = BigInt(xs.size)
      n * xs.map(x => BigInt(x) * x).sum -
        BigInt(xs.sum) * BigInt(xs.sum)
    }
    val i1 = rows.map(_._2); val i2 = rows.map(_._3)
    val i3 = rows.map(_._4)
    val tot = rows.map(r => r._2 + r._3 + r._4)
    val ratio = (varNum(i1) + varNum(i2) + varNum(i3)).toDouble /
      varNum(tot).toDouble
    val alpha = 1.5 * (1.0 - ratio)
    assert(out.getDouble(4) ==
      BigDecimal(alpha).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("rows with a null item drop (complete-case)") {
    val withNull = items(("g", 1L, 2L, 3L), ("g", 4L, 5L, 6L))
      .union(df(
        StructType(Seq(
          StructField("g", StringType),
          StructField("i1", LongType),
          StructField("i2", LongType),
          StructField("i3", LongType))),
        Seq(Row("g", 7L, null, 9L))))
    val out = Analytics.cronbachAlpha(withNull, Seq("g"),
      Seq("i1" -> col("i1"), "i2" -> col("i2"), "i3" -> col("i3")))
      .head()
    assert(out.getLong(1) == 2L)
  }

  test("q314 on the real corpus: a defined alpha per language and " +
      "the var_ratio/alpha identity holds") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .qualityReliabilityQ(spark, "/root/testdata/sf0.001").collect()
      assert(rows.length == 5)
      rows.foreach { r =>
        assert(!r.isNullAt(4))
        val alpha = r.getDouble(4); val ratio = r.getDouble(3)
        assert(math.abs(alpha - 1.5 * (1.0 - ratio)) < 2e-6,
          s"identity broke: $alpha vs ${1.5 * (1.0 - ratio)}")
      }
    }
  }
}
