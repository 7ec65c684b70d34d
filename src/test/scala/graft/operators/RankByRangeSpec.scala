package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range-partitioned two-pass rank ([[Analytics.rankByRange]]) and
  * ntile ([[Analytics.ntileByRange]]) — the skew-safe replacements for
  * per-group rank windows over low-cardinality groups.
  */
class RankByRangeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("g", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def data = {
    val rng = new scala.util.Random(11)
    df(schema, (0 until 500).map { i =>
      val g = i % 7 match {
        case 0 => null
        case 1 | 2 | 3 | 4 => "big" // dominant group
        case 5 => "mid"
        case _ => "small"
      }
      val v: java.lang.Double =
        if (i % 19 == 0) null else rng.nextDouble() * 100
      Row(i, g, v)
    })
  }

  private val ord = Seq(col("v").asc, col("id").asc)

  test("rankByRange equals the row_number window form on multi-group " +
      "data with null groups and null order keys, at several slice " +
      "counts") {
    val w = Window.partitionBy("g").orderBy(ord: _*)
    val want = data.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    for (parts <- Seq(1, 3, 17)) {
      val got = Analytics.rankByRange(data, Seq("g"), ord, "r",
          numPartitions = parts)
        .select("id", "r").collect().map(r => r.getInt(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"numPartitions=$parts")
    }
  }

  test("ntileByRange equals the ntile window form for k of 1, 3, 10, " +
      "and k larger than the smallest group") {
    val w = Window.partitionBy("g").orderBy(ord: _*)
    for (k <- Seq(1, 3, 10, 200)) {
      val want = data.withColumn("b", ntile(k).over(w))
        .select("id", "b").collect().map(r => r.getInt(0) -> r.getInt(1))
        .toMap
      val got = Analytics.ntileByRange(data, Seq("g"), ord, k, "b",
          numPartitions = 5)
        .select("id", "b").collect().map(r => r.getInt(0) -> r.getInt(1))
        .toMap
      assert(got == want, s"k=$k")
    }
  }

  test("plan: no window sorts the data partitioned by the group alone " +
      "— every data-bearing window is sliced by the range partition id") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val out = Analytics.rankByRange(data, Seq("g"), ord, "r",
      numPartitions = 8)
    assert(out.count() == 500)
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => Seq(other)
    }.flatten
    val windows = unwrap(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val partNames = w.partitionSpec.flatMap(_.collect {
        case a: AttributeReference => a.name
      }).toSet
      // group-only partitioning over the raw data is the naive shape;
      // allowed windows are (group, __pid) over slices or __g_-keyed
      // over the narrow count table
      assert(partNames != Set("g"),
        s"window partitioned by the group alone: $partNames")
    }
  }

  test("rankByRange with MULTI-column group keys (null components " +
      "included) equals the window form") {
    val multi = df(
      StructType(Seq(
        StructField("id", IntegerType),
        StructField("g1", StringType, nullable = true),
        StructField("g2", IntegerType, nullable = true),
        StructField("v", DoubleType))),
      (0 until 300).map { i =>
        Row(i,
          if (i % 4 == 0) null else s"s${i % 3}",
          if (i % 5 == 0) null else Integer.valueOf(i % 2),
          (i * 37 % 97).toDouble)
      })
    val mOrd = Seq(col("v").asc, col("id").asc)
    val w = Window.partitionBy("g1", "g2").orderBy(mOrd: _*)
    val want = multi.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val got = Analytics.rankByRange(multi, Seq("g1", "g2"), mOrd, "r",
        numPartitions = 9)
      .select("id", "r").collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(got == want)
  }

  test("a single dominant group still ranks correctly across slices " +
      "(the shape that dies in one window-sort task)") {
    val one = df(schema,
      (0 until 2000).map(i => Row(i, "only", (2000 - i).toDouble)))
    val got = Analytics.rankByRange(one, Seq("g"),
        Seq(col("v").asc, col("id").asc), "r", numPartitions = 13)
      .where(col("r") <= 3).orderBy("r")
      .select("id").collect().map(_.getInt(0)).toSeq
    // v = 2000 - i: smallest v at the largest id
    assert(got == Seq(1999, 1998, 1997))
  }
}
