package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric profiler ([[Analytics.numericProfile]]) and CDC apply
  * ([[Analytics.applyChanges]]).
  */
class ProfileCdcSpec extends SparkSpec {

  private val numSchema = StructType(Seq(
    StructField("a", DoubleType, nullable = true),
    StructField("b", IntegerType, nullable = true)))

  test("profile: one row per column with exact counts and stats") {
    val d = df(numSchema, Seq(
      Row(1.0: java.lang.Double, 10: Integer),
      Row(2.0: java.lang.Double, 10: Integer),
      Row(null, null),
      Row(3.0: java.lang.Double, 30: Integer)))
    val out = Analytics.numericProfile(d, Seq("a", "b"))
      .orderBy("column_name").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getString(0) == "a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 1L && a.getLong(3) == 3L)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 3.0)
    assert(a.getDouble(6) == 2.0) // mean of 1,2,3
    assert(a.getDouble(7) == 1.0) // sample stddev of 1,2,3
    val b = out(1)
    assert(b.getLong(3) == 2L) // distinct 10, 30
  }

  test("profile is a single aggregation: one scan in the plan") {
    val d = df(numSchema, Seq(Row(1.0: java.lang.Double, 1: Integer)))
    val plan = Analytics.numericProfile(d, Seq("a", "b"),
        exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert("Scan ExistingRDD".r.findAllIn(plan).length == 1, plan)
  }

  private val snapSchema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("v", StringType, nullable = true)))
  private val feedSchema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("v", StringType, nullable = true),
    StructField("op", StringType),
    StructField("ord", IntegerType)))

  private def apply(
      snap: Seq[(Int, String)], feed: Seq[(Int, String, String, Int)])
    : Map[Int, String] =
    Analytics.applyChanges(
        df(snapSchema, snap.map { case (k, v) => Row(k, v) }),
        df(feedSchema, feed.map { case (k, v, o, t) => Row(k, v, o, t) }),
        Seq("k"), "op", "ord", baseOrd = lit(0))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("update replaces, insert adds, delete removes, untouched stays") {
    val out = apply(
      snap = Seq(1 -> "old", 2 -> "keep", 3 -> "gone"),
      feed = Seq((1, "new", "U", 1), (4, "born", "I", 1),
        (3, null, "D", 1)))
    assert(out == Map(1 -> "new", 2 -> "keep", 4 -> "born"))
  }

  test("latest change per key wins; re-insert after delete resurrects") {
    val out = apply(
      snap = Seq(1 -> "v0"),
      feed = Seq((1, "v1", "U", 1), (1, null, "D", 2),
        (1, "v3", "I", 3), (1, "v2", "U", 2)))
    // ord 3 insert is latest → resurrected with v3 (the same-ord-2
    // delete beats the ord-2 update but both lose to ord 3)
    assert(out == Map(1 -> "v3"))
  }

  test("same-instant delete + upsert: delete wins deterministically") {
    val out = apply(
      snap = Seq(1 -> "v0", 2 -> "v0"),
      feed = Seq((1, "vX", "U", 5), (1, null, "D", 5),
        (2, null, "D", 5), (2, "vY", "U", 5)))
    assert(out == Map.empty)
  }

  test("delete of a never-seen key is a no-op") {
    val out = apply(
      snap = Seq(1 -> "v0"),
      feed = Seq((9, null, "D", 1)))
    assert(out == Map(1 -> "v0"))
  }

  test("ops outside {I,U,D} fail fast instead of silently corrupting " +
      "the snapshot (unknown op would upsert, null op would delete)") {
    val bad = intercept[Exception] {
      apply(snap = Seq(1 -> "v0"), feed = Seq((1, "vX", "X", 1)))
    }
    assert(bad.getMessage.contains("applyChanges: op must be one of"),
      bad.getMessage)
    val nul = intercept[Exception] {
      apply(snap = Seq(1 -> "v0"), feed = Seq((1, "vX", null, 1)))
    }
    assert(nul.getMessage.contains("applyChanges: op must be one of"),
      nul.getMessage)
  }

  test("profile: >53-bit longs keep exact distinct counts and extreme " +
      "selection (no double-cast collision)") {
    val longSchema = StructType(Seq(
      StructField("v", LongType, nullable = true)))
    // adjacent at the top of the long range: identical after a double
    // cast, distinct as longs
    val d = df(longSchema, Seq(
      Row(Long.MaxValue: java.lang.Long),
      Row((Long.MaxValue - 1): java.lang.Long),
      Row((Long.MaxValue - 1): java.lang.Long)))
    val out = Analytics.numericProfile(d, Seq("v")).head()
    assert(out.getAs[Long]("n_distinct") == 2L,
      "double-cast collision collapsed distinct longs")
    val approx = Analytics.numericProfile(d, Seq("v"),
      exactDistinct = false).head()
    assert(approx.getAs[Long]("n_distinct") == 2L)
  }
}
