package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AnalyticsSpec extends SparkSpec {

  private val obs = df(
    StructType(Seq(
      StructField("country", StringType),
      StructField("year", IntegerType),
      StructField("value", DoubleType))),
    Seq(
      Row("US", 2021, 1.0), Row("US", 2023, 3.0), Row("US", 2022, 2.0),
      Row("DE", 2023, 9.0), Row("DE", 2023, 8.0), // tie on year
      Row("FR", 2020, 4.0)))

  test("topK keeps k rows by column desc, deterministic tie-break") {
    val out = Analytics.topK(obs, col("value"), 2, col("country"))
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(9.0, 8.0))
  }

  test("topK puts nulls last like pandas nlargest") {
    val d = df(
      StructType(Seq(StructField("v", DoubleType, nullable = true))),
      Seq(Row(1.0), Row(null), Row(2.0)))
    val out = Analytics.topK(d, col("v"), 3).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(2.0), Some(1.0), None))
  }

  test("latestPerGroup keeps one row per group, first-max on ties") {
    val out = Analytics.latestPerGroup(obs, Seq("country"),
      Seq(col("year").desc, col("value").desc))
    assert(out.count() == 3)
    val de = out.filter(col("country") === "DE").head()
    assert(de.getAs[Double]("value") == 9.0)
  }

  test("latestPerGroup survives an input column named __rn (ADVICE r01)") {
    val d = obs.withColumn("__rn", lit("keep-me"))
    val out = Analytics.latestPerGroup(d, Seq("country"),
      Seq(col("year").desc, col("value").desc))
    assert(out.columns.contains("__rn"))
    assert(out.select("__rn").head().getString(0) == "keep-me")
  }

  test("latestPerGroupAgg matches the window variant (max_by form)") {
    // obs has a DE tie on year; value as second max-col resolves it the
    // same way the window's (year desc, value desc) does
    val win = Analytics.latestPerGroup(obs, Seq("country"),
      Seq(col("year").desc, col("value").desc))
      .orderBy("country").collect().map(_.toSeq).toSeq
    val agg = Analytics.latestPerGroupAgg(obs, Seq("country"),
      Seq(col("year"), col("value")))
      .orderBy("country").collect().map(_.toSeq).toSeq
    assert(agg == win)
  }

  test("latestPerGroupAgg preserves the input column order") {
    val out = Analytics.latestPerGroupAgg(obs, Seq("country"),
      Seq(col("year")))
    assert(out.columns.toSeq == obs.columns.toSeq)
  }

  test("facetCounts orders by count desc") {
    val out = Analytics.facetCounts(obs, col("country"), 10).collect()
    assert(out.head.getString(0) == "US")
    assert(out.head.getLong(1) == 3L)
    assert(out.length == 3)
  }

  test("mergeResults keeps both key columns when names differ (pd.merge)") {
    val left = df(
      StructType(Seq(StructField("ck", StringType), StructField("a", IntegerType))),
      Seq(Row("US", 1)))
    val right = df(
      StructType(Seq(StructField("code", StringType), StructField("b", IntegerType))),
      Seq(Row("US", 2)))
    val out = Analytics.mergeResults(left, right, "ck", "code")
    assert(out.columns.toSeq == Seq("ck", "a", "code", "b"))
    assert(out.count() == 1)
  }

  test("mergeResults joins on shared key name without duplication") {
    val left = df(
      StructType(Seq(StructField("k", StringType), StructField("a", IntegerType))),
      Seq(Row("x", 1), Row("y", 2)))
    val right = df(
      StructType(Seq(StructField("k", StringType), StructField("b", IntegerType))),
      Seq(Row("x", 3)))
    val inner = Analytics.mergeResults(left, right, "k", "k")
    assert(inner.columns.count(_ == "k") == 1)
    assert(inner.count() == 1)
    val outer = Analytics.mergeResults(left, right, "k", "k", how = "left")
    assert(outer.count() == 2)
  }

  test("orphanKeys finds fact keys absent from the dimension") {
    val fact = df(
      StructType(Seq(StructField("fk", IntegerType))),
      Seq(Row(1), Row(2), Row(2), Row(9)))
    val dim = df(
      StructType(Seq(StructField("dk", IntegerType))),
      Seq(Row(1), Row(2), Row(3)))
    val out = Analytics.orphanKeys(fact, dim, "fk", "dk")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("unionAll fills missing columns with null (pd.concat)") {
    val a = df(
      StructType(Seq(StructField("x", IntegerType), StructField("y", IntegerType))),
      Seq(Row(1, 2)))
    val b = df(
      StructType(Seq(StructField("x", IntegerType))),
      Seq(Row(3)))
    val out = Analytics.unionAll(Seq(a, b)).orderBy("x")
    assert(out.count() == 2)
    assert(Option(out.collect()(1).get(1)).isEmpty)
  }

  private val trades = df(
    StructType(Seq(
      StructField("sym", StringType),
      StructField("t", IntegerType),
      StructField("px", DoubleType))),
    Seq(Row("A", 10, 100.0), Row("A", 20, 101.0), Row("A", 30, 102.0),
      Row("B", 15, 50.0)))

  private val quotes = df(
    StructType(Seq(
      StructField("sym", StringType),
      StructField("t", IntegerType),
      StructField("qid", IntegerType),
      StructField("bid", DoubleType))),
    Seq(Row("A", 5, 1, 99.0), Row("A", 20, 2, 100.5), Row("A", 25, 3, 101.5),
      Row("B", 99, 4, 49.0)))

  test("asofJoin inclusive picks the latest quote at-or-before each trade") {
    val out = Analytics.asofJoin(trades, quotes, "sym", "t", "t",
      Seq("qid", "bid")).orderBy("sym", "t").collect()
    // A@10 → qid 1; A@20 → qid 2 (equal time included); A@30 → qid 3
    assert(out.map(r => Option(r.getAs[Any]("asof_qid"))).toSeq ==
      Seq(Some(1), Some(2), Some(3), None)) // B@15 has no quote ≤ 15
    assert(out(1).getAs[Double]("asof_bid") == 100.5)
  }

  test("asofJoin strict excludes same-time right rows") {
    val out = Analytics.asofJoin(trades, quotes, "sym", "t", "t",
      Seq("qid", "bid"), strict = true).orderBy("sym", "t").collect()
    // A@20 now sees only qid 1 (t=5), not the t=20 quote
    assert(out.map(r => Option(r.getAs[Any]("asof_qid"))).toSeq ==
      Seq(Some(1), Some(1), Some(3), None))
  }

  test("asofJoin breaks right-time ties by the first right column") {
    val dupQuotes = df(
      StructType(Seq(
        StructField("sym", StringType),
        StructField("t", IntegerType),
        StructField("qid", IntegerType),
        StructField("bid", DoubleType))),
      Seq(Row("A", 5, 1, 99.0), Row("A", 5, 2, 98.0)))
    val out = Analytics.asofJoin(trades, dupQuotes, "sym", "t", "t",
      Seq("qid", "bid")).where(col("t") === 10).head()
    assert(out.getAs[Int]("asof_qid") == 2) // max qid wins the tie
    assert(out.getAs[Double]("asof_bid") == 98.0)
  }

  test("asofJoin carries all right columns from the SAME right row " +
      "(ADVICE r02: no cross-row stitching on nulls)") {
    val quotesWithNull = df(
      StructType(Seq(
        StructField("sym", StringType),
        StructField("t", IntegerType),
        StructField("qid", IntegerType),
        StructField("bid", DoubleType))),
      // latest quote before t=10 has a NULL bid; per-column carry would
      // stitch bid=99.0 from qid 1 next to qid 2
      Seq(Row("A", 5, 1, 99.0), Row("A", 7, 2, null)))
    val out = Analytics.asofJoin(trades, quotesWithNull, "sym", "t", "t",
      Seq("qid", "bid")).where(col("t") === 10).head()
    assert(out.getAs[Int]("asof_qid") == 2)
    assert(Option(out.getAs[Any]("asof_bid")).isEmpty) // same row: null
  }

  test("saltedJoin rejects right/full joins (unmatched rows would " +
      "replicate per salt)") {
    val d = df(
      StructType(Seq(StructField("k", StringType))), Seq(Row("x")))
    intercept[IllegalArgumentException] {
      Analytics.saltedJoin(d, d, "k", how = "right")
    }
    intercept[IllegalArgumentException] {
      Analytics.saltedJoin(d, d, "k", how = "full_outer")
    }
  }

  test("saltedJoin matches the plain join result on skewed keys") {
    val left = df(
      StructType(Seq(StructField("k", StringType), StructField("v", IntegerType))),
      (1 to 50).map(i => Row("hot", i)) ++ Seq(Row("cold", 0)))
    val right = df(
      StructType(Seq(StructField("k", StringType), StructField("w", IntegerType))),
      Seq(Row("hot", 100), Row("cold", 200)))
    val plain = left.join(right, Seq("k")).orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val salted = Analytics.saltedJoin(left, right, "k", salts = 4)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedSum matches direct aggregation") {
    val d = df(
      StructType(Seq(StructField("k", StringType), StructField("v", DoubleType))),
      (1 to 100).map(i => Row(if (i % 10 == 0) "b" else "a", i.toDouble)))
    val direct = d.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    val salted = Analytics.saltedSum(d, Seq("k"), Seq("v"), salts = 4)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("skewSalts surfaces ONLY the report's hot keys, with factors " +
      "from skew_ratio; saltBySalts spreads the hot key's group over " +
      "them while cold keys keep one group") {
    // 900 'hot' rows + 10 cold keys × 10 rows: mean rows/key = 1000/11,
    // hot skew_ratio ≈ 9.9 → ceil 10 salts
    val d = df(
      StructType(Seq(StructField("k", StringType),
        StructField("v", IntegerType))),
      (1 to 900).map(i => Row("hot", i)) ++
        (1 to 10).flatMap(c => (1 to 10).map(i => Row(s"c$c", i))))
    val salts = Analytics.skewSalts(d, "k", minFraction = 0.5,
      exactKeys = true)
    val hot = salts.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hot.keySet == Set("hot"), s"hot keys: ${hot.keySet}")
    assert(hot("hot") == 10, s"salt factor: ${hot("hot")}")
    val groups = Analytics.saltBySalts(d, "k", salts)
      .groupBy("k", "__salt").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val hotGroups = groups.filter(_._1 == "hot")
    assert(hotGroups.length == 10,
      s"hot key must spread over 10 salt groups, got ${hotGroups.length}")
    assert(hotGroups.map(_._3).max <= 2L * 900 / 10,
      s"hot groups uneven: ${hotGroups.map(_._3).toSeq}")
    assert(groups.filter(_._1 != "hot").forall(g =>
      g._2 == 0 && g._3 == 10L), "cold keys must keep one unsalted group")
  }

  test("autoSaltedJoin and autoSaltedSum match the plain forms on a " +
      "skewed key (salting never affects matching), including " +
      "left-outer unmatched rows") {
    val left = df(
      StructType(Seq(StructField("k", StringType),
        StructField("v", IntegerType))),
      (1 to 200).map(i => Row("hot", i)) ++
        Seq(Row("cold", 0), Row("lonely", 1)))
    val right = df(
      StructType(Seq(StructField("k", StringType),
        StructField("w", IntegerType))),
      Seq(Row("hot", 100), Row("hot", 101), Row("cold", 200)))
    val salts = Analytics.skewSalts(left, "k", minFraction = 0.2,
      exactKeys = true)
    for (how <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), how)
        .orderBy("k", "v", "w").collect().map(_.toSeq).toSeq
      val auto = Analytics.autoSaltedJoin(left, right, "k", how, salts)
        .orderBy("k", "v", "w").collect().map(_.toSeq).toSeq
      assert(auto == plain, s"how=$how")
    }
    val direct = left.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    val auto = Analytics.autoSaltedSum(left, "k", Seq("v"), salts)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(auto.toSeq == direct.toSeq)
  }

  test("autoSaltedJoin replicates ONLY hot-key right rows (the " +
      "saltedJoin whole-right ×salts cost is avoided) and rejects " +
      "right/full joins") {
    val left = df(
      StructType(Seq(StructField("k", StringType),
        StructField("v", IntegerType))),
      (1 to 200).map(i => Row("hot", i)) ++ Seq(Row("cold", 0)))
    val salts = Analytics.skewSalts(left, "k", minFraction = 0.3,
      exactKeys = true)
    val nSalt = salts.collect().map(r => r.getString(0) -> r.getInt(1))
      .toMap.apply("hot")
    assert(nSalt > 1)
    val right = df(
      StructType(Seq(StructField("k", StringType),
        StructField("w", IntegerType))),
      Seq(Row("hot", 100), Row("cold", 200), Row("tail", 300)))
    // replicate the right leg's construction to count replication
    val rSalted = right.join(broadcast(salts),
        col("k").cast("string") === col("__hotkey"), "left")
      .withColumn("__n", coalesce(col("__nsalt"), lit(1)))
      .withColumn("__salt", explode(sequence(lit(0), col("__n") - 1)))
    val counts = rSalted.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("hot") == nSalt.toLong)
    assert(counts("cold") == 1L && counts("tail") == 1L)
    intercept[IllegalArgumentException] {
      Analytics.autoSaltedJoin(left, right, "k", "right", salts)
    }
  }

  test("summaryStats computes exact median") {
    val d = df(
      StructType(Seq(StructField("v", DoubleType))),
      Seq(Row(1.0), Row(2.0), Row(3.0), Row(10.0)))
    val r = Analytics.summaryStats(d, col("v")).head()
    assert(r.getAs[Double]("median") == 2.5)
    assert(r.getAs[Double]("mean") == 4.0)
    assert(r.getAs[Double]("sum") == 16.0)
    assert(r.getAs[Long]("count") == 4L)
  }

  test("summaryStats approx mode (the 100 TB path) runs and lands " +
      "within the data range; exact mode unchanged") {
    val d = df(
      StructType(Seq(StructField("v", DoubleType))),
      (1 to 101).map(i => Row(i.toDouble)))
    val exact = Analytics.summaryStats(d, col("v")).head()
    assert(exact.getAs[Double]("median") == 51.0)
    val approx = Analytics.summaryStats(d, col("v"), approx = true).head()
    // approx_percentile returns an element of the multiset; with odd n
    // and high accuracy it is the exact median here
    assert(approx.getAs[Double]("median") == 51.0)
    assert(approx.getAs[Double]("mean") == exact.getAs[Double]("mean"))
  }

  test("percentiles: exact interpolates, approx stays within rank " +
      "error of exact") {
    val d = df(
      StructType(Seq(StructField("g", StringType), StructField("v", DoubleType))),
      (1 to 100).map(i => Row("a", i.toDouble)))
    val exact = Analytics.percentiles(
      d, Seq("g"), col("v"), Seq(0.25, 0.5, 0.75)).head()
    assert(exact.getAs[Double]("p25") == 25.75)
    assert(exact.getAs[Double]("p50") == 50.5)
    assert(exact.getAs[Double]("p75") == 75.25)
    assert(exact.getAs[Long]("n") == 100L)
    val approx = Analytics.percentiles(
      d, Seq("g"), col("v"), Seq(0.25, 0.5, 0.75), approx = true).head()
    assert(math.abs(approx.getAs[Double]("p50") - 50.5) <= 1.0)
    assert(math.abs(approx.getAs[Double]("p25") - 25.75) <= 1.0)
  }

  private def rjPoints = df(
    StructType(Seq(
      StructField("pid", IntegerType), StructField("v", DoubleType))),
    Seq(Row(1, 0.0), Row(2, 5.0), Row(3, 9.99), Row(4, 10.0),
      Row(5, 25.0), Row(6, 99.5), Row(7, -3.0)))

  private def rjIvals = df(
    StructType(Seq(
      StructField("iid", IntegerType),
      StructField("lo", DoubleType), StructField("hi", DoubleType))),
    Seq(
      Row(10, 0.0, 10.0),   // [0,10): pids 1,2,3; boundary 10.0 excluded
      Row(11, 5.0, 30.0),   // overlapping, spans buckets
      Row(12, -10.0, 0.5),  // negative lo
      Row(13, 90.0, 200.0), // long interval, many buckets
      Row(14, 50.0, 50.0),  // empty [x,x)
      Row(15, 60.0, 40.0))) // inverted — must not fabricate matches

  test("rangeJoin matches the naive theta-join exactly (boundaries " +
      "exclusive-hi, overlaps, negatives, empty and inverted intervals)") {
    for (width <- Seq(1.0, 7.0, 64.0)) {
      val got = Analytics.rangeJoin(rjPoints, rjIvals, "v", "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1)))
        .toSet
      val want = rjPoints.crossJoin(rjIvals)
        .where(col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1)))
        .toSet
      assert(got == want, s"width=$width")
      assert(got.contains((4, 11)) && !got.contains((4, 10))) // hi exclusive
    }
  }

  test("rangeJoin plans as an equi-join on buckets, not a nested-loop " +
      "or cartesian join") {
    val j = Analytics.rangeJoin(rjPoints, rjIvals, "v", "lo", "hi", 10.0)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  private def tsEvents(rows: (Int, String, Double)*) = df(
    StructType(Seq(
      StructField("k", IntegerType),
      StructField("ts", TimestampType),
      StructField("v", DoubleType))),
    rows.map { case (k, s, v) =>
      Row(k, java.sql.Timestamp.valueOf(s), v) })

  test("resampleFfill: per-key daily grid spans min..max bucket, " +
      "bucket value is the mean, gaps forward-fill and are flagged") {
    val out = Analytics.resampleFfill(
      tsEvents(
        (1, "2024-01-01 08:00:00", 10.0),
        (1, "2024-01-01 20:00:00", 20.0), // day 1: mean 15
        (1, "2024-01-04 03:00:00", 40.0), // days 2,3 are gaps
        (2, "2024-01-02 12:00:00", 7.0)),
      "k", "ts", "v", stepSec = 86400L)
      .orderBy("k", "bucket_ts").collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).toString.take(10),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1, "2024-01-01", 15.0, false),
      (1, "2024-01-02", 15.0, true),
      (1, "2024-01-03", 15.0, true),
      (1, "2024-01-04", 40.0, false),
      (2, "2024-01-02", 7.0, false)),
      s"got ${out.toSeq}")
  }

  test("resampleFfill: a single-observation key yields exactly one " +
      "unfilled grid row; null timestamps are ignored") {
    val d = df(
      StructType(Seq(
        StructField("k", IntegerType),
        StructField("ts", TimestampType),
        StructField("v", DoubleType))),
      Seq(Row(1, java.sql.Timestamp.valueOf("2024-03-05 10:30:00"), 3.0),
        Row(1, null, 99.0)))
    val out = Analytics.resampleFfill(d, "k", "ts", "v", 3600L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getTimestamp(1).toString == "2024-03-05 10:00:00.0")
    assert(out.head.getDouble(2) == 3.0 && !out.head.getBoolean(3))
  }

  private def entities(rows: (Int, String)*) = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType))),
    rows.map { case (i, n) => Row(i, n) })

  test("resolveEntities: transitive chains collapse to one entity " +
      "with lexicographic-min canonical name and min-id key") {
    // widget ~ widgetco ~ widgetcorp chain: the endpoints are distance
    // 4 apart — only transitivity links them into one entity
    val out = Analytics.resolveEntities(
      entities((5, "widgetco"), (3, "widget"), (8, "widgetcorp"),
        (1, "unrelated name")),
      "id", "name").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1, 1, "unrelated name"),
      (3, 3, "widget"),
      (5, 3, "widget"),
      (8, 3, "widget")))
  }

  test("resolveEntities: duplicate names share the entity without " +
      "extra fuzzy work; the entity key is the min id across ALL " +
      "records of the cluster") {
    val out = Analytics.resolveEntities(
      entities((10, "acme corp"), (7, "acme corp"), (2, "acme-corp")),
      "id", "name").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (2, 2, "acme corp"), (7, 2, "acme corp"), (10, 2, "acme corp")))
  }

  test("resampleInterp: interior gaps take the line between the " +
      "surrounding observed buckets; observed buckets keep their mean") {
    val out = Analytics.resampleInterp(
      tsEvents(
        (1, "2024-01-01 06:00:00", 8.0),
        (1, "2024-01-01 18:00:00", 12.0), // day 1 mean: 10
        (1, "2024-01-04 01:00:00", 40.0), // days 2,3 interpolate
        (2, "2024-01-02 12:00:00", 7.0)),
      "k", "ts", "v", stepSec = 86400L)
      .orderBy("k", "bucket_ts").collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).toString.take(10),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1, "2024-01-01", 10.0, false),
      (1, "2024-01-02", 20.0, true),
      (1, "2024-01-03", 30.0, true),
      (1, "2024-01-04", 40.0, false),
      (2, "2024-01-02", 7.0, false)),
      s"got ${out.toSeq}")
  }

  test("resampleFfill at hourly step: grid density follows the step, " +
      "fills restart at each real observation") {
    val out = Analytics.resampleFfill(
      tsEvents(
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 03:50:00", 8.0)),
      "k", "ts", "v", stepSec = 3600L)
      .orderBy("bucket_ts").collect()
      .map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq((2.0, false), (2.0, true), (2.0, true),
      (8.0, false)))
  }
}
