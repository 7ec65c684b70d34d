package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) =
    spark.range(n).select(col("id"),
      (col("id") % 5).cast("string").as("stratum"))

  test("hashFraction lands in [0, 1) and is deterministic") {
    val h = ids(500)
      .select(Sampling.hashFraction(col("id"), "s").as("h"))
    assert(h.where(col("h") < 0 || col("h") >= 1).count() == 0)
    assert(h.distinct().count() > 400) // spreads, not constant
    val a = h.collect().map(_.getDouble(0)).toSeq
    val b = ids(500)
      .select(Sampling.hashFraction(col("id"), "s").as("h"))
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("hashSplit labels every row with one split at roughly the " +
      "requested fractions") {
    val out = Sampling.hashSplit(ids(2000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts("val") > 120 && counts("val") < 280)
  }

  test("hashSplit assignments are stable when the table grows (old " +
      "rows never migrate between splits)") {
    val small = Sampling.hashSplit(ids(300), "id",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Sampling.hashSplit(ids(900), "id",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(big(id) == s) }
  }

  test("different salts give independent splits") {
    val a = Sampling.hashSplit(ids(400), "id",
      Seq("x" -> 0.5, "y" -> 0.5), salt = "a")
    val b = Sampling.hashSplit(ids(400), "id",
      Seq("x" -> 0.5, "y" -> 0.5), salt = "b")
    val agree = a.select(col("id"), col("split").as("sa"))
      .join(b.select(col("id"), col("split").as("sb")), "id")
      .where(col("sa") === col("sb")).count()
    assert(agree > 100 && agree < 300) // ~half agree by chance
  }

  test("stratifiedSampleExact keeps exactly ceil(fraction * n) rows " +
      "per stratum") {
    val out = Sampling.stratifiedSampleExact(
      ids(1003), "id", Seq("stratum"), 0.1)
    val byStratum = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = ids(1003).groupBy("stratum").count()
      .collect().map(r => r.getString(0) ->
        math.ceil(r.getLong(1) * 0.1).toLong).toMap
    assert(byStratum == expected)
  }

  test("stratifiedSampleExact is a deterministic subset of the input") {
    val a = Sampling.stratifiedSampleExact(
      ids(500), "id", Seq("stratum"), 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSampleExact(
      ids(500), "id", Seq("stratum"), 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.forall(_ < 500))
  }

  test("stratifiedSampleByHash approximates the fraction without a " +
      "shuffle and nests by fraction (5% sample is inside the 20%)") {
    val big = Sampling.stratifiedSampleByHash(ids(2000), "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    val small = Sampling.stratifiedSampleByHash(ids(2000), "id", 0.05)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big)) // same salt → thresholds nest
    assert(big.size > 300 && big.size < 500)
  }

  test("perGroupSample keeps n rows per group, all of a smaller group") {
    val d = ids(100) // strata of 20 each
    val out = Sampling.perGroupSample(d, "id", Seq("stratum"), 7)
    val counts = out.groupBy("stratum").count()
      .collect().map(_.getLong(1))
    assert(counts.forall(_ == 7))
    val tiny = Sampling.perGroupSample(
      ids(3), "id", Seq("stratum"), 7)
    assert(tiny.count() == 3)
  }

  test("weightedSample matches a reference Efraimidis-Spirakis " +
      "computation, excludes non-positive weights, is deterministic") {
    val d = spark.range(200).select(col("id"),
      when(col("id") < 5, lit(0.0))
        .when(col("id") < 10, lit(-1.0))
        .otherwise((col("id") % 50 + 1).cast("double")).as("w"))
    val got = Sampling.weightedSample(d, "id", "w", 15)
      .select("id").collect().map(_.getLong(0)).toSet
    // reference: same key formula evaluated independently
    val ref = d.where(col("w") > 0)
      .select(col("id"),
        (log(Sampling.hashFraction(col("id"), "wsample")) / col("w"))
          .as("k"))
      .orderBy(col("k").desc, col("id").asc).limit(15)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == ref)
    assert(got.size == 15)
    assert(got.intersect((0L until 10L).toSet).isEmpty) // w <= 0 excluded
    val again = Sampling.weightedSample(d, "id", "w", 15)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("weightedSample inclusion probability scales with weight " +
      "(heavy rows sampled far more often across salts)") {
    // 100 rows: one heavy (w=500) vs light (w=1); over 30 salts the
    // heavy row must appear in the k=10 sample far more often than any
    // single light row's expectation
    val d = spark.range(100).select(col("id"),
      when(col("id") === 0, lit(500.0)).otherwise(lit(1.0)).as("w"))
    val hits = (0 until 30).count { s =>
      Sampling.weightedSample(d, "id", "w", 10, salt = s"salt$s")
        .select("id").collect().map(_.getLong(0)).contains(0L)
    }
    assert(hits >= 25, s"heavy row sampled only $hits/30 times")
  }

  test("weightedSample adversarial near-tie: keys engineered to agree " +
      "to ~1 ulp still select deterministically (desc key, asc id)") {
    // weights are chosen so every row's A-RES key ln(u)/w lands at
    // exactly -1.0 up to one floating-point rounding of the division:
    // w = -ln(u) makes key = ln(u)/(-ln(u)) ≈ -1.0 ± 1 ulp. This is
    // the worst case for cross-libm stability — the spec pins that
    // WITHIN an engine the ordering (key desc, id asc) is total and
    // reproducible, which is the documented determinism bound.
    val ids = spark.range(8).toDF("id")
    val hf = ids
      .select(col("id"), Sampling.hashFraction(col("id"), "wsample").as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = hf.toSeq.map { case (id, u) => (id, -math.log(u)) }
    val d = spark.createDataFrame(rows).toDF("id", "w")
    val got = Sampling.weightedSample(d, "id", "w", 3)
      .select("id").collect().map(_.getLong(0)).toSet
    // reference: identical arithmetic (java.lang.Math.log, one double
    // division) evaluated driver-side, ordered by the documented policy
    val ref = rows.map { case (id, w) => (math.log(hf(id)) / w, id) }
      .sortBy { case (k, id) => (-k, id) }.take(3).map(_._2).toSet
    assert(got == ref)
    val again = Sampling.weightedSample(d, "id", "w", 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  private def skewed = spark.range(5003).select(col("id"),
    when(col("id") < 5000, lit("big")).otherwise(lit("small"))
      .as("grp"))

  test("cappedPerGroupSample equals perGroupSample on skewed groups " +
      "(pre-filter is result-invariant)") {
    val one = Sampling.perGroupSample(skewed, "id", Seq("grp"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val two = Sampling.cappedPerGroupSample(skewed, "id", Seq("grp"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(two == one)
    // the small group (3 < n) is kept whole — never filtered away
    assert(two.count(_._2 == "small") == 3)
  }

  test("cappedPerGroupSample plans the hash pre-filter below the " +
      "window (the sorted set is capped, not the group)") {
    val plan = Sampling
      .cappedPerGroupSample(skewed, "id", Seq("grp"), 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("least"), s"no pre-filter in plan:\n$plan")
  }

  test("cappedPerGroupSample keeps null-key groups (null-safe counts " +
      "join) — result still equals perGroupSample") {
    val withNulls = spark.range(200).select(col("id"),
      when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("g"), (col("id") % 3).cast("string")))
        .as("grp"))
    val one = Sampling.perGroupSample(withNulls, "id", Seq("grp"), 5)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val two = Sampling.cappedPerGroupSample(withNulls, "id", Seq("grp"), 5)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(two == one)
    assert(two.count(_._2.isEmpty) == 5,
      "null-key rows must form their own sampled group")
  }

  test("cappedPerGroupSample and splitByCluster carry no forced " +
      "broadcast: data-dependent table sizes are AQE's call, not a hint") {
    val capped = Sampling
      .cappedPerGroupSample(skewed, "id", Seq("grp"), 10)
    val d = spark.range(100).toDF("doc_id")
    val labels = df(
      StructType(Seq(
        StructField("id", LongType), StructField("component", LongType))),
      Seq(Row(1L, 1L), Row(2L, 1L)))
    val split = Sampling.splitByCluster(d, "doc_id", labels,
      "id", "component", Seq("train" -> 0.8, "test" -> 0.2))
    Seq("cappedPerGroupSample" -> capped, "splitByCluster" -> split)
      .foreach { case (name, frame) =>
        val hints = frame.queryExecution.analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        }
        assert(hints.isEmpty,
          s"$name forces a join strategy via hint: $hints")
      }
  }

  test("splitByCluster keeps rep in the input id type (string ids " +
      "split correctly — no silent null from a long cast)") {
    val d = spark.range(50)
      .select(concat(lit("doc-"), col("id").cast("string")).as("doc_id"))
    val labels = df(
      StructType(Seq(
        StructField("id", StringType), StructField("component", StringType))),
      Seq(Row("doc-1", "doc-1"), Row("doc-2", "doc-1")))
    val out = Sampling.splitByCluster(d, "doc_id", labels,
      "id", "component", Seq("train" -> 0.8, "test" -> 0.2))
    assert(out.schema("rep").dataType == StringType)
    val rows = out.select("doc_id", "rep", "split")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 50)
    assert(rows.forall(r => r._2 != null && Set("train", "test")(r._3)))
    // the labeled pair shares its representative's split
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId("doc-1")._3 == byId("doc-2")._3)
  }

  test("mixture: integer weights emit exact full epochs, zero drops " +
      "the group, default weight covers unlisted groups once") {
    val d = spark.range(300).select(col("id"),
      concat(lit("g"), (col("id") % 3).cast("string")).as("src"))
    val out = Sampling.mixture(d, "id", "src",
      Map("g0" -> 2.0, "g1" -> 0.0)).cache()
    val byGroup = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("g0" -> 200L, "g2" -> 100L))
    // g0's two epochs are FULL copies: every id present in epoch 0 and 1
    val g0 = out.where(col("src") === "g0")
      .groupBy("epoch").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(g0 == Map(0 -> 100L, 1 -> 100L))
    out.unpersist()
  }

  test("mixture: fractional weight draws a deterministic ~w subset, " +
      "independently per epoch") {
    val d = spark.range(1000).select(col("id"), lit("g").as("src"))
    val out = Sampling.mixture(d, "id", "src", Map("g" -> 1.5)).cache()
    val epoch0 = out.where(col("epoch") === 0).count()
    val epoch1 = out.where(col("epoch") === 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(epoch0 == 1000)            // full epoch
    assert(epoch1.size > 400 && epoch1.size < 600) // ~half
    // stable: same salt, same subset
    val again = Sampling.mixture(d, "id", "src", Map("g" -> 1.5))
      .where(col("epoch") === 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == epoch1)
    out.unpersist()
  }

  test("splitByCluster: every member of a component shares its " +
      "representative's split; unlabeled rows split by their own id") {
    val d = spark.range(100).toDF("doc_id")
    val labels = df(
      StructType(Seq(
        StructField("id", LongType), StructField("component", LongType))),
      Seq(Row(1L, 1L), Row(2L, 1L), Row(3L, 1L), Row(10L, 10L),
        Row(11L, 10L)))
    val out = Sampling.splitByCluster(d, "doc_id", labels,
        "id", "component", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "rep", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length == 100)
    // cluster {1,2,3} all carry rep 1 and one split
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).toSet.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._3).toSet.size == 1)
    // unlabeled rows fall back to their own id — identical to hashSplit
    val plain = Sampling.hashSplit(d, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 100L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { id =>
      assert(byId(id)._3 == plain(id), s"id $id")
    }
  }

  private def langDocs = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("lang", StringType),
      StructField("tokens", IntegerType))),
    // 80 en / 15 de / 5 sw — the skewed multilingual shape
    ((0 until 80).map(i => Row(i, "en", 10)) ++
      (80 until 95).map(i => Row(i, "de", 20)) ++
      (95 until 100).map(i => Row(i, "sw", 40))))

  test("temperatureWeights: alpha=1 is the identity (all weights 1), " +
      "alpha=0 equalizes sampling shares") {
    val id = Sampling.temperatureWeights(langDocs, "lang", 1.0)
      .collect().map(r => r.getAs[String]("group") ->
        r.getAs[Double]("weight")).toMap
    id.values.foreach(w => assert(math.abs(w - 1.0) < 1e-12))
    val eq = Sampling.temperatureWeights(langDocs, "lang", 0.0)
      .collect().map(r => r.getAs[String]("group") ->
        r.getAs[Double]("q")).toMap
    eq.values.foreach(q => assert(math.abs(q - 1.0 / 3) < 1e-12))
  }

  test("temperatureWeights: size-preserving — sum of n*weight equals " +
      "N at every alpha; low-resource groups upweighted, dominant " +
      "downweighted for alpha < 1") {
    for (alpha <- Seq(0.0, 0.3, 0.5, 0.7, 1.0)) {
      val rows = Sampling.temperatureWeights(langDocs, "lang", alpha)
        .collect().map(r => (r.getAs[String]("group"),
          r.getAs[Double]("n"), r.getAs[Double]("weight"))).toSeq
      val total = rows.map { case (_, n, w) => n * w }.sum
      assert(math.abs(total - 100.0) < 1e-9, s"alpha=$alpha: $total")
    }
    val w5 = Sampling.temperatureWeights(langDocs, "lang", 0.5)
      .collect().map(r => r.getAs[String]("group") ->
        r.getAs[Double]("weight")).toMap
    assert(w5("sw") > 1.0 && w5("de") > 1.0 && w5("en") < 1.0)
    assert(w5("sw") > w5("de"))
  }

  test("temperatureWeights by token mass (sizeCol) weighs groups by " +
      "tokens, not rows") {
    // token mass: en 800, de 300, sw 200 — different p than row counts
    val byTok = Sampling.temperatureWeights(langDocs, "lang", 0.5,
        sizeCol = Some("tokens"))
      .collect().map(r => r.getAs[String]("group") ->
        r.getAs[Double]("p")).toMap
    assert(math.abs(byTok("en") - 800.0 / 1300) < 1e-12)
    assert(math.abs(byTok("sw") - 200.0 / 1300) < 1e-12)
  }

  test("mixtureWeights feeds mixture: the composed corpus lands near " +
      "the temperature-target size per group") {
    val w = Sampling.mixtureWeights(langDocs, "lang", 0.5)
    val mixed = Sampling.mixture(langDocs, "id", "lang", w)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected per-group size = n_g * w_g; hash-sampled fractional
    // epochs put the realized count within a few rows
    val expect = Map("en" -> 80 * w("en"), "de" -> 15 * w("de"),
      "sw" -> 5 * w("sw"))
    expect.foreach { case (g, e) =>
      assert(math.abs(mixed(g) - e) <= math.max(3.0, e * 0.35),
        s"$g: got ${mixed(g)}, expected ~$e")
    }
  }
}
