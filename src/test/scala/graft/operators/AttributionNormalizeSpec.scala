package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AttributionNormalizeSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, Long)]) = df(
    StructType(Seq(
      StructField("u", LongType),
      StructField("ts", TimestampType),
      StructField("id", LongType))),
    rows.map { case (u, sec, id) =>
      Row(u, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(sec)), id)
    })

  test("linearAttribution: exact milli split, remainder to the last " +
      "touch, window boundary exclusive at the far edge") {
    // conversion at t=7200 (id 100); touches at 0 (exactly cts − 2h,
    // outside by the strict >), 3600, 5000, 7200 (same instant counts)
    val conv = ev(Seq((1L, 7200L, 100L)))
    val touches = ev(Seq((1L, 0L, 1L), (1L, 3600L, 2L),
      (1L, 5000L, 3L), (1L, 7200L, 4L)))
    val out = Analytics.linearAttribution(conv, touches, "u", "ts",
        "id", "2 hours")
      .collect().map(r => (r.getLong(3), r.getInt(5), r.getLong(7)))
      .sortBy(_._2)
    // t=1 is exactly cts - 2h -> excluded (strict >)
    assert(out.map(_._1).toSeq === Seq(2L, 3L, 4L))
    assert(out.map(_._3).toSeq === Seq(333L, 333L, 334L))
    assert(out.map(_._3).sum === 1000L)
  }

  test("linearAttribution: conversions without touches emit nothing; " +
      "touches attribute to every conversion in range") {
    val conv = ev(Seq((1L, 1000L, 100L), (1L, 2000L, 101L),
      (2L, 5000L, 102L)))
    val touches = ev(Seq((1L, 500L, 1L)))
    val out = Analytics.linearAttribution(conv, touches, "u", "ts",
        "id", "2 hours")
      .collect().map(r => (r.getLong(1), r.getLong(7)))
    // touch 1 credits BOTH of user 1's conversions fully; user 2 none
    assert(out.toSet === Set((100L, 1000L), (101L, 1000L)))
  }

  test("linearAttribution: conversion ids that repeat across keys " +
      "stay separate (windows partition by key AND conversion id)") {
    // both users have a conversion with id 100 — an event-log shape
    // where ids are only unique per key; merging them would report
    // n_touches = 2 and split 500/500
    val conv = ev(Seq((1L, 1000L, 100L), (2L, 1000L, 100L)))
    val touches = ev(Seq((1L, 500L, 1L), (2L, 600L, 2L)))
    val out = Analytics.linearAttribution(conv, touches, "u", "ts",
        "id", "2 hours")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(6),
        r.getLong(7)))
    assert(out.toSet === Set((1L, 1L, 1L, 1000L), (2L, 2L, 1L, 1000L)))
  }

  private def scored(rows: Seq[(String, Double)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("v", DoubleType))),
    rows.zipWithIndex.map { case ((g, v), _) => Row(g, v) })

  test("quantileNormalize: within-group rank routes to the global " +
      "grid; hot and cold sources land on one scale") {
    // group a: 0.8, 0.9 ; group b: 0.1, 0.2 — each group's max must
    // map to the SAME grid index (its group's top rank)
    val d = scored(Seq(("a", 0.8), ("a", 0.9), ("b", 0.1), ("b", 0.2)))
    val out = Analytics.quantileNormalize(d, "g", "v", k = 4,
        exact = true)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3)))
    val byRow = out.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // i=1,n=2 -> ceil(4/2)=2 ; i=2,n=2 -> 4
    assert(byRow(("a", 0.9))._1 === 4L)
    assert(byRow(("b", 0.2))._1 === 4L)
    assert(byRow(("a", 0.8))._1 === 2L)
    assert(byRow(("b", 0.1))._1 === 2L)
    // same idx -> same normalized value: the cross-source correction
    assert(byRow(("a", 0.9))._2 === byRow(("b", 0.2))._2)
    assert(byRow(("a", 0.8))._2 === byRow(("b", 0.1))._2)
  }

  test("quantileNormalize: ties share the inclusive rank; " +
      "partition-layout invariance; approx within grid of exact") {
    val rows = (1 to 200).map(i => ("a", (i % 37).toDouble)) ++
      (1 to 100).map(i => ("b", (i % 23).toDouble))
    def run(parts: Int, exact: Boolean) =
      Analytics.quantileNormalize(scored(rows).repartition(parts),
          "g", "v", k = 10, exact = exact)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .toSet
    assert(run(1, exact = true) === run(8, exact = true))
    // grid INDICES are integer-exact regardless of the grid estimator
    assert(run(4, exact = false) === run(4, exact = true))
    // peers get one rank: two equal values in a group share grid_idx
    val tied = Analytics.quantileNormalize(
        scored(Seq(("a", 1.0), ("a", 1.0), ("a", 2.0))), "g", "v",
        k = 3, exact = true)
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    val ones = tied.filter(_._1 == 1.0).map(_._2).toSet
    assert(ones.size === 1)
  }
}
