package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QuantileSketchSpec extends SparkSpec {

  private def frame(rows: Seq[(String, Double)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("v", DoubleType))),
    rows.map { case (g, v) => Row(g, v) })

  /** Inclusive order statistic: smallest value whose cumulative
    * fraction >= rank — the exact-regime contract.
    */
  private def inclusive(vs: Seq[Double], rank: Double): Double = {
    val s = vs.sorted
    s(math.max(0, math.ceil(rank * s.length).toInt - 1))
  }

  private def quantiles(rows: Seq[(String, Double)], shardMod: Int,
      ranks: Seq[Double], k: Int = 8192) = {
    val shards = Drift.quantileShards(frame(rows), Seq("g"), col("v"),
      pmod(crc32(col("v").cast("string")), lit(shardMod)), k)
    Drift.mergeQuantileShards(shards, Seq("g"), ranks, k)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        (0 until ranks.size).map(i => r.getDouble(2 + i))))
      .toMap
  }

  test("exact regime: quantiles equal the inclusive order statistic") {
    val rows = (1 to 1000).map(i => ("a", (i * 37 % 1000).toDouble)) ++
      (1 to 40).map(i => ("b", i.toDouble))
    val out = quantiles(rows, 4, Seq(0.5, 0.75))
    val as = rows.filter(_._1 == "a").map(_._2)
    val bs = rows.filter(_._1 == "b").map(_._2)
    assert(out("a")._1 === 1000L)
    assert(out("a")._2 === Seq(inclusive(as, 0.5), inclusive(as, 0.75)))
    assert(out("b")._2 === Seq(inclusive(bs, 0.5), inclusive(bs, 0.75)))
  }

  test("shard-split merge equals the single-shard build") {
    val rows = (1 to 500).map(i => ("a", (i * 13 % 250).toDouble))
    assert(quantiles(rows, 1, Seq(0.5, 0.75)) ===
      quantiles(rows, 7, Seq(0.5, 0.75)))
  }

  test("partition-layout invariance in the exact regime") {
    val rows = (1 to 300).map(i => ("a", (i % 97).toDouble))
    val shards1 = Drift.quantileShards(frame(rows).repartition(1),
      Seq("g"), col("v"), lit(0), 8192)
    val shards8 = Drift.quantileShards(frame(rows).repartition(8),
      Seq("g"), col("v"), lit(0), 8192)
    val q1 = Drift.mergeQuantileShards(shards1, Seq("g"), Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val q8 = Drift.mergeQuantileShards(shards8, Seq("g"), Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(q1.toSet === q8.toSet)
  }

  test("compaction regime: n stays exact, quantile within rank error") {
    // k = 8 forces compaction at ~40k values; rank error at k=8 is
    // large, so assert a LOOSE bound (±0.2 of normalized rank) that a
    // broken merge would still blow through
    val n = 40000
    val rows = (1 to n).map(i => ("a", i.toDouble))
    val out = quantiles(rows, 5, Seq(0.5), k = 8)
    assert(out("a")._1 === n.toLong)
    val est = out("a")._2.head
    assert(est > n * 0.3 && est < n * 0.7,
      s"p50 estimate $est outside the loose rank band")
  }

  test("compacted shards keep merging under the same algebra") {
    val rows = (1 to 600).map(i => ("a", (i % 101).toDouble))
    val shards = Drift.quantileShards(frame(rows), Seq("g"), col("v"),
      pmod(crc32(col("v").cast("string")), lit(6)), 8192)
    val compacted = Drift.compactQuantileShards(shards, Seq("g"), 0L)
    assert(compacted.count() === 1L)
    val direct = Drift.mergeQuantileShards(shards, Seq("g"),
      Seq(0.5, 0.75)).collect().map(_.toSeq).toSet
    val viaCompact = Drift.mergeQuantileShards(compacted, Seq("g"),
      Seq(0.5, 0.75)).collect().map(_.toSeq).toSet
    assert(direct === viaCompact)
  }

  test("fractional ranks get unique column names instead of " +
      "colliding at the rounded integer percent") {
    assert(Drift.rankColName(0.5) === "p50")
    assert(Drift.rankColName(0.95) === "p95")
    assert(Drift.rankColName(0.995) === "p99_5")
    assert(Drift.rankColName(1.0) === "p100")
    assert(Drift.rankColName(0.501) === "p50_1")
    assert(Drift.rankColName(0.1234) === "p12_34")
    // 0.995 and 1.0 both used to round to p100 -> AnalysisException;
    // now they coexist in one frame
    val rows = (1 to 200).map(i => ("a", i.toDouble))
    val shards = Drift.quantileShards(frame(rows), Seq("g"), col("v"),
      pmod(crc32(col("v").cast("string")), lit(4)))
    val out = Drift.mergeQuantileShards(shards, Seq("g"),
      Seq(0.995, 1.0))
    assert(out.columns.toSeq === Seq("g", "n", "p99_5", "p100"))
    val r = out.collect().head
    assert(r.getDouble(2) === 199.0 && r.getDouble(3) === 200.0)
    // truly duplicate names still fail fast with the offending list
    val e = intercept[IllegalArgumentException] {
      Drift.mergeQuantileShards(shards, Seq("g"), Seq(0.5, 0.50))
    }
    assert(e.getMessage.contains("collide"))
  }
}
