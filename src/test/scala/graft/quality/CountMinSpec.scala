package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CountMinSpec extends SparkSpec {

  private def frame(items: Seq[String]) = df(
    StructType(Seq(StructField("v", StringType))),
    items.map(Row(_)))

  private def probe(items: Seq[String]) = df(
    StructType(Seq(StructField("item", StringType))),
    items.distinct.map(Row(_)))

  private def estimates(
      data: Seq[String], shardMod: Int, depth: Int = 4,
      width: Int = 512): Map[String, Long] = {
    val shards = CountMin.cmsShards(
      frame(data), col("v"), crc32(col("v")) % shardMod, depth, width)
    CountMin.cmsEstimate(CountMin.mergeCmsShards(shards),
        probe(data), "item", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("wide sketch, small vocab: estimates are EXACT counts") {
    val data = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma")
    assert(estimates(data, 3) ===
      Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("never undercounts, even forced into heavy collision (width " +
      "at the floor)") {
    val data = (1 to 300).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i"))
    val truth = data.groupBy(identity).view.mapValues(_.length.toLong)
    val est = estimates(data, 4, depth = 3, width = 16)
    truth.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t undercounted: ${est(t)} < $n")
    }
  }

  test("shard-split merge equals the single-shard build (cell-wise " +
      "additive), and compaction preserves the grid") {
    val data = (1 to 200).map(i => s"w${i % 23}")
    val one = estimates(data, 1)
    assert(estimates(data, 7) === one)
    val shards = CountMin.cmsShards(frame(data), col("v"),
      crc32(col("v")) % 5)
    val compacted = CountMin.compactCmsShards(shards, 0L)
    assert(compacted.select("__shard").distinct().count() === 1)
    val viaCompact = CountMin.cmsEstimate(
        CountMin.mergeCmsShards(compacted), probe(data), "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaCompact === one)
  }

  test("absent items estimate 0 (all cells missing) or collision " +
      "mass only") {
    val shards = CountMin.cmsShards(frame(Seq("a", "a", "b")),
      col("v"), lit(0L))
    val est = CountMin.cmsEstimate(CountMin.mergeCmsShards(shards),
        probe(Seq("zzz_never_seen")), "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("zzz_never_seen") <= 2L) // 0 unless it collides in
    // EVERY row with a present item — vanishingly rare at width 512
    assert(est("zzz_never_seen") >= 0L)
  }

  test("partition-layout invariance (exact integer grid)") {
    val data = (1 to 500).map(i => s"t${i * 13 % 37}")
    def run(parts: Int) = {
      val shards = CountMin.cmsShards(
        frame(data).repartition(parts), col("v"),
        crc32(col("v")) % 3)
      CountMin.mergeCmsShards(shards).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    assert(run(1) === run(11))
  }

  test("grid size is bounded by depth × width regardless of vocab") {
    val data = (1 to 2000).map(i => s"unique_$i")
    val merged = CountMin.mergeCmsShards(CountMin.cmsShards(
      frame(data), col("v"), lit(0L), depth = 3, width = 64))
    assert(merged.count() <= 3L * 64L)
    // total mass conserves: every occurrence lands once per row
    val mass = merged.groupBy("d").agg(sum("cnt")).collect()
      .map(_.getLong(1))
    assert(mass.toSeq === Seq.fill(3)(2000L))
  }
}
