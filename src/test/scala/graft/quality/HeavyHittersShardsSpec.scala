package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[HeavyHitters]] — the mergeable Misra–Gries shard algebra. */
class HeavyHittersShardsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType),
    StructField("v", StringType)))

  /** items: value -> (shard, copies)* */
  private def frame(items: (String, Seq[(Int, Int)])*) =
    df(schema, for {
      (v, placements) <- items
      (sh, n) <- placements
      _ <- 0 until n
    } yield Row(sh, v))

  test("retention bound survives sharding + merge: the > N/(k+1) " +
      "value is always a candidate, whatever the shard cuts") {
    // N = 40, k = 3 -> bound N/4 = 10; "hot" has 12 spread over 4
    // shards; 28 filler singletons churn the counters
    val filler = (1 to 28).map(i => s"f$i" -> Seq((i % 4) -> 1))
    val d = frame(Seq("hot" -> Seq(0 -> 3, 1 -> 3, 2 -> 3, 3 -> 3)) ++
      filler: _*)
    val merged = HeavyHitters.mergeMgShards(
      HeavyHitters.mgShards(d, col("v"), col("shard"), k = 3), k = 3)
    val cands = merged.collect().map(_.getString(0)).toSet
    assert(cands.contains("hot"))
    assert(merged.count() <= 3)
  }

  test("merged weights are lower bounds on true counts") {
    val d = frame("a" -> Seq(0 -> 10, 1 -> 10), "b" -> Seq(0 -> 5),
      "c" -> Seq(1 -> 3), "d" -> Seq(0 -> 1, 1 -> 1))
    val merged = HeavyHitters.mergeMgShards(
        HeavyHitters.mgShards(d, col("v"), col("shard"), k = 2), k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("a" -> 20L, "b" -> 5L, "c" -> 3L, "d" -> 2L)
    merged.foreach { case (v, wt) =>
      assert(wt > 0 && wt <= truth(v), s"$v: wt=$wt true=${truth(v)}")
    }
  }

  test("compaction is shard-preserving: compacted + fresh shards " +
      "merge to the same candidate set as the uncompacted store") {
    val old = frame("x" -> Seq(0 -> 9, 1 -> 9), "y" -> Seq(0 -> 2),
      "z" -> Seq(1 -> 2))
    val fresh = frame("x" -> Seq(2 -> 4), "w" -> Seq(2 -> 8))
    val k = 2
    def shards(d: org.apache.spark.sql.DataFrame) =
      HeavyHitters.mgShards(d, col("v"), col("shard"), k)
    val direct = HeavyHitters.mergeMgShards(
      shards(old).union(shards(fresh)), k)
    val viaCompact = HeavyHitters.mergeMgShards(
      HeavyHitters.compactMgShards(shards(old), k, shardId = 99L)
        .union(shards(fresh)), k)
    // counters may differ (order-dependent); the retained heavy
    // candidates may not: x dominates both stores
    assert(direct.collect().map(_.getString(0)).toSet
      .contains("x"))
    assert(viaCompact.collect().map(_.getString(0)).toSet
      .contains("x"))
  }

  test("verify pass is exact and partitioning-independent: same " +
      "final rows from 1-partition and 8-partition inputs") {
    val rows = (Seq.fill(30)("hh1") ++ Seq.fill(20)("hh2") ++
      (1 to 50).map(i => s"u$i")).map(Row(_))
    val s1 = StructType(Seq(StructField("t", StringType)))
    def run(parts: Int) = {
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), s1)
      val sh = HeavyHitters.mgShards(
        d, col("t"), (crc32(col("t")) % 4).cast("int"), k = 9)
      HeavyHitters.verifyHeavyHitters(d, "t",
          HeavyHitters.mergeMgShards(sh, k = 9),
          minFraction = 0.15, k = 9)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2))).toSet
    }
    val expect = Set(("hh1", 30L, 0.3), ("hh2", 20L, 0.2))
    assert(run(1) == expect)
    assert(run(8) == expect)
  }

  test("verify refuses a threshold below the retention bound") {
    val d = frame("a" -> Seq(0 -> 3))
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.verifyHeavyHitters(d.select(col("v")), "v",
        HeavyHitters.mergeMgShards(
          HeavyHitters.mgShards(d, col("v"), col("shard"), k = 4),
          k = 4),
        minFraction = 0.1, k = 4) // 0.1 < 1/5
    }
    assert(e.getMessage.contains("retention bound"))
  }
}
