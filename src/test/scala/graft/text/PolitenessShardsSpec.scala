package graft.text

import graft.SparkSpec
import graft.registry.TextRegistry

/** q370's politeness shard plan — the snake allocation's structural
  * guarantees: count balance within one domain, the fold pairing
  * (rank 0 and rank 2N−1 share a shard), the null-domain quarantine,
  * and determinism.
  */
class PolitenessShardsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows = graft.core.CacheScope.withScope {
    TextRegistry.politenessShardsQ(spark, sfDir).collect().toSeq
  }

  test("shards are -1 (null-domain quarantine) or 0..7; every " +
      "non-null domain is assigned; counts per shard balance " +
      "within 1") {
    val out = rows
    val byShard = out.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet.subsetOf((-1 to 7).toSet))
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.forall(_.getAs[Int]("shard") == -1))
    assert(out.filterNot(_.isNullAt(0))
      .forall(_.getAs[Int]("shard") >= 0))
    val counts = byShard.view.filterKeys(_ >= 0).values
      .map(_.size).toSeq
    assert(counts.max - counts.min <= 1,
      s"unbalanced shard counts: $counts")
  }

  test("the snake fold pairs heavy with light: rank 0 and rank 15 " +
      "land in shard 0, ranks 7 and 8 in shard 7") {
    val ranked = rows.filterNot(_.isNullAt(0))
      .sortBy(r => (-r.getAs[Long]("load"), r.getAs[String]("domain")))
    if (ranked.size >= 16) {
      assert(ranked(0).getAs[Int]("shard") == 0)
      assert(ranked(15).getAs[Int]("shard") == 0)
      assert(ranked(7).getAs[Int]("shard") == 7)
      assert(ranked(8).getAs[Int]("shard") == 7)
    }
    // shard_load is consistent: each row's shard_load equals the
    // sum of loads in its shard
    val bs = rows.groupBy(_.getAs[Int]("shard"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("load")).sum }
    assert(rows.forall(r =>
      r.getAs[Long]("shard_load") == bs(r.getAs[Int]("shard"))))
  }

  test("deterministic: two runs produce identical plans") {
    assert(rows == rows)
  }
}
