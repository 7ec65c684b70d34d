package graft.dedup

import graft.SparkSpec
import graft.expressions.BloomOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

class BloomDedupSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("text", StringType, nullable = true))),
    rows.map { case (i, t) => Row(i, t) })

  test("BloomOps: added keys are ALWAYS contained (no false negatives " +
      "— the property the dedup prefilter rests on)") {
    val f = BloomOps.emptyFilter(4, 1024)
    val keys = (0 until 500).map(i => s"key-$i")
    keys.foreach(k => BloomOps.add(f, UTF8String.fromString(k)))
    keys.foreach { k =>
      assert(BloomOps.contains(f, UTF8String.fromString(k)),
        s"false negative for $k")
    }
  }

  test("BloomOps: false-positive rate is near the sized fpp") {
    val n = 2000L
    val bits = BloomOps.bitsFor(n, 0.03)
    val f = BloomOps.emptyFilter(BloomOps.hashesFor(bits, n), bits)
    (0 until n.toInt).foreach(i =>
      BloomOps.add(f, UTF8String.fromString(s"member-$i")))
    val probes = 5000
    val fps = (0 until probes).count(i =>
      BloomOps.contains(f, UTF8String.fromString(s"absent-$i")))
    val rate = fps.toDouble / probes
    assert(rate < 0.09, s"false-positive rate $rate far above sized 0.03")
  }

  test("BloomOps: merge is bit-OR — split-build equals single-build") {
    val a = BloomOps.emptyFilter(4, 2048)
    val b = BloomOps.emptyFilter(4, 2048)
    val whole = BloomOps.emptyFilter(4, 2048)
    (0 until 100).foreach { i =>
      val k = UTF8String.fromString(s"k$i")
      BloomOps.add(whole, k)
      BloomOps.add(if (i % 2 == 0) a else b, k)
    }
    assert(BloomOps.merge(a, b).toSeq == whole.toSeq)
  }

  test("graft_bloom_contains expression: distributed probe matches " +
      "local, null filter/key → null") {
    val f = BloomOps.emptyFilter(4, 1024)
    BloomOps.add(f, UTF8String.fromString("present"))
    val d = df(
      StructType(Seq(StructField("s", StringType, nullable = true))),
      Seq(Row("present"), Row("absent-zzz"), Row(null)))
    val out = d.select(col("s"),
        call_function("graft_bloom_contains", lit(f), col("s")).as("c"))
      .collect().map(r => (r.getString(0), r.get(1))).toMap
    assert(out("present") == true)
    assert(out.contains(null) && out(null) == null)
  }

  test("dedupAgainstBloom equals dedupAgainst on mixed batch " +
      "(corpus dups, in-batch dups, new rows, null text)") {
    val corpus = docs(
      (1, "seen document alpha"), (2, "seen document beta"),
      (3, "seen document gamma"))
    val batch = docs(
      (10, "seen document alpha"), // dup vs corpus
      (11, "SEEN   DOCUMENT BETA"), // dup vs corpus after normalize
      (12, "fresh document one"),
      (13, "fresh document one"), // in-batch dup, keep id 12
      (14, "fresh document two"),
      (15, null))
    val expect = Dedup.dedupAgainst(corpus, batch, "text", "id")
      .select("id").collect().map(_.getInt(0)).toSeq.sorted
    val bloom = Dedup.buildFingerprintBloom(corpus, "text", 100, 0.01)
    val got = Dedup.dedupAgainstBloom(corpus, batch, "text", "id", bloom)
      .select("id").collect().map(_.getInt(0)).toSeq.sorted
    assert(got == expect)
    assert(got == Seq(12, 14, 15))
  }

  test("dedupAgainstBloom survives an adversarially tiny filter " +
      "(every probe a false positive → exact check does all the work)") {
    val corpus = docs((1, "seen document alpha"))
    val batch = docs((10, "fresh one"), (11, "fresh two"),
      (12, "seen document alpha"))
    val bloom = {
      val f = BloomOps.emptyFilter(1, 8)
      // saturate: all bits set → contains() always true
      java.util.Arrays.fill(f, 12, f.length, 0xff.toByte)
      f
    }
    val got = Dedup.dedupAgainstBloom(corpus, batch, "text", "id", bloom)
      .select("id").collect().map(_.getInt(0)).toSeq.sorted
    assert(got == Seq(10, 11))
  }

  test("one-shot overload builds and applies in a single call") {
    val corpus = docs((1, "seen document alpha"))
    val batch = docs((10, "seen document alpha"), (11, "brand new"))
    val got = Dedup.dedupAgainstBloom(
        corpus, batch, "text", "id", expectedItems = 10L, fpp = 0.01)
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(11))
  }

  test("sharded BloomOps: sizing splits past the shard-byte ceiling, " +
      "routing is stable, and added keys are ALWAYS contained") {
    // 2000 items at 1% fpp ≈ 2.4 KB of bits; a 512-byte ceiling forces
    // ≥ 5 shards — the same split a >2 GiB filter would make at the
    // real JVM ceiling
    val (k, hashes, bitsPerShard) =
      BloomOps.shardedSizing(2000, 0.01, maxShardBytes = 512)
    assert(k >= 5, s"expected >=5 shards, got $k")
    assert(bitsPerShard / 8 <= 512)
    val shards = BloomOps.emptyShards(k, hashes, bitsPerShard)
    val keys = (0 until 2000).map(i => UTF8String.fromString(s"key-$i"))
    keys.foreach(BloomOps.addSharded(shards, _))
    keys.foreach { key =>
      assert(BloomOps.routeShard(key, k) == BloomOps.routeShard(key, k))
      assert(BloomOps.containsSharded(shards, key),
        s"false negative for $key")
    }
    // routing actually spreads keys: every shard owns some
    val perShard = keys.groupBy(BloomOps.routeShard(_, k))
    assert(perShard.size == k, s"only ${perShard.size} of $k shards used")
  }

  test("graft_bloom_shard expression routes identically to " +
      "BloomOps.routeShard") {
    val d = docs((0 until 200).map(i => (i, s"text-$i")): _*)
    val got = d.select(col("text"),
        call_function("graft_bloom_shard", col("text"), lit(7)).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    got.foreach { case (t, s) =>
      assert(s == BloomOps.routeShard(UTF8String.fromString(t), 7))
    }
  }

  test("buildShardedFingerprintBloom with one shard reproduces " +
      "buildFingerprintBloom byte-for-byte") {
    val corpus = docs((0 until 50).map(i => (i, s"doc body $i")): _*)
    val single = Dedup.buildFingerprintBloom(corpus, "text", 50, 0.01)
    val sharded = Dedup.buildShardedFingerprintBloom(corpus, "text", 50,
      0.01)
    assert(sharded.length == 1)
    assert(sharded(0).toSeq == single.toSeq)
  }

  test("sharded dedupAgainstBloom (forced multi-shard) equals " +
      "dedupAgainst on mixed batch") {
    val corpus = docs((0 until 300).map(i =>
      (i, s"history document $i body")): _*)
    val batch = docs(
      (1000, "history document 7 body"), // dup vs corpus
      (1001, "fresh document one"),
      (1002, "fresh document one"), // in-batch dup
      (1003, "fresh document two"),
      (1004, null))
    // tiny shard ceiling → the 300-item filter splits into ≥2 shards
    val shards = Dedup.buildShardedFingerprintBloom(
      corpus, "text", 300, 0.01, maxShardBytes = 64)
    assert(shards.length >= 2)
    val expect = Dedup.dedupAgainst(corpus, batch, "text", "id")
      .select("id").collect().map(_.getInt(0)).toSeq.sorted
    val got = Dedup.dedupAgainstBloom(corpus, batch, "text", "id", shards)
      .select("id").collect().map(_.getInt(0)).toSeq.sorted
    assert(got == expect)
    assert(got == Seq(1001, 1003, 1004))
  }

  test("sharded dedupAgainstBloom ships shard bytes by BROADCAST — " +
      "no binary literal of any size survives in the plan") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, BinaryType}
    val corpus = docs((0 until 300).map(i =>
      (i, s"history document $i body")): _*)
    val batch = docs(
      (1000, "history document 7 body"), (1001, "fresh document"))
    val shards = Dedup.buildShardedFingerprintBloom(
      corpus, "text", 300, 0.01, maxShardBytes = 64)
    assert(shards.length >= 2)
    val out = Dedup.dedupAgainstBloom(corpus, batch, "text", "id", shards)
    // sharding exists for filters past the 2 GiB array ceiling; a plan
    // literal of the shard array would serialize those GiB into every
    // task — assert NO binary(-array) literal reaches the plan at all
    val lits = out.queryExecution.analyzed
      .collect { case p => p.expressions }.flatten
      .flatMap(_.collect {
        case l: Literal if l.dataType == BinaryType ||
            l.dataType.isInstanceOf[ArrayType] &&
            l.dataType.asInstanceOf[ArrayType].elementType == BinaryType =>
          l
      })
    assert(lits.isEmpty,
      s"shard bytes leaked into the plan as ${lits.size} literal(s)")
    assert(out.select("id").collect().map(_.getInt(0)).toSeq.sorted ==
      Seq(1001))
  }

  test("sharded dedupAgainstBloom Broadcast overload: one handle " +
      "reused across batches, results equal dedupAgainst") {
    val corpus = docs((0 until 300).map(i =>
      (i, s"history document $i body")): _*)
    val shards = Dedup.buildShardedFingerprintBloom(
      corpus, "text", 300, 0.01, maxShardBytes = 64)
    val bc = spark.sparkContext.broadcast(shards)
    try {
      val b1 = docs((1000, "history document 7 body"), (1001, "fresh one"))
      val b2 = docs((2000, "history document 9 body"), (2001, "fresh two"),
        (2002, null))
      for (b <- Seq(b1, b2)) {
        val expect = Dedup.dedupAgainst(corpus, b, "text", "id")
          .select("id").collect().map(_.getInt(0)).toSeq.sorted
        val got = Dedup.dedupAgainstBloom(corpus, b, "text", "id", bc)
          .select("id").collect().map(_.getInt(0)).toSeq.sorted
        assert(got == expect)
      }
    } finally bc.destroy()
  }

  test("plan: the history leg reaches the exact-check join with no " +
      "upstream exchange (history scanned, never shuffled)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val corpus = docs((0 until 400).map(i =>
      (i, s"history document number $i with a body")): _*)
    val batch = docs(
      (1000, "history document number 7 with a body"), // true dup
      (1001, "a definitely new document"))
    val bloom = Dedup.buildFingerprintBloom(corpus, "text", 400, 0.01)
    val out = Dedup.dedupAgainstBloom(corpus, batch, "text", "id", bloom)
    assert(out.select("id").collect().map(_.getInt(0)).toSeq == Seq(1001))
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => Seq(other)
    }.flatten
    val nodes = unwrap(out.queryExecution.executedPlan)
    // the history-pruning semi join: AQE broadcasts the (tiny)
    // positive fingerprint set; the streamed history side must be
    // scan + project only — no exchange
    val semis = nodes.collect {
      case j: BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, "history prune must broadcast the positives")
    semis.foreach { j =>
      val streamed = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
        case _ => j.right
      }
      val shuffles = unwrap(streamed)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"history leg shuffled before the prune join:\n$streamed")
    }
  }
}
