package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Self-describing Bloom filter over string keys, as an aggregate
  * (build) plus a codegen'd membership expression (probe).
  *
  * Purpose: the incremental-dedup prefilter. `Dedup.dedupAgainst`
  * must ask "has this fingerprint been seen?" against an arbitrarily
  * large history; the exact answer is an anti-join that SHUFFLES the
  * history's fingerprint set on every batch. A Bloom filter built once
  * over the history answers "definitely not seen" for the typical
  * almost-all-new batch row with zero shuffle — only the (dup-rate +
  * false-positive-rate)-sized remainder needs the exact check, and the
  * filter bytes are reusable across every subsequent batch (the same
  * build-once lifecycle as [[graft.similarity.Similarity]]'s IVF
  * index).
  *
  * Layout (self-describing so probe needs no out-of-band params):
  * 4 bytes numHashes (big-endian int) ++ 8 bytes numBits (big-endian
  * long) ++ ceil(numBits/8) bitmap bytes.
  *
  * Hashing is the repo's Carter-Wegman md5 family (minhash,
  * `Dedup.scala`): md5(key) → two unsigned-ish 64-bit halves (h1, h2);
  * probe i sets/tests bit floorMod(h1 + i·h2, numBits). NO false
  * negatives by construction — a key that was added always probes the
  * bits it set — which is the property the dedup prefilter's
  * correctness rests on; false positives only cost a redundant exact
  * check. The filter bytes are deterministic given the same key SET
  * (bit-OR is commutative), independent of partitioning and row order.
  */
object BloomOps {

  /** Classic sizing: bits for `n` expected items at false-positive
    * rate `fpp` (m = -n·ln p / ln²2), rounded up to a byte boundary.
    */
  def bitsFor(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, "need n > 0 and 0 < fpp < 1")
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    ((m.toLong + 7) / 8) * 8
  }

  /** Optimal probe count for a given bits-per-item ratio (k = m/n·ln2,
    * at least 1).
    */
  def hashesFor(numBits: Long, n: Long): Int =
    math.max(1, math.round(numBits.toDouble / n * math.log(2)).toInt)

  private val HEADER = 12

  def emptyFilter(numHashes: Int, numBits: Long): Array[Byte] = {
    require(numHashes >= 1, "numHashes must be positive")
    require(numBits >= 8 && numBits % 8 == 0,
      "numBits must be a positive multiple of 8")
    // JVM byte arrays cap at Int.MaxValue: ~1.8e9 items at fpp=0.01 is
    // one doubling from the ceiling — fail fast with the actual
    // remedy instead of a NegativeArraySizeException inside the agg
    require(numBits / 8 <= Int.MaxValue.toLong - HEADER,
      s"filter of $numBits bits exceeds the JVM array ceiling — " +
        "raise fpp or shard the filter (one per fingerprint prefix)")
    val bytes = new Array[Byte](HEADER + (numBits / 8).toInt)
    bytes(0) = (numHashes >>> 24).toByte
    bytes(1) = (numHashes >>> 16).toByte
    bytes(2) = (numHashes >>> 8).toByte
    bytes(3) = numHashes.toByte
    var i = 0
    while (i < 8) { bytes(4 + i) = (numBits >>> (56 - 8 * i)).toByte; i += 1 }
    bytes
  }

  def numHashes(f: Array[Byte]): Int =
    ((f(0) & 0xff) << 24) | ((f(1) & 0xff) << 16) |
      ((f(2) & 0xff) << 8) | (f(3) & 0xff)

  def numBits(f: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (f(4 + i) & 0xffL); i += 1 }
    v
  }

  /** (h1, h2) from md5 — the same two-half split the minhash family
    * uses, here over the full 128-bit digest.
    */
  private def halves(keyBytes: Array[Byte]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(keyBytes)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(8 + i) & 0xffL)
      i += 1
    }
    (h1, h2)
  }

  def add(f: Array[Byte], key: UTF8String): Unit = {
    val (h1, h2) = halves(key.getBytes)
    val bits = numBits(f)
    val k = numHashes(f)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, bits)
      f(HEADER + (pos >>> 3).toInt) =
        (f(HEADER + (pos >>> 3).toInt) | (1 << (pos & 7).toInt)).toByte
      i += 1
    }
  }

  /** Probe; called from both interpreted eval and generated code. */
  def contains(f: Array[Byte], key: UTF8String): Boolean = {
    val (h1, h2) = halves(key.getBytes)
    val bits = numBits(f)
    val k = numHashes(f)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, bits)
      if ((f(HEADER + (pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length &&
      numHashes(a) == numHashes(b) && numBits(a) == numBits(b),
      "cannot merge Bloom filters with different parameters")
    var i = HEADER
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  // -- sharding (capacity past the JVM array ceiling) ---------------- //

  /** Per-shard bitmap budget: a single JVM byte array caps the filter
    * at ~2 GiB (~1.8e9 items at 1 % fpp). Past that, the fingerprint
    * space is partitioned into independent shards — shard routing is
    * `floorMod(h1, k)` on the SAME md5 half the in-filter probes use,
    * so add and probe always agree, and each shard is a standalone
    * self-describing filter that every existing operation accepts.
    */
  val MaxShardBytes: Int = Int.MaxValue - 128

  /** Which of `numShards` filters owns `key`. */
  def routeShard(key: UTF8String, numShards: Int): Int = {
    val (h1, _) = halves(key.getBytes)
    java.lang.Math.floorMod(h1, numShards.toLong).toInt
  }

  /** (numShards, numHashes, bitsPerShard) for `n` items at `fpp`:
    * the classic single-filter sizing, split across the fewest shards
    * whose bitmaps each fit `maxShardBytes`. Keys spread ~uniformly
    * (md5 routing), so each shard holds ~n/k items in totalBits/k
    * bits — the same bits-per-item ratio, hence the same fpp, as the
    * unsharded filter.
    */
  def shardedSizing(
      n: Long, fpp: Double,
      maxShardBytes: Int = MaxShardBytes): (Int, Int, Long) = {
    require(maxShardBytes >= 8, "maxShardBytes must be at least 8")
    val totalBits = bitsFor(n, fpp)
    val maxBitsPerShard = maxShardBytes.toLong * 8
    val shards = ((totalBits + maxBitsPerShard - 1) / maxBitsPerShard).toInt
    val bitsPerShard = (((totalBits / shards) + 7) / 8) * 8
    (shards, hashesFor(totalBits, n), bitsPerShard)
  }

  /** `numShards` freshly-zeroed same-parameter filters. */
  def emptyShards(
      numShards: Int, numHashes: Int,
      bitsPerShard: Long): Array[Array[Byte]] = {
    require(numShards >= 1, "numShards must be positive")
    Array.fill(numShards)(emptyFilter(numHashes, bitsPerShard))
  }

  /** Probe a sharded filter (route, then the standard single-filter
    * probe). A 1-shard array degenerates to the plain filter exactly.
    */
  def containsSharded(shards: Array[Array[Byte]], key: UTF8String): Boolean =
    contains(shards(routeShard(key, shards.length)), key)

  /** Add to a sharded filter. */
  def addSharded(shards: Array[Array[Byte]], key: UTF8String): Unit =
    add(shards(routeShard(key, shards.length)), key)

  /** OR-merge sharded filters pairwise (same shard count + params). */
  def mergeSharded(
      a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    require(a.length == b.length,
      "cannot merge sharded Bloom filters with different shard counts")
    var i = 0
    while (i < a.length) { merge(a(i), b(i)); i += 1 }
    a
  }
}

/** Distributed Bloom build: one partial filter per partition (the
  * buffer is a plain byte array mutated in place — a
  * TypedImperativeAggregate, serialized only at the partial/final
  * merge boundary), OR-merged to the final bytes. Null keys are
  * skipped: a null fingerprint can never collide, and the dedup
  * operator routes null-keyed rows around the filter (anti-join
  * null-key semantics: never matches, always survives).
  */
class BloomBuild(numHashes: Int, numBits: Long)
    extends Aggregator[String, Array[Byte], Array[Byte]] {

  override def zero: Array[Byte] = BloomOps.emptyFilter(numHashes, numBits)

  override def reduce(buf: Array[Byte], key: String): Array[Byte] = {
    if (key != null) BloomOps.add(buf, UTF8String.fromString(key))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomOps.merge(a, b)

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomBuild {
  /** Column aggregate: `bloomAgg(numHashes, numBits)(keyCol)`. */
  def bloomAgg(numHashes: Int, numBits: Long): Column => Column = {
    val fn = udaf(new BloomBuild(numHashes, numBits), Encoders.STRING)
    (key: Column) => fn.apply(key)
  }
}

/** `graft_bloom_contains(filter: binary, key: string) -> boolean`,
  * codegen'd (registered by [[graft.GraftExtensions]]). Null filter or
  * null key → null, standard binary-expression semantics — callers
  * that need anti-join null behavior coalesce to false.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(f: Any, key: Any): Any =
    BloomOps.contains(
      f.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, key) =>
      s"${ev.value} = graft.expressions.BloomOps.contains($f, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** `graft_bloom_shard(key: string, numShards: int) -> int`, codegen'd
  * (registered by [[graft.GraftExtensions]]): which shard of a sharded
  * Bloom filter owns `key` — the Spark-side twin of
  * [[BloomOps.routeShard]], so distributed builds (group fingerprints
  * by shard, one filter aggregate per group) route identically to the
  * driver-side add/probe.
  */
case class BloomShard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bloom_shard"

  override protected def nullSafeEval(key: Any, k: Any): Any =
    BloomOps.routeShard(key.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, k) =>
      s"${ev.value} = graft.expressions.BloomOps.routeShard($key, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomShard =
    copy(left = newLeft, right = newRight)
}
