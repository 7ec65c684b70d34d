package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch (DataSketches KLL) as a distributed
  * aggregate — the quantile sibling of the datasheet's HLL vocabulary
  * sketch: per-shard sketches are built independently, persist as
  * binary columns, and union by sketch-merge, so a corpus-wide token-
  * length (or latency, or score) distribution updates per ingest batch
  * WITHOUT rescanning history. Exact percentiles are neither additive
  * nor mergeable; a KLL sketch is both, with a proven rank-error bound
  * (~1.65 % at k = 200 with 99 % confidence, shrinking as k grows).
  *
  * Spark ships HLL sketch SQL built-ins but no KLL ones, hence this
  * aggregate. The buffer is the LIVE heap sketch object
  * (ObjectHashAggregate keeps aggregation buffers as deserialized
  * objects between rows — the same mechanism every Aggregator here
  * relies on), so per-row cost is the sketch's own amortized-O(1)
  * update, never a serialize round-trip; serialization happens only at
  * exchange/spill boundaries through [[KllBuf]]'s writeObject, which
  * delegates to the sketch's canonical compact byte form.
  *
  * Determinism contract (the oracle argument): below the sketch's
  * first compaction (~3k retained items for parameter `k`) KLL stores
  * every value exactly and `getQuantile(r, INCLUSIVE)` equals the
  * exact inclusive order statistic — the smallest value whose
  * cumulative fraction ≥ r (`cume_dist`-style) — independent of
  * insertion order and merge tree. Above it, compaction is randomized
  * (per the KLL paper) and results are approximate within the rank
  * bound; correctness-gated queries size `k` so oracle-scale groups
  * stay in the exact regime, while 1000×-larger bench/production
  * groups degrade gracefully to the published error — which is the
  * point of a sketch.
  */
object KllQuantile {

  /** Serialization shell: live sketch in memory, canonical compact
    * bytes on the wire (Java serialization hooks delegate to the
    * DataSketches byte form — no reflective field serialization of
    * library internals).
    */
  final class KllBuf(@transient var sk: KllDoublesSketch)
      extends java.io.Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** Aggregate raw double values to a serialized KLL sketch. Nulls are
    * the caller's concern (filter first), like the other aggregates
    * here.
    */
  class SketchAgg(k: Int)
      extends Aggregator[Double, KllBuf, Array[Byte]] {
    require(k >= 8 && k <= 65535, "k must be in [8, 65535]")
    override def zero: KllBuf =
      new KllBuf(KllDoublesSketch.newHeapInstance(k))
    override def reduce(buf: KllBuf, v: Double): KllBuf = {
      buf.sk.update(v); buf
    }
    override def merge(b1: KllBuf, b2: KllBuf): KllBuf = {
      b1.sk.merge(b2.sk); b1
    }
    override def finish(buf: KllBuf): Array[Byte] = buf.sk.toByteArray
    override def bufferEncoder: Encoder[KllBuf] =
      Encoders.javaSerialization[KllBuf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate already-serialized sketches (shard rows) by merge — the
    * union side of the algebra, [[SketchAgg]]'s `hll_union_agg`
    * analogue. Input rows are sketch-count-sized, so the per-row
    * heapify is paid once per SHARD, never per data row.
    */
  class UnionAgg(k: Int)
      extends Aggregator[Array[Byte], KllBuf, Array[Byte]] {
    override def zero: KllBuf =
      new KllBuf(KllDoublesSketch.newHeapInstance(k))
    override def reduce(buf: KllBuf, v: Array[Byte]): KllBuf = {
      if (v != null)
        buf.sk.merge(KllDoublesSketch.heapify(Memory.wrap(v)))
      buf
    }
    override def merge(b1: KllBuf, b2: KllBuf): KllBuf = {
      b1.sk.merge(b2.sk); b1
    }
    override def finish(buf: KllBuf): Array[Byte] = buf.sk.toByteArray
    override def bufferEncoder: Encoder[KllBuf] =
      Encoders.javaSerialization[KllBuf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `kllSketch(k)(valueCol)` — aggregate values to sketch bytes. */
  def kllSketch(k: Int): Column => Column = {
    val fn = udaf(new SketchAgg(k), Encoders.scalaDouble)
    (v: Column) => fn.apply(v)
  }

  /** `kllUnion(k)(sketchCol)` — merge sketch-bytes rows. */
  def kllUnion(k: Int): Column => Column = {
    val fn = udaf(new UnionAgg(k), Encoders.BINARY)
    (v: Column) => fn.apply(v)
  }

  /** INCLUSIVE quantile of a serialized sketch — in the exact regime,
    * the smallest value whose cumulative fraction ≥ `rank` (replay:
    * `cume_dist() >= rank` order statistic). The scalar runs over
    * group-cardinality finalized-sketch rows, never data rows, so a
    * udf is the honest cost model here (the Bloom-probe argument: no
    * built-in can open the sketch).
    */
  def kllQuantile(sketch: Column, rank: Double): Column = {
    require(rank > 0 && rank <= 1, "rank must be in (0, 1]")
    val fn = org.apache.spark.sql.functions.udf {
      (b: Array[Byte]) =>
        if (b == null) null
        else {
          val sk = KllDoublesSketch.heapify(Memory.wrap(b))
          if (sk.isEmpty) null
          else java.lang.Double.valueOf(
            sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE))
        }
    }
    fn(sketch)
  }

  /** Count of values the sketch has seen (exact — KLL tracks n). */
  def kllN(sketch: Column): Column = {
    val fn = org.apache.spark.sql.functions.udf {
      (b: Array[Byte]) =>
        if (b == null) null
        else java.lang.Long.valueOf(
          KllDoublesSketch.heapify(Memory.wrap(b)).getN)
    }
    fn(sketch)
  }
}
