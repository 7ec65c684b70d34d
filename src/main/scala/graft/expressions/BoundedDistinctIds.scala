package graft.expressions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded distinct-id set aggregate: collects a group's distinct ids
  * as a SORTED array, but freezes the buffer the moment it would
  * exceed `cap` distinct elements — the group is then known to fail a
  * `size <= cap` filter, and nothing more is ever buffered for it.
  *
  * Why a custom aggregate: `collect_set(...)` followed by
  * `where(size(...) <= cap)` materializes the ENTIRE set before the
  * filter discards it — a df = 10⁹ stop-shingle builds a 10⁹-element
  * aggregation state in one final-agg task (straggler/spill-storm)
  * that the filter then throws away. Pre-counting df and semi-joining
  * bounds the state but pays an extra shuffle of the raw occurrence
  * table. This aggregate gets both: ONE exchange (the group-by the
  * collect always paid) and per-group state ≤ cap + 1 ids BY
  * CONSTRUCTION, map-side partials included.
  *
  * Correctness of the freeze: partial buffers only ever truncate at
  * cap + 1 distinct elements, and cap + 1 distinct elements already
  * prove `size > cap` for the whole group — so groups that pass the
  * filter carry their EXACT sorted distinct set (no truncation can
  * have happened below cap + 1), and groups that fail are dropped
  * whatever their frozen contents. Merging treats an overflowed side
  * as terminal.
  *
  * Output order is ascending (sorted insert), matching
  * `sort_array(collect_set(...))`. Null ids are the caller's concern
  * (filter before aggregating, as `collect_set` would drop them).
  */
class BoundedDistinctIds(cap: Int)
    extends Aggregator[Long, scala.collection.Seq[Long], Seq[Long]] {
  require(cap >= 1, "cap must be positive")

  // Buffer representation: a FLAT primitive long array (wrapped as
  // `ArraySeq.ofLong` so the buffer is still a Seq for the encoder
  // and the specs). The state is ≤ cap + 1 elements, so a sorted
  // insert is one exact-size allocation + two `System.arraycopy`
  // memmoves — no per-element boxing, no Vector node surgery (the
  // previous take/drop/++ paid O(cap) OBJECT churn per incoming row).
  // Duplicate ids (the common case on Zipf postings) and frozen
  // groups allocate nothing at all.

  private type Buf = scala.collection.Seq[Long]

  private def arr(buf: Buf): Array[Long] = buf match {
    case a: scala.collection.mutable.ArraySeq.ofLong => a.array
    case other => other.toArray // deserialized / caller-supplied form
  }

  private def wrap(a: Array[Long]): Buf =
    new scala.collection.mutable.ArraySeq.ofLong(a)

  override def zero: Buf = wrap(Array.emptyLongArray)

  override def reduce(buf: Buf, x: Long): Buf =
    if (buf.size > cap) buf // overflowed: frozen, group is doomed
    else {
      val a = arr(buf)
      val i = search(a, x)
      if (i < a.length && a(i) == x) buf
      else {
        val out = new Array[Long](a.length + 1)
        System.arraycopy(a, 0, out, 0, i)
        out(i) = x
        System.arraycopy(a, i, out, i + 1, a.length - i)
        wrap(out)
      }
    }

  /** Two-pointer sorted-dedup merge over the primitive arrays,
    * stopping at cap + 1 elements (enough to prove the group fails
    * the size filter — and unlike an insert fold, the kept prefix is
    * the union's SMALLEST cap + 1, independent of partial order).
    */
  override def merge(b1: Buf, b2: Buf): Buf =
    if (b1.size > cap) b1
    else if (b2.size > cap) b2
    else {
      val a = arr(b1)
      val b = arr(b2)
      val out = new Array[Long](math.min(a.length + b.length, cap + 1))
      var i = 0
      var j = 0
      var k = 0
      // each side is sorted-distinct, so cross-duplicates only meet
      // head-to-head — consume both pointers on a tie
      while (k < out.length && (i < a.length || j < b.length)) {
        out(k) =
          if (j >= b.length) { i += 1; a(i - 1) }
          else if (i >= a.length) { j += 1; b(j - 1) }
          else if (a(i) < b(j)) { i += 1; a(i - 1) }
          else if (b(j) < a(i)) { j += 1; b(j - 1) }
          else { i += 1; j += 1; a(i - 1) }
        k += 1
      }
      if (k == out.length) wrap(out)
      else wrap(java.util.Arrays.copyOf(out, k))
    }

  override def finish(buf: Buf): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(arr(buf))

  // first index with a(i) >= x (a sorted ascending)
  private def search(a: Array[Long], x: Long): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def bufferEncoder
    : org.apache.spark.sql.Encoder[scala.collection.Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[scala.collection.Seq[Long]]()

  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BoundedDistinctIds {
  /** Column function: `boundedDistinctIds(cap)(idCol)` aggregates to
    * the sorted distinct-id array when the group holds ≤ cap distinct
    * ids, or a frozen (cap + 1)-element array otherwise — always
    * follow with `where(size(...) <= cap)`.
    */
  def boundedDistinctIds(cap: Int): Column => Column = {
    val fn = udaf(new BoundedDistinctIds(cap), Encoders.scalaLong)
    (id: Column) => fn.apply(id)
  }
}
