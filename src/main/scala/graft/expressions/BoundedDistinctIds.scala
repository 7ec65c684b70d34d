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
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(cap >= 1, "cap must be positive")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.size > cap) buf // overflowed: frozen, group is doomed
    else {
      val i = search(buf, x)
      if (i < buf.size && buf(i) == x) buf
      else (buf.take(i) :+ x) ++ buf.drop(i)
    }

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    if (b1.size > cap) b1
    else if (b2.size > cap) b2
    else b2.foldLeft(b1)(reduce)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  // first index with buf(i) >= x (buf sorted ascending)
  private def search(buf: Seq[Long], x: Long): Int = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def bufferEncoder
    : org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder
    : org.apache.spark.sql.Encoder[Seq[Long]] =
    bufferEncoder
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
