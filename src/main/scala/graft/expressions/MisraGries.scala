package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter sketch as a distributed aggregate: bounded
  * state of at most `k` (value, weight) counters per partial buffer,
  * merged with the counter-subtraction rule of Agarwal et al.,
  * "Mergeable Summaries" (PODS 2012).
  *
  * Guarantee (the reason this is usable as an EXACT operator's first
  * phase): after any sequence of reduces and merges over N items, every
  * value whose true count exceeds N/(k+1) is present in the sketch.
  * The sketch may also hold false positives and its weights are only
  * lower-ish bounds — so callers verify candidates with an exact
  * filtered count ([[graft.operators.Analytics.heavyHitters]]), and the
  * final result carries no approximation at all.
  *
  * Why not `groupBy(value).count()` directly: at corpus scale the full
  * grouped count shuffles one row PER DISTINCT VALUE (billions for
  * n-grams/tokens), when only the > N/(k+1) survivors — at most k of
  * them — are wanted. The sketch's shuffle payload is ≤ k counters per
  * partition, constant in both corpus size and distinct-value count;
  * the verify pass then groups only rows matching the ≤ k candidates.
  */
class MisraGriesSketch(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(
      buf: Map[String, Long], v: String): Map[String, Long] = {
    if (v == null) buf // null carries no frequency information
    else buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < k => buf.updated(v, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros —
        // amortized O(1) per item over a stream, O(k) here
        buf.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }
  }

  override def merge(
      b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest weight from all counters and
      // drop the non-positive — the mergeability construction that
      // preserves the N/(k+1) retention bound
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted // deterministic candidate order

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MisraGriesSketch {
  /** Column function: `sketch(k)(valueCol)` aggregates to the sorted
    * array of candidate values (superset of every value with count
    * > N/(k+1)).
    */
  def sketch(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesSketch(k), Encoders.STRING)
    (v: Column) => fn.apply(v)
  }

  /** Counter-preserving variant: aggregates to the `(value → weight)`
    * map itself instead of just the candidate list — the shard
    * representation for [[graft.quality.HeavyHitters]]'s mergeable
    * store (weights are the residual MG counters: lower bounds on
    * true counts, within N/(k+1) of exact).
    */
  def counters(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesCounters(k), Encoders.STRING)
    (v: Column) => fn.apply(v)
  }
}

/** [[MisraGriesSketch]] with the counter map as the OUTPUT (same
  * bounded-state reduce/merge; `finish` is identity instead of
  * key-projection) — used where downstream needs mergeable weights,
  * not only membership.
  */
class MisraGriesCounters(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  private val inner = new MisraGriesSketch(k)

  override def zero: Map[String, Long] = inner.zero

  override def reduce(
      buf: Map[String, Long], v: String): Map[String, Long] =
    inner.reduce(buf, v)

  override def merge(
      b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    inner.merge(b1, b2)

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
