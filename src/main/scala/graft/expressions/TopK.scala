package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** (id, score) pair ranked by [[TopKByScore]]. */
case class ScoredId(id: Long, score: Double)

/** Bounded top-k aggregate: keeps the k highest-scored entries per
  * group (score DESC, id ASC tie-break — the same total order the
  * window `row_number` ranking uses, so results are interchangeable).
  *
  * Why a custom aggregate: ranking per key with `row_number().over(
  * Window.partitionBy(key).orderBy(...))` shuffles EVERY scored row
  * and sorts each partition, then discards all but k. This aggregate's
  * partial (map-side) state is at most k entries per (key, partition),
  * so the shuffle carries ~k · partitions rows per key and nothing is
  * ever sorted but the k-element buffers. For ANN over a 100 TB corpus
  * — billions of scored candidates, k = 10 — that is the difference
  * between shuffling the candidate set and shuffling a constant per
  * key. This is the one place built-ins are insufficient (`max_by`
  * covers only k = 1), per SURVEY.md §2.10.
  *
  * The buffer is a sorted-desc array capped at k: O(k) insert on the
  * hot path (k is small by construction), O(k) merge.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k >= 1, "k must be positive")

  // total order via Double.compare (NaN sorts greatest, as in SQL
  // DESC ranking) — `>` alone is false in both directions for NaN,
  // which would drop NaN-scored entries from a full buffer and make
  // insertion order inconsistent
  private def lt(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size == k && !lt(x, buf.last)) buf
    else {
      val i = buf.indexWhere(e => lt(x, e)) match {
        case -1 => buf.size
        case j => j
      }
      val grown = (buf.take(i) :+ x) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

  override def merge(
      b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    b2.foldLeft(b1)(reduce)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    bufferEncoder
}

object TopKByScore {
  /** Column function: `topK(k)(idCol, scoreCol)` aggregates to the
    * array of the k top (id, score) structs, ranked score DESC / id
    * ASC.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScore(k), Encoders.product[ScoredId])
    (id: Column, score: Column) => fn.apply(id, score)
  }
}
