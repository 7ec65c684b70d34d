package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-cascade ablation report for corpus preparation.
  *
  * A training-data pipeline is a cascade of quality filters, and the
  * first question every datasheet answers is "what did each filter
  * cost me?" (the reference's validation reports — rules.py:40-260 —
  * answer it per-rule but never per-*cascade*). [[filterFunnel]]
  * produces the standard ablation table: for each stage, the rows
  * that reached it (survivors of every earlier stage), the rows it
  * rejected, and the rows ONLY it rejects (its sole-reject count —
  * the marginal value of keeping the filter at all; a filter whose
  * sole-reject count is 0 is fully shadowed by the rest of the
  * cascade and can be dropped without changing the surviving corpus).
  *
  * Scale design: ONE scan, ONE ungrouped aggregate. Every predicate
  * is evaluated once per row in a single projection (so a predicate
  * shared by two stages is still one regexp pass), all 3k counters
  * partial-aggregate map-side into a single row, and the per-stage
  * rows inline-generate from that row — the plan carries no join, no
  * shuffle beyond the final single-row reduce, and no second pass
  * however many stages the cascade has. At 100 TB this is the only
  * acceptable shape: the naive per-stage `df.filter(...).count()`
  * loop re-scans the corpus k times.
  *
  * Null predicate values count as REJECTED (a quality filter that
  * cannot evaluate a row must not pass it — same convention as the
  * reference's dropna-first rule ordering).
  */
object Funnel {

  /** @param filters ordered cascade of (name, predicate) stages;
    *                predicates are plain Columns over `df`'s columns.
    * @return one row per stage, in cascade order:
    *         (stage, filter, n_in, n_rejected, n_out, n_sole_reject,
    *         reject_frac) — `n_in` = survivors of stages < i,
    *         `n_out` = n_in − n_rejected (so the last stage's n_out
    *         is the surviving corpus), `n_sole_reject` counts rows
    *         failing THIS filter while passing every other.
    */
  def filterFunnel(
      df: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "filterFunnel needs at least one stage")
    val k = filters.size
    val flagged = df.select(filters.zipWithIndex.map {
      case ((_, p), i) => coalesce(p.cast("boolean"), lit(false)).as(s"_f$i")
    }: _*)
    def conj(idx: Seq[Int]): Column =
      idx.map(j => col(s"_f$j")).foldLeft(lit(true))(_ && _)
    val aggs = (0 until k).flatMap { i =>
      val reached = conj(0 until i)
      val others = conj((0 until k).filter(_ != i))
      Seq(
        sum(when(reached, 1L).otherwise(0L)).as(s"in_$i"),
        sum(when(reached && !col(s"_f$i"), 1L).otherwise(0L))
          .as(s"fail_$i"),
        sum(when(others && !col(s"_f$i"), 1L).otherwise(0L))
          .as(s"sole_$i"))
    }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stages = filters.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(i + 1).as("stage"), lit(name).as("filter"),
        coalesce(col(s"in_$i"), lit(0L)).as("n_in"),
        coalesce(col(s"fail_$i"), lit(0L)).as("n_rejected"),
        coalesce(col(s"in_$i") - col(s"fail_$i"), lit(0L)).as("n_out"),
        coalesce(col(s"sole_$i"), lit(0L)).as("n_sole_reject"),
        round(col(s"fail_$i").cast("double") /
          nullif(col(s"in_$i"), lit(0L)).cast("double"), 4)
          .as("reject_frac"))
    }
    one.select(explode(array(stages: _*)).as("s")).select("s.*")
  }
}
