package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits over tabular data — the compliance siblings of
  * [[graft.text.TextAnalysis.piiIncidence]] (which covers free text).
  */
object Privacy {

  /** k-anonymity audit: group rows by the quasi-identifier columns
    * (the attributes an adversary could link on — zip, age band,
    * segment), and report the equivalence-class SIZE distribution —
    * one row per class size with how many classes and rows sit at
    * that size, flagged when the size is below `k`. A release is
    * k-anonymous iff no flagged rows exist; the histogram shows how
    * far from it the table is and how much suppression/generalization
    * would cost.
    *
    * Deliberately emits sizes, never the quasi-identifier VALUES of
    * small classes — the audit must not itself become the disclosure.
    * Null quasi-identifier values form classes of their own (null is
    * linkable too). Two aggregations: one on the quasi-identifier
    * (map-side combined, the only corpus-sized shuffle), one on the
    * class size (class-count-sized).
    */
  def kAnonymityReport(
      df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, "k must be >= 2")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    classes.groupBy(col("__sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("__sz")).as("n_rows"))
      .withColumn("violates", col("class_size") < k)
  }

  /** Rows that would need suppression or generalization to reach
    * k-anonymity: the members of classes smaller than `k`, with their
    * class size appended — the worklist the audit's histogram prices.
    */
  def kAnonymityViolators(
      df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(!df.columns.exists(c => c.startsWith("__q_") ||
        c == "class_size"),
      "input must not have __q_-prefixed or class_size columns")
    // the small-class frame renames its keys: a same-name self-join
    // on columns derived from `df` would be ambiguous
    val small = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+
        col("class_size"): _*)
    val cond: Column = quasiCols
      .map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(small, cond)
      .select(df.columns.map(col) :+ col("class_size"): _*)
  }

  /** Distinct l-diversity audit — [[kAnonymityReport]]'s sensitive-
    * attribute sibling: k-anonymity bounds how many people share a
    * quasi-identifier class, but if every member of a class shares
    * the same SENSITIVE value the class still discloses it
    * (Machanavajjhala et al.'s homogeneity attack). Groups rows by
    * the quasi-identifiers, counts DISTINCT sensitive values per
    * class, and reports the diversity histogram: one row per
    * distinct-count with how many classes and rows sit there, flagged
    * below `l`. Same non-disclosure stance as the k-audit: sizes
    * only, never the small classes' values. Null sensitive values
    * count as a value (null is a disclosure too — "status withheld"
    * identifies). Two aggregations, the first map-side combined on
    * (quasi, sensitive) — the only corpus-sized shuffle.
    */
  def lDiversityReport(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, "l must be >= 2")
    val qcols = quasiCols.map(col)
    // (quasi, sensitive)-grouped first so the distinct count is a
    // plain count over pre-deduped rows, never an expensive
    // count_distinct buffer per class
    val perValue = df.groupBy((qcols :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__rows"))
    val classes = perValue.groupBy(qcols: _*)
      .agg(count(lit(1)).as("__distinct"),
        sum(col("__rows")).as("__sz"))
    classes.groupBy(col("__distinct").as("distinct_sensitive"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("__sz")).as("n_rows"))
      .withColumn("violates", col("distinct_sensitive") < l)
  }
}
