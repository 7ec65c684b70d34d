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

  /** t-closeness audit over an ORDERED sensitive attribute —
    * [[lDiversityReport]]'s distributional successor: a class can be
    * l-diverse and still disclose ("all five salaries in this class
    * are in the top decile"), so Li, Li & Venkatasubramanian bound
    * how far each class's sensitive DISTRIBUTION may sit from the
    * table's global one. For numeric/ordinal attributes the distance
    * is the ordered earth-mover's distance with the m distinct
    * values treated as equally spaced:
    * `EMD = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m − 1)` — the
    * [[Drift.wassersteinTest]] machinery pointed at a privacy bar.
    * Emits the violator WORKLIST (the [[kAnonymityViolators]]
    * stance): one row per class with its size and EMD, flagged past
    * `t`.
    *
    * Exactness: with Nc = class rows, Ng = table rows, the
    * cumulative-share gap at value i is the exact integer
    * `cumᶜᵢ·Ng − cumᵍᵢ·Nc`; |gaps| sum in DECIMAL(38,0) and
    * `EMD = Σ/(Nc·Ng·(m−1))` is ONE double division — bit-identical
    * cross-engine.
    *
    * Scale contract: the sensitive attribute must be LOW-CARDINALITY
    * (bucketed salaries, status codes — the regime where t-closeness
    * is defined and auditable); the class × value grid is
    * `classes·m` rows. The grid is built by cross-joining the class
    * domain with the m-row value domain so classes MISSING a value
    * still accumulate the global share there (skipping them would
    * understate EMD exactly where disclosure is worst).
    */
  def tClosenessReport(
      df: DataFrame, quasiCols: Seq[String], sensitive: Column,
      t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(t > 0.0 && t < 1.0, "t must be in (0, 1)")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val qcols = quasiCols.map(col)
    val base = df
      .select(qcols :+ sensitive.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
    val perCell = base.groupBy(qcols :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .transform(graft.core.CacheScope.disk)
    val values = perCell.groupBy(col("__v"))
      .agg(sum(col("__c")).as("__g"))
    val classes = perCell.groupBy(qcols: _*)
      .agg(sum(col("__c")).as("class_size"))
    val grid = classes.crossJoin(broadcast(values))
      .join(perCell, quasiCols :+ "__v", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val wOrd = Window.partitionBy(qcols: _*).orderBy(col("__v").asc)
    val w = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wAll = Window.partitionBy(qcols: _*)
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val cum = grid
      .withColumn("__cc", sum(col("__c")).over(w))
      .withColumn("__cg", sum(col("__g")).over(w))
      .withColumn("__ng", sum(col("__g")).over(wAll))
      .withColumn("__m", count(lit(1)).over(wAll))
    val gap = dec(col("__cc")) * dec(col("__ng")) -
      dec(col("__cg")) * dec(col("class_size"))
    val agg = cum
      .groupBy(qcols :+ col("class_size"): _*)
      .agg(max(col("__ng")).as("__ng"), max(col("__m")).as("__m"),
        sum(abs(gap)).as("__s"))
    val emd = col("__s").cast("double") /
      (dec(col("class_size")) * dec(col("__ng")) *
        (dec(col("__m")) - lit(1))).cast("double")
    agg.select(qcols ++ Seq(col("class_size"),
      round(when(col("__m") > 1L, emd), 6).as("emd"),
      when(col("__m") > 1L, (emd > t).cast("int"))
        .otherwise(lit(null).cast("int")).as("violates")): _*)
  }
}
