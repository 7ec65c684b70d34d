package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data valuation for labeled embedding corpora: exact KNN-Shapley
  * (Jia et al., VLDB 2019 — "Efficient Task-Specific Data Valuation
  * for Nearest Neighbor Algorithms"). For the K-NN utility the
  * Shapley value of every training point has a CLOSED FORM: with the
  * training points sorted by distance to a test point (α₁ nearest …
  * α_N farthest),
  *
  *   s(α_N) = 1[y_N = y_t] / N
  *   s(α_i) = s(α_{i+1}) + (1[y_i = y_t] − 1[y_{i+1} = y_t]) / max(K, i)
  *
  * — an O(N log N) recurrence per test point instead of the 2^N
  * subset enumeration generic Shapley needs. The per-point value over
  * an evaluation set (averaged) is THE principled "which training
  * examples help / hurt this task" reading — the data-curation
  * counterpart of [[Similarity.labelNoiseScreen]]'s geometric outlier
  * screen: a mislabeled-but-central point scores NEGATIVE here even
  * though the screen can't see it.
  *
  * Exactness: distances are exact BIGINT squared-L2 over micro-
  * quantized elements (ties broken by train id — a total order);
  * each recurrence term quantizes as `d_i · (1e9 div max(K, i))` —
  * the MAGNITUDE divides first (positive, so div == floor on both
  * engines) and the ±1 sign multiplies after, sidestepping the
  * truncate-vs-floor divergence on negative numerators. The suffix
  * recurrence is then literally a window suffix SUM of exact longs.
  * Per-train averages report the exact nano sum and n_tests, with
  * ONE mirrored double division.
  *
  * Scale shape: the evaluation set is a caller-chosen SAMPLE (the
  * brute-force ANN trade, q28's pinned shape): pair work is
  * |eval|·|train|, one suffix-sum window per test partition (ranks
  * only, test points are the parallelism unit), and one grouped
  * average over train ids. At 100 TB, either cap the eval sample or
  * generate candidate neighbor lists with the ANN shelf's IVF/LSH
  * index and run the recurrence over the candidates (the recurrence
  * only needs the sorted neighborhood).
  */
object DataValuation {

  /** Per-train-point KNN-Shapley values: (id, n_tests, shap_sum_nano,
    * shap) where `shap` = shap_sum_nano / (n_tests · 1e9). `testFlag`
    * splits the corpus into the evaluation sample (true) and the
    * valued training set (false); rows with null vectors, labels, or
    * flags are excluded.
    */
  def knnShapley(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      testFlag: Column, k: Int = 5): DataFrame = {
    require(k >= 1, "knnShapley: k must be >= 1")
    val base = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
        col(labelCol).isNotNull && testFlag.isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("__y"),
        testFlag.as("__is_t"),
        transform(col(vecCol),
          x => floor(x.cast("double") * 1e6).cast("long")).as("__qv"))
    val tst = base.where(col("__is_t"))
      .select(col("__id").as("__tid"), col("__y").as("__ty"),
        col("__qv").as("__tv"))
    val trn = base.where(!col("__is_t"))
      .select(col("__id").as("__rid"), col("__y").as("__ry"),
        col("__qv").as("__rv"))
    // |eval| × |train| scored pairs — the q28 brute-force shape; the
    // fold is a codegen'd zip_with/aggregate, no per-element join
    val pairs = tst.crossJoin(trn)
      .select(col("__tid"), col("__ty"), col("__rid"), col("__ry"),
        aggregate(zip_with(col("__tv"), col("__rv"),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("__d2"))
    val wRank = Window.partitionBy(col("__tid"))
      .orderBy(col("__d2").asc, col("__rid").asc)
    val wPart = Window.partitionBy(col("__tid"))
    val ranked = pairs
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__nt", count(lit(1)).over(wPart))
    val wOrd = Window.partitionBy(col("__tid")).orderBy(col("__rk"))
    val m = (c: Column) => when(c === col("__ty"), 1L).otherwise(0L)
    // 1e9 div max(K, i): integer division of the POSITIVE magnitude
    // (div == floor == //), the ±1 sign multiplies afterwards
    val term = when(col("__rk") === col("__nt"),
      m(col("__ry")) * expr("1000000000 div __nt"))
      .otherwise((m(col("__ry")) - m(lead(col("__ry"), 1).over(wOrd))) *
        expr(s"1000000000 div greatest(CAST($k AS BIGINT), " +
          "CAST(__rk AS BIGINT))"))
    val suffix = Window.partitionBy(col("__tid")).orderBy(col("__rk"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ranked
      .withColumn("__c", term)
      .withColumn("__s", sum(col("__c")).over(suffix))
      .groupBy(col("__rid").as("id"))
      .agg(count(lit(1)).as("n_tests"),
        sum(col("__s")).as("shap_sum_nano"))
      .select(col("id"), col("n_tests"), col("shap_sum_nano"),
        // + 0.0 normalizes IEEE −0.0 (a tiny negative sum rounded to
        // zero) so both engines report the same signed zero
        (round(col("shap_sum_nano").cast("double") /
          (col("n_tests").cast("double") * 1e9), 6) + lit(0.0))
          .as("shap"))
  }
}
