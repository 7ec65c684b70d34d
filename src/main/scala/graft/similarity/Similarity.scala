package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an IVF
  * (inverted-file) bucketed variant as the scale path.
  *
  * All vector math is Spark higher-order functions (`zip_with` +
  * `aggregate`) over `array<double>` — no UDFs, no serialization
  * boundary, stays in codegen.
  *
  * Scale design: brute-force is O(|queries|·|corpus|) with the corpus
  * side streamed (broadcast the queries, not the corpus); ranking uses
  * per-partition top-k (window + row_number under AQE, or
  * TakeOrderedAndProject for global k). The IVF variant cuts the
  * scanned corpus to nprobe/nlist of the data: centroid assignment is
  * one broadcast join (centroid count is small by construction), and
  * bucket search shuffles only the probed buckets.
  */
object Similarity {

  /** Exact dot product of two equal-length numeric arrays (computed in
    * double, left-to-right — deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Brute-force cosine top-k: for each query vector, the k most
    * similar corpus vectors (self-match excluded). Ranking is by
    * cosine rounded to `roundTo` decimals with id tie-break, making
    * the result set reproducible across engines and runs even with
    * floating-point summation differences.
    *
    * The queries side is broadcast — the corpus (the 100 TB side)
    * never moves.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      k: Int, roundTo: Int = 4): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val sims = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("__qv"), col("__cv")), roundTo).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic IVF "training": every `stride`-th vector by id is a
    * centroid (k-means-free, reproducible — production swaps in real
    * k-means centroids without touching the search path).
    */
  def strideCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int): DataFrame =
    corpus.where(col(idCol) % stride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Assign each corpus vector to its nearest centroid (broadcast join
    * against the small centroid set; ranking rounded for cross-engine
    * determinism).
    */
  def assignToCentroids(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, roundTo: Int = 4): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        round(cosine(col(vecCol), col("centroid_vec")), roundTo).as("csim"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("csim").desc, col("centroid_id").asc)
    scored.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF top-k search: probe the `nprobe` nearest centroids per query,
    * then brute-force only within the probed buckets. Approximate (a
    * true neighbor assigned to an unprobed bucket is missed) — that's
    * the documented recall/cost trade; nprobe=nlist degrades to exact.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      k: Int, stride: Int, nprobe: Int,
      roundTo: Int = 4): DataFrame = {
    val cents = strideCentroids(corpus, idCol, vecCol, stride)
    val assigned = assignToCentroids(corpus, cents, idCol, vecCol, roundTo)

    // per-query probe list: nprobe nearest centroids
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("__qv"), col("centroid_id"),
        round(cosine(col("__qv"), col("centroid_vec")), roundTo).as("csim"))
    val pw = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probed = probes.withColumn("__r", row_number().over(pw))
      .where(col("__r") <= nprobe)
      .select("query_id", "__qv", "centroid_id")

    // search only the probed buckets
    val bucketed = assigned.select(
      col("centroid_id"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val sims = broadcast(probed).join(bucketed, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("__qv"), col("__cv")), roundTo).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: all (id_a < id_b) pairs with
    * rounded cosine ≥ threshold. Exact O(n²/2) pair scan — the
    * brute-force verifier; at corpus scale, block with
    * [[assignToCentroids]] or SimHash first and verify only candidate
    * pairs.
    */
  def nearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 4): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("__va"), col("__vb")), roundTo).as("sim"))
      .where(col("sim") >= threshold)
  }
}
