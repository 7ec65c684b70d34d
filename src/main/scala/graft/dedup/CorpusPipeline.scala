package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composed pipeline a
  * 100 TB data-curation job runs, built from the engine's dedup / text
  * operators. Stages (each a lazy plan, one pipeline):
  *
  *   1. exact dedup on the normalized-text fingerprint (keep lowest id)
  *   2. near-duplicate removal via MinHash-LSH verified pairs — greedy
  *      keep-lowest-id: any document appearing as the higher id of a
  *      verified pair is dropped (deterministic, order-free)
  *   3. quality floor on [[TextAnalysis.qualityScore]]
  *   4. language tagging via [[TextAnalysis.langIdStaged]]
  *
  * Scale: stage 2's pair set comes from LSH (no all-pairs work); the
  * anti-join against dropped ids broadcasts the (small) drop list.
  * Keep-lowest is a conscious simplification of connected-component
  * clustering: for chains a~b~c it may keep both a and c — the standard
  * trade in corpus dedup (GraphFrames-style CC is the upgrade path).
  */
object CorpusPipeline {

  /** Documents dropped by near-dup removal: the higher id of every
    * verified pair.
    */
  def nearDupDropIds(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame =
    Dedup.minhashLshPairs(df, idCol, textCol, n, numHashes, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()

  def prepareTrainingCorpus(
      df: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val exact = Dedup.exactDedup(df, textCol, col(idCol).asc)
    val drops = nearDupDropIds(df, idCol, textCol, n, numHashes, bands,
      threshold)
    val deduped = exact.join(broadcast(drops), Seq(idCol), "left_anti")
    val scored = deduped.withColumn("quality",
      TextAnalysis.qualityScore(col(textCol)))
    TextAnalysis.langIdStaged(
      scored.where(col("quality") >= minQuality), textCol)
  }
}
