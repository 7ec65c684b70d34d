package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composed pipeline a
  * 100 TB data-curation job runs, built from the engine's dedup / text
  * operators. Stages (each a lazy plan, one pipeline):
  *
  *   1. exact dedup on the normalized-text fingerprint (keep lowest id)
  *   2. near-duplicate removal via MinHash-LSH verified pairs,
  *      clustered into connected components
  *      ([[ConnectedComponents.components]]) — exactly ONE survivor
  *      (the minimum id) per near-dup cluster, so chains a~b~c dedup
  *      correctly (greedy keep-lowest-id would keep both ends)
  *   3. quality floor on [[TextAnalysis.qualityScore]]
  *   4. language tagging via [[TextAnalysis.langIdStaged]]
  *
  * Scale: stage 2's pair set comes from LSH (no all-pairs work); the
  * component clustering iterates only over the (small) verified-pair
  * graph; the anti-join against dropped ids is broadcast by AQE when
  * the drop list is small (no unconditional hint — the list grows
  * with the dup rate).
  * The CC loop makes stage 2 iterative (driver-controlled, data
  * distributed) rather than one lazy plan — the standard shape for
  * label propagation.
  */
object CorpusPipeline {

  /** Documents dropped by near-dup removal: every member of a verified
    * near-dup component EXCEPT the component's minimum id.
    */
  def nearDupDropIds(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.minhashLshPairs(
      df, idCol, textCol, n, numHashes, bands, threshold)
    // size-adaptive clustering: the verified-pair graph is tiny
    // relative to its corpus — below the bound an exact driver
    // union-find replaces ~5 scheduled label-propagation rounds; the
    // distributed loop remains the unbounded-case path
    ConnectedComponents.componentsAuto(pairs, "id_a", "id_b")._1
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
  }

  def prepareTrainingCorpus(
      df: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    // semi-join dedup: fingerprints shuffle, the wide text column does
    // not (result-identical to the window/agg forms; see scaladocs)
    val exact = Dedup.exactDedupSemi(df, idCol, textCol)
    val drops = nearDupDropIds(df, idCol, textCol, n, numHashes, bands,
      threshold)
    // drop list is data-dependent (grows with the dup rate) — let AQE
    // choose broadcast rather than hint it unconditionally
    val deduped = exact.join(drops, Seq(idCol), "left_anti")
    val scored = deduped.withColumn("quality",
      TextAnalysis.qualityScore(col(textCol)))
    TextAnalysis.langIdStaged(
      scored.where(col("quality") >= minQuality), textCol)
  }
}
