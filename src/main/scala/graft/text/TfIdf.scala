package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document table — the classic sparse
  * text representation (keyword extraction, cheap retrieval, topic
  * drift monitoring over a training corpus).
  *
  * Scale shape: one explode + two aggregations (term frequencies per
  * doc, document frequencies per token) + one join keyed on token.
  * All counts are partial+final aggregations; the token join is the
  * only shuffle that touches the full posting list. The corpus size
  * enters as one `count()` action (a metadata-served parquet count in
  * practice).
  */
object TfIdf {

  /** (id, token, tf) — term occurrence counts per document. */
  def termFrequencies(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))

  /** (id, token, tf, df, tfidf) with the smooth-idf convention
    * `idf = ln((N+1)/(df+1)) + 1` (never zero, no division blowup for
    * corpus-wide tokens).
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    val tf = termFrequencies(df, idCol, textCol)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }
}
