package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable language classifier: one-vs-rest logistic regression over
  * hashed word n-gram features, trained IN-ENGINE (the BPE/unigram-LM
  * trainer discipline) with exact-integer updates so a SQL oracle can
  * replay every weight bit-for-bit.
  *
  * The design trades the textbook sigmoid for the HARD sigmoid
  * σ(z) = clamp(1/2 + z/4, 0, 1): `exp` is not bit-identical across
  * libm implementations, but the hard sigmoid is all-rational — in
  * nano-units σ = clamp(5·10⁸ + ⌊z/4⌋, 0, 10⁹), where ⌊z/4⌋ is exact
  * in IEEE doubles (z < 2⁵³ and /4 is a power-of-two scale). Every
  * other training quantity is an integer:
  *   - features: presence (0/1) of hashed unigram/bigram buckets
  *     (md5 first 8 hex chars mod numBuckets — the corpus-wide shingle
  *     hash family) plus an always-on bias bucket −1;
  *   - per-row residual d = y·10⁹ − σ  (BIGINT);
  *   - per-feature gradient g = Σ_rows d  (order-free BIGINT sum);
  *   - update w += ⌊g·lrMilli / (1000·n)⌋  (exact floor division).
  * Overflow headroom: |g·lrMilli| ≤ n·10⁹·lrMilli must fit a long —
  * n < 9·10¹¹ training rows at lrMilli = 10; past that, shard the
  * epoch gradient into DECIMAL(38,0) (not needed at any realistic
  * per-model training size — lang-ID trains on a sample, not the
  * full corpus).
  *
  * Scale: the feature frame is built once and persisted (one corpus
  * scan); each epoch is two joins against it — z with the BROADCAST
  * weight table (≤ langs·(buckets+1) rows by construction), gradients
  * with the |rows|·|langs| residual frame — followed by a bounded
  * collect of ≤ langs·(buckets+1) gradient rows (the per-iteration
  * bounded collect of the BPE trainer). The corpus is never shuffled
  * by anything wider than its own feature explosion.
  */
object LangClassifier {

  val NANO = 1000000000L

  /** Distinct hashed n-gram buckets per row: unigrams + bigrams of
    * [[TextAnalysis.words]], each hashed md5-first-8-hex mod
    * `numBuckets`, plus the always-present bias bucket −1. Output:
    * (idCol, bucket) — binarized presence features.
    */
  def hashedNgramFeatures(
      df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    // sequence(1, 0) would DESCEND in Spark — gate the bigram range
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1), i =>
        concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val grams = concat(ws, bigrams)
    val bucket = conv(substring(md5(col("__g")), 1, 8), 16, 10)
      .cast("long") % numBuckets
    df.select(col(idCol), explode(grams).as("__g"))
      .select(col(idCol), bucket.as("bucket"))
      .distinct()
      .union(df.select(col(idCol), lit(-1L).as("bucket")))
  }

  /** Train one-vs-rest hard-sigmoid logistic weights. Returns the
    * weight table (lang, bucket, w_nano) — every (lang, bucket) pair
    * over the training corpus's distinct buckets, deterministic and
    * SQL-replayable (see object doc for the exact arithmetic).
    */
  def train(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      langs: Seq[String], numBuckets: Int = 512, epochs: Int = 3,
      lrMilli: Int = 10): DataFrame =
    trainLoop(df, idCol, textCol, labelCol, langs, numBuckets, epochs,
      lrMilli, Map.empty)

  /** Resume training from a standing weight table for `moreEpochs` —
    * identical to training init-epochs + moreEpochs from scratch over
    * the same corpus, because each epoch is a pure function of
    * (previous weights, feature frame): the sequential-fold identity
    * that makes the nightly "+1 epoch from the stored table" path
    * exact (the holtResume treatment for the model trainer). The
    * standing table is bounded (langs·(buckets+1)) so the driver
    * collect is the same bounded read each epoch already does.
    */
  def trainResume(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      langs: Seq[String], weights: DataFrame, numBuckets: Int = 512,
      moreEpochs: Int = 1, lrMilli: Int = 10): DataFrame = {
    val w0 = weights.select("lang", "bucket", "w_nano").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    trainLoop(df, idCol, textCol, labelCol, langs, numBuckets,
      moreEpochs, lrMilli, w0)
  }

  private def trainLoop(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      langs: Seq[String], numBuckets: Int, epochs: Int, lrMilli: Int,
      init: Map[(String, Long), Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val feats = hashedNgramFeatures(df, idCol, textCol, numBuckets)
      .transform(graft.core.CacheScope.disk)
    val labels = df
      .select(col(idCol).as("__id"), col(labelCol).as("__lang"))
      .transform(graft.core.CacheScope.disk)
    val n = labels.count()
    require(n > 0, "empty training set")
    require(n <= Long.MaxValue / NANO / lrMilli,
      s"gradient overflow headroom exceeded at n=$n")
    val langsDf = langs.toDF("__l")
    // weight state lives on the driver between epochs (bounded:
    // langs·(buckets+1) entries), broadcast back down each epoch
    var w = init.withDefaultValue(0L)
    var wDf = init.toSeq.map { case ((l, b), v) => (l, b, v) }
      .toDF("__wl", "__wb", "__wv")
    for (_ <- 1 to epochs) {
      val z = feats
        .join(broadcast(wDf), col("bucket") === col("__wb"))
        .groupBy(col(idCol).as("__id"), col("__wl").as("__l"))
        .agg(sum("__wv").as("__z"))
      val sigma = least(lit(NANO), greatest(lit(0L),
        lit(NANO / 2) +
          floor(coalesce(col("__z"), lit(0L)).cast("double") / 4.0)
            .cast("long")))
      val d = labels.crossJoin(langsDf)
        .join(z, Seq("__id", "__l"), "left")
        .select(col("__id"), col("__l"),
          (when(col("__lang") === col("__l"), lit(NANO))
            .otherwise(lit(0L)) - sigma).as("__d"))
      val grads = feats
        .join(d, feats(idCol) === d("__id"))
        .groupBy("__l", "bucket")
        .agg(sum("__d").as("__g"))
        .collect()
      w = grads.foldLeft(w) { (acc, r) =>
        val key = (r.getString(0), r.getLong(1))
        val step = Math.floorDiv(r.getLong(2) * lrMilli, 1000L * n)
        acc.updated(key, acc(key) + step)
      }
      wDf = w.toSeq.map { case ((l, b), v) => (l, b, v) }
        .toDF("__wl", "__wb", "__wv")
    }
    wDf.select(col("__wl").as("lang"), col("__wb").as("bucket"),
      col("__wv").as("w_nano"))
  }

  /** Apply trained weights: per-row score z_l = Σ w over the row's
    * present buckets, argmax with the [[TextAnalysis.langId]]
    * precedence (zh > en > de > es > fr on ties); rows with zero
    * tokens stay "unknown" (the heuristic's contract). The weight
    * table broadcasts — corpus-side work is one feature explosion and
    * one row-keyed aggregation.
    */
  def predict(
      df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, numBuckets: Int,
      outCol: String = "predicted"): DataFrame = {
    val prec = Map("zh" -> 5, "en" -> 4, "de" -> 3, "es" -> 2,
      "fr" -> 1).withDefaultValue(0)
    val precCol = coalesce(
      prec.toSeq.sortBy(-_._2).map { case (l, p) =>
        when(col("lang") === l, lit(p))
      } :+ lit(0): _*)
    val feats = hashedNgramFeatures(df, idCol, textCol, numBuckets)
    val scores = feats
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum("w_nano").as("__z"))
      .groupBy(idCol)
      .agg(max_by(col("lang"), struct(col("__z"), precCol))
        .as("__best"))
    val hasTokens = size(TextAnalysis.words(col(textCol))) > 0
    df.join(scores, Seq(idCol), "left")
      .withColumn(outCol,
        when(!hasTokens || col("__best").isNull, lit("unknown"))
          .otherwise(col("__best")))
      .drop("__best")
  }
}
