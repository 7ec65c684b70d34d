package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer induction — the
  * [[TextAnalysis.bpeTrainMerges]] sibling that completes the
  * tokenizer shelf: instead of growing a vocabulary bottom-up by
  * pair-merging, start from a LARGE seed vocabulary of frequent
  * substrings and let hard-EM shrink it — each round segments every
  * distinct word by Viterbi under the current piece scores (E-step)
  * and re-estimates scores from the chosen pieces' usage (M-step),
  * pruning pieces the segmentations stopped using. Single-character
  * pieces are never pruned, so every word stays segmentable (the
  * SentencePiece coverage rule).
  *
  * Cross-engine exactness: the published trainer maximizes
  * Σ log p(piece) — a float objective whose argmax can flip between
  * engines on last-ulp `ln` differences. This trainer instead
  * minimizes the INTEGER lexicographic objective
  * `(pieces used, −Σ q(piece))` where `q(piece) = (count·1e6) div
  * total` is the piece's exact micro-unit probability mass — fewest
  * pieces first, then the most probable ones. That is the registry's
  * standard integer-micro-unit surrogate (quantize once, then only
  * BIGINT sums and argmins — the q223/q208 treatment): it preserves
  * the unigram-LM structure (probability mass re-estimated from
  * expected usage each round; the k-vs-probability trade is exactly
  * the LM's length/likelihood trade) while making engine and DuckDB
  * oracle agree bit-for-bit. Both objective terms pack into one
  * BIGINT (`k·2^40 − Σq`: Σq ≤ maxWordLen·1e6 « 2^40), and per-step
  * DP ties break on the smallest split point j (= the longest final
  * piece), pinned identically in the oracle's `ORDER BY s, j LIMIT 1`.
  *
  * Scale shape: every frame in the loop is vocabulary-sized, never
  * corpus-sized — the corpus collapses once into the distinct-word
  * frequency table (map-side combined; the [[TextAnalysis
  * .bpeTrainMerges]] argument), candidates are ≤ maxWordLen ×
  * maxPieceLen rows per distinct word, the Viterbi DP runs INSIDE one
  * row per word (array-fold expressions over a collected candidate
  * list — no per-position shuffle, no UDF), and each round costs one
  * broadcast-sized join (piece scores) plus one map-side-combined
  * recount. The driver loop holds only vocabulary-sized checkpoints;
  * rounds are fixed (`iters`), not data-dependent.
  */
object UnigramLm {

  private val PieceCost = 1L << 40

  /** Distinct-word frequency table over [[TextAnalysis.words]],
    * restricted to words of at most `maxWordLen` characters (the DP
    * unroll bound; longer words are handled by the apply path's
    * character fallback, never by the trainer).
    */
  def wordFreq(df: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    df.select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .where(length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** All candidate pieces of every word: one row per (word, start j,
    * end i) with 1 ≤ i−j ≤ maxPieceLen — the position lattice both
    * the seed counts and every Viterbi round draw from.
    */
  private def candidates(wf: DataFrame, maxPieceLen: Int): DataFrame = {
    val n = length(col("w"))
    wf.select(col("w"), col("freq"),
        explode(flatten(transform(sequence(lit(0), n - 1), j =>
          transform(sequence(j + 1, least(n, j + maxPieceLen)), i =>
            struct(j.as("j"), i.as("i")))))).as("__p"))
      .select(col("w"), col("freq"),
        col("__p.j").as("j"), col("__p.i").as("i"),
        col("w").substr(col("__p.j") + 1, col("__p.i") - col("__p.j"))
          .as("piece"))
  }

  /** Seed vocabulary: every substring (length ≤ maxPieceLen) counted
    * over all its positions weighted by word frequency, kept when the
    * count reaches `minCount` — single-character pieces are kept
    * unconditionally (coverage). Output (piece, cnt).
    */
  def seedVocab(
      wf: DataFrame, maxPieceLen: Int, minCount: Long): DataFrame =
    candidates(wf, maxPieceLen)
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .where(length(col("piece")) === 1 || col("cnt") >= minCount)

  /** One hard-EM round: Viterbi-segment every distinct word under the
    * vocab's micro-unit scores and return the re-estimated counts —
    * (piece, cnt) over the pieces the segmentations actually used,
    * plus every single-character piece (cnt 0 when unused).
    *
    * `vocab` must carry (piece, q). The DP and backwalk run as array
    * folds inside each word's row: dp[i] = min over candidate ends i
    * of dp[j] + 2^40 − q(piece), then the path is recovered by
    * walking argmins back from i = n (ties → smallest j).
    */
  def emRound(wf: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val cand = candidates(wf, maxPieceLen)
      .join(vocab.select(col("piece"), col("q")), Seq("piece"))
    val grouped = cand
      .groupBy("w", "freq")
      .agg(collect_list(struct(col("j"), col("i"), col("q")))
        .as("cands"))
      .withColumn("n", length(col("w")))
    val dpExpr = aggregate(
      sequence(lit(1), col("n")),
      array(lit(0L)),
      (dp, i) => concat(dp, array(
        aggregate(
          filter(col("cands"), c => c("i") === i),
          lit(Long.MaxValue),
          (best, c) => least(best,
            element_at(dp, c("j") + 1) + lit(PieceCost) - c("q"))))))
    val withDp = grouped.withColumn("dp", dpExpr)
    // backwalk: n steps suffice (pos strictly decreases); each step
    // re-derives the argmin split with the same tie-break the oracle
    // uses (score asc, j asc)
    val backExpr = aggregate(
      sequence(lit(1), col("n")),
      struct(col("n").as("pos"),
        array().cast("array<string>").as("ps")),
      (st, _) => when(st("pos") > 0, {
        val best = aggregate(
          filter(col("cands"), c => c("i") === st("pos")),
          struct(lit(Long.MaxValue).as("s"), lit(Int.MaxValue).as("j")),
          (b, c) => {
            val s = element_at(col("dp"), c("j") + 1) +
              lit(PieceCost) - c("q")
            when(s < b("s") || (s === b("s") && c("j") < b("j")),
              struct(s.as("s"), c("j").cast("int").as("j")))
              .otherwise(b)
          })
        struct(best("j").as("pos"),
          concat(st("ps"), array(
            col("w").substr(best("j") + 1, st("pos") - best("j"))))
            .as("ps"))
      }).otherwise(st))
    val used = withDp
      .select(col("freq"), explode(backExpr("ps")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    // coverage: single chars survive even when no segmentation used
    // them this round (they may be needed by future batches/words)
    val chars = vocab.where(length(col("piece")) === 1)
      .select("piece")
    used.join(chars.withColumnRenamed("piece", "__c"),
        col("piece") === col("__c"), "full_outer")
      .select(coalesce(col("piece"), col("__c")).as("piece"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Micro-unit scores from counts: `q = (cnt·1e6) div Σcnt` — the
    * one-row total rides a broadcast, the registry's scalar-frame
    * idiom.
    */
  def scores(counts: DataFrame): DataFrame = {
    val t = counts.agg(sum(col("cnt")).as("__t"))
    counts.crossJoin(broadcast(t))
      .select(col("piece"), col("cnt"),
        expr("cnt * 1000000 div __t").as("q"))
  }

  /** Train a unigram-LM vocabulary: seed → `iters` hard-EM rounds →
    * top `vocabSize` pieces by final usage (ties on the piece text).
    * Returns (piece, cnt, q_micro, rank); `q_micro` is the final
    * micro-unit probability mass over the WHOLE final count table
    * (the segmenter's score table, before the vocabSize cut).
    */
  def train(
      df: DataFrame, textCol: String, vocabSize: Int,
      iters: Int = 2, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      minCount: Long = 2L): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    require(iters >= 1, "iters must be positive")
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      "need 1 <= maxPieceLen <= maxWordLen")
    val wf = wordFreq(df, textCol, maxWordLen).localCheckpoint(true)
    var counts = seedVocab(wf, maxPieceLen, minCount)
      .localCheckpoint(true) // vocabulary-sized
    var round = 0
    while (round < iters) {
      counts = emRound(wf, scores(counts), maxPieceLen)
        .localCheckpoint(true)
      round += 1
    }
    // top-k BEFORE the rank window (the vocabCoverage trick): the
    // sort+limit plans as TakeOrderedAndProject and the single-task
    // window ranks only the vocabSize survivors — structurally
    // bounded, never vocabulary-sized
    val w = Window.orderBy(col("cnt").desc, col("piece").asc)
    scores(counts)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(vocabSize)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select(col("piece"), col("cnt"),
        col("q").as("q_micro"), col("rank"))
  }

  /** PRODUCTION apply + corpus budgeting — [[TextAnalysis
    * .bpeTokenCountsFast]]'s shape for the unigram tokenizer: the
    * trained score table ships as one broadcast map and every word
    * segments in a single `mapPartitions` pass (per-word Viterbi in
    * plain Scala — same integer objective, same smallest-j tie-break,
    * so counts equal the trainer's segmentation). Words longer than
    * `maxWordLen` fall back to one token per character (the trainer
    * never saw them; documented fallback, replayed by the oracle).
    * Output: (id, n_words, n_tokens_uni).
    */
  def tokenCounts(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long], maxPieceLen: Int = 4,
      maxWordLen: Int = 16): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val prepped = df.select(col(idCol),
      TextAnalysis.words(coalesce(col(textCol), lit(""))).as("__ws"))
    val outSchema = StructType(Seq(prepped.schema.fields(0),
      StructField("n_words", LongType, nullable = false),
      StructField("n_tokens_uni", LongType, nullable = false)))
    val bc = spark.sparkContext.broadcast(vocab)
    prepped.mapPartitions { it =>
      val v = bc.value
      // Zipf memo, the bpeTokenCountsFast treatment: bound the map so
      // a pathological all-unique-words partition cannot grow OOM
      val memo = new java.util.HashMap[String, java.lang.Long]()
      def countWord(w: String): Long = {
        val cached = memo.get(w)
        if (cached != null) return cached.longValue()
        val n = viterbiLen(w, v, maxPieceLen, maxWordLen)
        if (memo.size < (1 << 17)) memo.put(w, n)
        n
      }
      it.map { row =>
        val ws = row.getSeq[String](1)
        var total = 0L
        val iter = ws.iterator
        while (iter.hasNext) total += countWord(iter.next())
        Row(row.get(0), ws.size.toLong, total)
      }
    }(Encoders.row(outSchema))
  }

  /** Token count of one word under the trained scores — the per-word
    * Viterbi the production apply runs. Words longer than
    * `maxWordLen` fall back to one token per character; a character
    * MISSING from the vocabulary (the trainer's chars cover the
    * training corpus, not every future word) segments as a single
    * unknown token with mass 0 — the standard `unk` fallback, so
    * every word stays tokenizable.
    */
  private[text] def viterbiLen(
      w: String, q: Map[String, Long],
      maxPieceLen: Int, maxWordLen: Int): Long = {
    val n = w.length
    if (n == 0) return 0L
    if (n > maxWordLen) return n.toLong
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val qv: Long = q.get(w.substring(j, i)) match {
          case Some(x) => x
          case None if i - j == 1 => 0L // unk char, mass 0
          case None => Long.MinValue // not a piece
        }
        if (qv != Long.MinValue) {
          val s = dp(j) + PieceCost - qv
          if (s < best) best = s
        }
        j += 1
      }
      dp(i) = best
      i += 1
    }
    // dp(n) = k·2^40 − Σq with 0 ≤ Σq < 2^40, so k = ceil(dp/2^40)
    (dp(n) + PieceCost - 1) >> 40
  }
}
