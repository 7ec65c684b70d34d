package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document table — the classic sparse
  * text representation (keyword extraction, cheap retrieval, topic
  * drift monitoring over a training corpus).
  *
  * Scale shape: one explode + two aggregations (term frequencies per
  * doc, document frequencies per token) + one join keyed on token.
  * All counts are partial+final aggregations; the token join is the
  * only shuffle that touches the full posting list. The corpus size
  * enters as a broadcast one-row aggregate frame inside the same
  * lazy plan.
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
    // corpus size rides as a broadcast one-row frame (the bm25Search
    // stats shape) instead of an eager df.count() at plan-build time:
    // no extra job per call, and the whole thing stays one lazy plan
    val stats = df.agg(count(lit(1)).as("__corpus_n"))
    val tf = termFrequencies(df, idCol, textCol)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .withColumn("tfidf",
        col("tf") * (log((col("__corpus_n") + 1.0) / (col("df") + 1.0))
          + 1.0))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 top-k retrieval: for each query, the `k` best-scoring
    * documents under Okapi BM25 (the Robertson/Lucene form,
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, tf saturation `k1`,
    * length normalization `b`) — the sparse lexical-retrieval leg of
    * a hybrid search stack (its ANN sibling is `rrfFuse`'s input).
    *
    * Scale + exactness:
    *   - the inverted join is (query term) ⋈ (posting list), and
    *     terms with df > `maxDf` are pruned FIRST — their idf is near
    *     zero and they are exactly the terms whose postings would
    *     dominate the join fan-out (the q23/q64 df-cap argument);
    *     candidate cost is Σ df over the query's surviving terms,
    *     never corpus × queries;
    *   - per-term scores quantize to BIGINT micro-units (·10⁹) BEFORE
    *     the per-(query, doc) sum — the q153/DSIR treatment — so
    *     accumulation is exact integer arithmetic: ranking and
    *     tie-breaks are reproducible across engines and
    *     partitionings, with the float boundary confined to one
    *     per-term expression both engines spell identically;
    *   - the ≤ k cut is a per-query window over candidate rows
    *     (bounded by the pruned posting mass), ties to the smaller
    *     doc id.
    *
    * Output: (query id, doc id, `score_micro`, `rank`).
    */
  def bm25Search(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDf: Long = 1000000L): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val lens = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("__len"))
    bm25ScoreCore(tf, lens, idCol, queries, qIdCol, qTextCol,
      k, k1, b, maxDf)
  }

  /** The BM25 scoring core shared by [[bm25Search]] (postings built
    * from the corpus in-query) and [[bm25SearchOverIndex]] (postings
    * read from a standing shard store): identical expressions, so the
    * two paths are bit-identical by construction (spec-pinned).
    * `tf` = (idCol, token, tf); `lens` = (idCol, __len).
    */
  private def bm25ScoreCore(
      tf: DataFrame, lens: DataFrame, idCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double, b: Double, maxDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = lens.agg(count(lit(1)).as("__n"),
      (sum(col("__len")).cast("double") / count(lit(1)))
        .as("__avgdl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val qTerms = queries.select(col(qIdCol).as("__qid"),
        explode(array_distinct(
          TextAnalysis.words(col(qTextCol)))).as("token"))
    val scored = qTerms
      .join(tf.join(dfreq, "token"), Seq("token"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("__term_micro",
        floor(col("__idf") *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("__len") / col("__avgdl"))) *
          lit(1000000000L)).cast("long"))
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__term_micro")).as("score_micro"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as(qIdCol), col(idCol),
        col("score_micro"), col("rank"))
  }

  /** Per-batch BM25 index shard — the lexical index's entry in the
    * mergeable-shard algebra every fingerprint family already has
    * (Bloom, LSH, SRP, datasheet, KLL): ONE frame carries both row
    * kinds the index needs, posting rows `(doc, token, tf, len=null)`
    * and doc-length rows `(doc, token=null, tf=null, len)`, tagged
    * with the shard id. Every statistic BM25 scores with is additive
    * across shards by row counting/summing alone — `df(token)` =
    * posting rows per token, `N` = doc rows, `avgdl` = Σlen / N — so
    * shards build independently (one scan of the batch each) and any
    * merge tree lands on the same index. Contract: each document
    * belongs to exactly ONE batch (replay of the same batch id
    * OVERWRITEs its shard — the datasheet-sink idempotence story —
    * but re-ingesting a doc under a NEW batch id double-counts it,
    * same as every per-doc-fact store here).
    *
    * Empty/whitespace docs produce a doc row with len 0 and no
    * posting rows — exactly what the from-scratch build sees.
    */
  def bm25IndexShard(
      df: DataFrame, idCol: String, textCol: String,
      shard: Column): DataFrame = {
    val base = df.select(shard.as("__shard"), col(idCol), col(textCol))
    val postings = base
      .select(col("__shard"), col(idCol),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .groupBy(col("__shard"), col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .select(col("__shard"), col(idCol), col("token"), col("tf"),
        lit(null).cast("long").as("len"))
    val docRows = base.select(col("__shard"), col(idCol),
      lit(null).cast("string").as("token"),
      lit(null).cast("long").as("tf"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("len"))
    postings.unionByName(docRows)
  }

  /** Shard-preserving compaction: rows are per-doc FACTS (postings
    * and lengths), not aggregates, so compaction is a pure re-tag
    * under one shard id — the output is again a valid
    * [[bm25IndexShard]] frame and the store's merge semantics are
    * untouched. The value is operational (N small shard files → one),
    * same as the datasheet compaction.
    */
  def compactBm25IndexShards(
      shards: DataFrame, shardId: Long): DataFrame =
    shards.withColumn("__shard", lit(shardId))

  /** BM25 top-k over a STANDING shard store instead of a from-scratch
    * corpus build: postings and lengths read from the
    * [[bm25IndexShard]] rows, then the exact [[bm25Search]] scoring
    * core — per-query cost is the pruned posting mass, and the corpus
    * is never re-tokenized. Bit-identical to [[bm25Search]] over the
    * union of the shards' documents (shared core; spec-pinned).
    */
  def bm25SearchOverIndex(
      shards: DataFrame, idCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDf: Long = 1000000L): DataFrame = {
    val tf = shards.where(col("token").isNotNull)
      .select(col(idCol), col("token"), col("tf"))
    val lens = shards.where(col("token").isNull)
      .select(col(idCol), col("len").as("__len"))
    bm25ScoreCore(tf, lens, idCol, queries, qIdCol, qTextCol,
      k, k1, b, maxDf)
  }

  /** Dirichlet-smoothed query-likelihood retrieval — the language-
    * model ranker beside [[bm25Search]] (the second classical lexical
    * family; RRF fusion of the two is the standard robustness play):
    * score(q,d) = Σ_{t∈q∩d} ln(1 + tf·|C|/(µ·cf_t)) + |q|·ln(µ/(len_d+µ)),
    * the computationally convenient form where only MATCHING terms
    * generate candidates (absent terms fold into the closed-form
    * length norm), so candidate cost is posting-mass-bounded exactly
    * like BM25 — never corpus × queries.
    *
    * Same scale/exactness discipline as [[bm25Search]]: a `maxDf`
    * cap prunes stopword fan-out (capped terms leave BOTH the match
    * sum and the |q| norm count, so semantics stay consistent — |q|
    * counts the query's corpus-matched surviving terms); per-term
    * scores and the per-doc norm are nano-floored BIGINTs, so
    * accumulation, ranking, and tie-breaks replay exactly.
    *
    * Output: (query id, doc id, `score_micro`, `rank`). Scores are
    * negative (log-likelihoods) — comparable within a query only.
    */
  def dirichletQlSearch(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, mu: Double = 100.0, maxDf: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFrequencies(docs, idCol, textCol)
      .transform(graft.core.CacheScope.disk)
    val lens = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("__len"))
    val coll = tf.agg(sum(col("tf")).as("__ctot"))
    val cf = tf.groupBy("token")
      .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val qTerms = queries.select(col(qIdCol).as("__qid"),
        explode(array_distinct(
          TextAnalysis.words(col(qTextCol)))).as("token"))
      .join(cf, Seq("token"))
      .transform(graft.core.CacheScope.disk)
    val qLens = qTerms.groupBy("__qid")
      .agg(count(lit(1)).as("__qlen"))
    val matched = qTerms
      .join(tf, Seq("token"))
      .crossJoin(broadcast(coll))
      .withColumn("__term_micro",
        floor(log(lit(1.0) + col("tf").cast("double") *
          col("__ctot").cast("double") /
          (lit(mu) * col("cf").cast("double"))) *
          lit(1000000000L)).cast("long"))
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__term_micro")).as("__match"))
    val scored = matched
      .join(lens, Seq(idCol))
      .join(qLens, Seq("__qid"))
      .withColumn("__norm_micro",
        floor(log(lit(mu) / (col("__len").cast("double") + lit(mu))) *
          col("__qlen").cast("double") * lit(1000000000L))
          .cast("long"))
      .withColumn("score_micro", col("__match") + col("__norm_micro"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as(qIdCol), col(idCol),
        col("score_micro"), col("rank"))
  }

  /** Rocchio-style pseudo-relevance-feedback BM25 search — the
    * query-EXPANSION leg that completes the retrieval stack next to
    * RRF (fuse rankers), MMR (diversify results) and the RAG chain:
    * pass 1 retrieves `fbDocs` pseudo-relevant docs per query with
    * plain BM25; the feedback docs VOTE for expansion terms by
    * Σ tf·idf mass (original query terms and df-capped terms
    * excluded); the top `fbTerms` terms by (mass DESC, token ASC) —
    * a total order — join the query; pass 2 scores
    * 2·BM25(original terms) + 1·BM25(expansion terms) in HALF-UNIT
    * micros (the classic α = 1, β = 0.5 Rocchio weighting as exact
    * integer arithmetic — no float mixing between the two legs).
    *
    * Exactness: both passes use the [[bm25Search]] per-term
    * micro-floor discipline; the expansion vote is Σ tf·⌊idf·10⁶⌋ —
    * exact longs — so term SELECTION (the only thresholded step)
    * cannot flip cross-engine. Scale: pass 1 is posting-mass-bounded
    * as ever; the vote joins |queries|·fbDocs doc ids back to the tf
    * frame (a semi-join-sized probe); pass 2 adds ≤ fbTerms terms
    * per query to the posting probe.
    *
    * Output: (query id, doc id, `score_half_micro`, `rank`) for the
    * top `k` — plus `n_exp_terms` carried per query so a report can
    * see how much expansion actually happened.
    */
  def rocchioPrfSearch(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, fbDocs: Int = 5, fbTerms: Int = 5,
      k1: Double = 1.2, b: Double = 0.75,
      maxDf: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFrequencies(docs, idCol, textCol)
      .transform(graft.core.CacheScope.disk)
    val lens = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("__len"))
      .transform(graft.core.CacheScope.disk)
    val stats = lens.agg(count(lit(1)).as("__n"),
      (sum(col("__len")).cast("double") / count(lit(1)))
        .as("__avgdl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .transform(graft.core.CacheScope.disk)
    val qTermSet = queries.select(col(qIdCol).as("__qid"),
        explode(array_distinct(
          TextAnalysis.words(col(qTextCol)))).as("token"))
      .transform(graft.core.CacheScope.disk)
    def pass(qTerms: DataFrame, weightCol: Column,
        cut: Option[Int]): DataFrame = {
      val scored = qTerms
        .join(tf.join(dfreq, "token"), Seq("token"))
        .join(lens, Seq(idCol))
        .crossJoin(broadcast(stats))
        .withColumn("__idf",
          log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))))
        .withColumn("__term_micro",
          floor(col("__idf") *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) +
              lit(b) * col("__len") / col("__avgdl"))) *
            lit(1000000000L)).cast("long"))
        .groupBy(col("__qid"), col(idCol))
        .agg(sum(col("__term_micro") * weightCol).as("score_micro"))
      cut match {
        case Some(n) =>
          val w = Window.partitionBy(col("__qid"))
            .orderBy(col("score_micro").desc, col(idCol).asc)
          scored.withColumn("rank", row_number().over(w))
            .where(col("rank") <= n)
        case None => scored
      }
    }
    val fb = pass(qTermSet, lit(1L), Some(fbDocs))
      .select(col("__qid"), col(idCol))
      .transform(graft.core.CacheScope.disk)
    // expansion vote: Σ tf·⌊idf·1e6⌋ over the feedback docs, original
    // query terms excluded, total-order top-fbTerms
    val idf6 = floor(log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      lit(1000000L)).cast("long")
    val votes = fb
      .join(tf, Seq(idCol))
      .join(dfreq, Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("__w", col("tf") * idf6)
      .groupBy(col("__qid"), col("token"))
      .agg(sum(col("__w")).as("__mass"))
      .join(qTermSet.withColumn("__orig", lit(1)),
        Seq("__qid", "token"), "left_anti")
    val wv = Window.partitionBy(col("__qid"))
      .orderBy(col("__mass").desc, col("token").asc)
    val expansion = votes.withColumn("__r", row_number().over(wv))
      .where(col("__r") <= fbTerms)
      .select(col("__qid"), col("token"))
      .transform(graft.core.CacheScope.disk)
    val nExp = expansion.groupBy("__qid")
      .agg(count(lit(1)).as("n_exp_terms"))
    // pass 2 in half-units: 2·orig + 1·expansion
    val both = pass(qTermSet, lit(2L), None)
      .unionByName(pass(expansion, lit(1L), None))
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("score_micro")).as("score_half_micro"))
    val w2 = Window.partitionBy(col("__qid"))
      .orderBy(col("score_half_micro").desc, col(idCol).asc)
    both.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .join(nExp, Seq("__qid"), "left")
      .na.fill(0L, Seq("n_exp_terms"))
      .select(col("__qid").as(qIdCol), col(idCol),
        col("score_half_micro"), col("rank"), col("n_exp_terms"))
  }
}
