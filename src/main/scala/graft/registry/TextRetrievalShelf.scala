package graft.registry

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Retrieval-family shelf — BM25 (from-scratch and over the standing
  * index), Dirichlet-QL, Rocchio PRF, the ranked-retrieval eval
  * chain and the smoothing A/B, plus their shared DuckDB oracle
  * builders. Split from [[TextRegistry]] (round 16, file at 3,044
  * lines); member bodies are unchanged — the trait mixes back into
  * the same object, so every reference and every oracle string
  * renders exactly as before.
  */
private[graft] trait TextRetrievalShelf {

  private[graft] def retrievalQueries:
      Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_bm25_search" -> (bm25SearchQ _),
    "q176_bm25_incremental" -> (bm25IncrementalQ _),
    "q246_retrieval_eval" -> (retrievalEvalQ _),
    "q259_retrieval_macro" -> (retrievalMacroQ _),
    "q294_dirichlet_ql" -> (dirichletQlQ _),
    "q324_rocchio_prf" -> (rocchioPrfQ _),
    "q326_smoothing_ab" -> (smoothingAbQ _),
  )

  /** The q171 BM25 oracle, shared verbatim with q176: the
    * incremental index path must reproduce the from-scratch build
    * exactly.
    */
  private[graft] val oracleBm25Sql: String =
    s"""WITH tf AS (
           SELECT doc_id, w AS token, count(*) AS tf FROM (
             SELECT doc_id, unnest($oracleWords) AS w FROM documents)
           GROUP BY 1, 2),
         lens AS (
           SELECT doc_id, len($oracleWords) AS len FROM documents),
         stats AS (
           SELECT count(*) AS n,
             CAST(sum(len) AS DOUBLE) / count(*) AS avgdl
           FROM lens),
         dfq AS (
           SELECT token, count(*) AS df FROM tf
           GROUP BY token HAVING count(*) <= 400),
         qt AS (
           SELECT doc_id AS qid, unnest(list_distinct($oracleWords))
             AS token
           FROM documents WHERE doc_id < 5),
         sc AS (
           SELECT qid, tf.doc_id,
             CAST(floor(
               ln(CAST(1 AS DOUBLE) + (n - df + CAST(0.5 AS DOUBLE))
                 / (df + CAST(0.5 AS DOUBLE)))
               * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
               / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * len / avgdl))
               * 1000000000) AS BIGINT) AS tm
           FROM qt
           JOIN tf USING (token) JOIN dfq USING (token)
           JOIN lens ON lens.doc_id = tf.doc_id, stats),
         agg AS (
           SELECT qid, doc_id, sum(tm) AS score_micro
           FROM sc GROUP BY 1, 2),
         r AS (
           SELECT qid, doc_id, score_micro, row_number() OVER (
             PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)
             AS rank
           FROM agg)
         SELECT qid AS query_id, doc_id,
           CAST(score_micro AS BIGINT) AS score_micro,
           CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank"""

  /** Shared per-query retrieval-eval oracle (q246; q259 wraps it):
    * DCG terms nano-floored before the order-free per-query sums,
    * full-outer query domain with zero-coalesced metrics for
    * judged-but-unretrieved queries.
    */

  /** The q294 Dirichlet-QL ranked-results oracle, shared with q326's
    * smoothing A/B (the eval chain swaps this in for the BM25 one).
    */
  private[graft] val oracleDirichletQlSql: String =
    s"""WITH tf AS (
           SELECT doc_id, w AS token, count(*) AS tf FROM (
             SELECT doc_id, unnest($oracleWords) AS w FROM documents)
           GROUP BY 1, 2),
         lens AS (
           SELECT doc_id, len($oracleWords) AS len FROM documents),
         coll AS (SELECT CAST(sum(tf) AS BIGINT) AS ctot FROM tf),
         cf AS (
           SELECT token, CAST(sum(tf) AS BIGINT) AS cf
           FROM tf GROUP BY token HAVING count(*) <= 400),
         qt AS (
           SELECT qid, token, cf FROM (
             SELECT doc_id AS qid,
               unnest(list_distinct($oracleWords)) AS token
             FROM documents WHERE doc_id < 5)
           JOIN cf USING (token)),
         ql AS (SELECT qid, CAST(count(*) AS BIGINT) AS qlen
           FROM qt GROUP BY qid),
         mt AS (
           SELECT qid, tf.doc_id,
             CAST(floor(
               ln(CAST(1.0 AS DOUBLE) + CAST(tf AS DOUBLE)
                 * CAST(ctot AS DOUBLE)
                 / (CAST(100.0 AS DOUBLE) * CAST(cf AS DOUBLE)))
               * 1000000000) AS BIGINT) AS tm
           FROM qt JOIN tf USING (token), coll),
         agg AS (
           SELECT qid, doc_id, CAST(sum(tm) AS BIGINT) AS mt
           FROM mt GROUP BY 1, 2),
         sc AS (
           SELECT qid, agg.doc_id,
             mt + CAST(floor(
               ln(CAST(100.0 AS DOUBLE)
                 / (CAST(len AS DOUBLE) + CAST(100.0 AS DOUBLE)))
               * CAST(qlen AS DOUBLE) * 1000000000) AS BIGINT)
               AS score_micro
           FROM agg
           JOIN lens ON lens.doc_id = agg.doc_id
           JOIN ql USING (qid)),
         r AS (
           SELECT qid, doc_id, score_micro, row_number() OVER (
             PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)
             AS rank
           FROM sc)
         SELECT qid AS query_id, doc_id,
           CAST(score_micro AS BIGINT) AS score_micro,
           CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank"""


  private[graft] def oracleRetrievalEvalSql: String =
    oracleRetrievalEvalSqlFor(oracleBm25Sql)

  /** The q246 eval chain over ANY ranked-results subquery emitting
    * (query_id, doc_id, rank) — q326 runs it once per ranker.
    */

  private[graft] def oracleRetrievalEvalSqlFor(
      resultsSql: String): String = {
    val dcg = (rel: String, rank: String) =>
        s"""CAST(floor(CAST((1 << $rel) - 1 AS DOUBLE)
           / (ln(CAST($rank AS DOUBLE) + 1.0) / ln(2.0))
           * 1000000000.0) AS BIGINT)"""
      s"""WITH res AS (
           SELECT query_id AS qid, doc_id AS did, rank
           FROM ($resultsSql) WHERE doc_id <> query_id),
         qm AS (
           SELECT doc_id AS qid, source AS qsrc, lang AS qlang
           FROM documents WHERE doc_id < 5),
         qr AS (
           SELECT qm.qid, d.doc_id AS did,
             CASE WHEN d.source = qm.qsrc THEN 2 ELSE 1 END AS rel
           FROM documents d JOIN qm ON d.lang = qm.qlang
           WHERE d.doc_id <> qm.qid),
         ideal AS (
           SELECT qid, CAST(count(*) AS BIGINT) AS n_rel,
             sum(CASE WHEN irank <= 10 THEN
               ${dcg("rel", "irank")} ELSE 0 END) AS idcg
           FROM (SELECT qid, rel, row_number() OVER (
               PARTITION BY qid ORDER BY rel DESC, did ASC) AS irank
             FROM qr)
           GROUP BY 1),
         per AS (
           SELECT r.qid,
             CAST(sum(CASE WHEN qr.rel IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
             min(CASE WHEN qr.rel IS NOT NULL THEN r.rank END) AS fr,
             sum(CASE WHEN qr.rel IS NOT NULL THEN
               ${dcg("qr.rel", "r.rank")} ELSE 0 END) AS dcg
           FROM res r
           LEFT JOIN qr ON qr.qid = r.qid AND qr.did = r.did
           GROUP BY 1)
         SELECT coalesce(p.qid, i.qid) AS query_id, i.n_rel,
           coalesce(p.n_hit, 0) AS n_hit,
           round(CAST(coalesce(p.n_hit, 0) AS DOUBLE) / 10.0, 6)
             AS p_at_k,
           round(CAST(coalesce(p.n_hit, 0) AS DOUBLE)
             / CAST(i.n_rel AS DOUBLE), 6) AS r_at_k,
           round(coalesce(1.0 / CAST(p.fr AS DOUBLE), 0.0), 6) AS rr,
           round(CASE WHEN i.idcg > 0 THEN
             CAST(coalesce(p.dcg, 0) AS DOUBLE)
               / CAST(i.idcg AS DOUBLE) END, 6)
             AS ndcg
         FROM per p FULL OUTER JOIN ideal i ON i.qid = p.qid
         ORDER BY query_id"""
  }


  /** BM25 top-k retrieval ([[graft.text.TfIdf.bm25Search]]): the
    * audit queries (docs 0–4 as their own queries) against the full
    * corpus — sparse lexical retrieval with df-pruned postings and
    * micro-unit-exact score sums. (On this deliberately tiny
    * vocabulary, BM25's length normalization can rank a short
    * term-dense document above the query's own longer source — the
    * correct Okapi behavior, replayed identically by the oracle.)
    */
  private[graft] def bm25SearchQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.TfIdf.bm25Search(d, "doc_id", "text",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, maxDf = 400L)
      .orderBy("query_id", "rank")
  }

  /** q171 probed through the STANDING index instead of a from-scratch
    * build: the corpus lands as three ingest batches' worth of
    * [[graft.text.TfIdf.bm25IndexShard]] rows (the incremental
    * maintenance state — [[graft.streaming.EventStreams
    * .bm25IndexMaintenanceSink]]'s store shape), and the search runs
    * [[graft.text.TfIdf.bm25SearchOverIndex]] over their union. Same
    * queries, same parameters, same ORACLE TEXT as q171 — the oracle
    * equality IS the cross-engine proof that the shard algebra
    * reconstructs the exact from-scratch index.
    */

  private[graft] def bm25IncrementalQ(
      s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val shards = (0 to 2).map(b =>
        graft.text.TfIdf.bm25IndexShard(
          d.where(col("doc_id") % 3 === b), "doc_id", "text",
          lit(b.toLong)))
      .reduce(_ unionByName _)
    graft.text.TfIdf.bm25SearchOverIndex(shards, "doc_id",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, maxDf = 400L)
      .orderBy("query_id", "rank")
  }

  /** Count-min-sketch frequency audit ([[graft.quality.CountMin]]):
    * the corpus token stream builds a 4×512 CMS in four shards (the
    * maintenance-store shape), and the sketch's point estimates are
    * audited against the exact counts of the TRUE top-15 tokens —
    * the "is the standing sketch still honest" check a pipeline runs
    * on a schedule. `est_cnt ≥ true_cnt` always (CMS never
    * undercounts); `exact` flags collision-free cells. The token
    * frame persists once and feeds both the sketch build and the
    * truth leg.
    */
  /** Unicode NFC canonicalization via the codegen'd `graft_normalize`
    * expression ([[graft.expressions.UnicodeNormalize]]): every
    * document gets a combining acute (U+0301) appended, and NFC
    * composes it with the final character exactly when a precomposed
    * form exists (…e → …é, but …t or …. stay decomposed) — so the
    * per-language composition counts exercise real recomposition, not
    * a no-op pass over already-normal ASCII. Lengths stay comparable
    * cross-engine because every involved codepoint is BMP (Spark
    * counts UTF-16 units, DuckDB codepoints).
    */

  /** Retrieval scorecard ([[graft.similarity.Similarity
    * .rankingEval]]) of the q171 BM25 search against metadata
    * relevance: rel 2 = same (source, lang) as the query doc, rel 1 =
    * same lang (an equi-join on lang — positive judgments only, no
    * pair enumeration), self-matches excluded from BOTH sides (the
    * trivial rank-1 hit would read as quality). P@10 divides by the
    * contracted k, trec_eval-style.
    */
  private[graft] def retrievalEvalQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val results = graft.text.TfIdf.bm25Search(d, "doc_id", "text",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, maxDf = 400L)
      .where(col("doc_id") =!= col("query_id"))
    val q = d.where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("source").as("__qsrc"),
        col("lang"))
    val qrels = d
      .select(col("doc_id").as("did"), col("source").as("__src"),
        col("lang"))
      .join(broadcast(q), Seq("lang"))
      .where(col("did") =!= col("qid"))
      .select(col("qid"), col("did"),
        when(col("__src") === col("__qsrc"), 2).otherwise(1).as("rel"))
    graft.similarity.Similarity.rankingEval(results,
        "query_id", "doc_id", "rank", qrels, "qid", "did", "rel",
        k = 10)
      .orderBy("query_id")
  }

  /** Macro-averaged scorecard ([[graft.similarity.Similarity
    * .rankingEvalMacro]]) over the q246 per-query retrieval eval —
    * the one-row corpus reading (mean P@10 / R@10, MRR, mean nDCG
    * over judged queries, plus the judged-but-zero-hit count the
    * advisor-flagged domain fix made visible). Same inputs as q246.
    */

  private[graft] def retrievalMacroQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val results = graft.text.TfIdf.bm25Search(d, "doc_id", "text",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, maxDf = 400L)
      .where(col("doc_id") =!= col("query_id"))
    val q = d.where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("source").as("__qsrc"),
        col("lang"))
    val qrels = d
      .select(col("doc_id").as("did"), col("source").as("__src"),
        col("lang"))
      .join(broadcast(q), Seq("lang"))
      .where(col("did") =!= col("qid"))
      .select(col("qid"), col("did"),
        when(col("__src") === col("__qsrc"), 2).otherwise(1).as("rel"))
    graft.similarity.Similarity.rankingEvalMacro(results,
      "query_id", "doc_id", "rank", qrels, "qid", "did", "rel",
      k = 10)
  }

  /** Token-drift leaderboard ([[TextAnalysis.tokenDriftLeaderboard]])
    * between the even-doc "baseline crawl" and the odd-doc "current
    * crawl" with a planted ` drifttoken` appended to every current
    * document — the planted token must TOP the χ² board by
    * construction (present in exactly half the corpus on one side
    * only), with the rest of the top-20 reading real sampling
    * variation between the halves.
    */

  /** Dirichlet query-likelihood retrieval
    * ([[graft.text.TfIdf.dirichletQlSearch]]) over the q171 query
    * set — the language-model ranker beside BM25 (the two classical
    * lexical families; q90's RRF can fuse them): matching-terms-only
    * candidates with the closed-form length norm, µ = 100, same
    * df-cap and nano-floored exact accumulation as the BM25 path.
    */
  private[graft] def dirichletQlQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.TfIdf.dirichletQlSearch(d, "doc_id", "text",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, mu = 100.0, maxDf = 400L)
      .orderBy("query_id", "rank")
  }

  /** Quality-selection tradeoff curve: rank the corpus by the
    * composite quality score (exact global deciles via
    * [[Analytics.ntileByRangeAdaptive]] — the two-pass range form at
    * scale, never a single-task global sort) and report, per decile,
    * what a "keep the top X%" policy actually retains: exact-dup
    * membership (md5 groups), short-doc share, mean length, and the
    * score band. The report read before setting a quality floor —
    * q81 picks a per-language cutoff, this shows the whole curve.
    * Mean score is µ-floored per row before the order-free sum.
    */

  /** Rocchio pseudo-relevance feedback
    * ([[graft.text.TfIdf.rocchioPrfSearch]]) on the q171 query set —
    * the query-EXPANSION leg completing the retrieval stack: top-5
    * BM25 feedback docs vote expansion terms by exact Σ tf·⌊idf·10⁶⌋
    * mass, the top-5 non-original terms join the query, and pass 2
    * scores 2·BM25(original) + 1·BM25(expansion) in half-unit micros
    * (α = 1, β = 0.5 as exact integers). The df cap (400) prunes
    * stop-like terms out of both the vote and the probes.
    */
  private[graft] def rocchioPrfQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.TfIdf.rocchioPrfSearch(d, "doc_id", "text",
        d.where(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("text")),
        "query_id", "text", k = 10, fbDocs = 5, fbTerms = 5,
        maxDf = 400L)
      .orderBy("query_id", "rank")
  }

  /** Good–Turing bigram frequency spectrum per language
    * ([[TextAnalysis.goodTuringTable]], c ≤ 8) — the table Katz/SGT
    * smoothing consumes and the empirical discount check (c* < c on
    * low counts): unigrams here are spectrum-empty below c = 9 (31
    * types, ~115 uses each — q307's v1 = 0 row says so), so the
    * classical bigram domain carries the smoothing story, exactly
    * where Katz used it.
    */

  /** The lexical-smoothing A/B the retrieval stack owes its tuner:
    * BM25 and Dirichlet-QL (µ = 100) run the SAME q246/q259 judgment
    * protocol side by side, one macro scorecard row per system — the
    * "which ranker wins on THIS corpus" table that decides the
    * default before anyone reaches for fusion. Same query set, same
    * qrels, same df cap; every eval term keeps the q246 nano-floor
    * discipline, so the comparison cannot be an artifact of float
    * accumulation order.
    */
  private[graft] def smoothingAbQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val queries = d.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text"))
    val q = d.where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("source").as("__qsrc"),
        col("lang"))
    val qrels = d
      .select(col("doc_id").as("did"), col("source").as("__src"),
        col("lang"))
      .join(broadcast(q), Seq("lang"))
      .where(col("did") =!= col("qid"))
      .select(col("qid"), col("did"),
        when(col("__src") === col("__qsrc"), 2).otherwise(1).as("rel"))
      .transform(graft.core.CacheScope.disk)
    def leg(name: String, results: DataFrame): DataFrame =
      graft.similarity.Similarity.rankingEvalMacro(
          results.where(col("doc_id") =!= col("query_id")),
          "query_id", "doc_id", "rank", qrels, "qid", "did", "rel",
          k = 10)
        .select(lit(name).as("system") +: Seq("n_queries",
          "n_judged", "n_zero_hit", "mean_p_at_k", "mean_r_at_k",
          "mrr", "mean_ndcg").map(col): _*)
    leg("bm25", graft.text.TfIdf.bm25Search(d, "doc_id", "text",
        queries, "query_id", "text", k = 10, maxDf = 400L))
      .unionByName(leg("dirichlet_ql",
        graft.text.TfIdf.dirichletQlSearch(d, "doc_id", "text",
          queries, "query_id", "text", k = 10, mu = 100.0,
          maxDf = 400L)))
      .orderBy("system")
  }


  private[graft] def retrievalOracleSql: Map[String, String] = Map(
    // BM25 replay: df-pruned postings, per-term micro quantization
    // BEFORE the per-(query, doc) sum, float literals spelled exactly
    // as the engine computes them,
    // the incremental path must reconstruct the from-scratch index
    // EXACTLY — same oracle text as q171 by construction,
    // eval wraps the SHARED q171 oracle as a subquery; DCG terms are
    // nano-floored before the (order-free) per-query sums, nDCG is a
    // ratio of two quantized sums,
    // macro scorecard over the SAME per-query eval: nano-quantized
    // order-free metric sums over judged queries, mirrored
    // (sum / n_judged) / 1e9 chains,
    // matching-postings candidates, nano-floored per-term lls and
    // the closed-form length norm; |q| counts df-surviving terms,
    // the q171 CTE chain twice: pass-1 top-5 feedback, exact-integer
    // expansion vote (anti-joined against original terms), pass 2 in
    // half-unit micros (2x original + 1x expansion),
    // the q259 macro chain once per ranker (BM25 / Dirichlet-QL),
    // tagged and unioned — same qrels, same nano-floor discipline,
  )
}
