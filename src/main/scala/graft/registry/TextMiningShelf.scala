package graft.registry

import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Text-mining shelf (round 16): keyword extraction, collocation
  * significance and readability — the corpus-description operators
  * next to [[TextRegistry]]'s quality/tokenizer families. Mixed into
  * [[TextRegistry]]; conventions: see [[graft.SparkEntry]].
  */
private[graft] trait TextMiningShelf {

  private[graft] def miningQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q335_dunning_llr" -> (dunningQ _),
    "q336_readability" -> (readabilityQ _),
    "q337_rake_keywords" -> (rakeQ _),
  )

  /** Dunning G² collocation board
    * ([[TextAnalysis.dunningCollocations]]) over the corpus — the
    * volume-weighted sibling of q239's PMI board (PMI's top ranks
    * drown in rare-pair noise; G²'s don't), margins from
    * bigram-position counts.
    */
  private[graft] def dunningQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dunningCollocations(docs(s, dir), "text",
      minPairCount = 5, topK = 50)

  /** Flesch / Flesch–Kincaid readability per language
    * ([[TextAnalysis.readabilityScores]]): corpus-level word,
    * sentence and vowel-group-syllable totals — the reading-level
    * axis of the quality dashboard.
    */
  private[graft] def readabilityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.readabilityScores(
        docs(s, dir).where(col("text").isNotNull &&
          col("lang").isNotNull),
        "lang", "text")
      .orderBy("lang")

  /** RAKE keyword board ([[TextAnalysis.rakeKeywords]]): top
    * stopword-free phrases by the degree/frequency co-occurrence
    * score, exact micro-integer ranking.
    */
  private[graft] def rakeQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rakeKeywords(docs(s, dir), "doc_id", "text",
      topK = 25)

  private[graft] def miningOracleSql: Map[String, String] = Map(
    // the q239 bigram CTE with position-count margins; each G² term
    // one ln over exact-int doubles, zero cells contribute zero
    "q335_dunning_llr" ->
      """WITH wd AS (
           SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         b AS (
           SELECT ws[i] AS w1, ws[i+1] AS w2 FROM wd,
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
               AS i) t),
         p AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
           FROM b GROUP BY 1, 2 HAVING count(*) >= 5),
         f AS (
           SELECT w1, CAST(count(*) AS BIGINT) AS n_w1_first
           FROM b GROUP BY 1),
         sc AS (
           SELECT w2, CAST(count(*) AS BIGINT) AS n_w2_second
           FROM b GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
         j AS (
           SELECT p.w1, p.w2, n_pair, n_w1_first, n_w2_second,
             CAST(n_pair AS DOUBLE) AS ad,
             CAST(n_w1_first AS DOUBLE) AS r1,
             CAST(n_w2_second AS DOUBLE) AS c1,
             CAST(n AS DOUBLE) AS nd
           FROM p
           JOIN f ON f.w1 = p.w1
           JOIN sc ON sc.w2 = p.w2
           CROSS JOIN tot)
         SELECT w1, w2, n_pair, n_w1_first, n_w2_second,
           round(2.0 * (
             (CASE WHEN ad > 0
               THEN ad * ln(ad * nd / (r1 * c1)) ELSE 0.0 END)
             + (CASE WHEN r1 - ad > 0
               THEN (r1 - ad) * ln((r1 - ad) * nd / (r1 * (nd - c1)))
               ELSE 0.0 END)
             + (CASE WHEN c1 - ad > 0
               THEN (c1 - ad) * ln((c1 - ad) * nd / ((nd - r1) * c1))
               ELSE 0.0 END)
             + (CASE WHEN nd - r1 - c1 + ad > 0
               THEN (nd - r1 - c1 + ad) * ln((nd - r1 - c1 + ad) * nd
                 / ((nd - r1) * (nd - c1)))
               ELSE 0.0 END)), 6) AS g2
         FROM j ORDER BY g2 DESC, w1, w2 LIMIT 50""",
    // three exact-long counters per group; scores one fixed double
    // expression each
    "q336_readability" ->
      """WITH per AS (
           SELECT lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS BIGINT) AS w,
             greatest(CAST(len(regexp_extract_all(lower(text),
               '[.!?]+')) AS BIGINT), 1) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS y
           FROM documents
           WHERE text IS NOT NULL AND lang IS NOT NULL),
         ag AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(s) AS BIGINT) AS n_sentences,
             CAST(sum(y) AS BIGINT) AS n_syllables
           FROM per GROUP BY 1)
         SELECT lang, n_docs, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(206.835 - 1.015 * (CAST(n_words AS DOUBLE)
                 / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE)
                 / CAST(n_words AS DOUBLE)), 4) END AS flesch,
           CASE WHEN n_words > 0 THEN
             round(0.39 * (CAST(n_words AS DOUBLE)
                 / CAST(n_sentences AS DOUBLE))
               + 11.8 * (CAST(n_syllables AS DOUBLE)
                 / CAST(n_words AS DOUBLE)) - 15.59, 4) END AS fk_grade
         FROM ag ORDER BY lang""",
    // pos - row_number run ids; word scores floor(1e6*deg/freq)
    // BEFORE the phrase sum, so the board ranks by exact longs
    "q337_rake_keywords" ->
      """WITH toks AS (
           SELECT doc_id, i AS p, ws[i] AS w
           FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
             FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws)))
               AS i) t),
         ns AS (
           SELECT doc_id, p, w,
             p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
               AS run
           FROM toks WHERE w NOT IN ('the', 'a', 'an', 'and', 'or',
             'of', 'to', 'in', 'is', 'it', 'that', 'for', 'on',
             'with', 'as')),
         occs AS (
           SELECT doc_id, run,
             string_agg(w, ' ' ORDER BY p) AS phrase,
             CAST(count(*) AS BIGINT) AS len
           FROM ns GROUP BY 1, 2),
         wstats AS (
           SELECT w,
             CAST(floor(1e6 * CAST(sum(len) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) AS BIGINT) AS score
           FROM (SELECT ns.w, occs.len FROM ns
             JOIN occs ON ns.doc_id = occs.doc_id
               AND ns.run = occs.run)
           GROUP BY 1),
         pc AS (
           SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
           FROM occs GROUP BY 1),
         mem AS (
           SELECT phrase, unnest(string_split(phrase, ' ')) AS w
           FROM pc),
         ps AS (
           SELECT phrase, CAST(sum(score) AS BIGINT) AS score_micro
           FROM mem JOIN wstats USING (w) GROUP BY 1)
         SELECT pc.phrase, n_occurrences, score_micro
         FROM pc JOIN ps USING (phrase)
         ORDER BY score_micro DESC, phrase LIMIT 25""",
  )
}
