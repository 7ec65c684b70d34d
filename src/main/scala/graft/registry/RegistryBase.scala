package graft.registry

import graft.dedup.Dedup
import graft.functions.Fx
import graft.multimodal.Multimodal
import graft.operators.Analytics
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared helpers for the per-domain query registries: table readers
  * and the oracle-SQL CTE builders used by more than one domain. Split
  * out of the original single-file registry; bodies are unchanged.
  */
private[graft] object RegistryBase {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` physical type varies by data generator:
    * TIMESTAMP(NANOS) reads as nanos longs (Sessions sets the legacy
    * conf), TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
    * TIMESTAMP_NTZ. Normalize both to a session-TZ (UTC) microsecond
    * TIMESTAMP so downstream `unix_micros`/window arithmetic sees one
    * type; the wall-clock values are UTC instants either way.
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", Fx.nanosToTimestamp(col("ts")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ wall-clock values ARE UTC instants, and the cast
        // below renders them in the SESSION zone — a session built
        // without Sessions.configure (which pins UTC) would silently
        // shift every instant by its local offset; fail loud instead
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events() requires spark.sql.session.timeZone=UTC (set by " +
            "graft.core.Sessions.configure): the NTZ->TIMESTAMP cast " +
            "renders wall-clock values in the session zone")
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** J1: multi-way equi-join + grouped agg, dimensions broadcast. */
  private[graft] def revenueByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy("n_name")

  private[graft] def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  /** MinHash-LSH near-dup pairs (signatures → bands → verify).
    * r=4 rows/band: the s-curve crosses at (1/4)^(1/4) ≈ 0.71 — steep
    * enough that sub-0.2-Jaccard noise pairs (the bulk at corpus scale)
    * almost never become candidates, while 0.8+ pairs are near-certain.
    */
  private[graft] def minhashLshPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** Benchmark decontamination: every 10th document plays the eval
    * set; the rest are the corpus. Flags corpus docs sharing ≥5
    * distinct 5-grams with any benchmark doc — the small-absolute-
    * overlap regime LSH can't serve (see
    * [[Dedup.contaminationCheck]]).
    */
  private[graft] def contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contaminationCheck(
        d.where(col("doc_id") % 10 =!= 0),
        d.where(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 5, minCommon = 5)
      .orderBy("corpus_id", "benchmark_id")
  }

  /** Per-document text metric CTEs (tokens/punct/stop/quality),
    * composable over any source relation carrying a `text` column.
    */
  private[graft] val oracleWords = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private[graft] val oracleStopList = TextAnalysis.stopwords
    .map(w => s"'$w'").mkString(", ")

  private[graft] def oracleMetricsCtes(src: String): String =
    s"""m AS (
       SELECT $src.*,
         len($oracleWords) AS tokens,
         CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
           / CAST(nullif(length(text), 0) AS DOUBLE) AS punct,
         CAST(len(list_filter($oracleWords,
             w -> w IN ($oracleStopList))) AS DOUBLE)
           / CAST(nullif(len($oracleWords), 0) AS DOUBLE) AS stop
       FROM $src),
       q AS (
       SELECT m.*,
         least(CAST(1.0 AS DOUBLE), CAST(tokens AS DOUBLE) / 100.0) * 0.5
           + (1.0 - least(CAST(1.0 AS DOUBLE), coalesce(punct, 0.0) * 5.0)) * 0.25
           + least(CAST(1.0 AS DOUBLE), coalesce(stop, 0.0) * 5.0) * 0.25
           AS quality
       FROM m)"""

  private[graft] val oracleMetricsCte = "WITH " + oracleMetricsCtes("documents")

  /** Distinct word-3-shingle CTEs (q23/q24/q31). */
  private[graft] val oracleShingleCtes =
    s"""sh AS (
       SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle FROM (
           SELECT doc_id, $oracleWords AS ws FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""

  /** MinHash signature + band CTEs (16 hashes, 4 bands of 4). */
  /** Mirrors Dedup's Carter-Wegman family: one md5 per shingle, two
    * 32-bit halves, member i = h1 + i·h2 (exact in BIGINT).
    */
  private[graft] val oracleMinhashCtes: String = {
    val mins = (0 until 16)
      .map(i => s"min(h1 + $i * h2) AS h$i")
      .mkString(", ")
    val bands = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, " +
        s"md5(${(0 until 4).map(r => s"CAST(h${4 * b + r} AS VARCHAR)")
          .mkString(" || '|' || ")}) AS sig FROM sigs")
      .mkString(" UNION ALL ")
    s"""shh AS (
         SELECT doc_id,
           CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
           CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
         FROM sh),
       sigs AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id),
       bands AS ($bands),
       cands AS (
         SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)"""
  }

  /** Exact + near dedup "kept" chain (q31/q73): LSH candidates →
    * exact-Jaccard verify (0.8) → recursive-CTE connected components
    * dropping every non-minimum member, intersected with exact
    * fingerprint dedup (lowest id per normalized text). Needs WITH
    * RECURSIVE plus [[oracleShingleCtes]] and [[oracleMinhashCtes]]
    * upstream; exposes `kept` (surviving documents rows).
    */
  private[graft] val oracleDedupKeptCtes: String =
    s"""pairs AS (
       SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
       FROM sh a JOIN sh b
         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       JOIN cands c ON c.ida = a.doc_id AND c.idb = b.doc_id
       GROUP BY 1, 2),
       verified AS (
         SELECT ida, idb FROM pairs
         JOIN sizes sa ON sa.doc_id = ida
         JOIN sizes sb ON sb.doc_id = idb
         WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
       edges AS (SELECT ida AS a, idb AS b FROM verified
                 UNION SELECT idb, ida FROM verified),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       drops AS (
         SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) < a),
       keep1 AS (
         SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1),
       kept AS (
         SELECT d.* FROM documents d
         JOIN keep1 USING (doc_id)
         WHERE d.doc_id NOT IN (SELECT doc_id FROM drops))"""

  /** One generalized-ESD remove-and-recompute round as CTEs (the
    * q332 device, shared with q388's seasonal-hybrid composition):
    * reads candidate rows from `c\$i (g, v, k)`, emits the round's
    * extreme to `o\$i` and the survivors to `c\${i+1}`. Extreme
    * picked by the exact HUGEINT deviation |v·n − s|, (value, key)
    * tie-broken.
    */
  private[graft] def esdRoundSql(i: Int): String = {
    val (c, s, r, o, cn) = (s"c$i", s"s$i", s"r$i", s"o$i", s"c${i + 1}")
    s"""$s AS (
         SELECT g, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS s,
           sum(CAST(v AS HUGEINT) * v) AS q
         FROM $c GROUP BY g),
       $r AS (
         SELECT $c.g, v, k, n, s, q,
           abs(CAST(v AS HUGEINT) * n - s) AS dev,
           row_number() OVER (PARTITION BY $c.g
             ORDER BY abs(CAST(v AS HUGEINT) * n - s) DESC,
               v ASC, k ASC) AS rn
         FROM $c JOIN $s USING (g)),
       $o AS (
         SELECT g, CAST($i AS BIGINT) AS round, n,
           v AS removed_cents,
           round((CAST(dev AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))),
             6) AS r_stat
         FROM $r WHERE rn = 1 AND n > 2),
       $cn AS (SELECT g, v, k FROM $r WHERE rn <> 1)"""
  }

  /** Language-ID CTEs (marker scores → precedence argmax), composable
    * over any source relation carrying a `text` column; `p` passes all
    * source columns through plus `predicted`.
    */
  private[graft] def oracleLangCtes(src: String): String = {
    val marker = TextAnalysis.langMarkers.map { case (lang, ws) =>
      lang -> s"len(list_filter($oracleWords, w -> w IN (${ws.map(w => s"'$w'").mkString(", ")})))"
    }
    s"""ls AS (
       SELECT $src.*,
         ${marker("en")} AS s_en, ${marker("de")} AS s_de,
         ${marker("es")} AS s_es, ${marker("fr")} AS s_fr,
         length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
       FROM $src),
       p AS (
       SELECT ls.*,
         CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'unknown'
              WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'zh'
              WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
              ELSE 'fr' END AS predicted
       FROM ls)"""
  }
}
