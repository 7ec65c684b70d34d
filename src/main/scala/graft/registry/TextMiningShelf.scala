package graft.registry

import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    "q358_html_extract" -> (htmlExtractQ _),
    "q359_registrable_domains" -> (registrableDomainsQ _),
    "q361_crawl_ingest_rollup" -> (crawlIngestQ _),
    "q368_robots_directives" -> (robotsQ _),
    "q370_politeness_shards" -> (politenessShardsQ _),
    "q378_pii_audit" -> (piiAuditQ _),
    "q387_soundex_blocks" -> (soundexBlocksQ _),
  )

  /** Phonetic confusion blocks ([[graft.text.Phonetic
    * .soundexBlocks]]) over the part-name vocabulary: distinct words
    * keyed by simplified Soundex, blocks ranked by distinct-word
    * count with sorted member lists — the entity-resolution blocking
    * key in action (pair scoring would run within blocks only, the
    * bounded-pair discipline).
    */
  private[graft] def soundexBlocksQ(
      s: SparkSession, dir: String): DataFrame =
    graft.text.Phonetic.soundexBlocks(
      t(s, dir, "part").select(
        explode(TextAnalysis.words(col("p_name"))).as("__w")),
      col("__w"), topK = 30)

  /** Per-source PII exposure audit: payment-card candidates (maximal
    * 13–19 digit runs, [[graft.text.TextAnalysis.ccCandidates]])
    * validated by the Luhn mod-10 checksum
    * ([[graft.text.TextAnalysis.luhnValid]]), plus email and SSN
    * pattern counts — the scrub-gate datasheet row a training-data
    * pipeline reads before release. A valid card is planted on every
    * 37th document and a checksum-FAILING 16-digit run on every 41st,
    * so the candidates-vs-valid split is exercised by construction;
    * natural digit runs in the corpus land in `cc_candidates` and
    * are (almost always) rejected by the checksum. One scan,
    * map-side-combinable aggregation; the Luhn fold is a codegen'd
    * array aggregate, no UDF.
    */
  private[graft] def piiAuditQ(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    val d = docs(s, dir)
      .where(col("text").isNotNull && col("source").isNotNull)
    val t2 = concat(col("text"),
      when(col("doc_id") % 37 === 0, lit(" card 4532015112830366"))
        .otherwise(lit("")),
      when(col("doc_id") % 41 === 0, lit(" card 1234567812345678"))
        .otherwise(lit("")))
    val cands = TextAnalysis.ccCandidates(t2)
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    d.select(col("source"), size(cands).as("__cn"),
        size(filter(cands, c => TextAnalysis.luhnValid(c)))
          .as("__ln"),
        size(regexp_extract_all(t2, lit(emailRe), lit(0))).as("__em"),
        size(regexp_extract_all(t2, lit(ssnRe), lit(0))).as("__sn"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__cn").cast("long")).as("cc_candidates"),
        sum(col("__ln").cast("long")).as("cc_valid"),
        sum(col("__em").cast("long")).as("emails"),
        sum(col("__sn").cast("long")).as("ssns"))
      .withColumn("cc_per_1000_docs",
        round(col("cc_valid").cast("double") * 1000.0 /
          col("n_docs").cast("double"), 6))
      .orderBy("source")
  }

  /** Per-domain politeness shard plan — the frontier-budgeting
    * composition over the crawl shelf (q359's registrable domains +
    * q368's crawl-delay arithmetic): per registrable domain, page
    * count and the domain's crawl-delay give `load = n_pages·delay`
    * (seconds to drain at one polite fetcher), and domains snake
    * into 8 fetcher shards by load rank (rank r → shard r mod 16
    * folded, the LPT-flavored interleave) so no shard hoards the
    * heavy domains — ALL as windows and arithmetic in one lazy
    * plan, no driver loop. The null-domain quarantine (localhost)
    * stays visible in shard −1. `shard_load` prices each fetcher's
    * drain time; the spec pins the snake's balance bound.
    */
  private[graft] def politenessShardsQ(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val base = when(id % 5 === 0,
        concat(lit("mart"), (id % 4).cast("string"), lit(".com")))
      .when(id % 5 === 1,
        concat(lit("shop"), (id % 4).cast("string"), lit(".co.uk")))
      .when(id % 5 === 2,
        concat(lit("site"), (id % 4).cast("string"), lit(".com.au")))
      .when(id % 5 === 3,
        concat(lit("svc"), (id % 4).cast("string"), lit(".ne.jp")))
      .otherwise(
        concat(lit("app"), (id % 4).cast("string"), lit(".io")))
    val host = when(id % 13 === 0, lit("localhost"))
      .otherwise(concat(lit("sub"), (id % 3).cast("string"),
        lit("."), base))
    val perDomain = docs(s, dir)
      .select(id,
        graft.text.Web.registrableDomain(host).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        min(id).as("__did"))
      .withColumn("crawl_delay", lit(1L) + col("__did") % 9)
      .withColumn("load", col("n_pages") * col("crawl_delay"))
    val nShards = 8
    val rk = row_number().over(Window
      .orderBy(col("load").desc, col("domain").asc)) - 1
    val fold = rk % (2 * nShards)
    val shard = when(col("domain").isNull, lit(-1))
      .otherwise(when(fold < nShards, fold)
        .otherwise(lit(2 * nShards - 1) - fold))
    // the global rank window reads the DOMAIN-sized frame (a grouped
    // aggregate, bounded by the registrable-domain domain — the q78
    // plan-gate reading), never the page rows
    val planned = perDomain
      .withColumn("shard", shard.cast("int"))
    planned
      .withColumn("shard_load",
        sum(col("load")).over(Window.partitionBy("shard")))
      .select(col("domain"), col("n_pages"), col("crawl_delay"),
        col("load"), col("shard"), col("shard_load"))
      .orderBy("shard", "domain")
  }

  /** robots.txt directive parse ([[graft.text.Web
    * .robotsDirectives]]): each doc_id synthesizes a realistic
    * policy file — a comment header, a `*` group (disallow, an
    * allow with an INLINE comment, crawl-delay; the disallow
    * case-flipped on even ids to prove case-insensitive fields), a
    * second group that on every 7th id opens with TWO consecutive
    * user-agent lines (one group, not two — the REP run rule), a
    * colon-less junk line on every 13th id (ignored, never
    * misread), and a global sitemap (grp null). Closed-form oracle
    * over the builder's id arithmetic.
    */
  private[graft] def robotsQ(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val txt = concat(
      lit("# crawl policy "), id.cast("string"), lit("\n"),
      lit("User-agent: *\n"),
      when(id % 2 === 0, "DISALLOW: /private\n")
        .otherwise(lit("Disallow: /private\n")),
      lit("Allow: /private/p"), (id % 5).cast("string"),
      lit(" # reviewed\n"),
      lit("Crawl-delay: "), (lit(1L) + id % 9).cast("string"),
      lit("\n\n"),
      when(id % 7 === 0, "User-agent: bot-a\nUser-agent: bot-b\n")
        .otherwise(concat(lit("User-agent: bot-"),
          (id % 3).cast("string"), lit("\n"))),
      lit("Disallow: /tmp"), (id % 4).cast("string"), lit("\n"),
      when(id % 13 === 0, "junk line without colon\n")
        .otherwise(lit("")),
      lit("Sitemap: https://site"), id.cast("string"),
      lit(".example/map.xml"))
    docs(s, dir)
      .select(id, graft.text.Web.robotsDirectives(txt).as("d"))
      .select(id, posexplode(col("d")).as(Seq("idx", "e")))
      .select(id, col("idx").cast("int").as("idx"),
        col("e.grp").as("grp"), col("e.field").as("field"),
        col("e.value").as("value"))
      .orderBy("doc_id", "idx")
  }

  /** Composed crawl-ingest rollup — the q273/q175 composition
    * treatment for the crawl shelf: page wrap → [[graft.text.Web
    * .htmlToText]] extraction → [[graft.text.Web.canonicalizeUrl]] →
    * [[graft.text.Web.registrableDomain]] → per-domain quality
    * rollup, ALL IN ONE LAZY PLAN over one scan of the corpus (at
    * 100 TB nobody runs ingest as four passes). Per registrable
    * domain: page count, distinct canonical URLs (the frontier's
    * dedup numerator), extracted chars, and the mean text-to-markup
    * density (exact char sums, ONE division). Malformed URLs land in
    * the null-domain quarantine row with the same stats.
    */
  private[graft] def crawlIngestQ(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val html = concat(
      lit("<html><head><script>var x = 1;</script>" +
        "<style>.c{x:1}</style></head><body>" +
        "<nav><a>Home</a>|<a>About</a></nav><h1>Doc "),
      id.cast("string"),
      lit("</h1><p>"), col("text"),
      lit(" &amp; extras &lt;ok&gt;</p><!-- hidden -->" +
        "<footer>(c) site</footer></body></html>"))
    val scheme = when(id % 3 === 0, "HTTP").otherwise(lit("http"))
    val hostRaw = concat(
      when(id % 2 === 0, "Example").otherwise(lit("example")),
      (id % 20).cast("string"), lit(".com"))
    val port = when(id % 4 === 0, ":80").otherwise(lit(""))
    val path = concat(lit("/p"), (id % 6).cast("string"))
    val query = when(id % 2 === 0,
      concat(lit("?utm_source=x&b=2&a="), (id % 5).cast("string")))
      .otherwise(concat(lit("?b=2&a="), (id % 5).cast("string")))
    val frag = when(id % 5 === 0, "#sec").otherwise(lit(""))
    val familyA = concat(scheme, lit("://"), hostRaw, port, path,
      query, frag)
    val familyB = concat(lit("HTTPS://Api"), (id % 20).cast("string"),
      lit(".io:443"))
    val raw = when(id % 13 === 0,
        concat(lit("not-a-url-"), id.cast("string")))
      .when(id % 11 === 0, familyB)
      .otherwise(familyA)
    val canon = graft.text.Web.canonicalizeUrl(raw)
    val canonHost = substring_index(
      regexp_extract(canon, "^[a-z0-9+.-]+://([^/?#]*)", 1), ":", 1)
    docs(s, dir).where(col("text").isNotNull)
      .select(id,
        graft.text.Web.htmlToText(html).as("extracted"),
        length(html).as("__n_raw"),
        canon.as("canonical"),
        graft.text.Web.registrableDomain(canonHost).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("canonical")).as("n_unique_urls"),
        sum(length(col("extracted"))).as("chars_extracted"),
        round(sum(length(col("extracted"))).cast("double") /
          sum(col("__n_raw")).cast("double"), 6).as("mean_density"))
      .orderBy("domain")
  }

  /** HTML-to-text extraction ([[graft.text.Web.htmlToText]]): each
    * document wrapped in a crawl-shaped page (script + style blocks,
    * nav, a comment, entity-escaped punctuation) and stripped back
    * to text as one pure expression chain — script/style contents
    * must vanish, tags become word boundaries, entities decode,
    * whitespace folds. `density` (extracted/raw chars) is the
    * text-to-markup quality signal boilerplate classifiers consume.
    * The oracle replays the identical RE2-safe regexp chain.
    */
  private[graft] def htmlExtractQ(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val html = concat(
      lit("<html><head><script>var x = 1;</script>" +
        "<style>.c{x:1}</style></head><body>" +
        "<nav><a>Home</a>|<a>About</a></nav><h1>Doc "),
      id.cast("string"),
      lit("</h1><p>"), col("text"),
      lit(" &amp; extras &lt;ok&gt;</p><!-- hidden -->" +
        "<footer>(c) site</footer></body></html>"))
    docs(s, dir).where(col("text").isNotNull)
      .select(id,
        graft.text.Web.htmlToText(html).as("extracted"),
        length(html).as("n_raw"))
      .select(id, col("extracted"), col("n_raw"),
        length(col("extracted")).as("n_extracted"),
        round(length(col("extracted")).cast("double") /
          col("n_raw").cast("double"), 6).as("density"))
      .orderBy("doc_id")
  }

  /** Registrable-domain rollup ([[graft.text.Web
    * .registrableDomain]]): synthesized crawl hosts across generic
    * and multi-part-suffix families (plus a dotless localhost shape
    * that must land in the null quarantine bucket), grouped to the
    * per-site counts a frontier's politeness budgeting and
    * per-domain caps key on. Closed-form oracle.
    */
  private[graft] def registrableDomainsQ(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val base = when(id % 5 === 0,
        concat(lit("mart"), (id % 4).cast("string"), lit(".com")))
      .when(id % 5 === 1,
        concat(lit("shop"), (id % 4).cast("string"), lit(".co.uk")))
      .when(id % 5 === 2,
        concat(lit("site"), (id % 4).cast("string"), lit(".com.au")))
      .when(id % 5 === 3,
        concat(lit("svc"), (id % 4).cast("string"), lit(".ne.jp")))
      .otherwise(
        concat(lit("app"), (id % 4).cast("string"), lit(".io")))
    val host = when(id % 13 === 0, lit("localhost"))
      .otherwise(concat(lit("sub"), (id % 3).cast("string"),
        lit("."), base))
    docs(s, dir)
      .select(graft.text.Web.registrableDomain(host).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("domain")
  }

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
    // the published Soundex table replayed step for step: translate,
    // adjacent-run collapse via positional compare, zero-drop,
    // LETTER + 3 pad — no engine built-in on either side
    "q387_soundex_blocks" ->
      """WITH w0 AS (
           SELECT unnest(regexp_extract_all(lower(p_name),
             '[a-z0-9]+')) AS w
           FROM part),
         wc AS (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM w0
           WHERE regexp_full_match(w, '[a-z]+') GROUP BY 1),
         cs AS (
           SELECT w, n, translate(w, 'abcdefghijklmnopqrstuvwxyz',
             '01230120022455012623010202') AS c
           FROM wc),
         col_ AS (
           SELECT w, n,
             array_to_string(list_transform(
               range(2, greatest(length(c), 2) + 1), i ->
                 CASE WHEN i <= length(c) AND c[i] <> c[i-1]
                   THEN c[i] ELSE '' END), '') AS tl
           FROM cs),
         keyed AS (
           SELECT w, n,
             upper(substr(w, 1, 1))
               || rpad(substr(replace(tl, '0', ''), 1, 3), 3, '0')
               AS soundex
           FROM col_)
         SELECT soundex, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n) AS BIGINT) AS n_occurrences,
           string_agg(w, ', ' ORDER BY w) AS members
         FROM keyed GROUP BY 1
         ORDER BY n_words DESC, soundex LIMIT 30""",
    // maximal-digit-run candidates (no lookaround — RE2-portable),
    // the Luhn fold replayed as a list_transform over 1-based char
    // positions with the identical (len − i) % 2 parity
    "q378_pii_audit" ->
      """WITH b AS (
           SELECT source,
             text
               || CASE WHEN doc_id % 37 = 0
                 THEN ' card 4532015112830366' ELSE '' END
               || CASE WHEN doc_id % 41 = 0
                 THEN ' card 1234567812345678' ELSE '' END AS t2
           FROM documents
           WHERE text IS NOT NULL AND source IS NOT NULL),
         c AS (
           SELECT source,
             list_filter(regexp_extract_all(t2, '[0-9]+'),
               x -> length(x) BETWEEN 13 AND 19) AS cands,
             len(regexp_extract_all(t2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS emails,
             len(regexp_extract_all(t2, '\b\d{3}-\d{2}-\d{4}\b'))
               AS ssns
           FROM b),
         l AS (
           SELECT source, len(cands) AS cand_n, emails, ssns,
             len(list_filter(cands, s ->
               list_sum(list_transform(range(1, length(s) + 1), i ->
                 CASE WHEN (length(s) - i) % 2 = 1
                   THEN CASE WHEN 2 * CAST(s[i] AS INT) > 9
                     THEN 2 * CAST(s[i] AS INT) - 9
                     ELSE 2 * CAST(s[i] AS INT) END
                   ELSE CAST(s[i] AS INT) END)) % 10 = 0)) AS luhn_n
           FROM c)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(cand_n) AS BIGINT) AS cc_candidates,
           CAST(sum(luhn_n) AS BIGINT) AS cc_valid,
           CAST(sum(emails) AS BIGINT) AS emails,
           CAST(sum(ssns) AS BIGINT) AS ssns,
           round(CAST(sum(luhn_n) AS DOUBLE) * 1000.0
             / CAST(count(*) AS DOUBLE), 6) AS cc_per_1000_docs
         FROM l GROUP BY 1 ORDER BY 1""",
    // closed form of the q359 host builder (subN strips, base stays);
    // snake allocation replayed with NULLS FIRST pinned to Spark's
    // asc null order; shard_load a per-shard window sum
    "q370_politeness_shards" ->
      """WITH dom AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN NULL
               WHEN doc_id % 5 = 0
                 THEN 'mart' || CAST(doc_id % 4 AS VARCHAR) || '.com'
               WHEN doc_id % 5 = 1
                 THEN 'shop' || CAST(doc_id % 4 AS VARCHAR)
                   || '.co.uk'
               WHEN doc_id % 5 = 2
                 THEN 'site' || CAST(doc_id % 4 AS VARCHAR)
                   || '.com.au'
               WHEN doc_id % 5 = 3
                 THEN 'svc' || CAST(doc_id % 4 AS VARCHAR)
                   || '.ne.jp'
               ELSE 'app' || CAST(doc_id % 4 AS VARCHAR) || '.io'
               END AS domain
           FROM documents),
         pd AS (
           SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
             min(doc_id) AS did
           FROM dom GROUP BY domain),
         pl AS (
           SELECT domain, n_pages,
             CAST(1 + did % 9 AS BIGINT) AS crawl_delay,
             CAST(n_pages * (1 + did % 9) AS BIGINT) AS load
           FROM pd),
         rk AS (
           SELECT *, row_number() OVER (
             ORDER BY load DESC, domain ASC NULLS FIRST) - 1 AS r
           FROM pl),
         sh AS (
           SELECT domain, n_pages, crawl_delay, load,
             CAST(CASE WHEN domain IS NULL THEN -1
               WHEN r % 16 < 8 THEN r % 16
               ELSE 15 - (r % 16) END AS INT) AS shard
           FROM rk)
         SELECT domain, n_pages, crawl_delay, load, shard,
           CAST(sum(load) OVER (PARTITION BY shard) AS BIGINT)
             AS shard_load
         FROM sh ORDER BY shard, domain NULLS FIRST""",
    // closed form of the robots builder: fixed first-group rows,
    // variant-dependent second-group indices (the 7-mod double
    // user-agent run shifts later rows by one), junk line emits
    // nothing, sitemap grp NULL
    "q368_robots_directives" ->
      """WITH d AS (SELECT doc_id FROM documents)
         SELECT doc_id, CAST(idx AS INT) AS idx,
           CAST(grp AS INT) AS grp, field, value FROM (
           SELECT doc_id, 0 AS idx, 1 AS grp,
             'user-agent' AS field, '*' AS value FROM d
           UNION ALL
           SELECT doc_id, 1, 1, 'disallow', '/private' FROM d
           UNION ALL
           SELECT doc_id, 2, 1, 'allow',
             '/private/p' || CAST(doc_id % 5 AS VARCHAR) FROM d
           UNION ALL
           SELECT doc_id, 3, 1, 'crawl-delay',
             CAST(1 + doc_id % 9 AS VARCHAR) FROM d
           UNION ALL
           SELECT doc_id, 4, 2, 'user-agent',
             CASE WHEN doc_id % 7 = 0 THEN 'bot-a'
               ELSE 'bot-' || CAST(doc_id % 3 AS VARCHAR) END FROM d
           UNION ALL
           SELECT doc_id, 5, 2, 'user-agent', 'bot-b'
           FROM d WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 6 ELSE 5 END,
             2, 'disallow', '/tmp' || CAST(doc_id % 4 AS VARCHAR)
           FROM d
           UNION ALL
           SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 7 ELSE 6 END,
             NULL, 'sitemap', 'https://site'
               || CAST(doc_id AS VARCHAR) || '.example/map.xml'
           FROM d)
         ORDER BY doc_id, idx""",
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
    // replays the IDENTICAL RE2-safe regexp chain (script → style →
    // comments → tags → entities with amp LAST → whitespace) over
    // the same synthesized page; density one mirrored division
    "q358_html_extract" ->
      """WITH h AS (
           SELECT doc_id,
             '<html><head><script>var x = 1;</script>'
               || '<style>.c{x:1}</style></head><body>'
               || '<nav><a>Home</a>|<a>About</a></nav><h1>Doc '
               || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
               || ' &amp; extras &lt;ok&gt;</p><!-- hidden -->'
               || '<footer>(c) site</footer></body></html>' AS html
           FROM documents WHERE text IS NOT NULL),
         s1 AS (SELECT doc_id, len(html) AS n_raw,
           regexp_replace(html,
             '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t
           FROM h),
         s2 AS (SELECT doc_id, n_raw, regexp_replace(t,
           '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id, n_raw, regexp_replace(t,
           '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id, n_raw, regexp_replace(t,
           '<[^>]+>', ' ', 'g') AS t FROM s3),
         s5 AS (SELECT doc_id, n_raw,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
           FROM s4),
         s6 AS (SELECT doc_id, n_raw,
           trim(regexp_replace(t, '[ \t\n\r\f]+', ' ', 'g')) AS extracted
           FROM s5)
         SELECT doc_id, extracted, CAST(n_raw AS INT) AS n_raw,
           CAST(len(extracted) AS INT) AS n_extracted,
           round(CAST(len(extracted) AS DOUBLE)
             / CAST(n_raw AS DOUBLE), 6) AS density
         FROM s6 ORDER BY doc_id""",
    // closed form of the host builder's id arithmetic; localhost
    // lands in the null quarantine bucket
    "q359_registrable_domains" ->
      """WITH d AS (
           SELECT CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 5 = 0 THEN
               'mart' || CAST(doc_id % 4 AS VARCHAR) || '.com'
             WHEN doc_id % 5 = 1 THEN
               'shop' || CAST(doc_id % 4 AS VARCHAR) || '.co.uk'
             WHEN doc_id % 5 = 2 THEN
               'site' || CAST(doc_id % 4 AS VARCHAR) || '.com.au'
             WHEN doc_id % 5 = 3 THEN
               'svc' || CAST(doc_id % 4 AS VARCHAR) || '.ne.jp'
             ELSE 'app' || CAST(doc_id % 4 AS VARCHAR) || '.io'
             END AS domain
           FROM documents)
         SELECT domain, CAST(count(*) AS BIGINT) AS n_rows
         FROM d GROUP BY domain ORDER BY domain NULLS FIRST""",
    // ONE grouped pass over the q358 extraction chain joined to the
    // q355/q359 closed forms; density one mirrored division
    "q361_crawl_ingest_rollup" ->
      """WITH h AS (
           SELECT doc_id,
             '<html><head><script>var x = 1;</script>'
               || '<style>.c{x:1}</style></head><body>'
               || '<nav><a>Home</a>|<a>About</a></nav><h1>Doc '
               || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
               || ' &amp; extras &lt;ok&gt;</p><!-- hidden -->'
               || '<footer>(c) site</footer></body></html>' AS html
           FROM documents WHERE text IS NOT NULL),
         s1 AS (SELECT doc_id, len(html) AS n_raw,
           regexp_replace(html,
             '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t
           FROM h),
         s2 AS (SELECT doc_id, n_raw, regexp_replace(t,
           '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id, n_raw, regexp_replace(t,
           '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id, n_raw, regexp_replace(t,
           '<[^>]+>', ' ', 'g') AS t FROM s3),
         s5 AS (SELECT doc_id, n_raw,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
           FROM s4),
         s6 AS (SELECT doc_id, n_raw,
           trim(regexp_replace(t, '[ \t\n\r\f]+', ' ', 'g')) AS extracted
           FROM s5),
         c AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN NULL
               WHEN doc_id % 11 = 0 THEN
                 'https://api' || CAST(doc_id % 20 AS VARCHAR)
                   || '.io/'
               ELSE 'http://example' || CAST(doc_id % 20 AS VARCHAR)
                 || '.com/p' || CAST(doc_id % 6 AS VARCHAR)
                 || '?a=' || CAST(doc_id % 5 AS VARCHAR) || '&b=2'
             END AS canonical,
             CASE WHEN doc_id % 13 = 0 THEN NULL
               WHEN doc_id % 11 = 0 THEN
                 'api' || CAST(doc_id % 20 AS VARCHAR) || '.io'
               ELSE 'example' || CAST(doc_id % 20 AS VARCHAR)
                 || '.com'
             END AS domain
           FROM documents WHERE text IS NOT NULL),
         j AS (
           SELECT s6.doc_id, s6.extracted, s6.n_raw, c.canonical,
             c.domain
           FROM s6 JOIN c USING (doc_id))
         SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
           CAST(count(DISTINCT canonical) AS BIGINT)
             AS n_unique_urls,
           CAST(sum(len(extracted)) AS BIGINT) AS chars_extracted,
           round(CAST(sum(len(extracted)) AS DOUBLE)
             / CAST(sum(n_raw) AS DOUBLE), 6) AS mean_density
         FROM j GROUP BY domain ORDER BY domain NULLS FIRST""",
  )
}
