package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl ingestion primitives — URL canonicalization, the step
  * before any URL-keyed dedup: crawl frontiers see the same page as
  * `HTTP://Example.com:80/a?b=2&utm_source=x&a=1#frag` and
  * `http://example.com/a?a=1&b=2`, and a 100 TB crawl dedups on the
  * canonical form or not at all.
  */
object Web {

  /** Tracking query parameters stripped by [[canonicalizeUrl]] — the
    * industry-standard removal list (parameters that never change
    * content identity).
    */
  val trackingParams: Seq[String] = Seq("utm_source", "utm_medium",
    "utm_campaign", "utm_term", "utm_content", "fbclid", "gclid",
    "msclkid", "ref")

  /** Canonicalize a URL as ONE pure column expression — no UDF, no
    * java.net.URI (whose parsing the oracle could not mirror):
    * lowercase the scheme and host, strip default ports (`:80` for
    * http, `:443` for https), drop the fragment, remove tracking
    * parameters ([[trackingParams]]), SORT the surviving query
    * parameters (param order never changes content identity), drop
    * an empty query's `?`, and normalize an empty path to `/`.
    *
    * Every step is regexp/array algebra (`regexp_extract`, `split`,
    * `filter`, `array_sort`, `array_join`) with an exact DuckDB
    * twin (`regexp_extract`, `string_split`, `list_filter`,
    * `list_sort`, `list_aggr`), so canonical forms — and therefore
    * URL-dedup hashes — are bit-identical cross-engine. Malformed
    * URLs (no `scheme://host`) return null: a frontier must
    * quarantine them, not dedup garbage.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(
      scheme === "http" && hostPort.endsWith(":80"),
      regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https" && hostPort.endsWith(":443"),
        regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keep = filter(split(query, "&"), p =>
      p =!= "" && !trackingParams
        .map(t => p === t || p.startsWith(t + "="))
        .reduce[Column](_ || _))
    val sortedQ = array_join(array_sort(keep), "&")
    val canon = concat(scheme, lit("://"), host,
      when(path === "", "/").otherwise(path),
      when(sortedQ === "", "").otherwise(concat(lit("?"), sortedQ)))
    when(scheme =!= "" && host =!= "", canon)
      .otherwise(lit(null).cast("string"))
  }

  /** Strip HTML to text as ONE pure column expression — the first
    * transform every crawl corpus goes through: script and style
    * blocks removed WITH their contents, comments removed, remaining
    * tags replaced by spaces (so `<td>a</td><td>b</td>` doesn't fuse
    * words), the five ubiquitous entities decoded, and whitespace
    * collapsed. Deliberately NOT a boilerplate remover — nav/footer
    * TEXT survives; removing repeated boilerplate is the line-dedup
    * family's job (q134/q135), which consumes this op's output.
    *
    * Every pattern is RE2-safe (no backreferences, no lookaround),
    * so the DuckDB oracle replays the identical chain and extracted
    * text — and anything hashed from it — is bit-identical
    * cross-engine. Fixed step order (documented here, mirrored
    * there): script → style → comments → tags → entities (amp LAST,
    * so `&amp;lt;` decodes to the literal `&lt;` the author wrote,
    * not a tag) → whitespace.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    // explicit class, not \s: Java \s includes vertical tab \x0B,
    // RE2 \s does not — the explicit set is identical in both
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }

  /** Multi-label public suffixes the [[registrableDomain]] heuristic
    * recognizes — a pinned subset of the Public Suffix List covering
    * the dominant ccTLD second-level registries; the full PSL is a
    * data file a production frontier would broadcast, with exactly
    * this lookup shape.
    */
  val multiPartSuffixes: Seq[String] = Seq("co.uk", "org.uk",
    "ac.uk", "gov.uk", "com.au", "net.au", "org.au", "co.jp",
    "ne.jp", "com.br", "com.cn", "co.in", "co.kr", "com.mx")

  /** Registrable domain (eTLD+1) of a hostname — the key crawl
    * politeness, per-site caps ([[graft.sampling.Sampling]]'s
    * sourceCap shape) and domain-level dedup group on:
    * `a.b.example.co.uk → example.co.uk`, `x.example.com →
    * example.com`. One regexp alternation over the pinned
    * [[multiPartSuffixes]] (longest match first by construction —
    * the multi-part branch is tried before the generic two-label
    * fall-through), null for hosts without a dot or with an empty
    * label. IP literals are returned whole (a dotted IPv4 is its own
    * "site").
    */
  /** robots.txt directives as ONE pure array-fold expression — the
    * crawl-politeness read next to [[registrableDomain]]: the per-
    * domain policy a frontier parses once and broadcasts. Returns
    * `array<struct<grp int, field string, value string>>` in file
    * order, with REP (RFC 9309) group semantics: consecutive
    * `User-agent` lines open ONE group (grp increments only on the
    * first of a run), `Allow`/`Disallow`/`Crawl-delay` lines attach
    * to the current group and close its agent run, `Sitemap` is
    * global (grp null), comments (`#…`) strip before parsing, field
    * names match case-insensitively, and lines without a colon are
    * ignored — never misread. Matching/merging of groups per crawler
    * agent is the consumer's job (the PSL-subset reading of scope:
    * the parse IS the operator; wildcard path evaluation is a policy
    * layer).
    *
    * Scale: one `aggregate` fold over the line array per document —
    * no UDF, no regex backtracking (the only regex is the comment
    * strip), whole-stage codegen like the header decoders.
    */
  def robotsDirectives(txt: Column): Column = {
    val entryType = "array<struct<grp:int,field:string,value:string>>"
    val init = struct(lit(0).as("grp"), lit(false).as("inAgents"),
      array().cast(entryType).as("out"))
    aggregate(
      split(txt, "\n"),
      init,
      (acc, line) => {
        val stripped = trim(regexp_replace(line, "#.*", ""))
        val hasColon = instr(stripped, ":") > 0
        val field = lower(trim(substring_index(stripped, ":", 1)))
        val value = trim(stripped.substr(
          instr(stripped, ":") + 1, length(stripped)))
        val isAgent = hasColon && field === "user-agent"
        val isRule = hasColon &&
          field.isin("allow", "disallow", "crawl-delay")
        val isSitemap = hasColon && field === "sitemap"
        val grp = when(isAgent && !acc.getField("inAgents"),
          acc.getField("grp") + 1).otherwise(acc.getField("grp"))
        val entry = struct(
          when(isSitemap, lit(null).cast("int")).otherwise(grp)
            .as("grp"),
          field.as("field"), value.as("value"))
        struct(
          grp.as("grp"),
          when(isAgent, lit(true)).when(isRule, lit(false))
            .otherwise(acc.getField("inAgents")).as("inAgents"),
          when(isAgent || isRule || isSitemap,
            concat(acc.getField("out"), array(entry)))
            .otherwise(acc.getField("out")).as("out"))
      },
      acc => acc.getField("out"))
  }

  def registrableDomain(host: Column): Column = {
    val h = lower(host)
    val isIp = h.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    val alts = multiPartSuffixes.map(_.replace(".", "\\."))
      .mkString("|")
    val multi = regexp_extract(h,
      "(^|\\.)([^.]+\\.(" + alts + "))$", 2)
    val generic = regexp_extract(h, "(^|\\.)([^.]+\\.[^.]+)$", 2)
    when(h.isNull, lit(null).cast("string"))
      .when(isIp, h)
      .when(multi =!= "", multi)
      .when(generic =!= "", generic)
      .otherwise(lit(null).cast("string"))
  }
}
