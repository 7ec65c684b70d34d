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
}
