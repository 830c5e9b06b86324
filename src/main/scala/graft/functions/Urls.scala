package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-style URL canonicalization — the key derivation for URL-level
  * dedup, the cheapest dedup pass a web pipeline runs before any content
  * dedup (public practice: Common Crawl / search canonicalizers):
  *
  *  - fragment dropped;
  *  - scheme and host lowercased;
  *  - scheme-default ports dropped (https:443, http:80);
  *  - tracking parameters removed (utm_*, fbclid, gclid), other params and
  *    their ORDER preserved (reordering would conflate semantically
  *    different urls);
  *  - empty path normalized to "/"; empty query dropped.
  *
  * Pure codegen'd Column expressions; every regex is RE2-safe (no
  * lookarounds) so the DuckDB oracle mirrors each step verbatim. */
object Urls {

  private val TrackingParam = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val schemeHost = lower(regexp_extract(noFrag, "^([^:/?#]+://[^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)", 1)
    val host =
      when(schemeHost.startsWith("https://"), regexp_replace(schemeHost, ":443$", ""))
        .when(schemeHost.startsWith("http://"), regexp_replace(schemeHost, ":80$", ""))
        .otherwise(schemeHost)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)", 1)
    val keptQ = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParam)), "&")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    when(schemeHost === "", url) // not a scheme://host url: pass through
      .otherwise(concat(host, path,
        when(length(keptQ) > 0, concat(lit("?"), keptQ)).otherwise(lit(""))))
  }
}
