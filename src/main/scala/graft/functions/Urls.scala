package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Lowercased host of a scheme://host url — userinfo (`user:pass@`) and
    * port stripped, trailing FQDN dots removed; empty string when the url
    * has no scheme://host form. Userinfo and trailing-dot handling matter
    * because this feeds a BLOCKLIST: `https://x@bad.com/` and
    * `https://bad.com./` are classic filter-evasion forms that must still
    * resolve to `bad.com`. */
  def hostOf(url: Column): Column =
    // userinfo greedily swallows up to the LAST '@' in the authority —
    // browser semantics, so `trusted.com@evil.com` resolves to evil.com
    regexp_replace(
      lower(regexp_extract(url, "^[^:/?#]+://(?:[^/?#]*@)?([^/:?#@]*)", 1)),
      "\\.+$", "")

  /** The dot-suffix chain of a host: a.b.example.com →
    * [a.b.example.com, b.example.com, example.com, com] — the match keys
    * for registrable-domain blocklists (array intrinsics, codegen'd;
    * chain length = label count, bounded by real-world host depth). */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Drop pages whose url host falls under any blocklisted domain,
    * subdomains included (the UT1-blocklist filtering step of
    * RefinedWeb-style pipelines — Penedo et al. 2023 §3.1; the list
    * itself ships with the deployment, synthesized in tests).
    *
    * Shape for a 10^12-row page table and a ~10^6-row blocklist: explode
    * each url's suffix chain (≤ host depth rows each), broadcast SEMI-join
    * against the blocklist, `distinct` the surviving ids, and anti-join
    * that back on the id. The page table avoids a shuffle as long as the
    * BLOCKED-id set fits the broadcast threshold — true when the filter
    * removes a small fraction, which is the operating point of a porn/spam
    * blocklist; if a list ever matched billions of pages, AQE falls back
    * to a sort-merge anti-join (correct, one shuffle) rather than failing.
    * The `distinct` shuffles only the exploded MATCHES, not the corpus.
    * NOT a `like '%.domain'` scan per blocklist entry (quadratic) and NOT
    * an `arrays_overlap` against a literal array (re-materialized per
    * row). */
  def dropBlockedDomains(pages: DataFrame, urlCol: String, idCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame = {
    val blockedIds = pages
      .select(col(idCol).as("_bid"),
        explode(domainSuffixes(hostOf(col(urlCol)))).as("_sfx"))
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("_sfx"))),
        Seq("_sfx"), "left_semi")
      .select(col("_bid")).distinct()
    pages.join(blockedIds, col(idCol) === col("_bid"), "left_anti")
  }
}
