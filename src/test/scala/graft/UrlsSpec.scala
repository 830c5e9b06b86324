package graft

import graft.functions.Urls
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("graft-urls-spec")
    .config("spark.ui.enabled", "false").getOrCreate()
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalUrl(col("u"))).collect().map(_.getString(0)).toSeq
  }

  test("canonicalization edge cases") {
    assert(canon(
      "HTTPS://Example.COM:443/a/B?utm_source=x&q=1&fbclid=z#frag",
      "http://Host.Org:80",                 // empty path -> "/"
      "https://h.io/p?utm_a=1&utm_b=2",     // all params tracked -> query dropped
      "https://h.io/p?a=1&b=2",             // order preserved
      "https://h.io:8443/p",                // non-default port kept
      "relative/path?x=1",                  // no scheme -> passthrough
      "https://h.io/Case/Sensitive/Path"    // path case preserved
    ) == Seq(
      "https://example.com/a/B?q=1",
      "http://host.org/",
      "https://h.io/p",
      "https://h.io/p?a=1&b=2",
      "https://h.io:8443/p",
      "relative/path?x=1",
      "https://h.io/Case/Sensitive/Path"))
  }

  test("dropBlockedDomains: subdomain inclusion, no substring false positives") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://bad.com/x"),            // exact match -> blocked
      (2L, "https://a.b.bad.com/y"),        // deep subdomain -> blocked
      (3L, "https://notbad.com/z"),         // suffix STRING but not suffix DOMAIN -> kept
      (4L, "https://bad.com.evil.org/w"),   // blocklisted name as a LEFT part -> kept
      (5L, "https://BAD.COM:8080/p"),       // case + port insensitive -> blocked
      (6L, "https://fine.net/q"),           // unrelated -> kept
      (7L, "no-scheme-url"),                // hostless -> kept (nothing to match)
      (8L, "https://x:y@bad.com/e"),        // userinfo evasion -> still blocked
      (9L, "https://bad.com./e"),           // trailing-dot FQDN evasion -> blocked
      (10L, "https://e@vil.org@bad.com/e")  // '@' spam: last host wins -> blocked
    ).toDF("doc_id", "url")
    val blocklist = Seq("bad.com").toDF("domain")
    val kept = Urls.dropBlockedDomains(pages, "url", "doc_id", blocklist)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L, 6L, 7L))
  }
}
