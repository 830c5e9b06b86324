package graft

import graft.sources.Robots
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# policy file
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: graftbot-img
      |Allow: /docs/keep*
      |Disallow: /docs/
      |Disallow: /tmp/*.json$
      |Crawl-delay: 2.5
      |
      |Sitemap: https://example.org/sitemap.xml
      |
      |User-agent: *
      |Disallow: /blocked
      |""".stripMargin

  test("group selection: specific token beats *, consecutive UA lines share a group") {
    val p = Robots.parse(txt, "GraftBot")
    assert(p.isAllowed("/blocked"))            // * group ignored: specific exists
    assert(!p.isAllowed("/docs/page"))
    val img = Robots.parse(txt, "graftbot-img")
    assert(!img.isAllowed("/docs/page"))       // same group via second UA line
    val other = Robots.parse(txt, "somebot")
    assert(!other.isAllowed("/blocked"))       // falls to the * group
    assert(other.isAllowed("/docs/page"))
  }

  test("longest match wins; allow wins a length tie") {
    val p = Robots.parse(txt, "graftbot")
    assert(p.isAllowed("/docs/keep/page"))     // allow pattern longer than /docs/
    assert(!p.isAllowed("/docs/other"))
    val tie = Robots.parse("User-agent: a\nAllow: /x/\nDisallow: /x/\n", "a")
    assert(tie.isAllowed("/x/y"))
  }

  test("wildcards and the $ anchor") {
    val p = Robots.parse(txt, "graftbot")
    assert(!p.isAllowed("/tmp/data.json"))     // *.json$ matches at end
    assert(p.isAllowed("/tmp/data.json?x=1"))  // anchor mismatch
    assert(p.isAllowed("/tmp/data.jsonl"))
    val multi = Robots.parse("User-agent: a\nDisallow: /a*b*c\n", "a")
    assert(!multi.isAllowed("/aXbYc/tail"))    // prefix semantics after wildcards
    assert(multi.isAllowed("/aXbY"))
    val anchoredLit = Robots.parse("User-agent: a\nDisallow: /exact$\n", "a")
    assert(!anchoredLit.isAllowed("/exact"))
    assert(anchoredLit.isAllowed("/exact/sub"))
  }

  test("empty Disallow allows everything; rules before any group are ignored; unmatched paths allowed") {
    val p = Robots.parse("Disallow: /orphan\nUser-agent: a\nDisallow:\n", "a")
    assert(p.isAllowed("/orphan"))
    assert(p.isAllowed("/anything"))
    assert(Robots.parse("", "a").isAllowed("/x"))
  }

  test("crawl-delay and sitemaps surface; comments stripped") {
    val p = Robots.parse(txt, "graftbot")
    assert(p.crawlDelaySec.contains(2.5))
    assert(p.sitemaps == Vector("https://example.org/sitemap.xml"))
    assert(Robots.parse(txt, "somebot").crawlDelaySec.isEmpty)
    val commented = Robots.parse("User-agent: a # inline\nDisallow: /x # tail\n", "a")
    assert(!commented.isAllowed("/x/y"))
  }

  test("a matched group with no rules allows everything (and still shadows *)") {
    // the empty Disallow ends the UA run without adding a rule — blank
    // lines alone do NOT separate groups under RFC 9309 (consecutive
    // user-agent lines stack until a rule line appears)
    val t = "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert(Robots.parse(t, "graftbot").isAllowed("/anything"))
    assert(!Robots.parse(t, "x").isAllowed("/anything"))
    // and the stacking itself: a blank line between UA lines keeps one group
    val stacked = "User-agent: a\n\nUser-agent: b\nDisallow: /x\n"
    assert(!Robots.parse(stacked, "a").isAllowed("/x/y"))
    assert(!Robots.parse(stacked, "b").isAllowed("/x/y"))
  }

  test("Frontier.pathQueryOf: the path+query a robots matcher sees") {
    import graft.sources.Frontier.pathQueryOf
    assert(pathQueryOf("https://h.com/a/b?q=1#frag") == "/a/b?q=1")
    assert(pathQueryOf("https://h.com") == "/")
    assert(pathQueryOf("https://h.com#frag") == "/")
    assert(pathQueryOf("https://h.com?q=1") == "/?q=1") // path-less query
    assert(pathQueryOf("/already/a/path") == "/already/a/path")
    assert(pathQueryOf("no-scheme-no-slash") == "/")
  }
}
