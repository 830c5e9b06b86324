package graft

import graft.sources.Feed
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

class FeedSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes(UTF_8)

  test("RSS: items in order, linkless skipped, channel link/title not items") {
    val rss =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>chan</title><link>https://site.example/</link>
        |<item><link>https://site.example/p1</link><title>one</title><pubDate>01 Jan 2024 00:00:00 GMT</pubDate></item>
        |<item><title>no link</title></item>
        |<item><link>https://site.example/p2?a=1&amp;b=2</link></item>
        |</channel></rss>""".stripMargin
    val p = Feed.parse(b(rss)).toOption.get
    assert(p.kind == "rss")
    assert(p.items == Vector(
      Feed.Item("https://site.example/p1", Some("one"), Some("01 Jan 2024 00:00:00 GMT")),
      Feed.Item("https://site.example/p2?a=1&b=2", None, None)))
  }

  test("Atom: rel selection, feed-level self decoy, published/updated fallback") {
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<link rel="self" href="https://site.example/feed.xml"/>
        |<entry><link rel="self" href="https://site.example/self"/>
        |<link rel="alternate" href="https://site.example/e1"/>
        |<title>t1</title><published>2024-01-01T00:00:00Z</published></entry>
        |<entry><link href="https://site.example/e2"/><updated>2024-02-02T00:00:00Z</updated></entry>
        |<entry><link rel="enclosure" href="https://site.example/audio.mp3"/><title>no doc link</title></entry>
        |</feed>""".stripMargin
    val p = Feed.parse(b(atom)).toOption.get
    assert(p.kind == "atom")
    assert(p.items == Vector(
      Feed.Item("https://site.example/e1", Some("t1"), Some("2024-01-01T00:00:00Z")),
      Feed.Item("https://site.example/e2", None, Some("2024-02-02T00:00:00Z"))))
  }

  test("CDATA titles are literal; plain titles entity-decode; prefixes tolerated") {
    val atom =
      """<a:feed xmlns:a="http://www.w3.org/2005/Atom">
        |<a:entry><a:link href="https://x.example/1"/><a:title><![CDATA[raw &amp; kept]]></a:title></a:entry>
        |<a:entry><a:link href="https://x.example/2"/><a:title>decoded &amp; done</a:title></a:entry>
        |</a:feed>""".stripMargin
    val p = Feed.parse(b(atom)).toOption.get
    // inside CDATA the bytes are literal — "&amp;" must NOT decode
    assert(p.items.map(_.title) ==
      Vector(Some("raw &amp; kept"), Some("decoded & done")))
  }

  test("item cap, gzip transport, malformed input degrades to Left") {
    val many = (1 to 5).map(i =>
      s"<item><link>https://s.example/$i</link></item>").mkString
    val p = Feed.parse(b(s"<rss><channel>$many</channel></rss>"), maxItems = 2).toOption.get
    assert(p.items.map(_.link) == Vector("https://s.example/1", "https://s.example/2"))

    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(b("<rss><channel><item><link>https://z.example/1</link></item></channel></rss>"))
    g.close()
    assert(Feed.parse(out.toByteArray).toOption.get.items.head.link == "https://z.example/1")

    assert(Feed.parse(b("")).isLeft)
    assert(Feed.parse(b("just text")).isLeft)
    assert(Feed.parse(b("<html><body>nope</body></html>")).isLeft)
  }

  test("review-pass hardening: decoys, unquoted hrefs, quoted '>', zip bomb") {
    // an item-level <atom:link rel="self"/> decoy (local name "link")
    // before the RSS <link> must not hide it
    val decoy =
      """<rss><channel><item><atom:link rel="self" href="https://s.example/f.xml"/>
        |<link>https://s.example/real</link><title>t</title></item></channel></rss>""".stripMargin
    assert(Feed.parse(b(decoy)).toOption.get.items ==
      Vector(Feed.Item("https://s.example/real", Some("t"), None)))

    // unquoted attribute values (invalid XML, real feeds) still parse
    val unq = "<feed><entry><link href=https://s.example/u1 /><title>u</title></entry></feed>"
    assert(Feed.parse(b(unq)).toOption.get.items ==
      Vector(Feed.Item("https://s.example/u1", Some("u"), None)))

    // '>' inside a quoted attribute value must not truncate the tag and
    // leak the attribute tail into the element text
    val gtAttr = """<feed><entry><link href="https://s.example/g"/><title type="a>b">Real</title></entry></feed>"""
    assert(Feed.parse(b(gtAttr)).toOption.get.items ==
      Vector(Feed.Item("https://s.example/g", Some("Real"), None)))

    // a small gzip member inflating past the cap degrades to Left instead
    // of materializing the whole payload (the item caps apply too late)
    val bomb = new java.io.ByteArrayOutputStream()
    val g2 = new java.util.zip.GZIPOutputStream(bomb)
    val zeros = new Array[Byte](1 << 20)
    (0 to 70).foreach(_ => g2.write(zeros))
    g2.close()
    val r = Feed.parse(bomb.toByteArray)
    assert(r.isLeft && r.swap.toOption.get.contains("inflates past"))
  }
}
