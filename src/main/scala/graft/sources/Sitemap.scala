package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Sitemap protocol (sitemaps.org / RFC-less de-facto standard) — the
  * crawl-seeding artifact `robots.txt` points at ([[Robots.Policy.sitemaps]]):
  * `<urlset>` files list page URLs (+ optional `<lastmod>` for re-crawl
  * scheduling), `<sitemapindex>` files list sub-sitemaps, either may be
  * gzip-compressed, and a plain-text variant carries one URL per line.
  * ADDITIVE surface: the reference has no web code.
  *
  * The parser is a forgiving tag scan, not a validating XML reader — real
  * sitemaps carry namespace prefixes, stray whitespace and unescaped
  * ampersands; a strict parser would reject half the web. Guards: the
  * spec's 50,000-entry cap is enforced (a hostile file can't balloon one
  * task's memory), entries without `<loc>` are skipped, and `<loc>` values
  * longer than the spec's 2,048 chars are dropped. */
object Sitemap {

  /** One sitemap entry: a page URL (urlset) or a sub-sitemap URL (index). */
  final case class Entry(loc: String, lastmod: Option[String])

  final case class Parsed(isIndex: Boolean, entries: Vector[Entry])

  final val MaxEntries = 50000
  final val MaxLocChars = 2048

  /** Parse sitemap bytes: gzip sniffed from the magic, UTF-8 text, XML
    * (`urlset`/`sitemapindex`) or the plain-text one-URL-per-line variant.
    * Malformed input degrades to Left — one bad sitemap must not fail a
    * fetch job. */
  def parse(bytes: Array[Byte]): Either[String, Parsed] =
    try {
      val txt = new String(gunzipIfNeeded(bytes), UTF_8)
      val t = txt.trim
      if (t.isEmpty) Left("sitemap: empty")
      else if (t.charAt(0) != '<') parseText(t)
      else parseXml(t)
    } catch {
      case e: Exception => Left(s"sitemap: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def parseText(t: String): Either[String, Parsed] = {
    val urls = t.split("\r?\n").iterator.map(_.trim)
      .filter(l => l.nonEmpty && l.length <= MaxLocChars)
      .take(MaxEntries).map(Entry(_, None)).toVector
    Right(Parsed(isIndex = false, urls))
  }

  private def parseXml(t: String): Either[String, Parsed] = {
    // namespace-prefix-tolerant: matches the LOCAL element names
    val isIndex = containsElement(t, "sitemapindex")
    val container = if (isIndex) "sitemap" else "url"
    if (!isIndex && !containsElement(t, "urlset"))
      return Left("sitemap: neither <urlset> nor <sitemapindex>")
    val out = Vector.newBuilder[Entry]
    var n = 0
    var from = 0
    var open = indexOfElement(t, container, from)
    while (open >= 0 && n < MaxEntries) {
      val end = indexOfClose(t, container, open)
      val stop = if (end < 0) t.length else end
      val loc = elementText(t, "loc", open, stop)
      val lastmod = elementText(t, "lastmod", open, stop)
      loc.filter(_.length <= MaxLocChars).foreach { l =>
        out += Entry(l, lastmod)
        n += 1
      }
      from = stop + 1
      open = indexOfElement(t, container, from)
    }
    Right(Parsed(isIndex, out.result()))
  }

  /** Decompressed-size cap for gzip transport: a crafted small gzip member
    * can inflate to tens of GB — without the cap the caps on entries and
    * loc length never get a chance to apply (the whole payload would be
    * materialized first and OOM the task). 64 MB is ~1000x the spec's
    * advised uncompressed sitemap size. */
  final val MaxInflatedBytes: Int = 64 << 20

  /** Gzip-sniff + bounded inflate, shared by [[Sitemap.parse]] and
    * [[Feed.parse]] (ONE copy of the transport rules). Throws past
    * `cap` — the callers' catch turns that into a Left. */
  private[sources] def gunzipIfNeeded(bytes: Array[Byte],
      cap: Int = MaxInflatedBytes): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16)
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, cap))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size() + n > cap)
          throw new IllegalArgumentException(s"gzip inflates past $cap bytes")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  /** Index just after the '>' closing the tag that opens at `open` —
    * QUOTE-AWARE: XML allows '>' inside quoted attribute values
    * (`<title type="a>b">`), so a plain indexOf('>') would truncate the
    * tag and leak the attribute tail into element text. */
  private[sources] def tagEnd(t: String, open: Int): Int = {
    var i = open + 1
    var quote: Char = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    t.length
  }

  /** First occurrence of `<name`/`<prefix:name` (element position), or -1. */
  private[sources] def indexOfElement(t: String, name: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = t.indexOf('<', i)
      if (i < 0) return -1
      val s = i + 1
      val e = elementNameEnd(t, s)
      if (e > s && localName(t, s, e).equalsIgnoreCase(name)) return i
      i += 1
    }
    -1
  }

  private[sources] def indexOfClose(t: String, name: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = t.indexOf("</", i)
      if (i < 0) return -1
      val s = i + 2
      val e = elementNameEnd(t, s)
      if (e > s && localName(t, s, e).equalsIgnoreCase(name)) return i
      i += 2
    }
    -1
  }

  private[sources] def containsElement(t: String, name: String): Boolean =
    indexOfElement(t, name, 0) >= 0

  private[sources] def elementNameEnd(t: String, s: Int): Int = {
    var e = s
    while (e < t.length && (t.charAt(e).isLetterOrDigit || t.charAt(e) == ':' ||
        t.charAt(e) == '-' || t.charAt(e) == '_')) e += 1
    e
  }

  private[sources] def localName(t: String, s: Int, e: Int): String = {
    val colon = t.lastIndexOf(':', e - 1)
    if (colon >= s) t.substring(colon + 1, e) else t.substring(s, e)
  }

  /** Trimmed text of the first `name` element inside [from, until) that
    * HAS text, or None. Scans past decoys instead of giving up on the
    * first local-name match — an item-level `<atom:link rel="self"/>`
    * before an RSS `<link>` (both local name "link") must not hide the
    * real element. The closing '>' is found quote-aware ([[tagEnd]]);
    * self-closing elements have no text; CDATA content is literal (XML:
    * no entity decoding inside CDATA), anything else entity-decodes. */
  private[sources] def elementText(t: String, name: String, from: Int, until: Int): Option[String] = {
    var open = indexOfElement(t, name, from)
    while (open >= 0 && open < until) {
      val gt = tagEnd(t, open)
      if (gt > until) return None
      if (t.charAt(gt - 2) != '/') { // self-closing <x/>: no text, keep scanning
        val close = indexOfClose(t, name, gt)
        val stop = if (close < 0 || close > until) until else close
        val body = t.substring(gt, stop).trim
        val v =
          if (body.startsWith("<![CDATA[") && body.endsWith("]]>"))
            body.substring(9, body.length - 3)
          else decodeEntities(body)
        if (v.nonEmpty) return Some(v)
      }
      open = indexOfElement(t, name, open + 1)
    }
    None
  }

  /** The five XML predefined entities plus numeric references — sitemaps
    * REQUIRE escaped ampersands in query-string URLs, so &amp; is the hot
    * case. */
  private[sources] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          s.substring(i + 1, semi) match {
            case "amp"  => sb.append('&'); i = semi + 1
            case "lt"   => sb.append('<'); i = semi + 1
            case "gt"   => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "apos" => sb.append('\''); i = semi + 1
            case num if num.startsWith("#") =>
              val cp = try {
                if (num.startsWith("#x") || num.startsWith("#X"))
                  Integer.parseInt(num.substring(2), 16)
                else Integer.parseInt(num.substring(1))
              } catch { case _: NumberFormatException => -1 }
              if (cp >= 0 && Character.isValidCodePoint(cp)) {
                sb.appendCodePoint(cp); i = semi + 1
              } else { sb.append('&'); i += 1 }
            case _ => sb.append('&'); i += 1
          }
        } else { sb.append('&'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
