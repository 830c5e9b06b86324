package graft

import graft.fixtures.GoldenGen
import graft.html.Boilerplate
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  test("strips nav/aside/footer and keeps main paragraphs + heading") {
    val (html, expectedBlocks) = GoldenGen.syntheticHtml(seed = 42, paragraphs = 4)
    val r = Boilerplate.extract(html)
    assert(r.text == expectedBlocks.mkString("\n"))
    assert(r.title == expectedBlocks.head)
    assert(r.contentBlocks == expectedBlocks.length)
    assert(!r.text.contains("home"))
    assert(!r.text.contains("copyright"))
  }

  test("deterministic per seed") {
    val a = Boilerplate.extract(GoldenGen.syntheticHtml(7, 3)._1)
    val b = Boilerplate.extract(GoldenGen.syntheticHtml(7, 3)._1)
    assert(a == b)
  }

  test("script/style/comment content never leaks") {
    val html =
      """<html><head><title>t</title><style>p { color: red }</style></head>
        |<body><p>real content words that are long enough to be kept by the classifier rules okay
        |real content words that are long enough to be kept by the classifier rules okay</p>
        |<script>var hidden = "SECRET1";</script>
        |<!-- SECRET2 --><p>tail paragraph with several more words to satisfy the word count threshold
        |here too making it long enough</p></body></html>""".stripMargin
    val r = Boilerplate.extract(html)
    assert(!r.text.contains("SECRET1"))
    assert(!r.text.contains("SECRET2"))
    assert(!r.text.contains("color"))
    assert(r.text.contains("real content words"))
    assert(r.text.contains("tail paragraph"))
  }

  test("link-dense blocks are boilerplate") {
    val html =
      """<body><div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>
        |<p>this paragraph has plenty of plain words and must be retained because its link
        |density is zero and it is long enough for the number of words rules even after a
        |fully linked predecessor which raises the required word count threshold to forty
        |words per the published decision stump so here are some more filler words</p></body>""".stripMargin
    val r = Boilerplate.extract(html)
    assert(!r.text.contains("one"))
    assert(r.text.contains("plenty of plain words"))
  }

  test("entities decode and offsets point into the source") {
    val html = "<body><p>A &amp; B &lt;tag&gt; &#65; &#x42; rest of a sentence with enough words " +
      "to pass the classifier threshold for sure honestly truly</p></body>"
    val r = Boilerplate.extract(html)
    assert(r.text.startsWith("A & B <tag> A B rest"))
    assert(r.spans.nonEmpty)
    val span = r.spans.head
    assert(html.charAt(span.srcOffset) == 'A')
  }

  test("quoted '>' inside attributes does not truncate the tag") {
    val html = """<body><p title="a>b" data-x='c>d'>the paragraph body with enough plain words """ +
      """to satisfy the numwords classifier threshold for content blocks easily</p></body>"""
    val r = Boilerplate.extract(html)
    assert(r.text.startsWith("the paragraph body"))
    assert(!r.text.contains("b\" data"))
  }

  test("astral-plane numeric entities decode as surrogate pairs") {
    val html = "<body><p>emoji &#128512; here plus plenty of additional plain filler words " +
      "to pass the word count threshold of the classifier rules</p></body>"
    val r = Boilerplate.extract(html)
    assert(r.text.contains("emoji 😀 here"))
  }

  test("charset sniffing: latin-1 declaration and UTF-8 BOM") {
    val latin = ("<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\"></head>" +
      "<body><p>café crème paragraph with sufficient additional words appended here " +
      "so that the block easily clears the seventeen word minimum of the classifier rules</p></body></html>")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Boilerplate.extract(latin).text.contains("café crème"))
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "<body><p>utf eight bom page with plenty of words to pass the seventeen word threshold of the classifier rules</p></body>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Boilerplate.extract(bom).text.startsWith("utf eight bom page"))
  }

  test("layout: list items get '- ' markers, table rows join cells with ' | '") {
    import graft.pipeline.Corpus
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val html = new String(Corpus.htmlLayoutFromText(text, 1L), java.nio.charset.StandardCharsets.UTF_8)
    val r = Boilerplate.extract(html)
    assert(r.text == Corpus.htmlLayoutExpected(text), r.text)
    assert(r.text.contains("- w13"))            // first list item marker
    assert(r.text.contains("w42 | w43"))        // cell separator inside a row
    assert(r.text.endsWith("w53 w54 w55 w56 w57 w58 w59 w60")) // single-cell last row
    assert(r.spans.exists(_.kind == "li"))
    // short doc: no list, no table
    val short = Boilerplate.extract(new String(Corpus.htmlLayoutFromText("just five words right here", 2L), java.nio.charset.StandardCharsets.UTF_8))
    assert(short.text == "just five words right here")
  }

  test("layout: missing </li> still closes the item at the next block tag") {
    val html = "<body><p>priming paragraph with more than four plain words here</p>" +
      "<ul><li>first item with plenty of words to keep<li>second item words here kept too</ul>" +
      "<p>after the list this paragraph has enough plain words to be kept as content</p></body>"
    val r = Boilerplate.extract(html)
    assert(r.text.contains("- first item"))
    assert(r.text.contains("- second item"))
    assert(!r.text.contains("- after the list"), r.text) // flag cleared at </ul>
  }

  test("full HTML4 named entity table decodes") {
    val html = "<body><p>em&mdash;dash &hellip; &copy; &eacute; &alpha; &euro; &rarr; &ldquo;q&rdquo; " +
      "plus plenty of additional filler words to pass the classifier threshold rules okay</p></body>"
    val r = Boilerplate.extract(html)
    assert(r.text.contains("em—dash … © é α € → “q”"), r.text)
    assert(graft.html.Entities.table.size == 253) // 252 HTML4 + apos
    assert(graft.html.Entities.table("frac12") == '½')
    assert(graft.html.Entities.table("Omega") == 'Ω')
    // unknown names still fall back to a literal ampersand
    assert(Boilerplate.extract("<body><p>a &notanentity; b plus quite a few additional plain filler words so that " +
      "this single block clears the seventeen word threshold of the classifier rules</p></body>")
      .text.contains("a &notanentity; b"))
  }

  test("fuzz: mutated and truncated HTML never throws") {
    import graft.pipeline.Corpus
    val rnd = new java.util.Random(0x48544d4cL) // "HTML"
    val base = Corpus.htmlFromText("some ordinary body text with enough words to matter here", 3L)
    val layout = Corpus.htmlLayoutFromText((1 to 60).map(i => s"w$i").mkString(" "), 5L)
    Seq(base, layout).foreach { b =>
      (1 to 200).foreach { _ =>
        val m = b.clone()
        (0 until 1 + rnd.nextInt(6)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
        Boilerplate.extract(m) // must not throw
      }
      (1 to 30).foreach(_ => Boilerplate.extract(java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length))))
    }
  }

  test("empty and pathological inputs do not throw") {
    assert(Boilerplate.extract("").text == "")
    Boilerplate.extract("<<<>>>") // must not throw
    assert(Boilerplate.extract("<p").text == "")
    assert(Boilerplate.extract("plain text with no tags at all but quite a few words so it counts as content for the rules").text.nonEmpty)
  }

  test("head metadata: probe closed forms, attribute forms, script forging, robots tokens") {
    import graft.html.Meta
    import graft.pipeline.Corpus
    for (docId <- Seq(1L, 3L, 5L, 9L); text <- Seq("x", "some longer body text here")) {
      val m = Meta.extract(Corpus.htmlMetaProbe(docId, text))
      val len = text.length
      assert(m.canonical == s"https://example${docId % 7}.com/p${docId % 5}", m.canonical)
      assert(m.description == s"desc-$len & more", m.description) // entity decoded
      assert(m.ogTitle == s"og-$len")
      assert(m.ogDescription == s"ogd-$len") // swapped attr order, single quotes
      assert(m.noindex == (docId % 3 == 0) && m.nofollow == (docId % 3 == 0))
    }
    // absent surfaces -> empty/false; robots 'none' implies both flags;
    // first-wins duplicate resolution; forged meta inside <script> ignored
    val none = Meta.extract("<html><head></head><body>hi</body></html>")
    assert(none.canonical == "" && none.description == "" && !none.noindex && !none.nofollow)
    val both = Meta.extract("""<meta name="ROBOTS" content="NONE">""")
    assert(both.noindex && both.nofollow)
    val dup = Meta.extract(
      """<meta name=description content=first><meta name=description content=second>""")
    assert(dup.description == "first")
    val forged = Meta.extract(
      """<script>var x = "<meta name=\"description\" content=\"forged\">";</script>
        |<meta name="description" content="real">""".stripMargin)
    assert(forged.description == "real")
    // pathological: unterminated tag, attr with no value, never throws
    Meta.extract("<meta name=description content")
    Meta.extract("<link rel")
    Meta.extract("")
  }

  test("head metadata hardening: case-insensitive raw-text close, comments, forging, dup attrs, rel tokens") {
    import graft.html.Meta
    import graft.pipeline.Corpus
    // uppercase close tag must end the script skip — losing the rest of
    // the document would drop the canonical key and miss a noindex
    val upper = Meta.extract(
      """<script>x</SCRIPT><meta name="robots" content="noindex">
        |<link rel="canonical" href="https://a.example/x">""".stripMargin)
    assert(upper.noindex && upper.canonical == "https://a.example/x")
    // commented-out stale metadata must not latch (first-wins would
    // otherwise shadow the live values)
    val commented = Meta.extract(
      """<!-- <meta name="robots" content="noindex">
        |     <meta name="description" content="stale"> -->
        |<meta name="description" content="live">""".stripMargin)
    assert(!commented.noindex && commented.description == "live")
    // markup-looking text inside attribute values and RCDATA bodies is
    // text, never a tag
    val forged = Meta.extract(
      """<img alt='see <meta name=robots content=noindex> docs'>
        |<title>writing <meta name="description" content="forged"> tags</title>
        |<meta name="description" content="real">""".stripMargin)
    assert(!forged.noindex && forged.description == "real")
    // duplicate attributes resolve first-wins (HTML5 ignores the repeat)
    val dupAttr = Meta.extract("""<meta name="description" content="real" content="">""")
    assert(dupAttr.description == "real")
    // rel is a space-separated token list
    val relList = Meta.extract("""<link rel="canonical alternate" href="https://b.example/y">""")
    assert(relList.canonical == "https://b.example/y")
    // CDATA skipped like comments
    val cdata = Meta.extract("""<![CDATA[<meta name=robots content=noindex>]]><meta name=description content=ok>""")
    assert(!cdata.noindex && cdata.description == "ok")
    // unterminated comment / rawtext never throw
    Meta.extract("<!-- never closed <meta name=robots content=noindex>")
    Meta.extract("<script>never closed")
    // fuzz: mutated and truncated probe pages never throw
    val rnd = new java.util.Random(0x4d455441L) // "META"
    val base = Corpus.htmlMetaProbe(3L, "fuzz body words for the meta probe page here")
    (1 to 200).foreach { _ =>
      val m = base.clone()
      (0 until 1 + rnd.nextInt(6)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      Meta.extract(m)
    }
    (1 to 30).foreach(_ => Meta.extract(java.util.Arrays.copyOf(base, 1 + rnd.nextInt(base.length))))
  }
}
