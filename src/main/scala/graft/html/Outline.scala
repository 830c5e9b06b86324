package graft.html

/** Document-structure outline from HTML headings — the HTML twin of the
  * PDF /Outlines bookmark walk (`PdfTokeniser.readOutline`): every `h1`–`h6`
  * block in document order as a (level, title) pair. Section structure is
  * what heading-aware chunking of training corpora keys on (split documents
  * at section boundaries instead of mid-paragraph), and the heading text
  * itself is a retrieval/summarization target. ADDITIVE surface — the
  * reference has no HTML code.
  *
  * Semantics (deliberately the extraction library's, not a DOM library's):
  *  - rides [[Boilerplate.scan]] — the SAME single-pass scanner that feeds
  *    extraction, so comment/CDATA skipping, raw-text (`script`/`style`)
  *    body skipping, entity decoding and inline-tag transparency can never
  *    drift between the text and its outline;
  *  - headings inside chrome containers (`nav`/`aside`/`footer`) are
  *    navigation furniture, not document structure, and are skipped — the
  *    same structural prior the classifier applies to body text;
  *  - the `<title>` element is metadata, not an outline entry (it already
  *    surfaces as [[HtmlResult.title]]);
  *  - empty headings (no text) produce no entry — [[Boilerplate.scan]]
  *    only materializes non-empty blocks.
  *
  * A per-row projection: ZERO shuffles at any corpus size. */
object Outline {

  /** `(level 1-6, title)` for every body heading, in document order. */
  def headings(html: String): Seq[(Int, String)] =
    Boilerplate.scan(html).collect {
      case b if b.headingLevel >= 1 && !b.inChrome => (b.headingLevel, b.text)
    }

  def headings(bytes: Array[Byte]): Seq[(Int, String)] =
    headings(Boilerplate.decode(bytes))

  /** The PDF outline presentation (`ExtractResult.outline`): "level:title"
    * entries joined with `sep` — lets HTML and PDF documents share one
    * outline column in a mixed corpus. */
  def outlineString(html: String, sep: String = "|"): String =
    headings(html).iterator.map { case (l, t) => s"$l:$t" }.mkString(sep)
}
