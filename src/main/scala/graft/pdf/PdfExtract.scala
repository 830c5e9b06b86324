package graft.pdf

import scala.collection.mutable

/** One extracted character-span: [start,end) in `text`, the byte offset of
  * the producing content stream in the source document, and a kind tag
  * (span bookkeeping modeled on the reference's TextStore line→byte-offset
  * mapping; reference: TextStoreLib/TextStore.cs:81-144). `srcLine` is the
  * 1-based source line of `srcOffset` under the reference's line rules
  * (CR/LF/CRLF each one terminator — see [[TextStore]]); -1 unless line
  * capture was requested. */
final case class TextSpan(start: Int, end: Int, srcOffset: Int, kind: String, srcLine: Int = -1)

/** Document-level extraction result. `text` is the byte-identical surface:
  * pages in tree order → contents in array order → each content's assembled
  * text (reference: PdfParser/PdfContent.cs:186, browser concatenation).
  * `nChars` always carries the assembled length — under
  * `captureText = false` (metrics-only jobs) `text` stays empty and the
  * full-document String copy is skipped entirely. */
final case class ExtractResult(
    text: String,
    nChars: Int,
    fragments: Seq[String],
    spans: Seq[TextSpan],
    pages: Int,
    decodeFailures: Int,
    error: Option[String],
    pdfVersion: Option[String],
    documentInfo: Option[String],
    documentId: Option[String],
    metadata: Option[String],
    /** Bookmark tree as "depth:title" items joined by "|" (DFS order);
      * None when the document has no /Outlines. Additive surface — the
      * reference never reads /Outlines. */
    outline: Option[String] = None,
    /** Embedded-file attachments (/Names → /EmbeddedFiles name tree) in
      * tree order, payloads decoded through the normal filter chain.
      * Additive surface — the reference never reads /Names. */
    attachments: Seq[(String, Array[Byte])] = Nil,
    /** AcroForm "dotted.name=value" pairs joined by "|" (DFS over /Fields
      * and /Kids); None when the document has no /AcroForm. Additive
      * surface — the reference never reads /AcroForm. */
    formFields: Option[String] = None,
    /** Per-page annotations: (1-based page, subtype, text) — /Contents of
      * markup annotations and /A /URI of Links, in page/array order.
      * Additive surface — the reference never reads /Annots. */
    annotations: Seq[(Int, String, String)] = Nil)

/** E1 façade: the reference's `new PdfParser(bytes, …)` entry point as a pure
  * function (reference: PdfParser/PdfParser.cs:92-106). Per-document parse
  * errors are captured into the result, never thrown — one bad document must
  * not fail a 10^12-row job. */
object PdfExtract {

  def isPdf(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 8) return false
    if (startsWithHeader(bytes, 0)) return true
    // FPDF tolerance: header within the first 2000 bytes (reference: Tokeniser.cs:190-200)
    val limit = math.min(2000, bytes.length - 8)
    var i = 1
    while (i < limit) {
      if (startsWithHeader(bytes, i)) return true
      i += 1
    }
    false
  }

  private def startsWithHeader(b: Array[Byte], i: Int): Boolean =
    b(i) == '%' && b(i + 1) == 'P' && b(i + 2) == 'D' && b(i + 3) == 'F' && b(i + 4) == '-' &&
      b(i + 5) == '1' && b(i + 6) == '.'

  def extract(
      bytes: Array[Byte],
      password: String = "",
      contentDelimiter: String = "|",
      buffers: WorkBuffers = new WorkBuffers(),
      captureFragments: Boolean = true,
      extendedFilters: Boolean = false,
      /** Compute each span's 1-based source line ([[TextStore]] semantics);
        * costs one extra pass + char buffer over the document bytes, so the
        * bulk pipeline leaves it off. */
      captureLines: Boolean = false,
      /** `false` = metrics-only: skip the final full-document text copy
        * (`nChars` still reports the assembled length). */
      captureText: Boolean = true,
      /** Opt-in embedded-file decoding (an attachment can be megabytes, so
        * the /Names walk + payload copies only run when asked). */
      captureAttachments: Boolean = false): ExtractResult = {
    val tk = new PdfTokeniser(bytes, password, contentDelimiter, buffers, captureFragments,
      extendedFilters, captureAttachments)
    try {
      tk.verifyFileHeader()
      tk.findPages()

      // document text already accumulated in the tokeniser's reused builder
      // during page construction (pages in tree order → contents in array
      // order); contents carry their [start,end) offsets for the spans
      val fragments = mutable.ArrayBuffer.empty[String]
      val spans = mutable.ArrayBuffer.empty[TextSpan]
      val errors = new StringBuilder
      var decodeFailures = 0
      val lineStore: TextStore =
        if (captureLines) { val ts = new TextStore(bytes.length + 16); ts.append(bytes, 0); ts }
        else null

      tk.pageList.foreach { page =>
        if (page.exception != null) {
          decodeFailures += 1
          errors.append(page.exception).append('\n')
        }
        page.fonts.valuesIterator.foreach { f =>
          if (f.exception != null) decodeFailures += 1
        }
        page.contents.foreach { content =>
          fragments ++= content.textFragments
          if (content.textEnd > content.textStart)
            spans += TextSpan(content.textStart, content.textEnd, content.srcOffset, "content",
              if (lineStore != null && content.srcOffset >= 0)
                lineStore.lineOfByteOffset(content.srcOffset)
              else -1)
          if (content.exception != null) {
            decodeFailures += 1
            errors.append(content.exception).append('\n')
          }
          if (content.error != null) errors.append(content.error).append('\n')
        }
      }
      if (tk.isDecryptionError) {
        decodeFailures += 1
        errors.append("Document cannot be decrypted with provided password.").append('\n')
      }

      ExtractResult(
        text = if (captureText) tk.docText.toString else "",
        nChars = tk.docText.length,
        fragments = fragments.toSeq,
        spans = spans.toSeq,
        pages = tk.pageList.size,
        decodeFailures = decodeFailures,
        error = if (errors.isEmpty) None else Some(errors.toString),
        pdfVersion = Some(tk.versionString),
        documentInfo = Option(tk.documentInfo),
        documentId = Option(tk.documentId),
        metadata = Option(tk.metadata),
        outline = Option(tk.outline),
        attachments = tk.attachments.toSeq,
        formFields = Option(tk.formFields),
        annotations = tk.pageList.iterator.zipWithIndex.flatMap { case (p, i) =>
          p.annotations.iterator.map { case (sub, txt) => (i + 1, sub, txt) }
        }.toSeq)
    } catch {
      case e: Throwable =>
        val msg = e match {
          case pe: PdfException       => "PdfException: " + pe.shortMessage
          case pe: PdfStreamException => "PdfStreamException: " + pe.shortMessage
          case other                  => other.getClass.getSimpleName + ": " + Option(other.getMessage).getOrElse("")
        }
        ExtractResult(
          text = "",
          nChars = 0,
          fragments = Nil,
          spans = Nil,
          pages = 0,
          decodeFailures = 1,
          error = Some(msg),
          pdfVersion = None,
          documentInfo = None,
          documentId = None,
          metadata = None)
    }
  }
}
