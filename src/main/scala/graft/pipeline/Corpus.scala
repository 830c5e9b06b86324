package graft.pipeline

import graft.fixtures.GoldenGen
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable

/** Deterministic synthesis of the input_hint page table
  * `(url, warc_ts, html, text, lang)` from the driver's `documents` parquet:
  * even doc_ids become real PDF payloads, odd doc_ids become HTML payloads,
  * both constructed so that the pipeline's extraction is byte-identical to
  * the source `text` column. This is the sandbox stand-in for the 10^12-row
  * Common-Crawl Iceberg table — "synthesise it deterministically at small
  * scale", per the round brief; no external data.
  *
  * The byte-identity construction doubles as the correctness oracle: DuckDB
  * can assert `extracted(url).text == documents.text` without being able to
  * parse a PDF, because the corpus generator *knows* what the reference
  * semantics (show-ops append `decoded + delimiter`; reference:
  * PdfParser/PdfContent.cs:186) emit for the exact operator stream it wrote.
  */
object Corpus {

  val UrlPrefix = "https://example.org/doc/"

  /** PDF payload whose extraction (with contentDelimiter="") equals `text`
    * byte-for-byte: the text is sliced into 64-char chunks (8 chunks per
    * page), each shown with a rotating show operator (`Tj`, `'`, `TJ` with a
    * discarded kern number) — no line-move (Td/TD/Tstar) or Tm operators, so
    * no newlines are injected and the concatenation of all shown strings
    * reproduces the input exactly. The `"` operator is deliberately absent:
    * the reference's GetStreamString does not skip leading whitespace after
    * SkipStreamArgument, so `aw ac (s) "` throws in the reference too
    * (Tokeniser.cs:2367-2368 + 1987-1989) — replicated bug-for-bug in our
    * engine and therefore unusable in a byte-identity corpus. Content
    * streams are FlateDecode so the round-trip exercises S9. */
  def pdfFromText(text: String): Array[Byte] = {
    val chunks = text.grouped(64).toIndexedSeq
    val b = new GoldenGen.PdfBuilder()
    var gi = 0
    val contentIds = chunks.grouped(8).map { pageChunks =>
      val ops = new StringBuilder("BT ")
      pageChunks.foreach { c =>
        val e = escapeLiteral(c)
        gi % 3 match {
          case 0 => ops.append('(').append(e).append(") Tj ")
          case 1 => ops.append('(').append(e).append(") ' ")
          case _ => ops.append("[(").append(e).append(") -120] TJ ")
        }
        gi += 1
      }
      ops.append("ET")
      b.addStream("", ops.toString.getBytes(ISO_8859_1), deflate = true)
    }.toSeq
    val catalog = GoldenGen.catalogFor(b, contentIds)
    // deterministic /Info so document-metadata extraction (S7/S24) is
    // oracle-checkable: Title carries the text length
    val info = b.addObject(s"<</Title (doc-${text.length})/Producer (graft)>>")
    b.finish(s"/Root $catalog 0 R/Info $info 0 R")
  }

  /** Expected PDF page count for `text` under [[pdfFromText]] —
    * SQL-expressible: ((length(text)+63)//64 + 7)//8. */
  def pdfPageCount(text: String): Int = {
    val chunks = (text.length + 63) / 64
    (chunks + 7) / 8
  }

  /** Literal-string escaping (reference decodes these in content streams:
    * Tokeniser.cs:2360-2461, so the round-trip is exact). */
  private def escapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\${c.toInt}%03o")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** HTML payload whose boilerplate-stripped extraction equals `text`
    * byte-for-byte. Layout: linked nav (chrome, dropped), a plain-text
    * footer (chrome, dropped — but its >4 words make the following block
    * pass the NumWordsRules prev-words test regardless of its own length),
    * the single main <p> holding `text`, then linked aside/footer chrome.
    * The <title> block is reported separately by the extractor, never in
    * the text. */
  def htmlFromText(text: String, docId: Long): Array[Byte] = {
    val esc = escapeHtml(text)
    val html =
      s"""<!DOCTYPE html>
         |<html><head><title>doc $docId</title>
         |<style>p { margin: 1em; }</style>
         |<script>var x = 1 < 2; // <p>not content</p></script>
         |</head><body>
         |<nav><a href="/">home</a> <a href="/archive">archive</a> <a href="/feed">feed</a></nav>
         |<footer>site chrome words that prime the classifier neighborhood</footer>
         |<div id="main"><p>$esc</p></div>
         |<aside><a href="/x">related</a> <a href="/y">links</a></aside>
         |<footer><p><a href="/about">about</a> | <a href="/tos">terms</a> | copyright</p></footer>
         |</body></html>""".stripMargin
    html.getBytes(UTF_8)
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** HTML payload exercising the LAYOUT surface (lists + tables): the text's
    * words are distributed over a fixed deterministic structure —
    *   words 1-12   → a <p> paragraph,
    *   words 13-22  → first <li>, 23-32 → second <li>,
    *   words 33+    → table rows of two 10-word cells —
    * and the extractor renders list items with a "- " marker and row cells
    * joined by " | ", so the expected extraction is a pure word-slicing
    * expression DuckDB can compute (oracle `html_layout_roundtrip`).
    * Classification holds because every block's predecessor has > 4 words
    * (the chrome footer primes the first one — same trick as
    * [[htmlFromText]]). */
  def htmlLayoutFromText(text: String, docId: Long): Array[Byte] = {
    val ws = text.trim.split("\\s+")
    def slice(from: Int, until: Int): String = // 0-based, clamped
      ws.slice(from, math.min(until, ws.length)).iterator.map(escapeHtml).mkString(" ")
    val p = slice(0, 12)
    val items = Seq(slice(12, 22), slice(22, 32)).filter(_.nonEmpty)
    val rows = Iterator.from(0)
      .map(r => (slice(32 + 20 * r, 42 + 20 * r), slice(42 + 20 * r, 52 + 20 * r)))
      .takeWhile(_._1.nonEmpty)
      .map { case (a, b) => if (b.isEmpty) s"<tr><td>$a</td></tr>" else s"<tr><td>$a</td><td>$b</td></tr>" }
      .toSeq
    val ul = if (items.isEmpty) "" else items.map(i => s"<li>$i</li>").mkString("<ul>", "", "</ul>")
    val table = if (rows.isEmpty) "" else rows.mkString("<table>", "", "</table>")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><title>doc $docId</title></head><body>
         |<nav><a href="/">home</a> <a href="/archive">archive</a></nav>
         |<footer>site chrome words that prime the classifier neighborhood</footer>
         |<div id="main"><p>$p</p>$ul$table</div>
         |<footer><p><a href="/about">about</a> | <a href="/tos">terms</a> | copyright</p></footer>
         |</body></html>""".stripMargin
    html.getBytes(UTF_8)
  }

  /** Expected extraction of [[htmlLayoutFromText]] — the Scala twin of the
    * DuckDB oracle, used by the unit golden test. */
  def htmlLayoutExpected(text: String): String = {
    val ws = text.trim.split("\\s+")
    def slice(from: Int, until: Int): String =
      ws.slice(from, math.min(until, ws.length)).mkString(" ")
    val parts = Seq(slice(0, 12)) ++
      Seq(slice(12, 22), slice(22, 32)).filter(_.nonEmpty).map("- " + _) ++
      Iterator.from(0)
        .map(r => (slice(32 + 20 * r, 42 + 20 * r), slice(42 + 20 * r, 52 + 20 * r)))
        .takeWhile(_._1.nonEmpty)
        .map { case (a, b) => if (b.isEmpty) a else s"$a | $b" }
        .toSeq
    parts.filter(_.nonEmpty).mkString("\n")
  }

  def layoutPageRowFor(docId: Long, text: String, lang: String): PageRow =
    PageRow(
      url = UrlPrefix + docId,
      warc_ts = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(docId * 60)),
      html = htmlLayoutFromText(text, docId),
      text = text,
      lang = lang)

  def isPdfDoc(docId: Long): Boolean = docId % 2 == 0

  def pageRowFor(docId: Long, text: String, lang: String): PageRow = {
    val payload = if (isPdfDoc(docId)) pdfFromText(text) else htmlFromText(text, docId)
    PageRow(
      url = UrlPrefix + docId,
      warc_ts = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(docId * 60)),
      html = payload,
      text = text,
      lang = lang)
  }

  /** The synthesized page table for one scale factor. Payload generation is
    * itself distributed (runs inside the scan's map, not on the driver). */
  def pages(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) => pageRowFor(id, text, lang) }
  }

  // One synthesized+persisted corpus per (Spark app, sfDir): queries share it
  // instead of re-running PDF generation per query.
  private val cache = mutable.Map.empty[String, Dataset[PageRow]]

  def pagesCached(spark: SparkSession, sfDir: String): Dataset[PageRow] = synchronized {
    val key = spark.sparkContext.applicationId + "|" + sfDir
    cache.getOrElseUpdate(key, pages(spark, sfDir).persist())
  }
}
