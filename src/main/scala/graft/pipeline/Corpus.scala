package graft.pipeline

import graft.fixtures.GoldenGen
import graft.pdf.{ObjectId, PdfCrypto}
import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII, UTF_8}
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

  /** Bump on ANY change to payload generation: cached synthesized corpora
    * (graft.Bench's on-disk table) key on this, so a stale cache can never
    * be mistaken for the current generator's output. Belt-and-braces with
    * [[generatorFingerprint]], which catches a forgotten bump. */
  val GeneratorVersion = "r4c"

  private[graft] def hexOf(bs: Array[Byte]): String =
    bs.map(x => f"${x & 0xff}%02x").mkString

  /** SHA-256 digest of the input byte streams, hex. */
  private[graft] def digestOf(parts: Iterator[Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    hexOf(md.digest())
  }

  /** Fingerprint of the payload generator's COMPILED CODE: SHA-256 over the
    * classfiles of every class payload generation flows through. A byte-level
    * generator change therefore misses the corpus cache even when
    * [[GeneratorVersion]] was not bumped (a stale cached corpus silently
    * served under a fresh generator was the failure mode — round-3 VERDICT
    * finding 4). Lambdas/inner methods compile into the enclosing classfile
    * (Scala 2.13 uses invokedynamic), but NESTED CLASSES do not — e.g. the
    * actual PDF byte writer is `GoldenGen$PdfBuilder.class`, a separate
    * file — so the digest enumerates every classfile whose binary name
    * belongs to one of the listed types (`X.class`, `X$.class`, `X$Nested*`)
    * from each type's code source (classes directory or jar). */
  lazy val generatorFingerprint: String =
    digestOf(generatorClassfiles.iterator.flatMap { case (name, bytes) =>
      Iterator(name.getBytes(java.nio.charset.StandardCharsets.UTF_8), bytes)
    }).take(16)

  /** (binary name, classfile bytes) of every generator classfile, sorted by
    * name — the digest input of [[generatorFingerprint]]; exposed for the
    * coverage unit test (nested classes MUST appear here). */
  private[graft] lazy val generatorClassfiles: Seq[(String, Array[Byte])] = {
    import scala.jdk.CollectionConverters._
    val classes: Seq[Class[_]] = Seq(
      Corpus.getClass, GoldenGen.getClass, PdfCrypto.getClass,
      graft.pdf.ExtraFilters.getClass)
    // "graft.fixtures.GoldenGen" matches GoldenGen.class, GoldenGen$.class,
    // GoldenGen$PdfBuilder.class, ... but NOT GoldenGenOther.class
    val prefixes = classes.map(_.getName.stripSuffix("$")).distinct
    def matches(binaryName: String): Boolean = prefixes.exists(p =>
      binaryName == p || binaryName.startsWith(p + "$"))
    val sources = classes.map(_.getProtectionDomain.getCodeSource.getLocation.toURI).distinct
    val found = sources.flatMap { uri =>
      val f = new java.io.File(uri)
      if (f.isDirectory) {
        val base = f.toPath
        val walk = java.nio.file.Files.walk(base)
        try walk.iterator().asScala
          .filter(_.toString.endsWith(".class"))
          .map { p =>
            val rel = base.relativize(p).toString
              .replace(java.io.File.separatorChar, '/')
            (rel.stripSuffix(".class").replace('/', '.'), p)
          }
          .filter(t => matches(t._1))
          .map(t => (t._1, java.nio.file.Files.readAllBytes(t._2)))
          .toList
        finally walk.close()
      } else {
        val jar = new java.util.jar.JarFile(f)
        try jar.entries().asScala
          .filter(_.getName.endsWith(".class"))
          .map(e => (e.getName.stripSuffix(".class").replace('/', '.'), e))
          .filter(t => matches(t._1))
          .map(t => (t._1, jar.getInputStream(t._2).readAllBytes()))
          .toList
        finally jar.close()
      }
    }
    // every listed type must contribute at least its own classfile — an
    // empty match means the enumeration broke, which would silently turn
    // the fingerprint into a constant
    prefixes.foreach { p =>
      require(found.exists(_._1.startsWith(p)), s"no classfiles found for $p")
    }
    found.sortBy(_._1)
  }

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
    val b = new GoldenGen.PdfBuilder()
    finishClassic(b, rotatingShowContents(b, text), text)
  }

  /** The ONE chunk/page walk every variant shares — 64-char chunks, 8 per
    * page — with a per-chunk operator emitter
    * `emit(ops, escapedChunk, globalIdx, pageLocalIdx)`. A change to the
    * chunking contract happens here once; the oracle formulas
    * ([[pdfExpectedText]], SparkEntry) depend on exactly this shape. */
  private def pageOpsFor(text: String, btPrefix: String = "BT ")(
      emit: (StringBuilder, String, Int, Int) => Unit): Seq[String] = {
    var gi = 0
    text.grouped(64).toIndexedSeq.grouped(8).map { pageChunks =>
      val ops = new StringBuilder(btPrefix)
      pageChunks.zipWithIndex.foreach { case (c, j) =>
        emit(ops, escapeLiteral(c), gi, j)
        gi += 1
      }
      ops.append("ET")
      ops.toString
    }.toSeq
  }

  /** Fixed-BYTE-LAYOUT span probe (round 5): variant-0 chunking (64-char
    * chunks, 8 per page) shown with plain `Tj` ops, but every content
    * stream is UNCOMPRESSED and space-padded to exactly
    * [[SpanProbePayloadBytes]] bytes, and the text is capped to 9 pages so
    * object ids stay single-digit. Every byte before content stream `i` is
    * then a constant of the builder: header 15 bytes ("%PDF-1.4\n" +
    * 5-byte binary comment + "\n"), per-object preamble
    * "`i+1` 0 obj\n<</Length 2176>>stream\n" = 31 bytes, object trailer
    * "\nendstream\nendobj\n" = 18 bytes — so the i-th content payload (the
    * span's `src_offset`, [[graft.pdf.PdfExtract]] TextSpan.srcOffset =
    * Tokeniser streamStartIndex) sits at the affine address
    * [[spanProbeSrcOffset]](i) = 46 + 2225·i, which a SQL oracle can
    * compute from `length(text)` alone. Worst-case ops length: escapeLiteral
    * emits a 4-byte OCTAL escape (\ddd) for control/high chars, so a fully
    * escaped 64-char chunk is "(" + 256 + ") Tj " = 262 bytes and a page is
    * 3 + 8·262 + 2 = 2101 ≤ 2176 — the pad never underflows even for a
    * worst-case Latin-1 page (the require guards the invariant). */
  val SpanProbePayloadBytes = 2176
  val SpanProbeMaxChars: Int = 9 * 512

  def spanProbeSrcOffset(spanIdx: Int): Int =
    46 + (31 + SpanProbePayloadBytes + 18) * spanIdx

  def pdfSpanProbe(text0: String): Array[Byte] = {
    val text = text0.take(SpanProbeMaxChars)
    val b = new GoldenGen.PdfBuilder()
    val contents = pageOpsFor(text) { (ops, e, _, _) =>
      ops.append('(').append(e).append(") Tj ")
    }.map { ops =>
      require(ops.length <= SpanProbePayloadBytes,
        s"span-probe ops overflow: ${ops.length}")
      val padded = ops + (" " * (SpanProbePayloadBytes - ops.length))
      b.addStream("", padded.getBytes(ISO_8859_1), deflate = false)
    }
    finishClassic(b, contents, text)
  }

  def spanProbePageRowFor(docId: Long, text: String, lang: String): PageRow =
    PageRow(
      url = UrlPrefix + docId,
      warc_ts = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(docId * 60)),
      html = pdfSpanProbe(text),
      text = text.take(SpanProbeMaxChars),
      lang = lang)

  /** Show op cycling Tj / TJ-with-discarded-kern on the global index. */
  private def appendShowTjTJ(ops: StringBuilder, escaped: String, gi: Int): Unit =
    if (gi % 2 == 0) ops.append('(').append(escaped).append(") Tj ")
    else ops.append("[(").append(escaped).append(") -120] TJ ")

  /** The variant-0 per-page operator streams (rotating Tj/'/TJ show ops, no
    * line moves), shared by the encrypted / xref-stream / incremental /
    * malformed file layouts whose operator surface is identical. */
  private def rotatingOpsPerPage(text: String): Seq[String] =
    pageOpsFor(text) { (ops, e, gi, _) =>
      gi % 3 match {
        case 0 => ops.append('(').append(e).append(") Tj ")
        case 1 => ops.append('(').append(e).append(") ' ")
        case _ => ops.append("[(").append(e).append(") -120] TJ ")
      }
    }

  private def rotatingShowContents(b: GoldenGen.PdfBuilder, text: String,
      encryptKey: Array[Byte] = null, deflate: Boolean = true): Seq[Int] =
    rotatingOpsPerPage(text).map(ops =>
      b.addStream("", ops.getBytes(ISO_8859_1), deflate = deflate, encryptKey = encryptKey))

  /** Classic-xref tail shared by the variants: /Metadata XML stream, a
    * caller-chosen page-tree/catalog strategy, deterministic /Info (Title
    * carries the text length), trailer /ID — so every document-level
    * output (S2/S7/S24 and the XMP metadata + DocumentID surfaces) is
    * oracle-checkable per doc. */
  private def finishClassicWith(b: GoldenGen.PdfBuilder, text: String,
      trailingNuls: Int = 0)(catalogOf: Option[Int] => Int): Array[Byte] = {
    val metaId = addMetadata(b, text)
    val catalog = catalogOf(Some(metaId))
    val info = b.addObject(infoContent(text))
    b.finish(s"/Root $catalog 0 R/Info $info 0 R/ID[<${docIdHex(text)}><${docIdHex(text)}>]",
      trailingNuls)
  }

  private def finishClassic(b: GoldenGen.PdfBuilder, contentIds: Seq[Int],
      text: String, fontObj: Option[(String, Int)] = None): Array[Byte] =
    finishClassicWith(b, text)(mid => GoldenGen.catalogFor(b, contentIds, fontObj, mid))

  private def infoContent(text: String): String =
    s"<</Title (doc-${text.length})/Producer (graft)>>"

  /** The XMP-style metadata payload — deterministic and SQL-computable. */
  def metadataXml(text: String): String = s"""<graft:meta len="${text.length}"/>"""

  private def addMetadata(b: GoldenGen.PdfBuilder, text: String,
      encryptKey: Array[Byte] = null): Int =
    b.addStream("/Type/Metadata/Subtype/XML",
      metadataXml(text).getBytes(ISO_8859_1), encryptKey = encryptKey)

  /** Deterministic trailer /ID hex (32 digits) from the text length. */
  def docIdHex(text: String): String = f"${text.length}%032x"

  // ------------------------------------------------------------------
  // PDF file-layout / operator variants. Even doc_ids are PDFs; each PDF
  // doc is routed by (doc_id/2) % 9 to one of nine deterministic builders
  // so the driver's DuckDB gate — not just unit fixtures — exercises the
  // hard fidelity surface: Td/TD/T* and Tm newline semantics
  // (reference: PdfContent.cs:144-163), /Differences + ToUnicode font
  // decode incl. ligature CMap packing (PdfFont.cs:62-99,
  // Tokeniser.cs:2616-2644), RC4 string+stream decryption
  // (Tokeniser.cs:627-690), xref streams + object streams + PNG-Up
  // predictor (Tokeniser.cs:285-400), incremental-update /Prev chains
  // (Tokeniser.cs:404-491), the malformed-file tolerances
  // (junk prefix / wrong /Length / CR-only EOL / trailing NULs), and the
  // linearized-file xref fallback (EOF mark missing → forward scan from
  // the /Linearized first object, Tokeniser.cs:262-326).
  // Every variant's expected extraction is a pure SQL expression over
  // `documents.text` — see [[pdfExpectedText]] and the oracle in
  // SparkEntry.
  // ------------------------------------------------------------------

  val NumPdfVariants = 9

  def pdfVariant(docId: Long): Int = ((docId / 2) % NumPdfVariants).toInt

  def pdfForDoc(docId: Long, text: String): Array[Byte] = pdfVariant(docId) match {
    case 0 => pdfFromText(text)
    case 1 => pdfMovesFromText(text)
    case 2 => pdfEncodedFontFromText(text)
    case 3 => pdfEncryptedFromText(text)
    case 4 => pdfXrefStreamFromText(text)
    case 5 => pdfTmFromText(text)
    case 6 => pdfIncrementalFromText(text)
    case 7 => pdfMalformedFromText(text)
    case _ => pdfLinearizedFromText(text)
  }

  /** Scala twin of the DuckDB oracle: the reference-semantics extraction of
    * [[pdfForDoc]]`(docId, text)` under `contentDelimiter = delimiter`.
    *  - variant 1 (Td/TD/T*): a line move precedes every chunk but the
    *    global first — including page starts, because Td appends "\n"
    *    unconditionally (PdfContent.cs:144-146) — so chunks join with "\n";
    *  - variant 5 (Tm): a ty-changing Tm precedes every chunk, but the Tm
    *    newline fires only when the content already has text and both
    *    `lastLineOffset` and `hasText` are per-content state
    *    (PdfContent.cs:150-163), so chunks join with "\n" within a page and
    *    pages concatenate bare;
    *  - all other variants change the FILE layout, not the operator stream:
    *    concatenation of the shown chunks. */
  def pdfExpectedText(docId: Long, text: String, delimiter: String = ""): String = {
    val shown = text.grouped(64).map(_ + delimiter).toIndexedSeq
    pdfVariant(docId) match {
      case 1 => shown.mkString("\n")
      // variant 2 writes the LigatureMarkers as CIDs whose ToUnicode bfchar
      // destinations are <00660066> / <006600660069> — the reference PACKS
      // multi-code targets back to the single ligature codepoint
      // (ﬀ via the 8-digit branch, ﬃ via the separate 12-digit lookahead;
      // Tokeniser.cs:2616-2644)
      case 2 => shown.mkString.replace(LigatureMarker, 'ﬀ').replace(LigatureMarker3, 'ﬃ').replace(LigatureMarker4, 'ﬄ')
      case 5 => shown.grouped(8).map(_.mkString("\n")).mkString
      case _ => shown.mkString
    }
  }

  /** Variant 1: line-move newlines. A rotating `Td`/`TD`/`T*` precedes every
    * chunk except the global first (page starts included — the reference
    * appends a newline per line move unconditionally). The page tree is
    * NESTED (leaf pages under intermediate /Pages nodes), so the gate also
    * covers the multi-level tree walk in depth-first Kids order. */
  def pdfMovesFromText(text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val contentIds = pageOpsFor(text) { (ops, e, gi, _) =>
      if (gi > 0) ops.append(gi % 3 match {
        case 0 => "T* "
        case 1 => "0 -14 Td "
        case _ => "0 -14 TD "
      })
      ops.append('(').append(e).append(") Tj ")
    }.map(ops => b.addStream("", ops.getBytes(ISO_8859_1), deflate = true))
    finishClassicWith(b, text)(mid =>
      GoldenGen.catalogForNestedPages(b, contentIds, metadataId = mid))
  }

  /** Variant 5: `Tm` newlines. Every chunk is preceded by a text matrix with
    * a per-chunk ty, so within a page each Tm after the first changes the
    * line offset and appends "\n"; the first Tm of each page never does
    * (per-content `hasText` is still false). Shows alternate Tj / TJ. */
  def pdfTmFromText(text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val contentIds = pageOpsFor(text) { (ops, e, gi, j) =>
      ops.append("1 0 0 1 50 ").append(760 - 14 * j).append(" Tm ")
      appendShowTjTJ(ops, e, gi)
    }.map(ops => b.addStream("", ops.getBytes(ISO_8859_1), deflate = true))
    finishClassic(b, contentIds, text)
  }

  /** The source character variant 2 writes as CID 0x01, whose ToUnicode
    * bfchar destination <00660066> ("ff" in UTF-16 codes) the reference
    * PACKS to the single ligature ﬀ (U+FB00) — so the expected extraction
    * replaces every LigatureMarker with ﬀ (1 char → 1 char; all length
    * oracles unchanged). 'e' because it is the most frequent English letter:
    * essentially every gate document exercises the packing. */
  final val LigatureMarker = 'e'

  /** The source character variant 2 writes as CID 0x02, whose ToUnicode
    * bfchar destination is the THREE-code <006600660069> ("ffi") — the
    * reference's packer has a separate lookahead branch for the 12-digit
    * targets (ﬃ/ﬄ, Tokeniser.cs:2625-2641) that the 8-digit ﬀ branch never
    * reaches, so [[LigatureMarker]] alone leaves it gate-invisible. Packs to
    * ﬃ (U+FB03); 1 char → 1 char, all length oracles unchanged. 't' because
    * it is the second most frequent English letter. */
  final val LigatureMarker3 = 't'

  /** CID 0x03, bfchar destination <00660066006C> — the OTHER 12-digit arm:
    * the ﬄ tail, whose final hex digit must be the UPPERCASE 'C' (the
    * reference's lookahead checks only 'C'; the lowercase form fails the
    * font — quirk replicated and unit-pinned in PdfExtractSpec). Packs to
    * ﬄ (U+FB04). 'a' — third most frequent letter in the corpus text. */
  final val LigatureMarker4 = 'a'

  /** Variant 2: encoded-font decode. The written bytes are ROT13-scrambled
    * for ASCII letters — except [[LigatureMarker]], written as CID 0x01; a
    * Type1 font recovers the text through the /Differences overlay
    * (uppercase codes → rot13 glyph names) and a ToUnicode CMap (lowercase
    * bfranges + bfchar fixes for the Standard table's 0x27→quoteright and
    * 0x60→quoteleft quirks + the <01>→<00660066> ligature bfchar, which the
    * reference packs to ﬀ — Tokeniser.cs:2616-2644). A decode bug in any of
    * S16-S18 breaks byte identity. */
  def pdfEncodedFontFromText(text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |11 dict begin
        |begincmap
        |/CIDSystemInfo << /Registry(graft) /Ordering(UCS) /Supplement 0 >> def
        |/CMapName /graft-rot13 def
        |/CMapType 2 def
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |5 beginbfchar
        |<01> <00660066>
        |<02> <006600660069>
        |<03> <00660066006C>
        |<27> <0027>
        |<60> <0060>
        |endbfchar
        |2 beginbfrange
        |<61> <6D> <006E>
        |<6E> <7A> <0061>
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end
        |end""".stripMargin
    val cmapId = b.addStream("", cmap.getBytes(ISO_8859_1), deflate = true)
    // code 65+i carries rot13('A'+i): /Differences maps it back
    val diffs = (0 until 26).map(i => "/" + ('A' + (i + 13) % 26).toChar).mkString(" ")
    val fontId = b.addObject(
      s"<</Type/Font/Subtype/Type1/BaseFont/GraftRot/Encoding<</Type/Encoding/Differences[65 $diffs]>>/ToUnicode $cmapId 0 R>>")
    // pages with more than 4 chunks split into TWO content streams and use
    // the /Contents ARRAY form — the gate then exercises the reference's
    // array-order content iteration (PdfPage.cs:60-72). Text is unaffected
    // (no newline ops; concatenation across a page's contents in array
    // order); extract_pipeline_mixed's n_spans accounts for the split.
    var gi = 0
    def contentOf(chunks: Seq[String]): Int = {
      val ops = new StringBuilder("BT /F1 10 Tf ")
      chunks.foreach { c =>
        appendShowTjTJ(ops, escapeLiteral(c), gi)
        gi += 1
      }
      ops.append("ET")
      b.addStream("", ops.toString.getBytes(ISO_8859_1), deflate = true)
    }
    val pageContents = encodeV2(text).grouped(64).toIndexedSeq.grouped(8).map { pageChunks =>
      if (pageChunks.length > 4) Seq(contentOf(pageChunks.take(4)), contentOf(pageChunks.drop(4)))
      else Seq(contentOf(pageChunks))
    }.toSeq
    finishClassicWith(b, text)(mid =>
      GoldenGen.catalogForPages(b, pageContents, fontObj = Some(("F1", fontId)),
        metadataId = mid))
  }

  /** Variant 2's written form: ROT13 for letters, CIDs 0x01 / 0x02 for the
    * ligature markers (1:1 in chars, so chunk boundaries stay aligned to the
    * source). */
  private def encodeV2(s: String): String = s.map {
    case LigatureMarker => '\u0001'
    case LigatureMarker3 => '\u0002'
    case LigatureMarker4 => '\u0003'
    case c if c >= 'a' && c <= 'z' => ('a' + (c - 'a' + 13) % 26).toChar
    case c if c >= 'A' && c <= 'Z' => ('A' + (c - 'A' + 13) % 26).toChar
    case c => c
  }

  // Deterministic RC4 (40-bit V1 R2, empty passwords) document key shared by
  // every variant-3 doc: /O via Algorithm 3, file key via Algorithm 2, /U via
  // Algorithm 5 with the reference's 19-round XOR iteration.
  private val EncDocIdHex = "0123456789abcdef0123456789abcdef"
  private val EncPermission = -44
  private lazy val encOKey: (Array[Byte], Array[Byte], Array[Byte]) = {
    val docId = EncDocIdHex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val ownerHash = PdfCrypto.md5(PdfCrypto.pad(""))
    val o = PdfCrypto.rc4(java.util.Arrays.copyOf(ownerHash, 5), PdfCrypto.pad(""))
    val key = PdfCrypto.computeEncryptionKey(PdfCrypto.pad(""), o, EncPermission, docId, 5)
    val u = PdfCrypto.computeEncryptU(PdfCrypto.pad(""), docId, key)
    (o, key, u)
  }

  /** Variant 3: RC4-encrypted (40-bit, V1 R2, empty user password). Content
    * streams AND the /Info literal strings are encrypted with their object
    * keys, so the gate covers S14's stream decryption and the
    * decrypt-strings-parsed-before-the-key-existed path
    * (reference: Tokeniser.cs:562-575). */
  def pdfEncryptedFromText(text: String): Array[Byte] = {
    val (o, key, u) = encOKey
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text, encryptKey = key)
    val metaId = addMetadata(b, text, encryptKey = key)
    val catalog = GoldenGen.catalogFor(b, contentIds, metadataId = Some(metaId))
    // The reference's object-level literal-string parser keeps backslash
    // escapes RAW and decrypts that raw form (Token.cs:206-276 +
    // Tokeniser.cs:1859), so encrypted strings must be written UNESCAPED —
    // which only round-trips when the ciphertext contains none of
    // '(' ')' '\\'. The object key depends on the object number, so when a
    // ciphertext draws a forbidden byte we insert a pad object to shift the
    // Info id and redraw the keystream (deterministic in `text`).
    def cipher(id: Int, s: String): Array[Byte] = {
      val data = s.getBytes(ISO_8859_1)
      PdfCrypto.rc4InPlace(PdfCrypto.objectKey(key, ObjectId(id, 0)), data, 0, data.length)
      data
    }
    def unsafeBytes(bs: Array[Byte]): Boolean =
      bs.exists(x => x == 0x28 || x == 0x29 || x == 0x5c)
    val title = s"doc-${text.length}"
    var infoId = b.nextObjectNumber
    var tries = 0
    while (unsafeBytes(cipher(infoId, title)) || unsafeBytes(cipher(infoId, "graft"))) {
      b.addObject("<</Type/GraftPad>>") // shifts the next object number
      infoId = b.nextObjectNumber
      tries += 1
      require(tries < 64, "could not find an escape-free Info keystream")
    }
    def rawStr(bs: Array[Byte]): String = new String(bs.map(x => (x & 0xff).toChar))
    val realInfo = b.addObject(
      s"<</Title (${rawStr(cipher(infoId, title))})/Producer (${rawStr(cipher(infoId, "graft"))})>>")
    require(realInfo == infoId, s"info id mismatch: $realInfo vs $infoId")
    val encId = b.addObject(
      s"<</Filter/Standard/V 1/R 2/P $EncPermission/O <${hexOf(o)}>/U <${hexOf(u)}>>>")
    b.finish(s"/Root $catalog 0 R/Info $infoId 0 R/Encrypt $encId 0 R" +
      s"/ID[<$EncDocIdHex><$EncDocIdHex>]")
  }

  /** Variant 4: PDF 1.5 cross-reference STREAM layout — content streams as
    * type-1 objects, the whole page graph + /Info packed into one
    * FlateDecode object stream (type-2 entries), xref stream with the
    * PNG-Up predictor — S5 + S10 + S11 in the driver gate. */
  def pdfXrefStreamFromText(text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder("1.5")
    val contentIds = rotatingShowContents(b, text)
    val metaId = addMetadata(b, text) // a stream: type-1 object, not in the ObjStm
    GoldenGen.finishXrefStream(b, contentIds, infoContent(text),
      metadataId = Some(metaId), trailerId = Some(docIdHex(text)))
  }

  /** Variant 6: TWO incremental updates (a three-section /Prev chain). The
    * ORIGINAL section's object 1 (the first page's content stream) holds
    * stale text; update section A rewrites it with SECOND-revision stale
    * text; update section B rewrites it with the real first-page ops. The
    * xref tables chain B → A → original via /Prev — note A's /Prev points
    * at another UPDATE section's table, not the original's, so a walk that
    * special-cases only one hop breaks. Newest-section-first precedence
    * must hold across all three (first-seen-wins from B): stopping after
    * one /Prev hop loses the catalog (only the original section has it),
    * oldest-first precedence extracts "stale first page", and applying A
    * over B extracts "stale second revision" — each caught byte-for-byte
    * by the roundtrip gate. (The Root/Info/Size trailer values are
    * identical in all sections — the reference THROWS on conflicting
    * trailer entries across the chain, so an /Info swap is not
    * representable; /Prev itself is per-section bookkeeping, excluded from
    * the conflict check. Replicated behavior, Tokeniser.cs:404-491,519.) */
  def pdfIncrementalFromText(text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val pageOps = {
      val ops = rotatingOpsPerPage(text)
      if (ops.isEmpty) Seq("BT ET") else ops
    }
    // object 1: stale first-page content, superseded by the update section
    val stale = b.addStream("",
      "BT (stale first page content) Tj ET".getBytes(ISO_8859_1), deflate = true)
    require(stale == 1, s"stale content must be object 1, got $stale")
    val restIds = pageOps.drop(1).map(ops =>
      b.addStream("", ops.getBytes(ISO_8859_1), deflate = true))
    val metaId = addMetadata(b, text)
    val catalog = GoldenGen.catalogFor(b, stale +: restIds, metadataId = Some(metaId))
    val info = b.addObject(infoContent(text))
    val xref1 = b.size
    b.finish(s"/Root $catalog 0 R/Info $info 0 R/ID[<${docIdHex(text)}><${docIdHex(text)}>]")
    // update sections: A replaces object 1 with second-revision stale ops,
    // B replaces it again with the REAL first-page ops; each section's xref
    // lists only its rewritten object and /Prev-chains to the section below
    def updateSection(ops: String, prevXref: Int): Int = {
      val newOff = b.size
      val body = GoldenGen.zlib(ops.getBytes(ISO_8859_1))
      b.raw(s"1 0 obj\n<</Length ${body.length}/Filter/FlateDecode>>stream\n")
      b.raw(body)
      b.raw("\nendstream\nendobj\n")
      val xref = b.size
      b.raw("xref\n")
      b.raw("0 1\n0000000000 65535 f \n")
      b.raw("1 1\n")
      b.raw(f"$newOff%010d 00000 n \n")
      b.raw(s"trailer<</Size ${info + 1}/Prev $prevXref/Root $catalog 0 R/Info $info 0 R>>\n")
      b.raw(s"startxref\n$xref\n%%EOF\n")
      xref
    }
    val xref2 = updateSection("BT (stale second revision) Tj ET", xref1)
    updateSection(pageOps.head, xref2)
    b.currentBytes
  }

  /** Variant 7: malformed-but-tolerated layout — junk before the %PDF header
    * (≤2000 B), wrong /Length forcing the endstream rescan, CR-only EOL
    * after `stream`, trailing NULs after %%EOF
    * (reference tolerances: Tokeniser.cs:190-200,239,1627-1641,1678-1696).
    * Streams are uncompressed so the wrong-/Length rescan is exact. */
  def pdfMalformedFromText(text: String): Array[Byte] = {
    val junk = "q 119.06 0 0 48.93 51.02 41.78 cm /I1 Do Q\nBT 231.57 45.49 Td (stray preamble) Tj ET\n"
    val b = new GoldenGen.PdfBuilder(prefix = junk)
    val contentIds = rotatingOpsPerPage(text).zipWithIndex.map { case (ops, i) =>
      // first content: broken /Length + CR-only EOL (rescan path); rest
      // clean. The override must be 2, NOT a value that can land the cut
      // inside text bytes: the wrong-length check runs skipWhiteSpace()
      // before looking for `endstream`, and PDF whitespace skipping eats
      // %-comments (reference: Tokeniser.cs:1538-1560 — replicated), so a
      // '%' in the text right after the cut would comment-skip the rest of
      // the line, "validate" the wrong length and truncate the content (in
      // BOTH engines — faithful, but unusable in a byte-identity corpus).
      // Offset 2 always lands on the ' ' of the fixed "BT (" prefix, where
      // the next byte is '(' and the rescan is guaranteed to engage.
      b.addStream("", ops.getBytes(ISO_8859_1),
        lengthOverride = if (i == 0) 2 else -1, crOnlyEol = i == 0)
    }
    finishClassicWith(b, text, trailingNuls = 7)(mid =>
      GoldenGen.catalogFor(b, contentIds, metadataId = mid))
  }

  /** Variant 8: LINEARIZED layout found by the xref FALLBACK. The file's
    * first object is a /Linearized dictionary and the classic xref table for
    * ALL objects sits right after it (the real linearized shape: first-page
    * xref at the front); the file ends after the last object with NO
    * startxref/%%EOF tail, so the EOF backscan fails and the reader must
    * take the forward-scan fallback from the linearization dictionary
    * (reference: Tokeniser.cs:262-326). Operator stream = variant 0's, so
    * expected extraction is plain concatenation.
    *
    * Built in three passes because the front table carries offsets of
    * objects written after it: pass A (no table) learns the object count and
    * the catalog/info ids; pass B (zero offsets) learns the real offsets —
    * the table's byte size depends only on the object count, rows being
    * fixed-width 20-byte entries; pass C writes the real offsets. */
  def pdfLinearizedFromText(text: String): Array[Byte] = {
    def build(spec: Option[(Int, Int, Int, Int => Int)]): (GoldenGen.PdfBuilder, Int, Int) = {
      val b = new GoldenGen.PdfBuilder()
      val lin = b.addObject("<</Linearized 1/L 0/O 2/T 0>>")
      require(lin == 1, s"linearization dict must be object 1, got $lin")
      spec.foreach { case (n, catalogId, infoId, off) =>
        b.raw("xref\n")
        b.raw(s"0 ${n + 1}\n")
        b.raw("0000000000 65535 f \n")
        (1 to n).foreach(i => b.raw(f"${off(i)}%010d 00000 n \n"))
        b.raw(s"trailer<</Size ${n + 1}/Root $catalogId 0 R/Info $infoId 0 R" +
          s"/ID[<${docIdHex(text)}><${docIdHex(text)}>]>>\n")
      }
      val contentIds = rotatingShowContents(b, text)
      val metaId = addMetadata(b, text)
      val catalog = GoldenGen.catalogFor(b, contentIds, metadataId = Some(metaId))
      val info = b.addObject(infoContent(text))
      (b, catalog, info)
    }
    val (bA, catA, infoA) = build(None)
    val n = bA.nextObjectNumber - 1
    val (bB, catB, infoB) = build(Some((n, catA, infoA, _ => 0)))
    require(bB.nextObjectNumber - 1 == n && catB == catA && infoB == infoA,
      "pass B diverged from pass A")
    val (bC, catC, _) = build(Some((n, catB, infoB, bB.objectOffset)))
    require(catC == catB, "pass C diverged from pass B")
    (1 to n).foreach(i => require(bC.objectOffset(i) == bB.objectOffset(i),
      s"offset of object $i unstable between passes"))
    bC.currentBytes // no startxref / %%EOF: forces the linearized fallback
  }


  // Deterministic AESV2 (V4/R4) document keys, empty passwords — extended
  // mode only (the reference throws on V 4: Tokeniser.cs:635-645).
  // Two cached chains: /EncryptMetadata false appends 0xFFFFFFFF to the
  // Algorithm-2 hash input (ISO 32000-1 step f), so its file key differs.
  private val AesDocIdHex = "fedcba9876543210fedcba9876543210"
  private def aesChain(encryptMetadata: Boolean): (Array[Byte], Array[Byte], Array[Byte]) = {
    val docId = AesDocIdHex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val o = PdfCrypto.computeOwnerO("", "", 16)
    val key = PdfCrypto.computeEncryptionKey(PdfCrypto.pad(""), o, EncPermission, docId, 16,
      encryptMetadata)
    val u = PdfCrypto.computeEncryptU(PdfCrypto.pad(""), docId, key)
    (o, key, u)
  }
  private lazy val aesOKeyU = aesChain(encryptMetadata = true)
  private lazy val aesOKeyUNoMeta = aesChain(encryptMetadata = false)

  /** AES corpus (gate for the beyond-reference AESV2 capability): variant
    * 0's chunk/page contract with every content stream AES-128-CBC-encrypted
    * under the V4/R4 AESV2 crypt filter (deterministic per-object IVs). No
    * /Info and no /Metadata: /StrF//StmF make every string/stream encrypted,
    * and the gate wants the cipher path, not hex-string escaping games.
    *
    * `(docId/2) % 3` routes each doc through one of the three real-world
    * AESV2 encryption-dictionary DIALECTS (all seen in the wild; GoldenGen's
    * fixtures parameterize the same three):
    *  - 0: top-level `/Length 128` (bits) + `/CF/StdCF/Length 16` (spec says
    *       BYTES there);
    *  - 1: `/EncryptMetadata false` — the file key itself changes
    *       (Algorithm 2 step f appends FFFFFFFF); no top-level /Length, so
    *       the reader takes the CF-Length path with the bytes convention;
    *  - 2: `/CF/StdCF/Length 128` — the BITS convention some writers use
    *       (the pdfbox ≤40⇒bytes heuristic must classify it as bits).
    * Expected extraction under `extendedFilters = true` is plain `text` for
    * every dialect; default mode replicates the reference's throw surface
    * (error row). */
  def pdfAesForDoc(docId: Long, text: String): Array[Byte] = {
    val dialect = ((docId / 2) % 3).toInt
    val (o, key, u) = if (dialect == 1) aesOKeyUNoMeta else aesOKeyU
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingOpsPerPage(text).map { ops =>
      val id = b.registerObject()
      val iv = Array.tabulate[Byte](16)(i =>
        ((docId * 131 + id * 31 + i * 7 + text.length) & 0xff).toByte)
      val payload = PdfCrypto.aesEncrypt(
        PdfCrypto.objectKeyAes(key, ObjectId(id, 0)), iv, ops.getBytes(ISO_8859_1))
      b.raw(s"$id 0 obj\n<</Length ${payload.length}>>stream\n")
      b.raw(payload)
      b.raw("\nendstream\nendobj\n")
      id
    }
    val catalog = GoldenGen.catalogFor(b, contentIds)
    val encId = b.addObject(
      s"<</Filter/Standard/V 4/R 4/P $EncPermission" +
        (if (dialect == 0) "/Length 128" else "") +
        s"/CF<</StdCF<</CFM/AESV2/AuthEvent/DocOpen/Length ${if (dialect == 2) 128 else 16}>>>>" +
        "/StmF/StdCF/StrF/StdCF" +
        (if (dialect == 1) "/EncryptMetadata false" else "") +
        s"/O <${hexOf(o)}>/U <${hexOf(u)}>>>")
    b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$AesDocIdHex><$AesDocIdHex>]")
  }

  /** Owner-password-only document: /U derives from a NON-empty user password
    * ("graftuser"), so opening with the empty password fails user
    * authentication and the reader reaches the reference's UNIMPLEMENTED
    * owner-password path (NotImplementedException, Tokeniser.cs:810-840) —
    * replicated as `UnsupportedOperationException`, surfaced by the pipeline
    * as a structured error row the gate oracles verbatim. Content streams
    * are genuinely encrypted, so a future owner-auth implementation flips
    * the gate (a conscious behavior change, not a silent one). */
  // fixed passwords -> one key chain for every owner-only doc (51 MD5 + 19
  // RC4 rounds amortized across the corpus, like encOKey/aesOKeyU)
  private lazy val ownerOnlyOKeyU: (Array[Byte], Array[Byte], Array[Byte]) = {
    val docId = EncDocIdHex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val ownerHash = PdfCrypto.md5(PdfCrypto.pad("graftowner"))
    val o = PdfCrypto.rc4(java.util.Arrays.copyOf(ownerHash, 5), PdfCrypto.pad("graftuser"))
    val key = PdfCrypto.computeEncryptionKey(PdfCrypto.pad("graftuser"), o, EncPermission, docId, 5)
    val u = PdfCrypto.computeEncryptU(PdfCrypto.pad("graftuser"), docId, key)
    (o, key, u)
  }

  def pdfOwnerOnlyFromText(text: String): Array[Byte] = {
    val (o, key, u) = ownerOnlyOKeyU
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text, encryptKey = key)
    val catalog = GoldenGen.catalogFor(b, contentIds)
    val encId = b.addObject(
      s"<</Filter/Standard/V 1/R 2/P $EncPermission/O <${hexOf(o)}>/U <${hexOf(u)}>>>")
    b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$EncDocIdHex><$EncDocIdHex>]")
  }

  /** R3 owner-only twin of [[pdfOwnerOnlyFromText]]: V 2/R 3/Length 40, /O
    * from the FULL Algorithm 3 chain (50×MD5 owner key + 20-key RC4), user
    * password "graftuser" never handed to the caller — only the Algorithm 7
    * owner path (extended mode, password [[OwnerPassword]]) can open it, and
    * it must undo the whole 20-pass chain, not R2's single RC4. */
  private lazy val ownerOnlyR3OKeyU: (Array[Byte], Array[Byte], Array[Byte]) = {
    val docId = EncDocIdHex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val o = PdfCrypto.computeOwnerO(OwnerPassword, "graftuser", 5)
    val key = PdfCrypto.computeEncryptionKey(PdfCrypto.pad("graftuser"), o, EncPermission, docId, 5)
    val u = PdfCrypto.computeEncryptU(PdfCrypto.pad("graftuser"), docId, key)
    (o, key, u)
  }

  /** The owner password both owner-only builders encrypt under. */
  val OwnerPassword = "graftowner"

  def pdfOwnerOnlyR3FromText(text: String): Array[Byte] = {
    val (o, key, u) = ownerOnlyR3OKeyU
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text, encryptKey = key)
    val catalog = GoldenGen.catalogFor(b, contentIds)
    val encId = b.addObject(
      s"<</Filter/Standard/V 2/R 3/Length 40/P $EncPermission/O <${hexOf(o)}>/U <${hexOf(u)}>>>")
    b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$EncDocIdHex><$EncDocIdHex>]")
  }

  /** AESV2 owner-only: V4/R4 — /O is STILL the RC4-based Algorithm 3 chain
    * (ISO 32000-1 keeps RC4 for /O and /U at R4; only payloads are AES), so
    * [[graft.pdf.PdfCrypto.recoverUserPasswordFromO]]'s revision-≥3 branch
    * opens it and decryption then proceeds through the AES cipher path —
    * the owner-auth and AESV2 extensions composed. */
  private lazy val aesOwnerOnlyOKeyU: (Array[Byte], Array[Byte], Array[Byte]) = {
    val docId = AesDocIdHex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val o = PdfCrypto.computeOwnerO(OwnerPassword, "graftuser", 16)
    val key = PdfCrypto.computeEncryptionKey(PdfCrypto.pad("graftuser"), o, EncPermission, docId, 16)
    val u = PdfCrypto.computeEncryptU(PdfCrypto.pad("graftuser"), docId, key)
    (o, key, u)
  }

  def pdfAesOwnerOnlyFromText(docIdNum: Long, text: String): Array[Byte] = {
    val (o, key, u) = aesOwnerOnlyOKeyU
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingOpsPerPage(text).map { ops =>
      val id = b.registerObject()
      val iv = Array.tabulate[Byte](16)(i =>
        ((docIdNum * 131 + id * 31 + i * 7 + text.length) & 0xff).toByte)
      val payload = PdfCrypto.aesEncrypt(
        PdfCrypto.objectKeyAes(key, ObjectId(id, 0)), iv, ops.getBytes(ISO_8859_1))
      b.raw(s"$id 0 obj\n<</Length ${payload.length}>>stream\n")
      b.raw(payload)
      b.raw("\nendstream\nendobj\n")
      id
    }
    val catalog = GoldenGen.catalogFor(b, contentIds)
    val encId = b.addObject(
      s"<</Filter/Standard/V 4/R 4/P $EncPermission/Length 128" +
        "/CF<</StdCF<</CFM/AESV2/AuthEvent/DocOpen/Length 16>>>>" +
        "/StmF/StdCF/StrF/StdCF" +
        s"/O <${hexOf(o)}>/U <${hexOf(u)}>>>")
    b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$AesDocIdHex><$AesDocIdHex>]")
  }

  // Deterministic AES-256 (V5) security bundles — extended mode only (the
  // reference throws on V > 2). Real writers draw the 32-byte file key and
  // the four 8-byte salts from a CSPRNG; fixtures pin them so every builder
  // output is byte-stable. R6 bundles pay the Algorithm-2.B hardened hash
  // (64+ AES/SHA-2 rounds per derivation) ONCE here, amortized corpus-wide
  // like encOKey/aesOKeyU.
  private val V5FileKey = Array.tabulate[Byte](32)(i => ((i * 37 + 11) & 0xff).toByte)
  private def v5Salts(seed: Int) = Array.tabulate[Byte](32)(i => ((seed * 53 + i * 29 + 5) & 0xff).toByte)
  private lazy val v5UserR6 =
    PdfCrypto.makeV5Security("", OwnerPassword, V5FileKey, v5Salts(1), EncPermission,
      encryptMetadata = true, revision = 6)
  private lazy val v5UserR5 =
    PdfCrypto.makeV5Security("", OwnerPassword, V5FileKey, v5Salts(2), EncPermission,
      encryptMetadata = true, revision = 5)
  private lazy val v5NoMetaR6 =
    PdfCrypto.makeV5Security("", OwnerPassword, V5FileKey, v5Salts(3), EncPermission,
      encryptMetadata = false, revision = 6)
  private lazy val v5OwnerOnly =
    PdfCrypto.makeV5Security("graftuser", OwnerPassword, V5FileKey, v5Salts(4), EncPermission,
      encryptMetadata = true, revision = 6)

  private def v5EncryptedBody(b: GoldenGen.PdfBuilder, docId: Long, text: String): Seq[Int] =
    rotatingOpsPerPage(text).map { ops =>
      val id = b.registerObject()
      val iv = Array.tabulate[Byte](16)(i =>
        ((docId * 149 + id * 41 + i * 13 + text.length) & 0xff).toByte)
      // V5: the FILE key encrypts every stream directly — no per-object key
      val payload = PdfCrypto.aesEncrypt(V5FileKey, iv, ops.getBytes(ISO_8859_1))
      b.raw(s"$id 0 obj\n<</Length ${payload.length}>>stream\n")
      b.raw(payload)
      b.raw("\nendstream\nendobj\n")
      id
    }

  private def v5EncDict(sec: PdfCrypto.V5Security, revision: Int, extra: String): String =
    s"<</Filter/Standard/V 5/R $revision/Length 256/P $EncPermission" +
      "/CF<</StdCF<</CFM/AESV3/AuthEvent/DocOpen/Length 32>>>>" +
      "/StmF/StdCF/StrF/StdCF" + extra +
      s"/O <${hexOf(sec.o)}>/U <${hexOf(sec.u)}>" +
      s"/OE <${hexOf(sec.oe)}>/UE <${hexOf(sec.ue)}>/Perms <${hexOf(sec.perms)}>>>"

  /** AES-256 corpus (gate for the V5/AESV3 capability): variant 0's
    * chunk/page contract with every content stream AES-256-CBC-encrypted
    * under the file key (ISO 32000-2 drops per-object key derivation).
    * `(docId/2) % 3` rotates three dialects, all opening with the EMPTY
    * user password under `extendedFilters = true`:
    *  - 0: R6 — the hardened Algorithm-2.B hash (64+ variable rounds);
    *  - 1: R5 — the deprecated single-SHA-256 precursor (Adobe ext. 3);
    *  - 2: R6 with `/EncryptMetadata false` — unlike V4 the FILE KEY does
    *       not change (it's random, not password-derived), but the /Perms
    *       capsule's flag byte must read 'F' (Algorithm 13 validates it).
    * Every dialect carries /Perms, so the gate also proves the
    * Algorithm-13 round-trip; default mode keeps the reference's throw
    * surface (error row, unit-pinned). */
  def pdfAes256ForDoc(docId: Long, text: String): Array[Byte] = {
    val (sec, revision, extra) = ((docId / 2) % 3).toInt match {
      case 0 => (v5UserR6, 6, "")
      case 1 => (v5UserR5, 5, "")
      case _ => (v5NoMetaR6, 6, "/EncryptMetadata false")
    }
    val b = new GoldenGen.PdfBuilder()
    val contentIds = v5EncryptedBody(b, docId, text)
    val catalog = GoldenGen.catalogFor(b, contentIds)
    val encId = b.addObject(v5EncDict(sec, revision, extra))
    b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$AesDocIdHex><$AesDocIdHex>]")
  }

  /** AES-256 owner-only: /U derives from user password "graftuser" (never
    * handed out), so only Algorithm 12 with [[OwnerPassword]] opens it —
    * the V5 owner path hashes (pwd ∥ salt ∥ U₄₈) and unwraps /OE, a
    * different chain from the RC4 inversion the V≤4 arms exercise. */
  def pdfAes256OwnerOnlyFromText(docId: Long, text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val contentIds = v5EncryptedBody(b, docId, text)
    val catalog = GoldenGen.catalogFor(b, contentIds)
    val encId = b.addObject(v5EncDict(v5OwnerOnly, 6, ""))
    b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$AesDocIdHex><$AesDocIdHex>]")
  }

  /** Owner-only corpus router: R2 / R3 / AESV2-R4 / AES-256-R6 by
    * `(docId/2) % 4`, so all four owner-auth surfaces (single-pass RC4
    * inversion, 20-key chain inversion, owner-auth→AES composition, and
    * the V5 Algorithm-12 /OE unwrap) are driver-gate-visible. */
  def pdfOwnerOnlyForDoc(docId: Long, text: String): Array[Byte] =
    ((docId / 2) % 4).toInt match {
      case 0 => pdfOwnerOnlyFromText(text)
      case 1 => pdfOwnerOnlyR3FromText(text)
      case 2 => pdfAesOwnerOnlyFromText(docId, text)
      case _ => pdfAes256OwnerOnlyFromText(docId, text)
    }

  /** EXTENDED-mode corpus: the exact chunk/page contract of variant 0, but
    * content streams encoded with the opt-in filter surface
    * (`extendedFilters = true` — the reference supports only None and
    * FlateDecode and throws otherwise; replicated in default mode), routed
    * by `(doc_id/2) % 5`: LZWDecode, ASCIIHexDecode, ASCII85Decode,
    * RunLengthDecode, and the `[ASCII85Decode FlateDecode]` two-stage
    * chain. Expected extraction is plain `text` (no newline ops), so the
    * gate oracle is trivial while the decode path is anything but. */
  def pdfExtendedForDoc(docId: Long, text: String): Array[Byte] = {
    import graft.pdf.ExtraFilters
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingOpsPerPage(text).map { ops =>
      val plain = ops.getBytes(ISO_8859_1)
      val (dictExtra, payload) = ((docId / 2) % 5).toInt match {
        case 0 => ("/Filter/LZWDecode", ExtraFilters.lzwEncode(plain))
        case 1 => ("/Filter/ASCIIHexDecode", ExtraFilters.asciiHexEncode(plain))
        case 2 => ("/Filter/ASCII85Decode", ExtraFilters.ascii85Encode(plain))
        case 3 => ("/Filter/RunLengthDecode", ExtraFilters.runLengthEncode(plain))
        case _ => ("/Filter[/ASCII85Decode/FlateDecode]",
          ExtraFilters.ascii85Encode(GoldenGen.zlib(plain)))
      }
      b.addStream(dictExtra, payload)
    }
    finishClassic(b, contentIds, text)
  }

  /** HYBRID-reference gate corpus (ISO 32000-1 §7.5.8.4): the variant-0
    * chunk/page contract, but the ENTIRE page graph (page dicts, pages
    * root, catalog) hides inside a compressed object stream that only the
    * trailer's /XRefStm supplement can resolve — the classic table lists
    * just the content streams as in-use and marks every structural object
    * FREE, exactly the compatibility shape Acrobat writes for pre-1.5
    * readers. The reference ignores /XRefStm (Tokeniser.cs:518 bookkeeping
    * set; default mode replicates that as an error row — unit-pinned), so
    * extraction with `extendedFilters = true` gates the resurrect path on
    * every page of every document. Content streams rotate raw/Flate on
    * (doc_id/2) so the hybrid walk composes with the filter chain. */
  def pdfHybridForDoc(docId: Long, text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder("1.5")
    val contentIds = rotatingOpsPerPage(text).map(ops =>
      b.addStream("", ops.getBytes(ISO_8859_1), deflate = (docId / 2) % 2 == 0))
    val p = contentIds.length
    // hidden ids: objStm = p+1; page_i = p+2+i; pagesRoot = 2p+2;
    // catalog = 2p+3; the supplement itself = 2p+4
    val objStmId = p + 1
    val pagesRootId = 2 * p + 2
    val catalogId = 2 * p + 3
    val xrefStmId = 2 * p + 4
    val members: Seq[(Int, String)] =
      (0 until p).map(i => (p + 2 + i,
        s"<</Type/Page /Parent $pagesRootId 0 R/Contents ${contentIds(i)} 0 R>>")) :+
      (pagesRootId,
        s"<</Type/Pages /Kids[${(0 until p).map(i => s"${p + 2 + i} 0 R").mkString(" ")}] /Count $p>>") :+
      (catalogId, s"<</Type/Catalog /Pages $pagesRootId 0 R>>")
    val payloadBody = members.map(_._2).mkString(" ")
    var off = 0
    val header = members.map { case (id, src) =>
      val entry = s"$id $off"
      off += src.length + 1
      entry
    }.mkString(" ") + " "
    val gotObjStm = b.addStream(s"/Type/ObjStm/N ${members.length}/First ${header.length}",
      (header + payloadBody).getBytes(ISO_8859_1), deflate = true)
    require(gotObjStm == objStmId, s"objStm id $gotObjStm != $objStmId")
    require(p + 1 <= 255, s"member index is a 1-byte W column; $p pages overflow it")

    def offRow(a: Int) = Array[Byte](1,
      ((a >> 16) & 0xff).toByte, ((a >> 8) & 0xff).toByte, (a & 0xff).toByte, 0)
    def stmRow(memberIdx: Int) = Array[Byte](2,
      ((objStmId >> 16) & 0xff).toByte, ((objStmId >> 8) & 0xff).toByte,
      (objStmId & 0xff).toByte, memberIdx.toByte)
    val xrefStmAddress = b.size
    val rows: Seq[Array[Byte]] =
      offRow(b.objectOffset(objStmId)) +:                  // the carrier
      (0 until p).map(i => stmRow(i)) :+                   // page dicts
      stmRow(p) :+ stmRow(p + 1) :+                        // pages root, catalog
      offRow(xrefStmAddress)                               // the supplement itself
    val body = GoldenGen.zlib(rows.flatten.toArray)
    b.raw(s"$xrefStmId 0 obj\n<</Type/XRef/Size ${xrefStmId + 1}/Index[$objStmId ${p + 4}]" +
      s"/W[1 3 1]/Filter/FlateDecode/Length ${body.length}/Root $catalogId 0 R>>stream\n")
    b.raw(body)
    b.raw("\nendstream\nendobj\n")

    // classic table: content streams in-use, everything structural FREE
    val tableAddress = b.size
    b.raw(s"xref\n0 ${xrefStmId + 1}\n")
    b.raw("0000000000 65535 f \n")
    (1 to p).foreach(i => b.raw(f"${b.objectOffset(i)}%010d 00000 n \n"))
    (objStmId to xrefStmId).foreach(_ => b.raw("0000000000 00000 f \n"))
    b.raw(s"trailer<</Size ${xrefStmId + 1}/Root $catalogId 0 R/XRefStm $xrefStmAddress>>\n")
    b.raw(s"startxref\n$tableAddress\n%%EOF\n")
    b.currentBytes
  }

  /** WARC gate corpus: a 3-record crawl file per document (warcinfo +
    * request + response — only the response must surface as a page), the
    * response body wrapped in real HTTP/1.1 headers that the reader must
    * strip, and the whole file gzip-per-record (the Common-Crawl member
    * layout) on even doc_ids so both transport arms are gate-visible. URL
    * and WARC-Date are the same closed forms the page corpus uses, so the
    * oracle reproduces every column from doc_id alone. */
  def warcForDoc(docId: Long, text: String): Array[Byte] = {
    val url = UrlPrefix + docId
    val date = Instant.parse("2024-01-01T00:00:00Z").plusSeconds(docId * 60).toString
    val recs = Seq(
      (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:info-$docId>"),
        "software: graft-fixture\r\n".getBytes(ISO_8859_1)),
      (Seq("WARC-Type" -> "request", "WARC-Target-URI" -> url, "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:req-$docId>"),
        s"GET /doc/$docId HTTP/1.1\r\nHost: example.org\r\n\r\n".getBytes(ISO_8859_1)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> url, "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:resp-$docId>"),
        graft.sources.Warc.httpResponse(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    graft.sources.Warc.encode(recs, gzipPerRecord = docId % 2 == 0)
  }

  /** WET gate corpus: a warcinfo record, the `conversion` record carrying
    * the extracted text (UTF-8, with a non-ASCII marker so the charset arm
    * is hash-visible), and a DECOY `response` record whose HTTP body must
    * never surface through a WET reader. Gzip-member layout on ids%3==0. */
  def wetForDoc(docId: Long, text: String): Array[Byte] = {
    val url = UrlPrefix + docId
    val date = Instant.parse("2024-01-01T00:00:00Z").plusSeconds(docId * 60).toString
    val wetText = text + " ¶wet-" + (docId % 9)
    val recs = Seq(
      (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:wetinfo-$docId>"),
        "software: graft-wet-fixture\r\n".getBytes(ISO_8859_1)),
      (Seq("WARC-Type" -> "conversion", "WARC-Target-URI" -> url,
        "WARC-Date" -> date, "WARC-Refers-To" -> s"<urn:uuid:resp-$docId>",
        "WARC-Record-ID" -> s"<urn:uuid:conv-$docId>",
        "Content-Type" -> "text/plain"),
        wetText.getBytes(UTF_8)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> url, "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:decoy-$docId>"),
        graft.sources.Warc.httpResponse("decoy html".getBytes(UTF_8))))
    graft.sources.Warc.encode(recs, gzipPerRecord = docId % 3 == 0)
  }

  /** Robots gate corpus: one robots.txt per document exercising every
    * RFC 9309 feature the parser implements — a specific `graftbot` group
    * (present only on EVEN doc_ids, so group-selection-vs-`*` is
    * gate-visible), wildcard + `$`-anchored rules, longest-match-wins
    * allow/disallow overlap, a decoy group, crawl-delay and a sitemap.
    * Every per-arm outcome is a closed form of (doc_id, arm) the DuckDB
    * oracle restates independently. */
  def robotsForDoc(docId: Long): String = {
    val specific =
      if (docId % 2 == 0)
        s"""User-agent: graftbot
           |Allow: /doc/$docId/keep*
           |Disallow: /doc/$docId/
           |Disallow: /tmp/*.dat$$
           |Crawl-delay: ${docId % 7 + 1}
           |""".stripMargin
      else ""
    s"""# corpus policy $docId
       |User-agent: otherbot
       |Disallow: /
       |
       |$specific
       |User-agent: *
       |Disallow: /doc/
       |Disallow: /blocked
       |
       |Sitemap: https://example.org/$docId/sitemap.xml
       |""".stripMargin
  }

  /** Sitemap gate corpus: per document a sitemap exercising every parser
    * feature as closed forms of (doc_id, idx) — even ids a `<urlset>` of
    * (id%5+1) page URLs (escaped `&amp;` query strings on even idx, the
    * entity-decode arm; `<lastmod>` on even idx), odd ids a 2-entry
    * `<sitemapindex>`; ids %3==0 ride gzip transport, ids %4==0 carry a
    * namespace prefix on every element. */
  def sitemapForDoc(docId: Long): Array[Byte] = {
    val pre = if (docId % 4 == 0) "sm:" else ""
    def lastmod(idx: Long): String =
      if (idx % 2 == 0)
        f"<${pre}lastmod>2024-01-${(docId + idx) % 28 + 1}%02d</${pre}lastmod>"
      else ""
    val body =
      if (docId % 2 == 0) {
        val n = docId % 5 + 1
        val urls = (0L until n).map { k =>
          val q = if (k % 2 == 0) "?a=1&amp;b=2" else ""
          s"<${pre}url><${pre}loc>$UrlPrefix$docId/p$k$q</${pre}loc>${lastmod(k)}</${pre}url>"
        }.mkString("\n")
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<${pre}urlset xmlns${if (pre.isEmpty) "" else ":sm"}="http://www.sitemaps.org/schemas/sitemap/0.9">
           |$urls
           |</${pre}urlset>""".stripMargin
      } else {
        val maps = (0L until 2L).map { k =>
          s"<${pre}sitemap><${pre}loc>https://example.org/$docId/s${k + 1}.xml.gz</${pre}loc>${lastmod(k)}</${pre}sitemap>"
        }.mkString("\n")
        s"""<${pre}sitemapindex xmlns${if (pre.isEmpty) "" else ":sm"}="http://www.sitemaps.org/schemas/sitemap/0.9">
           |$maps
           |</${pre}sitemapindex>""".stripMargin
      }
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (docId % 3 == 0) {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(bytes); g.close()
      out.toByteArray
    } else bytes
  }

  /** Non-ASCII marker appended by [[htmlCharsetProbe]]: all three words
    * sit in ISO-8859-1's 0xA0–0xFF range (identical in windows-1252), so
    * a wrong decode cannot accidentally produce the expected text. */
  val CharsetMarker = "Ähnlich café für"

  /** Charset-transport gate corpus (`html_charset_roundtrip`): the SAME
    * page payload encoded four ways by doc_id%4 — UTF-8 with BOM /
    * windows-1252 via `<meta charset>` / ISO-8859-1 via http-equiv /
    * UTF-16LE with BOM — must extract byte-identically. The body is the
    * document text TWICE plus [[CharsetMarker]] (≥23 words, so the
    * boilerplate keep-rule fires for even the shortest corpus docs and the
    * expected text stays a closed form). */
  def htmlCharsetProbe(docId: Long, text: String): Array[Byte] = {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16LE}
    val body = escapeHtml(s"$text $text $CharsetMarker")
    def page(meta: String) =
      s"""<!DOCTYPE html>
         |<html><head><title>doc $docId</title>$meta</head>
         |<body><p>$body</p></body></html>""".stripMargin
    def withBom(payload: Array[Byte], bom: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](bom.length + payload.length)
      System.arraycopy(bom, 0, out, 0, bom.length)
      System.arraycopy(payload, 0, out, bom.length, payload.length)
      out
    }
    (docId % 4) match {
      case 0 => withBom(page("").getBytes(UTF_8),
        Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte))
      case 1 => page("""<meta charset="windows-1252">""").getBytes(ISO_8859_1)
      case 2 => page("""<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">""")
        .getBytes(ISO_8859_1)
      case _ => withBom(page("").getBytes(UTF_16LE),
        Array(0xff.toByte, 0xfe.toByte))
    }
  }

  /** Feed gate corpus: one RSS 2.0 (even ids) or Atom 1.0 (odd ids) feed
    * per document exercising every [[graft.sources.Feed]] rule — CDATA
    * titles kept literal (the raw `&` inside proves no entity decoding in
    * CDATA), entity-decoded plain titles and hrefs, Atom link selection by
    * rel (feed-level and entry-level `rel="self"` decoys skipped,
    * alternate and rel-less chosen), `pubDate` vs `published`-with-
    * `updated`-fallback, a linkless entry that must vanish, and a
    * missing-title/missing-date arm. Namespace-prefix arm on odd ids with
    * id%5==1; gzip transport on id%3==0. Every surfaced field is a closed
    * form of (doc_id, idx). */
  def feedForDoc(docId: Long): Array[Byte] = {
    val k = docId % 7
    val body =
      if (docId % 2 == 0)
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<rss version="2.0"><channel>
           |<title>chan-$docId</title><link>https://news.example/chan</link>
           |<item><link>https://news.example/r$docId/0</link><title><![CDATA[t&$k 0]]></title><pubDate>0${k + 1} Jan 2024 00:00:00 GMT</pubDate></item>
           |<item><link>https://news.example/r$docId/1?a=1&amp;b=2</link><title>t&amp;$k 1</title></item>
           |<item><title>linkless, must vanish</title></item>
           |<item><link>https://news.example/r$docId/2</link></item>
           |</channel></rss>""".stripMargin
      else {
        val p = if (docId % 5 == 1) "a:" else ""
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<${p}feed xmlns${if (p.isEmpty) "" else ":a"}="http://www.w3.org/2005/Atom">
           |<${p}title>chan-$docId</${p}title><${p}link rel="self" href="https://news.example/feed.xml"/>
           |<${p}entry><${p}link rel="self" href="https://news.example/self"/><${p}link rel="alternate" href="https://news.example/a$docId/0"/><${p}title><![CDATA[t&$k 0]]></${p}title><${p}published>2024-01-0${k + 1}T00:00:00Z</${p}published></${p}entry>
           |<${p}entry><${p}link href="https://news.example/a$docId/1?x=1&amp;y=2"/><${p}title>t&amp;$k 1</${p}title><${p}updated>2024-02-01T00:00:00Z</${p}updated></${p}entry>
           |<${p}entry><${p}title>linkless</${p}title></${p}entry>
           |<${p}entry><${p}link href="https://news.example/a$docId/2"/></${p}entry>
           |</${p}feed>""".stripMargin
      }
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (docId % 3 == 0) {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(bytes); g.close()
      out.toByteArray
    } else bytes
  }

  /** The five probe paths for [[robotsForDoc]], by arm. */
  def robotsPathArm(docId: Long, arm: Int): String = arm match {
    case 0 => s"/doc/$docId/keep/a"   // even: allow beats disallow (longer); odd: * group blocks /doc/
    case 1 => s"/doc/$docId/x"        // blocked under both groups
    case 2 => s"/tmp/$docId.dat"      // even: $-anchored block; odd: * group has no /tmp rule
    case 3 => s"/tmp/$docId.dat?x=1"  // anchor mismatch: allowed under both
    case _ => "/blocked"              // even: specific group shadows *; odd: blocked
  }

  /** Expected `pdf_outline` surface for [[pdfOutlineForDoc]] (Scala twin of
    * the SQL oracle): a fixed depth-3 subtree under chapter 0, then one
    * top-level chapter per page. */
  def outlineExpectedText(text: String): String = {
    val len = text.length
    val p = math.max(1, pdfPageCount(text))
    val head = s"0:ch-0-$len|1:sec-0-$len|2:sub-0-$len"
    if (p == 1) head
    else head + (1 until p).map(i => s"|0:ch-$i-$len").mkString
  }

  /** Outline gate corpus: a variant-0 document whose catalog carries an
    * /Outlines bookmark tree — one top-level chapter per page (sibling chain
    * scales with the document) and a depth-3 First-chain under chapter 0, so
    * the DFS walk, the Next chain, and the recursion are all gate-visible.
    * The reference never reads /Outlines (verified across all 16 PdfParser
    * .cs files), so this is an ADDITIVE surface: it changes no
    * reference-identical output, and no mode gate is needed. */
  def pdfOutlineForDoc(docId: Long, text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text)
    val len = text.length
    val p = math.max(1, pdfPageCount(text))
    // sequential ids, computed up front so First/Next can point forward:
    // root=r, ch0=r+1, sec0=r+2, sub0=r+3, ch_i (i>=1) = r+3+i
    val r = b.nextObjectNumber
    def chIdOf(i: Int): Int = if (i == 0) r + 1 else r + 3 + i
    b.addObject(s"<</Type/Outlines/First ${chIdOf(0)} 0 R/Last ${chIdOf(p - 1)} 0 R/Count $p>>")
    b.addObject(s"<</Title (ch-0-$len)/Parent $r 0 R/First ${r + 2} 0 R/Last ${r + 2} 0 R" +
      (if (p > 1) s"/Next ${chIdOf(1)} 0 R" else "") + ">>")
    b.addObject(s"<</Title (sec-0-$len)/Parent ${r + 1} 0 R/First ${r + 3} 0 R/Last ${r + 3} 0 R>>")
    b.addObject(s"<</Title (sub-0-$len)/Parent ${r + 2} 0 R>>")
    (1 until p).foreach { i =>
      val id = b.addObject(s"<</Title (ch-$i-$len)/Parent $r 0 R" +
        (if (i + 1 < p) s"/Next ${chIdOf(i + 1)} 0 R" else "") + ">>")
      require(id == chIdOf(i), s"outline id drift: $id vs ${chIdOf(i)}")
    }
    val metaId = addMetadata(b, text)
    val catalog = GoldenGen.catalogFor(b, contentIds, metadataId = Some(metaId),
      catalogExtra = s"/Outlines $r 0 R")
    val info = b.addObject(infoContent(text))
    b.finish(s"/Root $catalog 0 R/Info $info 0 R/ID[<${docIdHex(text)}><${docIdHex(text)}>]")
  }

  /** Attachment gate corpus: a variant-0 document carrying THREE embedded
    * files behind a /Names → /EmbeddedFiles name tree whose root splits into
    * two /Kids nodes (the intermediate-node walk is gate-visible, not just
    * the leaf /Names form). Contents are SQL-computable transforms of the
    * document text: att-0.txt = text (Flate), att-1.bin = reverse(text)
    * (Flate), att-2.txt = upper(text) (unfiltered). ADDITIVE surface — the
    * reference never reads /Names. */
  def pdfAttachmentsForDoc(docId: Long, text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text)
    def bytesOf(s: String) = s.getBytes(ISO_8859_1)
    val s0 = b.addStream("/Type/EmbeddedFile", bytesOf(text), deflate = true)
    val s1 = b.addStream("/Type/EmbeddedFile", bytesOf(new StringBuilder(text).reverse.toString), deflate = true)
    // Locale.ROOT: the oracle is DuckDB's upper(); a tr_TR default locale
    // would dot-map 'i' and break the md5 (corpus contract is ASCII anyway)
    val s2 = b.addStream("/Type/EmbeddedFile", bytesOf(text.toUpperCase(java.util.Locale.ROOT)))
    def filespec(name: String, sid: Int): Int =
      b.addObject(s"<</Type/Filespec/F ($name)/EF<</F $sid 0 R>>>>")
    val f0 = filespec("att-0.txt", s0)
    val f1 = filespec("att-1.bin", s1)
    val f2 = filespec("att-2.txt", s2)
    val kid1 = b.addObject(s"<</Limits[(att-0.txt)(att-1.bin)]/Names[(att-0.txt) $f0 0 R (att-1.bin) $f1 0 R]>>")
    val kid2 = b.addObject(s"<</Limits[(att-2.txt)(att-2.txt)]/Names[(att-2.txt) $f2 0 R]>>")
    val treeRoot = b.addObject(s"<</Kids[$kid1 0 R $kid2 0 R]>>")
    val metaId = addMetadata(b, text)
    val catalog = GoldenGen.catalogFor(b, contentIds, metadataId = Some(metaId),
      catalogExtra = s"/Names<</EmbeddedFiles $treeRoot 0 R>>")
    val info = b.addObject(infoContent(text))
    b.finish(s"/Root $catalog 0 R/Info $info 0 R/ID[<${docIdHex(text)}><${docIdHex(text)}>]")
  }

  /** Annotation gate corpus: variant-0 pages each carrying an INLINE
    * /Annots array with one FreeText note (/Contents a closed form of the
    * 1-based page number and length(text)) and one Link whose /A /URI is a
    * closed form of (doc_id, page). ADDITIVE surface — the reference never
    * reads /Annots. */
  def pdfAnnotsForDoc(docId: Long, text: String): Array[Byte] = {
    val len = text.length
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text)
    val metaId = addMetadata(b, text)
    val catalog = GoldenGen.catalogFor(b, contentIds, metadataId = Some(metaId),
      pageExtra = pi => {
        val page = pi + 1
        s"/Annots[<</Subtype/FreeText/Contents (note-$page-$len)>>" +
          s"<</Subtype/Link/A<</S/URI/URI (https://ann${docId % 5}.example/p$page)>>>>]"
      })
    val info = b.addObject(infoContent(text))
    b.finish(s"/Root $catalog 0 R/Info $info 0 R/ID[<${docIdHex(text)}><${docIdHex(text)}>]")
  }

  /** Expected `pdf_form_fields` surface for [[pdfFormFieldsForDoc]]. */
  def formFieldsExpectedText(text: String): String = {
    val len = text.length
    s"title=t-$len|meta.lang=v1-$len|meta.count=v2-$len"
  }

  /** AcroForm gate corpus: a variant-0 document whose catalog carries an
    * /AcroForm with a flat text field and a non-terminal group whose /Kids
    * hold two terminal fields — the dotted-name join (meta.lang) and the
    * Kids recursion are gate-visible. Values are closed forms of
    * length(text). ADDITIVE surface — the reference never reads /AcroForm. */
  def pdfFormFieldsForDoc(docId: Long, text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val contentIds = rotatingShowContents(b, text)
    val len = text.length
    val f1 = b.addObject(s"<</FT/Tx/T (title)/V (t-$len)>>")
    val k1 = b.addObject(s"<</FT/Tx/T (lang)/V (v1-$len)>>")
    val k2 = b.addObject(s"<</FT/Tx/T (count)/V (v2-$len)>>")
    val group = b.addObject(s"<</T (meta)/Kids[$k1 0 R $k2 0 R]>>")
    val acro = b.addObject(s"<</Fields[$f1 0 R $group 0 R]>>")
    val metaId = addMetadata(b, text)
    val catalog = GoldenGen.catalogFor(b, contentIds, metadataId = Some(metaId),
      catalogExtra = s"/AcroForm $acro 0 R")
    val info = b.addObject(infoContent(text))
    b.finish(s"/Root $catalog 0 R/Info $info 0 R/ID[<${docIdHex(text)}><${docIdHex(text)}>]")
  }

  /** Source char the Type0 gate writes as CID 0x0001, whose ToUnicode
    * destination <00660066> is the TWO-char "ff" — extended-mode composite
    * decoding keeps multi-char targets verbatim (no ligature packing; the
    * packing is a default-mode reference quirk, Tokeniser.cs:2616-2644).
    * 'e' so essentially every gate doc exercises the multi-char arm. */
  final val Type0MarkerFF = 'e'

  /** Source char the Type0 gate writes as CID 0x0002, whose ToUnicode
    * destination <D83DDE00> is a UTF-16 SURROGATE PAIR (U+1F600) — the
    * non-BMP arm of the destination reader. 't' for the same reason. */
  final val Type0MarkerEmoji = 't'

  /** Expected extraction for [[pdfType0ForDoc]] (Scala twin of the SQL
    * oracle `replace(replace(text,'e','ff'),'t',chr(128512))`). */
  def type0ExpectedText(text: String): String = text.flatMap {
    case Type0MarkerFF    => "ff"
    case Type0MarkerEmoji => "😀"
    case c                => c.toString
  }

  /** Per-char CID encoding of the Type0 gate: markers take the bfchar CIDs,
    * printable ASCII rides the <0120> <017E> <0020> bfrange (cid = char +
    * 0x100, all above the 8-bit table the reference is limited to), and
    * anything else is written as its OWN codepoint with NO CMap entry — the
    * reader's Identity-passthrough arm (unmapped cid → the cid itself).
    *
    * Supported text domain (require-pinned, LOUD not silently wrong): no
    * chars in {U+0001, U+0002} ∪ [U+0120, U+017E] — those codepoints
    * collide with the marker/bfrange CID windows and would decode through
    * the CMap instead of passing through. The gate corpus is printable
    * ASCII (verified 32..121 at every sf), far inside the domain. */
  private def type0Cids(chunk: String): Array[Int] = chunk.map {
    case Type0MarkerFF    => 0x0001
    case Type0MarkerEmoji => 0x0002
    case c if c >= 0x20 && c <= 0x7e => c + 0x100
    case c =>
      require(c > 0x02 && !(c >= 0x120 && c <= 0x17e),
        f"type0 gate: char U+${c.toInt}%04X collides with a CID window")
      c.toInt
  }.toArray

  private def appendLiteralByte(ops: StringBuilder, v: Int): Unit = v match {
    case '\\' => ops.append("\\\\")
    case '('  => ops.append("\\(")
    case ')'  => ops.append("\\)")
    case b if b < 0x20 || b > 0x7e => ops.append(f"\\$b%03o")
    case b => ops.append(b.toChar)
  }

  /** Type0/Identity-H composite-font corpus (gate for the beyond-reference
    * CID capability): variant-0 chunking (64-char chunks, 8 per page), every
    * chunk shown through a Type0 font with /Encoding/Identity-H, a
    * CIDFontType2 descendant and a full-range ToUnicode CMap. Show ops
    * rotate hex `Tj` / escaped-literal `'` / hex-inside-`TJ` on the global
    * chunk index, so BOTH 2-byte code paths (hex nibbles and literal bytes
    * with octal escapes) and the array form are gate-visible. The reference
    * parses such CMaps into a map it never consults above 0xFF (PdfFont.cs:40,
    * Tokeniser.cs:2464-2472) — real-world Identity-H text is unreadable to
    * it; extended mode decodes codes as big-endian 2-byte CIDs through the
    * full map. Expected extraction is [[type0ExpectedText]]. */
  def pdfType0ForDoc(docId: Long, text: String): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |/CIDSystemInfo << /Registry(Adobe) /Ordering(UCS) /Supplement 0 >> def
        |/CMapName /Adobe-Identity-UCS def
        |/CMapType 2 def
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <00660066>
        |<0002> <D83DDE00>
        |endbfchar
        |1 beginbfrange
        |<0120> <017E> <0020>
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end
        |end""".stripMargin
    val cmapId = b.addStream("", cmap.getBytes(ISO_8859_1), deflate = true)
    val descId = b.addObject(
      "<</Type/Font/Subtype/CIDFontType2/BaseFont/GraftCID" +
        "/CIDSystemInfo<</Registry(Adobe)/Ordering(Identity)/Supplement 0>>" +
        "/CIDToGIDMap/Identity>>")
    val fontId = b.addObject(
      s"<</Type/Font/Subtype/Type0/BaseFont/GraftCID/Encoding/Identity-H" +
        s"/DescendantFonts[$descId 0 R]/ToUnicode $cmapId 0 R>>")
    var gi = 0
    val contentIds = text.grouped(64).toIndexedSeq.grouped(8).map { pageChunks =>
      val ops = new StringBuilder("BT /F1 10 Tf ")
      pageChunks.foreach { c =>
        val cids = type0Cids(c)
        gi % 3 match {
          case 0 =>
            ops.append('<'); cids.foreach(cid => ops.append(f"$cid%04X")); ops.append("> Tj ")
          case 1 =>
            ops.append('(')
            cids.foreach { cid => appendLiteralByte(ops, cid >> 8); appendLiteralByte(ops, cid & 0xff) }
            ops.append(") ' ")
          case _ =>
            ops.append("[<"); cids.foreach(cid => ops.append(f"$cid%04X")); ops.append("> -120] TJ ")
        }
        gi += 1
      }
      ops.append("ET")
      b.addStream("", ops.toString.getBytes(ISO_8859_1), deflate = true)
    }.toSeq
    finishClassic(b, contentIds, text, fontObj = Some(("F1", fontId)))
  }

  /** EXTENDED-mode predictor corpus: the exact chunk/page contract of
    * variant 4 (cross-reference STREAM layout), but the xref stream's rows
    * are encoded with the predictor surface the reference rejects
    * (Token.cs:652-668 accepts only Predictor 12 + all-Up rows), routed by
    * `(doc_id/2) % 3`: PNG Predictor 15 with per-row filter types rotating
    * None/Sub/Up/Average/Paeth, TIFF Predictor 2 (horizontal differencing),
    * and Predictor 1 (DecodeParms present, no prediction). Readable only
    * under `extendedFilters = true`; expected extraction equals variant
    * 4's, so the gate oracle is the same closed form. */
  def pdfPredictorForDoc(docId: Long, text: String): Array[Byte] = {
    val mode = ((docId / 2) % 3).toInt match {
      case 0 => "png"
      case 1 => "tiff"
      case _ => "none"
    }
    val b = new GoldenGen.PdfBuilder("1.5")
    val contentIds = rotatingShowContents(b, text)
    val metaId = addMetadata(b, text)
    GoldenGen.finishXrefStream(b, contentIds, infoContent(text),
      metadataId = Some(metaId), trailerId = Some(docIdHex(text)), predictor = mode)
  }

  /** Expected PDF page count for [[pdfFromText]] under `text` —
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
  /** Fixed-layout HTML span probe (round 5, twin of [[pdfSpanProbe]] for the
    * HTML path): title + one `<p>` per 20-word block, words joined by single
    * spaces, NO links or chrome. Under NumWordsRules every block is kept —
    * full blocks have 20 > 16 words and a short last block's PREDECESSOR has
    * 20 > 4 — except a LONE ≤16-word block, which the caller filters out.
    * The layout is offset-exact: the prefix is 66 chars with 2 newlines, a
    * block line is "<p>" ++ text ++ "</p>\n", so block i's first text char
    * sits at source offset 69 + 8·i + Σ len(block_j<i) on source line 3 + i,
    * and the oracle computes both plus the extracted [start,end) from the
    * word array alone. Callers must exclude texts containing & < > (no
    * entity escaping in the probe, keeping source offsets = text offsets). */
  def htmlSpanProbe(text: String): Array[Byte] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val sb = new StringBuilder(
      "<!DOCTYPE html>\n<html><head><title>spanprobe</title></head><body>\n")
    words.grouped(20).foreach(b =>
      sb.append("<p>").append(b.mkString(" ")).append("</p>\n"))
    sb.append("</body></html>")
    sb.toString.getBytes(UTF_8)
  }

  /** Head-metadata gate page (`html_meta`): canonical link, description
    * (with an entity in the value), og:title, og:description with the
    * attribute ORDER swapped and single quotes, robots noindex,nofollow as
    * an UNQUOTED value on every doc_id % 3 == 0, and a forged meta inside
    * a <script> string that the scanner must skip. All values closed forms
    * of (doc_id, length(text)). */
  def htmlMetaProbe(docId: Long, text: String): Array[Byte] = {
    val len = text.length
    val sb = new StringBuilder("<!DOCTYPE html>\n<html><head>\n")
    sb.append(s"<title>t-$len</title>\n")
    sb.append(s"""<link rel="canonical" href="https://example${docId % 7}.com/p${docId % 5}">""").append('\n')
    sb.append(s"""<meta name="description" content="desc-$len &amp; more">""").append('\n')
    sb.append(s"""<meta property="og:title" content="og-$len">""").append('\n')
    sb.append(s"""<meta content='ogd-$len' property='og:description'>""").append('\n')
    if (docId % 3 == 0) sb.append("<meta name=robots content=noindex,nofollow>\n")
    sb.append("""<script>var forged = "<meta name=\"description\" content=\"forged\">";</script>""").append('\n')
    sb.append("</head><body>\n<p>").append(text).append("</p>\n</body></html>")
    sb.toString.getBytes(UTF_8)
  }

  /** Out-link gate page (`html_links`): five kept anchors rotating every
    * href form (absolute; single-quoted path-relative; unquoted
    * root-relative; protocol-relative; dot-dot with a fragment to drop),
    * plus four that must NOT surface (javascript:, mailto:, a commented-out
    * anchor, one forged inside a <script> string). Odd doc_ids carry a
    * <base href> that rebases the relative arms — and a second base that
    * must LOSE (first wins). Every resolved URL is a closed form of
    * (doc_id, length(text)); the page URL is [[UrlPrefix]] + docId. */
  def htmlLinksProbe(docId: Long, text: String): Array[Byte] = {
    val len = text.length
    val sb = new StringBuilder("<!DOCTYPE html>\n<html><head>\n")
    if (docId % 2 == 1) {
      sb.append(s"""<base href="https://base$docId.example/b${docId % 3}/dir/">""").append('\n')
      sb.append("""<base href="https://ignored.example/">""").append('\n')
    }
    sb.append("</head><body>\n")
    sb.append(s"""<a href="https://abs.example/a-$len">abs</a>""").append('\n')
    sb.append(s"""<a href='rel-${docId % 5}/p'>rel</a>""").append('\n')
    sb.append(s"""<a href=/root-${docId % 7}>root</a>""").append('\n')
    sb.append(s"""<a href="//cdn.example/c-$len">proto</a>""").append('\n')
    sb.append(s"""<a href="../up-${docId % 2}#sec">dotdot</a>""").append('\n')
    sb.append("""<a href="javascript:void(0)">js</a>""").append('\n')
    sb.append("""<a href="mailto:x@example.org">mail</a>""").append('\n')
    sb.append("""<!-- <a href="commented-out">x</a> -->""").append('\n')
    sb.append("""<script>var a = '<a href="forged-in-script">';</script>""").append('\n')
    sb.append("<p>").append(escapeHtml(text)).append("</p>\n</body></html>")
    sb.toString.getBytes(UTF_8)
  }

  /** Anchor-text probe (the `html_anchor_text` / `anchor_profile` gates):
    * five kept edges per doc whose hrefs AND anchor strings are closed
    * forms of doc_id, exercising every [[graft.html.Links.innerText]]
    * convention — a plain anchor, an anchor with a mid-word numeric
    * character reference + transparent inline tag + `<br>` separator +
    * embedded comment + whitespace collapse, an image-only anchor (empty
    * text), and the HTML5 nested-`<a>` auto-close pair — plus two
    * non-edges that must vanish (a javascript: link whose text must not
    * surface, and an href-less named target). The shared hub targets
    * (`t0..t3`, `n1`, `n2`) give [[graft.html.Anchors.profile]] real
    * cross-document frequency structure to argmax over. */
  def htmlAnchorProbe(docId: Long, text: String): Array[Byte] = {
    val k3 = docId % 3
    val k4 = docId % 4
    val sb = new StringBuilder("<!DOCTYPE html>\n<html><body>\n")
    sb.append(s"""<a href="https://hub.example/t$k4">plain $k3</a>""").append('\n')
    sb.append(s"""<a href="/t${(docId + 1) % 4}"> <b>bo&#108;d</b>-$k3 <br><!-- <a href="noise">x</a> --> tail </a>""").append('\n')
    sb.append(s"""<a href="https://hub.example/t$k4"><img src="x.png"></a>""").append('\n')
    sb.append(s"""<a href="https://hub.example/n1">one <a href="https://hub.example/n2">two</a>""").append('\n')
    sb.append("""<a href="javascript:void(0)">never</a>""").append('\n')
    sb.append("""<a name="here">not a link</a>""").append('\n')
    sb.append("<p>").append(escapeHtml(text)).append("</p>\n</body></html>")
    sb.toString.getBytes(UTF_8)
  }

  /** Outline probe (the `html_outline` gate): three body headings whose
    * levels and titles are closed forms of doc_id, exercising every
    * [[graft.html.Outline]] convention — an h1 with a named entity, an h2
    * with a transparent inline tag, an h3 with a numeric character
    * reference — plus three decoys that must vanish: a chrome heading
    * (inside `<nav>`), a commented-out heading, and a heading forged
    * inside `<script>` text. The real paragraphs carry the corpus text so
    * the payload stays realistic. */
  def htmlOutlineProbe(docId: Long, text: String): Array[Byte] = {
    val esc = escapeHtml(text)
    val html =
      s"""<!DOCTYPE html>
         |<html><head><title>doc $docId</title>
         |<script>var x = '<h2>forged in script</h2>';</script>
         |</head><body>
         |<nav><h2>site sections</h2><a href="/">home</a></nav>
         |<h1>Ch &amp; ap-${docId % 9}</h1>
         |<p>$esc</p>
         |<!-- <h3>commented out</h3> -->
         |<h2>Se<b>cti</b>on ${docId % 5}</h2>
         |<p>$esc</p>
         |<h3>Sub &#97;-${docId % 7}</h3>
         |<p>$esc</p>
         |</body></html>""".stripMargin
    html.getBytes(UTF_8)
  }

  /** Table probe (the `html_tables` gate): a header table (thead/tbody,
    * caption, entity and inline-tag cells, an EMPTY cell, implied
    * `</td>`/`</tr>` closes), a NESTED table inside a cell (the containing
    * cell's text must pause at the inner table and resume after it — no
    * duplication, no loss), a `<tr>`-less loose table (implied row 0), and
    * two decoys that must produce no cells (a table forged in `<script>`
    * text and a commented-out table). Every cell a closed form of
    * doc_id. */
  def htmlTableProbe(docId: Long, text: String): Array[Byte] = {
    val esc = escapeHtml(text)
    val html =
      s"""<!DOCTYPE html>
         |<html><body>
         |<script>var t = '<table><tr><td>forged</td></tr></table>';</script>
         |<!-- <table><tr><td>commented</td></tr></table> -->
         |<p>$esc</p>
         |<table>
         | <caption>not a cell</caption>
         | <thead><tr><th>name</th><th>v &amp; ${docId % 7}</th></tr></thead>
         | <tbody>
         |  <tr><td>a-${docId % 5}</td><td></td></tr>
         |  <tr><td>pre <table><tr><td>in-${docId % 3}</td></tr></table> post</td><td>b <b>bo</b>ld-${docId % 4}</td></tr>
         |  <tr><td>u-${docId % 2}<td>v-${docId % 2}
         | </tr></tbody>
         |</table>
         |<table><td>loose-${docId % 9}</td></table>
         |<p>$esc</p>
         |</body></html>""".stripMargin
    html.getBytes(UTF_8)
  }

  /** JSON-LD probe (the `html_jsonld` gate): one Article block per doc
    * (headline/datePublished closed forms of doc_id) whose type attribute
    * rotates quoting by doc_id%3 (double/single/unquoted) and value form
    * by doc_id%4 when quoted (plain / uppercase / parameterized
    * `; charset=utf-8` / space-padded — all must match), a second
    * array-form block on odd ids, and three decoys that must vanish: a
    * javascript-typed script, a type-less script, and a commented-out
    * JSON-LD element. */
  def htmlJsonLdProbe(docId: Long, text: String): Array[Byte] = {
    val esc = escapeHtml(text)
    val block1 =
      s"""{"@type":"Article","headline":"t-${docId % 9}","datePublished":"2024-01-0${docId % 9 + 1}"}"""
    val block2 = s"""[{"@type":"BreadcrumbList","position":${docId % 5}}]"""
    val typeAttr =
      if (docId % 3 == 2) "type=application/ld+json" // unquoted: plain value only
      else {
        val v = (docId % 4) match {
          case 0 => "application/ld+json"
          case 1 => "APPLICATION/LD+JSON"
          case 2 => "application/ld+json; charset=utf-8"
          case _ => " application/ld+json "
        }
        if (docId % 3 == 0) s"""type="$v"""" else s"type='$v'"
      }
    val second =
      if (docId % 2 == 1)
        s"""<script type="application/ld+json">$block2</script>"""
      else ""
    val html =
      s"""<!DOCTYPE html>
         |<html><head><title>doc $docId</title>
         |<script type="text/javascript">var decoy = {"not":"ld"};</script>
         |<script>var alsoNot = 1;</script>
         |<!-- <script type="application/ld+json">{"commented":true}</script> -->
         |<script $typeAttr>
         |$block1
         |</script>
         |$second
         |</head><body><p>$esc</p></body></html>""".stripMargin
    html.getBytes(UTF_8)
  }

  /** Real 24bpp bottom-up BMP whose pixel values are closed forms of
    * (x, y, doc_id) — pixel (x,y) carries ((x·7 + y·13 + doc_id) % 256) in
    * all three channels, and row padding bytes are NONZERO (0x55), so a
    * decoder that misreads the 4-byte row stride produces a wrong channel
    * sum instead of accidentally matching. */
  def bmpForDoc(docId: Long): Array[Byte] = {
    val w = 3 + (docId % 5).toInt
    val h = 2 + (docId % 3).toInt
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
    b.putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + docId) % 256).toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { b.put(0x55.toByte); pad += 1 }
      y += 1
    }
    b.array()
  }

  /** Real RIFF/WAVE PCM16 mono file: rate and sample values closed forms of
    * doc_id; odd ids carry an ODD-sized junk LIST chunk before `fmt ` so
    * the decoder's word-aligned chunk walk is gate-visible. */
  def wavForDoc(docId: Long): Array[Byte] = {
    val rate = (8000 * (1 + docId % 3)).toInt
    val n = (50 + docId % 20).toInt
    val junk = docId % 2 == 1
    val junkBytes = if (junk) 8 + 11 + 1 else 0 // header + odd body + pad
    val dataSize = n * 2
    val riffSize = 4 + junkBytes + (8 + 16) + (8 + dataSize)
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(US_ASCII)).putInt(riffSize).put("WAVE".getBytes(US_ASCII))
    if (junk) {
      b.put("LIST".getBytes(US_ASCII)).putInt(11)
      b.put(Array.fill(11)(0x4a.toByte)).put(0.toByte)
    }
    b.put("fmt ".getBytes(US_ASCII)).putInt(16).putShort(1).putShort(1)
    b.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes(US_ASCII)).putInt(dataSize)
    var i = 0
    while (i < n) {
      b.putShort((((i * 31 + docId) % 2001) - 1000).toShort)
      i += 1
    }
    b.array()
  }

  /** Real PNG (8-bit truecolor RGB, non-interlaced) whose pixels are closed
    * forms of (x, y, doc_id). Every decoder arm is gate-visible:
    *  - row `y` is written with filter type `y % 5`, and h ≥ 5, so all five
    *    PNG filters (None/Sub/Up/Average/Paeth) appear in EVERY payload —
    *    a decoder that misimplements any unfilter arm corrupts the channel
    *    sum;
    *  - an ancillary `tEXt` chunk sits between IHDR and IDAT (chunk-skip
    *    arm);
    *  - the zlib stream is split across TWO IDAT chunks at an uneven
    *    boundary (multi-IDAT concatenation arm);
    *  - every chunk carries its real CRC32 (corruption detection arm).
    * Channels: r=(x·7+y·13+id)%256, g=(x·11+y·3+2id)%256, b=(x·5+y·17+3id)%256. */
  def pngForDoc(docId: Long): Array[Byte] = {
    val w = 3 + (docId % 5).toInt
    val h = 5 + (docId % 3).toInt
    val stride = w * 3
    def px(x: Int, y: Int, c: Int): Int = ((c match {
      case 0 => x * 7 + y * 13 + docId
      case 1 => x * 11 + y * 3 + 2 * docId
      case _ => x * 5 + y * 17 + 3 * docId
    }) % 256).toInt // docId ≥ 0 → no negative mod
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // raw scanlines: 1 filter-type byte + FILTERED row bytes (decoder inverts)
    val raw = new Array[Byte](h * (1 + stride))
    val prev = new Array[Int](stride) // unfiltered previous row (0 for y=0)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < stride) { cur(i) = px(i / 3, y, i % 3); i += 1 }
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      i = 0
      while (i < stride) {
        val left = if (i >= 3) cur(i - 3) else 0
        val up = prev(i)
        val upLeft = if (i >= 3) prev(i - 3) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, upLeft)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zb = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zOut.write(zb, 0, deflater.deflate(zb))
    deflater.end()
    val idat = zOut.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val b = java.nio.ByteBuffer.allocate(4 + 4 + data.length + 4)
      b.putInt(data.length).put(typ.getBytes(US_ASCII)).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes(US_ASCII)); crc.update(data)
      b.putInt(crc.getValue.toInt)
      out.write(b.array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("tEXt", s"Software graft-gen-$docId".getBytes(US_ASCII))
    val split = math.max(1, idat.length / 3) // uneven 2-chunk split, both nonempty
    chunk("IDAT", idat.take(split))
    chunk("IDAT", idat.drop(split))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Real GIF89a (global 256-color table, single full-frame image, genuine
    * variable-code-width LZW) whose palette and pixel indices are closed
    * forms of (x, y, doc_id): index(x,y) = (x·5+y·7+id)%256, palette[k] =
    * ((k·3+id)%256, (k·5+2id)%256, (k·7+3id)%256). A Graphic Control
    * Extension AND a two-sub-block Comment extension precede the image
    * descriptor, so the decoder's extension-skip arm (multi-sub-block) is
    * gate-visible; the LZW stream is emitted by [[gifLzwEncode]] with the
    * standard width-bump rule, so the decoder's code-width tracking, table
    * growth and KwKwK arm are exercised by real compressed data. */
  def gifForDoc(docId: Long): Array[Byte] = {
    val w = 3 + (docId % 5).toInt
    val h = 5 + (docId % 3).toInt
    val indices = Array.tabulate(w * h) { i =>
      (((i % w) * 5 + (i / w) * 7 + docId) % 256).toByte
    }
    val palette = new Array[Byte](256 * 3)
    var k = 0
    while (k < 256) {
      palette(k * 3) = ((k * 3 + docId) % 256).toByte
      palette(k * 3 + 1) = ((k * 5 + 2 * docId) % 256).toByte
      palette(k * 3 + 2) = ((k * 7 + 3 * docId) % 256).toByte
      k += 1
    }
    gifBytes(w, h, indices, palette)
  }

  /** Assemble a single-frame GIF89a around arbitrary indices/palette —
    * shared by [[gifForDoc]] and the unit tests that need pathological
    * pixel streams (uniform images force the LZW KwKwK case). */
  private[graft] def gifBytes(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    require(indices.length == w * h && palette.length == 256 * 3)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(US_ASCII))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0xf7) // global table present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // background index, aspect
    out.write(palette)
    // Graphic Control Extension (skipped by the decoder)
    out.write(Array(0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte))
    // Comment extension with TWO sub-blocks (multi-sub-block skip arm)
    out.write(0x21); out.write(0xfe)
    out.write(5); out.write("graft".getBytes(US_ASCII))
    out.write(5); out.write("junk!".getBytes(US_ASCII))
    out.write(0)
    // image descriptor: full frame, no local table, not interlaced
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0x00)
    out.write(8) // LZW minimum code size
    val lzw = gifLzwEncode(indices, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Real baseline grayscale JPEG whose decoded pixels are closed forms of
    * (block, doc_id): the image is CONSTANT PER 8×8 BLOCK — block (bx,by)
    * carries luma (bx·29 + by·31 + id) % 256 — because constant blocks
    * round-trip bit-exactly through DCT → quantize → IDCT (only the DC
    * coefficient is nonzero, and with q[0]=8 the coded DC is exactly
    * v−128), so the DuckDB oracle can predict the decoded luma sum while
    * [[graft.multimodal.Jpeg]] still runs real Huffman + dequant + IDCT.
    * The stream uses the standard Annex-K luminance DC table and a compact
    * file-declared AC table (the decoder builds whatever DHT declares), an
    * APP0/JFIF header and a COM segment (marker-skip arms), and real
    * 0xFF00 byte stuffing whenever a code boundary lands on 0xFF. */
  def jpegForDoc(docId: Long): Array[Byte] = {
    val bw = 2 + (docId % 3).toInt
    val bh = 1 + (docId % 2).toInt
    jpegBytes(8 * bw, 8 * bh, (bx, by) => ((bx * 29 + by * 31 + docId) % 256).toInt)
  }

  private val JpegDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // compact AC table (5 symbols, all length 3): EOB, (run 0..2, size 1), ZRL
  private val JpegAcBits = Array(0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegAcVals = Array(0x00, 0x01, 0x11, 0x21, 0xf0)

  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { out += vals(k) -> ((code, l)); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out.result()
  }

  /** Assemble a baseline grayscale JPEG of per-block-constant luma —
    * shared by [[jpegForDoc]] and unit tests. */
  private[graft] def jpegBytes(w: Int, h: Int, blockLuma: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "constant-block fixtures are multiple-of-8")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8) // SOI
    segment(0xe0, "JFIF".getBytes(US_ASCII) ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    segment(0xfe, "graft jpeg fixture".getBytes(US_ASCII)) // COM skip arm
    // DQT: natural-order q[0]=8 (exact DC), 16 elsewhere; written in zigzag
    val qtNatural = Array.tabulate(64)(i => if (i == 0) 8 else 16)
    segment(0xdb, 0.toByte +: Array.tabulate(64)(i =>
      qtNatural(graft.multimodal.Jpeg.Zigzag(i)).toByte))
    segment(0xc0, Array[Byte](8, (h >> 8).toByte, (h & 0xff).toByte,
      (w >> 8).toByte, (w & 0xff).toByte, 1, 1, 0x11, 0))
    segment(0xc4, 0x00.toByte +: (JpegDcBits.map(_.toByte) ++ JpegDcVals.map(_.toByte)))
    segment(0xc4, 0x10.toByte +: (JpegAcBits.map(_.toByte) ++ JpegAcVals.map(_.toByte)))
    segment(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    // entropy-coded scan: MSB-first writer with 0xFF00 stuffing
    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val acCodes = canonicalCodes(JpegAcBits, JpegAcVals)
    var acc = 0L; var nBits = 0
    def put(v: Int, len: Int): Unit = {
      acc = (acc << len) | (v & ((1L << len) - 1)); nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    var pred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        val dc = blockLuma(bx, by) - 128
        val diff = dc - pred
        pred = dc
        val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (c, cl) = dcCodes(s)
        put(c, cl)
        if (s > 0) put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        val (e, el) = acCodes(0x00) // EOB: no AC coefficients
        put(e, el)
        bx += 1
      }
      by += 1
    }
    if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits) // pad with 1s
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Real MPEG-1 Layer III (MP3) stream whose frame metadata are closed
    * forms of doc_id: an ID3v2 tag with a SYNCSAFE size (the skip arm the
    * decoder must get right — byte 7 bits per size byte), then
    * 20 + id%30 frames at sample-rate index id%3 ([44100,48000,32000]) and
    * bitrate index 1 + id%14, each frame a valid 4-byte header plus junk
    * payload of EXACTLY the header-declared length (alternating padding
    * bit), so a decoder that miscomputes frame length desyncs and fails
    * instead of overcounting. */
  def mp3ForDoc(docId: Long): Array[Byte] = {
    val Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val Rates = Array(44100, 48000, 32000)
    val frames = (20 + docId % 30).toInt
    val srIdx = (docId % 3).toInt
    val brIdx = (1 + docId % 14).toInt
    val out = new java.io.ByteArrayOutputStream()
    // ID3v2.3 tag: 10-byte header + syncsafe-sized body (body > 127 bytes
    // so a reader treating size as plain big-endian desyncs)
    val tagBody = Array.fill(200 + (docId % 56).toInt)(0x54.toByte)
    out.write("ID3".getBytes(US_ASCII))
    out.write(3); out.write(0); out.write(0) // version 2.3.0, no flags
    out.write((tagBody.length >> 21) & 0x7f); out.write((tagBody.length >> 14) & 0x7f)
    out.write((tagBody.length >> 7) & 0x7f); out.write(tagBody.length & 0x7f)
    out.write(tagBody)
    var i = 0
    while (i < frames) {
      val padding = i % 2 // alternate the padding bit
      val len = 144 * Bitrates(brIdx) * 1000 / Rates(srIdx) + padding
      out.write(0xff)
      out.write(0xfb) // sync + MPEG1 + Layer III + no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (padding << 1))
      out.write(0xc0) // mono
      var j = 4
      while (j < len) { out.write((j * 7 + i) & 0xff); j += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** Real ISO-BMFF (MP4) box tree whose movie/track metadata are closed
    * forms of doc_id: mvhd carries timescale = 1000·(1+id%3) and duration =
    * 4000 + (id·7)%9000 ticks; tkhd carries width/height = (160+16·(id%8),
    * 96+16·(id%5)) in 16.16 fixed point; stts carries 1 + id%24 samples.
    * Every decoder arm is gate-visible: a `free` box sits between ftyp and
    * moov (unknown-box skip), a decoy SOUND track precedes the video track
    * (handler-type routing via hdlr), and the trailing mdat uses the
    * 64-bit largesize form (size==1 arm). */
  def mp4ForDoc(docId: Long): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val n = 8 + payload.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(n)
      b.putInt(n).put(typ.getBytes(US_ASCII))
      payload.foreach(b.put)
      b.array()
    }
    def be32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def be16(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(2).putShort(v.toShort).array()
    val timescale = 1000L * (1 + docId % 3)
    val duration = 4000L + (docId * 7) % 9000
    val w = 160 + 16 * (docId % 8)
    val h = 96 + 16 * (docId % 5)
    val nSamples = 1 + docId % 24
    val ftyp = box("ftyp", "isom".getBytes(US_ASCII), be32(0),
      "isom".getBytes(US_ASCII), "mp42".getBytes(US_ASCII))
    val free = box("free", Array.fill(9)(0x46.toByte))
    val mvhd = box("mvhd", be32(0), // version 0 + flags
      be32(0), be32(0), // creation, modification
      be32(timescale), be32(duration),
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      Array.fill(36)(0.toByte), // matrix (zeros acceptable for the gate)
      Array.fill(24)(0.toByte), // predefined
      be32(2)) // next track id
    def hdlr(handler: String): Array[Byte] =
      box("hdlr", be32(0), be32(0), handler.getBytes(US_ASCII),
        Array.fill(12)(0.toByte), "graft".getBytes(US_ASCII), Array[Byte](0))
    def tkhd(trackId: Long, tw: Long, th: Long): Array[Byte] =
      box("tkhd", be32(0x000003L), // version 0, flags enabled+in-movie
        be32(0), be32(0), be32(trackId), be32(0), be32(duration),
        Array.fill(8)(0.toByte), be16(0), be16(0), be16(0), be16(0),
        Array.fill(36)(0.toByte),
        be32(tw << 16), be32(th << 16)) // 16.16 fixed point
    val stts = box("stts", be32(0), be32(1), be32(nSamples), be32(100))
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(timescale),
      be32(duration), be16(0x55c4), be16(0)) // language "und"
    def mdia(handler: String, inner: Array[Byte]*): Array[Byte] =
      box("mdia", (Seq(mdhd, hdlr(handler)) ++ inner).map(identity): _*)
    // decoy audio track FIRST: zero dims, soun handler, its own stts the
    // decoder must NOT count video samples from
    val audioTrak = box("trak", tkhd(1, 0, 0),
      mdia("soun", box("minf", box("stbl",
        box("stts", be32(0), be32(1), be32(999), be32(1))))))
    val videoTrak = box("trak", tkhd(2, w, h), mdia("vide", minf))
    val moov = box("moov", mvhd, audioTrak, videoTrak)
    // mdat with the 64-bit largesize form (size == 1)
    val mdatBody = Array.fill(5 + (docId % 7).toInt)(0x4d.toByte)
    val mdat = {
      val b = java.nio.ByteBuffer.allocate(16 + mdatBody.length)
      b.putInt(1).put("mdat".getBytes(US_ASCII))
      b.putLong(16L + mdatBody.length).put(mdatBody)
      b.array()
    }
    ftyp ++ free ++ moov ++ mdat
  }

  /** GIF-variant LZW encoder (LSB-first bit packing, code width grows when
    * the just-assigned table code no longer fits, clear emitted when the
    * table fills at 4096). The matched decoder lives in
    * [[graft.multimodal.RealMedia]]; MediaCodecSpec pins the decoder
    * against a HAND-PACKED spec stream too, so an encoder/decoder pair
    * sharing a wrong width rule cannot silently agree. */
  private[graft] def gifLzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    require(data.nonEmpty && minCodeSize >= 2 && minCodeSize <= 8)
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0; var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << nBits; nBits += codeSize
      while (nBits >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    emit(clear)
    var prefix = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xff
      val key = Integer.valueOf((prefix << 8) | b)
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        emit(prefix)
        dict.put(key, Integer.valueOf(nextCode))
        if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        nextCode += 1
        if (nextCode > 4095) {
          emit(clear)
          dict.clear(); nextCode = eoi + 1; codeSize = minCodeSize + 1
        }
        prefix = b
      }
      i += 1
    }
    emit(prefix); emit(eoi)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  def htmlSpanProbePageRowFor(docId: Long, text: String, lang: String): PageRow =
    PageRow(
      url = UrlPrefix + docId,
      warc_ts = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(docId * 60)),
      html = htmlSpanProbe(text),
      text = text,
      lang = lang)

  def htmlFromText(text: String, docId: Long): Array[Byte] = {
    // odd doc_ids alternate between plain escaping (h0) and a
    // numeric-character-reference payload (h1): every vowel is written as a
    // decimal (&#97;) or hex (&#x41;) reference — mid-word, so the gate
    // proves the entity decoder emits into the CURRENT word without
    // inventing boundaries. Expected extraction is unchanged, so the
    // html_extract_roundtrip oracle needs no variant CASE.
    val esc =
      if ((docId / 2) % 2 == 1) escapeHtmlNumericVowels(text)
      else escapeHtml(text)
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

  /** Single-pass escape that additionally writes vowels as numeric
    * character references — lowercase as decimal, uppercase as hex
    * (both reference forms). One pass so entity bodies are never
    * re-escaped. */
  private def escapeHtmlNumericVowels(s: String): String = {
    val sb = new StringBuilder(s.length + 32)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c if "aeiou".indexOf(c) >= 0 => sb.append("&#").append(c.toInt).append(';')
      case c if "AEIOU".indexOf(c) >= 0 => sb.append("&#x").append(Integer.toHexString(c.toInt)).append(';')
      case c => sb.append(c)
    }
    sb.toString
  }

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
    val payload = if (isPdfDoc(docId)) pdfForDoc(docId, text) else htmlFromText(text, docId)
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
