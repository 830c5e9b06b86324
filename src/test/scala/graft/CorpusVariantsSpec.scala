package graft

import graft.pdf.PdfExtract
import graft.pipeline.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM (no Spark) golden tests for the 9 PDF corpus variants: every
  * variant × several text shapes × both content delimiters must extract to
  * exactly [[Corpus.pdfExpectedText]] — the Scala twin of the driver gate's
  * DuckDB oracle. This is the local proof that the oracle formulas and the
  * builders agree before the sf0.01 gate runs them at scale. */
class CorpusVariantsSpec extends AnyFunSuite {

  private val texts = Seq(
    "x",                                                               // 1 chunk
    "It's quoted: 'single' and `backtick` plus (parens) \\ and ) stray end",
    ("the quick brown fox jumps over seventeen lazy dogs daily " * 3).trim,   // 3 chunks, 1 page
    ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 10).trim, // 2 pages
    ("All Work And No Play 0123456789 MAKES a Dull Page; " * 30).trim) // 3 pages, mixed case

  private def docIdFor(variant: Int): Long = variant.toLong * 2 // (id/2)%9 = variant

  for (variant <- 0 until Corpus.NumPdfVariants; (t, ti) <- texts.zipWithIndex) {
    test(s"variant $variant text#$ti round-trips byte-identically (delim '' and '|')") {
      val id = docIdFor(variant)
      assert(Corpus.pdfVariant(id) == variant)
      val payload = Corpus.pdfForDoc(id, t)
      for (delim <- Seq("", "|")) {
        val r = PdfExtract.extract(payload, contentDelimiter = delim, captureFragments = false)
        assert(r.decodeFailures == 0, s"v$variant failures: ${r.error}")
        val want = Corpus.pdfExpectedText(id, t, delim)
        assert(r.text == want,
          s"v$variant delim='$delim': got <${r.text.take(120)}> want <${want.take(120)}>")
      }
    }
  }

  for (variant <- 0 until Corpus.NumPdfVariants) {
    test(s"variant $variant metadata: version, /Info title, page count, XML metadata, /ID") {
      val t = texts(3)
      val id = docIdFor(variant)
      val r = PdfExtract.extract(Corpus.pdfForDoc(id, t), captureFragments = false)
      val wantVersion = if (variant == 4) "1.5" else "1.4"
      assert(r.pdfVersion.contains(wantVersion), s"v$variant version=${r.pdfVersion}")
      assert(r.documentInfo.contains(s"Title: doc-${t.length}; Producer: graft; "),
        s"v$variant info=${r.documentInfo}")
      assert(r.pages == Corpus.pdfPageCount(t))
      assert(r.metadata.contains(Corpus.metadataXml(t)), s"v$variant metadata=${r.metadata}")
      val h = if (variant == 3) "0123456789abcdef0123456789abcdef" else Corpus.docIdHex(t)
      assert(r.documentId.contains(s""""<$h>"; "<$h>"; """),
        s"v$variant document_id=${r.documentId}")
    }
  }

  test("variant 1 nested page tree: multi-group depth-first order over a 6-page doc") {
    val t = ("deep tree corpus page filler words repeating onward " * 60).trim // ~6 pages
    val id = docIdFor(1)
    assert(Corpus.pdfPageCount(t) >= 5, s"want >=5 pages, got ${Corpus.pdfPageCount(t)}")
    val r = PdfExtract.extract(Corpus.pdfForDoc(id, t), contentDelimiter = "", captureFragments = false)
    assert(r.decodeFailures == 0, r.error)
    assert(r.pages == Corpus.pdfPageCount(t))
    assert(r.text == Corpus.pdfExpectedText(id, t))
  }

  test("variant 2 uses the /Contents ARRAY form: two spans per full page, ligature packed") {
    val t = texts(3) // 2 pages: 8 + remainder chunks
    val chunks = (t.length + 63) / 64
    val pages = (chunks + 7) / 8
    val lastR = chunks - 8 * (pages - 1)
    val r = PdfExtract.extract(Corpus.pdfEncodedFontFromText(t),
      contentDelimiter = "", captureFragments = false)
    val wantSpans = 2 * (pages - 1) + (if (lastR > 4) 2 else 1)
    assert(r.spans.length == wantSpans, s"spans=${r.spans.length} want=$wantSpans")
    assert(r.pages == pages)
    // every LigatureMarker decodes through the <01> → <00660066> bfchar,
    // LigatureMarker3 through <02> → <006600660069>, and LigatureMarker4
    // through <03> → <00660066006C>, which the engine packs to the single
    // ﬀ / ﬃ / ﬄ codepoints (1 char : 1 char); ﬃ and ﬄ take the 12-digit
    // lookahead branch the ﬀ path never reaches, ﬄ its uppercase-'C' arm
    val want = t.replace(Corpus.LigatureMarker, 'ﬀ')
      .replace(Corpus.LigatureMarker3, 'ﬃ')
      .replace(Corpus.LigatureMarker4, 'ﬄ')
    assert(t.contains(Corpus.LigatureMarker), "test text must exercise the ligature path")
    assert(t.contains(Corpus.LigatureMarker3), "test text must exercise the 3-code ligature path")
    assert(t.contains(Corpus.LigatureMarker4), "test text must exercise the ffl arm")
    assert(r.text == want)
    assert(r.text.contains('ﬀ') && !r.text.contains(Corpus.LigatureMarker))
    assert(r.text.contains('ﬃ') && !r.text.contains(Corpus.LigatureMarker3))
    assert(r.text.contains('ﬄ') && !r.text.contains(Corpus.LigatureMarker4))
    assert(r.text.length == t.length)
    // spans tile the text in array order
    assert(r.spans.map(s => r.text.substring(s.start, s.end)).mkString == want)
  }

  test("variant 8 linearized: no EOF mark, front xref table, fallback parse round-trips") {
    val t = texts(3)
    val payload = Corpus.pdfLinearizedFromText(t)
    val hay = new String(payload.map(b => (b & 0xff).toChar))
    assert(!hay.contains("%%EOF"), "variant 8 must not carry the EOF mark (fallback trigger)")
    assert(!hay.contains("startxref"))
    assert(hay.contains("/Linearized"))
    // the front table precedes every content object
    assert(hay.indexOf("xref") < hay.indexOf("2 0 obj"))
    val r = PdfExtract.extract(payload, contentDelimiter = "", captureFragments = false)
    assert(r.decodeFailures == 0, r.error)
    assert(r.text == t)
    assert(r.pages == Corpus.pdfPageCount(t))
    assert(r.documentId.contains(s""""<${Corpus.docIdHex(t)}>"; "<${Corpus.docIdHex(t)}>"; """))
  }

  test("AES corpus: all 3 AESV2 dialects round-trip under extendedFilters; default mode = error row") {
    // dialect routing: (docId/2)%3 — 0: top-level /Length 128 + CF bytes,
    // 1: /EncryptMetadata false (different file key), 2: CF Length in bits
    for (dialect <- 0 until 3; t <- Seq(texts(0), texts(3))) {
      val docId = dialect.toLong * 2
      val payload = Corpus.pdfAesForDoc(docId, t)
      val hay = new String(payload.map(b => (b & 0xff).toChar))
      dialect match {
        case 0 => assert(hay.contains("/Length 128/CF") && !hay.contains("EncryptMetadata"))
        case 1 => assert(hay.contains("/EncryptMetadata false") && !hay.contains("/Length 128"))
        case _ => assert(hay.contains("/Length 128>>") && !hay.contains("EncryptMetadata"))
      }
      val ext = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false, extendedFilters = true)
      assert(ext.decodeFailures == 0, s"dialect $dialect: ${ext.error}")
      assert(ext.text == t, s"dialect $dialect")
      // the reference supports only the RC4 standard handler and throws on
      // V 4 (Tokeniser.cs:635-645) — default mode replicates that surface
      val default = PdfExtract.extract(payload, contentDelimiter = "", captureFragments = false)
      assert(default.decodeFailures > 0 && default.error.isDefined)
    }
    // the EncryptMetadata-false chain really derives a DIFFERENT key: its
    // payload must NOT decrypt under the default-dialect document key
    val p1 = Corpus.pdfAesForDoc(2L, texts(3)) // dialect 1
    val forged = new String(p1.map(b => (b & 0xff).toChar))
      .replace("/EncryptMetadata false", "/Length 128           ") // same byte length: offsets stay valid
    val wrongKey = PdfExtract.extract(forged.map(_.toByte).toArray,
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(wrongKey.decodeFailures > 0 || wrongKey.text != texts(3),
      "EncryptMetadata=false must change the file key")
  }

  test("hybrid /XRefStm corpus: every text shape extracts under extended mode, errors under default") {
    for ((t, ti) <- texts.zipWithIndex; docId <- Seq(0L, 2L)) { // both deflate arms
      val payload = Corpus.pdfHybridForDoc(docId, t)
      val ext = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false, extendedFilters = true)
      assert(ext.decodeFailures == 0, s"text#$ti docId=$docId: ${ext.error}")
      assert(ext.text == t, s"text#$ti docId=$docId")
      assert(ext.pages == Corpus.pdfPageCount(t), s"text#$ti docId=$docId pages")
      // reference parity: /XRefStm is trailer bookkeeping, the hidden
      // catalog stays a free entry -> structured error row, no text
      val default = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false)
      assert(default.error.isDefined && default.text == "", s"text#$ti docId=$docId default")
    }
  }

  test("owner-password-only doc: structured error row, no text, zero pages") {
    val t = texts(2)
    val r = PdfExtract.extract(Corpus.pdfOwnerOnlyFromText(t),
      contentDelimiter = "", captureFragments = false)
    assert(r.error.contains(
      "UnsupportedOperationException: owner-password authentication is not implemented"),
      s"error=${r.error}")
    assert(r.decodeFailures == 1 && r.text == "" && r.pages == 0)
  }

  test("Algorithm 7 owner-password decryption (extended mode): R2 + R3 + AESV2-R4 extract, wrong password errors") {
    val t = texts(2)
    for ((payload, label) <- Seq(
        (Corpus.pdfOwnerOnlyFromText(t), "R2"),
        (Corpus.pdfOwnerOnlyR3FromText(t), "R3"),
        (Corpus.pdfAesOwnerOnlyFromText(4L, t), "AESV2-R4"))) {
      // the owner password opens the doc in extended mode
      val ok = PdfExtract.extract(payload, password = Corpus.OwnerPassword,
        contentDelimiter = "", captureFragments = false, extendedFilters = true)
      assert(ok.decodeFailures == 0 && ok.text == t, s"$label: ${ok.error}")
      // a WRONG owner password must fall through to the reference error...
      val bad = PdfExtract.extract(payload, password = "graftwrong",
        contentDelimiter = "", captureFragments = false, extendedFilters = true)
      assert(bad.error.contains(
        "UnsupportedOperationException: owner-password authentication is not implemented"),
        s"$label wrong-password error=${bad.error}")
      assert(bad.decodeFailures == 1 && bad.text == "")
      // ...and DEFAULT mode never attempts Algorithm 7, even with the right
      // owner password: R2/R3 reach the reference's owner throw; the AESV2
      // doc never gets that far — default mode rejects V4 at the
      // Standard-encryption check (the reference's V>2 surface)
      val deflt = PdfExtract.extract(payload, password = Corpus.OwnerPassword,
        contentDelimiter = "", captureFragments = false)
      val expected = if (label == "AESV2-R4") "Standard encryption"
        else "owner-password authentication is not implemented"
      assert(deflt.error.exists(_.contains(expected)),
        s"$label default-mode error=${deflt.error}")
    }
  }

  test("V5 crypto primitives: R5 hash is a single SHA-256; R6 hardened hash differs and is deterministic") {
    import graft.pdf.PdfCrypto
    val pwd = PdfCrypto.passwordBytesV5("graftuser")
    val salt = Array.tabulate[Byte](8)(i => (i * 3 + 1).toByte)
    // R5 = SHA-256(pwd ∥ salt ∥ udata) verbatim — checked against JCE
    // directly, independent of hash2B's own code path
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(pwd); md.update(salt)
    val r5 = PdfCrypto.hash2B(pwd, salt, Array.emptyByteArray, 5)
    assert(r5.sameElements(md.digest()))
    // R6 actually runs the Algorithm-2.B loop: 32 bytes, differs from R5,
    // deterministic, and sensitive to the udata argument (the /O-side hash)
    val r6 = PdfCrypto.hash2B(pwd, salt, Array.emptyByteArray, 6)
    assert(r6.length == 32 && !r6.sameElements(r5))
    assert(r6.sameElements(PdfCrypto.hash2B(pwd, salt, Array.emptyByteArray, 6)))
    assert(!r6.sameElements(PdfCrypto.hash2B(pwd, salt, Array.fill[Byte](48)(7), 6)))
  }

  test("outline corpus: DFS depth:title walk matches the closed form; cycles and absent trees are safe") {
    import graft.fixtures.GoldenGen
    for ((t, i) <- texts.zipWithIndex) {
      val r = PdfExtract.extract(Corpus.pdfOutlineForDoc(i.toLong * 2, t),
        contentDelimiter = "", captureFragments = false)
      assert(r.decodeFailures == 0, s"text $i: ${r.error}")
      assert(r.outline.contains(Corpus.outlineExpectedText(t)), s"text $i: ${r.outline}")
      assert(r.text == t, s"text $i") // the page text is untouched by the outline
    }
    // no /Outlines → None (the common case; every other corpus builder)
    assert(PdfExtract.extract(Corpus.pdfFromText(texts(0)),
      contentDelimiter = "", captureFragments = false).outline.isEmpty)
    // a CYCLIC Next chain must terminate via the visited guard, not hang
    val b = new GoldenGen.PdfBuilder()
    val cid = b.addStream("", "BT (x) Tj ET".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val r0 = b.nextObjectNumber
    b.addObject(s"<</Type/Outlines/First ${r0 + 1} 0 R/Last ${r0 + 2} 0 R/Count 2>>")
    b.addObject(s"<</Title (a)/Parent $r0 0 R/Next ${r0 + 2} 0 R>>")
    b.addObject(s"<</Title (b)/Parent $r0 0 R/Next ${r0 + 1} 0 R>>") // cycle back to a
    val catalog = GoldenGen.catalogFor(b, Seq(cid), catalogExtra = s"/Outlines $r0 0 R")
    val cyc = PdfExtract.extract(b.finish(s"/Root $catalog 0 R"),
      contentDelimiter = "", captureFragments = false)
    assert(cyc.outline.contains("0:a|0:b"), cyc.outline)
  }

  test("encrypted outline: extended mode decrypts titles with the containing-object key; default keeps the reference crash surface") {
    import graft.fixtures.GoldenGen
    import graft.pdf.{ObjectId, PdfCrypto}
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // V1/R2 empty-password chain, like variant 3
    val docIdHex = "0123456789abcdef0123456789abcdef"
    val docId = docIdHex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val ownerHash = PdfCrypto.md5(PdfCrypto.pad(""))
    val o = PdfCrypto.rc4(java.util.Arrays.copyOf(ownerHash, 5), PdfCrypto.pad(""))
    val key = PdfCrypto.computeEncryptionKey(PdfCrypto.pad(""), o, -44, docId, 5)
    val u = PdfCrypto.computeEncryptU(PdfCrypto.pad(""), docId, key)
    val b = new GoldenGen.PdfBuilder()
    val cid = b.addStream("", "BT (body) Tj ET".getBytes(ISO_8859_1), encryptKey = key)
    val title = "chapter-one"
    def cipher(id: Int): Array[Byte] = {
      val d = title.getBytes(ISO_8859_1)
      PdfCrypto.rc4InPlace(PdfCrypto.objectKey(key, ObjectId(id, 0)), d, 0, d.length)
      d
    }
    // shift ids until the ciphertext is escape-free (variant 3's trick:
    // the reference decrypts the RAW literal form, so no ()\ allowed)
    var r = b.nextObjectNumber
    var tries = 0
    while (cipher(r + 1).exists(x => x == 0x28 || x == 0x29 || x == 0x5c)) {
      b.addObject("<</Type/GraftPad>>")
      r = b.nextObjectNumber
      tries += 1
      assert(tries < 64)
    }
    b.addObject(s"<</Type/Outlines/First ${r + 1} 0 R/Last ${r + 1} 0 R/Count 1>>")
    val raw = new String(cipher(r + 1).map(x => (x & 0xff).toChar))
    b.addObject(s"<</Title ($raw)/Parent $r 0 R>>")
    val catalog = GoldenGen.catalogFor(b, Seq(cid), catalogExtra = s"/Outlines $r 0 R")
    val encId = b.addObject(
      s"<</Filter/Standard/V 1/R 2/P -44/O <${o.map(x => f"${x & 0xff}%02x").mkString}>" +
        s"/U <${u.map(x => f"${x & 0xff}%02x").mkString}>>>")
    val pdf = b.finish(s"/Root $catalog 0 R/Encrypt $encId 0 R/ID[<$docIdHex><$docIdHex>]")
    // extended mode: nested strings decrypt with the CONTAINING object's
    // key (ISO 32000-1 §7.6.2) — the outline extracts decrypted
    val ext = PdfExtract.extract(pdf, contentDelimiter = "", captureFragments = false,
      extendedFilters = true)
    assert(ext.text == "body", ext.error)
    assert(ext.outline.contains("0:" + title), ext.outline)
    // default mode: the reference's nested-string decrypt crash surface
    // (Token.cs:269) is kept — the walk degrades to None, page text intact
    val dft = PdfExtract.extract(pdf, contentDelimiter = "", captureFragments = false)
    assert(dft.text == "body", dft.error)
    assert(dft.outline.isEmpty, dft.outline)
  }

  test("annotations corpus: FreeText contents + Link URIs per page; plain docs expose none") {
    for ((t, i) <- texts.zipWithIndex) {
      val docId = i.toLong * 2
      val r = PdfExtract.extract(Corpus.pdfAnnotsForDoc(docId, t),
        contentDelimiter = "", captureFragments = false)
      assert(r.decodeFailures == 0, s"text $i: ${r.error}")
      assert(r.text == t, s"text $i") // page text untouched
      val p = Corpus.pdfPageCount(t)
      val want = (1 to p).flatMap { page =>
        Seq((page, "FreeText", s"note-$page-${t.length}"),
          (page, "Link", s"https://ann${docId % 5}.example/p$page"))
      }
      assert(r.annotations == want, s"text $i: ${r.annotations}")
    }
    assert(PdfExtract.extract(Corpus.pdfFromText(texts(0)),
      contentDelimiter = "", captureFragments = false).annotations.isEmpty)
  }

  test("annotation text-string semantics: hex UTF-16BE, escapes, Link URI precedence") {
    import graft.fixtures.GoldenGen
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val b = new GoldenGen.PdfBuilder()
    val cid = b.addStream("", "BT (body) Tj ET".getBytes(ISO_8859_1))
    val annots =
      // UTF-16BE hex /Contents with BOM: <FEFF 0041 00E9> = "Aé"
      "<</Subtype/FreeText/Contents <FEFF004100E9>>>" +
        // literal escapes resolve: \( \) \\ \n and octal \101 = 'A'
        "<</Subtype/Text/Contents (a\\(b\\)\\\\c\\n\\101)>>" +
        // a Link with BOTH alternate text and a URI: the URI must win
        "<</Subtype/Link/Contents (see website)/A<</S/URI/URI (https://u.example/x)>>>>"
    val catalog = GoldenGen.catalogFor(b, Seq(cid), pageExtra = _ => s"/Annots[$annots]")
    val r = PdfExtract.extract(b.finish(s"/Root $catalog 0 R"),
      contentDelimiter = "", captureFragments = false)
    assert(r.text == "body", r.error)
    assert(r.annotations == Seq(
      (1, "FreeText", "Aé"),
      (1, "Text", "a(b)\\c\nA"),
      (1, "Link", "https://u.example/x")), r.annotations)
  }

  test("attachments corpus: name-tree walk decodes all three payloads; forms corpus: dotted-name DFS") {
    for ((t, i) <- texts.zipWithIndex) {
      val r = PdfExtract.extract(Corpus.pdfAttachmentsForDoc(i.toLong * 2, t),
        contentDelimiter = "", captureFragments = false, captureAttachments = true)
      assert(r.decodeFailures == 0, s"text $i: ${r.error}")
      assert(r.text == t, s"text $i") // page text untouched
      val atts = r.attachments
      assert(atts.map(_._1) == Seq("att-0.txt", "att-1.bin", "att-2.txt"), atts.map(_._1))
      assert(new String(atts(0)._2, "ISO-8859-1") == t)                                   // Flate
      assert(new String(atts(1)._2, "ISO-8859-1") == new StringBuilder(t).reverse.toString) // Flate
      assert(new String(atts(2)._2, "ISO-8859-1") == t.toUpperCase)                        // unfiltered

      val f = PdfExtract.extract(Corpus.pdfFormFieldsForDoc(i.toLong * 2, t),
        contentDelimiter = "", captureFragments = false)
      assert(f.decodeFailures == 0, s"text $i: ${f.error}")
      assert(f.formFields.contains(Corpus.formFieldsExpectedText(t)), f.formFields)
      assert(f.text == t, s"text $i")
    }
    // plain docs expose neither surface
    val none = PdfExtract.extract(Corpus.pdfFromText(texts(0)),
      contentDelimiter = "", captureFragments = false, captureAttachments = true)
    assert(none.attachments.isEmpty && none.formFields.isEmpty)
    // attachment decoding is opt-in: the bulk pipeline never pays the
    // inflate + payload copy for attachments it doesn't read
    val off = PdfExtract.extract(Corpus.pdfAttachmentsForDoc(0L, texts(0)),
      contentDelimiter = "", captureFragments = false)
    assert(off.attachments.isEmpty && off.text == texts(0))
  }

  test("review fixes: malformed additive structures never cost page text; non-Identity Type0 keeps the overlay; CID overflow throws; surrogate passthrough is replaced") {
    import graft.fixtures.GoldenGen
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // a dangling /Outlines ref (and /AcroForm, /Names) must degrade that
    // surface only — the page text extracts exactly as the reference would
    val b1 = new GoldenGen.PdfBuilder()
    val c1 = b1.addStream("", "BT (kept text) Tj ET".getBytes(ISO_8859_1))
    val cat1 = GoldenGen.catalogFor(b1, Seq(c1),
      catalogExtra = "/Outlines 99 0 R/AcroForm 98 0 R/Names<</EmbeddedFiles 97 0 R>>")
    val broken = PdfExtract.extract(b1.finish(s"/Root $cat1 0 R"),
      contentDelimiter = "", captureFragments = false, captureAttachments = true)
    assert(broken.text == "kept text", broken.error)
    assert(broken.outline.isEmpty && broken.formFields.isEmpty && broken.attachments.isEmpty)

    def fontDoc(fontBody: String, cmap: String, ops: String): Array[Byte] = {
      val b = new GoldenGen.PdfBuilder()
      val cmapId = b.addStream("", cmap.getBytes(ISO_8859_1))
      val fid = b.addObject(s"<<$fontBody/ToUnicode $cmapId 0 R>>")
      val cid = b.addStream("", ops.getBytes(ISO_8859_1))
      val cat = GoldenGen.catalogFor(b, Seq(cid), fontObj = Some(("F1", fid)))
      b.finish(s"/Root $cat 0 R")
    }
    val overlayCmap =
      "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfchar\n<41> <0042>\nendbfchar\nendcmap"
    // a NON-Identity Type0 font (here: no /Encoding key — a predefined-CMap
    // name would fail the 8-bit table lookup in both modes, faithfully)
    // must keep the default overlay path in extended mode, not be silently
    // routed to the CID parse its decode never consults
    val nonIdentity = PdfExtract.extract(
      fontDoc("/Type/Font/Subtype/Type0", overlayCmap, "BT /F1 10 Tf (A) Tj ET"),
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(nonIdentity.text == "B", nonIdentity.text)

    // a 9-digit CID would wrap the Int back into range: must throw into the
    // font exception (decode failure), never silently poison the map
    val overflowCmap =
      "begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "1 beginbfchar\n<100000000> <0041>\nendbfchar\nendcmap"
    val overflow = PdfExtract.extract(
      fontDoc("/Type/Font/Subtype/Type0/Encoding/Identity-H", overflowCmap, "BT /F1 10 Tf <0041> Tj ET"),
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(overflow.decodeFailures >= 1)

    // unmapped surrogate-range CIDs pass through as U+FFFD, keeping the
    // text a valid UTF-16 string
    val idCmap =
      "begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\nendcmap"
    val sur = PdfExtract.extract(
      fontDoc("/Type/Font/Subtype/Type0/Encoding/Identity-H", idCmap, "BT /F1 10 Tf <D800 0041> Tj ET"),
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(sur.text == "�A", sur.text.map(_.toInt).mkString(","))
  }

  test("Type0/Identity-H corpus: extended mode decodes 2-byte CIDs through the full CMap; default mode keeps the reference surface") {
    for ((t, i) <- texts.zipWithIndex) {
      val docId = i.toLong * 2
      val payload = Corpus.pdfType0ForDoc(docId, t)
      val hay = new String(payload.map(b => (b & 0xff).toChar))
      assert(hay.contains("/Subtype/Type0") && hay.contains("/Encoding/Identity-H")
        && hay.contains("/Subtype/CIDFontType2"))
      // extended: the full-CMap decode — multi-char "ff" target for 'e',
      // surrogate-pair U+1F600 for 't', bfrange above 0xFF for the rest
      val ext = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false, extendedFilters = true)
      assert(ext.decodeFailures == 0, s"text $i: ${ext.error}")
      assert(ext.text == Corpus.type0ExpectedText(t), s"text $i")
      // default mode: the reference parses the CMap but its readers cap
      // CIDs at 2 hex digits and its decode never consults entries above
      // 0xFF — the document "extracts", but not to the real text (and it
      // must be an error-free-or-error-row surface, never a throw)
      val default = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false)
      assert(default.text != Corpus.type0ExpectedText(t) || t.isEmpty, s"text $i")
    }
    // the expected-text twin matches the SQL oracle's replace chain shape
    assert(Corpus.type0ExpectedText("tests") == "😀ff" + "s" + "😀" + "s")
  }

  test("Type0 decode details: Identity passthrough, odd-length strings, bfrange array form") {
    import graft.fixtures.GoldenGen
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // passthrough: a char outside the CMap (here U+00E9 é, written as its
    // own codepoint with no entry) decodes to itself
    val pass = PdfExtract.extract(Corpus.pdfType0ForDoc(0L, "café bar"),
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(pass.text == Corpus.type0ExpectedText("café bar"))

    // hand-built doc: odd-length hex string (lone trailing byte zero-pads
    // into the high byte) and the bfrange ARRAY-destination form
    def doc(ops: String, cmap: String): Array[Byte] = {
      val b = new GoldenGen.PdfBuilder()
      val cmapId = b.addStream("", cmap.getBytes(ISO_8859_1), deflate = false)
      val fid = b.addObject(s"<</Type/Font/Subtype/Type0/Encoding/Identity-H/ToUnicode $cmapId 0 R>>")
      val cid = b.addStream("", ops.getBytes(ISO_8859_1), deflate = false)
      val catalog = GoldenGen.catalogFor(b, Seq(cid), fontObj = Some(("F1", fid)))
      b.finish(s"/Root $catalog 0 R")
    }
    val arrayCmap =
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0041> <0042> [<005A0059> <0058>]
        |endbfrange
        |endcmap""".stripMargin
    // <0041> → "ZY", <0042> → "X" via the array form; trailing lone byte
    // 0x41 zero-pads to cid 0x4100 → unmapped → passthrough char U+4100
    val r = PdfExtract.extract(doc("BT /F1 10 Tf <0041004241> Tj ET", arrayCmap),
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(r.decodeFailures == 0, r.error)
    assert(r.text == "ZYX\u4100", r.text)
    // literal-string arm: same codes as escaped bytes (\000A = 0x00 0x41)
    val r2 = PdfExtract.extract(doc("BT /F1 10 Tf (\\000A\\000B) Tj ET", arrayCmap),
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(r2.text == "ZYX", r2.text)
  }

  test("AES-256 corpus: R6 / R5 / EncryptMetadata-false dialects round-trip; wrong password + default mode error") {
    // dialect routing: (docId/2)%3 — 0: R6 (hardened Algorithm-2.B hash),
    // 1: deprecated R5 (single SHA-256), 2: R6 + /EncryptMetadata false
    for (dialect <- 0 until 3; t <- Seq(texts(0), texts(3))) {
      val docId = dialect.toLong * 2
      val payload = Corpus.pdfAes256ForDoc(docId, t)
      val hay = new String(payload.map(b => (b & 0xff).toChar))
      assert(hay.contains("/V 5") && hay.contains("/CFM/AESV3") && hay.contains("/Perms <"))
      dialect match {
        case 0 => assert(hay.contains("/R 6") && !hay.contains("EncryptMetadata"))
        case 1 => assert(hay.contains("/R 5"))
        case _ => assert(hay.contains("/R 6") && hay.contains("/EncryptMetadata false"))
      }
      // empty USER password opens it in extended mode
      val ext = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false, extendedFilters = true)
      assert(ext.decodeFailures == 0, s"dialect $dialect: ${ext.error}")
      assert(ext.text == t, s"dialect $dialect")
      // the bundle's OWNER password opens the same doc via Algorithm 12
      val owner = PdfExtract.extract(payload, password = Corpus.OwnerPassword,
        contentDelimiter = "", captureFragments = false, extendedFilters = true)
      assert(owner.decodeFailures == 0 && owner.text == t, s"dialect $dialect owner: ${owner.error}")
      // a wrong password fails BOTH Algorithm 11 and 12
      val bad = PdfExtract.extract(payload, password = "graftwrong",
        contentDelimiter = "", captureFragments = false, extendedFilters = true)
      assert(bad.error.exists(_.contains("invalid user or owner password for AES-256")),
        s"dialect $dialect wrong-password error=${bad.error}")
      // default mode rejects V5 at the reference's Standard-encryption check
      val default = PdfExtract.extract(payload, contentDelimiter = "", captureFragments = false)
      assert(default.decodeFailures > 0 &&
        default.error.exists(_.contains("Standard encryption")), s"dialect $dialect: ${default.error}")
    }
    // Algorithm 13: a tampered /Perms capsule must be rejected, not honored
    val p = Corpus.pdfAes256ForDoc(0L, texts(3))
    val hay = new String(p.map(b => (b & 0xff).toChar))
    val at = hay.indexOf("/Perms <") + "/Perms <".length
    val flipped = hay.updated(at, if (hay(at) == '0') '1' else '0') // same length: offsets stay valid
    val tampered = PdfExtract.extract(flipped.map(_.toByte).toArray,
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(tampered.error.exists(_.contains("/Perms does not validate")),
      s"tampered-Perms error=${tampered.error}")
  }

  test("AES-256 owner-only (Algorithm 12): owner password opens, empty/user path fails, default mode rejects V5") {
    val t = texts(2)
    val payload = Corpus.pdfAes256OwnerOnlyFromText(6L, t)
    val ok = PdfExtract.extract(payload, password = Corpus.OwnerPassword,
      contentDelimiter = "", captureFragments = false, extendedFilters = true)
    assert(ok.decodeFailures == 0 && ok.text == t, s"owner: ${ok.error}")
    // the user password is "graftuser", never handed out — the empty
    // password fails Algorithm 11 AND Algorithm 12
    val empty = PdfExtract.extract(payload, contentDelimiter = "",
      captureFragments = false, extendedFilters = true)
    assert(empty.error.exists(_.contains("invalid user or owner password for AES-256")),
      s"empty-password error=${empty.error}")
    val deflt = PdfExtract.extract(payload, password = Corpus.OwnerPassword,
      contentDelimiter = "", captureFragments = false)
    assert(deflt.error.exists(_.contains("Standard encryption")),
      s"default-mode error=${deflt.error}")
  }

  test("extended-filter corpus: all 4 encodings round-trip under extendedFilters; default mode errors") {
    val t = texts(3)
    for (route <- 0 until 4) {
      val id = route.toLong * 2
      val payload = Corpus.pdfExtendedForDoc(id, t)
      val ext = PdfExtract.extract(payload, contentDelimiter = "",
        captureFragments = false, extendedFilters = true)
      assert(ext.decodeFailures == 0, s"route $route: ${ext.error}")
      assert(ext.text == t, s"route $route")
      // default mode replicates the reference: None/FlateDecode only
      val default = PdfExtract.extract(payload, contentDelimiter = "", captureFragments = false)
      assert(default.decodeFailures > 0, s"route $route should fail in default mode")
    }
  }

  test("extract is pure: the same encrypted payload extracts identically twice") {
    // regression: RC4 stream decryption used to mutate the caller's array in
    // place, so a second extract double-decrypted into garbage
    val t = texts(3)
    val payload = Corpus.pdfEncryptedFromText(t)
    val before = payload.clone()
    val r1 = PdfExtract.extract(payload, contentDelimiter = "", captureFragments = false)
    val r2 = PdfExtract.extract(payload, contentDelimiter = "", captureFragments = false)
    assert(r1.text == t && r2.text == t)
    assert(java.util.Arrays.equals(payload, before), "extract mutated its input")
  }

  test("html h1 variant: numeric character references decode mid-word to the same text") {
    import graft.html.Boilerplate
    val t = "An AEIOU vowel heavy sentence indeed with Upper And lower cases"
    val h0 = Boilerplate.extract(Boilerplate.decode(Corpus.htmlFromText(t, 1L))).text  // 1/2=0 -> h0
    val h1 = Boilerplate.extract(Boilerplate.decode(Corpus.htmlFromText(t, 3L))).text  // 3/2=1 -> h1
    assert(h0 == t)
    assert(h1 == t)
    // and the payloads really differ (h1 carries &#…; references)
    assert(new String(Corpus.htmlFromText(t, 3L), "UTF-8").contains("&#"))
  }

  test("property: random printable-ASCII texts round-trip through every variant") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val textGen = for {
      n <- Gen.chooseNum(1, 1200)
      cs <- Gen.listOfN(n, Gen.chooseNum(0x20, 0x7e).map(_.toChar))
    } yield cs.mkString
    val prop = Prop.forAll(textGen, Gen.chooseNum(0, Corpus.NumPdfVariants - 1)) {
      (t0: String, v: Int) =>
        // builders assume non-empty shown text; trim can empty a
        // whitespace-only draw — normalize to one visible char then
        val t = if (t0.trim.isEmpty) "x" else t0
        val id = v.toLong * 2
        val r = PdfExtract.extract(Corpus.pdfForDoc(id, t),
          contentDelimiter = "", captureFragments = false)
        val ok = r.decodeFailures == 0 && r.text == Corpus.pdfExpectedText(id, t)
        if (!ok) println(s"FAIL v=$v len=${t.length} err=${r.error} got=<${r.text.take(80)}>")
        ok
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(150)
      .withInitialSeed(org.scalacheck.rng.Seed(1337L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("fuzz: corrupted variant payloads never throw (executor safety per variant)") {
    // every file-layout variant (encrypted, ObjStm, predictor, /Prev chain,
    // nested trees, /Contents arrays) must degrade to a result/error row
    // under random corruption — one bad doc must never kill an executor
    val rnd = new java.util.Random(20260817L)
    val t = ("fuzz base corpus words repeated for a couple of pages worth " * 12).trim
    val bases = (0 until Corpus.NumPdfVariants).map(v => Corpus.pdfForDoc(v.toLong * 2, t)) ++
      // the structure-surface builders: corrupted outlines / name trees /
      // form fields must degrade (surface null or error row), never throw
      Seq(Corpus.pdfOutlineForDoc(0L, t), Corpus.pdfAttachmentsForDoc(0L, t),
        Corpus.pdfFormFieldsForDoc(0L, t), Corpus.pdfType0ForDoc(0L, t))
    var errorRows = 0
    (1 to 320).foreach { i =>
      val mutated = bases(i % bases.length).clone()
      (1 to 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      // alternate extended mode so the CID-decode and extended-filter
      // paths fuzz too; captureAttachments exercises the name-tree walk
      val r = PdfExtract.extract(mutated, captureFragments = false,
        extendedFilters = i % 2 == 0, captureAttachments = true) // must not throw
      if (r.error.isDefined) errorRows += 1
    }
    (1 to 40).foreach { i =>
      val base = bases(i % bases.length)
      val cut = 1 + rnd.nextInt(base.length - 1)
      PdfExtract.extract(java.util.Arrays.copyOf(base, cut), captureFragments = false)
    }
    assert(errorRows > 0, "mutations never produced an error row — fuzz too weak")
  }

  test("fidelity: wrong /Length whose cut lands before '%' truncates (comment-skip validates it)") {
    // PDF whitespace skipping eats %-comments; the wrong-length check runs
    // skipWhiteSpace() before testing for `endstream`
    // (reference: Tokeniser.cs:1538-1560 + 1655), so a file cut at "BT (x"
    // with "%) Tj ET\n" following comment-skips straight onto `endstream`
    // and accepts the bogus length — the content loses its ET in BOTH
    // engines. Replicated behavior; the corpus generator must (and does)
    // avoid planting such cuts.
    import graft.fixtures.GoldenGen
    val b = new GoldenGen.PdfBuilder()
    val content = b.addStream("", "BT (x%) Tj ET".getBytes("ISO-8859-1"), lengthOverride = 5)
    val catalog = GoldenGen.catalogFor(b, Seq(content))
    val r = PdfExtract.extract(b.finish(s"/Root $catalog 0 R"), captureFragments = false)
    // the truncation surfaces on the captured per-content error channel (the
    // reference records it the same way) and the shown string is lost
    assert(r.error.exists(_.contains("'ET' still missing")), s"error=${r.error}")
    assert(!r.text.contains("x%"), s"text=<${r.text}>")
  }

  test("variant spread: even doc_ids cycle through all builders") {
    val n = Corpus.NumPdfVariants
    assert((0L until 2L * n by 2).map(Corpus.pdfVariant).toSet == (0 until n).toSet)
  }

  test("generatorFingerprint: deterministic, classfile-derived; digestOf separates byte changes") {
    val f1 = Corpus.generatorFingerprint
    assert(f1.length == 16 && f1.matches("[0-9a-f]+"), s"fingerprint: $f1")
    assert(f1 == Corpus.generatorFingerprint) // stable across calls
    // the underlying digest is byte-sensitive: any classfile change moves it
    assert(Corpus.digestOf(Iterator(Array[Byte](1, 2, 3))) !=
      Corpus.digestOf(Iterator(Array[Byte](1, 2, 4))))
    assert(Corpus.digestOf(Iterator(Array[Byte](1), Array[Byte](2))) ==
      Corpus.digestOf(Iterator(Array[Byte](1, 2)))) // stream-order digest, chunking-invariant
    // NESTED classes must be digested: the actual PDF byte writer is
    // GoldenGen$PdfBuilder.class, a SEPARATE classfile from GoldenGen$.class
    // — a fingerprint that missed it would serve a stale cached corpus after
    // a PdfBuilder edit, the exact failure the mechanism exists to stop
    val names = Corpus.generatorClassfiles.map(_._1)
    assert(names.contains("graft.fixtures.GoldenGen$PdfBuilder"), names.mkString(", "))
    assert(names.contains("graft.pipeline.Corpus$"), names.mkString(", "))
    assert(names.exists(_.startsWith("graft.pdf.ExtraFilters")), names.mkString(", "))
    assert(names == names.sorted && names.distinct == names) // deterministic digest input
  }

  test("variant 6: each truncation of the 3-section chain yields its section's page") {
    // sanity that the incremental fixture actually tests something: the full
    // file (three xref sections, /Prev-chained B -> A -> original) extracts
    // the real text; truncating after the SECOND %%EOF (dropping update B)
    // yields the second-revision stale page; truncating after the FIRST
    // %%EOF (original section only) yields the first stale page
    val t = texts(2)
    val full = Corpus.pdfIncrementalFromText(t)
    val r = PdfExtract.extract(full, contentDelimiter = "", captureFragments = false)
    assert(!r.text.contains("stale"), r.text.take(120))
    assert(r.text == Corpus.pdfExpectedText(docIdFor(6), t))
    val hay = new String(full.map(b => (b & 0xff).toChar))
    val cut1 = hay.indexOf("%%EOF") + "%%EOF\n".length
    val cut2 = hay.indexOf("%%EOF", cut1) + "%%EOF\n".length
    assert(hay.indexOf("%%EOF", cut2) >= 0, "expected a third %%EOF (three sections)")
    val r1 = PdfExtract.extract(java.util.Arrays.copyOf(full, cut1),
      contentDelimiter = "", captureFragments = false)
    assert(r1.text.contains("stale first page content"), r1.text.take(120))
    val r2 = PdfExtract.extract(java.util.Arrays.copyOf(full, cut2),
      contentDelimiter = "", captureFragments = false)
    assert(r2.text.contains("stale second revision"), r2.text.take(120))
    assert(!r2.text.contains("stale first page content"), r2.text.take(120))
  }
}
