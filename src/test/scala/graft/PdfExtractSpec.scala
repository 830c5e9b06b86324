package graft

import graft.fixtures.GoldenGen
import graft.pdf.{PdfExtract, WorkBuffers}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end extraction goldens over the deterministic fixture corpus
  * (FIXTURES.md F2/F3). Expected texts are derived from the reference's
  * assembly rules (SURVEY.md §2.2) with "\n" newlines and the default "|"
  * content delimiter. */
class PdfExtractSpec extends AnyFunSuite {

  private def readResource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/" + name)
    require(in != null, s"missing resource $name")
    try in.readAllBytes()
    finally in.close()
  }

  test("minimal hello pdf extracts Td newline + Tj + delimiter") {
    val r = PdfExtract.extract(GoldenGen.helloPdf())
    assert(r.pages == 1)
    assert(r.text == "\nHello World|")
    // no font resources on the page → the reference logs the missing font
    assert(r.error.exists(_.contains("Could not find font 'F1'.")))
    assert(r.spans.nonEmpty && r.spans.head.kind == "content")
  }

  test("multiline pdf: Td/TD/T*/Tm newline rules, TJ kerning, quote op, hex, escapes") {
    val r = PdfExtract.extract(GoldenGen.multilinePdf())
    assert(r.text == "first|\nsecond|\nkerned|quoted|sameTm|\nmovedTm|Hello|octAal (esc) line\\|")
  }

  test("double-quote operator aborts the content like the reference") {
    // the reference's '"' handler dies reading the post-skip whitespace
    // (Tokeniser.cs:1937-1990 + 2360-2461); text up to that op is kept
    val b = new GoldenGen.PdfBuilder()
    val content = b.addStream("",
      "BT (before) Tj 2 3 (dq) \" (after) Tj ET".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val pagesId = b.nextObjectNumber + 1
    val pageId = b.addObject(s"<</Type/Page /Parent $pagesId 0 R/Contents $content 0 R>>")
    b.addObject(s"<</Type/Pages /Kids[$pageId 0 R] /Count 1>>")
    val catalog = b.addObject(s"<</Type/Catalog /Pages $pagesId 0 R>>")
    val r = PdfExtract.extract(b.finish(s"/Root $catalog 0 R"))
    assert(r.text == "before|")
    assert(r.decodeFailures == 1)
  }

  test("fonts: Differences overlay + ToUnicode bfchar/bfrange + ligature packing") {
    val r = PdfExtract.extract(GoldenGen.fontsPdf())
    // base Standard; Differences: 'D'→B, 'd'→X; ToUnicode: 'A'→B, 'f'→ﬀ,
    // 'a'..'c'→x..z, 'g'→ﬃ (12-digit …69 tail), 'h'→ﬄ (12-digit …6C tail)
    assert(r.text == "Bxﬀy" + "CBX" + "ﬃﬄ" + "|")
    assert(r.error.isEmpty, r.error.getOrElse(""))
  }

  test("ligature lookahead quirk: lowercase <…006c> tail fails the font like the reference") {
    // the 12-digit ffl lookahead matches 'C' only (Tokeniser.cs:2634-2641);
    // a lowercase hex tail falls through to the too-many-digits throw even
    // though the hex value is identical. Both engines capture the throw in
    // the FONT's exception field (PdfFont.cs:122-124): the document shows a
    // decode failure and extracts with the PARTIAL overlay — bfchars parsed
    // before the throw apply (A→B, f→ﬀ, g→ﬃ), the failing <68> and the
    // never-reached bfrange ('a'..'c'→x..z) do not
    val bad = PdfExtract.extract(GoldenGen.fontsPdfWithDest("<00660066006c>"))
    assert(bad.decodeFailures == 1, s"failures=${bad.decodeFailures} err=${bad.error}")
    assert(bad.text == "Baﬀb" + "CBX" + "ﬃh" + "|", bad.text)
    // sanity: the same fixture with the uppercase tail is the happy path
    val good = PdfExtract.extract(GoldenGen.fontsPdfWithDest("<00660066006C>"))
    assert(good.decodeFailures == 0 && good.text == "Bxﬀy" + "CBX" + "ﬃﬄ" + "|")
  }

  test("MacRoman vs WinAnsi high-byte decoding") {
    // byte 0xD5 is ’ (U+2019) in MacRoman, Õ (U+00D5) in WinAnsi
    val shown = "AÕB" // raw bytes A, 0xD5, B
    val mac = PdfExtract.extract(GoldenGen.encodedFontPdf("MacRomanEncoding", shown))
    val win = PdfExtract.extract(GoldenGen.encodedFontPdf("WinAnsiEncoding", shown))
    assert(mac.text == "A’B|")
    assert(win.text == "AÕB|")
  }

  test("xref stream + compressed object stream (type-2 entries)") {
    val r = PdfExtract.extract(GoldenGen.xrefStreamPdf(predictor = false))
    assert(r.text == "xref stream works|", r.error.orNull)
    assert(r.pages == 1)
  }

  test("xref stream with PNG-Up predictor") {
    val r = PdfExtract.extract(GoldenGen.xrefStreamPdf(predictor = true))
    assert(r.text == "xref stream works|", r.error.orNull)
  }

  test("hybrid /XRefStm: extended mode resurrects table-freed objects, default errors") {
    val bytes = GoldenGen.hybridXrefPdf("hybrid payload")
    val ext = PdfExtract.extract(bytes, extendedFilters = true)
    assert(ext.text == "hybrid payload|", ext.error.orNull)
    assert(ext.pages == 1)
    // default mode replicates the reference: /XRefStm is trailer
    // bookkeeping, the hidden /Root stays a free entry -> error row
    val dft = PdfExtract.extract(bytes)
    assert(dft.error.isDefined)
    assert(dft.text == "")
  }

  test("incremental update over a hybrid section: newest wins, supplement still resurrects") {
    // update chain: newest section is a classic table REDEFINING the
    // content stream (object 1) at a new address, /Prev -> the original
    // hybrid section (whose table lists the OLD object 1 and hides 2..6
    // behind its /XRefStm). First-seen-wins must keep the new object 1
    // while the older supplement still resurrects the hidden page tree.
    val base = GoldenGen.hybridXrefPdf("old payload")
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    // the original hybrid section's classic table offset (startxref value)
    val tail = new String(base.takeRight(64).map(b => (b & 0xff).toChar))
    val prevAt = tail.split("startxref")(1).trim.split("\\s+")(0).toInt
    val newContentAt = out.size()
    val payload = "BT /F1 24 Tf (new payload) Tj ET"
    out.write(s"1 0 obj\n<</Length ${payload.length}>>stream\n$payload\nendstream\nendobj\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val tableAt = out.size()
    out.write((s"xref\n1 1\n" + f"$newContentAt%010d 00000 n \n" +
      s"trailer<</Size 7/Root 5 0 R/Prev $prevAt>>\nstartxref\n$tableAt\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val r = PdfExtract.extract(out.toByteArray, extendedFilters = true)
    assert(r.text == "new payload|", r.error.orNull)
  }

  test("chained hybrid sections: an older compat free mark never clobbers a newer supplement's live entry") {
    // the standard Acrobat shape: a hybrid incremental update OVER a hybrid
    // base. The newest section's table frees 2..6 (compatibility) and its
    // /XRefStm resurrects them; the OLDER hybrid section's table frees the
    // same ids again. Newest-wins must leave the already-live entries
    // untouched — before the fix the older free mark overwrote them with the
    // dead marker and the older supplement could not re-resurrect
    // (mayResurrect=false there), erroring the whole valid document.
    val base = GoldenGen.hybridXrefPdf("old payload")
    val baseStr = new String(base.map(b => (b & 0xff).toChar))
    val prevAt = baseStr.split("startxref")(1).trim.split("\\s+")(0).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    // the update carries its OWN supplement (object 7, uncompressed
    // /Type/XRef) re-listing the ObjStm carrier (2) and its members (3..5)
    // at their base addresses — as Acrobat writes it
    val stmAt = out.size()
    val obj2At = baseStr.indexOf("2 0 obj")
    def offRow(a: Int) = Array[Byte](1, ((a >> 16) & 0xff).toByte, ((a >> 8) & 0xff).toByte, (a & 0xff).toByte, 0)
    val rows = offRow(obj2At) ++ Array[Byte](2, 0, 0, 2, 1) ++
      Array[Byte](2, 0, 0, 2, 0) ++ Array[Byte](2, 0, 0, 2, 2)
    out.write(s"7 0 obj\n<</Type/XRef/Size 8/Index[2 4]/W[1 3 1]/Length ${rows.length}/Root 5 0 R>>stream\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(rows)
    out.write("\nendstream\nendobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val tableAt = out.size()
    out.write((s"xref\n2 5\n" + "0000000000 00000 f \n" * 5 +
      s"trailer<</Size 8/Root 5 0 R/Prev $prevAt/XRefStm $stmAt>>\nstartxref\n$tableAt\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val r = PdfExtract.extract(out.toByteArray, extendedFilters = true)
    assert(r.text == "old payload|", r.error.orNull)
    assert(r.pages == 1)
  }

  test("genuine deletion in a newer section is final: an older supplement must not resurrect it") {
    // newest classic section genuinely frees the catalog (object 5, no
    // /XRefStm of its own); the older hybrid section's table also frees 5
    // and its supplement lists it. Newest-wins: the deletion stands and the
    // document errors (the /Root is gone) — before the fix the older
    // section re-recorded 5 as freed-here (the isDead arm) and its
    // supplement resurrected the deleted catalog, extracting stale text.
    val base = GoldenGen.hybridXrefPdf("old payload")
    val baseStr = new String(base.map(b => (b & 0xff).toChar))
    val prevAt = baseStr.split("startxref")(1).trim.split("\\s+")(0).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val tableAt = out.size()
    out.write((s"xref\n5 1\n0000000000 00000 f \n" +
      s"trailer<</Size 7/Root 5 0 R/Prev $prevAt>>\nstartxref\n$tableAt\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val r = PdfExtract.extract(out.toByteArray, extendedFilters = true)
    assert(r.error.isDefined)
    assert(r.text == "")
  }

  test("malformed tolerances: junk before header, CR-only EOL, wrong /Length, trailing NULs") {
    val r = PdfExtract.extract(GoldenGen.malformedPdf())
    assert(r.text == "tolerant parse|", r.error.orNull)
    // the wrong /Length is recorded as a stream-length problem, not a failure
    assert(r.error.exists(_.contains("does not point to endstream")))
  }

  test("RC4-encrypted pdf decrypts with empty user password") {
    val r = PdfExtract.extract(GoldenGen.encryptedPdf("secret text"))
    assert(r.text == "secret text|", r.error.orNull)
  }

  test("graphics ops: inline images skipped, clip rects parsed, text intact") {
    val r = PdfExtract.extract(GoldenGen.graphicsPdf())
    assert(r.error.isEmpty, r.error)
    assert(r.text == "before|after|")
  }

  test("reference fixture: H3 Simple Text String Example.pdf") {
    val r = PdfExtract.extract(readResource("h3-sample.pdf"))
    assert(r.pages == 1)
    assert(r.text == "\n Hello World |")
    assert(r.pdfVersion.contains("1.4"))
  }

  test("reference fixture: file-sample_150kB.pdf (real-world FlateDecode, frozen golden)") {
    val r = PdfExtract.extract(readResource("file-sample-150kB.pdf"))
    assert(r.pages == 4)
    assert(r.decodeFailures == 0)
    assert(r.text.length == 6348)
    assert(r.text.startsWith("\nLorem ipsum |\nLorem ipsum dolor sit amet, consectetur adipiscing |"))
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(r.text.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    // golden captured at round 1 (M2 "captured once and frozen")
    assert(md5 == "a79c2d2ed3964fb00fd81d706a950d6f")
  }

  test("buffer reuse across documents leaves no state behind") {
    val buffers = new WorkBuffers()
    val a1 = PdfExtract.extract(GoldenGen.fontsPdf(), buffers = buffers)
    val b1 = PdfExtract.extract(GoldenGen.multilinePdf(), buffers = buffers)
    val a2 = PdfExtract.extract(GoldenGen.fontsPdf(), buffers = buffers)
    val b2 = PdfExtract.extract(GoldenGen.multilinePdf(), buffers = buffers)
    assert(a1.text == a2.text)
    assert(b1.text == b2.text)
  }

  test("inflate cap: an oversized stream becomes an error row") {
    // 2 MB of zeros deflates tiny but exceeds a 64 KB cap on inflate
    val big = new Array[Byte](2 * 1024 * 1024)
    java.util.Arrays.fill(big, 'x'.toByte)
    val b = new GoldenGen.PdfBuilder()
    val content = b.addStream("", ("BT (ok) Tj ET " + new String(big, "ISO-8859-1")).getBytes("ISO-8859-1"), deflate = true)
    val catalog = GoldenGen.catalogFor(b, Seq(content))
    val pdf = b.finish(s"/Root $catalog 0 R")
    val r = PdfExtract.extract(pdf, buffers = new WorkBuffers(maxInflateBytes = 64 * 1024))
    assert(r.decodeFailures >= 1)
    assert(r.error.exists(_.contains("buffer overflow")), r.error)
    // and with the default cap it parses fine
    val ok = PdfExtract.extract(pdf)
    assert(ok.text == "ok|")
  }

  test("AES (V4/R4) encryption becomes the reference's structured error row, not an exception") {
    // reference throw site: Tokeniser.cs:635-645 (only Standard RC4 V1-2/R2-3)
    val r = PdfExtract.extract(GoldenGen.encryptedPdfV4())
    assert(r.decodeFailures == 1)
    assert(r.error.exists(_.contains("can only decrypt pdf files using Standard encryption")), r.error)
    assert(r.text == "")
    assert(r.pages == 0)
  }

  test("pathological nesting and op-loops become error rows, not dead executors") {
    // 200k-deep nested array operand: recursion must either be handled or
    // surface as a caught error row (extract catches Throwable, incl.
    // StackOverflowError) — a crafted document must never kill the executor
    val depth = 200000
    val b = new GoldenGen.PdfBuilder()
    val ops = ("BT " + ("[" * depth) + ("]" * depth) + " (x) Tj ET").getBytes("ISO-8859-1")
    val content = b.addStream("", ops)
    val catalog = GoldenGen.catalogFor(b, Seq(content))
    val r = PdfExtract.extract(b.finish(s"/Root $catalog 0 R")) // must not throw
    // outcome: a caught StackOverflowError surfaces as a document-level
    // error row (pages=0) — the executor survives, the doc is reported
    assert(r.pages == 1 || (r.decodeFailures >= 1 && r.error.isDefined), (r.pages, r.error))
    // the reference's endless-loop guard (Tokeniser.cs:2224-2225) is live:
    // an operand-only stream (no operator ever found) terminates cleanly
    val b2 = new GoldenGen.PdfBuilder()
    val content2 = b2.addStream("", "BT (only an operand)".getBytes("ISO-8859-1"))
    val catalog2 = GoldenGen.catalogFor(b2, Seq(content2))
    val r2 = PdfExtract.extract(b2.finish(s"/Root $catalog2 0 R"))
    assert(r2.pages == 1) // error captured per-content, not thrown
  }

  test("fuzz: random byte corruption never throws (executor safety at web scale)") {
    // one bad document must never kill a 10^12-row job: every mutation of a
    // valid PDF must come back as a (possibly partial) result or error row
    val rnd = new java.util.Random(20260817L)
    val bases = Seq(GoldenGen.helloPdf(), GoldenGen.fontsPdf(), GoldenGen.multilinePdf(),
      GoldenGen.xrefStreamPdf(predictor = true), GoldenGen.encryptedPdf())
    val buffers = new WorkBuffers()
    var errorRows = 0
    (1 to 400).foreach { i =>
      val base = bases(i % bases.length)
      val mutated = base.clone()
      val nMut = 1 + rnd.nextInt(8)
      (1 to nMut).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val r = PdfExtract.extract(mutated, buffers = buffers) // must not throw
      if (r.error.isDefined) errorRows += 1
    }
    // truncations and pure garbage too
    (1 to 50).foreach { i =>
      val base = bases(i % bases.length)
      val cut = java.util.Arrays.copyOf(base, 1 + rnd.nextInt(base.length))
      PdfExtract.extract(cut, buffers = buffers)
      val junk = new Array[Byte](256); rnd.nextBytes(junk)
      PdfExtract.extract(junk, buffers = buffers)
    }
    assert(errorRows > 0, "mutations never produced an error row — fuzz too weak")
  }

  test("AES V4/R4: extended mode decrypts for real; default mode keeps the reference error row") {
    val pdf = GoldenGen.encryptedPdfAes("quarterly aes report")
    // default: the reference's exact throw surface (Tokeniser.cs:635-645)
    val ref = PdfExtract.extract(pdf)
    assert(ref.error.exists(_.contains("can only decrypt pdf files using Standard encryption")), ref.error)
    assert(ref.text == "")
    // extended: real AES-128-CBC decryption (Algorithm 2 key, sAlT object
    // keys, IV-prefixed PKCS#5 streams)
    val ext = PdfExtract.extract(pdf, extendedFilters = true)
    assert(ext.error.isEmpty, ext.error)
    assert(ext.text == "quarterly aes report|", ext.text)
    // wrong password still authenticates-or-errors, never garbage
    val wrong = PdfExtract.extract(pdf, password = "nope", extendedFilters = true)
    assert(wrong.text != "quarterly aes report|")
    assert(wrong.error.isDefined)
    // spec-valid variants: key length only in /CF/StdCF (no top-level
    // /Length), and /EncryptMetadata false (Algorithm 2 step f key suffix)
    val noLen = PdfExtract.extract(
      GoldenGen.encryptedPdfAes("stdcf length", topLevelLength = false), extendedFilters = true)
    assert(noLen.text == "stdcf length|", noLen.error)
    val noMeta = PdfExtract.extract(
      GoldenGen.encryptedPdfAes("meta off", encryptMetadata = false), extendedFilters = true)
    assert(noMeta.text == "meta off|", noMeta.error)
    // CF /Length written in BITS (the other real-world convention)
    val bits = PdfExtract.extract(
      GoldenGen.encryptedPdfAes("bits form", topLevelLength = false, cfLengthInBits = true),
      extendedFilters = true)
    assert(bits.text == "bits form|", bits.error)
  }

  test("non-pdf bytes give an error row, not an exception") {
    val r = PdfExtract.extract("this is not a pdf at all".getBytes)
    assert(r.error.isDefined)
    assert(r.text == "")
    assert(r.decodeFailures == 1)
  }

  test("isPdf classifier: prefix, embedded header, html") {
    assert(PdfExtract.isPdf(GoldenGen.helloPdf()))
    assert(PdfExtract.isPdf(GoldenGen.malformedPdf())) // header after junk
    assert(!PdfExtract.isPdf("<html><body>hi</body></html>".getBytes))
    assert(!PdfExtract.isPdf(Array.emptyByteArray))
  }

  test("synthetic multi-page pdf is deterministic and page-count exact") {
    val r1 = PdfExtract.extract(GoldenGen.syntheticPdf(seed = 7, pages = 5))
    val r2 = PdfExtract.extract(GoldenGen.syntheticPdf(seed = 7, pages = 5))
    assert(r1.pages == 5)
    assert(r1.text == r2.text)
    assert(r1.text.length > 1000)
    val r3 = PdfExtract.extract(GoldenGen.syntheticPdf(seed = 8, pages = 5))
    assert(r3.text != r1.text)
  }
}
