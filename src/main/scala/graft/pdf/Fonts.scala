package graft.pdf

import scala.collection.mutable

object PdfFontType extends Enumeration {
  val None0, Type0, Type1, MMType1, Type3, TrueType, CIDFontType0, CIDFontType2 = Value
  /** reference: PdfParser/PdfFontType.cs:38-49 */
  def fromName(s: String): Value = s match {
    case "Type0"        => Type0
    case "Type1"        => Type1
    case "MMType1"      => MMType1
    case "Type3"        => Type3
    case "TrueType"     => TrueType
    case "CIDFontType0" => CIDFontType0
    case "CIDFontType2" => CIDFontType2
    case _              => None0
  }
}

/** Font decode setup: Subtype, base-encoding selection, /Differences overlay,
  * /ToUnicode CMap overlay — all failure modes captured in `exception`, never
  * thrown out (reference: PdfParser/PdfFont.cs:30-126).
  *
  * Quirks reproduced deliberately:
  *  - only Type1 seeds a StandardEncoding table (PdfFont.cs:56-58);
  *  - a /Differences glyph name missing from the Adobe map skips TWO slots —
  *    the reference's `Encoding8Bit![charIndex++]` bumps the index before the
  *    lookup throws, and its catch bumps again (PdfFont.cs:82-90);
  *  - /Differences with no base table silently drops every named glyph the
  *    same double-bump way, while a `uniXXXX` entry rethrows and kills the
  *    font (PdfFont.cs:71-78);
  *  - the local shadowing bug leaves the `EncodingName` field null
  *    (PdfFont.cs:101).
  */
final class PdfFont(tk: PdfTokeniser, token: PdfTok) {
  val objectId: Option[ObjectId] = token.objectId
  var fontType: PdfFontType.Value = PdfFontType.None0
  var baseFont: String = null
  val encodingName: String = null
  var isIdentity: Boolean = false
  var encoding8Bit: Array[Char] = null
  var toUnicodeHeader: String = null
  var fontDescriptor: PdfTok = null
  var cMap: mutable.TreeMap[Int, Char] = null
  /** EXTENSION (extended mode, Type0 fonts only): full CID → text map from
    * the ToUnicode CMap — 4-hex-digit source CIDs, arbitrary-length UTF-16BE
    * destinations kept verbatim (no ligature packing). The reference parses
    * ToUnicode into `CMap` but never consults entries above 0xFF during
    * content decoding (PdfFont.cs:40 is written, never read;
    * Tokeniser.cs:2464-2472 maps single BYTES through Encoding8Bit), so
    * composite Identity-H fonts — what every modern PDF writer emits —
    * extract garbage in default mode. */
  var cidToText: mutable.TreeMap[Int, String] = null
  var exception: String = null

  /** True when extended-mode content decoding must read 2-BYTE codes and map
    * them through [[cidToText]] (Identity passthrough for unmapped CIDs):
    * a Type0 font with an Identity-H/V encoding under `extendedFilters`. */
  def isCidKeyed: Boolean =
    tk.extendedFilters && fontType == PdfFontType.Type0 && isIdentity

  token.pdfObject = this

  try {
    val dict = token.asInstanceOf[DictTok]
    dict.getName("Subtype").foreach { subtype =>
      fontType = PdfFontType.fromName(subtype)
      if (fontType == PdfFontType.Type1) encoding8Bit = Encodings.Standard.clone()
    }
    dict.getName("BaseFont").foreach(baseFont = _)

    dict.get("Encoding").foreach {
      case encodingDict: DictTok =>
        encodingDict.getArray("Differences").foreach { differences =>
          var charIndex = Int.MinValue
          differences.iterator.foreach {
            case n: NumTok =>
              charIndex = n.integer.get
            case name: NameTok =>
              val charName = name.value
              if (charName.length >= 3 && charName.substring(0, 3).equalsIgnoreCase("uni")) {
                // parse failure or a missing base table rethrows out of the
                // font ctor (reference: PdfFont.cs:72-78)
                val ch = Integer.parseInt(charName.substring(3), 16).toChar
                val slot = charIndex; charIndex += 1
                encoding8Bit(slot) = ch
              } else {
                // the index is consumed even when the glyph lookup (or the
                // null table) fails, and the failure path consumes one more
                // (reference: PdfFont.cs:82-90)
                val slot = charIndex; charIndex += 1
                try encoding8Bit(slot) = Encodings.Chars(charName)
                catch { case _: Exception => charIndex += 1 }
              }
            case _ =>
          }
        }
      case encodingNameTok: NameTok =>
        val name = encodingNameTok.value
        if (name.contains("Identity")) isIdentity = true
        else encoding8Bit = Encodings.encoding8Bit(name)
      case _ =>
    }

    dict.get("FontDescriptor").foreach(fontDescriptor = _)
    dict.getDictionary("ToUnicode") match {
      case Some(toUnicodeStream) =>
        if (isCidKeyed) {
          // EXTENSION: composite Identity fonts get the full-CID parse; the
          // 8-bit table is never consulted for them (see isCidKeyed). A
          // Type0 font with a predefined (non-Identity) CMap keeps the
          // default overlay path — its decode reads encoding8Bit, so
          // routing it here would silently drop the mapping.
          applyToUnicodeCid(toUnicodeStream)
        } else {
          if (encoding8Bit == null) encoding8Bit = Encodings.Standard.clone()
          applyToUnicode(toUnicodeStream)
        }
      case None =>
    }
  } catch {
    case e: Exception =>
      exception = (if (exception == null) "" else exception) + describe(e) + "\n"
  }

  private def describe(e: Exception): String =
    e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse("")

  /** bfchar/bfrange overlay onto the 256-entry table; duplicate cid entries
    * abort the overlay exactly like the reference's `SortedDictionary.Add`
    * (reference: PdfParser/PdfEncodings.cs:1133-1195). */
  private def applyToUnicode(toUnicodeStream: DictTok): Unit = {
    val t = toUnicodeStream.loadStream()
    if (t.getStreamOpCode("begincmap") == null)
      throw t.streamException("ToUnicode stream is missing 'begincmap'.")
    t.setStreamMark()
    if (t.getStreamOpCode("endcodespacerange") == null)
      throw t.streamException("ToUnicode stream is missing 'endcodespacerange'.")
    toUnicodeHeader = t.getStreamMarkedText()
    cMap = mutable.TreeMap.empty[Int, Char]
    def cMapAdd(cid: Int, ch: Char): Unit = {
      if (cMap.contains(cid)) throw t.streamException(s"ToUnicode defines the same cid '$cid' twice.")
      cMap(cid) = ch
    }
    var done = false
    while (!done) {
      val opCode = t.getStreamOpCode()
      if (opCode == null) throw t.streamException("ToUnicode stream incomplete.")
      opCode match {
        case "beginbfchar" =>
          t.startStreamArgumentReading()
          val linesCount = t.getStreamInt()
          t.endStreamArgumentReading()
          var i = 0
          while (i < linesCount) {
            val cid = t.getStreamCid()
            val unicodeChar = t.getStreamUnicode().toChar
            encoding8Bit(cid) = unicodeChar
            cMapAdd(cid, unicodeChar)
            i += 1
          }
          if (t.getStreamOpCode() != "endbfchar")
            throw t.streamException("ToUnicode stream is missing 'endbfchar' after 'beginbfchar'.")
        case "beginbfrange" =>
          t.startStreamArgumentReading()
          val linesCount = t.getStreamInt()
          t.endStreamArgumentReading()
          var i = 0
          while (i < linesCount) {
            val cidStart = t.getStreamCid()
            val cidEnd = t.getStreamCid()
            if (cidEnd < cidStart)
              throw t.streamException(s"ToUnicode: beginbfrange cid1 '$cidStart should be smaller than cid2'$cidEnd'.")
            var unicodeChar = t.getStreamUnicode()
            var cid = cidStart
            while (cid <= cidEnd) {
              // (reference: PdfEncodings.cs:1180-1183)
              cMapAdd(cid, unicodeChar.toChar)
              encoding8Bit(cid) = unicodeChar.toChar
              unicodeChar += 1
              cid += 1
            }
            i += 1
          }
          if (t.getStreamOpCode() != "endbfrange")
            throw t.streamException("ToUnicode stream is missing 'endbfrange' after 'beginbfrange'.")
        case "endcmap" =>
          done = true
        case _ =>
      }
    }
  }

  /** EXTENSION (opt-in `extendedFilters`, Type0 fonts): full-range ToUnicode
    * CMap parse per ISO 32000-1 §9.10.3 — source CIDs up to 4 hex digits,
    * destinations of any even byte length read as UTF-16BE (multi-char
    * targets and surrogate pairs kept verbatim, never ligature-packed), and
    * bfrange's array-destination form `<lo> <hi> [<d0> <d1> …]`. Duplicate
    * CIDs abort like the default-mode overlay. The map feeds
    * [[graft.pdf.PdfTokeniser]]'s 2-byte-code string decode. */
  private def applyToUnicodeCid(toUnicodeStream: DictTok): Unit = {
    val t = toUnicodeStream.loadStream()
    if (t.getStreamOpCode("begincmap") == null)
      throw t.streamException("ToUnicode stream is missing 'begincmap'.")
    t.setStreamMark()
    if (t.getStreamOpCode("endcodespacerange") == null)
      throw t.streamException("ToUnicode stream is missing 'endcodespacerange'.")
    toUnicodeHeader = t.getStreamMarkedText()
    cidToText = mutable.TreeMap.empty[Int, String]
    def add(cid: Int, s: String): Unit = {
      if (cidToText.contains(cid)) throw t.streamException(s"ToUnicode defines the same cid '$cid' twice.")
      cidToText(cid) = s
    }
    /** bfrange increments the LAST UTF-16 code unit of the destination. */
    def incLast(s: String, by: Int): String =
      if (s.isEmpty) s
      else s.substring(0, s.length - 1) + (s.charAt(s.length - 1) + by).toChar
    var done = false
    while (!done) {
      val opCode = t.getStreamOpCode()
      if (opCode == null) throw t.streamException("ToUnicode stream incomplete.")
      opCode match {
        case "beginbfchar" =>
          t.startStreamArgumentReading()
          val linesCount = t.getStreamInt()
          t.endStreamArgumentReading()
          var i = 0
          while (i < linesCount) {
            val cid = t.getStreamCidWide()
            add(cid, t.getStreamHexUtf16())
            i += 1
          }
          if (t.getStreamOpCode() != "endbfchar")
            throw t.streamException("ToUnicode stream is missing 'endbfchar' after 'beginbfchar'.")
        case "beginbfrange" =>
          t.startStreamArgumentReading()
          val linesCount = t.getStreamInt()
          t.endStreamArgumentReading()
          var i = 0
          while (i < linesCount) {
            val cidStart = t.getStreamCidWide()
            val cidEnd = t.getStreamCidWide()
            if (cidEnd < cidStart)
              throw t.streamException(s"ToUnicode: beginbfrange cid1 '$cidStart should be smaller than cid2'$cidEnd'.")
            if (t.peekStreamNonWsByte() == '[') {
              t.expectStreamByte('[')
              var cid = cidStart
              while (cid <= cidEnd) { add(cid, t.getStreamHexUtf16()); cid += 1 }
              t.expectStreamByte(']')
            } else {
              val dst0 = t.getStreamHexUtf16()
              var cid = cidStart
              while (cid <= cidEnd) { add(cid, incLast(dst0, cid - cidStart)); cid += 1 }
            }
            i += 1
          }
          if (t.getStreamOpCode() != "endbfrange")
            throw t.streamException("ToUnicode stream is missing 'endbfrange' after 'beginbfrange'.")
        case "endcmap" =>
          done = true
        case _ =>
      }
    }
  }
}
