package graft.pdf

import scala.collection.mutable

/** Identifier of an indirect PDF object: object number + generation.
  * (reference: PdfParser/ObjectId.cs:33-117)
  */
final case class ObjectId(objectNumber: Int, generation: Int) {
  override def toString: String = s"$objectNumber $generation"
}

/** Token ADT for the PDF object model (reference: PdfParser/Token.cs).
  *
  * Tokens are plain data; all byte-cursor parsing lives in [[PdfTokeniser]].
  * `render` reproduces the reference's `Token.ToString()` output with one
  * deliberate canonicalisation: the newline is `"\n"` instead of the
  * C# `Environment.NewLine` (CRLF) — golden fixtures are generated under
  * the same rule (see FIXTURES.md).
  */
sealed abstract class PdfTok {
  def objectId: Option[ObjectId]

  /** Cache slot for the higher-level object built from this token
    * (font, page, content; reference: Token.cs:22). */
  var pdfObject: AnyRef = null

  def renderTo(sb: StringBuilder): Unit

  final def render: String = {
    val sb = new StringBuilder
    renderTo(sb)
    sb.toString
  }

  /** reference: Token.cs:51-55 */
  protected final def addRef(sb: StringBuilder): Unit =
    objectId.foreach { id => sb.append(" obj ").append(id.objectNumber).append(' ').append(id.generation) }

  /** reference: Token.cs:34-40 */
  protected final def appendTokOrRef(sb: StringBuilder, t: PdfTok): Unit =
    t.objectId match {
      case Some(id) => sb.append("ref ").append(id.objectNumber).append(' ').append(id.generation)
      case None     => t.renderTo(sb)
    }

  /** The reference's nested-render newline guard, replicated AS-IS: it
    * appends a newline when the buffer is a single char or already ENDS in
    * one (Token.cs:407,673 — the condition reads inverted, but the golden
    * token strings re-encoded from the reference's own TokeniserTest pin
    * this exact output; CRLF adapted to "\n"). */
  protected final def maybeNewline(sb: StringBuilder): Unit =
    if (sb.nonEmpty && !(sb.length > 1 && sb.charAt(sb.length - 2) != '\n' && sb.charAt(sb.length - 1) != '\n'))
      sb.append('\n')
}

/** reference: Token.cs:66-115 */
final class BoolTok(val value: Boolean, val objectId: Option[ObjectId]) extends PdfTok {
  def renderTo(sb: StringBuilder): Unit = {
    sb.append(if (value) "True" else "False")
    addRef(sb)
  }
}

/** Number with the reference's exact base-10 semantics: `integer` is set iff
  * at most the decimal point was consumed after the integer digits and the
  * value fits in Int (reference: Token.cs:118-196; so `34.` has integer=34).
  */
final class NumTok(val integer: Option[Int], val dec: java.math.BigDecimal, val objectId: Option[ObjectId])
    extends PdfTok {
  /** reference: Token.cs:122 — non-negative integer ⇒ may start `n g R` / `n g obj`. */
  def hasReferenceFormat: Boolean = integer.exists(_ >= 0)
  def renderTo(sb: StringBuilder): Unit = {
    integer match {
      case Some(i) => sb.append(i)
      case None    => sb.append(dec.toPlainString)
    }
    addRef(sb)
  }
}

/** Literal string keeps backslash escapes raw in `value`; hex string keeps
  * its angle brackets and additionally decodes `hexBytes` when the digit
  * count is even (reference: Token.cs:199-302). */
final class StrTok(var value: String, val hexBytes: Option[Array[Byte]], val objectId: Option[ObjectId])
    extends PdfTok {
  def renderTo(sb: StringBuilder): Unit = {
    sb.append('"').append(value).append('"')
    addRef(sb)
  }

  /** The token as a PDF TEXT STRING (ISO 32000-1 §7.9.2) — what the
    * additive structure surfaces (outline titles, form values, annotation
    * text) emit: hex strings decode their bytes (UTF-16BE when they carry
    * the FEFF byte-order mark, PDFDocEncoding≈Latin-1 otherwise), literal
    * strings resolve the backslash escapes `value` keeps raw (the
    * reference quirk, Token.cs:219-233). The raw `value` stays the
    * reference-faithful surface for everything else (/Info, rendering). */
  def text: String = hexBytes match {
    case Some(b) =>
      if (b.length >= 2 && b(0) == 0xfe.toByte && b(1) == 0xff.toByte)
        new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
      else new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    case None =>
      if (value.indexOf('\\') < 0) value
      else {
        val out = new java.lang.StringBuilder(value.length)
        var i = 0
        val n = value.length
        while (i < n) {
          val c = value.charAt(i)
          if (c != '\\' || i + 1 >= n) { out.append(c); i += 1 }
          else {
            val e = value.charAt(i + 1)
            e match {
              case 'n' => out.append('\n'); i += 2
              case 'r' => out.append('\r'); i += 2
              case 't' => out.append('\t'); i += 2
              case 'b' => out.append('\b'); i += 2
              case 'f' => out.append('\f'); i += 2
              case '(' | ')' | '\\' => out.append(e); i += 2
              case '\n' => i += 2 // line continuation
              case '\r' => i += (if (i + 2 < n && value.charAt(i + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                var v = 0
                var k = i + 1
                while (k < n && k < i + 4 && value.charAt(k) >= '0' && value.charAt(k) <= '7') {
                  v = v * 8 + (value.charAt(k) - '0')
                  k += 1
                }
                out.append(v.toChar); i = k
              case other => out.append(other); i += 2 // unknown escape: keep the char
            }
          }
        }
        out.toString
      }
  }
}

/** reference: Token.cs:305-329 */
final class NameTok(val value: String, val objectId: Option[ObjectId]) extends PdfTok {
  def renderTo(sb: StringBuilder): Unit = {
    sb.append('/').append(value)
    addRef(sb)
  }
}

/** Array whose element access lazily swaps a [[RefTok]] for the referenced
  * object (reference: Token.cs:332-429). */
final class ArrTok(private val tk: PdfTokeniser, val objectId: Option[ObjectId]) extends PdfTok {
  private[pdf] val items = mutable.ArrayBuffer.empty[PdfTok]

  def length: Int = items.length

  def apply(i: Int): PdfTok = items(i) match {
    case ref: RefTok =>
      val resolved = tk.tokenById(ref.objectId.get)
      items(i) = resolved
      resolved
    case t => t
  }

  def add(t: PdfTok): Unit = items += t

  def iterator: Iterator[PdfTok] = Iterator.range(0, items.length).map(apply)

  def renderTo(sb: StringBuilder): Unit = {
    maybeNewline(sb)
    sb.append('[')
    var first = true
    items.foreach { t =>
      if (first) first = false else sb.append(' ')
      appendTokOrRef(sb, t)
    }
    sb.append(']')
    addRef(sb)
    sb.append('\n')
  }
}

/** Dictionary; duplicate keys merge into an array (reference:
  * Token.cs:473-483). If a `stream` keyword follows, `streamStartIndex` and
  * `length` locate the raw payload in the file (reference: Token.cs:487-494).
  */
final class DictTok(private val tk: PdfTokeniser, val objectId: Option[ObjectId]) extends PdfTok {
  private[pdf] val entries = mutable.LinkedHashMap.empty[String, PdfTok]
  var tpe: Option[String] = None
  var streamStartIndex: Int = Int.MinValue
  var streamLength: Int = Int.MinValue
  /** Decrypted payload memo (RC4 and AESV2): the source document bytes are
    * never mutated, so extracting the same array twice cannot
    * double-decrypt. */
  var decryptedStream: Array[Byte] = null
  var streamLengthProblem: String = null

  def isStream: Boolean = streamStartIndex >= 0
  def keys: Seq[String] = entries.keys.toSeq
  def containsKey(key: String): Boolean = entries.contains(key)

  /** Resolving accessor: swaps a RefTok for the referenced object and caches
    * the result — including a NullTok "not found" sentinel, which still
    * renders as `ref n g` because it carries the object id
    * (reference: Token.cs:499-508). Throws if the key is absent. */
  def apply(key: String): PdfTok = entries(key) match {
    case ref: RefTok =>
      val resolved = tk.tokenById(ref.objectId.get)
      entries(key) = resolved
      resolved
    case t => t
  }

  def get(key: String): Option[PdfTok] =
    if (entries.contains(key)) Some(apply(key)) else None

  def getName(key: String): Option[String] =
    get(key).collect { case n: NameTok => n.value }
  def getNumber(key: String): Option[NumTok] =
    get(key).collect { case n: NumTok => n }
  def getArray(key: String): Option[ArrTok] =
    get(key).collect { case a: ArrTok => a }
  def getDictionary(key: String): Option[DictTok] =
    get(key).collect { case d: DictTok => d }
  def getString(key: String): Option[String] =
    get(key).collect { case s: StrTok => s.value }
  def getHexBytes(key: String): Option[Array[Byte]] =
    get(key).collect { case s: StrTok => s }.flatMap(_.hexBytes)

  /** Decode this dictionary's stream into the tokeniser's stream buffer:
    * filter dispatch (only None / FlateDecode) + optional PNG-Up predictor
    * (reference: Token.cs:627-669). */
  def loadStream(): PdfTokeniser = {
    if (!isStream) throw new IllegalStateException(s"'$render' is not a stream.")
    // extendedFilters=false replicates the reference exactly (only None /
    // FlateDecode; anything else throws, surfacing as an error row). The
    // extended mode adds LZW / ASCIIHex / ASCII85 and the common
    // [/ASCII{85,Hex}Decode /FlateDecode] two-stage chain.
    var chainFlate = false
    def named(f: PdfTok): StreamFilter.Value = f.asInstanceOf[NameTok].value match {
      case ""            => StreamFilter.None
      case "FlateDecode" => StreamFilter.FlateDecode
      case "LZWDecode" if tk.extendedFilters      => StreamFilter.Lzw
      case "ASCIIHexDecode" if tk.extendedFilters => StreamFilter.AsciiHex
      case "ASCII85Decode" if tk.extendedFilters  => StreamFilter.Ascii85
      case "RunLengthDecode" if tk.extendedFilters => StreamFilter.RunLength
      case other => throw new UnsupportedOperationException(s"Stream filter $other is not (yet) supported.")
    }
    val filter = entries.get("Filter") match {
      case Some(ft) =>
        ft match {
          case a: ArrTok =>
            val first = named(a(0))
            if (a.length <= 1) first
            else if (!tk.extendedFilters) {
              // reference behavior: a /Filter array uses only element 0
              // (Token.cs:632-636) — kept verbatim in default mode
              first
            } else if (a.length == 2 &&
                (first == StreamFilter.AsciiHex || first == StreamFilter.Ascii85) &&
                named(a(1)) == StreamFilter.FlateDecode) {
              chainFlate = true
              first
            } else {
              // extended mode must NOT silently decode only the first stage
              // of an unhandled chain (garbage downstream); surface the same
              // clean error row the default mode gives for exotic filters
              val names = a.iterator.collect { case n: NameTok => "/" + n.value }.mkString(" ")
              throw new UnsupportedOperationException(
                s"Stream filter chain [$names] is not (yet) supported.")
            }
          case t => named(t)
        }
      case None => StreamFilter.None
    }
    tk.fillStreamBytes(this, filter, chainFlate)
    getDictionary("DecodeParms").foreach { parms =>
      val columns = parms.getNumber("Columns")
        .getOrElse(throw tk.fileException("Stream DecodeParms are missing Columns parameter."))
      val predictor = parms.getNumber("Predictor")
        .getOrElse(throw tk.fileException("Stream DecodeParms are missing Predictor parameter."))
      val p = predictor.integer.get
      if (!tk.extendedFilters) {
        // reference behavior (Token.cs:652-668): only Predictor 12 with
        // every row filter byte = 2 (Up) is accepted — kept verbatim
        if (p != 12)
          throw tk.fileException("Stream DecodeParms Predictor parameter should be 12.")
        tk.applyPredictorUp(columns.integer.get)
      } else {
        // EXTENSION (opt-in `extendedFilters` only): the full ISO 32000-1
        // §7.4.4.4 predictor surface — PNG predictors 10-15 all mean
        // "per-row filter byte decides" (None/Sub/Up/Average/Paeth), 2 is
        // the TIFF horizontal differencer, 1 is no prediction. Row width =
        // Columns × Colors × BitsPerComponent/8; only 8-bit components are
        // supported (the xref-stream / web-PDF case — sub-byte sample
        // packing surfaces as a clean error row, never silent corruption).
        val colors = parms.getNumber("Colors").flatMap(_.integer).getOrElse(1)
        val bpc = parms.getNumber("BitsPerComponent").flatMap(_.integer).getOrElse(8)
        if (bpc != 8)
          throw tk.fileException(s"Stream DecodeParms BitsPerComponent $bpc is not supported (only 8).")
        val bytesPerRow = columns.integer.get * colors
        p match {
          case 1 => () // no prediction
          case 2 => tk.applyPredictorTiff(bytesPerRow, colors)
          case v if v >= 10 && v <= 15 => tk.applyPredictorPng(bytesPerRow, colors)
          case other =>
            throw tk.fileException(s"Stream DecodeParms Predictor $other is not supported.")
        }
      }
    }
    tk
  }

  def renderTo(sb: StringBuilder): Unit = {
    maybeNewline(sb)
    // The reference prints the brackets swapped (">>" first); kept verbatim
    // for golden-string fidelity (reference: Token.cs:676,683).
    sb.append(">>").append('\n')
    entries.foreach { case (k, v) =>
      sb.append(' ').append('/').append(k).append(' ')
      appendTokOrRef(sb, v)
      sb.append('\n')
    }
    sb.append("<<")
    if (isStream) {
      sb.append('\n')
      sb.append("stream ").append(streamStartIndex).append(", ").append(streamLength).append(" endstream")
      addRef(sb)
      sb.append('\n')
    } else {
      addRef(sb)
      sb.append('\n')
    }
  }
}

/** `null` literal; also the "not found" sentinel for xref misses
  * (reference: Token.cs:697-728, PdfXRefTable.cs:44). */
final class NullTok(val objectId: Option[ObjectId]) extends PdfTok {
  def renderTo(sb: StringBuilder): Unit = {
    sb.append("null")
    addRef(sb)
  }
}

/** Placeholder for `n g R`; resolved through the xref table on first access
  * (reference: Token.cs:736-746). */
final class RefTok(val objectId: Option[ObjectId]) extends PdfTok {
  def renderTo(sb: StringBuilder): Unit = {
    sb.append("Ref ")
    addRef(sb)
  }
}

object StreamFilter extends Enumeration {
  val None, FlateDecode, Lzw, AsciiHex, Ascii85, RunLength = Value
}

/** Parse error carrying ±100 bytes of file context (reference: PdfParser/PdfException.cs:29-74). */
final class PdfException(message: String, context: => String) extends Exception {
  override def getMessage: String = message + "\n" + context
  def shortMessage: String = message
}

/** Stream-content parse error with ±100 bytes of decoded-stream context
  * (reference: PdfParser/PdfException.cs, Tokeniser.cs:2670-2700). */
final class PdfStreamException(message: String, context: => String) extends Exception {
  override def getMessage: String = message + "\n" + context
  def shortMessage: String = message
}
