package graft.pdf

import scala.collection.mutable

/** Anchor registered for every `n g obj` found in the file: the object id
  * string and the 1-based line the viewer jumps to
  * (reference: TextStoreLib/TextViewerAnchor.cs). */
final case class TextViewerAnchor(objectId: String, line: Int)

/** The viewer's raw-file annotator — S27's 17-state byte machine, ported
  * faithfully from TextStoreLib/PdfToTextStore.cs:53-405 (the five
  * `endstream_*` states are dead code there — commented out — and are not
  * ported; 15 live states remain):
  *
  *  - `{` / `}` in the file are doubled so they can't be confused with the
  *    viewer's own format instructions (PdfToTextStore.cs:80-88);
  *  - `n g R` renders as a link: the id wrapped in `{l…}`
  *    (PdfToTextStore.cs:157-166);
  *  - `n g obj` renders as an anchor: the id wrapped in `{a…}`, and an
  *    anchor (id → current line) is registered first-wins
  *    (PdfToTextStore.cs:188-205);
  *  - a `stream` keyword emits ` {s<n g>} ` and ELIDES the body: the length
  *    comes from the xref'd dictionary; if the object is missing from the
  *    xref, the machine scans for the literal `endstream` and backs off the
  *    preceding EOL, throwing with the reference's exact messages when
  *    neither works (PdfToTextStore.cs:239-280);
  *  - three numbers in a row discard the first (PdfToTextStore.cs:166-175).
  *
  * Exceptions are caught and returned, not thrown (the viewer shows them).
  */
object PdfToTextStore {

  private val SpanNoEOL = Int.MinValue // format bytes contain no EOL
  private val Endstream = "endstream".getBytes("ISO-8859-1")

  // the 15 live states (reference stateEnum, PdfToTextStore.cs:15-38)
  private final val Parse = 0
  private final val Space = 1
  private final val Digits1 = 2
  private final val Digits1Space = 3
  private final val Digits2 = 4
  private final val Digits2Space = 5
  private final val ObjO = 6
  private final val ObjB = 7
  private final val StreamS = 8
  private final val StreamT = 9
  private final val StreamR = 10
  private final val StreamE = 11
  private final val StreamA = 12
  private final val EndE = 13
  private final val EndN = 14
  private final val EndD = 15
  private final val EndobjO = 16
  private final val EndobjB = 17

  /** Convenience: parse (header + xref) and convert in one call. Returns the
    * populated store, the anchors, and the conversion error if any. */
  def viewerStore(bytes: Array[Byte], password: String = "",
      buffers: WorkBuffers = new WorkBuffers())
      : (TextStore, Map[String, TextViewerAnchor], Option[String]) = {
    val tk = new PdfTokeniser(bytes, password, "|", buffers)
    try {
      tk.verifyFileHeader()
      tk.findPages()
    } catch {
      case _: Exception => // xref may still be partially usable; convert falls
        // back to the endstream scan for unresolvable streams
    }
    val ts = new TextStore(bytes.length + 64)
    val anchors = mutable.LinkedHashMap.empty[String, TextViewerAnchor]
    val err = convert(tk, ts, anchors)
    (ts, anchors.toMap, err.map(e => e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse("")))
  }

  /** Faithful port of `PdfToTextStore.Convert` (PdfToTextStore.cs:53-405). */
  def convert(tk: PdfTokeniser, textStore: TextStore,
      anchors: mutable.Map[String, TextViewerAnchor]): Option[Exception] = {
    try {
      var state = Parse
      var number1 = Int.MinValue
      var number2 = Int.MinValue
      var number1Pos = 0
      var number2Pos = 0
      var lastNumber2Pos = 0
      var streamObjectIdStart = 0
      var streamObjectIdEnd = 0
      var startIndex = 0
      var bytesIndex = 0
      val bytes = tk.originalBytes
      while (bytesIndex < bytes.length) {
        var b = bytes(bytesIndex); bytesIndex += 1
        // double brackets so they are not read as format instructions
        if (b == '{') {
          textStore.append(bytes, startIndex, bytesIndex - startIndex, startIndex)
          startIndex = bytesIndex
          textStore.append(Array[Byte]('{'), 0, 1, SpanNoEOL)
        } else if (b == '}') {
          textStore.append(bytes, startIndex, bytesIndex - startIndex, startIndex)
          startIndex = bytesIndex
          textStore.append(Array[Byte]('}'), 0, 1, SpanNoEOL)
        }

        state match {
          case Parse =>
            if (b == ' ') state = Space
            else if (b >= '0' && b <= '9') { number1 = b - '0'; number1Pos = bytesIndex - 1; state = Digits1 }
            else if (b == 'e') state = EndE
            else if (b == 's') state = StreamS

          case Space =>
            if (b >= '0' && b <= '9') { state = Digits1; number1 = b - '0'; number1Pos = bytesIndex - 1 }
            else if (b == 'e') state = EndE
            else if (b == 's') state = StreamS
            else state = Parse

          case Digits1 =>
            if (b >= '0' && b <= '9') number1 = number1 * 10 + b - '0'
            else if (b == ' ') state = Digits1Space
            else state = Parse

          case Digits1Space =>
            if (b >= '0' && b <= '9') { state = Digits2; number2 = b - '0'; number2Pos = bytesIndex - 1 }
            else if (b == 'e') state = EndE
            else if (b == 's') state = StreamS
            else state = Parse

          case Digits2 =>
            if (b >= '0' && b <= '9') number2 = number2 * 10 + b - '0'
            else if (b == ' ') { state = Digits2Space; lastNumber2Pos = bytesIndex - 1 }
            else state = Parse

          case Digits2Space =>
            if (b == 'R') {
              textStore.append(bytes, startIndex, number1Pos - startIndex, startIndex)
              textStore.append("{l".getBytes("ISO-8859-1"), 0, 2, SpanNoEOL)
              textStore.append(bytes, number1Pos, lastNumber2Pos - number1Pos, number1Pos)
              textStore.append(Array[Byte]('}'), 0, 1, SpanNoEOL)
              startIndex = lastNumber2Pos
              state = Parse
            } else if (b == 'o') state = ObjO
            else if (b >= '0' && b <= '9') {
              // sequence of 3 numbers: discard the first
              state = Digits2
              number1 = number2; number2 = b - '0'
              number1Pos = number2Pos; number2Pos = bytesIndex - 1
            } else state = Parse

          case ObjO =>
            state = if (b == 'b') ObjB else Parse

          case ObjB =>
            if (b == 'j') {
              textStore.append(bytes, startIndex, number1Pos - startIndex, startIndex)
              textStore.append("{a".getBytes("ISO-8859-1"), 0, 2, SpanNoEOL)
              textStore.append(bytes, number1Pos, lastNumber2Pos - number1Pos, SpanNoEOL)
              textStore.append(Array[Byte]('}'), 0, 1, SpanNoEOL)
              val objectIdString = new String(bytes, number1Pos, lastNumber2Pos - number1Pos, "ISO-8859-1")
              if (!anchors.contains(objectIdString))
                anchors(objectIdString) = TextViewerAnchor(objectIdString, textStore.linesCount)
              startIndex = lastNumber2Pos
              streamObjectIdStart = number1Pos
              streamObjectIdEnd = lastNumber2Pos
            }
            state = Parse

          case StreamS => state = if (b == 't') StreamT else Parse
          case StreamT => state = if (b == 'r') StreamR else Parse
          case StreamR => state = if (b == 'e') StreamE else Parse
          case StreamE => state = if (b == 'a') StreamA else Parse

          case StreamA =>
            if (b == 'm') {
              textStore.append(bytes, startIndex, bytesIndex - startIndex, startIndex)
              textStore.append(" {s".getBytes("ISO-8859-1"), 0, 3, SpanNoEOL)
              textStore.append(bytes, streamObjectIdStart, streamObjectIdEnd - streamObjectIdStart, SpanNoEOL)
              textStore.append("} ".getBytes("ISO-8859-1"), 0, 2, SpanNoEOL)
              val idString = new String(bytes, streamObjectIdStart, streamObjectIdEnd - streamObjectIdStart, "ISO-8859-1")
              val parts = idString.split(' ')
              val streamToken =
                try tk.tokenById(ObjectId(parts(0).toInt, parts(1).toInt))
                catch { case _: Exception => null }
              streamToken match {
                case d: DictTok if d.isStream =>
                  // skip stream bytes via the xref'd dictionary
                  bytesIndex = d.streamStartIndex + d.streamLength
                  startIndex = bytesIndex
                case _ =>
                  // missing from xref: scan for the literal 'endstream'
                  var endstreamIndex = 0
                  while (endstreamIndex < Endstream.length) {
                    if (bytesIndex >= bytes.length) throw new Exception(
                      s"Could not find ObjectId $idString in xref table nor 'endstream' in the pdf file.")
                    b = bytes(bytesIndex); bytesIndex += 1
                    if (b == Endstream(endstreamIndex)) endstreamIndex += 1
                    else endstreamIndex = 0
                  }
                  bytesIndex -= Endstream.length + 1
                  b = bytes(bytesIndex)
                  // DEVIATION (documented): the reference decrements once
                  // more here (PdfToTextStore.cs:267-274), which for LF-only
                  // and CR-only files leaves the LAST PAYLOAD BYTE in the
                  // viewer output (its CRLF case lands correctly only
                  // because the follow-up check reads the wrong position).
                  // We stay ON the EOL and step back once more only for a
                  // real CRLF, so exactly the payload is elided.
                  if (b == '\n') {
                    if (bytes(bytesIndex - 1) == '\r') bytesIndex -= 1
                  } else if (b == '\r') {
                    // stay on the CR
                  } else throw new Exception(
                    s"Stream with ObjectId $idString is missing in xref table. " +
                      "'endstream' is not preceedet carriage return or line feed.")
                  startIndex = bytesIndex
              }
            }
            state = Parse

          case EndE => state = if (b == 'n') EndN else Parse
          case EndN => state = if (b == 'd') EndD else Parse
          case EndD => state = if (b == 'o') EndobjO else Parse
          case EndobjO => state = if (b == 'b') EndobjB else Parse
          case EndobjB => state = Parse
        }
      }
      textStore.append(bytes, startIndex, bytesIndex - startIndex, startIndex)
      None
    } catch {
      case e: Exception => Some(e)
    }
  }
}
