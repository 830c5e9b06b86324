package graft

import graft.fixtures.GoldenGen
import graft.pdf.PdfToTextStore
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for the viewer annotator port
  * (reference: TextStoreLib/PdfToTextStore.cs:53-405 — its own test file is
  * fully commented out upstream, so these assert the documented behaviors
  * structurally). */
class PdfToTextStoreSpec extends AnyFunSuite {

  test("anchors, links and stream elision on a real fixture") {
    val pdf = GoldenGen.fontsPdf()
    val (ts, anchors, err) = PdfToTextStore.viewerStore(pdf)
    assert(err.isEmpty, err)
    val text = ts.text
    // every `n g obj` got an anchor with a plausible line number
    assert(anchors.nonEmpty)
    anchors.values.foreach { a =>
      assert(a.line >= 1 && a.line <= ts.linesCount, a)
      assert(text.contains("{a" + a.objectId + "}"), a.objectId)
    }
    // indirect references render as {l…} links
    assert(text.contains("{l"), "no links annotated")
    // stream bodies elided: the {s…} marker replaces every payload (stream
    // elision itself is proven byte-exactly in the xref-miss test below)
    assert(text.contains("{s"), "no stream markers")
  }

  test("braces in the file are doubled (format-instruction escaping)") {
    val raw = "junk {x} junk trailer".getBytes("ISO-8859-1")
    val ts = new graft.pdf.TextStore()
    val err = PdfToTextStore.convert(
      new graft.pdf.PdfTokeniser(raw), ts, scala.collection.mutable.LinkedHashMap.empty)
    assert(err.isEmpty)
    assert(ts.text.contains("{{x}}"), ts.text)
  }

  test("xref-missing stream falls back to the literal endstream scan") {
    // hand-written pdf fragment: object 7 is NOT in any xref, stream follows
    // NB: the tail must not contain the bare word "stream" — the machine
    // (faithfully to the reference) treats every occurrence as the keyword
    val raw = ("7 0 obj\n<</Length 99>>stream\nBINARYBYTES\nendstream\nendobj\n" +
      "after the payload").getBytes("ISO-8859-1")
    val ts = new graft.pdf.TextStore()
    val anchors = scala.collection.mutable.LinkedHashMap.empty[String, graft.pdf.TextViewerAnchor]
    val err = PdfToTextStore.convert(new graft.pdf.PdfTokeniser(raw), ts, anchors)
    assert(err.isEmpty, err)
    assert(ts.text.contains("{a7 0}"))
    assert(ts.text.contains("{s7 0}"))
    assert(!ts.text.contains("BINARYBYTES"), ts.text)
    // the FULL payload is elided (no trailing byte leaks — fixed deviation
    // from the reference's LF back-off off-by-one) and the EOL before
    // endstream survives as the store's '\r' line mark
    assert(ts.text.contains("{s7 0} \rendstream"), ts.text)
    assert(ts.text.contains("after the payload"))
  }

  test("reference error message when endstream is missing entirely") {
    val raw = "7 0 obj\n<</Length 9>>stream\nNOEND".getBytes("ISO-8859-1")
    val ts = new graft.pdf.TextStore()
    val err = PdfToTextStore.convert(
      new graft.pdf.PdfTokeniser(raw), ts, scala.collection.mutable.LinkedHashMap.empty)
    assert(err.exists(_.getMessage.contains("nor 'endstream' in the pdf file")), err.map(_.getMessage))
  }
}
