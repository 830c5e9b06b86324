package graft

import graft.fixtures.GoldenGen
import graft.pdf.{ExtraFilters, PdfExtract}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class ExtraFiltersSpec extends AnyFunSuite {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 4000).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private def forAll(gen: Gen[Array[Byte]])(body: Array[Byte] => Unit): Unit = {
    val prop = Prop.forAll(gen) { data => body(data); true }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(100)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("LZW round-trips arbitrary bytes") {
    forAll(bytesGen) { data =>
      val dec = ExtraFilters.lzwDecode(ExtraFilters.lzwEncode(data), 0, ExtraFilters.lzwEncode(data).length)
      assert(dec.toSeq == data.toSeq)
    }
  }

  test("ASCIIHex round-trips, tolerates whitespace and odd tail") {
    forAll(bytesGen) { data =>
      val enc = ExtraFilters.asciiHexEncode(data)
      assert(ExtraFilters.asciiHexDecode(enc, 0, enc.length).toSeq == data.toSeq)
    }
    val odd = "4 1 4\n2 5>".getBytes("ISO-8859-1")
    assert(ExtraFilters.asciiHexDecode(odd, 0, odd.length).toSeq == Seq[Byte](0x41, 0x42, 0x50))
  }

  test("ASCII85 round-trips incl. z groups and partial tails") {
    forAll(bytesGen) { data =>
      val enc = ExtraFilters.ascii85Encode(data)
      assert(ExtraFilters.ascii85Decode(enc, 0, enc.length).toSeq == data.toSeq)
    }
  }

  private def pdfWithFilter(filterDict: String, payload: Array[Byte]): Array[Byte] = {
    val b = new GoldenGen.PdfBuilder()
    val id = b.registerObject()
    b.raw(s"$id 0 obj\n<</Length ${payload.length}$filterDict>>stream\n")
    b.raw(payload)
    b.raw("\nendstream\nendobj\n")
    val catalog = GoldenGen.catalogFor(b, Seq(id))
    b.finish(s"/Root $catalog 0 R")
  }

  test("extended filters decode content streams; default mode errors like the reference") {
    val ops = "BT (filtered text works) Tj ET".getBytes("ISO-8859-1")
    val cases = Seq(
      "/Filter/LZWDecode" -> ExtraFilters.lzwEncode(ops),
      "/Filter/ASCIIHexDecode" -> ExtraFilters.asciiHexEncode(ops),
      "/Filter/ASCII85Decode" -> ExtraFilters.ascii85Encode(ops),
      "/Filter[/ASCII85Decode/FlateDecode]" -> ExtraFilters.ascii85Encode(GoldenGen.zlib(ops)))
    cases.foreach { case (dict, payload) =>
      val pdf = pdfWithFilter(dict, payload)
      val ext = PdfExtract.extract(pdf, extendedFilters = true)
      assert(ext.text == "filtered text works|", s"$dict: ${ext.error}")
      // reference-faithful default: unsupported filter -> error row
      val ref = PdfExtract.extract(pdf)
      assert(ref.decodeFailures >= 1, dict)
      assert(ref.error.exists(_.contains("not (yet) supported")), s"$dict: ${ref.error}")
    }
  }
}
