package graft

import graft.pdf._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Golden lexer round-trip: the reference's tokeniser unit-test corpus
  * re-encoded byte-for-byte (reference: PdfParserTest/TokeniserTest.cs:14-128;
  * stream offsets 879/962 verified identical to the golden strings there).
  * Expected renders are the reference's golden `ToString()` outputs with the
  * structural CRLF canonicalised to "\n" (FIXTURES.md F1). */
class TokeniserSpec extends AnyFunSuite {

  private val flate17 =
    "x\u009Ck`\u0000\u0002\u0009\u00DE\u0003\u000C\u00B8\u0000\u0000( \u0001f"

  private val testString: String = Seq(
    "false\r\n",
    "true false\r\n",
    "1 -2 00 +987654321\r\n",
    "+123.4 34.5 34. +.2 .1 0.0 -.002 -3.62\r\n",
    "/name /n \r\n",
    "(string)<112233445566778899AABCCDDEEFF>()<>\r\n",
    " (string) <112233445566778899AABCCDDEEFF> ( ) < > \r\n",
    "(a string can be\r\n on 2 lines or more) (a string can contain ()matched brackets)\r\n",
    "(a string with one open \\( bracket) (a string with one closing \\) bracket)\r\n",
    "1%comment\n2\r\n",
    "1 %comment \n%comment\n % comment \n 2\r\n",
    " [ /someName false -0 (string) ] [ [ (array in array) ] true ] \r\n",
    "[/someName false -0(string)][[(array in array)]true]\r\n",
    "[/someName%\n]\r\n",
    "[ /someName % comment \n /anotherName]\r\n",
    " << /Name1 123 >> \r\n",
    "<</Name1 124>>\r\n",
    "<< /Name1 125 /Name2 [ (string) (array) 126 ] /Name3 << /subName1 127 /subName2 true >> /Name4 (another string) /Name5 <112233EE> >>\r\n",
    "<</Name1 223/Name2[(string)(array)224]/Name3<</subName1 225/subName2 true>>/Name4(another string)/Name5<222233EE>>>\r\n",
    "<</Length 17>>\r\nstream\r\n01234567890123456\r\nendstream\r\n\r\n",
    "<< /Length 17 /Filter [ /FlateDecode ] >>\r\nstream\r\n" + flate17 + "\r\nendstream\r\n\r\n",
    "null\r\n",
    " 1  0  obj \r\n(a string) \r\nendobj\r\n",
    "2  1 obj(a string2)endobj\r\n",
    "3  2 R\r\n",
    "7 0 obj <</Length 8 0 R>>stream\n12345678\nendstream endobj 8 0 obj 9 endobj\r\n"
  ).mkString

  test("golden token renders (TokeniserTest corpus re-encoded)") {
    val bytes = testString.getBytes(ISO_8859_1)
    // offsets must line up with the reference's golden strings
    assert(testString.indexOf("01234567890123456") == 879)
    assert(testString.indexOf(flate17) == 962)
    val s3 = testString.indexOf("12345678\nendstream") + 0
    assert(s3 == 1101)

    val expected = Seq(
      "False",
      "True", "False",
      "1", "-2", "0", "987654321",
      "123.4", "34.5", "34", "0.2", "0.1", "0", "-0.002", "-3.62",
      "/name", "/n",
      "\"string\"", "\"<112233445566778899AABCCDDEEFF>\"", "\"\"", "\"<>\"",
      "\"string\"", "\"<112233445566778899AABCCDDEEFF>\"", "\" \"", "\"< >\"",
      "\"a string can be\r\n on 2 lines or more\"", "\"a string can contain ()matched brackets\"",
      "\"a string with one open \\( bracket\"", "\"a string with one closing \\) bracket\"",
      "1", "2",
      "1", "2",
      "[/someName False 0 \"string\"]\n", "[\n[\"array in array\"]\n True]\n",
      "[/someName False 0 \"string\"]\n", "[\n[\"array in array\"]\n True]\n",
      "[/someName]\n",
      "[/someName /anotherName]\n",
      ">>\n /Name1 123\n<<\n",
      ">>\n /Name1 124\n<<\n",
      ">>\n /Name1 125\n /Name2 [\"string\" \"array\" 126]\n\n /Name3 >>\n /subName1 127\n /subName2 True\n<<\n\n /Name4 \"another string\"\n /Name5 \"<112233EE>\"\n<<\n",
      ">>\n /Name1 223\n /Name2 [\"string\" \"array\" 224]\n\n /Name3 >>\n /subName1 225\n /subName2 True\n<<\n\n /Name4 \"another string\"\n /Name5 \"<222233EE>\"\n<<\n",
      ">>\n /Length 17\n<<\nstream 879, 17 endstream\n",
      ">>\n /Length 17\n /Filter [/FlateDecode]\n\n<<\nstream 962, 17 endstream\n",
      "null",
      "\"a string\" obj 1 0",
      "\"a string2\" obj 2 1",
      "Ref  obj 3 2",
      ">>\n /Length ref 8 0\n<<\nstream 1101, 8 endstream obj 7 0\n",
      "9 obj 8 0"
    )

    val tk = new PdfTokeniser(bytes)
    expected.zipWithIndex.foreach { case (want, i) =>
      val tok = tk.getNextToken()
      assert(tok.render == want, s"token #$i")
    }
  }

  test("number semantics: integer iff at most the decimal point consumed") {
    // trailing sentinel: a bare non-negative number at end-of-buffer would
    // run the reference's n-g-R lookahead off the end, exactly like C#
    def lex(s: String): NumTok =
      new PdfTokeniser((s + " x ").getBytes(ISO_8859_1)).getNextToken().asInstanceOf[NumTok]
    assert(lex("34.").integer.contains(34))
    assert(lex("34.5").integer.isEmpty)
    assert(lex("-0").integer.contains(0))
    assert(lex("0.0").integer.isEmpty)
    assert(lex("2147483646").integer.contains(2147483646))
    assert(lex("2147483647").integer.isEmpty) // dec == Int.MaxValue is excluded (strict <)
    assert(lex("-3").integer.contains(-3))
    assert(lex("-3").hasReferenceFormat == false)
    assert(lex("3").hasReferenceFormat == true)
  }

  test("hex string decodes bytes only when digit count is even") {
    def lex(s: String): StrTok =
      new PdfTokeniser((s + " ").getBytes(ISO_8859_1)).getNextToken().asInstanceOf[StrTok]
    assert(lex("<112233EE>").hexBytes.get.toSeq == Seq(0x11, 0x22, 0x33, 0xEE.toByte))
    assert(lex("<11223>").hexBytes.isEmpty)
    assert(lex("<>").hexBytes.get.isEmpty)
    assert(lex("<1 2>").hexBytes.isEmpty) // space makes a digit invalid → null
  }

  test("duplicate dictionary keys merge into an array") {
    // trailing "0" so the after-dict stream probe has a non-ws byte to stop on
    val tk = new PdfTokeniser("<</K 1/K 2/K 3>> 0 ".getBytes(ISO_8859_1))
    val d = tk.getNextToken().asInstanceOf[DictTok]
    val arr = d("K").asInstanceOf[ArrTok]
    assert(arr.iterator.map(_.asInstanceOf[NumTok].integer.get).toSeq == Seq(1, 2, 3))
  }
}
