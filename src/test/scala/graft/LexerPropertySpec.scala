package graft

import graft.pdf._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Property round-trips: encoder → lexer for the scalar token classes
  * (FIXTURES.md harness item "ScalaCheck round-trip properties"). */
class LexerPropertySpec extends AnyFunSuite {

  private def lexOne(s: String): PdfTok =
    new PdfTokeniser((s + " x ").getBytes(ISO_8859_1)).getNextToken()

  private def check(name: String, prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val result = SCTest.check(params, prop)
    assert(result.passed, s"$name: ${result.status}")
  }

  test("integers round-trip") {
    check("int", Prop.forAll(Gen.chooseNum(Int.MinValue + 1, Int.MaxValue - 1)) { (n: Int) =>
      val tok = lexOne(n.toString).asInstanceOf[NumTok]
      tok.integer.contains(n) && tok.render == n.toString
    })
  }

  test("scaled decimals round-trip") {
    val gen = for {
      unscaled <- Gen.chooseNum(-99999999L, 99999999L)
      scale <- Gen.chooseNum(1, 6)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
    check("dec", Prop.forAll(gen) { (d: java.math.BigDecimal) =>
      lexOne(d.toPlainString).asInstanceOf[NumTok].dec.compareTo(d) == 0
    })
  }

  test("names round-trip") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check("name", Prop.forAll(nameGen) { (s: String) =>
      lexOne("/" + s).asInstanceOf[NameTok].value == s
    })
  }

  test("literal strings without specials round-trip") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', '!', '-'))).map(_.mkString)
    check("str", Prop.forAll(strGen) { (s: String) =>
      lexOne("(" + s + ")").asInstanceOf[StrTok].value == s
    })
  }

  test("hex strings round-trip to bytes") {
    check("hex", Prop.forAll(Gen.listOf(Gen.chooseNum(0, 255))) { (bs: List[Int]) =>
      val hex = bs.map(b => f"$b%02X").mkString
      lexOne("<" + hex + ">").asInstanceOf[StrTok].hexBytes.get.toSeq == bs.map(_.toByte)
    })
  }

  test("balanced-bracket strings keep escapes raw") {
    check("esc", Prop.forAll(Gen.listOf(Gen.oneOf("a", "\\(", "\\)", "(x)", " "))) { (parts: List[String]) =>
      val body = parts.mkString
      // escapes are NOT decoded at lex time (reference: Token.cs:219-233)
      lexOne("(" + body + ")").asInstanceOf[StrTok].value == body
    })
  }

  test("arrays of mixed scalars preserve order") {
    check("arr", Prop.forAll(Gen.listOf(Gen.chooseNum(-1000, 1000))) { (ns: List[Int]) =>
      val src = ns.mkString("[", " ", "]")
      lexOne(src).asInstanceOf[ArrTok].iterator.map(_.asInstanceOf[NumTok].integer.get).toList == ns
    })
  }
}
