package graft.ext

import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.SparkFunSuite

/** Property-based roundtrips for the round-13 document builders: the
  * extraction of a built document must reproduce the input text
  * EXACTLY, across randomized content (including every escape-hostile
  * character class) and randomized coding routes. Pure driver-side
  * parses — no Spark job per case, so case counts can be high.
  */
class DocFormatPropertySpec extends SparkFunSuite {

  private def check(prop: Prop, cases: Int): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  // printable Latin-1 minus nothing: parens, backslashes, angle
  // brackets, ampersands all included on purpose
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.choose(32, 126).map(_.toChar),
    1 -> Gen.oneOf('(', ')', '\\', '<', '>', '&', '#'),
    1 -> Gen.choose(0xA1, 0xFF).map(_.toChar))
  private val lineGen: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
  private val pageGen: Gen[Seq[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, lineGen))
  private val pagesGen: Gen[Seq[Seq[String]]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, pageGen))

  test("property: PDF build→extract reproduces lines exactly across " +
    "every coding route") {
    val routeGen = Gen.choose(0, 6)
    check(Prop.forAll(pagesGen, routeGen, Gen.oneOf(true, false)) {
      (pages, route, tj) =>
        val b = route match {
          case 0 => Pdf.buildPdf(pages, useTJ = tj)
          case 1 => Pdf.buildPdf(pages, flate = true, useTJ = tj)
          case 2 => Pdf.buildPdf(pages, flate = true, xrefStream = true,
            useTJ = tj)
          case 3 => Pdf.buildPdf(pages, flate = true, objStm = true,
            useTJ = tj)
          case 4 => Pdf.buildPdf(pages, asciiFilter = Some("AHx"),
            useTJ = tj)
          case 5 => Pdf.buildPdf(pages, asciiFilter = Some("A85"),
            useTJ = tj)
          case _ => Pdf.buildPdf(pages, asciiFilter = Some("LZW"),
            useTJ = tj)
        }
        Pdf.parsePdf(b) match {
          case Right((m, got)) =>
            m.nPages == pages.length &&
              got.map(_.text) ==
                pages.map(_.filter(_.nonEmpty).mkString("\n"))
          case Left(e) => throw new AssertionError(s"parse failed: $e")
        }
    }, cases = 120)
  }

  test("property: PDF CID route reproduces supported-alphabet lines") {
    val cidLine = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.frequency(5 -> Gen.choose(33, 126).map(_.toChar),
        1 -> Gen.const(' '),
        1 -> Gen.choose(0xA1, 0xFF).map(_.toChar))).map(_.mkString))
    val cidPages = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 3).flatMap(m => Gen.listOfN(m, cidLine))))
    check(Prop.forAll(cidPages, Gen.oneOf(true, false)) { (pages, fl) =>
      val b = Pdf.buildPdf(pages, cidFont = true, flate = fl)
      Pdf.parsePdf(b) match {
        case Right((_, got)) =>
          got.map(_.text) == pages.map(_.filter(_.nonEmpty).mkString("\n"))
        case Left(e) => throw new AssertionError(s"parse failed: $e")
      }
    }, cases = 80)
  }

  test("property: DOCX build→extract reproduces paragraphs exactly, " +
    "tabs and newlines included") {
    val paraChar = Gen.frequency(
      10 -> Gen.choose(32, 126).map(_.toChar),
      1 -> Gen.const('\t'),
      1 -> Gen.const('\n'),
      1 -> Gen.oneOf('&', '<', '>'),
      1 -> Gen.choose(0xA1, 0x24F).map(_.toChar)) // Latin ext: real UTF-8
    val paraGen = Gen.choose(0, 80)
      .flatMap(n => Gen.listOfN(n, paraChar).map(_.mkString))
    val docGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, paraGen))
    check(Prop.forAll(docGen) { paras =>
      Docx.parseDocx(Docx.buildDocx(paras)) match {
        case Right(got) => got == paras
        case Left(e) => throw new AssertionError(s"parse failed: $e")
      }
    }, cases = 150)
  }
}
