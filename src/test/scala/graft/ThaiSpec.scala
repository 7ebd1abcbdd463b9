package graft

import graft.core.{Analyzers, ThaiAnalyzer, ThaiTokens, Token}
import org.scalatest.funsuite.AnyFunSuite

/** Thai chain behavior pinned against the reference's OWN test vectors
  * (`lucene/analysis/common/src/test/org/apache/lucene/analysis/th/TestThaiAnalyzer.java`,
  * `TestThaiTokenizer.java`) — expected token arrays below are the reference
  * tests' expected arrays. Thai has no inter-word whitespace: segmentation
  * comes from the JRE's dictionary-based `BreakIterator`, the same component
  * the reference's `ThaiTokenizer` wraps, so segment boundaries agree by
  * construction; these vectors pin the full chain (segment → letter/digit
  * gate → lowercase → digit fold → stop holes) around it. */
class ThaiSpec extends AnyFunSuite {

  private val noStop = ThaiAnalyzer(stopWords = Set.empty)
  private val a = ThaiAnalyzer()

  test("JRE ships the Thai dictionary break iterator (ThaiTokenizer.DBBI_AVAILABLE)") {
    assert(ThaiTokens.DbbiAvailable)
  }

  test("dictionary segmentation (TestThaiAnalyzer.testOffsets vector)") {
    assert(noStop.tokenize("การที่ได้ต้องแสดงว่างานดี") ==
      Seq("การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี")
        .zipWithIndex.map { case (t, i) => Token(t, i) })
  }

  test("default stop set removes function words, leaving position holes (testStopWords)") {
    assert(a.tokenize("การที่ได้ต้องแสดงว่างานดี") ==
      Seq(Token("แสดง", 4), Token("งาน", 6), Token("ดี", 7)))
  }

  test("stop holes across Thai/latin boundaries (testPositionIncrements)") {
    val en = ThaiAnalyzer(stopWords = Analyzers.EnglishStopWords)
    val expect = Seq("การ" -> 0, "ที่" -> 1, "ได้" -> 2, "ต้อง" -> 3,
      "แสดง" -> 5, "ว่า" -> 6, "งาน" -> 7, "ดี" -> 8)
      .map { case (t, p) => Token(t, p) }
    assert(en.tokenize("การที่ได้ต้อง the แสดงว่างานดี") == expect)
    // stopword adjacent to thai text with no whitespace
    assert(en.tokenize("การที่ได้ต้องthe แสดงว่างานดี") == expect)
  }

  test("mixed thai/latin with punctuation (testReusableTokenStream vector)") {
    assert(noStop.tokenize("บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com").map(_.term) ==
      Seq("บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"))
    assert(noStop.tokenize("") == Seq.empty)
  }

  test("thai numerals fold to ascii digits (TestThaiTokenizer.testNumeralBreaking shape)") {
    // ๑๒๓ are THAI DIGIT ONE/TWO/THREE; the reference chain's DecimalDigitFilter
    assert(noStop.tokenize("๑๒๓").map(_.term) == Seq("123"))
  }

  test("ascii text degenerates to whitespace word split (corpus-shape guarantee)") {
    assert(noStop.tokenize("the fast key order sort").map(_.term) ==
      Seq("the", "fast", "key", "order", "sort"))
  }
}
