package graft

import graft.core.{Analyzers, DaitchMokotoffAnalyzer, DoubleMetaphoneAnalyzer, PhoneticAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

/** DoubleMetaphone chain ([[DoubleMetaphoneAnalyzer]]): the reference's own
  * `TestDoubleMetaphoneFilter.java:30-69` vectors — same commons-codec
  * encoder, same token-graph shape. */
class PhoneticSpec extends AnyFunSuite {

  private def terms(a: graft.core.Analyzer, text: String): Seq[String] =
    a.tokenize(text).map(_.term)
  private def withPos(a: graft.core.Analyzer, text: String): Seq[(String, Int)] =
    a.tokenize(text).map(t => (t.term, t.position))

  test("size-4 inject=false replaces the token with its primary code") {
    assert(terms(DoubleMetaphoneAnalyzer(4, inject = false), "international") == Seq("ANTR"))
  }

  test("size-4 inject=true keeps the original alongside the code") {
    assert(terms(DoubleMetaphoneAnalyzer(4, inject = true), "international") ==
      Seq("international", "ANTR"))
    // injected code shares the token's position
    assert(withPos(DoubleMetaphoneAnalyzer(4, inject = true), "international spark") ==
      Seq(("international", 0), ("ANTR", 0), ("spark", 1), ("SPRK", 1)))
  }

  test("alternate code: Kuczewski emits both encodings") {
    assert(terms(DoubleMetaphoneAnalyzer(4, inject = false), "Kuczewski") ==
      Seq("KSSK", "KXFS"))
  }

  test("size-8 inject=false") {
    assert(terms(DoubleMetaphoneAnalyzer(8, inject = false), "international") ==
      Seq("ANTRNXNL"))
  }

  test("non-convertible tokens pass through in both modes") {
    assert(terms(DoubleMetaphoneAnalyzer(8, inject = true), "12345") == Seq("12345"))
    assert(terms(DoubleMetaphoneAnalyzer(8, inject = false), "12345") == Seq("12345"))
  }

  test("generic PhoneticFilter: TestPhoneticFilter vectors (code first in inject)") {
    val in = "aaa bbb ccc easgasg"
    assert(terms(PhoneticAnalyzer("Metaphone"), in) ==
      Seq("A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"))
    assert(terms(PhoneticAnalyzer("Metaphone", inject = false), in) ==
      Seq("A", "B", "KKK", "ESKS"))
    assert(terms(PhoneticAnalyzer("DoubleMetaphone"), in) ==
      Seq("A", "aaa", "PP", "bbb", "KK", "ccc", "ASKS", "easgasg"))
    assert(terms(PhoneticAnalyzer("Soundex"), in) ==
      Seq("A000", "aaa", "B000", "bbb", "C000", "ccc", "E220", "easgasg"))
    assert(terms(PhoneticAnalyzer("Soundex", inject = false), in) ==
      Seq("A000", "B000", "C000", "E220"))
    assert(terms(PhoneticAnalyzer("RefinedSoundex"), in) ==
      Seq("A0", "aaa", "B1", "bbb", "C3", "ccc", "E034034", "easgasg"))
    // injected code shares the original's position
    assert(withPos(PhoneticAnalyzer("Soundex"), "aaa bbb") ==
      Seq(("A000", 0), ("aaa", 0), ("B000", 1), ("bbb", 1)))
  }

  test("DaitchMokotoff: branch fan-out (TestDaitchMokotoffSoundexFilter vectors)") {
    val in = "aaa bbb ccc easgasg"
    assert(terms(DaitchMokotoffAnalyzer(), in) ==
      Seq("aaa", "000000", "bbb", "700000", "ccc", "400000", "450000",
        "454000", "540000", "545000", "500000", "easgasg", "045450"))
    assert(terms(DaitchMokotoffAnalyzer(inject = false), in) ==
      Seq("000000", "700000", "400000", "450000", "454000", "540000",
        "545000", "500000", "045450"))
  }

  test("registry round-trip") {
    val a = DoubleMetaphoneAnalyzer(4, inject = false)
    assert(Analyzers.byName(a.name) == a)
    val p = PhoneticAnalyzer("Soundex", inject = false)
    assert(Analyzers.byName(p.name) == p)
    val dm = DaitchMokotoffAnalyzer(inject = false)
    assert(Analyzers.byName(dm.name) == dm)
  }
}
