package graft

import graft.core.{Analyzers, DoubleMetaphoneAnalyzer}
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

  test("registry round-trip") {
    val a = DoubleMetaphoneAnalyzer(4, inject = false)
    assert(Analyzers.byName(a.name) == a)
  }
}
