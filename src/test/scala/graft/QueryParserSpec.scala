package graft

import graft.core.SimpleAnalyzer
import graft.search._
import org.scalatest.funsuite.AnyFunSuite

class QueryParserSpec extends AnyFunSuite {
  private def p(s: String): Query = QueryParser.parse(s, SimpleAnalyzer)

  test("bare term") { assert(p("Spark") == TermQuery("spark")) }

  test("two bare terms are SHOULD clauses") {
    assert(p("a b") == BooleanQuery(Seq(Occur.SHOULD -> TermQuery("a"), Occur.SHOULD -> TermQuery("b"))))
  }

  test("AND upgrades both sides to MUST") {
    assert(p("a AND b") == BooleanQuery(Seq(Occur.MUST -> TermQuery("a"), Occur.MUST -> TermQuery("b"))))
  }

  test("OR keeps SHOULD") {
    assert(p("a OR b") == BooleanQuery(Seq(Occur.SHOULD -> TermQuery("a"), Occur.SHOULD -> TermQuery("b"))))
  }

  test("plus/minus prefixes") {
    assert(p("+a -b c") == BooleanQuery(Seq(
      Occur.MUST -> TermQuery("a"), Occur.MUST_NOT -> TermQuery("b"), Occur.SHOULD -> TermQuery("c"))))
  }

  test("NOT operator") {
    assert(p("a NOT b") == BooleanQuery(Seq(
      Occur.SHOULD -> TermQuery("a"), Occur.MUST_NOT -> TermQuery("b"))))
  }

  test("phrase, analyzed") {
    assert(p("\"Batch BATCH\"") == PhraseQuery(Seq("batch", "batch")))
  }

  test("single-token phrase collapses to term") {
    assert(p("\"batch\"") == TermQuery("batch"))
  }

  test("phrase slop suffix") {
    assert(p("\"a b\"~2") == PhraseQuery(Seq("a", "b"), 2))
    assert(p("\"a b\"~0") == PhraseQuery(Seq("a", "b")))
    assert(p("\"a b\"~1^2") == BoostQuery(PhraseQuery(Seq("a", "b"), 1), 2f))
    intercept[QueryParser.ParseException](p("\"a b\"~"))
  }

  test("fuzzy with default and explicit edits") {
    assert(p("spark~") == FuzzyQuery("spark", 2))
    assert(p("spark~1") == FuzzyQuery("spark", 1))
  }

  test("wildcard and prefix") {
    assert(p("qu?ry") == WildcardQuery("qu?ry"))
    assert(p("st*") == WildcardQuery("st*"))
  }

  test("regexp") { assert(p("/(fast|slow)/") == RegexpQuery("(fast|slow)")) }

  test("ranges") {
    assert(p("[agg TO batch]") == TermRangeQuery(Some("agg"), Some("batch"), true, true))
    assert(p("{agg TO batch}") == TermRangeQuery(Some("agg"), Some("batch"), false, false))
    assert(p("[agg TO *]") == TermRangeQuery(Some("agg"), None, true, true))
  }

  test("boosts on term, phrase, group") {
    assert(p("a^2") == BoostQuery(TermQuery("a"), 2f))
    assert(p("\"a b\"^0.5") == BoostQuery(PhraseQuery(Seq("a", "b")), 0.5f))
    assert(p("(a OR b)^3") == BoostQuery(
      BooleanQuery(Seq(Occur.SHOULD -> TermQuery("a"), Occur.SHOULD -> TermQuery("b"))), 3f))
  }

  test("grouping combines with outer clauses") {
    assert(p("(a OR b) AND c") == BooleanQuery(Seq(
      Occur.MUST -> BooleanQuery(Seq(Occur.SHOULD -> TermQuery("a"), Occur.SHOULD -> TermQuery("b"))),
      Occur.MUST -> TermQuery("c"))))
  }

  test("field prefix is accepted and stripped") {
    assert(p("text:spark") == TermQuery("spark"))
    assert(p("text:\"a b\"") == PhraseQuery(Seq("a", "b")))
    assert(p("text:[agg TO batch]") == TermRangeQuery(Some("agg"), Some("batch"), true, true))
  }

  test("multi-token word becomes phrase") {
    assert(p("e-mail") == PhraseQuery(Seq("e", "mail")))
  }

  test("parse errors") {
    intercept[QueryParser.ParseException](p("\"unterminated"))
    intercept[QueryParser.ParseException](p("(a OR b"))
    intercept[QueryParser.ParseException](p("a AND"))
  }
}

class SpanMatcherSpec extends AnyFunSuite {
  import graft.search.SpanMatcher.matches

  test("ordered within window") {
    assert(matches(Array(Array(5), Array(7)), window = 3, inOrder = true))
    assert(!matches(Array(Array(5), Array(9)), window = 3, inOrder = true))
    assert(!matches(Array(Array(7), Array(5)), window = 3, inOrder = true))
  }

  test("unordered within window") {
    assert(matches(Array(Array(7), Array(5)), window = 3, inOrder = false))
    assert(!matches(Array(Array(7), Array(3)), window = 3, inOrder = false))
  }

  test("duplicate terms need distinct positions") {
    assert(!matches(Array(Array(4), Array(4)), window = 5, inOrder = false))
    assert(matches(Array(Array(4, 6), Array(4)), window = 5, inOrder = false))
  }

  test("three terms ordered") {
    assert(matches(Array(Array(1, 10), Array(2, 20), Array(3, 30)), window = 3, inOrder = true))
    assert(!matches(Array(Array(1, 10), Array(2, 20), Array(30)), window = 3, inOrder = true))
  }
}
