package graft

import graft.core.PatternAnalyzer
import graft.search._
import graft.search.Occur._
import org.scalatest.funsuite.AnyFunSuite

/** [[SimpleParser]] against the reference's own TestSimpleQueryParser
  * vectors (`queryparser/simple/TestSimpleQueryParser.java`): the parser
  * never throws — garbage degrades gracefully. The test analyzer is
  * whitespace-split + lowercase (the reference's MockAnalyzer shape), so
  * operator characters surviving escapes stay inside terms. */
class SimpleParserSpec extends AnyFunSuite {

  private val a = PatternAnalyzer("[ \t\n\r]+") // split mode, lowercases
  private def parse(s: String): Query = SimpleParser.parse(s, a)

  private def not(q: Query): Query =
    BooleanQuery(Seq(MUST_NOT -> q, SHOULD -> MatchAllDocsQuery))

  test("terms, fuzzy, phrase, prefix") {
    assert(parse("foobar") == TermQuery("foobar"))
    assert(parse("foobar~2") == FuzzyQuery("foobar", 2))
    assert(parse("foobar~") == FuzzyQuery("foobar", 2))   // missing = 2
    assert(parse("foobar~5") == FuzzyQuery("foobar", 2))  // capped at 2
    assert(parse("foobar~0") == TermQuery("foobar"))      // 0 = plain term
    assert(parse("\"foo bar\"") == PhraseQuery(Seq("foo", "bar")))
    assert(parse("\"foo bar\"~2") == PhraseQuery(Seq("foo", "bar"), 2))
    assert(parse("foobar*") == PrefixQuery("foobar"))
  }

  test("boolean operators, implicit and explicit") {
    val and = BooleanQuery(Seq(MUST -> TermQuery("foo"), MUST -> TermQuery("bar")))
    assert(parse("foo+bar") == and)
    assert(parse("foo +bar") == and)
    val or = BooleanQuery(Seq(SHOULD -> TermQuery("foo"), SHOULD -> TermQuery("bar")))
    assert(parse("foo|bar") == or)
    assert(parse("foo bar") == or) // implicit default operator
    assert(SimpleParser.parse("foo bar", a, defaultOperator = MUST) == and)
    assert(parse("-foo") == not(TermQuery("foo")))
    assert(parse("--foo") == TermQuery("foo")) // double negation cancels
  }

  test("crazy prefixes and disguised terms (escape interplay)") {
    assert(parse("st*ar*") == PrefixQuery("st*ar"))
    assert(parse("st*ar\\\\**") == PrefixQuery("st*ar\\*"))
    assert(parse("sT*Ar\\\\\\*") == TermQuery("st*ar\\*"))
  }

  test("garbage degrades, never throws") {
    assert(parse("star") == TermQuery("star"))
    assert(parse("star\n") == TermQuery("star"))
    assert(parse("") == MatchNoDocsQuery)
    assert(parse("  ") == MatchNoDocsQuery)
    assert(parse("*") == MatchAllDocsQuery)
    assert(parse("star wars +") ==
      BooleanQuery(Seq(SHOULD -> TermQuery("star"), SHOULD -> TermQuery("wars"))))
    assert(parse("star+wars") ==
      BooleanQuery(Seq(MUST -> TermQuery("star"), MUST -> TermQuery("wars"))))
    // unbalanced quote/paren: the opener is extraneous
    assert(parse("\"star wars") ==
      BooleanQuery(Seq(SHOULD -> TermQuery("star"), SHOULD -> TermQuery("wars"))))
    assert(parse("(star wars") ==
      BooleanQuery(Seq(SHOULD -> TermQuery("star"), SHOULD -> TermQuery("wars"))))
  }

  test("precedence groups re-nest on operation change") {
    // (foo | bar) + baz : the OR group is one clause of the AND
    val or = BooleanQuery(Seq(SHOULD -> TermQuery("foo"), SHOULD -> TermQuery("bar")))
    assert(parse("(foo|bar)+baz") ==
      BooleanQuery(Seq(MUST -> or, MUST -> TermQuery("baz"))))
    // operation change without parens re-nests the accumulated tree
    assert(parse("foo|bar+baz") ==
      BooleanQuery(Seq(
        MUST -> BooleanQuery(Seq(SHOULD -> TermQuery("foo"), SHOULD -> TermQuery("bar"))),
        MUST -> TermQuery("baz"))))
  }

  test("multi-token text under the default operator") {
    // one consumed token that the analyzer splits further (none here with
    // whitespace analyzer), and phrase-of-one degrades to a term
    assert(parse("\"foo\"") == TermQuery("foo"))
  }

  test("searcher integration: simple syntax end to end") {
    val s = new Searcher(SparkTestEnv.index, ScoringMode.PreciseBM25())
    val sp = s.scored(TermQuery("spark")).collect().map(_.getLong(0)).toSet
    val dup = s.scored(TermQuery("dup")).collect().map(_.getLong(0)).toSet
    val all = s.scored(MatchAllDocsQuery).collect().map(_.getLong(0)).toSet
    // "spark + -dup": AND of spark with the negated branch = spark \ dup
    val andNot = s.scored(SimpleParser.parse("spark + -dup", graft.core.SimpleAnalyzer))
      .collect().map(_.getLong(0)).toSet
    assert(andNot == (sp -- dup) && andNot.nonEmpty)
    // "spark -dup" under the SHOULD default is the reference's union with a
    // locally-negated branch: spark ∪ (all \ dup)
    val orNot = s.scored(SimpleParser.parse("spark -dup", graft.core.SimpleAnalyzer))
      .collect().map(_.getLong(0)).toSet
    assert(orNot == (sp ++ (all -- dup)))
  }
}
