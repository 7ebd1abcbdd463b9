package graft

import graft.search._
import org.scalatest.funsuite.AnyFunSuite

class GraphSynonymSpec extends AnyFunSuite {

  test("all-single-token alternatives compile to SynonymQuery") {
    val q = SynonymGraph.expand(Seq("fast"),
      Seq(SynonymRule(Seq("fast"), Seq(Seq("quick"), Seq("rapid")))))
    assert(q == SynonymQuery(Seq("fast", "quick", "rapid")))
  }

  test("multi-token output becomes a SHOULD boolean of term + phrase") {
    val q = SynonymGraph.expand(Seq("stream"),
      Seq(SynonymRule(Seq("stream"), Seq(Seq("spark", "batch")))))
    assert(q == BooleanQuery(Seq(
      Occur.SHOULD -> TermQuery("stream"),
      Occur.SHOULD -> PhraseQuery(Seq("spark", "batch")))))
  }

  test("multi-token INPUT is consumed whole (leftmost-longest)") {
    // "new york" -> ny must swallow both tokens, leaving "pizza" a plain term
    val q = SynonymGraph.expand(Seq("new", "york", "pizza"),
      Seq(SynonymRule(Seq("new", "york"), Seq(Seq("ny")))))
    assert(q == BooleanQuery(Seq(
      Occur.MUST -> BooleanQuery(Seq(
        Occur.SHOULD -> PhraseQuery(Seq("new", "york")),
        Occur.SHOULD -> TermQuery("ny"))),
      Occur.MUST -> TermQuery("pizza"))))
  }

  test("longest rule wins over a shorter rule sharing the first token") {
    val rules = Seq(
      SynonymRule(Seq("new"), Seq(Seq("novel"))),
      SynonymRule(Seq("new", "york"), Seq(Seq("ny"))))
    val q = SynonymGraph.expand(Seq("new", "york"), rules)
    assert(q == BooleanQuery(Seq(
      Occur.SHOULD -> PhraseQuery(Seq("new", "york")),
      Occur.SHOULD -> TermQuery("ny"))))
    // but a bare "new" (no following "york") still takes the short rule
    assert(SynonymGraph.expand(Seq("new", "data"), rules) ==
      BooleanQuery(Seq(
        Occur.MUST -> SynonymQuery(Seq("new", "novel")),
        Occur.MUST -> TermQuery("data"))))
  }

  test("unmatched tokens pass through; SHOULD operator mode; empty input") {
    assert(SynonymGraph.expand(Seq("a", "b"), Nil) ==
      BooleanQuery(Seq(Occur.MUST -> TermQuery("a"), Occur.MUST -> TermQuery("b"))))
    assert(SynonymGraph.expand(Seq("a", "b"), Nil, Occur.SHOULD) ==
      BooleanQuery(Seq(Occur.SHOULD -> TermQuery("a"), Occur.SHOULD -> TermQuery("b"))))
    assert(SynonymGraph.expand(Nil, Nil) == MatchNoDocsQuery)
    intercept[IllegalArgumentException] {
      SynonymGraph.expand(Seq("a"), Nil, Occur.MUST_NOT)
    }
  }

  test("end-to-end: expanded query matches the brute-force doc predicate") {
    import SparkTestEnv._
    val searcher = new Searcher(index, ScoringMode.PreciseBM25())
    val q = SynonymGraph.expand(Seq("fast", "stream"),
      Seq(SynonymRule(Seq("stream"), Seq(Seq("spark", "batch")))))
    val got = searcher.scored(q).collect().map(_.getLong(0)).toSet
    val expected = corpus.collect { case (doc, toks) =>
      val terms = toks.map(_.term)
      val hasPhrase = terms.sliding(2).exists(p => p.length == 2 &&
        p(0) == "spark" && p(1) == "batch")
      if (terms.contains("fast") && (terms.contains("stream") || hasPhrase)) Some(doc)
      else None
    }.flatten.toSet
    assert(got == expected)
    assert(got.nonEmpty) // the gate corpus must actually exercise the graph path
  }
}
