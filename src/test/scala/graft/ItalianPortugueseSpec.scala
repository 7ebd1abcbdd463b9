package graft

import graft.core.{Analyzers, ItalianAnalyzer, ItalianLightStem, PortugueseAnalyzer, PortugueseLightStem, Token}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Italian / Portuguese light stemmers pinned against the reference's OWN
  * shipped stemmer vocabularies
  * (`lucene/analysis/common/src/test/org/apache/lucene/analysis/it/itlighttestdata.zip`,
  * `pt/ptlighttestdata.zip`; each line `word \t expected-stem`). The
  * committed fixtures are deterministic samples (~7k IT / ~6k PT pairs,
  * biased toward rule-exercising pairs) — the engine stemmers are EXACT
  * re-expressions, so parity is asserted on every sampled pair, not a
  * divergence bound. */
class ItalianPortugueseSpec extends AnyFunSuite {

  private def pairs(name: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/stemmers/$name")
    require(in != null, s"missing resource $name")
    try Source.fromInputStream(in, "UTF-8").getLines().toVector.map { l =>
      val Array(w, s) = l.split('\t'); (w, s)
    } finally in.close()
  }

  test("ItalianLightStem matches the reference vocabulary exactly") {
    val vocab = pairs("itlight_sample.tsv")
    val bad = vocab.filter { case (w, exp) => ItalianLightStem.stem(w) != exp }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 10: ${bad.take(10)}")
    assert(vocab.size > 7000)
  }

  test("PortugueseLightStem matches the reference vocabulary exactly") {
    val vocab = pairs("ptlight_sample.tsv")
    val bad = vocab.filter { case (w, exp) => PortugueseLightStem.stem(w) != exp }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 10: ${bad.take(10)}")
    assert(vocab.size > 6000)
  }

  test("Portuguese paper example sentence (TestPortugueseLightStemFilter.testExamples)") {
    val words = ("o debate político pelo menos o que vem a público parece de modo nada " +
      "surpreendente restrito a temas menores mas há evidentemente " +
      "grandes questões em jogo nas eleições que se aproximam").split(' ')
    val expected = Seq("o", "debat", "politic", "pelo", "meno", "o", "que", "vem", "a",
      "public", "parec", "de", "modo", "nada", "surpreendent", "restrit", "a", "tema",
      "menor", "mas", "há", "evident", "grand", "questa", "em", "jogo", "nas",
      "eleica", "que", "se", "aproximam")
    assert(words.toSeq.map(PortugueseLightStem.stem) == expected)
  }

  test("Italian chain: elision strips without consuming a position; stop keeps increments") {
    val a = ItalianAnalyzer()
    // l'arte → arte (one token, position 0); 'della' is a stop word
    assert(a.tokenize("l'arte della guerra") ==
      Seq(Token("arte", 0), Token("guerr", 2)))
  }

  test("Italian chain: standalone article is NOT elision — stop filter keeps its increment") {
    val a = ItalianAnalyzer()
    // "un" with no apostrophe goes to the STOP filter (position preserved,
    // like the reference's ElisionFilter → StopFilter pipeline), so the
    // following words keep their positions and phrases cannot match across
    // the gap (ADVICE r3 #1)
    assert(a.tokenize("un libro bello") ==
      Seq(Token("libro", 1), Token("bello", 2)))
    // with a custom stop set lacking "un", the standalone token SURVIVES
    assert(ItalianAnalyzer(stopWords = Set.empty).tokenize("un libro").map(_.term) ==
      Seq("un", "libro"))
    // apostrophe-attached "un'" still elides without consuming a position
    assert(a.tokenize("un'arte vera") ==
      Seq(Token("arte", 0), Token("vera", 1)))
  }

  test("Portuguese chain: stop filter before stemming, increments kept") {
    val a = PortugueseAnalyzer()
    assert(a.tokenize("as grandes tabelas") == Seq(Token("grand", 1), Token("tabel", 2)))
  }

  test("registry round-trip") {
    assert(Analyzers.byName("italian").tokenize("finestra").map(_.term) == Seq("finestr"))
    assert(Analyzers.byName("portuguese").tokenize("janelas").map(_.term) == Seq("janel"))
  }
}
