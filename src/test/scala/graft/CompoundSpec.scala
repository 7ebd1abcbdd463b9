package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Compound-word decomposition parity with the reference's
  * `TestCompoundWordTokenFilter` vectors (dictionary variant; the
  * hyphenation-grammar variant is a declared non-goal — it needs the
  * shipped XML hyphenation grammars, which are data files, and the
  * dictionary filter is the recall mechanism both share). */
class CompoundSpec extends AnyFunSuite {

  private val seDict = CompoundWordDictionary(Set(
    "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar", "Glas",
    "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll", "Sko", "Vind",
    "Rute", "Torkare", "Blad"))

  test("testDumbCompoundWordsSE: brute-force subwords, original passes through") {
    // expected per-token output from TestCompoundWordTokenFilter.java:147-
    // (original first, then subwords — posInc 0 ≡ same stacked position)
    val expect = Map(
      "Bildörr" -> Seq("Bil", "dörr"),
      "Bilmotor" -> Seq("Bil", "motor"),
      "Biltak" -> Seq("Bil", "tak"),
      "Slagborr" -> Seq("Slag", "borr"),
      "Hammarborr" -> Seq("Hammar", "borr"),
      "Pelarborr" -> Seq("Pelar", "borr"),
      "Glasögonfodral" -> Seq("Glas", "ögon", "fodral"),
      "Basfiolsfodral" -> Seq("Bas", "fiol", "fodral"),
      "Basfiolsfodralmakaregesäll" -> Seq("Bas", "fiol", "fodral", "makare", "gesäll"),
      "Skomakare" -> Seq("Sko", "makare"),
      "Vindrutetorkare" -> Seq("Vind", "rute", "torkare"),
      "Vindrutetorkarblad" -> Seq("Vind", "rute", "blad"),
      "abba" -> Seq())
    expect.foreach { case (word, subs) =>
      assert(seDict.decompose(word) == subs, word)
    }
  }

  test("testDumbCompoundWordsSELongestMatch: longest hit per start, scan skips past it") {
    val dict = CompoundWordDictionary(Set(
      "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
      "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare", "Gesäll", "Sko",
      "Vind", "Rute", "Torkare", "Blad", "Fiolsfodral"),
      onlyLongestMatchNoSubwords = true)
    assert(dict.decompose("Basfiolsfodralmakaregesäll") ==
      Seq("Bas", "fiolsfodral", "makare", "gesäll"))
  }

  test("onlyLongestMatch without the skip keeps per-start longest hits only") {
    // DictionaryCompoundWordTokenFilter.java:85-95: longestMatchToken per i
    val dict = CompoundWordDictionary(Set("basket", "basketball", "ball", "kurv"),
      onlyLongestMatch = true, maxSubwordSize = 40)
    // i=0: basketball beats basket; ball and kurv still found at their starts
    assert(dict.decompose("basketballkurv") == Seq("basketball", "ball", "kurv"))
  }

  test("testTokenEndingWithWordComponentOfMinimumLength") {
    val dict = CompoundWordDictionary(Set("ab", "cd", "ef"))
    assert(dict.decompose("abcdef") == Seq("ab", "cd", "ef"))
  }

  test("testWordComponentWithLessThanMinimumLength: sub-minimum entries never match") {
    val dict = CompoundWordDictionary(Set("abc", "d", "efg"))
    assert(dict.decompose("abcdefg") == Seq("abc", "efg"))
  }

  test("testReset word: subwords preserve the input's case, not the dictionary's") {
    val dict = CompoundWordDictionary(Set(
      "Rind", "Fleisch", "Draht", "Schere", "Gesetz", "Aufgabe", "Überwachung"))
    assert(dict.decompose("Rindfleischüberwachungsgesetz") ==
      Seq("Rind", "fleisch", "überwachung", "gesetz"))
  }

  test("minWordSize gate: short tokens pass through undecomposed") {
    val dict = CompoundWordDictionary(Set("ab", "cd"))
    assert(dict.decompose("abcd") == Seq()) // len 4 < minWordSize 5
    assert(dict.decompose("abcdx") == Seq("ab", "cd"))
  }

  test("German chain stacks stemmed subwords at the parent's position") {
    val a = GermanAnalyzer(compound = Some(CompoundWordDictionary(
      Set("cust", "tom", "win", "dow", "park", "tab", "able", "col", "umn"))))
    val toks = a.tokenize("customer window table")
    // customer → custom(er-strip) + cust + tom; window → window + win + dow;
    // table → tabl(e-strip) + tab + abl(e-strip)
    assert(toks.map(t => (t.term, t.position)) == Seq(
      ("custom", 0), ("cust", 0), ("tom", 0),
      ("window", 1), ("win", 1), ("dow", 1),
      ("tabl", 2), ("tab", 2), ("abl", 2)))
  }

  test("Dutch chain stacks snowball-stemmed subwords at the parent's position") {
    val a = DutchAnalyzer(compound = Some(CompoundWordDictionary(
      Set("basketbal", "basket", "bal"), maxSubwordSize = 40)))
    val toks = a.tokenize("basketbalspeler")
    assert(toks.head.term == DutchSnowball.stem("basketbalspeler"))
    // every subword rides at position 0 alongside the original
    assert(toks.forall(_.position == 0))
    assert(toks.map(_.term).contains(DutchSnowball.stem("basketbal")))
    assert(toks.map(_.term).contains(DutchSnowball.stem("bal")))
  }
}
