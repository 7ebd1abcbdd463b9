package graft

import graft.core.{Analyzers, Sorani, SoraniAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Sorani Kurdish chain pinned to the reference's COMPLETE shipped
  * vocabulary (`lucene/analysis/common/src/test/org/apache/lucene/analysis/ckb/ckbtestdata.zip`,
  * 8,272 `word \t expected` pairs run through the FULL analyzer exactly like
  * the reference's `assertVocabulary` in `TestSoraniStemFilter.java:121`) —
  * the fixture includes the UAX#29 edge entries with word-internal `.`/`:`
  * joiners, which the chain's UAX#29 scanner must keep intact. */
class SoraniSpec extends AnyFunSuite {

  test("full-chain parity over the reference's complete vocabulary") {
    val in = getClass.getResourceAsStream("/stemmers/ckb_testdata.tsv")
    require(in != null)
    val pairs = try Source.fromInputStream(in, "UTF-8").getLines().toVector.map { l =>
      val Array(w, s) = l.split('\t'); (w, s)
    } finally in.close()
    assert(pairs.size == 8272)
    val a = SoraniAnalyzer()
    val bad = pairs.filter { case (w, want) => a.tokenize(w).map(_.term) != Vector(want) }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 5: ${bad.take(5)}")
  }

  test("normalizer reference vectors (TestSoraniNormalizationFilter)") {
    // yeh forms → farsi yeh; kaf → keheh; heh+ZWNJ / final heh / teh
    // marbuta → AE; joining heh → heh; initial reh / rreh-above → rreh
    assert(Sorani.normalize("ي") == "ی")
    assert(Sorani.normalize("ك") == "ک")
    assert(Sorani.normalize("ه‌") == "ە")
    assert(Sorani.normalize("ھ") == "ه")
    assert(Sorani.normalize("ة") == "ە")
    assert(Sorani.normalize("رر") == "ڕر") // initial reh only
    assert(Sorani.normalize("ڒ") == "ڕ")
    assert(Sorani.normalize("بَـ") == "ب") // harakat + tatweel deleted
    // word-initial judged on the OUTPUT buffer: a reh that becomes position
    // 0 after deleting leading tatweel/format chars still converts, like the
    // reference's in-place scan (ADVICE r3 #3)
    assert(Sorani.normalize("ـر") == "ڕ") // tatweel + reh
    assert(Sorani.normalize("‎ر") == "ڕ") // LTR mark (format) + reh
  }

  test("stemmer suffix families (TestSoraniStemFilter vectors)") {
    assert(SoraniAnalyzer(Set.empty).tokenize("پیاوێک").map(_.term) == Vector("پیاو")) // -ek
    assert(SoraniAnalyzer(Set.empty).tokenize("دەرگایەک").map(_.term) == Vector("دەرگا")) // -yek
    assert(SoraniAnalyzer(Set.empty).tokenize("پیاوەكە").map(_.term) == Vector("پیاو")) // -aka
    assert(SoraniAnalyzer(Set.empty).tokenize("پیاوەکان").map(_.term) == Vector("پیاو")) // -akan
  }

  test("registry resolves the chain") {
    assert(Analyzers.byName("sorani").isInstanceOf[SoraniAnalyzer])
  }
}
