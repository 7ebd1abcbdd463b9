package graft

import graft.core.{Analyzers, CzechAnalyzer, CzechStem}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Czech light stemmer pinned to the reference's complete `TestCzechStemmer`
  * vector set (143 pairs covering all seven noun paradigms, adjectives,
  * possessives, and the don't-overstem guards), extracted verbatim into
  * `cz_vectors.tsv`. */
class CzechSpec extends AnyFunSuite {

  test("all reference vectors match exactly") {
    val in = getClass.getResourceAsStream("/stemmers/cz_vectors.tsv")
    require(in != null)
    val pairs = try Source.fromInputStream(in, "UTF-8").getLines().toVector.map { l =>
      val Array(w, s) = l.split('\t'); (w, s)
    } finally in.close()
    assert(pairs.size == 143)
    // the chain lowercases before the stemmer (the fixture keeps the raw
    // test inputs, e.g. "Karlův")
    val bad = pairs.filter { case (w, want) => CzechStem.stem(w.toLowerCase) != want }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 10: ${bad.take(10)}")
  }

  test("palatalization normalizations") {
    // c/č → k, z/ž → h, e-elision, ů → o (reference normalize())
    assert(CzechStem.stem("soudce") == "soudk")
    assert(CzechStem.stem("muži") == "muh")
    assert(CzechStem.stem("písně") == "písn")
  }

  test("chain + registry") {
    val toks = CzechAnalyzer().tokenize("a hrady na horách")
    // "a", "na" stopped; stems keep positions
    assert(toks.map(_.term) == Vector("hrad", "hor"))
    assert(toks.map(_.position) == Vector(1, 3))
    assert(Analyzers.byName("czech").isInstanceOf[CzechAnalyzer])
  }
}
