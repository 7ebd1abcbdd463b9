package graft

import graft.core.{IndicChains, NepaliAnalyzer, NepaliSnowball, TamilAnalyzer, TamilSnowball}
import org.scalatest.funsuite.AnyFunSuite

/** Full-vocabulary parity for the Nepali / Tamil chains: every (word,
  * expected) pair was produced by the REFERENCE chain (lowercase → digit
  * fold → Indic normalize → snowball stem — the full `createComponents`
  * composition minus stop) over generated vocabularies (snowball
  * among-table products + pseudo-stems + normalizer triggers). */
class NepaliTamilSpec extends AnyFunSuite {

  private def vectors(name: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/stemmers/$name")
    require(in != null, s"missing fixture $name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      (l.substring(0, i), l.substring(i + 1))
    }.toVector
    finally src.close()
  }

  private def assertParity(name: String, f: String => String): Unit = {
    val vs = vectors(name)
    val bad = vs.filter { case (w, want) => f(w) != want }
    assert(bad.isEmpty,
      s"$name: ${bad.size}/${vs.size} mismatches; first 15: " +
        bad.take(15).map { case (w, want) => s"$w -> ${f(w)} (want $want)" }.mkString(", "))
  }

  test("Nepali chain (digits + Indic normalize + snowball): full parity") {
    assertParity("ne_vectors.tsv",
      w => NepaliSnowball.stem(IndicChains.normalizeOnly(w)))
  }

  test("Tamil chain (digits + Indic normalize + snowball): full parity") {
    assertParity("ta_vectors.tsv",
      w => TamilSnowball.stem(IndicChains.normalizeOnly(w)))
  }

  test("Tamil analyzer: stop on normalized form, ascii identity") {
    val a = TamilAnalyzer()
    // ஒரு is a stop word; ascii tokens survive the chain unchanged
    assert(a.tokenize("spark ஒரு merge").map(_.term) == Seq("spark", "merge"))
    assert(a.tokenize("spark ஒரு merge").map(_.position) == Seq(0, 2))
  }

  test("Nepali analyzer: stop on normalized form, ascii identity") {
    val a = NepaliAnalyzer()
    // छ is a stop word AND a category-3 suffix; stop must win (runs first)
    assert(a.tokenize("spark छ merge").map(_.term) == Seq("spark", "merge"))
    assert(a.tokenize("spark छ merge").map(_.position) == Seq(0, 2))
  }
}
