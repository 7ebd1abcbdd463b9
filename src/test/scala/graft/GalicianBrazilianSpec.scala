package graft

import graft.core.{BrazilianAnalyzer, BrazilianStem, GalicianAnalyzer, GalicianStem}
import org.scalatest.funsuite.AnyFunSuite

/** Full-vocabulary parity for the Galician (RSLP) and Brazilian chains:
  * every (word, expected) pair was produced by the REFERENCE stemmer
  * (lowercase → stem, the `createComponents` composition minus stop) over
  * generated vocabularies (rule-table suffix products + pseudo-stems +
  * exception words). */
class GalicianBrazilianSpec extends AnyFunSuite {

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

  test("Galician RSLP chain: full parity") {
    assertParity("gl_vectors.tsv", GalicianStem.stem)
  }

  test("Brazilian chain: full parity (filter keeps original on null/unchanged)") {
    assertParity("br_vectors.tsv", { w =>
      val s = BrazilianStem.stem(w)
      if (s != null && s != w) s else w
    })
  }

  test("Brazilian analyzer: stop before stem") {
    val a = BrazilianAnalyzer()
    // "uma" is a stop word; spark/merge pass through (len>2, no suffix hits)
    assert(a.tokenize("spark uma merge").map(_.term) == Seq("spark", "merg"))
    assert(a.tokenize("spark uma merge").map(_.position) == Seq(0, 2))
  }

  test("Galician analyzer: stop before stem, position holes kept") {
    val a = GalicianAnalyzer()
    // "unha" is a stop word; "luns" is an exception for the ns→n rule but the
    // later bare-s rule still strips (reference behavior: luns → lun)
    assert(a.tokenize("spark unha luns").map(_.term) == Seq("spark", "lun"))
    assert(a.tokenize("spark unha luns").map(_.position) == Seq(0, 2))
  }
}
