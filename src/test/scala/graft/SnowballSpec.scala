package graft

import graft.core.{DanishSnowball, DutchSnowball, RomanianSnowball, TurkishSnowball}
import org.scalatest.funsuite.AnyFunSuite

/** Full-vocabulary parity for the Snowball-family stemmers: every (word,
  * stem) pair in the fixtures was produced by the reference implementation
  * (org.tartarus.snowball.ext.*Stemmer over generated per-language
  * vocabularies: stopword lists, suffix-table products, and pseudo-stems).
  * Parity is asserted pairwise, like the UniNE family in LightStemmersSpec. */
class SnowballSpec extends AnyFunSuite {

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

  private def assertParity(name: String, stem: String => String): Unit = {
    val vs = vectors(name)
    val bad = vs.filter { case (w, want) => stem(w) != want }
    assert(bad.isEmpty,
      s"$name: ${bad.size}/${vs.size} mismatches; first 15: " +
        bad.take(15).map { case (w, want) => s"$w -> ${stem(w)} (want $want)" }.mkString(", "))
  }

  test("Danish snowball: full generated-vocabulary parity") {
    assertParity("da_vectors.tsv", DanishSnowball.stem)
  }

  test("Dutch snowball: full generated-vocabulary parity") {
    assertParity("nl_vectors.tsv", DutchSnowball.stem)
  }

  test("Romanian snowball: full generated-vocabulary parity") {
    assertParity("ro_vectors.tsv", RomanianSnowball.stem)
  }

  test("Turkish snowball: full generated-vocabulary parity") {
    assertParity("tr_vectors.tsv", TurkishSnowball.stem)
  }

  test("Greek stemmer: full generated-vocabulary parity") {
    assertParity("el_vectors.tsv", graft.core.GreekStem.stem)
  }

  test("Irish snowball: full generated-vocabulary parity") {
    assertParity("ga_vectors.tsv", graft.core.IrishSnowball.stem)
  }

  test("Armenian snowball: full generated-vocabulary parity") {
    assertParity("hy_vectors.tsv", graft.core.ArmenianSnowball.stem)
  }

  test("Lithuanian snowball: full generated-vocabulary parity") {
    assertParity("lt_vectors.tsv", graft.core.LithuanianSnowball.stem)
  }

  test("Catalan snowball: full generated-vocabulary parity") {
    assertParity("ca_vectors.tsv", graft.core.CatalanSnowball.stem)
  }

  test("Basque snowball: full generated-vocabulary parity") {
    assertParity("eu_vectors.tsv", graft.core.BasqueSnowball.stem)
  }

  test("Estonian snowball: full generated-vocabulary parity") {
    assertParity("et_vectors.tsv", graft.core.EstonianSnowball.stem)
  }
}
