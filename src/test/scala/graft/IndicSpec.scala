package graft

import graft.core.{BengaliNormalizer, BengaliStem, BulgarianStem, HindiNormalizer, HindiStem, IndicChains, LatvianStem}
import org.scalatest.funsuite.AnyFunSuite

/** Full-vocabulary parity for the Bulgarian / Latvian / Hindi / Bengali
  * chains: every (word, expected) pair was produced by the REFERENCE
  * implementations over generated vocabularies (suffix-table products +
  * pseudo-stems + normalizer triggers). Hindi/Bengali vectors pin the whole
  * per-token chain (lowercase → digit fold → Indic normalize → language
  * normalize → stem); Bulgarian/Latvian pin the stemmers. */
class IndicSpec extends AnyFunSuite {

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

  test("Bulgarian light stemmer: full generated-vocabulary parity") {
    assertParity("bg_vectors.tsv", BulgarianStem.stem)
  }

  test("Latvian light stemmer: full generated-vocabulary parity") {
    assertParity("lv_vectors.tsv", LatvianStem.stem)
  }

  test("Hindi chain (digits + Indic + Hindi normalize + stem): full parity") {
    assertParity("hi_vectors.tsv",
      w => IndicChains(w, HindiNormalizer.normalize, HindiStem.stem)._2)
  }

  test("Bengali chain (digits + Indic + Bengali normalize + stem): full parity") {
    assertParity("bn_vectors.tsv",
      w => IndicChains(w, BengaliNormalizer.normalize, BengaliStem.stem)._2)
  }
}
