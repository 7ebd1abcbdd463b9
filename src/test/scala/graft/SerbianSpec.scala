package graft

import graft.core.{SerbianAnalyzer, SerbianNormalization, SerbianSnowball}
import org.scalatest.funsuite.AnyFunSuite

/** Full-vocabulary parity for the Serbian chain: every (word, expected) pair
  * was produced by the REFERENCE composition (lowercase → SerbianStemmer →
  * SerbianNormalizationFilter, i.e. `createComponents` minus stop) over a
  * generated vocabulary (among-table suffix products + pseudo-stems +
  * Cyrillic/digraph triggers). */
class SerbianSpec extends AnyFunSuite {

  private def chain(w: String): String =
    SerbianNormalization(SerbianSnowball.stem(w))

  test("Serbian chain (snowball + normalization fold): full parity") {
    val in = getClass.getResourceAsStream("/stemmers/sr_vectors.tsv")
    require(in != null, "missing fixture sr_vectors.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val vs = try src.getLines().filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
    }.toVector finally src.close()
    val bad = vs.filter { case (w, want) => chain(w) != want }
    assert(bad.isEmpty,
      s"${bad.size}/${vs.size} mismatches; first 15: " +
        bad.take(15).map { case (w, want) => s"$w -> ${chain(w)} (want $want)" }.mkString(", "))
  }

  test("Serbian analyzer: stop before stem, both scripts") {
    val a = SerbianAnalyzer()
    // "ali" (Latin) and "и" (Cyrillic) are stop words; merge → merg (step-3
    // final-vowel drop in R1, reference parity)
    assert(a.tokenize("spark ali merge").map(_.term) == Seq("spark", "merg"))
    assert(a.tokenize("spark и merge").map(_.position) == Seq(0, 2))
  }
}
