package graft

import graft.core.{Analyzers, TeluguAnalyzer, TeluguChain, TeluguNormalizer, TeluguStem}
import org.scalatest.funsuite.AnyFunSuite

/** Telugu chain parity: full generated-vocabulary vectors produced by the
  * REFERENCE `te/TeluguNormalizer+TeluguStemmer` composed with the Indic
  * normalizer exactly as `TeluguAnalyzer.createComponents` does (digit fold →
  * Indic normalize → Telugu normalize → stem, and — unlike every other Indic
  * chain — NO LowerCaseFilter), plus the reference unit-test vectors
  * (`TestTeluguNormalizer.java`, `TestTeluguStemmer.java`, which exercise the
  * filters in isolation). */
class TeluguSpec extends AnyFunSuite {

  private def chain(w: String): String = TeluguChain(w)._2

  private def norm(w: String): String = {
    val buf = w.toCharArray
    new String(buf, 0, TeluguNormalizer.normalize(buf, buf.length))
  }

  private def stem(w: String): String = {
    val buf = w.toCharArray
    new String(buf, 0, TeluguStem.stem(buf, buf.length))
  }

  test("Telugu chain: full generated-vocabulary parity (~9.7k reference vectors)") {
    val in = getClass.getResourceAsStream("/stemmers/te_vectors.tsv")
    require(in != null, "missing fixture te_vectors.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val vs = try src.getLines().filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
    }.toVector finally src.close()
    val bad = vs.filter { case (w, want) => chain(w) != want }
    assert(bad.isEmpty,
      s"${bad.size}/${vs.size} mismatches; first 15: " +
        bad.take(15).map { case (w, want) => s"$w -> ${chain(w)} (want $want)" }.mkString(", "))
  }

  test("normalizer unit vectors (TestTeluguNormalizer)") {
    assert(norm("పదాలూ") == "పదాలు")      // matra shortening
    assert(norm("అబ్బాయీ") == "అబ్బాయి")
    assert(norm("ఃౌైాిు") == "ౌైాిు")     // visarga removal
    assert(norm("ఔఐఆఈఊ") == "ఓఏఅఇఉ")  // vowel shortening
  }

  test("stemmer unit vectors (TestTeluguStemmer)") {
    assert(stem("వస్తువులు") == "వస్తువు") // plurals
    assert(stem("పన్నులు") == "పన్ను")
    assert(stem("చేపిస్తున్నది") == "చేపిస్తున్న") // verbs
    assert(stem("చేపిస్తున్నడు") == "చేపిస్తున్న")
  }

  test("analyzer composes stop on the normalized form and keeps ascii intact") {
    val a = TeluguAnalyzer()
    // ఒక is a stop word; ascii corpus tokens pass through unchanged
    assert(a.tokenize("spark ఒక merge").map(_.term) == Seq("spark", "merge"))
    assert(a.tokenize("spark ఒక merge").map(_.position) == Seq(0, 2))
    assert(Analyzers.byName("telugu").name == "telugu")
  }
}
