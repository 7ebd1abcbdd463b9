package graft.core

/** Czech light stemmer — exact re-expression of the reference's
  * `CzechStemmer` (Dolamic & Savoy's algorithm;
  * `lucene/analysis/common/src/java/org/apache/lucene/analysis/cz/CzechStemmer.java:27-151`):
  * case-suffix removal, possessive removal, then the palatalization
  * normalization (čt→ck, št→sk, c/č→k, z/ž→h, the e-elision and ů→o
  * folds). Input is expected lowercased with diacritics intact, like the
  * reference. */
object CzechStem {
  private val case3 = Array("ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
    "ěte", "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách",
    "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
  private val case2 = Array("em", "es", "ém", "ím", "ům", "at", "ám", "os",
    "us", "ým", "mi", "ou")
  private val finalVowels = "aeiouůyáéíýě".toSet

  def stem(term: String): String = {
    var s = removeCase(term)
    s = removePossessives(s)
    if (s.nonEmpty) s = normalize(s)
    s
  }

  private def removeCase(s: String): String = {
    val n = s.length
    if (n > 7 && s.endsWith("atech")) return s.substring(0, n - 5)
    if (n > 6 && (s.endsWith("ětem") || s.endsWith("etem") || s.endsWith("atům")))
      return s.substring(0, n - 4)
    if (n > 5 && case3.exists(s.endsWith)) return s.substring(0, n - 3)
    if (n > 4 && case2.exists(s.endsWith)) return s.substring(0, n - 2)
    if (n > 3 && finalVowels.contains(s.charAt(n - 1))) return s.substring(0, n - 1)
    s
  }

  private def removePossessives(s: String): String = {
    val n = s.length
    if (n > 5 && (s.endsWith("ov") || s.endsWith("in") || s.endsWith("ův")))
      s.substring(0, n - 2)
    else s
  }

  private def normalize(s: String): String = {
    val n = s.length
    if (s.endsWith("čt")) return s.substring(0, n - 2) + "ck"
    if (s.endsWith("št")) return s.substring(0, n - 2) + "sk"
    s.charAt(n - 1) match {
      case 'c' | 'č' => return s.substring(0, n - 1) + "k"
      case 'z' | 'ž' => return s.substring(0, n - 1) + "h"
      case _ =>
    }
    if (n > 1 && s.charAt(n - 2) == 'e')
      return s.substring(0, n - 2) + s.charAt(n - 1) // e-elision: e* > *
    if (n > 2 && s.charAt(n - 2) == 'ů')
      return s.substring(0, n - 2) + "o" + s.charAt(n - 1) // *ů* -> *o*
    s
  }
}

/** Czech analysis chain (reference `CzechAnalyzer.java`): tokenize →
  * lowercase → stop(CS) → stem. */
final case class CzechAnalyzer(stopWords: Set[String] = Analyzers.CzechStopWords)
    extends Analyzer {
  override val name = "czech"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = CzechStem.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}
