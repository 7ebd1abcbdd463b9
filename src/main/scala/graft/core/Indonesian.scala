package graft.core

/** Indonesian stemmer — exact re-expression of the reference's
  * `IndonesianStemmer` (Tala's algorithm;
  * `lucene/analysis/common/src/java/org/apache/lucene/analysis/id/IndonesianStemmer.java:30-271`):
  * inflectional particle + possessive removal gated on a live syllable
  * (vowel) count, then derivational first-order prefix / suffix /
  * second-order prefix interaction with the reference's rule-fired ordering
  * and prefix-flag suffix blocking (e.g. a removed `ke-`/`peng-`/`pe-`
  * blocks `-kan`). Includes the `meny-`/`peny-`/`pen-`+vowel substitutions
  * (`meny`+V → `s`V, `pen`+V → `t`V) and the `belajar`/`pelajar` specials. */
object IndonesianStem {
  private final val RemovedKe = 1
  private final val RemovedPeng = 2
  private final val RemovedDi = 4
  private final val RemovedMeng = 8
  private final val RemovedTer = 16
  private final val RemovedBer = 32
  private final val RemovedPe = 64

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  def stem(term: String, stemDerivational: Boolean = true): String = {
    var numSyllables = term.count(isVowel)
    var flags = 0
    var s = term

    def removeParticle(): Unit =
      if (s.endsWith("kah") || s.endsWith("lah") || s.endsWith("pun")) {
        numSyllables -= 1; s = s.substring(0, s.length - 3)
      }

    def removePossessive(): Unit =
      if (s.endsWith("ku") || s.endsWith("mu")) {
        numSyllables -= 1; s = s.substring(0, s.length - 2)
      } else if (s.endsWith("nya")) {
        numSyllables -= 1; s = s.substring(0, s.length - 3)
      }

    def removeFirstOrderPrefix(): Unit = {
      val n = s.length
      if (s.startsWith("meng")) { flags |= RemovedMeng; numSyllables -= 1; s = s.substring(4) }
      else if (s.startsWith("meny") && n > 4 && isVowel(s.charAt(4))) {
        flags |= RemovedMeng; numSyllables -= 1; s = "s" + s.substring(4)
      }
      else if (s.startsWith("men")) { flags |= RemovedMeng; numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("mem")) { flags |= RemovedMeng; numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("me")) { flags |= RemovedMeng; numSyllables -= 1; s = s.substring(2) }
      else if (s.startsWith("peng")) { flags |= RemovedPeng; numSyllables -= 1; s = s.substring(4) }
      else if (s.startsWith("peny") && n > 4 && isVowel(s.charAt(4))) {
        flags |= RemovedPeng; numSyllables -= 1; s = "s" + s.substring(4)
      }
      else if (s.startsWith("peny")) { flags |= RemovedPeng; numSyllables -= 1; s = s.substring(4) }
      else if (s.startsWith("pen") && n > 3 && isVowel(s.charAt(3))) {
        flags |= RemovedPeng; numSyllables -= 1; s = "t" + s.substring(3)
      }
      else if (s.startsWith("pen")) { flags |= RemovedPeng; numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("pem")) { flags |= RemovedPeng; numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("di")) { flags |= RemovedDi; numSyllables -= 1; s = s.substring(2) }
      else if (s.startsWith("ter")) { flags |= RemovedTer; numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("ke")) { flags |= RemovedKe; numSyllables -= 1; s = s.substring(2) }
    }

    def removeSecondOrderPrefix(): Unit = {
      val n = s.length
      if (s.startsWith("ber")) { flags |= RemovedBer; numSyllables -= 1; s = s.substring(3) }
      else if (n == 7 && s == "belajar") { flags |= RemovedBer; numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("be") && n > 4 && !isVowel(s.charAt(2)) &&
        s.charAt(3) == 'e' && s.charAt(4) == 'r') {
        flags |= RemovedBer; numSyllables -= 1; s = s.substring(2)
      }
      else if (s.startsWith("per")) { numSyllables -= 1; s = s.substring(3) }
      else if (n == 7 && s == "pelajar") { numSyllables -= 1; s = s.substring(3) }
      else if (s.startsWith("pe")) { flags |= RemovedPe; numSyllables -= 1; s = s.substring(2) }
    }

    def removeSuffix(): Unit = {
      if (s.endsWith("kan") && (flags & RemovedKe) == 0 &&
        (flags & RemovedPeng) == 0 && (flags & RemovedPe) == 0) {
        numSyllables -= 1; s = s.substring(0, s.length - 3)
      } else if (s.endsWith("an") && (flags & RemovedDi) == 0 &&
        (flags & RemovedMeng) == 0 && (flags & RemovedTer) == 0) {
        numSyllables -= 1; s = s.substring(0, s.length - 2)
      } else if (s.endsWith("i") && !s.endsWith("si") &&
        (flags & RemovedBer) == 0 && (flags & RemovedKe) == 0 &&
        (flags & RemovedPeng) == 0) {
        numSyllables -= 1; s = s.substring(0, s.length - 1)
      }
    }

    if (numSyllables > 2) removeParticle()
    if (numSyllables > 2) removePossessive()
    if (stemDerivational) {
      var old = s.length
      if (numSyllables > 2) removeFirstOrderPrefix()
      if (old != s.length) { // a rule fired
        old = s.length
        if (numSyllables > 2) removeSuffix()
        if (old != s.length) { // a rule fired
          if (numSyllables > 2) removeSecondOrderPrefix()
        }
      } else {
        if (numSyllables > 2) removeSecondOrderPrefix()
        if (numSyllables > 2) removeSuffix()
      }
    }
    s
  }
}

/** Indonesian analysis chain (reference `IndonesianAnalyzer.java`):
  * tokenize → lowercase → stop(ID) → stem (derivational by default). */
final case class IndonesianAnalyzer(
    stopWords: Set[String] = Analyzers.IndonesianStopWords,
    stemDerivational: Boolean = true) extends Analyzer {
  override val name = "indonesian"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = IndonesianStem.stem(t.term, stemDerivational)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}
