package graft.core

/** Sorani Kurdish analysis — exact re-expressions of the reference's
  * `SoraniNormalizer` and `SoraniStemmer`
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/ckb/SoraniNormalizer.java:63-129`,
  * `SoraniStemmer.java:31-103`), pinned to the reference's shipped
  * `ckbtestdata.zip` vocabulary (8,272 pairs through the FULL analyzer
  * chain, like the reference's own `assertVocabulary` test) in SoraniSpec.
  *
  * Normalization unifies yeh forms to farsi yeh, kaf to keheh, the 'e'
  * forms (heh+ZWNJ, word-final heh, teh marbuta) to AE, joining heh to heh,
  * rreh forms (word-initial reh, reh-with-small-v-above) to rreh, and
  * deletes harakat/tatweel/format characters. Stemming removes one
  * postposition, one possessive pronoun, then the first matching
  * ezafe/definiteness/plural/demonstrative suffix. */
object Sorani {
  private final val FarsiYeh = 'ی'
  private final val Keheh = 'ک'
  private final val Heh = 'ه'
  private final val Ae = 'ە'
  private final val Zwnj = '‌'
  private final val Rreh = 'ڕ'

  // tatweel + the eight harakat (SoraniNormalizer.java:52-61)
  private val deleted: Set[Char] =
    Set('ـ', 'ً', 'ٌ', 'ٍ', 'َ', 'ُ', 'ِ',
      'ّ', 'ْ')

  def normalize(term: String): String = {
    val b = new StringBuilder(term.length)
    var i = 0
    while (i < term.length) {
      term.charAt(i) match {
        case 'ي' | 'ى' => b.append(FarsiYeh) // yeh, dotless yeh
        case 'ك' => b.append(Keheh) // kaf
        case Zwnj =>
          // heh before ZWNJ becomes AE; the ZWNJ itself is deleted
          if (b.nonEmpty && b.last == Heh) b.setCharAt(b.length - 1, Ae)
        case Heh =>
          // word-final heh becomes AE (position judged on the INPUT, like
          // the reference's in-place scan)
          if (i == term.length - 1) b.append(Ae) else b.append(Heh)
        case 'ة' => b.append(Ae) // teh marbuta
        case 'ھ' => b.append(Heh) // heh doachashmee
        case 'ر' => // reh: word-initial becomes rreh. Judged on the OUTPUT
          // buffer (the reference normalizes in place, so a reh that becomes
          // position 0 after deleting leading harakat/tatweel/format chars
          // still converts), not on the input index.
          if (b.isEmpty) b.append(Rreh) else b.append('ر')
        case 'ڒ' => b.append(Rreh) // rreh with small v above
        case c if deleted.contains(c) => // harakat/tatweel
        case c if Character.getType(c) == Character.FORMAT => // directional controls
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  def stem(term: String): String = {
    var s = term
    // postposition (at most one)
    if (s.length > 5 && s.endsWith("دا")) s = s.substring(0, s.length - 2)
    else if (s.length > 4 && s.endsWith("نا")) s = s.substring(0, s.length - 1)
    else if (s.length > 6 && s.endsWith("ەوە")) s = s.substring(0, s.length - 3)
    // possessive pronoun
    if (s.length > 6 && (s.endsWith("مان") || s.endsWith("یان") || s.endsWith("تان")))
      s = s.substring(0, s.length - 3)
    val n = s.length
    // one ezafe/definiteness/plural/demonstrative suffix, reference order
    if (n > 6 && s.endsWith("ێکی")) s.substring(0, n - 3)
    else if (n > 7 && s.endsWith("یەکی")) s.substring(0, n - 4)
    else if (n > 5 && s.endsWith("ێک")) s.substring(0, n - 2)
    else if (n > 6 && s.endsWith("یەک")) s.substring(0, n - 3)
    else if (n > 6 && s.endsWith("ەکە")) s.substring(0, n - 3)
    else if (n > 5 && s.endsWith("کە")) s.substring(0, n - 2)
    else if (n > 7 && s.endsWith("ەکان")) s.substring(0, n - 4)
    else if (n > 6 && s.endsWith("کان")) s.substring(0, n - 3)
    else if (n > 7 && s.endsWith("یانی")) s.substring(0, n - 4)
    else if (n > 6 && s.endsWith("انی")) s.substring(0, n - 3)
    else if (n > 6 && s.endsWith("یان")) s.substring(0, n - 3)
    else if (n > 5 && s.endsWith("ان")) s.substring(0, n - 2)
    else if (n > 7 && s.endsWith("یانە")) s.substring(0, n - 4)
    else if (n > 6 && s.endsWith("انە")) s.substring(0, n - 3)
    else if (n > 5 && (s.endsWith("ایە") || s.endsWith("ەیە"))) s.substring(0, n - 2)
    else if (n > 4 && s.endsWith("ە")) s.substring(0, n - 1)
    else if (n > 4 && s.endsWith("ی")) s.substring(0, n - 1)
    else s
  }
}

/** Sorani analysis chain (reference `SoraniAnalyzer.java:113-122`):
  * NORMALIZE first (before the stop check — the stop list is in normalized
  * forms), then lowercase → stop → stem. */
final case class SoraniAnalyzer(stopWords: Set[String] = Analyzers.SoraniStopWords)
    extends Analyzer {
  override val name = "sorani"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    StandardLikeAnalyzer().tokenize(text).foreach { t =>
      val normalized = Sorani.normalize(t.term)
      if (!stopWords.contains(normalized)) {
        val stemmed = Sorani.stem(normalized)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}
