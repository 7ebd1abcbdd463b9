package graft.core

/** Arabic analysis — exact re-expressions of the reference's
  * `ArabicNormalizer` and `ArabicStemmer` (Larkey/Ballesteros/Connell's
  * light-10 algorithm;
  * `lucene/analysis/common/src/java/org/apache/lucene/analysis/ar/ArabicNormalizer.java:36-100`,
  * `ArabicStemmer.java:33-155`), pinned to the reference's own unit test
  * vectors in ArabicSpec. Normalization folds hamza-seated alefs to bare
  * alef, teh marbuta to heh, dotless yeh to yeh, and deletes harakat +
  * tatweel; stemming removes ONE attached article/conjunction prefix (wa-
  * needs ≥ 3 letters left, others ≥ 2) then EVERY matching suffix in the
  * fixed light-10 order, each requiring ≥ 2 letters to remain. */
object Arabic {
  private final val Alef = 'ا'
  private final val AlefMadda = 'آ'
  private final val AlefHamzaAbove = 'أ'
  private final val AlefHamzaBelow = 'إ'
  private final val Yeh = 'ي'
  private final val DotlessYeh = 'ى'
  private final val TehMarbuta = 'ة'
  private final val Heh = 'ه'
  private final val Tatweel = 'ـ'
  private final val Beh = 'ب'
  private final val Teh = 'ت'
  private final val Feh = 'ف'
  private final val Kaf = 'ك'
  private final val Lam = 'ل'
  private final val Noon = 'ن'
  private final val Waw = 'و'

  private val harakatAndTatweel: Set[Char] =
    Set(Tatweel, 'ً', 'ٌ', 'ٍ', 'َ', 'ُ', 'ِ', 'ّ', 'ْ')

  def normalize(term: String): String = {
    val b = new StringBuilder(term.length)
    term.foreach {
      case AlefMadda | AlefHamzaAbove | AlefHamzaBelow => b.append(Alef)
      case DotlessYeh => b.append(Yeh)
      case TehMarbuta => b.append(Heh)
      case c if harakatAndTatweel.contains(c) => // deleted
      case c => b.append(c)
    }
    b.toString
  }

  // prefix table in the reference's exact order (first match wins)
  private val prefixes: Seq[String] = Seq(
    s"$Alef$Lam", s"$Waw$Alef$Lam", s"$Beh$Alef$Lam", s"$Kaf$Alef$Lam",
    s"$Feh$Alef$Lam", s"$Lam$Lam", s"$Waw")
  // suffix table: EVERY match strips, in this order
  private val suffixes: Seq[String] = Seq(
    s"$Heh$Alef", s"$Alef$Noon", s"$Alef$Teh", s"$Waw$Noon", s"$Yeh$Noon",
    s"$Yeh$Heh", s"$Yeh$TehMarbuta", s"$Heh", s"$TehMarbuta", s"$Yeh")

  def stem(term: String): String = {
    var s = term
    // one prefix: wa- (length 1) requires >= 4 total; others length+2
    prefixes.find { p =>
      (if (p.length == 1) s.length >= 4 else s.length >= p.length + 2) && s.startsWith(p)
    }.foreach(p => s = s.substring(p.length))
    // all matching suffixes, each requiring suffix.length + 2 remaining
    suffixes.foreach { suf =>
      if (s.length >= suf.length + 2 && s.endsWith(suf))
        s = s.substring(0, s.length - suf.length)
    }
    s
  }
}

/** Persian normalization — exact `PersianNormalizer`
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/fa/PersianNormalizer.java:34-85`):
  * farsi yeh / yeh barree → arabic yeh, keheh → kaf, heh+yeh / heh goal →
  * heh, hamza-above deleted. */
object Persian {
  def normalize(term: String): String = {
    val b = new StringBuilder(term.length)
    term.foreach {
      case 'ی' | 'ے' => b.append('ي') // farsi yeh, yeh barree → yeh
      case 'ک' => b.append('ك') // keheh → kaf
      case 'ۀ' | 'ہ' => b.append('ه') // heh+yeh, heh goal → heh
      case 'ٔ' => // hamza above: deleted
      case c => b.append(c)
    }
    b.toString
  }

  /** Exact `PersianStemmer`
    * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/fa/PersianStemmer.java:44-82`):
    * EVERY matching suffix strips, in table order, each requiring ≥ 2 chars
    * to remain. Characters are the post-normalization (arabic yeh) forms. */
  def stem(term: String): String = {
    var s = term
    stemSuffixes.foreach { suf =>
      if (s.length >= suf.length + 2 && s.endsWith(suf))
        s = s.substring(0, s.length - suf.length)
    }
    s
  }

  // alef-teh, alef-noon, teh-reh-yeh-noon, teh-reh, yeh-yeh, yeh, heh-alef,
  // ZWNJ — explicit escapes (arabic yeh ي, the POST-normalization form)
  private val stemSuffixes: Seq[String] = Seq(
    "\u0627\u062A", "\u0627\u0646", "\u062A\u0631\u064A\u0646",
    "\u062A\u0631", "\u064A\u064A", "\u064A", "\u0647\u0627", "\u200C")

  /** `DecimalDigitFilter`
    * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/core/DecimalDigitFilter.java:44-62`):
    * non-Latin decimal digits (Arabic-Indic ۱۲۳, etc.) fold to ASCII. */
  def foldDigits(term: String): String = {
    var i = 0
    var changed = false
    while (i < term.length && !changed) {
      val ch = term.codePointAt(i)
      if (ch > 0x7F && Character.isDigit(ch)) changed = true
      i += Character.charCount(ch)
    }
    if (!changed) return term
    val b = new StringBuilder(term.length)
    i = 0
    while (i < term.length) {
      val ch = term.codePointAt(i)
      if (ch > 0x7F && Character.isDigit(ch))
        b.append(('0' + Character.getNumericValue(ch)).toChar)
      else b.appendAll(Character.toChars(ch))
      i += Character.charCount(ch)
    }
    b.toString
  }
}

/** Persian analysis chain — the reference `PersianAnalyzer.java:126-144` in
  * full: PersianCharFilter (ZWNJ → space, pre-tokenization) → tokenize →
  * lowercase → DecimalDigitFilter → ARABIC normalize → Persian normalize →
  * stop (the reference's stop list is NORMALIZED, so the stop check runs
  * after both normalizers — the reverse of the Arabic chain's ordering) →
  * PersianStemFilter. With the char filter applied, no token can carry the
  * stemmer's ZWNJ suffix — same dead rule as the reference chain. */
final case class PersianAnalyzer(stopWords: Set[String] = Analyzers.PersianStopWords)
    extends Analyzer {
  override val name = "persian"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    // PersianCharFilter: ZWNJ is WB=Extend under UAX#29 (it would be absorbed
    // into a token), so the reference splits words on it BEFORE the tokenizer
    val filtered = if (text.indexOf('‌') >= 0) text.replace('‌', ' ') else text
    StandardLikeAnalyzer().tokenize(filtered).foreach { t =>
      val normalized = Persian.normalize(Arabic.normalize(Persian.foldDigits(t.term)))
      if (!stopWords.contains(normalized)) {
        val stemmed = Persian.stem(normalized)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
  }
}

/** Arabic analysis chain (reference `ArabicAnalyzer.java:131-143`):
  * tokenize → lowercase → stop(AR on the UNnormalized surface form — the
  * reference's stop list is not normalized, order matters) → normalize →
  * stem. */
final case class ArabicAnalyzer(stopWords: Set[String] = Analyzers.ArabicStopWords)
    extends Analyzer {
  override val name = "arabic"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    StandardLikeAnalyzer().tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = Arabic.stem(Arabic.normalize(t.term))
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}
