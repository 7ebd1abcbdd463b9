package graft.core

import java.text.BreakIterator
import java.util.Locale

/** Thai analysis chain, re-expressing the reference's dictionary-based
  * word segmentation (`lucene/analysis/common/src/java/org/apache/lucene/analysis/th/ThaiTokenizer.java:34`,
  * `ThaiAnalyzer.java:103-110`): Thai has no inter-word whitespace, so the
  * tokenizer defers to the JRE's dictionary-based
  * `java.text.BreakIterator` word instance for the `th` locale — exactly
  * the component the reference wraps — applied per sentence (ROOT-locale
  * sentence instance), keeping only segments whose first code point is a
  * letter or digit (`ThaiTokenizer.java:96-100`). The chain is then
  * lowercase → decimal-digit fold → stop(TH), the reference's
  * `createComponents`.
  *
  * `BreakIterator` is neither thread-safe nor serializable, so instances
  * are per-thread clones of the JVM-wide prototypes — the same
  * `(BreakIterator) proto.clone()` discipline as the reference, shaped for
  * Spark executor threads instead of per-`Tokenizer` instances.
  */
object ThaiTokens {
  private val thaiLocale = new Locale.Builder().setLanguageTag("th").build()

  /** Mirror of `ThaiTokenizer.DBBI_AVAILABLE`: true when the JRE ships a
    * working dictionary-based break iterator for Thai (checked by probing a
    * mid-word boundary of ภาษาไทย, `ThaiTokenizer.java:44-48`). */
  val DbbiAvailable: Boolean = {
    val probe = BreakIterator.getWordInstance(thaiLocale)
    probe.setText("ภาษาไทย") // ภาษาไทย
    probe.isBoundary(4)
  }

  private val word = new ThreadLocal[BreakIterator] {
    override def initialValue(): BreakIterator =
      BreakIterator.getWordInstance(thaiLocale)
  }
  private val sentence = new ThreadLocal[BreakIterator] {
    override def initialValue(): BreakIterator =
      BreakIterator.getSentenceInstance(Locale.ROOT)
  }

  /** Feed each word segment `[start, end)` of `text` to `sink`, sentence by
    * sentence. Segments whose first code point is not a letter or digit
    * (spaces, punctuation runs) are skipped without consuming a position —
    * the reference's `incrementWord` loop (`ThaiTokenizer.java:88-108`). */
  def segment(text: String, sink: (Int, Int) => Unit): Unit = {
    // the reference throws at ThaiTokenizer construction when the JRE lacks
    // the dictionary iterator (ThaiTokenizer.java:52-55); a silent grapheme
    // fallback would mis-segment every Thai run. The object val initializes
    // per JVM, so this checks the EXECUTING JVM, not the driver's.
    if (!DbbiAvailable)
      throw new UnsupportedOperationException(
        "this JRE does not have support for Thai segmentation")
    if (text.isEmpty) return
    val sent = sentence.get()
    sent.setText(text)
    var ss = sent.first()
    var se = sent.next()
    val wb = word.get()
    while (se != BreakIterator.DONE) {
      // word-break within the sentence window, like setNextSentence's
      // CharArrayIterator wrapper (ThaiTokenizer.java:80-85)
      wb.setText(new java.text.StringCharacterIterator(text, ss, se, ss))
      var start = wb.first()
      var end = wb.next()
      while (end != BreakIterator.DONE) {
        if (Character.isLetterOrDigit(text.codePointAt(start)))
          sink(start, end)
        start = end
        end = wb.next()
      }
      ss = se
      se = sent.next()
    }
  }
}

/** Thai analysis chain (`th/ThaiAnalyzer.java:103`): dictionary word-break →
  * lowercase → decimal-digit fold → stop(TH). Stop removal leaves a
  * position hole like the reference `StopFilter`. Golden-vector parity with
  * the reference's `TestThaiAnalyzer` expectations is pinned in ThaiSpec. */
final case class ThaiAnalyzer(stopWords: Set[String] = Analyzers.ThaiStopWords)
    extends Analyzer {
  override val name = "thai"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    ThaiTokens.segment(text, (s, e) => {
      val buf = text.substring(s, e).toLowerCase(Locale.ROOT).toCharArray
      val len = StemOps.foldDigits(buf, buf.length)
      val term = new String(buf, 0, len)
      if (!stopWords.contains(term)) sink.accept(term, 0, term.length, pos)
      pos += 1
    })
  }
}
