package graft.core

import java.text.Normalizer
import java.util.Locale

/** Width normalization for CJK text — the behavioral contract of the
  * reference's `CJKWidthFilter`
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/CJKWidthFilter.java:36`):
  * fullwidth ASCII variants (U+FF01–U+FF5E) fold to ASCII, halfwidth
  * Katakana variants (U+FF65–U+FF9F) fold to their Katakana forms, and a
  * halfwidth voiced / semi-voiced sound mark composes with the preceding
  * kana (ｶ + ﾞ → ガ). The reference documents the transform as "a subset of
  * NFKC" restricted to those two ranges, so it is expressed here as NFKC
  * applied ONLY to runs containing affected chars (extended one kana to the
  * left so composition can see its base), not as a copy of the filter's
  * lookup tables.
  */
object CjkWidth extends Serializable {
  private def affected(c: Char): Boolean =
    (c >= 0xFF01 && c <= 0xFF5E) || (c >= 0xFF65 && c <= 0xFF9F)

  // a voiced mark composes with a preceding (already-fullwidth) kana
  private def kanaBase(c: Char): Boolean = c >= 0x30A1 && c <= 0x30FE

  def fold(text: String): String = {
    var i = 0
    val n = text.length
    var hit = false
    while (!hit && i < n) { if (affected(text.charAt(i))) hit = true; i += 1 }
    if (!hit) return text // fast path: pure ASCII / already-normal text

    val out = new StringBuilder(n)
    i = 0
    while (i < n) {
      if (affected(text.charAt(i))) {
        var start = i
        var end = i + 1
        while (end < n && (affected(text.charAt(end)) || kanaBase(text.charAt(end)))) end += 1
        // a leading voiced mark needs the preceding kana in the run to compose
        if ((text.charAt(start) == 0xFF9E.toChar || text.charAt(start) == 0xFF9F.toChar) &&
          out.nonEmpty && kanaBase(out.charAt(out.length - 1))) {
          out.setLength(out.length - 1)
          start -= 1
        }
        out.append(Normalizer.normalize(text.substring(start, end), Normalizer.Form.NFKC))
        i = end
      } else {
        out.append(text.charAt(i))
        i += 1
      }
    }
    out.toString
  }
}

/** CJK analysis chain — the reference's `CJKAnalyzer`
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/CJKAnalyzer.java:92-99`):
  * standard tokenize → width fold → lowercase → CJK bigrams → stop filter
  * (position increments kept).
  *
  * Bigram semantics follow `CJKBigramFilter.java:156-239` (default flags:
  * HAN | HIRAGANA | KATAKANA | HANGUL, `outputUnigrams = false`):
  *
  *  - adjacent CJK characters — offset-contiguous, straight across script
  *    boundaries (Han+Hiragana mixed text bigrams as one run) — emit
  *    overlapping bigrams over CODEPOINTS (surrogate pairs stay whole);
  *  - a lone CJK character (no contiguous CJK neighbor: whitespace /
  *    punctuation / a non-CJK token breaks the run) emits as a unigram;
  *  - non-CJK tokens pass through unmodified; a mixed-script word token
  *    (e.g. Hangul+Latin, typed ALPHANUM by the tokenizer) is NOT bigrammed,
  *    exactly as the reference documents (`CJKBigramFilter.java:44-50`).
  *
  * Each emitted token (bigram, unigram or word) advances the position by
  * one; the stop filter then drops tokens but keeps their increments
  * (`StopFilter.java:25`), so phrases cannot match across a stop word.
  * Attached combining marks (WB4 Extend/Format) are not buffered as bigram
  * codepoints — a documented simplification; the reference buffers every
  * codepoint of the term including marks.
  */
final case class CjkAnalyzer(stopWords: Set[String] = Analyzers.CjkStopWords)
    extends Analyzer {
  override val name = "cjk"

  override def tokenize(text: String): IndexedSeq[Token] = {
    val folded = CjkWidth.fold(text)
    val out = Vector.newBuilder[Token]
    var pos = 0
    def emit(term: String): Unit = {
      if (!stopWords.contains(term)) out += Token(term, pos)
      pos += 1 // stop filter: drop the token, keep the position increment
    }

    val buf = new scala.collection.mutable.ArrayBuffer[Int](16)
    var lastEnd = -1 // end offset of the previous buffered CJK token
    def flushBuf(): Unit = {
      if (buf.length == 1) {
        emit(new String(Character.toChars(buf(0))))
      } else if (buf.length >= 2) {
        var i = 0
        while (i < buf.length - 1) {
          val b = new java.lang.StringBuilder(4)
          b.appendCodePoint(buf(i)).appendCodePoint(buf(i + 1))
          emit(b.toString)
          i += 1
        }
      }
      buf.clear()
    }

    def hangulOnly(s0: Int, e0: Int): Boolean = {
      var i = s0
      while (i < e0) {
        val cp = folded.codePointAt(i)
        if (Uax29.cls(cp) != Uax29.Ignore &&
          Character.UnicodeScript.of(cp) != Character.UnicodeScript.HANGUL)
          return false
        i += Character.charCount(cp)
      }
      true
    }

    Uax29.scan(folded, (s0, e0) => {
      val c0 = Uax29.cls(folded.codePointAt(s0))
      val cjk = c0 == Uax29.Han || c0 == Uax29.Hira || c0 == Uax29.Kata ||
        (c0 == Uax29.ALetter && hangulOnly(s0, e0))
      if (cjk) {
        if (s0 != lastEnd) flushBuf() // unaligned: the run is broken
        var i = s0
        while (i < e0) {
          val cp = folded.codePointAt(i)
          if (Uax29.cls(cp) != Uax29.Ignore) buf += cp
          i += Character.charCount(cp)
        }
        lastEnd = e0
      } else {
        flushBuf()
        lastEnd = -1 // a word between CJK chars breaks contiguity
        emit(folded.substring(s0, e0).toLowerCase(Locale.ROOT))
      }
    })
    flushBuf()
    out.result()
  }
}
