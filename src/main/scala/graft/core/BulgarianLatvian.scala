package graft.core

/** Bulgarian and Latvian light stemmers + chains, re-expressions of the
  * reference's hand-written stemmers, pinned to the reference
  * implementations' output over generated vocabularies in IndicSpec.
  */

/** Light stemmer for Bulgarian (`bg/BulgarianStemmer.java`; Savoy's BUIR
  * searching-strategies algorithm): article strip → plural strip → final
  * vowel folds → ен→н → ъN→N. */
object BulgarianStem extends Serializable {
  import StemOps.endsWith

  def stem(term: String): String = {
    if (term.length < 4) return term
    val s = term.toCharArray
    var len = s.length
    if (len > 5 && endsWith(s, len, "ища")) return new String(s, 0, len - 3)
    len = removeArticle(s, len)
    len = removePlural(s, len)
    if (len > 3) {
      if (endsWith(s, len, "я")) len -= 1
      if (endsWith(s, len, "а") || endsWith(s, len, "о") || endsWith(s, len, "е")) len -= 1
    }
    if (len > 4 && endsWith(s, len, "ен")) {
      s(len - 2) = 'н'
      len -= 1
    }
    if (len > 5 && s(len - 2) == 'ъ') {
      s(len - 2) = s(len - 1)
      len -= 1
    }
    new String(s, 0, len)
  }

  private def removeArticle(s: Array[Char], len: Int): Int = {
    if (len > 6 && endsWith(s, len, "ият")) return len - 3
    if (len > 5 && (endsWith(s, len, "ът") || endsWith(s, len, "то") ||
      endsWith(s, len, "те") || endsWith(s, len, "та") || endsWith(s, len, "ия")))
      return len - 2
    if (len > 4 && endsWith(s, len, "ят")) return len - 2
    len
  }

  private def removePlural(s: Array[Char], len: Int): Int = {
    if (len > 6) {
      if (endsWith(s, len, "овци")) return len - 3
      if (endsWith(s, len, "ове")) return len - 3
      if (endsWith(s, len, "еве")) { s(len - 3) = 'й'; return len - 2 }
    }
    if (len > 5) {
      if (endsWith(s, len, "ища")) return len - 3
      if (endsWith(s, len, "та")) return len - 2
      if (endsWith(s, len, "ци")) { s(len - 2) = 'к'; return len - 1 }
      if (endsWith(s, len, "зи")) { s(len - 2) = 'г'; return len - 1 }
      if (s(len - 3) == 'е' && s(len - 1) == 'и') { s(len - 3) = 'я'; return len - 1 }
    }
    if (len > 4) {
      if (endsWith(s, len, "си")) { s(len - 2) = 'х'; return len - 1 }
      if (endsWith(s, len, "и")) return len - 1
    }
    len
  }
}

/** Light stemmer for Latvian (`lv/LatvianStemmer.java`; light version of
  * Kreslin's thesis algorithm): FIRST matching affix from the ordered table
  * strips when the remaining stem keeps a vowel, with un-palatalization when
  * the affix calls for it. */
object LatvianStem extends Serializable {
  import StemOps.endsWith

  private final case class Affix(affix: String, vc: Int, palatalizes: Boolean)
  private val affixes = Array(
    Affix("ajiem", 3, false), Affix("ajai", 3, false),
    Affix("ajam", 2, false), Affix("ajām", 2, false),
    Affix("ajos", 2, false), Affix("ajās", 2, false),
    Affix("iem", 2, true), Affix("ajā", 2, false),
    Affix("ais", 2, false), Affix("ai", 2, false),
    Affix("ei", 2, false), Affix("ām", 1, false),
    Affix("am", 1, false), Affix("ēm", 1, false),
    Affix("īm", 1, false), Affix("im", 1, false),
    Affix("um", 1, false), Affix("us", 1, true),
    Affix("as", 1, false), Affix("ās", 1, false),
    Affix("es", 1, false), Affix("os", 1, true),
    Affix("ij", 1, false), Affix("īs", 1, false),
    Affix("ēs", 1, false), Affix("is", 1, false),
    Affix("ie", 1, false), Affix("u", 1, true),
    Affix("a", 1, true), Affix("i", 1, true),
    Affix("e", 1, false), Affix("ā", 1, false),
    Affix("ē", 1, false), Affix("ī", 1, false),
    Affix("ū", 1, false), Affix("o", 1, false),
    Affix("s", 0, false), Affix("š", 0, false))

  def stem(term: String): String = {
    val s = term.toCharArray
    val len = s.length
    val nv = numVowels(s, len)
    var i = 0
    while (i < affixes.length) {
      val a = affixes(i)
      if (nv > a.vc && len >= a.affix.length + 3 && endsWith(s, len, a.affix)) {
        val newLen = len - a.affix.length
        val out = if (a.palatalizes) unpalatalize(s, newLen) else newLen
        return new String(s, 0, out)
      }
      i += 1
    }
    term
  }

  /** `s(len)` is the just-removed char (still in the buffer), which gates
    * the gen.-pl. kš→kst / ņņ→nn rules exactly like the reference. */
  private def unpalatalize(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (s(len) == 'u') {
      if (endsWith(s, len, "kš")) {
        len += 1
        s(len - 2) = 's'; s(len - 1) = 't'
        return len
      }
      if (endsWith(s, len, "ņņ")) {
        s(len - 2) = 'n'; s(len - 1) = 'n'
        return len
      }
    }
    if (endsWith(s, len, "pj") || endsWith(s, len, "bj") ||
      endsWith(s, len, "mj") || endsWith(s, len, "vj")) len - 1
    else if (endsWith(s, len, "šņ")) { s(len - 2) = 's'; s(len - 1) = 'n'; len }
    else if (endsWith(s, len, "žņ")) { s(len - 2) = 'z'; s(len - 1) = 'n'; len }
    else if (endsWith(s, len, "šļ")) { s(len - 2) = 's'; s(len - 1) = 'l'; len }
    else if (endsWith(s, len, "žļ")) { s(len - 2) = 'z'; s(len - 1) = 'l'; len }
    else if (endsWith(s, len, "ļņ")) { s(len - 2) = 'l'; s(len - 1) = 'n'; len }
    else if (endsWith(s, len, "ļļ")) { s(len - 2) = 'l'; s(len - 1) = 'l'; len }
    else if (len > 0 && s(len - 1) == 'č') { s(len - 1) = 'c'; len }
    else if (len > 0 && s(len - 1) == 'ļ') { s(len - 1) = 'l'; len }
    else if (len > 0 && s(len - 1) == 'ņ') { s(len - 1) = 'n'; len }
    else len
  }

  private def numVowels(s: Array[Char], len: Int): Int = {
    var n = 0
    var i = 0
    while (i < len) {
      if ("aeiouāīēū".indexOf(s(i)) >= 0) n += 1
      i += 1
    }
    n
  }
}

/** Bulgarian analysis chain (`bg/BulgarianAnalyzer.java:113`): standard →
  * lowercase → stop(BG) → light stem. */
final case class BulgarianAnalyzer(stopWords: Set[String] = Analyzers.BulgarianStopWords)
    extends Analyzer {
  override val name = "bulgarian"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val lower = raw.toLowerCase(java.util.Locale.ROOT)
      if (!stopWords.contains(lower)) {
        val stemmed = BulgarianStem.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}

/** Latvian analysis chain (`lv/LatvianAnalyzer.java:113`): standard →
  * lowercase → stop(LV) → light stem. */
final case class LatvianAnalyzer(stopWords: Set[String] = Analyzers.LatvianStopWords)
    extends Analyzer {
  override val name = "latvian"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val lower = raw.toLowerCase(java.util.Locale.ROOT)
      if (!stopWords.contains(lower)) {
        val stemmed = LatvianStem.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
