package graft.core

/** Nordic / Slavic / Uralic light stemmers — EXACT re-expressions of the
  * reference's UniNE-family light stemmers (Jacques Savoy's published CLEF
  * algorithms, Apache-2.0 in the reference tree). Like the Italian and
  * Portuguese stemmers in [[ItalianPortuguese]], each is pinned against the
  * reference's own shipped test vocabulary in LightStemmersSpec — parity is
  * asserted on every sampled pair, not a divergence bound. The stemmers are
  * single-pass suffix automata (plus small normalization loops for Finnish),
  * so they run inside the same per-token analysis chain the index build
  * distributes; no state crosses tokens.
  */
object SwedishLightStem extends Serializable {
  /** Exact re-expression of `SwedishLightStemmer.stem`
    * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/sv/SwedishLightStemmer.java:65-101`):
    * possessive `-s` first, then one longest-match suffix family, then a
    * single final consonant/vowel. */
  def stem(term: String): String = {
    var s = term
    var n = s.length
    if (n > 4 && s.charAt(n - 1) == 's') { n -= 1; s = s.substring(0, n) }
    if (n > 7 && (s.endsWith("elser") || s.endsWith("heten"))) return s.substring(0, n - 5)
    if (n > 6 && (s.endsWith("arne") || s.endsWith("erna") || s.endsWith("ande") ||
      s.endsWith("else") || s.endsWith("aste") || s.endsWith("orna") || s.endsWith("aren")))
      return s.substring(0, n - 4)
    if (n > 5 && (s.endsWith("are") || s.endsWith("ast") || s.endsWith("het")))
      return s.substring(0, n - 3)
    if (n > 4 && (s.endsWith("ar") || s.endsWith("er") || s.endsWith("or") ||
      s.endsWith("en") || s.endsWith("at") || s.endsWith("te") || s.endsWith("et")))
      return s.substring(0, n - 2)
    if (n > 3) {
      val c = s.charAt(n - 1)
      if (c == 't' || c == 'a' || c == 'e' || c == 'n') return s.substring(0, n - 1)
    }
    s
  }
}

/** Exact re-expression of `NorwegianLightStemmer`
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/no/NorwegianLightStemmer.java:65-184`)
  * with the reference's Bokmål/Nynorsk flag split; the filter default is
  * Bokmål only (`NorwegianLightStemFilter.java:43`). */
final case class NorwegianLightStem(useBokmaal: Boolean = true, useNynorsk: Boolean = false) {
  require(useBokmaal || useNynorsk, "invalid flags")

  def stem(term: String): String = {
    var s = term
    var n = s.length
    // possessive -s (bilens -> bilen), then continue
    if (n > 4 && s.charAt(n - 1) == 's') { n -= 1; s = s.substring(0, n) }
    if (n > 7 && ((s.endsWith("heter") && useBokmaal) ||
      (s.endsWith("heten") && useBokmaal) || (s.endsWith("heita") && useNynorsk)))
      return s.substring(0, n - 5)
    if (n > 8 && useNynorsk && (s.endsWith("heiter") || s.endsWith("leiken") || s.endsWith("leikar")))
      return s.substring(0, n - 6)
    if (n > 5 && (s.endsWith("dom") || (s.endsWith("het") && useBokmaal)))
      return s.substring(0, n - 3)
    if (n > 6 && useNynorsk && (s.endsWith("heit") || s.endsWith("semd") || s.endsWith("leik")))
      return s.substring(0, n - 4)
    if (n > 7 && (s.endsWith("elser") || s.endsWith("elsen")))
      return s.substring(0, n - 5)
    if (n > 6 && ((s.endsWith("ende") && useBokmaal) || (s.endsWith("ande") && useNynorsk) ||
      s.endsWith("else") || (s.endsWith("este") && useBokmaal) ||
      (s.endsWith("aste") && useNynorsk) || (s.endsWith("eren") && useBokmaal) ||
      (s.endsWith("aren") && useNynorsk)))
      return s.substring(0, n - 4)
    if (n > 5 && ((s.endsWith("ere") && useBokmaal) || (s.endsWith("are") && useNynorsk) ||
      (s.endsWith("est") && useBokmaal) || (s.endsWith("ast") && useNynorsk) ||
      s.endsWith("ene") || (s.endsWith("ane") && useNynorsk)))
      return s.substring(0, n - 3)
    if (n > 4 && (s.endsWith("er") || s.endsWith("en") || s.endsWith("et") ||
      (s.endsWith("ar") && useNynorsk) || (s.endsWith("st") && useBokmaal) || s.endsWith("te")))
      return s.substring(0, n - 2)
    if (n > 3) {
      val c = s.charAt(n - 1)
      if (c == 'a' || c == 'e' || c == 'n') return s.substring(0, n - 1)
    }
    s
  }
}

object RussianLightStem extends Serializable {
  /** Exact re-expression of `RussianLightStemmer`
    * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/ru/RussianLightStemmer.java:66-150`):
    * one case-suffix pass (Dolamic & Savoy's Russian rule table, including
    * the original's literal `оьв`/`ьв` entries) then a one-char normalize. */
  def stem(term: String): String = normalize(removeCase(term))

  private def normalize(s: String): String = {
    val n = s.length
    if (n > 3) s.charAt(n - 1) match {
      case 'ь' | 'и' => return s.substring(0, n - 1)
      case 'н' => if (s.charAt(n - 2) == 'н') return s.substring(0, n - 1)
      case _ =>
    }
    s
  }

  private val suf3 = Array("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
    "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
  private val suf2 = Array("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию",
    "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
    "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
  private val final1 = "аеиоуйыяь".toSet

  private def removeCase(s: String): String = {
    val n = s.length
    if (n > 6 && (s.endsWith("иями") || s.endsWith("оями"))) return s.substring(0, n - 4)
    if (n > 5 && suf3.exists(s.endsWith)) return s.substring(0, n - 3)
    if (n > 4 && suf2.exists(s.endsWith)) return s.substring(0, n - 2)
    if (n > 3 && final1.contains(s.charAt(n - 1))) return s.substring(0, n - 1)
    s
  }
}

object FinnishLightStem extends Serializable {
  /** Exact re-expression of `FinnishLightStemmer`
    * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/fi/FinnishLightStemmer.java:66-227`):
    * ä/å/ö fold, clitic pass (recursive `-kin`/`-ko`), possessive pass, case
    * pass (with the `nnen→s`/`den→s`/`ksen→s` substitutions), then the two
    * normalize passes including the adjacent-k/p/t squeeze. Words shorter
    * than 4 chars pass through unfolded, like the reference. */
  def stem(term: String): String = {
    if (term.length < 4) return term
    val buf = new Array[Char](term.length)
    term.getChars(0, term.length, buf, 0)
    var i = 0
    while (i < buf.length) {
      buf(i) match {
        case 'ä' | 'å' => buf(i) = 'a'
        case 'ö' => buf(i) = 'o'
        case _ =>
      }
      i += 1
    }
    var len = buf.length
    len = step1(buf, len)
    len = step2(buf, len)
    len = step3(buf, len)
    len = norm1(buf, len)
    len = norm2(buf, len)
    new String(buf, 0, len)
  }

  private def ends(s: Array[Char], len: Int, suffix: String): Boolean = {
    val m = suffix.length
    if (m > len) return false
    var i = 0
    while (i < m) { if (s(len - m + i) != suffix.charAt(i)) return false; i += 1 }
    true
  }

  private def step1(s: Array[Char], len0: Int): Int = {
    var len = len0
    // clitic loop: -kin / -ko strip repeatedly while long enough
    var stripped = true
    while (stripped && len > 8) {
      if (ends(s, len, "kin")) len -= 3
      else if (ends(s, len, "ko")) len -= 2
      else stripped = false
    }
    if (len > 11) {
      if (ends(s, len, "dellinen")) return len - 8
      if (ends(s, len, "dellisuus")) return len - 9
    }
    len
  }

  private def step2(s: Array[Char], len: Int): Int = {
    if (len > 5) {
      if (ends(s, len, "lla") || ends(s, len, "tse") || ends(s, len, "sti")) return len - 3
      if (ends(s, len, "ni")) return len - 2
      if (ends(s, len, "aa")) return len - 1
    }
    len
  }

  private def step3(s: Array[Char], len: Int): Int = {
    if (len > 8) {
      if (ends(s, len, "nnen")) { s(len - 4) = 's'; return len - 3 }
      if (ends(s, len, "ntena")) { s(len - 5) = 's'; return len - 4 }
      if (ends(s, len, "tten")) return len - 4
      if (ends(s, len, "eiden")) return len - 5
    }
    if (len > 6) {
      if (ends(s, len, "neen") || ends(s, len, "niin") || ends(s, len, "seen") ||
        ends(s, len, "teen") || ends(s, len, "inen")) return len - 4
      if (s(len - 3) == 'h' && isVowel(s(len - 2)) && s(len - 1) == 'n') return len - 3
      if (ends(s, len, "den")) { s(len - 3) = 's'; return len - 2 }
      if (ends(s, len, "ksen")) { s(len - 4) = 's'; return len - 3 }
      if (ends(s, len, "ssa") || ends(s, len, "sta") || ends(s, len, "lla") ||
        ends(s, len, "lta") || ends(s, len, "tta") || ends(s, len, "ksi") ||
        ends(s, len, "lle")) return len - 3
    }
    if (len > 5) {
      if (ends(s, len, "na") || ends(s, len, "ne")) return len - 2
      if (ends(s, len, "nei")) return len - 3
    }
    if (len > 4) {
      if (ends(s, len, "ja") || ends(s, len, "ta")) return len - 2
      if (s(len - 1) == 'a') return len - 1
      if (s(len - 1) == 'n' && isVowel(s(len - 2))) return len - 2
      if (s(len - 1) == 'n') return len - 1
    }
    len
  }

  private def norm1(s: Array[Char], len: Int): Int = {
    if (len > 5 && ends(s, len, "hde")) {
      s(len - 3) = 'k'; s(len - 2) = 's'; s(len - 1) = 'i'
    }
    if (len > 4 && (ends(s, len, "ei") || ends(s, len, "at"))) return len - 2
    if (len > 3) s(len - 1) match {
      case 't' | 's' | 'j' | 'e' | 'a' | 'i' => return len - 1
      case _ =>
    }
    len
  }

  private def norm2(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 8 && (s(len - 1) == 'e' || s(len - 1) == 'o' || s(len - 1) == 'u')) len -= 1
    if (len > 4) {
      if (s(len - 1) == 'i') len -= 1
      if (len > 4) {
        // squeeze adjacent duplicate k/p/t, left to right
        var ch = s(0)
        var i = 1
        while (i < len) {
          if (s(i) == ch && (ch == 'k' || ch == 'p' || ch == 't')) {
            var j = i
            while (j < len - 1) { s(j) = s(j + 1); j += 1 }
            len -= 1
          } else { ch = s(i); i += 1 }
        }
      }
    }
    len
  }

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
}

object HungarianLightStem extends Serializable {
  /** Exact re-expression of `HungarianLightStemmer`
    * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/hu/HungarianLightStemmer.java:64-236`):
    * accent/double-acute fold, case pass (incl. the assimilated `-val/-vel`
    * geminate rule), possessive pass, plural pass (with the reference's
    * vowel-k fallthrough), then a final-vowel normalize. */
  def stem(term: String): String = {
    val b = new StringBuilder(term.length)
    term.foreach {
      case 'á' => b.append('a')
      case 'ë' | 'é' => b.append('e')
      case 'í' => b.append('i')
      case 'ó' | 'ő' | 'õ' | 'ö' => b.append('o')
      case 'ú' | 'ű' | 'ũ' | 'û' | 'ü' => b.append('u')
      case c => b.append(c)
    }
    normalize(removePlural(removePossessive(removeCase(b.toString))))
  }

  private val case3 = Array("nak", "nek", "val", "vel", "ert", "rol", "ban",
    "ben", "bol", "nal", "nel", "hoz", "hez", "tol")
  private val case2 = Array("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")

  private def removeCase(s: String): String = {
    val n = s.length
    if (n > 6 && s.endsWith("kent")) return s.substring(0, n - 4)
    if (n > 5) {
      if (case3.exists(s.endsWith)) return s.substring(0, n - 3)
      if ((s.endsWith("al") || s.endsWith("el")) &&
        !isVowel(s.charAt(n - 3)) && s.charAt(n - 3) == s.charAt(n - 4))
        return s.substring(0, n - 3)
    }
    if (n > 4) {
      if (case2.exists(s.endsWith)) return s.substring(0, n - 2)
      if ((s.endsWith("on") || s.endsWith("en")) && !isVowel(s.charAt(n - 3)))
        return s.substring(0, n - 2)
      s.charAt(n - 1) match {
        case 't' | 'n' => return s.substring(0, n - 1)
        case 'a' | 'e' =>
          if (s.charAt(n - 2) == s.charAt(n - 3) && !isVowel(s.charAt(n - 2)))
            return s.substring(0, n - 2)
        case _ =>
      }
    }
    s
  }

  private def removePossessive(s: String): String = {
    val n = s.length
    if (n > 6) {
      if (!isVowel(s.charAt(n - 5)) &&
        (s.endsWith("atok") || s.endsWith("otok") || s.endsWith("etek")))
        return s.substring(0, n - 4)
      if (s.endsWith("itek") || s.endsWith("itok")) return s.substring(0, n - 4)
    }
    if (n > 5) {
      if (!isVowel(s.charAt(n - 4)) &&
        (s.endsWith("unk") || s.endsWith("tok") || s.endsWith("tek")))
        return s.substring(0, n - 3)
      if (isVowel(s.charAt(n - 4)) && s.endsWith("juk")) return s.substring(0, n - 3)
      if (s.endsWith("ink")) return s.substring(0, n - 3)
    }
    if (n > 4) {
      if (!isVowel(s.charAt(n - 3)) &&
        (s.endsWith("am") || s.endsWith("em") || s.endsWith("om") || s.endsWith("ad") ||
          s.endsWith("ed") || s.endsWith("od") || s.endsWith("uk")))
        return s.substring(0, n - 2)
      if (isVowel(s.charAt(n - 3)) &&
        (s.endsWith("nk") || s.endsWith("ja") || s.endsWith("je")))
        return s.substring(0, n - 2)
      if (s.endsWith("im") || s.endsWith("id") || s.endsWith("ik"))
        return s.substring(0, n - 2)
    }
    if (n > 3) s.charAt(n - 1) match {
      case 'a' | 'e' => if (!isVowel(s.charAt(n - 2))) return s.substring(0, n - 1)
      case 'm' | 'd' => if (isVowel(s.charAt(n - 2))) return s.substring(0, n - 1)
      case 'i' => return s.substring(0, n - 1)
      case _ =>
    }
    s
  }

  private def removePlural(s: String): String = {
    val n = s.length
    if (n > 3 && s.charAt(n - 1) == 'k') {
      val p = s.charAt(n - 2)
      // the reference's intentional fallthrough: vowel-k drops both only
      // when long enough, every other -k drops one
      if ((p == 'a' || p == 'o' || p == 'e') && n > 4) return s.substring(0, n - 2)
      return s.substring(0, n - 1)
    }
    s
  }

  private def normalize(s: String): String = {
    val n = s.length
    if (n > 3) s.charAt(n - 1) match {
      case 'a' | 'e' | 'i' | 'o' => return s.substring(0, n - 1)
      case _ =>
    }
    s
  }

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
}

/** Swedish analysis chain — the light-stem composition
  * (`sv/SwedishAnalyzer.java` shape with `SwedishLightStemFilter` in place of
  * snowball, like the German chain here): tokenize → lowercase → stop(SV,
  * increments kept) → light stem. */
final case class SwedishAnalyzer(stopWords: Set[String] = Analyzers.SwedishStopWords)
    extends Analyzer {
  override val name = "swedish"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = SwedishLightStem.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}

/** Norwegian analysis chain: tokenize → lowercase → stop(NO) → light stem.
  * `nynorsk = true` switches to the NYNORSK flag set (registry name
  * `norwegian-nynorsk`); the default matches `NorwegianLightStemFilter`'s
  * Bokmål-only default. */
final case class NorwegianAnalyzer(
    stopWords: Set[String] = Analyzers.NorwegianStopWords,
    nynorsk: Boolean = false) extends Analyzer {
  override val name = if (nynorsk) "norwegian-nynorsk" else "norwegian"
  private val stemmer =
    if (nynorsk) NorwegianLightStem(useBokmaal = false, useNynorsk = true)
    else NorwegianLightStem()
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = stemmer.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}

/** Russian analysis chain: tokenize → lowercase → stop(RU) → light stem (the
  * `RussianLightStemFilter` composition). */
final case class RussianAnalyzer(stopWords: Set[String] = Analyzers.RussianStopWords)
    extends Analyzer {
  override val name = "russian"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = RussianLightStem.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}

/** Finnish analysis chain: tokenize → lowercase → stop(FI) → light stem. */
final case class FinnishAnalyzer(stopWords: Set[String] = Analyzers.FinnishStopWords)
    extends Analyzer {
  override val name = "finnish"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = FinnishLightStem.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}

/** Hungarian analysis chain: tokenize → lowercase → stop(HU) → light stem. */
final case class HungarianAnalyzer(stopWords: Set[String] = Analyzers.HungarianStopWords)
    extends Analyzer {
  override val name = "hungarian"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = HungarianLightStem.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}
