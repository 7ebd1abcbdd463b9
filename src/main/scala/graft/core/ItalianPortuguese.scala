package graft.core

/** Italian light stemmer — an exact re-expression of the reference's
  * `ItalianLightStemmer` (Savoy's UniNE algorithm;
  * `lucene/analysis/common/src/java/org/apache/lucene/analysis/it/ItalianLightStemmer.java:61-116`):
  * words shorter than 6 chars pass through UNfolded; otherwise accents fold
  * to their base vowels and one final-vowel suffix is removed (a trailing
  * `ie/he/hi/ii/ia/io` pair drops both chars, a bare final vowel drops one).
  * Parity with the reference is asserted over its shipped `itlight.txt`
  * vocabulary in ItalianPortugueseSpec. */
object ItalianLightStem extends Serializable {
  private def fold(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case 'à' | 'á' | 'â' | 'ä' => b.append('a')
      case 'ò' | 'ó' | 'ô' | 'ö' => b.append('o')
      case 'è' | 'é' | 'ê' | 'ë' => b.append('e')
      case 'ù' | 'ú' | 'û' | 'ü' => b.append('u')
      case 'ì' | 'í' | 'î' | 'ï' => b.append('i')
      case c => b.append(c)
    }
    b.toString
  }

  def stem(term: String): String = {
    val n = term.length
    if (n < 6) return term
    val f = fold(term)
    val last = f.charAt(n - 1)
    val prev = f.charAt(n - 2)
    last match {
      case 'e' => if (prev == 'i' || prev == 'h') f.substring(0, n - 2) else f.substring(0, n - 1)
      case 'i' => if (prev == 'h' || prev == 'i') f.substring(0, n - 2) else f.substring(0, n - 1)
      case 'a' => if (prev == 'i') f.substring(0, n - 2) else f.substring(0, n - 1)
      case 'o' => if (prev == 'i') f.substring(0, n - 2) else f.substring(0, n - 1)
      case _ => f
    }
  }
}

/** Portuguese light stemmer — an exact re-expression of the reference's
  * `PortugueseLightStemmer` (Savoy's UniNE;
  * `lucene/analysis/common/src/java/org/apache/lucene/analysis/pt/PortugueseLightStemmer.java:63-211`):
  * plural-suffix normalization (`-es/-ns/-eis/-ais/-óis/-is/-ões/-ães/
  * -mente/-s`), feminine→masculine normalization on a trailing `-a`, one
  * final-vowel drop, then accent folding. Words shorter than 4 chars pass
  * through unchanged (and unfolded), like the reference. Parity asserted
  * over the shipped `ptlight.txt` vocabulary in ItalianPortugueseSpec. */
object PortugueseLightStem extends Serializable {
  private def fold(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case 'à' | 'á' | 'â' | 'ä' | 'ã' => b.append('a')
      case 'ò' | 'ó' | 'ô' | 'ö' | 'õ' => b.append('o')
      case 'è' | 'é' | 'ê' | 'ë' => b.append('e')
      case 'ù' | 'ú' | 'û' | 'ü' => b.append('u')
      case 'ì' | 'í' | 'î' | 'ï' => b.append('i')
      case 'ç' => b.append('c')
      case c => b.append(c)
    }
    b.toString
  }

  private def removeSuffix(s: String): String = {
    val n = s.length
    if (n > 4 && s.endsWith("es") && "rslz".indexOf(s.charAt(n - 3)) >= 0)
      return s.substring(0, n - 2)
    if (n > 3 && s.endsWith("ns")) return s.substring(0, n - 2) + "m"
    if (n > 4 && (s.endsWith("eis") || s.endsWith("éis"))) return s.substring(0, n - 3) + "el"
    if (n > 4 && s.endsWith("ais")) return s.substring(0, n - 3) + "al"
    if (n > 4 && s.endsWith("óis")) return s.substring(0, n - 3) + "ol"
    if (n > 4 && s.endsWith("is")) return s.substring(0, n - 1) + "l"
    if (n > 3 && (s.endsWith("ões") || s.endsWith("ães"))) return s.substring(0, n - 3) + "ão"
    if (n > 6 && s.endsWith("mente")) return s.substring(0, n - 5)
    if (n > 3 && s.charAt(n - 1) == 's') return s.substring(0, n - 1)
    s
  }

  private def normFeminine(s: String): String = {
    val n = s.length
    if (n > 7 && (s.endsWith("inha") || s.endsWith("iaca") || s.endsWith("eira")))
      return s.substring(0, n - 1) + "o"
    if (n > 6) {
      if (s.endsWith("osa") || s.endsWith("ica") || s.endsWith("ida") ||
        s.endsWith("ada") || s.endsWith("iva") || s.endsWith("ama"))
        return s.substring(0, n - 1) + "o"
      if (s.endsWith("ona")) return s.substring(0, n - 3) + "ão"
      if (s.endsWith("ora")) return s.substring(0, n - 1)
      if (s.endsWith("esa")) return s.substring(0, n - 3) + "ês"
      if (s.endsWith("na")) return s.substring(0, n - 1) + "o"
    }
    s
  }

  def stem(term: String): String = {
    if (term.length < 4) return term
    var s = removeSuffix(term)
    if (s.length > 3 && s.charAt(s.length - 1) == 'a') s = normFeminine(s)
    if (s.length > 4) {
      val last = s.charAt(s.length - 1)
      if (last == 'e' || last == 'a' || last == 'o') s = s.substring(0, s.length - 1)
    }
    fold(s)
  }
}

/** Italian analysis chain (reference `ItalianAnalyzer.java:123-131`):
  * tokenize → elision strip (l'arte → arte, the Italian `DEFAULT_ARTICLES`
  * set at `ItalianAnalyzer.java:48-54`) → lowercase → stop(IT, increments
  * kept) → light stem. Elision drops its article WITHOUT consuming a
  * position, like the French chain. */
final case class ItalianAnalyzer(stopWords: Set[String] = Analyzers.ItalianStopWords)
    extends Analyzer {
  override val name = "italian"
  private val elisions = Set("c", "l", "all", "dall", "dell", "nell", "sull",
    "coll", "pell", "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m",
    "t", "s", "v", "d") // reference DEFAULT_ARTICLES

  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    // the tokenizer splits at the apostrophe, so an elided article (l'arte)
    // arrives as a standalone token FOLLOWED BY an apostrophe in the source:
    // drop exactly those without consuming a position. A standalone article
    // token (the very common word "un") is NOT elision — it falls through to
    // the stop filter, which preserves position increments, exactly like the
    // reference's ElisionFilter + StopFilter pipeline (ADVICE r3 #1).
    var elided = 0
    ElisionTokens.foreach(text) { (term, pos, apos) =>
      if (apos && elisions.contains(term)) elided += 1
      else if (!stopWords.contains(term)) {
        val stemmed = ItalianLightStem.stem(term)
        sink.accept(stemmed, 0, stemmed.length, pos - elided)
      }
    }
  }
}

/** Portuguese analysis chain (reference `PortugueseAnalyzer.java:113-120`):
  * tokenize → lowercase → stop(PT, increments kept) → light stem. */
final case class PortugueseAnalyzer(stopWords: Set[String] = Analyzers.PortugueseStopWords)
    extends Analyzer {
  override val name = "portuguese"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit =
    SimpleUnicodeAnalyzer.tokenize(text).foreach { t =>
      if (!stopWords.contains(t.term)) {
        val stemmed = PortugueseLightStem.stem(t.term)
        sink.accept(stemmed, 0, stemmed.length, t.position)
      }
    }
}
