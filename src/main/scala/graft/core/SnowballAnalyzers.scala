package graft.core

/** Analyzer chains for the Snowball-stemmed languages — each mirrors the
  * reference's `createComponents` composition:
  *
  *  - Danish (`da/DanishAnalyzer.java:113`): standard → lowercase →
  *    stop(DA) → snowball(Danish)
  *  - Dutch (`nl/DutchAnalyzer.java:150`): standard → lowercase → stop(NL) →
  *    stemmer-override dict → snowball(Dutch)
  *  - Romanian (`ro/RomanianAnalyzer.java:118`): standard → lowercase →
  *    stop(RO) → cedilla→comma normalization → snowball(Romanian)
  *  - Turkish (`tr/TurkishAnalyzer.java:117`): standard → apostrophe strip →
  *    TURKISH lowercase (dotless-ı rules) → stop(TR) → snowball(Turkish)
  *  - Greek (`el/GreekAnalyzer.java:102`): standard → Greek lowercase
  *    (final-sigma + diacritics fold) → stop(EL) → GreekStemmer
  */
object SnowballAnalyzers {

  /** High-frequency subset of the snowball Danish stop list the reference
    * ships as `danish_stop.txt`. */
  val DanishStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "på",
    "de", "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
    "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun", "nu",
    "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op", "man", "hans")

  /** High-frequency subset of the snowball Dutch stop list (`dutch_stop.txt`). */
  val DutchStopWords: Set[String] = Set(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij", "het",
    "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor", "had",
    "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn", "men",
    "dit", "zo", "door", "over", "ze", "zich", "bij", "ook", "tot", "je", "mij")

  /** Subset of the reference's Romanian stop list (`ro/stopwords.txt` —
    * which ships both cedilla and comma-below spellings; the stop filter
    * runs BEFORE normalization, as in the reference chain). */
  val RomanianStopWords: Set[String] = Set(
    "acea", "aceasta", "această", "aceea", "acel", "acest", "și", "şi",
    "sau", "din", "la", "cu", "ce", "cel", "care", "pe", "un", "o", "este",
    "sunt", "mai", "dar", "pentru", "nu", "se", "în", "al", "ale", "ai",
    "a", "ar", "fi", "fost", "eu", "el", "ea", "noi", "voi", "ei", "ele",
    "de", "că", "să")

  /** Subset of the reference's Turkish stop list (`tr/stopwords.txt`). */
  val TurkishStopWords: Set[String] = Set(
    "acaba", "ama", "ancak", "bana", "bazı", "belki", "ben", "beni",
    "benim", "bile", "bir", "birçok", "biri", "birkaç", "biz", "bize",
    "bizi", "bizim", "böyle", "bu", "buna", "bunda", "bundan", "bunlar",
    "bunu", "bunun", "da", "daha", "de", "defa", "diye", "eğer", "en",
    "gibi", "hem", "hep", "hepsi", "her", "hiç", "için", "ile", "ise",
    "kez", "ki", "kim", "mı", "mu", "mü", "nasıl", "ne", "neden", "nerde",
    "nerede", "nereye", "niçin", "niye", "o", "sanki", "şey", "siz", "şu",
    "tüm", "ve", "veya", "ya", "yani")

  /** Subset of the reference's Greek stop list (`el/stopwords.txt` —
    * already lowercase-folded forms, checked after [[GreekLowerCase]] like
    * the reference's filter order). */
  val GreekStopWords: Set[String] = Set(
    "ο", "η", "το", "οι", "τα", "του", "τησ", "των", "τον", "την", "και",
    "κι", "κ", "ειμαι", "εισαι", "ειναι", "ειμαστε", "ειστε", "στο",
    "στον", "στη", "στην", "μα", "αλλα", "απο", "για", "προσ", "με", "σε",
    "ωσ", "παρα", "αντι", "κατα", "μετα", "θα", "να", "δε", "δεν", "μη",
    "μην", "επι", "ενω", "εαν", "αν", "τοτε", "που", "πωσ", "ποιοσ", "ετσι")

  /** The Dutch analyzer's default stemmer-override dictionary
    * (`nl/DutchAnalyzer.java:80-84`): checked after the stop filter, wins
    * over the snowball stemmer. */
  val DutchStemOverrides: Map[String, String] = Map(
    "fiets" -> "fiets", "bromfiets" -> "bromfiets",
    "ei" -> "eier", "kind" -> "kinder")

  /** Turkish-locale lowercase (`tr/TurkishLowerCaseFilter.java`): I→ı,
    * İ→i, I+combining-dot-above→i (dot removed), combining dot above after
    * an I-context removed; everything else per-codepoint lowercase. */
  def turkishLowerCase(term: String): String = {
    val CombiningDotAbove = '̇'
    val sb = new StringBuilder(term.length)
    var i = 0
    var iOrAfter = false
    while (i < term.length) {
      val ch = term.charAt(i)
      iOrAfter = ch == 'I' ||
        (iOrAfter && Character.getType(ch) == Character.NON_SPACING_MARK)
      if (iOrAfter) {
        ch match {
          case CombiningDotAbove => // drop: composes İ→i in decomposed input
          case 'I' =>
            // 'I' followed by combining dot above → dotted i; else dotless ı
            var j = i + 1
            var isBeforeDot = false
            var scanning = true
            while (scanning && j < term.length) {
              val c2 = term.charAt(j)
              if (c2 == CombiningDotAbove) { isBeforeDot = true; scanning = false }
              else if (Character.getType(c2) == Character.NON_SPACING_MARK) j += 1
              else scanning = false
            }
            sb.append(if (isBeforeDot) 'i' else 'ı')
          case c => sb.append(Character.toLowerCase(c))
        }
      } else sb.append(Character.toLowerCase(ch))
      i += 1
    }
    sb.toString
  }

  /** Standard tokenization without lowercasing: UAX#29 segments with the
    * reference's 255-char max-token split. */
  private[core] def standardRawTokens(text: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    Uax29.scan(text, (start, end) => {
      var s = start
      while (s < end) {
        val e = math.min(s + 255, end)
        out += text.substring(s, e)
        s = e
      }
    })
    out.result()
  }
}

/** Danish analysis chain: standard → lowercase → stop(DA) → snowball. */
final case class DanishAnalyzer(stopWords: Set[String] = SnowballAnalyzers.DanishStopWords)
    extends Analyzer {
  override val name = "danish"
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
        val stemmed = DanishSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}

/** Dutch analysis chain: standard → lowercase → stop(NL) → override dict →
  * [compound decomposition when a dictionary is given] → snowball. Like
  * [[graft.core.GermanAnalyzer]], a non-empty `compound` dictionary stacks
  * each surviving token's dictionary subwords at its position, and subwords
  * flow through the same override-then-snowball stemming as their parents
  * (the Dutch compound recall chain assembled from the reference's
  * `DictionaryCompoundWordTokenFilter`). */
final case class DutchAnalyzer(
    stopWords: Set[String] = SnowballAnalyzers.DutchStopWords,
    stemOverrides: Map[String, String] = SnowballAnalyzers.DutchStemOverrides,
    compound: Option[CompoundWordDictionary] = None)
    extends Analyzer {
  override val name =
    if (compound.isEmpty) "dutch"
    else s"dutch-compound:${Analyzers.instanceIds.incrementAndGet()}"
  if (compound.nonEmpty) Analyzers.register(this)
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
        def emit(t: String): Unit = {
          val stemmed = stemOverrides.getOrElse(t, DutchSnowball.stem(t))
          sink.accept(stemmed, 0, stemmed.length, pos)
        }
        emit(lower)
        compound.foreach(_.decompose(lower).foreach(emit))
      }
      pos += 1
    }
  }
}

/** Romanian analysis chain: standard → lowercase → stop(RO) →
  * cedilla-to-comma normalization → snowball (which norms again, making the
  * fold idempotent like the reference's filter + in-stemmer `norm`). */
final case class RomanianAnalyzer(stopWords: Set[String] = SnowballAnalyzers.RomanianStopWords)
    extends Analyzer {
  override val name = "romanian"
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
        val stemmed = RomanianSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}

/** Turkish analysis chain: standard → apostrophe strip → Turkish lowercase →
  * stop(TR) → snowball. */
final case class TurkishAnalyzer(stopWords: Set[String] = SnowballAnalyzers.TurkishStopWords)
    extends Analyzer {
  override val name = "turkish"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      // ApostropheFilter: truncate at the first ' or ’ (Türkiye'nin → Türkiye)
      val apos = {
        val i = raw.indexWhere(c => c == '\'' || c == '’')
        if (i >= 0) raw.substring(0, i) else raw
      }
      val lower = SnowballAnalyzers.turkishLowerCase(apos)
      if (lower.nonEmpty && !stopWords.contains(lower)) {
        val stemmed = TurkishSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}

/** Greek analysis chain: standard → Greek lowercase → stop(EL) → stemmer. */
final case class GreekAnalyzer(stopWords: Set[String] = SnowballAnalyzers.GreekStopWords)
    extends Analyzer {
  override val name = "greek"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val lower = GreekLowerCase(raw)
      if (!stopWords.contains(lower)) {
        val stemmed = GreekStem.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
