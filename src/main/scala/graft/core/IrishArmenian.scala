package graft.core

/** Irish and Armenian analysis chains — Snowball-family stemmers
  * re-expressed from the published algorithms (snowballstem.org; generated
  * reference at `org/tartarus/snowball/ext/IrishStemmer.java` /
  * `ArmenianStemmer.java`), pinned to the reference implementations' output
  * over generated vocabularies in SnowballSpec. Suffix tables are the
  * algorithms' published data, ordered longest-first (the `find_among`
  * longest-match order).
  */

/** Irish Snowball stemmer (`irish.sbl`): initial mutation/eclipsis prefix
  * morph, then noun / derivational / verb suffix strips over R1/R2/RV of
  * the MUTATED word. */
object IrishSnowball extends Serializable {
  private val vowels = Set('a', 'e', 'i', 'o', 'u', 'á', 'é', 'í', 'ó', 'ú')

  private val Init = Array(
    ("d'fh", 2),
    ("bhf", 2),
    ("b'", 1),
    ("bh", 4),
    ("bp", 8),
    ("ch", 5),
    ("d'", 1),
    ("dh", 6),
    ("dt", 9),
    ("fh", 2),
    ("gc", 5),
    ("gh", 7),
    ("h-", 1),
    ("m'", 1),
    ("mb", 4),
    ("mh", 10),
    ("n-", 1),
    ("nd", 6),
    ("ng", 7),
    ("ph", 8),
    ("sh", 3),
    ("t-", 1),
    ("th", 9),
    ("ts", 3))

  private val Noun = Array(
    ("aíochta", 1),
    ("íochta", 1),
    ("aíocht", 1),
    ("íocht", 1),
    ("aire", 2),
    ("eabh", 1),
    ("aibh", 1),
    ("eamh", 1),
    ("aimh", 1),
    ("airí", 2),
    ("ire", 2),
    ("abh", 1),
    ("ibh", 1),
    ("amh", 1),
    ("imh", 1),
    ("irí", 2))

  private val Deriv = Array(
    ("grafaíochtaí", 4),
    ("grafaíochta", 4),
    ("grafaíocht", 4),
    ("grafaíoch", 4),
    ("arcachtaí", 2),
    ("óideacha", 6),
    ("arcachta", 2),
    ("eachtúil", 1),
    ("patacha", 5),
    ("óideach", 6),
    ("gineach", 3),
    ("pataigh", 5),
    ("achtúil", 1),
    ("arcacht", 2),
    ("eachta", 1),
    ("patach", 5),
    ("óidigh", 6),
    ("gineas", 3),
    ("achta", 1),
    ("paite", 5),
    ("ginis", 3),
    ("eacht", 1),
    ("each", 1),
    ("acht", 1),
    ("ach", 1))

  private val Verb = Array(
    ("aimid", 1),
    ("aímid", 1),
    ("faidh", 1),
    ("imid", 1),
    ("ímid", 1),
    ("eadh", 2),
    ("fidh", 1),
    ("tear", 2),
    ("adh", 2),
    ("áil", 2),
    ("ain", 2),
    ("tar", 2))


  /** (pV, p1, p2): after the first vowel; after the first non-vowel
    * following it; after the next vowel+non-vowel pair. */
  private def regions(s: String): (Int, Int, Int) = {
    val n = s.length
    var i = 0
    while (i < n && !vowels(s.charAt(i))) i += 1
    if (i >= n) return (n, n, n)
    val pV = i + 1
    var j = pV
    while (j < n && vowels(s.charAt(j))) j += 1
    if (j >= n) return (pV, n, n)
    val p1 = j + 1
    var k = p1
    while (k < n && !vowels(s.charAt(k))) k += 1
    if (k >= n) return (pV, p1, n)
    var m = k + 1
    while (m < n && vowels(s.charAt(m))) m += 1
    if (m >= n) return (pV, p1, n)
    (pV, p1, m + 1)
  }

  def stem(term: String): String = {
    var s = term
    // initial morph: longest matching lenition/eclipsis prefix
    Init.find { case (p, _) => s.startsWith(p) }.foreach { case (p, c) =>
      val rest = s.substring(p.length)
      val rep = c match {
        case 1 => ""
        case 2 => "f"
        case 3 => "s"
        case 4 => "b"
        case 5 => "c"
        case 6 => "d"
        case 7 => "g"
        case 8 => "p"
        case 9 => "t"
        case _ => "m"
      }
      s = rep + rest
    }
    val (pV, p1, p2) = regions(s)
    // noun suffixes: longest raw match, region test after (no fallback)
    Noun.find { case (t, _) => s.endsWith(t) }.foreach { case (t, c) =>
      val start = s.length - t.length
      if ((c == 1 && start >= p1) || (c == 2 && start >= p2)) s = s.substring(0, start)
    }
    // derivational suffixes
    Deriv.find { case (t, _) => s.endsWith(t) }.foreach { case (t, c) =>
      val start = s.length - t.length
      c match {
        case 1 => if (start >= p2) s = s.substring(0, start)
        case 2 => s = s.substring(0, start) + "arc"
        case 3 => s = s.substring(0, start) + "gin"
        case 4 => s = s.substring(0, start) + "graf"
        case 5 => s = s.substring(0, start) + "paite"
        case _ => s = s.substring(0, start) + "óid"
      }
    }
    // verb suffixes
    Verb.find { case (t, _) => s.endsWith(t) }.foreach { case (t, c) =>
      val start = s.length - t.length
      if ((c == 1 && start >= pV) || (c == 2 && start >= p1)) s = s.substring(0, start)
    }
    s
  }
}

/** Irish analysis chain (`ga/IrishAnalyzer.java:126`): standard →
  * hyphenation stop ({h,n,t} split tokens, increments kept) → elision
  * (d'/m'/b' articles) → IRISH lowercase (nAthair → n-athair) → stop(GA) →
  * snowball. */
final case class IrishAnalyzer(stopWords: Set[String] = Analyzers.IrishStopWords)
    extends Analyzer {
  override val name = "irish"
  private val hyphenations = Set("h", "n", "t", "H", "N", "T")
  private val articles = Set("d", "m", "b")

  /** `ga/IrishLowerCaseFilter.java`: n/t before an UPPERCASE vowel get a
    * hyphen (the tAthair → t-athair convention), then plain lowercase. */
  private def irishLower(raw: String): String = {
    val upperVowel = "AEIOUÁÉÍÓÚ"
    if (raw.length > 1 && (raw.charAt(0) == 'n' || raw.charAt(0) == 't') &&
      upperVowel.indexOf(raw.charAt(1)) >= 0)
      raw.charAt(0) + "-" + raw.substring(1).toLowerCase(java.util.Locale.ROOT)
    else raw.toLowerCase(java.util.Locale.ROOT)
  }

  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      if (!hyphenations.contains(raw)) {
        // elision: strip a d/m/b article before the first apostrophe
        val el = {
          val i = raw.indexWhere(c => c == '\'' || c == '’')
          if (i >= 0 && articles.contains(raw.substring(0, i).toLowerCase(java.util.Locale.ROOT)))
            raw.substring(i + 1)
          else raw
        }
        val lower = irishLower(el)
        if (lower.nonEmpty && !stopWords.contains(lower)) {
          val stemmed = IrishSnowball.stem(lower)
          sink.accept(stemmed, 0, stemmed.length, pos)
        }
      }
      pos += 1
    }
  }
}

/** Armenian Snowball stemmer (`armenian.sbl`): ending / verb / adjective /
  * noun suffix strips, all matching confined to RV, the ending strip gated
  * on R2. */
object ArmenianSnowball extends Serializable {
  private val vowels = Set('ա', 'ե', 'է', 'ը', 'ի', 'ո', 'ւ', 'օ')

  private val Adjective = Array(
    ("երորդ", 1),
    ("րորդ", 1),
    ("որակ", 1),
    ("ական", 1),
    ("արան", 1),
    ("եկեն", 1),
    ("երեն", 1),
    ("որէն", 1),
    ("ովին", 1),
    ("լայն", 1),
    ("վուն", 1),
    ("ավետ", 1),
    ("ալի", 1),
    ("ակի", 1),
    ("գին", 1),
    ("պես", 1),
    ("կոտ", 1),
    ("բար", 1),
    ("եղ", 1),
    ("են", 1),
    ("ին", 1),
    ("իվ", 1),
    ("ատ", 1))

  private val Verb = Array(
    ("ացրինք", 1),
    ("վեցինք", 1),
    ("ացնալ", 1),
    ("եցնել", 1),
    ("ացվել", 1),
    ("եցվել", 1),
    ("կոտել", 1),
    ("ացրին", 1),
    ("վեցին", 1),
    ("ացրիր", 1),
    ("վեցիր", 1),
    ("ացրեց", 1),
    ("ալուց", 1),
    ("ելուց", 1),
    ("ացրիք", 1),
    ("վեցիք", 1),
    ("ացանք", 1),
    ("ացինք", 1),
    ("եցինք", 1),
    ("ացրի", 1),
    ("վեցի", 1),
    ("անալ", 1),
    ("ենալ", 1),
    ("ցնել", 1),
    ("ատել", 1),
    ("ոտել", 1),
    ("վում", 1),
    ("ացան", 1),
    ("ացին", 1),
    ("եցին", 1),
    ("ալիս", 1),
    ("ելիս", 1),
    ("ացավ", 1),
    ("եցավ", 1),
    ("ալով", 1),
    ("ելով", 1),
    ("ացար", 1),
    ("եցար", 1),
    ("ացիր", 1),
    ("եցիր", 1),
    ("ալու", 1),
    ("ելու", 1),
    ("ացաք", 1),
    ("ացիք", 1),
    ("եցիք", 1),
    ("ցանք", 1),
    ("ացա", 1),
    ("եցա", 1),
    ("ացի", 1),
    ("եցի", 1),
    ("ըալ", 1),
    ("ըել", 1),
    ("նել", 1),
    ("չել", 1),
    ("վել", 1),
    ("տել", 1),
    ("ված", 1),
    ("ում", 1),
    ("ցան", 1),
    ("ցաք", 1),
    ("անք", 1),
    ("վե", 1),
    ("ալ", 1),
    ("ել", 1),
    ("ան", 1),
    ("ավ", 1),
    ("ար", 1),
    ("աց", 1),
    ("եց", 1),
    ("աք", 1),
    ("ա", 1))

  private val Noun = Array(
    ("ություն", 1),
    ("մունք", 1),
    ("ույթ", 1),
    ("ուհի", 1),
    ("անակ", 1),
    ("ստան", 1),
    ("արան", 1),
    ("եղէն", 1),
    ("յուն", 1),
    ("ուստ", 1),
    ("ավոր", 1),
    ("անօց", 1),
    ("ալիք", 1),
    ("անիք", 1),
    ("վածք", 1),
    ("ույք", 1),
    ("ունք", 1),
    ("որդ", 1),
    ("յակ", 1),
    ("ուկ", 1),
    ("պան", 1),
    ("ածո", 1),
    ("ուս", 1),
    ("գար", 1),
    ("վոր", 1),
    ("չեք", 1),
    ("ենք", 1),
    ("ոնք", 1),
    ("իչք", 1),
    ("արք", 1),
    ("ցի", 1),
    ("իլ", 1),
    ("ակ", 1),
    ("իկ", 1),
    ("ան", 1),
    ("իչ", 1),
    ("ոց", 1),
    ("ու", 1),
    ("իք", 1),
    ("ք", 1))

  private val Ending = Array(
    ("ությանդ", 1),
    ("ությանը", 1),
    ("ությանն", 1),
    ("ությանս", 1),
    ("ներում", 1),
    ("ության", 1),
    ("անում", 1),
    ("երում", 1),
    ("ներին", 1),
    ("ներով", 1),
    ("վանից", 1),
    ("ներից", 1),
    ("վանդ", 1),
    ("ներդ", 1),
    ("վանը", 1),
    ("ները", 1),
    ("ների", 1),
    ("երին", 1),
    ("ներն", 1),
    ("վանս", 1),
    ("անով", 1),
    ("երով", 1),
    ("ոջից", 1),
    ("երից", 1),
    ("ամբ", 1),
    ("անդ", 1),
    ("ոջդ", 1),
    ("երդ", 1),
    ("ուդ", 1),
    ("անը", 1),
    ("ոջը", 1),
    ("երը", 1),
    ("երի", 1),
    ("վան", 1),
    ("երն", 1),
    ("ուն", 1),
    ("ոջս", 1),
    ("վով", 1),
    ("ներ", 1),
    ("վից", 1),
    ("ցից", 1),
    ("ուց", 1),
    ("սա", 1),
    ("վա", 1),
    ("վի", 1),
    ("ան", 1),
    ("ին", 1),
    ("ոջ", 1),
    ("ով", 1),
    ("եր", 1),
    ("ից", 1),
    ("ոց", 1),
    ("դ", 1),
    ("ը", 1),
    ("ի", 1),
    ("ն", 1),
    ("ց", 1))


  /** (pV, p2): after the first vowel; after the second vowel+non-vowel. */
  private def regions(s: String): (Int, Int) = {
    val n = s.length
    var i = 0
    while (i < n && !vowels(s.charAt(i))) i += 1
    if (i >= n) return (n, n)
    val pV = i + 1
    var j = pV
    while (j < n && vowels(s.charAt(j))) j += 1
    if (j >= n) return (pV, n)
    var k = j + 1
    while (k < n && !vowels(s.charAt(k))) k += 1
    if (k >= n) return (pV, n)
    var m = k + 1
    while (m < n && vowels(s.charAt(m))) m += 1
    if (m >= n) return (pV, n)
    (pV, m + 1)
  }

  def stem(term: String): String = {
    var s = term
    val (pV, p2) = regions(s)
    // RV-limited matching: the longest suffix FITTING in [pV, len)
    def strip(table: Array[(String, Int)], ok: Int => Boolean): Unit =
      table.find { case (t, _) => s.endsWith(t) && s.length - t.length >= pV }
        .foreach { case (t, _) =>
          val start = s.length - t.length
          if (ok(start)) s = s.substring(0, start)
        }
    strip(Ending, _ >= p2)
    strip(Verb, _ => true)
    strip(Adjective, _ => true)
    strip(Noun, _ => true)
    s
  }
}

/** Armenian analysis chain (`hy/ArmenianAnalyzer.java:114`): standard →
  * lowercase → stop(HY) → snowball. */
final case class ArmenianAnalyzer(stopWords: Set[String] = Analyzers.ArmenianStopWords)
    extends Analyzer {
  override val name = "armenian"
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
        val stemmed = ArmenianSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
