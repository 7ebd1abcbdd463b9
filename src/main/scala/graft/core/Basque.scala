package graft.core

/** Basque Snowball stemmer + chain (`basque.sbl`; generated reference at
  * `org/tartarus/snowball/ext/BasqueStemmer.java`; analyzer composition
  * `eu/BasqueAnalyzer.java` standard → lowercase → stop(EU) → snowball),
  * pinned to the reference implementation's output over a generated
  * vocabulary in SnowballSpec. */
object BasqueSnowball extends Serializable {
  private val vowels = Set('a', 'e', 'i', 'o', 'u')

  private val Aditzak = Array(
    ("tzailea", 1),
    ("arabera", 4),
    ("atseden", 3),
    ("kundea", 1),
    ("tailea", 1),
    ("taldia", 1),
    ("garria", 2),
    ("karria", 1),
    ("tezina", 1),
    ("kizuna", 1),
    ("gailua", 1),
    ("erreza", 1),
    ("gaitza", 1),
    ("kaitza", 1),
    ("kuntza", 1),
    ("tzaile", 1),
    ("tarazi", 1),
    ("aldatu", 1),
    ("baditu", 5),
    ("bidea", 1),
    ("kidea", 1),
    ("pidea", 1),
    ("galea", 1),
    ("gunea", 1),
    ("kunea", 1),
    ("tzaga", 1),
    ("aldia", 1),
    ("karia", 1),
    ("tzaka", 1),
    ("ezina", 1),
    ("korra", 1),
    ("kunde", 1),
    ("tzake", 1),
    ("tzeke", 1),
    ("taile", 1),
    ("taldi", 1),
    ("etari", 1),
    ("garri", 2),
    ("karri", 1),
    ("arazi", 1),
    ("rekin", 1),
    ("tezin", 1),
    ("kizun", 1),
    ("gailu", 1),
    ("errez", 1),
    ("gaitz", 1),
    ("kaitz", 1),
    ("idea", 1),
    ("gaia", 1),
    ("mena", 1),
    ("pena", 1),
    ("kina", 1),
    ("kuna", 1),
    ("tuna", 1),
    ("bera", 1),
    ("kera", 1),
    ("pera", 1),
    ("orra", 1),
    ("dura", 1),
    ("gura", 1),
    ("kura", 1),
    ("tura", 1),
    ("keta", 1),
    ("bide", 1),
    ("kide", 1),
    ("pide", 1),
    ("gale", 1),
    ("gune", 1),
    ("kune", 1),
    ("atze", 1),
    ("aldi", 1),
    ("kari", 1),
    ("lari", 1),
    ("tari", 1),
    ("rean", 1),
    ("etan", 1),
    ("ezin", 1),
    ("dako", 1),
    ("tzat", 1),
    ("tatu", 1),
    ("tzez", 1),
    ("era", 1),
    ("eta", 1),
    ("eza", 1),
    ("tza", 2),
    ("ide", 1),
    ("tze", 1),
    ("gai", 1),
    ("ari", 1),
    ("ean", 1),
    ("kan", 1),
    ("men", 1),
    ("pen", 1),
    ("kin", 1),
    ("tun", 1),
    ("ago", 1),
    ("tio", 1),
    ("kor", 1),
    ("atu", 1),
    ("ka", 1),
    ("la", 1),
    ("le", 1),
    ("ki", 1),
    ("an", 1),
    ("go", 1),
    ("or", 1),
    ("du", 1),
    ("tu", 1),
    ("ez", 1))

  private val Izenak = Array(
    ("minutuko", 6),
    ("garrena", 1),
    ("gerrena", 1),
    ("kaldea", 1),
    ("taldea", 1),
    ("tzalea", 1),
    ("zionea", 1),
    ("aurrea", 1),
    ("taldia", 1),
    ("handia", 1),
    ("mendia", 1),
    ("garria", 2),
    ("larria", 1),
    ("kirria", 1),
    ("ontzia", 1),
    ("gibela", 1),
    ("urrena", 1),
    ("tzaina", 1),
    ("tasuna", 1),
    ("kondoa", 1),
    ("tzarra", 1),
    ("mendua", 1),
    ("mentua", 1),
    ("koitza", 1),
    ("gintza", 1),
    ("kintza", 1),
    ("kuntza", 1),
    ("garren", 1),
    ("gerren", 1),
    ("tariko", 1),
    ("gintzo", 1),
    ("gintzu", 1),
    ("denda", 1),
    ("gabea", 1),
    ("kabea", 1),
    ("aldea", 1),
    ("ordea", 1),
    ("zalea", 1),
    ("gilea", 1),
    ("kumea", 1),
    ("gunea", 1),
    ("kotea", 1),
    ("artea", 1),
    ("ostea", 1),
    ("etxea", 1),
    ("aldia", 1),
    ("degia", 1),
    ("tegia", 1),
    ("nahia", 1),
    ("tokia", 1),
    ("karia", 1),
    ("laria", 1),
    ("taria", 1),
    ("keria", 1),
    ("teria", 1),
    ("duria", 1),
    ("bizia", 1),
    ("aurka", 10),
    ("kaila", 1),
    ("skila", 1),
    ("zaina", 1),
    ("garna", 1),
    ("asuna", 1),
    ("ondoa", 1),
    ("takoa", 1),
    ("zinoa", 1),
    ("taroa", 1),
    ("zaroa", 1),
    ("liara", 1),
    ("tiara", 1),
    ("etara", 1),
    ("tzara", 1),
    ("korra", 1),
    ("ordua", 1),
    ("lekua", 1),
    ("burua", 1),
    ("durua", 1),
    ("estua", 1),
    ("eroza", 1),
    ("antza", 1),
    ("kalde", 1),
    ("talde", 1),
    ("tzale", 1),
    ("zione", 1),
    ("aurre", 1),
    ("taldi", 1),
    ("geldi", 8),
    ("handi", 1),
    ("mendi", 1),
    ("garri", 2),
    ("larri", 1),
    ("kirri", 1),
    ("ontzi", 1),
    ("tarik", 1),
    ("gibel", 1),
    ("urren", 1),
    ("tzain", 1),
    ("tasun", 1),
    ("aizun", 1),
    ("kondo", 1),
    ("trako", 5),
    ("etako", 1),
    ("igaro", 9),
    ("behar", 1),
    ("zehar", 7),
    ("mendu", 1),
    ("mentu", 1),
    ("koitz", 1),
    ("kada", 1),
    ("anda", 1),
    ("emea", 1),
    ("enea", 1),
    ("unea", 1),
    ("anga", 1),
    ("gaia", 1),
    ("geia", 1),
    ("egia", 1),
    ("ohia", 1),
    ("koia", 1),
    ("aria", 1),
    ("eria", 1),
    ("asia", 1),
    ("ezia", 1),
    ("joka", 3),
    ("gela", 1),
    ("tila", 1),
    ("kana", 1),
    ("kina", 1),
    ("mina", 1),
    ("duna", 1),
    ("ngoa", 1),
    ("zioa", 1),
    ("zkoa", 1),
    ("aroa", 1),
    ("eroa", 1),
    ("oroa", 1),
    ("osoa", 1),
    ("ttoa", 1),
    ("ztoa", 1),
    ("txoa", 1),
    ("tzoa", 1),
    ("dara", 1),
    ("tara", 1),
    ("bera", 1),
    ("kera", 1),
    ("pera", 1),
    ("keta", 1),
    ("tsua", 1),
    ("txua", 1),
    ("tzua", 1),
    ("gabe", 1),
    ("kabe", 1),
    ("kide", 1),
    ("alde", 1),
    ("orde", 1),
    ("zale", 1),
    ("gile", 1),
    ("kume", 1),
    ("gune", 1),
    ("kote", 1),
    ("arte", 1),
    ("oste", 1),
    ("etxe", 1),
    ("aldi", 1),
    ("degi", 1),
    ("tegi", 1),
    ("nahi", 1),
    ("toki", 1),
    ("kari", 1),
    ("lari", 1),
    ("tari", 1),
    ("duri", 1),
    ("kail", 1),
    ("etan", 1),
    ("tzen", 4),
    ("zain", 1),
    ("asun", 1),
    ("ondo", 1),
    ("tako", 1),
    ("tuko", 1),
    ("zino", 1),
    ("taro", 1),
    ("zaro", 1),
    ("giro", 1),
    ("liar", 1),
    ("tiar", 1),
    ("tzar", 1),
    ("ordu", 1),
    ("leku", 1),
    ("buru", 2),
    ("duru", 1),
    ("tatu", 4),
    ("estu", 1),
    ("eroz", 1),
    ("ada", 1),
    ("nea", 1),
    ("pea", 1),
    ("tea", 1),
    ("kia", 1),
    ("oia", 1),
    ("tia", 1),
    ("ska", 1),
    ("xka", 1),
    ("zka", 1),
    ("ola", 1),
    ("ena", 1),
    ("una", 1),
    ("koa", 1),
    ("noa", 1),
    ("toa", 1),
    ("ñoa", 1),
    ("ara", 1),
    ("ora", 2),
    ("tra", 1),
    ("osa", 1),
    ("eta", 1),
    ("sta", 1),
    ("dua", 1),
    ("tua", 1),
    ("zua", 1),
    ("eza", 1),
    ("tza", 2),
    ("eme", 1),
    ("une", 1),
    ("gai", 1),
    ("gei", 1),
    ("egi", 1),
    ("ohi", 1),
    ("goi", 1),
    ("koi", 1),
    ("ari", 1),
    ("asi", 1),
    ("ail", 1),
    ("kan", 1),
    ("tan", 1),
    ("ren", 2),
    ("ten", 4),
    ("kin", 1),
    ("min", 1),
    ("dun", 1),
    ("ngo", 1),
    ("zio", 1),
    ("eko", 1),
    ("sko", 1),
    ("zko", 1),
    ("aro", 1),
    ("ero", 1),
    ("oro", 1),
    ("oso", 1),
    ("tto", 1),
    ("zto", 1),
    ("txo", 1),
    ("tzo", 1),
    ("dar", 1),
    ("tar", 1),
    ("kor", 1),
    ("ket", 1),
    ("tsu", 1),
    ("txu", 1),
    ("tzu", 1),
    ("ga", 1),
    ("ka", 1),
    ("na", 1),
    ("ra", 1),
    ("sa", 1),
    ("ta", 1),
    ("za", 1),
    ("ge", 1),
    ("ne", 1),
    ("pe", 1),
    ("te", 1),
    ("di", 1),
    ("ki", 1),
    ("oi", 1),
    ("ti", 1),
    ("ñi", 1),
    ("ak", 1),
    ("ek", 1),
    ("en", 4),
    ("go", 1),
    ("ko", 1),
    ("no", 1),
    ("ro", 1),
    ("to", 1),
    ("ño", 1),
    ("zp", 1),
    ("ar", 1),
    ("or", 2),
    ("os", 1),
    ("du", 1),
    ("tu", 1),
    ("zu", 1),
    ("ez", 1),
    ("tz", 1),
    ("z", 1))

  private val Adjetiboak = Array(
    ("keria", 1),
    ("lanik", 1),
    ("larik", 1),
    ("zlea", 2),
    ("dade", 1),
    ("tade", 1),
    ("date", 1),
    ("tate", 1),
    ("ztik", 1),
    ("era", 1),
    ("rik", 1),
    ("ero", 1),
    ("la", 1),
    ("gi", 1),
    ("ki", 1),
    ("ik", 1),
    ("go", 1),
    ("ro", 1),
    ("to", 1))


  /** Spanish-style RV. */
  private def rvOf(s: String): Int = {
    val n = s.length
    if (n < 2) return n
    def gopastVowel(from: Int): Int = {
      var i = from
      while (i < n && !vowels(s.charAt(i))) i += 1
      if (i >= n) n else i + 1
    }
    def gopastNonVowel(from: Int): Int = {
      var i = from
      while (i < n && vowels(s.charAt(i))) i += 1
      if (i >= n) n else i + 1
    }
    if (vowels(s.charAt(0))) {
      if (!vowels(s.charAt(1))) gopastVowel(2) else gopastNonVowel(2)
    } else {
      if (!vowels(s.charAt(1))) gopastVowel(2)
      else if (n >= 3) 3
      else n
    }
  }

  private def markRegion(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    while (i < n && !vowels(s.charAt(i))) i += 1
    if (i >= n) return n
    var j = i + 1
    while (j < n && vowels(s.charAt(j))) j += 1
    if (j >= n) n else j + 1
  }

  def stem(term: String): String = {
    var s = term
    val pV = rvOf(s)
    val p1 = markRegion(s, 0)
    val p2 = if (p1 >= s.length) s.length else markRegion(s, p1)
    // Snowball's backward `repeat` resumes LEFT of a replacement (cursor =
    // bra after slice_from), so the loops walk leftward through the word —
    // an explicit end cursor, never re-matching at the string end (which
    // would spin forever on self-rewrites like atseden → atseden).
    var end = s.length
    def once(table: Array[(String, Int)],
             act: (Int, Int) => Option[String]): Boolean =
      table.find { case (t, _) =>
        end >= t.length && s.startsWith(t, end - t.length)
      } match {
        case Some((t, c)) =>
          val start = end - t.length
          act(c, start) match {
            case Some(rep) =>
              s = s.substring(0, start) + rep + s.substring(end)
              end = start
              true
            case None => false
          }
        case None => false
      }
    // verbs, repeated leftward to a fixpoint
    var go = true
    while (go) go = once(Aditzak, (c, start) => c match {
      case 1 => if (start >= pV) Some("") else None
      case 2 => if (start >= p2) Some("") else None
      case 3 => Some("atseden")
      case 4 => Some("arabera")
      case _ => Some("baditu")
    })
    // nouns, repeated leftward from the cursor the verb walk left
    go = true
    while (go) go = once(Izenak, (c, start) => c match {
      case 1 => if (start >= pV) Some("") else None
      case 2 => if (start >= p2) Some("") else None
      case 3 => Some("jok")
      case 4 => if (start >= p1) Some("") else None
      case 5 => Some("tra")
      case 6 => Some("minutu")
      case 7 => Some("zehar")
      case 8 => Some("geldi")
      case 9 => Some("igaro")
      case _ => Some("aurka")
    })
    // adjectives, once, from the current cursor
    once(Adjetiboak, (c, start) => c match {
      case 1 => if (start >= pV) Some("") else None
      case _ => Some("z")
    })
    s
  }
}

/** Basque analysis chain: standard → lowercase → stop(EU) → snowball. */
final case class BasqueAnalyzer(stopWords: Set[String] = Analyzers.BasqueStopWords)
    extends Analyzer {
  override val name = "basque"
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
        val stemmed = BasqueSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
