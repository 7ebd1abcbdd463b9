package graft.core

/** Lithuanian Snowball stemmer + chain (`lithuanian.sbl`; generated
  * reference at `org/tartarus/snowball/ext/LithuanianStemmer.java`;
  * analyzer composition `lt/LithuanianAnalyzer.java:114`), pinned to the
  * reference implementation's output over a generated vocabulary in
  * SnowballSpec.
  */
object LithuanianSnowball extends Serializable {
  private val vowels =
    Set('a', 'e', 'i', 'o', 'u', 'y', 'ą', 'ė', 'ę', 'į', 'ū', 'ų')

  private val Step1 = Array(
    ("tumeisi", -1),
    ("tumėmės", -1),
    ("tumėtės", -1),
    ("iuosna", -1),
    ("tumėme", -1),
    ("tumėte", -1),
    ("siuosi", -1),
    ("čiausi", -1),
    ("telėti", -1),
    ("terėti", -1),
    ("tumeis", -1),
    ("enimis", -1),
    ("iosna", -1),
    ("uosna", -1),
    ("enyje", -1),
    ("eryje", -1),
    ("iuose", -1),
    ("enyse", -1),
    ("eryse", -1),
    ("eriai", -1),
    ("tumei", -1),
    ("erimi", -1),
    ("siesi", -1),
    ("ėjosi", -1),
    ("iuosi", -1),
    ("iuoti", -1),
    ("iauti", -1),
    ("inėti", -1),
    ("eniui", -1),
    ("tumėm", -1),
    ("iomis", -1),
    ("enims", -1),
    ("erims", -1),
    ("iamės", -1),
    ("kimės", -1),
    ("simės", -1),
    ("iatės", -1),
    ("sitės", -1),
    ("tumėt", -1),
    ("eria", -1),
    ("osna", -1),
    ("ysna", -1),
    ("ėsna", -1),
    ("enie", -1),
    ("erie", -1),
    ("ioje", -1),
    ("iuje", -1),
    ("iame", -1),
    ("sime", -1),
    ("iose", -1),
    ("uose", -1),
    ("iate", -1),
    ("kite", -1),
    ("site", -1),
    ("tute", -1),
    ("iumi", -1),
    ("iasi", -1),
    ("iesi", -1),
    ("aisi", -1),
    ("eisi", -1),
    ("uisi", -1),
    ("uosi", -1),
    ("ausi", -1),
    ("tųsi", -1),
    ("enti", -1),
    ("inti", -1),
    ("ioti", -1),
    ("uoti", -1),
    ("auti", -1),
    ("enio", -1),
    ("iais", -1),
    ("imis", -1),
    ("omis", -1),
    ("umis", -1),
    ("ėmis", -1),
    ("enis", -1),
    ("asis", -1),
    ("ysis", -1),
    ("iams", -1),
    ("iems", -1),
    ("ioms", -1),
    ("iuos", -1),
    ("iaus", -1),
    ("enys", -1),
    ("erys", -1),
    ("amės", -1),
    ("imės", -1),
    ("omės", -1),
    ("ėmės", -1),
    ("atės", -1),
    ("otės", -1),
    ("ėtės", -1),
    ("čiau", -1),
    ("eniu", -1),
    ("oje", -1),
    ("uje", -1),
    ("yje", -1),
    ("ėje", -1),
    ("ame", -1),
    ("ome", -1),
    ("ėme", -1),
    ("ose", -1),
    ("yse", -1),
    ("ėse", -1),
    ("ate", -1),
    ("ite", -1),
    ("ote", -1),
    ("ėte", -1),
    ("iai", -1),
    ("imi", -1),
    ("umi", -1),
    ("asi", -1),
    ("esi", -1),
    ("isi", -1),
    ("osi", -1),
    ("usi", -1),
    ("ąsi", -1),
    ("ėsi", -1),
    ("ųsi", -1),
    ("oti", -1),
    ("yti", -1),
    ("ėti", -1),
    ("iui", -1),
    ("iam", -1),
    ("iem", -1),
    ("sim", -1),
    ("tum", -1),
    ("ion", -1),
    ("iun", -1),
    ("ėjo", -1),
    ("ias", -1),
    ("ies", -1),
    ("ais", -1),
    ("ams", -1),
    ("ims", -1),
    ("oms", -1),
    ("ums", -1),
    ("ėms", -1),
    ("ens", -1),
    ("ios", -1),
    ("uos", -1),
    ("ers", -1),
    ("aus", -1),
    ("ius", -1),
    ("iąs", -1),
    ("tųs", -1),
    ("iat", -1),
    ("sit", -1),
    ("iau", -1),
    ("siu", -1),
    ("enį", -1),
    ("erį", -1),
    ("erų", -1),
    ("ia", -1),
    ("ie", -1),
    ("ai", -1),
    ("ei", -1),
    ("ki", -1),
    ("si", -1),
    ("ti", -1),
    ("ui", -1),
    ("oj", -1),
    ("ėj", -1),
    ("am", -1),
    ("im", -1),
    ("om", -1),
    ("ėm", -1),
    ("an", -1),
    ("on", -1),
    ("un", -1),
    ("ėn", -1),
    ("io", -1),
    ("uo", -1),
    ("as", -1),
    ("es", -1),
    ("is", -1),
    ("os", -1),
    ("us", -1),
    ("ys", -1),
    ("ąs", -1),
    ("ės", -1),
    ("įs", -1),
    ("ūs", -1),
    ("at", -1),
    ("it", -1),
    ("ot", -1),
    ("ėt", -1),
    ("au", -1),
    ("iu", -1),
    ("ią", -1),
    ("ių", -1),
    ("a", -1),
    ("e", -1),
    ("i", -1),
    ("k", -1),
    ("o", -1),
    ("s", -1),
    ("u", -1),
    ("y", -1),
    ("ą", -1),
    ("ė", -1),
    ("ę", -1),
    ("į", -1),
    ("ų", -1))

  private val Step2 = Array(
    ("utėait", -1),
    ("uliuk", -1),
    ("učiuk", -1),
    ("siant", -1),
    ("iuoj", -1),
    ("zgan", -1),
    ("iais", -1),
    ("iuos", -1),
    ("iaus", -1),
    ("iant", -1),
    ("iuot", -1),
    ("ykšt", -1),
    ("ykšč", -1),
    ("ing", -1),
    ("iaj", -1),
    ("iej", -1),
    ("ioj", -1),
    ("uoj", -1),
    ("auj", -1),
    ("iąj", -1),
    ("iųj", -1),
    ("iok", -1),
    ("iuk", -1),
    ("išk", -1),
    ("iul", -1),
    ("dam", -1),
    ("jam", -1),
    ("ain", -1),
    ("esn", -1),
    ("iop", -1),
    ("ias", -1),
    ("ies", -1),
    ("ais", -1),
    ("ios", -1),
    ("uos", -1),
    ("aus", -1),
    ("iąs", -1),
    ("ant", -1),
    ("int", -1),
    ("uot", -1),
    ("iau", -1),
    ("dav", -1),
    ("ėję", -1),
    ("aj", -1),
    ("oj", -1),
    ("ąj", -1),
    ("ėj", -1),
    ("ųj", -1),
    ("ok", -1),
    ("yl", -1),
    ("ėl", -1),
    ("am", -1),
    ("op", -1),
    ("os", -1),
    ("ąs", -1),
    ("ęs", -1),
    ("ot", -1),
    ("yt", -1),
    ("ėt", -1),
    ("sv", -1),
    ("šv", -1),
    ("ę", -1))

  private val Conflicts = Array(
    ("okatės", 8),
    ("ojime", 7),
    ("ėjime", 3),
    ("avime", 6),
    ("okate", 8),
    ("asius", 5),
    ("aitės", 1),
    ("uotės", 2),
    ("aite", 1),
    ("uote", 2),
    ("esiu", 4))

  private val ChDz = Array(
    ("dž", 2),
    ("č", 1))

  private val Gd = Array(
    ("gd", 1))


  /** R1, with the reference's quirk: words starting with 'a' longer than 6
    * chars scan from index 1. */
  private def r1Of(s: String): Int = {
    val n = s.length
    var i = if (n > 6 && n > 0 && s.charAt(0) == 'a') 1 else 0
    while (i < n && !vowels(s.charAt(i))) i += 1
    if (i >= n) return n
    var j = i + 1
    while (j < n && vowels(s.charAt(j))) j += 1
    if (j >= n) n else j + 1
  }

  /** Longest suffix FITTING in [p1, len) (region-limited matching). */
  private def stripFit(s: String, table: Array[(String, Int)], p1: Int): Option[String] =
    table.find { case (t, _) => s.endsWith(t) && s.length - t.length >= p1 }
      .map { case (t, _) => s.substring(0, s.length - t.length) }

  def stem(term: String): String = {
    var s = term
    val p1 = r1Of(s)
    // fix_conflicts: unrestricted longest match, canonical-form rewrites
    Conflicts.find { case (t, _) => s.endsWith(t) }.foreach { case (t, c) =>
      val base = s.substring(0, s.length - t.length)
      s = base + (c match {
        case 1 => "aitė"
        case 2 => "uotė"
        case 3 => "ėjimas"
        case 4 => "esys"
        case 5 => "asys"
        case 6 => "avimas"
        case 7 => "ojimas"
        case _ => "okatė"
      })
    }
    // step 1: one case-suffix strip in R1
    stripFit(s, Step1, p1).foreach(s = _)
    // fix č/dž, then repeat step-2 strips in R1, then fix again, then gd→g
    def fixChdz(): Unit = {
      if (s.endsWith("dž")) s = s.substring(0, s.length - 2) + "d"
      else if (s.endsWith("č")) s = s.substring(0, s.length - 1) + "t"
    }
    fixChdz()
    var changed = true
    while (changed) {
      changed = false
      stripFit(s, Step2, p1).foreach { b => s = b; changed = true }
    }
    fixChdz()
    if (s.endsWith("gd")) s = s.substring(0, s.length - 1)
    s
  }
}

/** Lithuanian analysis chain: standard → lowercase → stop(LT) → snowball. */
final case class LithuanianAnalyzer(stopWords: Set[String] = Analyzers.LithuanianStopWords)
    extends Analyzer {
  override val name = "lithuanian"
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
        val stemmed = LithuanianSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
