package graft.core

/** Snowball-family stemmers for the Danish / Dutch / Romanian / Turkish
  * analyzers — re-expressions of the published Snowball algorithms
  * (snowballstem.org, BSD-licensed; the reference ships generated Java under
  * `lucene/analysis/common/src/java/org/tartarus/snowball/ext/`). Each is
  * pinned to the reference implementation's output over a generated
  * vocabulary in SnowballSpec — parity is asserted per word, like the UniNE
  * stemmer family in [[LightStemmers]].
  *
  * Danish / Dutch / Romanian are written as direct string passes (their
  * control flow is a straight suffix cascade); Turkish keeps a tiny
  * backward-cursor buffer ([[SnowBuf]]) because its morphological chains
  * need the cursor/mark semantics of the original.
  */

/** Backward-mode cursor over a mutable word — the minimal slice of the
  * Snowball runtime the Turkish chains need: `c` is the cursor (an index;
  * chars left of it are unconsumed), `bra`/`ket` delimit the pending slice,
  * and save/restore works in from-end distances so restores stay correct
  * across slices. */
private[core] final class SnowBuf(var s: String) {
  var c: Int = s.length
  var lb: Int = 0
  var bra: Int = 0
  var ket: Int = 0
  def fe: Int = s.length - c
  def seek(fromEnd: Int): Unit = c = s.length - fromEnd
  def eqSB(t: String): Boolean =
    if (c - lb >= t.length && s.startsWith(t, c - t.length)) { c -= t.length; true }
    else false
  def inB(g: Char => Boolean): Boolean =
    if (c > lb && g(s.charAt(c - 1))) { c -= 1; true } else false
  def outB(g: Char => Boolean): Boolean =
    if (c > lb && !g(s.charAt(c - 1))) { c -= 1; true } else false
  def prev(): Boolean = if (c > lb) { c -= 1; true } else false
  /** Longest-first suffix match at the cursor (words MUST be length-desc). */
  def amongB(words: Array[String]): Boolean = {
    var i = 0
    while (i < words.length) {
      val t = words(i)
      if (c - lb >= t.length && s.startsWith(t, c - t.length)) { c -= t.length; return true }
      i += 1
    }
    false
  }
  def sliceDel(): Unit = { s = s.substring(0, bra) + s.substring(ket); ket = bra }
  def sliceFrom(r: String): Unit = {
    s = s.substring(0, bra) + r + s.substring(ket); ket = bra + r.length
  }
}

private[core] object SnowballUtil {
  /** Sort a suffix table longest-first (stable), the `find_among_b` order. */
  def byLenDesc(ws: Seq[String]): Array[String] = ws.sortBy(-_.length).toArray
}

/** Danish Snowball stemmer (`danish.sbl`; generated reference at
  * `org/tartarus/snowball/ext/DanishStemmer.java`). */
object DanishSnowball extends Serializable {
  private val vowels = Set('a', 'e', 'i', 'o', 'u', 'y', 'å', 'æ', 'ø')
  private val sEnding = Set('a', 'b', 'c', 'd', 'f', 'g', 'h', 'j', 'k', 'l',
    'm', 'n', 'o', 'p', 'r', 't', 'v', 'y', 'z', 'å')
  private val mainSuffixes = SnowballUtil.byLenDesc(Seq(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret"))
  private val pairs = Array("gd", "dt", "gt", "kt")
  private val otherSuffixes = SnowballUtil.byLenDesc(Seq("ig", "lig", "elig", "els"))

  /** R1 start: after the first non-vowel that follows the first vowel,
    * floored at 3 (the `x` mark in `mark_regions`). */
  private def r1Of(s: String): Int = {
    val n = s.length
    var i = 0
    while (i < n && !vowels(s.charAt(i))) i += 1
    while (i < n && vowels(s.charAt(i))) i += 1
    if (i >= n) n else math.max(i + 1, 3)
  }

  private def consonant(c: Char): Boolean = c >= 'b' && c <= 'z' && !vowels(c)

  private def consonantPair(s0: String, p1: Int): String = {
    val n = s0.length
    if (n >= 2 && n - 2 >= p1 && pairs.exists(s0.endsWith(_))) s0.substring(0, n - 1)
    else s0
  }

  def stem(term: String): String = {
    var s = term
    val p1 = r1Of(s)
    // main suffix: longest table suffix fitting inside R1
    val hit = mainSuffixes.find(t => s.endsWith(t) && s.length - t.length >= p1)
    hit match {
      case Some(t) => s = s.substring(0, s.length - t.length)
      case None =>
        if (s.endsWith("s") && s.length - 1 >= p1 &&
          s.length >= 2 && sEnding(s.charAt(s.length - 2)))
          s = s.substring(0, s.length - 1)
    }
    // consonant pair: gd/dt/gt/kt in R1 → drop last letter
    s = consonantPair(s, p1)
    // other suffix: first ...igst → ...ig (unrestricted), then R1 cascade
    if (s.endsWith("igst")) s = s.substring(0, s.length - 2)
    if (s.endsWith("løst") && s.length - 4 >= p1) s = s.substring(0, s.length - 1)
    else otherSuffixes.find(t => s.endsWith(t) && s.length - t.length >= p1).foreach { t =>
      s = consonantPair(s.substring(0, s.length - t.length), p1)
    }
    // undouble: final doubled consonant in R1 → drop one
    val n = s.length
    if (n >= 2 && n - 1 >= p1 && consonant(s.charAt(n - 1)) && s.charAt(n - 2) == s.charAt(n - 1))
      s = s.substring(0, n - 1)
    s
  }
}

/** Dutch Snowball stemmer (`dutch.sbl`; generated reference at
  * `org/tartarus/snowball/ext/DutchStemmer.java`). */
object DutchSnowball extends Serializable {
  private val vowels = Set('a', 'e', 'i', 'o', 'u', 'y', 'è')
  // step-1 's' may not follow a vowel or j; en-endings may not follow a vowel
  private val vowelsOrJ = vowels + 'j'

  private def markRegion(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    while (i < n && !vowels(s.charAt(i))) i += 1
    if (i >= n) return n
    var j = i + 1
    while (j < n && vowels(s.charAt(j))) j += 1
    if (j >= n) n else j + 1
  }

  private def undouble(s: String): String =
    if (s.endsWith("dd") || s.endsWith("kk") || s.endsWith("tt")) s.substring(0, s.length - 1)
    else s

  def stem(term: String): String = {
    // prelude: fold accents, then mark consonantal i/y as I/Y
    val sb = new StringBuilder(term.length)
    term.foreach { ch =>
      sb.append(ch match {
        case 'á' | 'ä' => 'a'
        case 'é' | 'ë' => 'e'
        case 'í' | 'ï' => 'i'
        case 'ó' | 'ö' => 'o'
        case 'ú' | 'ü' => 'u'
        case c => c
      })
    }
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var k = 0
    while (k < sb.length) {
      if (vowels(sb.charAt(k)) && k + 1 < sb.length) {
        if (sb.charAt(k + 1) == 'i' && k + 2 < sb.length && vowels(sb.charAt(k + 2)))
          sb.setCharAt(k + 1, 'I')
        else if (sb.charAt(k + 1) == 'y') sb.setCharAt(k + 1, 'Y')
      }
      k += 1
    }
    var s = sb.toString
    val p1raw = markRegion(s, 0)
    val p2 = if (p1raw >= s.length) s.length else markRegion(s, p1raw)
    val p1 = if (p1raw >= s.length) p1raw else math.max(p1raw, 3)
    def inR1(suffixStart: Int) = suffixStart >= p1
    def inR2(suffixStart: Int) = suffixStart >= p2

    var eFound = false
    def enEnding(base: String): Option[String] = {
      // caller already stripped en/ene; `base` is the remaining stem
      if (base.isEmpty || vowels(base.last) || base.endsWith("gem")) None
      else Some(undouble(base))
    }

    // step 1 (longest of heden/ene/en/se/s, one attempt, no backtracking)
    if (s.endsWith("heden")) {
      if (inR1(s.length - 5)) s = s.substring(0, s.length - 5) + "heid"
    } else if (s.endsWith("ene")) {
      if (inR1(s.length - 3)) enEnding(s.substring(0, s.length - 3)).foreach(s = _)
    } else if (s.endsWith("en")) {
      if (inR1(s.length - 2)) enEnding(s.substring(0, s.length - 2)).foreach(s = _)
    } else if (s.endsWith("se")) {
      if (inR1(s.length - 2) && s.length >= 3 && !vowelsOrJ(s.charAt(s.length - 3)))
        s = s.substring(0, s.length - 2)
    } else if (s.endsWith("s")) {
      if (inR1(s.length - 1) && s.length >= 2 && !vowelsOrJ(s.charAt(s.length - 2)))
        s = s.substring(0, s.length - 1)
    }

    // step 2: e-ending
    def eEnding(): Boolean = {
      eFound = false
      if (s.endsWith("e") && inR1(s.length - 1) && s.length >= 2 && !vowels(s.charAt(s.length - 2))) {
        s = undouble(s.substring(0, s.length - 1))
        eFound = true
        true
      } else false
    }
    eEnding()

    // step 3a: heid
    if (s.endsWith("heid") && inR2(s.length - 4) &&
      (s.length < 5 || s.charAt(s.length - 5) != 'c')) {
      s = s.substring(0, s.length - 4)
      if (s.endsWith("en") && inR1(s.length - 2))
        enEnding(s.substring(0, s.length - 2)).foreach(s = _)
    }

    // step 3b: d-suffixes (longest of lijk/baar/end/ing/bar/ig)
    if (s.endsWith("lijk")) {
      if (inR2(s.length - 4)) { s = s.substring(0, s.length - 4); eEnding() }
    } else if (s.endsWith("baar")) {
      if (inR2(s.length - 4)) s = s.substring(0, s.length - 4)
    } else if (s.endsWith("end") || s.endsWith("ing")) {
      if (inR2(s.length - 3)) {
        s = s.substring(0, s.length - 3)
        if (s.endsWith("ig") && inR2(s.length - 2) &&
          (s.length < 3 || s.charAt(s.length - 3) != 'e'))
          s = s.substring(0, s.length - 2)
        else s = undouble(s)
      }
    } else if (s.endsWith("bar")) {
      if (inR2(s.length - 3) && eFound) s = s.substring(0, s.length - 3)
    } else if (s.endsWith("ig")) {
      if (inR2(s.length - 2) && (s.length < 3 || s.charAt(s.length - 3) != 'e'))
        s = s.substring(0, s.length - 2)
    }

    // step 4: undouble vowel — C aa/ee/oo/uu C → drop one vowel
    val n = s.length
    if (n >= 4) {
      val last = s.charAt(n - 1)
      val v = s.charAt(n - 2)
      if (!vowels(last) && last != 'I' && v == s.charAt(n - 3) &&
        (v == 'a' || v == 'e' || v == 'o' || v == 'u') && !vowels(s.charAt(n - 4)))
        s = s.substring(0, n - 2) + s.substring(n - 1)
    }

    // postlude
    s.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }
}

/** Romanian Snowball stemmer (`romanian.sbl`; generated reference at
  * `org/tartarus/snowball/ext/RomanianStemmer.java`). Cedilla forms are
  * folded to comma forms first, like the stemmer's own `norm` (and the
  * reference's RomanianNormalizationFilter ahead of it). */
object RomanianSnowball extends Serializable {
  private val vowels = Set('a', 'e', 'i', 'o', 'u', 'â', 'î', 'ă')

  private val step0 = SnowballUtil.byLenDesc(Seq(
    "ea", "ația", "aua", "iua", "ație", "ele", "ile", "iile", "iei", "atei",
    "ii", "ului", "ul", "elor", "ilor", "iilor"))
  private val combo = SnowballUtil.byLenDesc(Seq(
    "icala", "iciva", "ativa", "itiva", "icale", "ațiune", "ițiune",
    "atoare", "itoare", "ătoare", "icitate", "abilitate", "ibilitate",
    "ivitate", "icive", "ative", "itive", "icali", "atori", "icatori",
    "itori", "ători", "icitati", "abilitati", "ivitati", "icivi", "ativi",
    "itivi", "icităi", "abilităi", "ivităi", "icități", "abilități",
    "ivități", "ical", "ator", "icator", "itor", "ător", "iciv", "ativ",
    "itiv", "icală", "icivă", "ativă", "itivă"))
  private val standard = SnowballUtil.byLenDesc(Seq(
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "ista", "uta",
    "iva", "ic", "ice", "abile", "ibile", "isme", "iune", "oase", "ate",
    "itate", "ite", "ante", "iste", "ute", "ive", "ici", "abili", "ibili",
    "iuni", "atori", "osi", "ati", "itati", "iti", "anti", "isti", "uti",
    "iști", "ivi", "ităi", "oși", "ități", "abil", "ibil", "ism", "ator",
    "os", "at", "it", "ant", "ist", "ut", "iv", "ică", "abilă", "ibilă",
    "oasă", "ată", "ită", "antă", "istă", "ută", "ivă"))
  private val verb1: Set[String] = Set(
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "ase", "ise", "use", "âse", "ește", "ăște", "eze", "ai", "eai", "iai",
    "ești", "ăști", "ui", "ezi", "âi", "ași", "aseși", "iseși", "useși",
    "âseși", "iși", "uși", "âși", "eați", "iați", "arăți", "aserăți",
    "iserăți", "userăți", "âserăți", "irăți", "urăți", "ârăți", "am", "eam",
    "iam", "asem", "isem", "usem", "âsem", "arăm", "aserăm", "iserăm",
    "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau", "indu",
    "ându", "ez", "ească", "ară", "aseră", "iseră", "useră",
    "âseră", "iră", "ură", "âră", "ează")
  private val verb2: Set[String] = Set(
    "se", "sese", "sei", "seși", "seseși", "ați", "eți", "iți", "âți",
    "serăți", "seserăți", "em", "sesem", "im", "âm", "ăm", "serăm",
    "seserăm", "seră", "seseră")
  private val verbAll = SnowballUtil.byLenDesc((verb1 ++ verb2).toSeq)
  private val vowelSuf = SnowballUtil.byLenDesc(Seq("a", "e", "ie", "i", "ă"))

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
      if (!vowels(s.charAt(1))) gopastVowel(2)
      else gopastNonVowel(2)
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
    // norm: cedilla → comma-below forms
    var s = term.map { case 'ş' => 'ș'; case 'ţ' => 'ț'; case c => c }
    // prelude: vowel-u-vowel → U, vowel-i-vowel → I
    val sb = new StringBuilder(s)
    var k = 0
    while (k + 2 < sb.length) {
      if (vowels(sb.charAt(k)) && vowels(sb.charAt(k + 2))) {
        if (sb.charAt(k + 1) == 'u') sb.setCharAt(k + 1, 'U')
        else if (sb.charAt(k + 1) == 'i') sb.setCharAt(k + 1, 'I')
      }
      k += 1
    }
    s = sb.toString
    val pV = rvOf(s)
    val p1 = markRegion(s, 0)
    val p2 = if (p1 >= s.length) s.length else markRegion(s, p1)

    // step 0 (removal of plurals & articles): LONGEST raw match, then the
    // R1 test — a too-long match outside R1 blocks shorter alternatives,
    // exactly the reference's unrestricted find_among_b + r_R1 order
    step0.find(s.endsWith(_)).foreach { t =>
      if (s.length - t.length >= p1) {
        val base = s.substring(0, s.length - t.length)
        t match {
          case "ul" | "ului" => s = base
          case "aua" => s = base + "a"
          case "ea" | "ele" | "elor" => s = base + "e"
          case "ii" | "iua" | "iei" | "iile" | "ilor" | "iilor" => s = base + "i"
          case "ile" => if (!base.endsWith("ab")) s = base + "i"
          case "atei" => s = base + "at"
          case "ația" | "ație" => s = base + "ați"
        }
      }
    }

    // standard suffixes: repeat combo replacements, then the R2 cascade
    var removed = false
    var changed = true
    while (changed) {
      changed = false
      combo.find(s.endsWith(_)).foreach { t =>
        if (s.length - t.length >= p1) {
          val base = s.substring(0, s.length - t.length)
          val rep =
            if (t.startsWith("abilit")) "abil"
            else if (t.startsWith("ibilit")) "ibil"
            else if (t.startsWith("ivit")) "iv"
            else if (t.startsWith("ic")) "ic"
            else if (t == "ativa" || t == "ative" || t == "ativi" || t == "ativă" ||
              t == "ativ" || t == "ațiune" || t == "atoare" || t == "ator" ||
              t == "atori" || t == "ătoare" || t == "ător" || t == "ători") "at"
            else "it" // itiva/itive/itivi/itivă/ițiune/itoare/itor/itori
          s = base + rep
          removed = true
          changed = true
        }
      }
    }
    standard.find(s.endsWith(_)).foreach { t =>
      if (s.length - t.length >= p2) {
        val base = s.substring(0, s.length - t.length)
        if (t == "iune" || t == "iuni") {
          if (base.endsWith("ț")) { s = base.substring(0, base.length - 1) + "t"; removed = true }
        } else if (t == "ista" || t == "iste" || t == "isti" || t == "istă" ||
          t == "iști" || t == "isme" || t == "ism" || t == "ist") {
          s = base + "ist"; removed = true
        } else { s = base; removed = true }
      }
    }

    // verb suffixes (only when no standard suffix was removed), region RV
    if (!removed) {
      verbAll.find(t => s.endsWith(t) && s.length - t.length >= pV).foreach { t =>
        val start = s.length - t.length
        if (verb2.contains(t)) s = s.substring(0, start)
        else {
          // group-1 suffixes need a preceding non-vowel or 'u', inside RV
          if (start - 1 >= pV && start >= 1 &&
            (!vowels(s.charAt(start - 1)) || s.charAt(start - 1) == 'u'))
            s = s.substring(0, start)
        }
      }
    }

    // final vowel: longest raw match, then the RV test (no shorter fallback)
    vowelSuf.find(s.endsWith(_)).foreach { t =>
      if (s.length - t.length >= pV) s = s.substring(0, s.length - t.length)
    }

    // postlude
    s.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }
}

/** Turkish Snowball stemmer (`turkish.sbl`, Evren (Kapusuz) Çilden's
  * algorithm; generated reference at
  * `org/tartarus/snowball/ext/TurkishStemmer.java`). Operates on the output
  * of the Turkish lowercase filter. */
object TurkishSnowball extends Serializable {
  private val Vowel: Char => Boolean = Set('a', 'e', 'i', 'o', 'u', 'ö', 'ü', 'ı')
  private val HighV: Char => Boolean = Set('i', 'u', 'ü', 'ı')

  private def harmonyClass(v: Char): Char => Boolean = v match {
    case 'a' => Set('a', 'o', 'u', 'ı')
    case 'e' => Set('e', 'i', 'ö', 'ü')
    case 'ı' => Set('a', 'ı')
    case 'i' => Set('e', 'i')
    case 'o' | 'u' => Set('o', 'u')
    case _ => Set('ö', 'ü') // ö, ü
  }

  /** The last vowel's harmony class must contain some earlier vowel. */
  private def checkVowelHarmony(z: SnowBuf): Boolean = {
    var i = z.c
    while (i > z.lb && !Vowel(z.s.charAt(i - 1))) i -= 1
    if (i <= z.lb) return false
    val cls = harmonyClass(z.s.charAt(i - 1))
    var j = i - 1
    while (j > z.lb) {
      if (cls(z.s.charAt(j - 1))) return true
      j -= 1
    }
    false
  }

  /** `(c test(v)) or (not(test c) test(next v))` — the optional-consonant /
    * optional-U-vowel gates. On the consonant branch the consonant is
    * CONSUMED (joins the suffix slice); otherwise the cursor stays. */
  private def optionalGate(z: SnowBuf, isC: Char => Boolean, followC: Char => Boolean): Boolean = {
    if (z.c > z.lb && isC(z.s.charAt(z.c - 1))) {
      if (z.c - 1 > z.lb && followC(z.s.charAt(z.c - 2))) { z.c -= 1; return true }
      return false // a matching consonant NOT followed correctly fails outright
    }
    // no consonant: the char two back must satisfy the follow-check
    if (z.c <= z.lb) return false
    if (z.c - 1 <= z.lb) return false
    followC(z.s.charAt(z.c - 2))
  }
  private def optN(z: SnowBuf): Boolean = optionalGate(z, _ == 'n', Vowel)
  private def optS(z: SnowBuf): Boolean = optionalGate(z, _ == 's', Vowel)
  private def optY(z: SnowBuf): Boolean = optionalGate(z, _ == 'y', Vowel)
  private def optU(z: SnowBuf): Boolean = optionalGate(z, HighV, c => !Vowel(c))

  private val aPoss = SnowballUtil.byLenDesc(Seq(
    "m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız"))
  private val aLArI = SnowballUtil.byLenDesc(Seq("leri", "ları"))
  private val aNU = SnowballUtil.byLenDesc(Seq("ni", "nu", "nü", "nı"))
  private val aNUn = SnowballUtil.byLenDesc(Seq("in", "un", "ün", "ın"))
  private val aYA = SnowballUtil.byLenDesc(Seq("a", "e"))
  private val aNA = SnowballUtil.byLenDesc(Seq("na", "ne"))
  private val aDA = SnowballUtil.byLenDesc(Seq("da", "ta", "de", "te"))
  private val aNdA = SnowballUtil.byLenDesc(Seq("nda", "nde"))
  private val aDAn = SnowballUtil.byLenDesc(Seq("dan", "tan", "den", "ten"))
  private val aNdAn = SnowballUtil.byLenDesc(Seq("ndan", "nden"))
  private val aYlA = SnowballUtil.byLenDesc(Seq("la", "le"))
  private val aNcA = SnowballUtil.byLenDesc(Seq("ca", "ce"))
  private val aYUm = SnowballUtil.byLenDesc(Seq("im", "um", "üm", "ım"))
  private val aSUn = SnowballUtil.byLenDesc(Seq("sin", "sun", "sün", "sın"))
  private val aYUz = SnowballUtil.byLenDesc(Seq("iz", "uz", "üz", "ız"))
  private val aSUnUz = SnowballUtil.byLenDesc(Seq("siniz", "sunuz", "sünüz", "sınız"))
  private val aLAr = SnowballUtil.byLenDesc(Seq("lar", "ler"))
  private val aNUz = SnowballUtil.byLenDesc(Seq("niz", "nuz", "nüz", "nız"))
  private val aDUr = SnowballUtil.byLenDesc(Seq(
    "dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))
  private val aCAsInA = SnowballUtil.byLenDesc(Seq("casına", "cesine"))
  private val aYDU = SnowballUtil.byLenDesc(Seq(
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
    "du", "tu", "dü", "tü", "dı", "tı"))
  private val aYsA = SnowballUtil.byLenDesc(Seq(
    "sa", "se", "sak", "sek", "sam", "sem", "san", "sen"))
  private val aYmUs = SnowballUtil.byLenDesc(Seq("miş", "muş", "müş", "mış"))

  private def mPossessives(z: SnowBuf) = z.amongB(aPoss) && optU(z)
  private def mSU(z: SnowBuf) = checkVowelHarmony(z) && z.inB(HighV) && optS(z)
  private def mLArI(z: SnowBuf) = z.amongB(aLArI)
  private def mYU(z: SnowBuf) = checkVowelHarmony(z) && z.inB(HighV) && optY(z)
  private def mNU(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNU)
  private def mNUn(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNUn) && optN(z)
  private def mYA(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aYA) && optY(z)
  private def mNA(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNA)
  private def mDA(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aDA)
  private def mNdA(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNdA)
  private def mDAn(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aDAn)
  private def mNdAn(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNdAn)
  private def mYlA(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aYlA) && optY(z)
  private def mKi(z: SnowBuf) = z.eqSB("ki")
  private def mNcA(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNcA) && optN(z)
  private def mYUm(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aYUm) && optY(z)
  private def mSUn(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aSUn)
  private def mYUz(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aYUz) && optY(z)
  private def mSUnUz(z: SnowBuf) = z.amongB(aSUnUz)
  private def mLAr(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aLAr)
  private def mNUz(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aNUz)
  private def mDUr(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aDUr)
  private def mCAsInA(z: SnowBuf) = z.amongB(aCAsInA)
  private def mYDU(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aYDU) && optY(z)
  private def mYsA(z: SnowBuf) = z.amongB(aYsA) && optY(z)
  private def mYmUs(z: SnowBuf) = checkVowelHarmony(z) && z.amongB(aYmUs) && optY(z)
  private def mYken(z: SnowBuf) = z.eqSB("ken") && optY(z)

  /** One of N alternatives, restoring the cursor between attempts. */
  private def alt(z: SnowBuf)(fs: (SnowBuf => Boolean)*): Boolean = {
    val v = z.fe
    fs.foreach { f => if (f(z)) return true; z.seek(v) }
    false
  }

  /** Returns whether NOUN-suffix stemming should continue afterwards (false
    * only on the bare-`lAr` branch, like `B_continue_stemming_noun_suffixes`). */
  private def stemNominalVerbSuffixes(z: SnowBuf): Boolean = {
    z.ket = z.c
    val v1 = z.fe

    if (alt(z)(mYmUs, mYDU, mYsA, mYken)) { z.bra = z.c; z.sliceDel(); return true }

    z.seek(v1)
    if (mCAsInA(z)) {
      val v3 = z.fe
      if (!alt(z)(mSUnUz, mLAr, mYUm, mSUn, mYUz)) z.seek(v3)
      if (mYmUs(z)) { z.bra = z.c; z.sliceDel(); return true }
    }

    z.seek(v1)
    if (mLAr(z)) {
      z.bra = z.c; z.sliceDel()
      val v4 = z.fe
      z.ket = z.c
      if (!alt(z)(mDUr, mYDU, mYsA, mYmUs)) z.seek(v4)
      z.bra = z.c; z.sliceDel()
      return false // bare plural: stop before the noun chains
    }

    z.seek(v1)
    if (mNUz(z) && { val v6 = z.fe; mYDU(z) || { z.seek(v6); mYsA(z) } }) {
      z.bra = z.c; z.sliceDel(); return true
    }

    z.seek(v1)
    if (alt(z)(mSUnUz, mYUz, mSUn, mYUm)) {
      z.bra = z.c; z.sliceDel()
      val v8 = z.fe
      z.ket = z.c
      if (!mYmUs(z)) z.seek(v8)
      z.bra = z.c; z.sliceDel(); return true
    }

    z.seek(v1)
    if (!mDUr(z)) return true
    z.bra = z.c; z.sliceDel()
    val v9 = z.fe
    z.ket = z.c
    val v10 = z.fe
    if (!alt(z)(mSUnUz, mLAr, mYUm, mSUn, mYUz)) z.seek(v10)
    if (!mYmUs(z)) z.seek(v9)
    z.bra = z.c; z.sliceDel()
    true
  }

  private def chainBeforeKi(z: SnowBuf): Boolean = {
    z.ket = z.c
    if (!mKi(z)) return false
    val v1 = z.fe

    if (mDA(z)) {
      z.bra = z.c; z.sliceDel()
      val v2 = z.fe
      z.ket = z.c
      val v3 = z.fe
      if (mLAr(z)) {
        z.bra = z.c; z.sliceDel()
        val v4 = z.fe
        if (!chainBeforeKi(z)) z.seek(v4)
      } else {
        z.seek(v3)
        if (mPossessives(z)) {
          z.bra = z.c; z.sliceDel()
          val v5 = z.fe
          z.ket = z.c
          if (mLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainBeforeKi(z)) z.seek(v5)
          } else z.seek(v5)
        } else z.seek(v2)
      }
      return true
    }

    z.seek(v1)
    if (mNUn(z)) {
      z.bra = z.c; z.sliceDel()
      val v6 = z.fe
      z.ket = z.c
      val v7 = z.fe
      if (mLArI(z)) { z.bra = z.c; z.sliceDel(); return true }
      z.seek(v7)
      z.ket = z.c
      val v8 = z.fe
      if (mPossessives(z) || { z.seek(v8); mSU(z) }) {
        z.bra = z.c; z.sliceDel()
        val v9 = z.fe
        z.ket = z.c
        if (mLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainBeforeKi(z)) z.seek(v9)
        } else z.seek(v9)
        return true
      }
      z.seek(v7)
      if (!chainBeforeKi(z)) z.seek(v6)
      return true
    }

    z.seek(v1)
    if (!mNdA(z)) return false
    val v10 = z.fe
    if (mLArI(z)) { z.bra = z.c; z.sliceDel(); return true }
    z.seek(v10)
    if (mSU(z)) {
      z.bra = z.c; z.sliceDel()
      val v11 = z.fe
      z.ket = z.c
      if (mLAr(z)) {
        z.bra = z.c; z.sliceDel()
        if (!chainBeforeKi(z)) z.seek(v11)
      } else z.seek(v11)
      return true
    }
    z.seek(v10)
    chainBeforeKi(z)
  }

  private def stemNounSuffixes(z: SnowBuf): Boolean = {
    val v1 = z.fe

    z.ket = z.c
    if (mLAr(z)) {
      z.bra = z.c; z.sliceDel()
      val v2 = z.fe
      if (!chainBeforeKi(z)) z.seek(v2)
      return true
    }

    z.seek(v1)
    z.ket = z.c
    if (mNcA(z)) {
      z.bra = z.c; z.sliceDel()
      val v3 = z.fe
      val v4 = z.fe
      z.ket = z.c
      var handled = false
      if (mLArI(z)) { z.bra = z.c; z.sliceDel(); handled = true }
      if (!handled) {
        z.seek(v4)
        z.ket = z.c
        val v5 = z.fe
        if (mPossessives(z) || { z.seek(v5); mSU(z) }) {
          z.bra = z.c; z.sliceDel()
          val v6 = z.fe
          z.ket = z.c
          if (mLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainBeforeKi(z)) z.seek(v6)
          } else z.seek(v6)
          handled = true
        }
      }
      if (!handled) {
        z.seek(v4)
        z.ket = z.c
        if (mLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainBeforeKi(z)) { z.seek(v3) }
        } else z.seek(v3)
      }
      return true
    }

    z.seek(v1)
    z.ket = z.c
    if (alt(z)(mNdA, mNA)) {
      val v8 = z.fe
      if (mLArI(z)) { z.bra = z.c; z.sliceDel(); return true }
      z.seek(v8)
      if (mSU(z)) {
        z.bra = z.c; z.sliceDel()
        val v9 = z.fe
        z.ket = z.c
        if (mLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainBeforeKi(z)) z.seek(v9)
        } else z.seek(v9)
        return true
      }
      z.seek(v8)
      if (chainBeforeKi(z)) return true
    }

    z.seek(v1)
    z.ket = z.c
    if (alt(z)(mNdAn, mNU)) {
      val v11 = z.fe
      if (mSU(z)) {
        z.bra = z.c; z.sliceDel()
        val v12 = z.fe
        z.ket = z.c
        if (mLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainBeforeKi(z)) z.seek(v12)
        } else z.seek(v12)
        return true
      }
      z.seek(v11)
      if (mLArI(z)) { z.bra = z.c; z.sliceDel(); return true }
    }

    z.seek(v1)
    z.ket = z.c
    if (mDAn(z)) {
      z.bra = z.c; z.sliceDel()
      val v13 = z.fe
      z.ket = z.c
      val v14 = z.fe
      if (mPossessives(z)) {
        z.bra = z.c; z.sliceDel()
        val v15 = z.fe
        z.ket = z.c
        if (mLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainBeforeKi(z)) z.seek(v15)
        } else z.seek(v15)
      } else {
        z.seek(v14)
        if (mLAr(z)) {
          z.bra = z.c; z.sliceDel()
          val v16 = z.fe
          if (!chainBeforeKi(z)) z.seek(v16)
        } else {
          z.seek(v14)
          if (!chainBeforeKi(z)) z.seek(v13)
        }
      }
      return true
    }

    z.seek(v1)
    z.ket = z.c
    if (alt(z)(mNUn, mYlA)) {
      z.bra = z.c; z.sliceDel()
      val v18 = z.fe
      var done = false
      val v19 = z.fe
      z.ket = z.c
      if (mLAr(z)) {
        val braSave = z.c
        z.bra = braSave; z.sliceDel()
        if (chainBeforeKi(z)) done = true else z.seek(v19)
      }
      if (!done) {
        z.seek(v19)
        z.ket = z.c
        val v20 = z.fe
        if (mPossessives(z) || { z.seek(v20); mSU(z) }) {
          z.bra = z.c; z.sliceDel()
          val v21 = z.fe
          z.ket = z.c
          if (mLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainBeforeKi(z)) z.seek(v21)
          } else z.seek(v21)
          done = true
        }
      }
      if (!done) {
        z.seek(v19)
        if (!chainBeforeKi(z)) z.seek(v18)
      }
      return true
    }

    z.seek(v1)
    z.ket = z.c
    if (mLArI(z)) { z.bra = z.c; z.sliceDel(); return true }

    z.seek(v1)
    if (chainBeforeKi(z)) return true

    z.seek(v1)
    z.ket = z.c
    if (alt(z)(mDA, mYU, mYA)) {
      z.bra = z.c; z.sliceDel()
      val v23 = z.fe
      z.ket = z.c
      val v24 = z.fe
      var inner = false
      if (mPossessives(z)) {
        z.bra = z.c; z.sliceDel()
        val v25 = z.fe
        z.ket = z.c
        if (!mLAr(z)) z.seek(v25)
        inner = true
      } else {
        z.seek(v24)
        if (mLAr(z)) inner = true
      }
      if (!inner) { z.seek(v23); return true }
      z.bra = z.c; z.sliceDel()
      z.ket = z.c
      if (!chainBeforeKi(z)) z.seek(v23)
      return true
    }

    z.seek(v1)
    z.ket = z.c
    val v26 = z.fe
    if (!(mPossessives(z) || { z.seek(v26); mSU(z) })) return false
    z.bra = z.c; z.sliceDel()
    val v27 = z.fe
    z.ket = z.c
    if (mLAr(z)) {
      z.bra = z.c; z.sliceDel()
      if (!chainBeforeKi(z)) z.seek(v27)
    } else z.seek(v27)
    true
  }

  /** Whole word is exactly "ad" or "soyad" — never post-processed. */
  private def isReserved(s: String): Boolean = s == "ad" || s == "soyad"

  private def appendUToDG(z: SnowBuf): Unit = {
    val s = z.s
    val n = s.length
    if (n == 0) return
    val last = s.charAt(n - 1)
    if (last != 'd' && last != 'g') return
    var i = n - 1
    while (i > 0 && !Vowel(s.charAt(i - 1))) i -= 1
    if (i <= 0) return
    val v = s.charAt(i - 1)
    val app = v match {
      case 'a' | 'ı' => "ı"
      case 'e' | 'i' => "i"
      case 'o' | 'u' => "u"
      case 'ö' | 'ü' => "ü"
      case _ => return
    }
    z.s = s + app
  }

  private def postProcessLastConsonants(z: SnowBuf): Unit = {
    val s = z.s
    if (s.isEmpty) return
    val rep = s.last match {
      case 'b' => "p"
      case 'c' => "ç"
      case 'd' => "t"
      case 'ğ' => "k"
      case _ => return
    }
    z.s = s.substring(0, s.length - 1) + rep
  }

  def stem(term: String): String = {
    if (term.count(Vowel) < 2) return term // one-syllable words pass through
    val z = new SnowBuf(term)
    val v1 = z.fe
    val continueNoun = stemNominalVerbSuffixes(z)
    z.seek(v1)
    if (!continueNoun) return z.s // `stem()` false: buffer kept, no postlude
    val v2 = z.fe
    stemNounSuffixes(z)
    z.seek(v2)
    // postlude
    if (isReserved(z.s)) return z.s
    z.c = z.s.length
    appendUToDG(z)
    z.c = z.s.length
    postProcessLastConsonants(z)
    z.s
  }
}
