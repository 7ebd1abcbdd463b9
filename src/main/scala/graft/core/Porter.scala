package graft.core

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980) — re-implemented from the published
  * algorithm with the two standard improvements the reference also applies
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java`:
  * step2 `bli→ble`, `logi→log`). Output parity with the reference is the
  * point (stemmed query terms must hit stemmed index terms), so rule order
  * and the m()/cvc()/doublec() conditions follow the paper exactly; the
  * fixture spec checks the paper's own example vocabulary.
  *
  * Words of length ≤ 2 are returned unchanged, as in the reference.
  */
object PorterStemmer extends Serializable {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    new Impl(word.toCharArray).run()
  }

  private final class Impl(b: Array[Char]) {
    private var k: Int = b.length - 1 // last valid index
    private var j: Int = 0            // end of stem candidate after ends()

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** number of VC sequences in [C](VC)^m[V] over b[0..j] */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, last consonant not w/x/y */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) false
      else b(i) != 'w' && b(i) != 'x' && b(i) != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** plurals and -ed/-ing */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) {
        if (m() > 0) k -= 1
      } else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          val ch = b(k); k -= 1
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** terminal y → i when the stem has a vowel */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** double suffices → single (requires m > 0 before the suffix) */
    private def step3(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log")
        case _ =>
      }
    }

    /** -ic-, -full, -ness etc. */
    private def step4(): Unit = {
      b(k) match {
        case 'e' =>
          if (ends("icate")) r("ic")
          else if (ends("ative")) r("")
          else if (ends("alize")) r("al")
        case 'i' =>
          if (ends("iciti")) r("ic")
        case 'l' =>
          if (ends("ical")) r("ic")
          else if (ends("ful")) r("")
        case 's' =>
          if (ends("ness")) r("")
        case _ =>
      }
    }

    /** -ant, -ence etc. in context <c>vcvc<v> */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** final -e removal and -ll → -l */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): String = {
      step1(); step2(); step3(); step4(); step5(); step6()
      new String(b, 0, k + 1)
    }
  }
}
