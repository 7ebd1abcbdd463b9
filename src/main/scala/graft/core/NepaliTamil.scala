package graft.core

/** Nepali and Tamil analysis chains — re-expressions of the published
  * Snowball algorithms (snowballstem.org `nepali.sbl` / `tamil.sbl`,
  * BSD-licensed; the reference ships generated Java at
  * `org/tartarus/snowball/ext/NepaliStemmer.java` / `TamilStemmer.java`,
  * composed by `ne/NepaliAnalyzer.java:122` / `ta/TamilAnalyzer.java:122`:
  * standard → lowercase → decimal digits → Indic normalize → stop →
  * snowball). Suffix tables are the published `.sbl` data (the identity IS
  * the correctness requirement); the control flow is re-expressed as direct
  * string passes. Parity with the reference output over generated
  * vocabularies (~10k words each) is pinned in NepaliTamilSpec.
  */

/** Nepali Snowball stemmer (`nepali.sbl`): one pass of category-1 case
  * suffixes (the क-series deletes only when NOT preceded by ए/े), then a
  * loop of {conditional ँ/ं/ै drop, category-3 verb-suffix strip} until no
  * category-3 suffix matches. */
object NepaliSnowball extends Serializable {
  /** a_0: (suffix, action); action 2 = delete unless preceded by ए or े.
    * Longest match wins and suppresses shorter ones (find_among_b). */
  private val cat1: Array[(String, Int)] = Seq(
    "लाइ" -> 1, "लाई" -> 1, "सँग" -> 1, "संग" -> 1, "मार्फत" -> 1, "रत" -> 1,
    "का" -> 2, "मा" -> 1, "द्वारा" -> 1, "कि" -> 2, "पछि" -> 1, "की" -> 2,
    "ले" -> 1, "कै" -> 2, "सँगै" -> 1, "मै" -> 1, "को" -> 2
  ).sortBy(-_._1.length).toArray

  /** a_3: category-3 verb/aspect suffixes, longest-first. */
  private val cat3: Array[String] = SnowballUtil.byLenDesc(Seq(
    "थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ", "िन्छ",
    "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा", "इदा", "िदा",
    "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी", "देखी", "थी", "दी",
    "छु", "एछु", "ेछु", "नेछु", "नु", "हरु", "हरू", "छे", "थे", "ने",
    "एकै", "ेकै", "नेकै", "दै", "इदै", "िदै", "एको", "इएको", "िएको",
    "ेको", "नेको", "दो", "इदो", "िदो", "यो", "इयो", "भयो", "ियो",
    "थियो", "दियो", "थ्यो", "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ",
    "यौ", "थियौ", "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्",
    "ेछन्", "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्",
    "छस्", "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्",
    "छेस्", "होस्"))

  private def removeCat1(s: String): String = {
    var i = 0
    while (i < cat1.length) {
      val (suf, act) = cat1(i)
      if (s.endsWith(suf)) {
        val stem = s.substring(0, s.length - suf.length)
        if (act == 1) return stem
        // act 2: recognized but kept when preceded by ए or े
        if (stem.endsWith("ए") || stem.endsWith("े")) return s
        return stem
      }
      i += 1
    }
    s
  }

  def stem(w: String): String = {
    var s = removeCat1(w)
    var go = true
    while (go) {
      // category 2: ँ/ं drop after यौ/छौ/नौ/थे; ै drop after त्र
      if (s.nonEmpty) {
        val last = s.charAt(s.length - 1)
        if (last == 'ँ' || last == 'ं') {
          val pre = s.substring(0, s.length - 1)
          if (pre.endsWith("यौ") || pre.endsWith("छौ") ||
              pre.endsWith("नौ") || pre.endsWith("थे")) s = pre
        } else if (last == 'ै') {
          val pre = s.substring(0, s.length - 1)
          if (pre.endsWith("त्र")) s = pre
        }
      }
      // category 3: strip the longest verb suffix; stop when none matches
      var i = 0
      var hit = -1
      while (hit < 0 && i < cat3.length) {
        if (s.endsWith(cat3(i))) hit = i
        i += 1
      }
      if (hit >= 0) s = s.substring(0, s.length - cat3(hit).length)
      else go = false
    }
    s
  }
}

/** Tamil Snowball stemmer (`tamil.sbl`; reference generated Java at
  * `org/tartarus/snowball/ext/TamilStemmer.java:977`). Every routine is
  * anchored at the string start (prefix rules) or end (suffix rules) with
  * `limit_backward = 0`, so the whole algorithm is re-expressed as direct
  * immutable-String passes — no cursor machinery. `SnowballFilter` ignores
  * the `stem()` return value and always takes the buffer
  * (`snowball/SnowballFilter.java:98`), so the min-length bail-out keeps any
  * initial fix_ending slice: we mirror that exactly. */
object TamilSnowball extends Serializable {
  // Condition character classes (Among tables with action -1).
  private val a1  = "கஙசஞதநபமயவ".toSet        // question/pronoun-prefix consonants
  private val a2  = "ிீை".toSet                 // for ய் deletion
  private val vowelSigns = "ாிீுூெேை".toSet     // a_3/a_16/a_18/a_19/a_24
  private val hardCons   = "கசடதபற".toSet       // a_6/a_7/a_12/a_21/a_22
  private val a8  = "ஞணநனமயரலளழவ".toSet        // nasals/liquids
  private val a9  = vowelSigns + '்'
  private val a10 = "அஇஉ".toSet                 // pronoun-prefix vowels
  private val a14 = "ாேோ".toSet                 // question suffix vowels
  private val a23 = "அஆஇஈஉஊஎஏஐஒஓஔ".toSet      // independent vowels

  /** Longest-suffix match over an action table (`find_among_b`): the longest
    * entry wins and suppresses shorter ones even when its action's condition
    * later fails. Returns (suffix, action) or null. */
  private def amongB(s: String, tab: Array[(String, Int)]): (String, Int) = {
    var i = 0
    while (i < tab.length) {
      if (s.endsWith(tab(i)._1)) return tab(i)
      i += 1
    }
    null
  }
  private def tbl(entries: (String, Int)*): Array[(String, Int)] =
    entries.sortBy(-_._1.length).toArray

  /** a_0 (`r_fix_va_start`): word-initial வ+rounded-vowel → plain vowel. */
  private def fixVaStart(s: String): String =
    if (s.startsWith("வோ")) "ஓ" + s.substring(2)
    else if (s.startsWith("வொ")) "ஒ" + s.substring(2)
    else if (s.startsWith("வூ")) "ஊ" + s.substring(2)
    else if (s.startsWith("வு")) "உ" + s.substring(2)
    else s

  /** `r_remove_question_prefixes`: strip எC் then re-fix வ-start. */
  private def removeQuestionPrefixes(s: String): String =
    if (s.length > 3 && s.charAt(0) == 'எ' && a1(s.charAt(1)) && s.charAt(2) == '்')
      fixVaStart(s.substring(3))
    else s

  /** `r_remove_pronoun_prefixes`: strip {அ,இ,உ}C் then re-fix வ-start. */
  private def removePronounPrefixes(s: String): String =
    if (s.length > 3 && a10(s.charAt(0)) && a1(s.charAt(1)) && s.charAt(2) == '்')
      fixVaStart(s.substring(3))
    else s

  private val a5 = tbl(
    "ந்த" -> 1, "ய" -> 1, "வ" -> 1, "னு" -> 8, "ுக்" -> 7, "ுக்க்" -> 7,
    "ட்க்" -> 3, "ற்க்" -> 4, "ங்" -> 9, "ட்ட்" -> 5, "த்த்" -> 6,
    "ந்த்" -> 1, "ந்" -> 1, "ட்ப்" -> 3, "ய்" -> 2, "ன்ற்" -> 4, "வ்" -> 1)

  /** `r_fix_ending` — one ending repair; None when nothing applied. */
  private def fixEnding(s: String, foundVetrumai: Boolean): Option[String] = {
    if (s.length <= 3) return None
    val m = amongB(s, a5)
    val viaA5: Option[String] =
      if (m == null) None
      else {
        val p = s.substring(0, s.length - m._1.length)
        m._2 match {
          case 1 => Some(p)
          case 2 => if (p.nonEmpty && a2(p.last)) Some(p) else None
          case 3 => Some(p + "ள்")
          case 4 => Some(p + "ல்")
          case 5 => Some(p + "டு")
          case 6 => if (foundVetrumai && !p.endsWith("ை")) Some(p + "ம்") else None
          case 7 => Some(p + "்")
          case 8 => if (p.nonEmpty && vowelSigns(p.last)) None else Some(p)
          case 9 => // a_4: delete ங் after ை/், else ங் → ம்
            if (p.endsWith("ை") || p.endsWith("்")) Some(p) else Some(p + "ம்")
        }
      }
    viaA5.orElse {
      if (!s.endsWith("்")) None
      else {
        val t = s.substring(0, s.length - 1)
        if (t.nonEmpty && hardCons(t.last)) {
          // C், optionally preceded by another C் — strip 2 or 4 chars
          val u = t.substring(0, t.length - 1)
          if (u.endsWith("்") && u.length >= 2 && hardCons(u.charAt(u.length - 2)))
            Some(s.substring(0, s.length - 4))
          else Some(s.substring(0, s.length - 2))
        } else if (t.nonEmpty && a8(t.last) &&
                   t.length >= 2 && t.charAt(t.length - 2) == '்') {
          Some(s.substring(0, s.length - 2)) // delete nasal/liquid + final ்
        } else if (t.nonEmpty && a9(t.last)) {
          Some(t) // bare trailing ் after a vowel sign
        } else None
      }
    }
  }

  private def fixEndings(s: String, foundVetrumai: Boolean): String = {
    var cur = s
    var go = true
    while (go) fixEnding(cur, foundVetrumai) match {
      case Some(n) => cur = n
      case None    => go = false
    }
    cur
  }

  /** `r_remove_question_suffixes`: {ா,ே,ோ} → ், then fix endings. */
  private def removeQuestionSuffixes(s: String, fv: Boolean): String = {
    if (s.length <= 4) return s
    val base = if (a14(s.last)) s.substring(0, s.length - 1) + "்" else s
    fixEndings(base, fv)
  }

  /** `r_remove_command_suffixes`: strip பி / வி. */
  private def removeCommandSuffixes(s: String): String =
    if (s.length > 4 && (s.endsWith("பி") || s.endsWith("வி")))
      s.substring(0, s.length - 2)
    else s

  /** `r_remove_um`: ும் → ், then ONE fix_ending pass. */
  private def removeUm(s: String, fv: Boolean): String =
    if (s.length > 4 && s.endsWith("ும்")) {
      val base = s.substring(0, s.length - 3) + "்"
      fixEnding(base, fv).getOrElse(base)
    } else s

  private val a17 = tbl(
    "பட்ட" -> 3, "பட்டண" -> 3, "தான" -> 3, "படிதான" -> 3, "ென" -> 1,
    "ாகிய" -> 1, "குரிய" -> 3, "ுடைய" -> 1, "ல்ல" -> 2, "ுள்ள" -> 1,
    "ாகி" -> 1, "படி" -> 3, "ின்றி" -> 1, "பற்றி" -> 3, "படு" -> 3,
    "விடு" -> 3, "பட்டு" -> 3, "விட்டு" -> 3, "பட்டது" -> 3, "ென்று" -> 1,
    "ுடை" -> 1, "ில்லை" -> 1, "ுடன்" -> 1, "ிடம்" -> 1, "ெல்லாம்" -> 3,
    "ெனும்" -> 1)

  /** `r_remove_common_word_endings`; the ல்ல guard failing aborts the whole
    * routine (no fix_endings), matching the generated `return false`. */
  private def removeCommonWordEndings(s: String, fv: Boolean): String = {
    if (s.length <= 4) return s
    val m = amongB(s, a17)
    if (m == null) return s
    val p = s.substring(0, s.length - m._1.length)
    val replaced = m._2 match {
      case 1 => p + "்"
      case 2 => if (p.nonEmpty && vowelSigns(p.last)) return s else p + "்"
      case 3 => p
    }
    fixEndings(replaced, fv)
  }

  private val a20 = tbl(
    "விட" -> 2, "ீ" -> 7, "ொடு" -> 2, "ோடு" -> 2, "து" -> 6,
    "ிருந்து" -> 2, "ின்று" -> 2, "ுடை" -> 2, "னை" -> 1, "கண்" -> 1,
    "ின்" -> 3, "முன்" -> 1, "ிடம்" -> 4, "ிற்" -> 2, "மேற்" -> 1,
    "ல்" -> 5, "ாமல்" -> 2, "ால்" -> 2, "ில்" -> 2, "மேல்" -> 1,
    "ுள்" -> 2, "கீழ்" -> 1)

  /** `r_remove_vetrumai_urupukal` (case endings). Returns the new string and
    * whether a vetrumai urupu was found (gates fix_ending's த்த் → ம்). */
  private def removeVetrumaiUrupukal(s: String): (String, Boolean) = {
    if (s.length <= 4) return (s, false)
    val m = amongB(s, a20)
    val viaA20: Option[String] =
      if (m == null) None
      else {
        val p = s.substring(0, s.length - m._1.length)
        m._2 match {
          case 1 => Some(p)
          case 2 => Some(p + "்")
          case 3 => if (p.endsWith("ம")) None else Some(p + "்")
          case 4 => if (s.length < 7) None else Some(p + "்")
          case 5 => if (p.nonEmpty && vowelSigns(p.last)) None else Some(p + "்")
          case 6 => if (p.nonEmpty && vowelSigns(p.last)) None else Some(p)
          case 7 => Some(p + "ி")
        }
      }
    val afterCase: Option[String] = viaA20.orElse {
      if (!s.endsWith("ை")) None
      else {
        val t = s.substring(0, s.length - 1)
        val ok = t.isEmpty || !hardCons(t.last) ||
          (t.length >= 2 && hardCons(t.last) && t.charAt(t.length - 2) == '்')
        if (ok) Some(t + "்") else None
      }
    }
    afterCase match {
      case None => (s, false)
      case Some(r0) =>
        val r1 = if (r0.endsWith("ின்")) r0.substring(0, r0.length - 3) + "்" else r0
        (fixEndings(r1, foundVetrumai = true), true)
    }
  }

  private val a13 = tbl("கள்" -> 4, "ுங்கள்" -> 1, "ட்கள்" -> 3, "ற்கள்" -> 2)

  /** `r_remove_plural_suffix` — NO min-length guard in the reference. */
  private def removePluralSuffix(s: String): String = {
    val m = amongB(s, a13)
    if (m == null) return s
    val p = s.substring(0, s.length - m._1.length)
    m._2 match {
      case 1 => if (p.nonEmpty && hardCons(p.last)) p + "ுங்" else p + "்"
      case 2 => p + "ல்"
      case 3 => p + "ள்"
      case 4 => p
    }
  }

  private val a25 = tbl(
    "க" -> 1, "த" -> 1, "ன" -> 1, "ப" -> 1, "ய" -> 1, "ா" -> 5, "கு" -> 6,
    "படு" -> 1, "து" -> 3, "ிற்று" -> 1, "னை" -> 1, "வை" -> 1, "னன்" -> 1,
    "பன்" -> 1, "வன்" -> 2, "ான்" -> 4, "னான்" -> 1, "மின்" -> 1,
    "னென்" -> 1, "ேன்" -> 5, "னம்" -> 1, "பம்" -> 1, "ாம்" -> 5,
    "கும்" -> 1, "டும்" -> 5, "தும்" -> 1, "றும்" -> 1, "ெம்" -> 5,
    "ேம்" -> 5, "ோம்" -> 5, "ாய்" -> 5, "னர்" -> 1, "பர்" -> 1,
    "ீயர்" -> 5, "வர்" -> 1, "ார்" -> 5, "னார்" -> 1, "மார்" -> 1,
    "கொண்டிர்" -> 1, "னிர்" -> 5, "ீர்" -> 5, "னள்" -> 1, "பள்" -> 1,
    "வள்" -> 1, "ாள்" -> 5, "னாள்" -> 1)

  private val a26 = tbl(
    "கிற" -> 1, "கின்ற" -> 1, "ாநின்ற" -> 1,
    "கிற்" -> 1, "கின்ற்" -> 1, "ாநின்ற்" -> 1)

  /** One `r_remove_tense_suffix` pass: personal/tense among then the
    * present-continuous among, each on the current end, then fix endings.
    * Returns (result, fired). */
  private def removeTenseSuffix(s: String, fv: Boolean): (String, Boolean) = {
    if (s.length <= 4) return (s, false)
    var fired = false
    var cur = s
    val m = amongB(cur, a25)
    if (m != null) {
      val p = cur.substring(0, cur.length - m._1.length)
      val r: Option[String] = m._2 match {
        case 1 => Some(p)
        case 2 => if (p.nonEmpty && a23(p.last)) None else Some(p)
        case 3 => if (p.nonEmpty && vowelSigns(p.last)) None else Some(p)
        case 4 => if (p.endsWith("ச")) None else Some(p + "்")
        case 5 => Some(p + "்")
        case 6 => if (p.endsWith("்")) Some(p) else None
      }
      r.foreach { n => cur = n; fired = true }
    }
    val m2 = amongB(cur, a26)
    if (m2 != null) {
      cur = cur.substring(0, cur.length - m2._1.length)
      fired = true
    }
    (fixEndings(cur, fv), fired)
  }

  private def removeTenseSuffixes(s: String, fv: Boolean): String = {
    var cur = s
    var go = true
    while (go) {
      val (n, fired) = removeTenseSuffix(cur, fv)
      cur = n
      go = fired
    }
    cur
  }

  def stem(w: String): String = {
    var s = fixEnding(w, foundVetrumai = false).getOrElse(w)
    if (s.length <= 4) return s // min-length bail keeps the fix_ending slice
    s = removeQuestionPrefixes(s)
    s = removePronounPrefixes(s)
    s = removeQuestionSuffixes(s, fv = false)
    s = removeUm(s, fv = false)
    s = removeCommonWordEndings(s, fv = false)
    val (afterVetrumai, fv) = removeVetrumaiUrupukal(s)
    s = afterVetrumai
    s = removePluralSuffix(s)
    s = removeCommandSuffixes(s)
    s = removeTenseSuffixes(s, fv)
    s
  }
}

/** Tamil analysis chain (`ta/TamilAnalyzer.java:118`): standard → lowercase
  * → decimal digits → Indic normalize → stop → snowball stem (stop runs on
  * the NORMALIZED form, before stemming). */
final case class TamilAnalyzer(stopWords: Set[String] = Analyzers.TamilStopWords)
    extends Analyzer {
  override val name = "tamil"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val normalized = IndicChains.normalizeOnly(raw)
      if (!stopWords.contains(normalized)) {
        val stemmed = TamilSnowball.stem(normalized)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}

/** Nepali analysis chain (`ne/NepaliAnalyzer.java:122`): standard →
  * lowercase → decimal digits → Indic normalize → stop → snowball stem.
  * The stop filter runs on the NORMALIZED form, before stemming. */
final case class NepaliAnalyzer(stopWords: Set[String] = Analyzers.NepaliStopWords)
    extends Analyzer {
  override val name = "nepali"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val normalized = IndicChains.normalizeOnly(raw)
      if (!stopWords.contains(normalized)) {
        val stemmed = NepaliSnowball.stem(normalized)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
