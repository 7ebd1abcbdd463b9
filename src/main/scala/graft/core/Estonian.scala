package graft.core

/** Estonian Snowball stemmer + chain (`estonian.sbl`; generated reference
  * at `org/tartarus/snowball/ext/EstonianStemmer.java`; analyzer
  * composition `et/EstonianAnalyzer.java` standard → lowercase → stop(ET)
  * → snowball), pinned to the reference implementation's output over a
  * generated vocabulary in SnowballSpec. */
object EstonianSnowball extends Serializable {
  private val V1 = Set('a', 'e', 'i', 'o', 'u', 'ä', 'õ', 'ö', 'ü')
  private val RV = Set('a', 'e', 'i', 'o', 'u')
  private val KI = Set('b', 'd', 'f', 'g', 'h', 'k', 'p', 's', 't', 'z', 'š', 'ž')
  private val GI = Set('a', 'c', 'e', 'i', 'j', 'l', 'm', 'n', 'o', 'q', 'r',
    'u', 'v', 'w', 'x', 'ä', 'õ', 'ö', 'ü')

  private val Emph = Array(
    ("gi", 1),
    ("ki", 2))

  private val VerbSuf = Array(
    ("nuksime", 1),
    ("nuksite", 1),
    ("nuksid", 1),
    ("nuksin", 1),
    ("ksime", 1),
    ("dakse", 1),
    ("takse", 1),
    ("ksite", 1),
    ("mata", 1),
    ("ksid", 1),
    ("sime", 1),
    ("akse", 2),
    ("site", 1),
    ("ksin", 1),
    ("daks", 1),
    ("taks", 1),
    ("sin", 1),
    ("da", 3),
    ("me", 3),
    ("b", 3),
    ("n", 3))

  private val LongV = Array(
    ("aa", -1),
    ("ee", -1),
    ("ii", -1),
    ("oo", -1),
    ("uu", -1),
    ("ää", -1),
    ("õõ", -1),
    ("öö", -1),
    ("üü", -1))

  private val IPlural = Array(
    ("i", 1))

  private val SpecialNoun = Array(
    ("lasse", 1),
    ("lisse", 3),
    ("misse", 2),
    ("lane", 1),
    ("line", 3),
    ("mine", 2),
    ("lasi", 1),
    ("lisi", 3),
    ("misi", 2),
    ("last", 1),
    ("list", 3),
    ("mist", 2))

  private val CaseEnd = Array(
    ("sse", 1),
    ("ga", 1),
    ("ta", 1),
    ("le", 1),
    ("ks", 1),
    ("lt", 1),
    ("st", 1),
    ("l", 1),
    ("s", 1),
    ("t", 2))

  private val Plur3Inner = Array(
    ("las", 1),
    ("lis", 1),
    ("mis", 1),
    ("t", -1),
    ("", 2))

  private val Plur3 = Array(
    ("ikkude", 1),
    ("ikke", 1),
    ("sid", 2),
    ("ike", 1),
    ("de", 4),
    ("te", 3),
    ("d", 4))

  private val Nu = Array(
    ("va", -1),
    ("du", -1),
    ("nu", -1),
    ("tu", -1))

  private val KptDouble = Array(
    ("kk", 1),
    ("pp", 2),
    ("tt", 3))

  private val Degrees = Array(
    ("mai", 1),
    ("ma", 2),
    ("m", 1))

  private val VerbExceptions = Array(
    ("joodakse", 1),
    ("jäädakse", 12),
    ("jääksime", 12),
    ("jääksite", 12),
    ("keedakse", 4),
    ("keeksime", 4),
    ("keeksite", 4),
    ("käiksime", 8),
    ("käiksite", 8),
    ("laoksime", 16),
    ("laoksite", 16),
    ("loeksime", 14),
    ("loeksite", 14),
    ("looksime", 7),
    ("looksite", 7),
    ("löödakse", 5),
    ("lööksime", 5),
    ("lööksite", 5),
    ("müüksime", 13),
    ("müüksite", 13),
    ("näeksime", 18),
    ("näeksite", 18),
    ("nägemata", 18),
    ("põeksime", 15),
    ("põeksite", 15),
    ("saadakse", 2),
    ("saaksime", 2),
    ("saaksite", 2),
    ("söödakse", 9),
    ("sööksime", 9),
    ("sööksite", 9),
    ("teeksime", 17),
    ("teeksite", 17),
    ("tegemata", 17),
    ("tooksime", 10),
    ("tooksite", 10),
    ("viiksime", 3),
    ("viiksite", 3),
    ("võidakse", 11),
    ("võiksime", 11),
    ("võiksite", 11),
    ("joomata", 1),
    ("juuakse", 1),
    ("jääksid", 12),
    ("jääksin", 12),
    ("jäämata", 12),
    ("keeksid", 4),
    ("keeksin", 4),
    ("keemata", 4),
    ("käiakse", 8),
    ("käiksid", 8),
    ("käiksin", 8),
    ("käimata", 8),
    ("laoksid", 16),
    ("laoksin", 16),
    ("loeksid", 14),
    ("loeksin", 14),
    ("looksid", 7),
    ("looksin", 7),
    ("loomata", 7),
    ("luuakse", 7),
    ("lööksid", 5),
    ("lööksin", 5),
    ("löömata", 5),
    ("lüüakse", 5),
    ("müüakse", 13),
    ("müüksid", 13),
    ("müüksin", 13),
    ("müümata", 13),
    ("näeksid", 18),
    ("näeksin", 18),
    ("nähakse", 18),
    ("põeksid", 15),
    ("põeksin", 15),
    ("saaksid", 2),
    ("saaksin", 2),
    ("saamata", 2),
    ("sööksid", 9),
    ("sööksin", 9),
    ("söömata", 9),
    ("süüakse", 9),
    ("teeksid", 17),
    ("teeksin", 17),
    ("tehakse", 17),
    ("tooksid", 10),
    ("tooksin", 10),
    ("toomata", 10),
    ("tuuakse", 10),
    ("viiakse", 3),
    ("viiksid", 3),
    ("viiksin", 3),
    ("viimata", 3),
    ("viisime", 3),
    ("viisite", 3),
    ("võiksid", 11),
    ("võiksin", 11),
    ("võimata", 11),
    ("joovad", 1),
    ("jäävad", 12),
    ("keevad", 4),
    ("käivad", 8),
    ("laovad", 16),
    ("loevad", 14),
    ("loovad", 7),
    ("löövad", 5),
    ("müüvad", 13),
    ("näevad", 18),
    ("nägema", 18),
    ("põevad", 15),
    ("saavad", 2),
    ("söövad", 9),
    ("teevad", 17),
    ("tegema", 17),
    ("toovad", 10),
    ("viisin", 3),
    ("viivad", 3),
    ("võivad", 11),
    ("jooma", 1),
    ("joome", 1),
    ("joote", 1),
    ("jäime", 12),
    ("jäite", 12),
    ("jääda", 12),
    ("jäädi", 12),
    ("jääks", 12),
    ("jääma", 12),
    ("jääme", 12),
    ("jääte", 12),
    ("jõime", 1),
    ("jõite", 1),
    ("keeks", 4),
    ("keema", 4),
    ("keeme", 4),
    ("keeta", 4),
    ("keete", 4),
    ("käidi", 8),
    ("käiks", 8),
    ("käima", 8),
    ("käime", 8),
    ("käite", 8),
    ("laoks", 16),
    ("laome", 16),
    ("laote", 16),
    ("loeks", 14),
    ("loeme", 14),
    ("loete", 14),
    ("loodi", 7),
    ("looks", 7),
    ("looma", 7),
    ("loome", 7),
    ("loote", 7),
    ("lõime", 6),
    ("lõite", 6),
    ("löödi", 5),
    ("lööks", 5),
    ("lööma", 5),
    ("lööme", 5),
    ("lööte", 5),
    ("müüdi", 13),
    ("müüks", 13),
    ("müüma", 13),
    ("müüme", 13),
    ("müüte", 13),
    ("näeks", 18),
    ("näeme", 18),
    ("näete", 18),
    ("nähti", 18),
    ("põeks", 15),
    ("põeme", 15),
    ("põete", 15),
    ("saada", 2),
    ("saadi", 2),
    ("saaks", 2),
    ("saama", 2),
    ("saame", 2),
    ("saate", 2),
    ("saime", 2),
    ("saite", 2),
    ("sõime", 9),
    ("sõite", 9),
    ("söödi", 9),
    ("sööks", 9),
    ("sööma", 9),
    ("sööme", 9),
    ("sööte", 9),
    ("teeks", 17),
    ("teeme", 17),
    ("teete", 17),
    ("tehti", 17),
    ("toodi", 10),
    ("tooks", 10),
    ("tooma", 10),
    ("toome", 10),
    ("toote", 10),
    ("tõime", 10),
    ("tõite", 10),
    ("viidi", 3),
    ("viiks", 3),
    ("viima", 3),
    ("viime", 3),
    ("viite", 3),
    ("võida", 11),
    ("võidi", 11),
    ("võiks", 11),
    ("võima", 11),
    ("võime", 11),
    ("võite", 11),
    ("joob", 1),
    ("jood", 1),
    ("joon", 1),
    ("juua", 1),
    ("jäid", 12),
    ("jäin", 12),
    ("jääb", 12),
    ("jääd", 12),
    ("jään", 12),
    ("jõid", 1),
    ("jõin", 1),
    ("keeb", 4),
    ("keed", 4),
    ("keen", 4),
    ("kees", 4),
    ("käia", 8),
    ("käib", 8),
    ("käid", 8),
    ("käin", 8),
    ("käis", 8),
    ("laob", 16),
    ("laod", 16),
    ("laon", 16),
    ("loeb", 14),
    ("loed", 14),
    ("loen", 14),
    ("loob", 7),
    ("lood", 7),
    ("loon", 7),
    ("luua", 7),
    ("lõid", 6),
    ("lõin", 6),
    ("lööb", 5),
    ("lööd", 5),
    ("löön", 5),
    ("lüüa", 5),
    ("müüa", 13),
    ("müüb", 13),
    ("müüd", 13),
    ("müün", 13),
    ("müüs", 13),
    ("näeb", 18),
    ("näed", 18),
    ("näen", 18),
    ("näha", 18),
    ("põeb", 15),
    ("põed", 15),
    ("põen", 15),
    ("saab", 2),
    ("saad", 2),
    ("saan", 2),
    ("said", 2),
    ("sain", 2),
    ("sõid", 9),
    ("sõin", 9),
    ("sööb", 9),
    ("sööd", 9),
    ("söön", 9),
    ("süüa", 9),
    ("teeb", 17),
    ("teed", 17),
    ("teen", 17),
    ("teha", 17),
    ("toob", 10),
    ("tood", 10),
    ("toon", 10),
    ("tuua", 10),
    ("tõid", 10),
    ("tõin", 10),
    ("viia", 3),
    ("viib", 3),
    ("viid", 3),
    ("viin", 3),
    ("võib", 11),
    ("võid", 11),
    ("võin", 11),
    ("võis", 11),
    ("jäi", 12),
    ("jõi", 1),
    ("lõi", 6),
    ("sai", 2),
    ("sõi", 9),
    ("tõi", 10))


  private def r1Of(s: String): Int = {
    val n = s.length
    var i = 0
    while (i < n && !V1(s.charAt(i))) i += 1
    if (i >= n) return n
    var j = i
    while (j < n && V1(s.charAt(j))) j += 1
    if (j >= n) n else j + 1
  }

  /** The two chars ending at `end` form a long vowel (`LONGV`). */
  private def longV(s: String, end: Int): Boolean =
    LongV.exists { case (t, _) => end >= t.length && s.startsWith(t, end - t.length) }

  def stem(term: String): String = {
    // whole-word verb exceptions replace the word outright and stop
    VerbExceptions.find { case (t, _) => term == t } match {
      case Some((_, c)) =>
        val reps = Vector("joo", "saa", "viima", "keesi", "löö", "lõi", "loo",
          "käisi", "söö", "too", "võisi", "jääma", "müüsi", "luge", "põde",
          "ladu", "tegi", "nägi")
        return reps(c - 1)
      case None =>
    }
    var s = term
    val p1 = r1Of(s)
    // suffix (start index) fitting in [p1, len)
    def fit(table: Array[(String, Int)]): Option[(String, Int, Int)] =
      table.find { case (t, _) => s.endsWith(t) && s.length - t.length >= p1 }
        .map { case (t, c) => (t, c, s.length - t.length) }

    // emphasis markers (-gi/-ki family), needing ≥ 4 chars before
    fit(Emph).foreach { case (t, c, start) =>
      if (start >= 4) c match {
        case 1 =>
          if (start >= 1 && GI(s.charAt(start - 1)) && !longV(s, start))
            s = s.substring(0, start)
        case _ =>
          if (start >= 1 && KI(s.charAt(start - 1)))
            s = s.substring(0, start)
      }
    }
    // verb suffixes, else the substantive cascade
    val verbApplied = fit(VerbSuf) match {
      case Some((t, c, start)) =>
        c match {
          case 1 => s = s.substring(0, start); true
          case 2 => s = s.substring(0, start) + "a"; true
          case _ =>
            if (start >= 1 && V1(s.charAt(start - 1))) { s = s.substring(0, start); true }
            else false
        }
      case None => false
    }
    if (!verbApplied) {
      // special noun endings
      fit(SpecialNoun).foreach { case (t, c, start) =>
        s = s.substring(0, start) + (c match {
          case 1 => "lase"
          case 2 => "mise"
          case _ => "lise"
        })
      }
      // case endings: preceded by an RV vowel or a long vowel (case 1), or
      // with ≥ 4 chars of stem (case 2)
      fit(CaseEnd).foreach { case (t, c, start) =>
        c match {
          case 1 =>
            if ((start >= 1 && RV(s.charAt(start - 1))) || longV(s, start))
              s = s.substring(0, start)
          case _ =>
            if (start >= 4) s = s.substring(0, start)
        }
      }
      // plural & the three first cases
      fit(Plur3).foreach { case (t, c, start) =>
        c match {
          case 1 => s = s.substring(0, start) + "iku"
          case 2 => if (!longV(s, start)) s = s.substring(0, start)
          case 3 =>
            if (start >= 4) {
              Plur3Inner.find { case (t2, _) =>
                start >= t2.length && s.startsWith(t2, start - t2.length)
              } match {
                case Some((_, 1)) => s = s.substring(0, start) + "e"
                case Some((_, 2)) => s = s.substring(0, start)
                case _ => // -1 blocker entry or no match: no slice
              }
            } else s = s.substring(0, start) + "t"
          case _ =>
            if ((start >= 1 && RV(s.charAt(start - 1))) || longV(s, start))
              s = s.substring(0, start)
        }
      }
      // comparative/superlative degrees
      fit(Degrees).foreach { case (t, c, start) =>
        c match {
          case 1 => if (start >= 1 && RV(s.charAt(start - 1))) s = s.substring(0, start)
          case _ => s = s.substring(0, start)
        }
      }
      // i-plural: preceded by an RV vowel
      fit(IPlural).foreach { case (t, _, start) =>
        if (start >= 1 && RV(s.charAt(start - 1))) s = s.substring(0, start)
      }
      // -nu participles
      fit(Nu).foreach { case (t, _, start) => s = s.substring(0, start) }
    }
    // undouble kk/pp/tt before a final vowel
    if (s.nonEmpty && V1(s.last) && s.length - 1 >= p1) {
      val end = s.length - 1
      KptDouble.find { case (t, _) => end >= t.length && s.startsWith(t, end - t.length) }
        .foreach { case (t, _) =>
          s = s.substring(0, end - 1) + s.substring(end)
        }
    }
    s
  }
}

/** Estonian analysis chain: standard → lowercase → stop(ET) → snowball. */
final case class EstonianAnalyzer(stopWords: Set[String] = Analyzers.EstonianStopWords)
    extends Analyzer {
  override val name = "estonian"
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
        val stemmed = EstonianSnowball.stem(lower)
        sink.accept(stemmed, 0, stemmed.length, pos)
      }
      pos += 1
    }
  }
}
