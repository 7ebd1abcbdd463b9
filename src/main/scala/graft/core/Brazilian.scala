package graft.core

/** Brazilian Portuguese stemmer — a re-expression of the reference's
  * hand-written cascade (`br/BrazilianStemmer.java:41`). The regions R1/R2/RV
  * are computed ONCE from the folded term and FROZEN: later steps test
  * suffixes against the original region strings while removing from the
  * current (shrinking) term — removals are conditional on the current term
  * actually ending with the suffix. Two reference quirks are preserved
  * because stemmed queries must hit stemmed index terms:
  * `logias` fires without modifying the term (`BrazilianStemmer.java:401`
  * discards the replaceSuffix result), and the `ira` verb rule removes
  * `ava` (`BrazilianStemmer.java:959`) — a conditional no-op. Parity with
  * the reference over ~10.3k generated vectors is pinned in
  * GalicianBrazilianSpec. */
object BrazilianStem extends Serializable {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** Lowercase + accent/cedilla fold (`changeTerm`). */
  private def changeTerm(value: String): String = {
    val v = value.toLowerCase(java.util.Locale.forLanguageTag("pt-BR"))
    val b = new StringBuilder(v.length)
    var j = 0
    while (j < v.length) {
      b.append(v.charAt(j) match {
        case 'á' | 'â' | 'ã' => 'a'
        case 'é' | 'ê'       => 'e'
        case 'í'             => 'i'
        case 'ó' | 'ô' | 'õ' => 'o'
        case 'ú' | 'ü'       => 'u'
        case 'ç'             => 'c'
        case 'ñ'             => 'n'
        case c               => c
      })
      j += 1
    }
    b.toString
  }

  /** `createCT`: fold, then strip one leading and one trailing punctuation. */
  private def createCT(term: String): String = {
    var ct = changeTerm(term)
    if (ct.length < 2) return ct
    if ("\"'-,;.?!".indexOf(ct.charAt(0)) >= 0) ct = ct.substring(1)
    if (ct.length < 2) return ct
    if ("-,;.?!'\"".indexOf(ct.charAt(ct.length - 1)) >= 0)
      ct = ct.substring(0, ct.length - 1)
    ct
  }

  /** `getR1` with the reference's exact loop bounds: the scan never inspects
    * the LAST character, so a region starting there comes back null. */
  private def getR1(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    var j = 0
    while (j < i && !isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    while (j < i && isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    value.substring(j + 1)
  }

  /** `getRV` with the same last-character exclusion quirk. */
  private def getRV(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    if (i > 0 && !isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && !isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 1 && isVowel(value.charAt(0)) && isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 2) value.substring(3) else null
  }

  private def suffix(value: String, suf: String): Boolean =
    value != null && suf != null && value.endsWith(suf)

  private def removeSuffix(value: String, suf: String): String =
    if (suffix(value, suf)) value.substring(0, value.length - suf.length) else value

  private def suffixPreceded(value: String, suf: String, preceded: String): Boolean =
    suffix(value, suf) && suffix(removeSuffix(value, suf), preceded)

  /** Step-1 rule: strip/replace `suf` when both the current term and the
    * frozen region end with it. `region`: 1=R1, 2=R2, 3=RV. `repl` null =
    * plain removal. `precededBy` adds the e-preceded guard on the term.
    * `noAssign` preserves the reference's discarded-result `logias` rule. */
  private final case class S1(suf: String, region: Int, repl: String = null,
                              precededBy: String = null, noAssign: Boolean = false)

  private val step1Rules: Array[S1] = Array(
    S1("uciones", 2, "u"),
    S1("imentos", 2), S1("amentos", 2), S1("adores", 2), S1("adoras", 2),
    S1("logias", 2, "log", noAssign = true), S1("encias", 2, "ente"),
    S1("amente", 1), S1("idades", 2),
    S1("acoes", 2), S1("imento", 2), S1("amento", 2), S1("adora", 2),
    S1("ismos", 2), S1("istas", 2), S1("logia", 2, "log"),
    S1("ucion", 2, "u"), S1("encia", 2, "ente"), S1("mente", 2), S1("idade", 2),
    S1("acao", 2), S1("ezas", 2), S1("icos", 2), S1("icas", 2), S1("ismo", 2),
    S1("avel", 2), S1("ivel", 2), S1("ista", 2), S1("osos", 2), S1("osas", 2),
    S1("ador", 2), S1("ivas", 2), S1("ivos", 2),
    S1("iras", 3, "ir", precededBy = "e"),
    S1("eza", 2), S1("ico", 2), S1("ica", 2), S1("oso", 2), S1("osa", 2),
    S1("iva", 2), S1("ivo", 2),
    S1("ira", 3, "ir", precededBy = "e"))

  /** Step-2 verb suffixes in source order: (test suffix in RV, string removed
    * from the term). The lone asymmetric pair is the preserved `ira`→`ava`
    * quirk; later duplicates (`iras`, `areis`, `iu`, the second `ira`) are
    * shadowed by their first occurrence exactly as in the reference. */
  private val step2Rules: Array[(String, String)] = Array(
    "issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos",
    "iremos", "eremos", "aremos", "avamos", "iramos", "eramos", "aramos",
    "asseis", "esseis", "isseis", "arieis", "erieis", "irieis",
    "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
    "asses", "esses", "isses", "astes", "assem", "essem", "issem",
    "ardes", "erdes", "irdes", "ariam", "eriam", "iriam",
    "arias", "erias", "irias", "estes", "istes", "areis", "aveis",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este", "iste",
    "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao", "irao",
    "adas", "idas", "aras", "eras", "iras", "avas", "ares", "eres", "ires",
    "ados", "idos", "amos", "emos", "imos", "iras", "ieis")
    .map(s => (s, s)) ++ Array(
    "ada" -> "ada", "ida" -> "ida", "ara" -> "ara", "era" -> "era",
    "ira" -> "ava", "iam" -> "iam", "ado" -> "ado", "ido" -> "ido",
    "ias" -> "ias", "ais" -> "ais", "eis" -> "eis", "ira" -> "ira",
    "ear" -> "ear",
    "ia" -> "ia", "ei" -> "ei", "am" -> "am", "em" -> "em", "ar" -> "ar",
    "er" -> "er", "ir" -> "ir", "as" -> "as", "es" -> "es", "is" -> "is",
    "eu" -> "eu", "iu" -> "iu", "iu" -> "iu", "ou" -> "ou")

  /** `BrazilianStemmer.stem`: null when the folded term is not indexable
    * (len ≤ 2 or ≥ 30); the folded term itself when it has non-letters. */
  def stem(term: String): String = {
    var ct = createCT(term)
    if (ct.length >= 30 || ct.length <= 2) return null
    if (!ct.forall(_.isLetter)) return ct
    val r1 = getR1(ct)
    val r2 = getR1(r1)
    val rv = getRV(ct)

    // step 1: standard suffixes against frozen R1/R2/RV
    var altered = false
    var i = 0
    while (!altered && i < step1Rules.length) {
      val r = step1Rules(i)
      val region = r.region match { case 1 => r1; case 2 => r2; case _ => rv }
      if (suffix(ct, r.suf) && suffix(region, r.suf) &&
          (r.precededBy == null || suffixPreceded(ct, r.suf, r.precededBy))) {
        if (!r.noAssign) {
          ct = removeSuffix(ct, r.suf)
          if (r.repl != null) ct += r.repl
        }
        altered = true
      }
      i += 1
    }

    // step 2: verb suffixes in frozen RV (only when step 1 fired nothing)
    if (!altered && rv != null) {
      var j = 0
      while (!altered && j < step2Rules.length) {
        val (test, rem) = step2Rules(j)
        if (suffix(rv, test)) {
          ct = removeSuffix(ct, rem)
          altered = true
        }
        j += 1
      }
    }

    if (altered) {
      // step 3: i preceded by c, tested in frozen RV, removed conditionally
      if (rv != null && suffix(rv, "i") && suffixPreceded(rv, "i", "c"))
        ct = removeSuffix(ct, "i")
    } else if (rv != null) {
      // step 4: residual suffix
      if (suffix(rv, "os")) ct = removeSuffix(ct, "os")
      else if (suffix(rv, "a")) ct = removeSuffix(ct, "a")
      else if (suffix(rv, "i")) ct = removeSuffix(ct, "i")
      else if (suffix(rv, "o")) ct = removeSuffix(ct, "o")
    }

    // step 5: final e (with gu/ci contraction), always attempted
    if (rv != null && suffix(rv, "e")) {
      if (suffixPreceded(rv, "e", "gu")) {
        ct = removeSuffix(ct, "e"); ct = removeSuffix(ct, "u")
      } else if (suffixPreceded(rv, "e", "ci")) {
        ct = removeSuffix(ct, "e"); ct = removeSuffix(ct, "i")
      } else ct = removeSuffix(ct, "e")
    }
    ct
  }
}

/** Brazilian Portuguese analysis chain (`br/BrazilianAnalyzer.java:119`):
  * standard → lowercase → stop → BrazilianStemFilter (which keeps the
  * original term when the stemmer returns null or an unchanged string —
  * `br/BrazilianStemFilter.java`). */
final case class BrazilianAnalyzer(stopWords: Set[String] = Analyzers.BrazilianStopWords)
    extends Analyzer {
  override val name = "brazilian"
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
        val s = BrazilianStem.stem(lower)
        val term = if (s != null && s != lower) s else lower
        sink.accept(term, 0, term.length, pos)
      }
      pos += 1
    }
  }
}
