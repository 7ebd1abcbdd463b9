package graft.core

/** Indic analysis chains — Hindi and Bengali, mirroring the reference
  * compositions (`hi/HindiAnalyzer.java`, `bn/BengaliAnalyzer.java`):
  * standard → lowercase → decimal-digit fold → Indic script normalization →
  * language normalization → stop → light stem. Each full per-token chain is
  * pinned to the reference implementations' output over generated
  * vocabularies in IndicSpec.
  *
  * The in-place buffer ops mirror `StemmerUtil` (`delete`, `endsWith`);
  * the Indic composition table is the reference's `in/IndicNormalizer.java`
  * data (Unicode 5.2 ch. 6 graphical decompositions — inherently identical
  * constants, provenance documented here).
  */
private[core] object StemOps {
  /** Remove the char at `pos`; returns the new length. */
  def delete(s: Array[Char], pos: Int, len: Int): Int = {
    if (pos < len - 1) System.arraycopy(s, pos + 1, s, pos, len - pos - 1)
    len - 1
  }

  def endsWith(s: Array[Char], len: Int, suffix: String): Boolean = {
    val sl = suffix.length
    if (sl > len) return false
    var i = 0
    while (i < sl) {
      if (s(len - sl + i) != suffix.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Fold non-Latin decimal digits to ASCII (`core/DecimalDigitFilter.java`;
    * BMP-only like the per-char loop there — supplementary digits are not in
    * these scripts). */
  def foldDigits(s: Array[Char], len: Int): Int = {
    var i = 0
    while (i < len) {
      val ch = s(i)
      if (ch > 0x7F && Character.isDigit(ch))
        s(i) = ('0' + Character.getNumericValue(ch)).toChar
      i += 1
    }
    len
  }
}

/** Script-aware composition of decomposed Indic sequences
  * (`in/IndicNormalizer.java`): for each script the table lists (ch1, ch2,
  * ch3?, composed) offsets into the script's code page; matching runs are
  * replaced by the composed form. Only the scripts the engine ships chains
  * for are active (Devanagari, Bengali) — the table keeps the reference's
  * full data so adding a script is a flag. */
object IndicNormalizer extends Serializable {
  private val Devanagari = 1
  private val Bengali = 2
  private val Gurmukhi = 4
  private val Gujarati = 8
  private val Oriya = 16
  private val Tamil = 32
  private val Telugu = 64
  private val Kannada = 128
  private val Malayalam = 256

  private val bases: Map[Int, Int] = Map(
    Devanagari -> 0x0900, Bengali -> 0x0980, Gurmukhi -> 0x0A00,
    Gujarati -> 0x0A80, Oriya -> 0x0B00, Tamil -> 0x0B80,
    Telugu -> 0x0C00, Kannada -> 0x0C80, Malayalam -> 0x0D00)

  /** (ch1, ch2, ch3 | -1, composed, scriptFlags) — `IndicNormalizer.java`
    * `decompositions`, 0xFF = zero-width joiner. */
  private val decompositions: Array[Array[Int]] = Array(
    Array(0x05, 0x3E, 0x45, 0x11, Devanagari | Gujarati),
    Array(0x05, 0x3E, 0x46, 0x12, Devanagari),
    Array(0x05, 0x3E, 0x47, 0x13, Devanagari | Gujarati),
    Array(0x05, 0x3E, 0x48, 0x14, Devanagari | Gujarati),
    Array(0x05, 0x3E, -1, 0x06, Devanagari | Bengali | Gurmukhi | Gujarati | Oriya),
    Array(0x05, 0x45, -1, 0x72, Devanagari),
    Array(0x05, 0x45, -1, 0x0D, Gujarati),
    Array(0x05, 0x46, -1, 0x04, Devanagari),
    Array(0x05, 0x47, -1, 0x0F, Gujarati),
    Array(0x05, 0x48, -1, 0x10, Gurmukhi | Gujarati),
    Array(0x05, 0x49, -1, 0x11, Devanagari | Gujarati),
    Array(0x05, 0x4A, -1, 0x12, Devanagari),
    Array(0x05, 0x4B, -1, 0x13, Devanagari | Gujarati),
    Array(0x05, 0x4C, -1, 0x14, Devanagari | Gurmukhi | Gujarati),
    Array(0x06, 0x45, -1, 0x11, Devanagari | Gujarati),
    Array(0x06, 0x46, -1, 0x12, Devanagari),
    Array(0x06, 0x47, -1, 0x13, Devanagari | Gujarati),
    Array(0x06, 0x48, -1, 0x14, Devanagari | Gujarati),
    Array(0x07, 0x57, -1, 0x08, Malayalam),
    Array(0x09, 0x41, -1, 0x0A, Devanagari),
    Array(0x09, 0x57, -1, 0x0A, Tamil | Malayalam),
    Array(0x0E, 0x46, -1, 0x10, Malayalam),
    Array(0x0F, 0x45, -1, 0x0D, Devanagari),
    Array(0x0F, 0x46, -1, 0x0E, Devanagari),
    Array(0x0F, 0x47, -1, 0x10, Devanagari),
    Array(0x0F, 0x57, -1, 0x10, Oriya),
    Array(0x12, 0x3E, -1, 0x13, Malayalam),
    Array(0x12, 0x4C, -1, 0x14, Telugu | Kannada),
    Array(0x12, 0x55, -1, 0x13, Telugu),
    Array(0x12, 0x57, -1, 0x14, Tamil | Malayalam),
    Array(0x13, 0x57, -1, 0x14, Oriya),
    Array(0x15, 0x3C, -1, 0x58, Devanagari),
    Array(0x16, 0x3C, -1, 0x59, Devanagari | Gurmukhi),
    Array(0x17, 0x3C, -1, 0x5A, Devanagari | Gurmukhi),
    Array(0x1C, 0x3C, -1, 0x5B, Devanagari | Gurmukhi),
    Array(0x21, 0x3C, -1, 0x5C, Devanagari | Bengali | Oriya),
    Array(0x22, 0x3C, -1, 0x5D, Devanagari | Bengali | Oriya),
    Array(0x23, 0x4D, 0xFF, 0x7A, Malayalam),
    Array(0x24, 0x4D, 0xFF, 0x4E, Bengali),
    Array(0x28, 0x3C, -1, 0x29, Devanagari),
    Array(0x28, 0x4D, 0xFF, 0x7B, Malayalam),
    Array(0x2B, 0x3C, -1, 0x5E, Devanagari | Gurmukhi),
    Array(0x2F, 0x3C, -1, 0x5F, Devanagari | Bengali),
    Array(0x2C, 0x41, 0x41, 0x0B, Telugu),
    Array(0x30, 0x3C, -1, 0x31, Devanagari),
    Array(0x30, 0x4D, 0xFF, 0x7C, Malayalam),
    Array(0x32, 0x4D, 0xFF, 0x7D, Malayalam),
    Array(0x33, 0x3C, -1, 0x34, Devanagari),
    Array(0x33, 0x4D, 0xFF, 0x7E, Malayalam),
    Array(0x35, 0x41, -1, 0x2E, Telugu),
    Array(0x3E, 0x45, -1, 0x49, Devanagari | Gujarati),
    Array(0x3E, 0x46, -1, 0x4A, Devanagari),
    Array(0x3E, 0x47, -1, 0x4B, Devanagari | Gujarati),
    Array(0x3E, 0x48, -1, 0x4C, Devanagari | Gujarati),
    Array(0x3F, 0x55, -1, 0x40, Kannada),
    Array(0x41, 0x41, -1, 0x42, Gurmukhi),
    Array(0x46, 0x3E, -1, 0x4A, Tamil | Malayalam),
    Array(0x46, 0x42, 0x55, 0x4B, Kannada),
    Array(0x46, 0x42, -1, 0x4A, Kannada),
    Array(0x46, 0x46, -1, 0x48, Malayalam),
    Array(0x46, 0x55, -1, 0x47, Telugu | Kannada),
    Array(0x46, 0x56, -1, 0x48, Telugu | Kannada),
    Array(0x46, 0x57, -1, 0x4C, Tamil | Malayalam),
    Array(0x47, 0x3E, -1, 0x4B, Bengali | Oriya | Tamil | Malayalam),
    Array(0x47, 0x57, -1, 0x4C, Bengali | Oriya),
    Array(0x4A, 0x55, -1, 0x4B, Kannada),
    Array(0x72, 0x3F, -1, 0x07, Gurmukhi),
    Array(0x72, 0x40, -1, 0x08, Gurmukhi),
    Array(0x72, 0x47, -1, 0x0F, Gurmukhi),
    Array(0x73, 0x41, -1, 0x09, Gurmukhi),
    Array(0x73, 0x42, -1, 0x0A, Gurmukhi),
    Array(0x73, 0x4B, -1, 0x13, Gurmukhi))

  private def scriptOf(c: Char): Int = {
    val cp = c.toInt
    if (cp >= 0x0900 && cp < 0x0980) Devanagari
    else if (cp >= 0x0980 && cp < 0x0A00) Bengali
    else if (cp >= 0x0A00 && cp < 0x0A80) Gurmukhi
    else if (cp >= 0x0A80 && cp < 0x0B00) Gujarati
    else if (cp >= 0x0B00 && cp < 0x0B80) Oriya
    else if (cp >= 0x0B80 && cp < 0x0C00) Tamil
    else if (cp >= 0x0C00 && cp < 0x0C80) Telugu
    else if (cp >= 0x0C80 && cp < 0x0D00) Kannada
    else if (cp >= 0x0D00 && cp < 0x0D80) Malayalam
    else 0
  }

  private val decompMask: Map[Int, java.util.BitSet] = bases.keys.map { f =>
    val bs = new java.util.BitSet(0x7F)
    decompositions.foreach(d => if ((d(4) & f) != 0) bs.set(d(0)))
    f -> bs
  }.toMap

  def normalize(s: Array[Char], len0: Int): Int = {
    var len = len0
    var i = 0
    while (i < len) {
      val f = scriptOf(s(i))
      if (f != 0) {
        val ch = s(i) - bases(f)
        if (ch >= 0 && ch < 0x7F && decompMask(f).get(ch)) len = compose(ch, f, s, i, len)
      }
      i += 1
    }
    len
  }

  private def compose(ch0: Int, f: Int, s: Array[Char], pos: Int, len0: Int): Int = {
    var len = len0
    if (pos + 1 >= len) return len
    val base = bases(f)
    val ch1 = s(pos + 1) - base
    if (scriptOf(s(pos + 1)) != f) return len
    var ch2 = -1
    if (pos + 2 < len) {
      ch2 = s(pos + 2) - base
      if (s(pos + 2) == '‍') ch2 = 0xFF
      else if (scriptOf(s(pos + 2)) != f) ch2 = -1
    }
    var i = 0
    while (i < decompositions.length) {
      val d = decompositions(i)
      if (d(0) == ch0 && (d(4) & f) != 0 && d(1) == ch1 && (d(2) < 0 || d(2) == ch2)) {
        s(pos) = (base + d(3)).toChar
        len = StemOps.delete(s, pos + 1, len)
        if (d(2) >= 0) len = StemOps.delete(s, pos + 1, len)
        return len
      }
      i += 1
    }
    len
  }
}

/** Hindi spelling normalization (`hi/HindiNormalizer.java`: Pingali & Varma
  * with the Larkey et al. additions — nukta/candrabindu/virama/ZWJ folds,
  * long→short vowels). */
object HindiNormalizer extends Serializable {
  def normalize(s: Array[Char], len0: Int): Int = {
    import StemOps.delete
    var len = len0
    var i = 0
    while (i < len) {
      s(i) match {
        case 'न' => // dead n -> bindu
          if (i + 1 < len && s(i + 1) == '्') {
            s(i) = 'ं'
            len = delete(s, i + 1, len)
          }
        case 'ँ' => s(i) = 'ं'
        case '़' => len = delete(s, i, len); i -= 1
        case 'ऩ' => s(i) = 'न'
        case 'ऱ' => s(i) = 'र'
        case 'ऴ' => s(i) = 'ळ'
        case 'क़' => s(i) = 'क'
        case 'ख़' => s(i) = 'ख'
        case 'ग़' => s(i) = 'ग'
        case 'ज़' => s(i) = 'ज'
        case 'ड़' => s(i) = 'ड'
        case 'ढ़' => s(i) = 'ढ'
        case 'फ़' => s(i) = 'फ'
        case 'य़' => s(i) = 'य'
        case '‍' | '‌' => len = delete(s, i, len); i -= 1
        case '्' => len = delete(s, i, len); i -= 1
        case 'ॅ' | 'ॆ' => s(i) = 'े'
        case 'ॉ' | 'ॊ' => s(i) = 'ो'
        case 'ऍ' | 'ऎ' => s(i) = 'ए'
        case 'ऑ' | 'ऒ' => s(i) = 'ओ'
        case 'ॲ' => s(i) = 'अ'
        case 'आ' => s(i) = 'अ'
        case 'ई' => s(i) = 'इ'
        case 'ऊ' => s(i) = 'उ'
        case 'ॠ' => s(i) = 'ऋ'
        case 'ॡ' => s(i) = 'ऌ'
        case 'ऐ' => s(i) = 'ए'
        case 'औ' => s(i) = 'ओ'
        case 'ी' => s(i) = 'ि'
        case 'ू' => s(i) = 'ु'
        case 'ॄ' => s(i) = 'ृ'
        case 'ॣ' => s(i) = 'ॢ'
        case 'ै' => s(i) = 'े'
        case 'ौ' => s(i) = 'ो'
        case _ =>
      }
      i += 1
    }
    len
  }
}

/** Light stemmer for Hindi (`hi/HindiStemmer.java`, Ramanathan & Rao):
  * one longest-bucket suffix strip, length-gated per bucket. */
object HindiStem extends Serializable {
  import StemOps.endsWith
  private val suf5 = Array("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
  private val suf4 = Array("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे",
    "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ", "ियों", "ियां")
  private val suf3 = Array("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे",
    "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं")
  private val suf2 = Array("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते",
    "ीं", "ती", "ता", "ाँ", "ां", "ों", "ें")
  private val suf1 = Array("ो", "े", "ू", "ु", "ी", "ि", "ा")

  def stem(s: Array[Char], len: Int): Int = {
    if (len > 6 && suf5.exists(endsWith(s, len, _))) return len - 5
    if (len > 5 && suf4.exists(endsWith(s, len, _))) return len - 4
    if (len > 4 && suf3.exists(endsWith(s, len, _))) return len - 3
    if (len > 3 && suf2.exists(endsWith(s, len, _))) return len - 2
    if (len > 2 && suf1.exists(endsWith(s, len, _))) return len - 1
    len
  }
}

/** Bengali spelling normalization (`bn/BengaliNormalizer.java`, UzZaman &
  * Khan double-metaphone folds). */
object BengaliNormalizer extends Serializable {
  def normalize(s: Array[Char], len0: Int): Int = {
    import StemOps.delete
    var len = len0
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ঁ' => len = delete(s, i, len); i -= 1
        case 'ী' => s(i) = 'ি'
        case 'ূ' => s(i) = 'ু'
        case 'ক' => // Khio
          if (i + 2 < len && s(i + 1) == '্' && s(i + 2) == 'ি') {
            if (i == 0) {
              s(i) = 'খ'
              len = delete(s, i + 2, len)
              len = delete(s, i + 1, len)
            } else {
              s(i + 1) = 'খ'
              len = delete(s, i + 2, len)
            }
          }
        case 'ঙ' => s(i) = 'ং'
        case 'য' => // Ja Phala
          if (i - 2 == 0 && s(i - 1) == '্') {
            s(i - 1) = 'ে'
            if (i + 1 < len && s(i + 1) == 'া') len = delete(s, i + 1, len)
            len = delete(s, i, len)
            i -= 1
          } else if (i - 1 >= 0 && s(i - 1) == '্') {
            len = delete(s, i, len)
            len = delete(s, i - 1, len)
            i -= 2
          }
        case 'ব' => // Ba Phalaa
          if (i >= 1 && s(i - 1) == '্') {
            if (i - 2 == 0) {
              len = delete(s, i, len)
              len = delete(s, i - 1, len)
              i -= 2
            } else if (i - 5 >= 0 && s(i - 3) == '্') {
              len = delete(s, i, len)
              len = delete(s, i - 1, len)
              i -= 2
            } else if (i - 2 >= 0) {
              s(i - 1) = s(i - 2)
              len = delete(s, i, len)
              i -= 1
            }
          }
        case 'ঃ' => // Visarga
          if (i == len - 1) {
            if (len <= 3) s(i) = 'হ'
            else len = delete(s, i, len)
          } else s(i) = s(i + 1)
        case 'শ' | 'ষ' => s(i) = 'স'
        case 'ণ' => s(i) = 'ন'
        case 'ড়' | 'ঢ়' => s(i) = 'র'
        case 'ৎ' => s(i) = 'ত'
        case _ =>
      }
      i += 1
    }
    len
  }
}

/** Stemmer for Bengali (`bn/BengaliStemmer.java`, Sengupta & Chaudhuri verb
  * morphology + UniNE criteria). */
object BengaliStem extends Serializable {
  import StemOps.endsWith
  private val suf8 = Array("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন", "ইয়াছিলেন")
  private val suf7 = Array("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি", "য়েদেরকে")
  private val suf6 = Array("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন", "েদেরকে")
  private val suf5 = Array("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি",
    "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")
  private val suf4 = Array("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে",
    "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের")
  private val suf3 = Array("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা",
    "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি", "ইবি",
    "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের")
  private val suf2 = Array("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি",
    "বে", "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা", "কে")
  private val suf1 = Array("ি", "ী", "া", "ো", "ে", "ব", "ত")

  def stem(s: Array[Char], len: Int): Int = {
    if (len > 9 && suf8.exists(endsWith(s, len, _))) return len - 8
    if (len > 8 && suf7.exists(endsWith(s, len, _))) return len - 7
    if (len > 7 && suf6.exists(endsWith(s, len, _))) return len - 6
    if (len > 6 && suf5.exists(endsWith(s, len, _))) return len - 5
    if (len > 5 && suf4.exists(endsWith(s, len, _))) return len - 4
    if (len > 4 && suf3.exists(endsWith(s, len, _))) return len - 3
    if (len > 3 && suf2.exists(endsWith(s, len, _))) return len - 2
    if (len > 2 && suf1.exists(endsWith(s, len, _))) return len - 1
    len
  }
}

/** Shared per-token chain body for the two Indic analyzers (graft-visible
  * so IndicSpec can pin the exact composition). */
private[graft] object IndicChains {
  /** lowercase → digit fold → Indic normalize, no language-specific steps —
    * the pre-stop prefix of the Nepali/Tamil chains. */
  def normalizeOnly(raw: String): String = {
    val buf = raw.toLowerCase(java.util.Locale.ROOT).toCharArray
    var len = StemOps.foldDigits(buf, buf.length)
    len = IndicNormalizer.normalize(buf, len)
    new String(buf, 0, len)
  }

  /** lowercase → digit fold → Indic normalize → `langNorm` → `langStem`. */
  def apply(raw: String, langNorm: (Array[Char], Int) => Int,
            langStem: (Array[Char], Int) => Int): (String, String) = {
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val buf = lower.toCharArray
    var len = StemOps.foldDigits(buf, buf.length)
    len = IndicNormalizer.normalize(buf, len)
    len = langNorm(buf, len)
    val normalized = new String(buf, 0, len)
    len = langStem(buf, len)
    (normalized, new String(buf, 0, len))
  }
}

/** Hindi analysis chain (`hi/HindiAnalyzer.java:118`): standard → lowercase
  * → decimal digits → Indic normalize → Hindi normalize → stop → stem.
  * The stop filter runs on the NORMALIZED form, like the reference. */
final case class HindiAnalyzer(stopWords: Set[String] = Analyzers.HindiStopWords)
    extends Analyzer {
  override val name = "hindi"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val (normalized, stemmed) =
        IndicChains(raw, HindiNormalizer.normalize, HindiStem.stem)
      if (!stopWords.contains(normalized))
        sink.accept(stemmed, 0, stemmed.length, pos)
      pos += 1
    }
  }
}

/** Bengali analysis chain (`bn/BengaliAnalyzer.java:118`): standard →
  * lowercase → decimal digits → Indic normalize → Bengali normalize →
  * stop → stem. */
/** Telugu spelling normalization (`te/TeluguNormalizer.java:38`):
  * candrabindu→bindu, visarga/zwj/zwnj deletion, long→short vowels and
  * matras, and the two-char compositions ె+ౖ→ై, ఒ+ౕ→ఓ, ఒ+ౌ→ఔ. */
object TeluguNormalizer extends Serializable {
  def normalize(s: Array[Char], len0: Int): Int = {
    import StemOps.delete
    var len = len0
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ఀ' | 'ఁ' => s(i) = 'ం' // candrabindu -> bindu
        case 'ః' => len = delete(s, i, len); i -= 1 // visarga
        case '‌' | '‍' => len = delete(s, i, len); i -= 1 // zw(n)j
        case 'ఔ' => s(i) = 'ఓ' // ఔ -> ఓ
        case 'ఐ' => s(i) = 'ఏ' // ఐ -> ఏ
        case 'ఆ' => s(i) = 'అ' // ఆ -> అ
        case 'ఈ' => s(i) = 'ఇ' // ఈ -> ఇ
        case 'ఊ' => s(i) = 'ఉ' // ఊ -> ఉ
        case 'ీ' => s(i) = 'ి' // ీ -> ి
        case 'ూ' => s(i) = 'ు' // ూ -> ు
        case 'ే' => s(i) = 'ె' // ే -> ె
        case 'ో' => s(i) = 'ొ' // ో -> ొ
        case 'ె' if i + 1 < len && s(i + 1) == 'ౖ' =>
          s(i) = 'ై'; len = delete(s, i + 1, len) // ె+ౖ -> ై
        case 'ఒ' if i + 1 < len && s(i + 1) == 'ౕ' =>
          s(i) = 'ఓ'; len = delete(s, i + 1, len) // ఒ+ౕ -> ఓ
        case 'ఒ' if i + 1 < len && s(i + 1) == 'ౌ' =>
          s(i) = 'ఔ'; len = delete(s, i + 1, len) // ఒ+ౌ -> ఔ
        case _ =>
      }
      i += 1
    }
    len
  }
}

/** Telugu suffix stripping (`te/TeluguStemmer.java:27`): longest of the
  * 4-char plural clusters, then case/plural 2-char endings, then single
  * vowel matras, each behind its minimum-length guard. */
object TeluguStem extends Serializable {
  import StemOps.endsWith
  private val suf4 = Array("ళ్ళు", "డ్లు")
  private val suf2 = Array("డు", "ము", "వు", "లు", "ని", "ను", "చే", "కై",
    "లో", "ది", "కి", "సు", "వై", "పై")
  private val suf1 = Array("ి", "ీ", "ు", "ూ", "ె", "ే", "ొ", "ో", "ా")
  def stem(s: Array[Char], len: Int): Int = {
    if (len > 5 && suf4.exists(endsWith(s, len, _))) return len - 4
    if (len > 3 && suf2.exists(endsWith(s, len, _))) return len - 2
    if (len > 2 && suf1.exists(endsWith(s, len, _))) return len - 1
    len
  }
}

/** Per-token Telugu chain body (graft-visible so TeluguSpec can pin the
  * exact composition): digit fold → Indic normalize → Telugu normalize →
  * stem — NO lowercase, matching `TeluguAnalyzer.createComponents`. */
private[graft] object TeluguChain {
  /** Returns (normalized, stemmed); stop filtering applies to the former. */
  def apply(raw: String): (String, String) = {
    val buf = java.util.Arrays.copyOf(raw.toCharArray, raw.length + 4)
    var len = StemOps.foldDigits(buf, raw.length)
    len = IndicNormalizer.normalize(buf, len)
    len = TeluguNormalizer.normalize(buf, len)
    val normalized = new String(buf, 0, len)
    len = TeluguStem.stem(buf, len)
    (normalized, new String(buf, 0, len))
  }
}

/** Telugu analysis chain (`te/TeluguAnalyzer.java:114`): standard →
  * decimal digits → Indic normalize → Telugu normalize → stop → stem.
  * Unlike the Hindi/Bengali chains the reference composes NO
  * LowerCaseFilter here — preserved verbatim (TeluguSpec pins it). */
final case class TeluguAnalyzer(stopWords: Set[String] = Analyzers.TeluguStopWords)
    extends Analyzer {
  override val name = "telugu"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val (normalized, stemmed) = TeluguChain(raw)
      if (!stopWords.contains(normalized))
        sink.accept(stemmed, 0, stemmed.length, pos)
      pos += 1
    }
  }
}

final case class BengaliAnalyzer(stopWords: Set[String] = Analyzers.BengaliStopWords)
    extends Analyzer {
  override val name = "bengali"
  override def tokenize(text: String): IndexedSeq[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeRaw(text, (src, s, e, pos) => out += Token(src.substring(s, e), pos))
    out.result()
  }
  override def tokenizeRaw(text: String, sink: TokenSink): Unit = {
    var pos = 0
    SnowballAnalyzers.standardRawTokens(text).foreach { raw =>
      val (normalized, stemmed) =
        IndicChains(raw, BengaliNormalizer.normalize, BengaliStem.stem)
      if (!stopWords.contains(normalized))
        sink.accept(stemmed, 0, stemmed.length, pos)
      pos += 1
    }
  }
}
