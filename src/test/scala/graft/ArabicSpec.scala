package graft

import graft.core.{Analyzers, Arabic, ArabicAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

/** Arabic normalizer + light-10 stemmer pinned to the reference's own unit
  * test vectors (`TestArabicNormalizationFilter.java:31-83`,
  * `TestArabicStemFilter.java:32-112`). */
class ArabicSpec extends AnyFunSuite {

  test("normalizer matches the reference vectors") {
    val vectors = Seq(
      "آجن" -> "اجن",       // alef madda
      "أحمد" -> "احمد",     // alef hamza above
      "إعاذ" -> "اعاذ",     // alef hamza below
      "بنى" -> "بني",       // dotless yeh
      "فاطمة" -> "فاطمه",   // teh marbuta
      "روبرـــــت" -> "روبرت", // tatweel
      "مَبنا" -> "مبنا",     // fatha
      "علِي" -> "علي",      // kasra
      "بُوات" -> "بوات",    // damma
      "ولداً" -> "ولدا",    // fathatan
      "ولدٍ" -> "ولد",      // kasratan
      "ولدٌ" -> "ولد",      // dammatan
      "نلْسون" -> "نلسون",  // sukun
      "هتميّ" -> "هتمي")    // shadda
    vectors.foreach { case (in, want) =>
      assert(Arabic.normalize(in) == want, s"normalize($in)")
    }
  }

  test("light-10 stemmer matches the reference vectors") {
    val vectors = Seq(
      "الحسن" -> "حسن",     // al- prefix
      "والحسن" -> "حسن",    // wal- prefix
      "بالحسن" -> "حسن",    // bal- prefix
      "كالحسن" -> "حسن",    // kal- prefix
      "فالحسن" -> "حسن",    // fal- prefix
      "للاخر" -> "اخر",     // ll- prefix
      "وحسن" -> "حسن",      // wa- prefix
      "زوجها" -> "زوج",     // -ha suffix
      "ساهدان" -> "ساهد",   // -an
      "ساهدات" -> "ساهد",   // -at
      "ساهدون" -> "ساهد",   // -wn
      "ساهدين" -> "ساهد",   // -yn
      "ساهديه" -> "ساهد",   // -yh
      "ساهدية" -> "ساهد",   // -yp
      "ساهده" -> "ساهد",    // -h
      "ساهدة" -> "ساهد",    // -p
      "ساهدي" -> "ساهد",    // -y
      "وساهدون" -> "ساهد",  // prefix + suffix together
      "ساهدهات" -> "ساهد",  // cumulative suffixes (-at then -h)
      "الو" -> "الو",       // shouldn't stem (too short after)
      "English" -> "English") // non-Arabic passthrough
    vectors.foreach { case (in, want) =>
      assert(Arabic.stem(in) == want, s"stem($in)")
    }
  }

  test("chain: lowercase → stop on UNnormalized surface → normalize → stem") {
    val a = ArabicAnalyzer()
    // "في" is a stop word (surface form); "الحسن" stems to "حسن"
    val toks = a.tokenize("الحسن في البيت")
    assert(toks.map(_.term) == Vector("حسن", "بيت"))
    assert(toks.map(_.position) == Vector(0, 2))
  }

  test("registry resolves the chain") {
    assert(Analyzers.byName("arabic").isInstanceOf[ArabicAnalyzer])
  }

  test("Persian normalizer matches the reference vectors") {
    import graft.core.Persian
    val vectors = Seq(
      "های" -> "هاي",     // farsi yeh
      "هاے" -> "هاي",     // yeh barree
      "کشاندن" -> "كشاندن", // keheh → kaf
      "كتابۀ" -> "كتابه",  // heh+yeh
      "كتابهٔ" -> "كتابه", // heh + hamza above (deleted)
      "زادہ" -> "زاده")    // heh goal
    vectors.foreach { case (in, want) =>
      assert(Persian.normalize(graft.core.Arabic.normalize(in)) == want, s"persian($in)")
    }
  }

  test("Persian chain: stop on the NORMALIZED form, after both normalizers") {
    import graft.core.PersianAnalyzer
    // "که" normalizes to "كه" (keheh→kaf) which IS the stop form — the
    // filter order (normalize THEN stop) is observable
    val toks = PersianAnalyzer().tokenize("کتاب که خوب")
    assert(toks.map(_.term) == Vector("كتاب", "خوب"))
    assert(toks.map(_.position) == Vector(0, 2))
    assert(Analyzers.byName("persian").isInstanceOf[PersianAnalyzer])
  }

  test("Persian stemmer matches the reference TestPersianStemFilter vectors") {
    import graft.core.Persian
    // lucene/analysis/common/src/test/org/apache/lucene/analysis/fa/TestPersianStemFilter.java:51-81
    val vectors = Seq(
      "دوستان" -> "دوست",       // -an
      "كتابها" -> "كتاب",        // -ha
      "جامدات" -> "جامد",        // -at
      "عليرضايي" -> "عليرضا",    // -yee
      "شادماني" -> "شادمان",     // -ye
      "باحالتر" -> "باحال",      // -tar
      "خوبترين" -> "خوب",        // -tarin
      "كباب" -> "كباب")          // no stem
    vectors.foreach { case (in, want) =>
      assert(Persian.stem(in) == want, s"stem($in)")
    }
  }

  test("Persian chain applies char filter, digit fold and stemmer") {
    import graft.core.PersianAnalyzer
    // ZWNJ splits words pre-tokenization (PersianCharFilter): "می" becomes a
    // standalone token, which IS a (normalized) stop word — the surviving
    // verb root sits at position 1, proving the split happened
    val zwnj = PersianAnalyzer().tokenize("می‌رود")
    assert(zwnj.map(t => (t.term, t.position)) == Vector(("رود", 1)))
    // Extended Arabic-Indic digits fold to ASCII (DecimalDigitFilter)
    val digits = PersianAnalyzer().tokenize("۱۲۳")
    assert(digits.map(_.term) == Vector("123"))
    // suffixed word stems through the full chain (farsi yeh normalizes to
    // arabic yeh before the stemmer sees it)
    val stemmed = PersianAnalyzer().tokenize("دوستان")
    assert(stemmed.map(_.term) == Vector("دوست"))
  }
}
