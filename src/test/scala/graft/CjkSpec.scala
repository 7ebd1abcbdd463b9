package graft

import graft.core.{Analyzers, CjkAnalyzer, CjkWidth, Token}
import org.scalatest.funsuite.AnyFunSuite

/** CJK chain behavior pinned against the reference's OWN test vectors
  * (`lucene/analysis/common/src/test/org/apache/lucene/analysis/cjk/TestCJKAnalyzer.java`,
  * `TestCJKBigramFilter.java`, `TestCJKWidthFilter.java`) — expected token
  * sequences below are the reference tests' expected arrays. */
class CjkSpec extends AnyFunSuite {

  private val a = CjkAnalyzer()
  private val noStop = CjkAnalyzer(stopWords = Set.empty)
  private def terms(s: String): Seq[String] = a.tokenize(s).map(_.term)
  private def toks(s: String): Seq[Token] = a.tokenize(s)

  test("han run emits overlapping bigrams (TestCJKAnalyzer.testJa1)") {
    assert(terms("一二三四五六七八九十") ==
      Seq("一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"))
    assert(toks("一二三四五六七八九十").map(_.position) == (0 to 8))
  }

  test("whitespace breaks runs; lone chars emit unigrams (testJa2)") {
    assert(terms("一 二三四 五六七八九 十") ==
      Seq("一", "二三", "三四", "五六", "六七", "七八", "八九", "十"))
  }

  test("non-CJK passes through unmodified (testChinese shape)") {
    assert(terms("abc defgh ijklmn opqrstu vwxy z") ==
      Seq("abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"))
  }

  test("hiragana pair; trailing spaces; CJK/latin boundaries (LUCENE-2207 vectors)") {
    assert(terms("あい") == Seq("あい"))
    assert(terms("あい   ") == Seq("あい"))
    assert(terms("test") == Seq("test"))
    assert(terms("あいtest") == Seq("あい", "test"))
    assert(terms("testあい    ") == Seq("test", "あい"))
  }

  test("bigrams stop at an embedded latin token (testMix)") {
    assert(terms("あいうえおabcかきくけこ") ==
      Seq("あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"))
  }

  test("lone hiragana between latin letters is a unigram (testMix2)") {
    assert(terms("あいうえおabんcかきくけ こ") ==
      Seq("あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき", "きく", "くけ", "こ"))
  }

  test("bigrams cross Han/Hiragana script boundaries (TestCJKBigramFilter.testHuge unit)") {
    assert(terms("多くの学生が試験に落ちた") ==
      Seq("多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に", "に落", "落ち", "ちた"))
  }

  test("supplementary-plane ideographs bigram as codepoints (testSurrogates)") {
    assert(terms("𩬅艱鍟䇹愯瀛") == Seq("𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"))
  }

  test("non-CJK scripts tokenize normally beside CJK (testNonIdeographic)") {
    assert(terms("一 روبرت موير") == Seq("一", "روبرت", "موير"))
    // with a nonspacing mark attached (WB4): same terms
    assert(terms("一 رُوبرت موير") == Seq("一", "رُوبرت", "موير"))
  }

  test("hangul-only token bigrams; mixed hangul+latin does not (CJKBigramFilter doc)") {
    assert(terms("한국 가나다") == Seq("한국", "가나", "나다"))
    // mixed-script word: typed ALPHANUM by the tokenizer, passes through whole
    assert(terms("한국abc") == Seq("한국abc"))
  }

  test("katakana runs bigram including the prolonged sound mark") {
    assert(terms("スーパー") == Seq("スー", "ーパ", "パー"))
  }

  test("width folding: fullwidth ASCII and halfwidth katakana (TestCJKWidthFilter vectors)") {
    assert(CjkWidth.fold("Ｔｅｓｔ １２３４") == "Test 1234")
    assert(CjkWidth.fold("ｶﾀｶﾅ") == "カタカナ")
    assert(CjkWidth.fold("ｳﾞｨｯﾂ") == "ヴィッツ") // voiced mark composes: ｳ+ﾞ → ヴ
    assert(CjkWidth.fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック") // semi-voiced: ﾊ+ﾟ → パ
    assert(terms("ﾊﾟﾅｿﾆｯｸ") == Seq("パナ", "ナソ", "ソニ", "ニッ", "ック"))
    assert(terms("ＴＥＳＴ ３４") == Seq("test", "34"))
  }

  test("stop filter drops English stop words but keeps the position increment") {
    val t = toks("the 一二 of spark")
    assert(t == Seq(Token("一二", 1), Token("spark", 3)))
    assert(Analyzers.CjkStopWords.contains("www"))
    // without the stop set, everything survives at consecutive positions
    assert(noStop.tokenize("the 一二").map(_.term) == Seq("the", "一二"))
  }

  test("registry round-trip") {
    assert(Analyzers.byName("cjk").tokenize("多くの学生").map(_.term) ==
      Seq("多く", "くの", "の学", "学生"))
  }
}
