package graft

import graft.core.{Hunspell, HunspellAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

/** Hunspell subset ([[Hunspell]]): the reference's own `TestStemmer`
  * vectors over its `simple.aff`/`simple.dic` fixture
  * (`lucene/analysis/common/src/test/org/apache/lucene/analysis/hunspell/TestStemmer.java:28-73`),
  * plus condition-class parsing and the stem-filter contract. */
class HunspellSpec extends AnyFunSuite {

  // the reference test fixture, verbatim (simple.aff / simple.dic)
  private val aff =
    """SET UTF-8
      |TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ
      |
      |SFX A Y 3
      |SFX A   0     e         n
      |SFX A   0     e         t
      |SFX A   0     e         h
      |
      |SFX C Y 2
      |SFX C   0     d/C       c
      |SFX C   0     c         b
      |
      |SFX D Y 1
      |SFX D   0     s         o
      |
      |SFX E Y 1
      |SFX E   0     d         o
      |
      |PFX B Y 1
      |PFX B   0     s         o
      |""".stripMargin
  private val dic =
    """9
      |ab/C
      |apach/A
      |foo/D
      |foo/E
      |lucen/A
      |lucene
      |mahout/A
      |moo/E
      |olr/B
      |""".stripMargin

  private val d = Hunspell.parse(aff, dic)
  private def stems(w: String): Seq[String] = d.stem(w).sorted

  test("TestStemmer: simple suffix / prefix / no bare recursion") {
    assert(stems("lucene") == Seq("lucen", "lucene"))
    assert(stems("mahoute") == Seq("mahout"))
    assert(stems("solr") == Seq("olr"))
    // the d/C suffix's continuation does NOT license recursion through the
    // continuation-less c rule
    assert(stems("abcd") == Seq())
  }

  test("TestStemmer: all unmunched forms") {
    assert(stems("ab") == Seq("ab"))
    assert(stems("abc") == Seq("ab"))
    assert(stems("apach") == Seq("apach"))
    assert(stems("apache") == Seq("apach"))
    assert(stems("foo") == Seq("foo", "foo")) // one per homonym entry
    assert(stems("food") == Seq("foo"))
    assert(stems("foos") == Seq("foo"))
    assert(stems("lucen") == Seq("lucen"))
    assert(stems("mahout") == Seq("mahout"))
    assert(stems("moo") == Seq("moo"))
    assert(stems("mood") == Seq("moo"))
    assert(stems("olr") == Seq("olr"))
  }

  test("TestStemmer: bogus forms do not stem") {
    Seq("abs", "abe", "sab", "sapach", "sapache", "apachee", "sfoo",
        "sfoos", "fooss", "lucenee", "solre").foreach { w =>
      assert(stems(w) == Seq(), w)
    }
  }

  test("condition classes: sets, negation, dot") {
    import Hunspell._
    assert(Hunspell.parseCondition("[^ey]").head == OneOf(Set('e', 'y'), negated = true))
    assert(Hunspell.parseCondition(".").head == AnyChar)
    val d2 = Hunspell.parse(
      "SFX V N 2\nSFX V e ive e\nSFX V 0 ive [^e]\n", "2\ncreate/V\nexpend/V\n")
    assert(d2.stem("creative") == Seq("create"))  // e-strip branch
    assert(d2.stem("expendive") == Seq("expend")) // [^e] branch
  }

  test("analyzer: stems replace the token, no-stem tokens pass through") {
    val a = HunspellAnalyzer(d)
    assert(a.tokenize("lucene drives mahoute").map(_.term) ==
      Seq("lucene", "lucen", "drives", "mahout"))
    assert(a.tokenize("lucene drives mahoute").map(_.position) == Seq(0, 0, 1, 2))
    val longest = HunspellAnalyzer(d, longestOnly = true)
    assert(longest.tokenize("lucene").map(_.term) == Seq("lucene"))
  }
}
