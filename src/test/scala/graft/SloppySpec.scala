package graft

import graft.search.SloppyMatcher
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral spec of the sloppy-phrase frequency against the reference's
  * documented semantics (`SloppyPhraseMatcher` class javadoc + greedy loop):
  * matches are enumerated greedily by always advancing the least phrase
  * position, each match contributing 1/(1+matchLength). */
class SloppySpec extends AnyFunSuite {

  /** positions per term, already offset-adjusted by the caller? No — the
    * matcher adjusts internally: pass raw token positions per phrase index. */
  private def freq(slop: Int, positions: Array[Int]*): Double =
    SloppyMatcher.sloppyFreq(positions.toArray, slop)

  test("""javadoc example: "a b"~2 on "x a b a y" matches at distance 0 and 2""") {
    // tokens: x=0 a=1 b=2 a=3 y=4
    val f = freq(2, Array(1, 3), Array(2))
    assert(math.abs(f - (1.0 + 1.0 / 3)) < 1e-12)
  }

  test("exact adjacency at slop=0 equals the exact-phrase count") {
    // "a b a b": a at 0,2; b at 1,3 — two exact matches
    assert(freq(0, Array(0, 2), Array(1, 3)) == 2.0)
    // no adjacency: zero
    assert(freq(0, Array(0), Array(5)) == 0.0)
  }

  test("""documented asymmetry: "a b c"~4 and "c b a"~4 differ on "a b c b a" (greedy, not exhaustive)""") {
    // tokens: a=0 b=1 c=2 b=3 a=4
    val fwd = freq(4, Array(0, 4), Array(1, 3), Array(2))
    val rev = freq(4, Array(2), Array(1, 3), Array(0, 4))
    assert(fwd > 0 && rev > 0)
    assert(math.abs(fwd - rev) > 1e-9, s"greedy enumeration should differ: $fwd vs $rev")
  }

  test("single out-of-order pair within slop scores 1/(1+distance)") {
    // "b x a": b=0, a=2 → adjusted a'=2, b'=-1 → distance 3
    assert(math.abs(freq(3, Array(2), Array(0)) - 0.25) < 1e-12)
    // distance beyond slop: no match
    assert(freq(2, Array(2), Array(0)) == 0.0)
  }

  test("monotone: larger slop never lowers the frequency") {
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val a = Array.fill(1 + rnd.nextInt(5))(rnd.nextInt(25)).distinct.sorted
      val b = Array.fill(1 + rnd.nextInt(5))(rnd.nextInt(25)).distinct.sorted
      val fs = (0 to 8).map(s => freq(s, a, b))
      fs.sliding(2).foreach { case Seq(lo, hi) => assert(hi >= lo - 1e-12) }
    }
  }
}
