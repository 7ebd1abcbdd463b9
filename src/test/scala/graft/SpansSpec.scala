package graft

import graft.core.Token
import graft.search._
import graft.search.Spans._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Span-algebra spec: directed cases pinned to the reference's
  * `SpanNotQuery.java:202-210` accept inequality (catches a pre/post swap or
  * an off-by-one at either edge), brute-force doc-match equivalence against
  * reference span semantics (all qualifying windows) on random positions,
  * and end-to-end [[SpanQuery]] runs through the distributed [[Searcher]]
  * against the in-memory corpus. */
class SpansSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def pos(pairs: (String, Seq[Int])*): Map[String, Array[Int]] =
    pairs.map { case (t, ps) => t -> ps.toArray.sorted }.toMap

  private def m(s: SpanSource, p: Map[String, Array[Int]]): Boolean =
    IntervalEval.matches(Spans.toIntervals(s), p)

  test("SpanNot pre/post sides match the reference inequality exactly") {
    // include = a@5; exclude = c. SpanNotQuery rejects iff xc ∈ [5 − pre, 5 + post].
    def doc(c: Int) = pos("a" -> Seq(5), "c" -> Seq(c))
    val q = SpanNot(SpanTerm("a"), SpanTerm("c"), pre = 2, post = 0)
    assert(!m(q, doc(4)), "c@4 is within pre=2 before the include — must reject")
    assert(!m(q, doc(3)), "c@3 is exactly pre before — must reject (inclusive)")
    assert(m(q, doc(2)), "c@2 is beyond pre — must accept")
    assert(m(q, doc(6)), "c@6 is after the include with post=0 — must accept")
    assert(!m(q, doc(5)), "c@5 overlaps — must reject")
    // mirrored asymmetry: pre=0, post=2 — a swapped lowering fails one side
    val q2 = SpanNot(SpanTerm("a"), SpanTerm("c"), pre = 0, post = 2)
    assert(m(q2, doc(4)) && m(q2, doc(3)))
    assert(!m(q2, doc(6)) && !m(q2, doc(7)) && m(q2, doc(8)))
  }

  test("SpanNot with an interval exclude: widening applies at the overlap test, not the enumerated set") {
    // exclude = unordered(x, y): occurrences x@0 y@1 (minimal [0,1]) and
    // x@0 y@9 — the wide window is non-minimal and must still never matter,
    // while the MINIMAL exclude's widened edges must reject. With pre=3:
    // include a@4 is within 3 after [0,1]'s end → reject. A lowering that
    // widened-then-minimalized with clamp-at-0 drops would also pass this,
    // but the directed sides above pin the arithmetic.
    val p = pos("a" -> Seq(4), "x" -> Seq(0), "y" -> Seq(1, 9))
    val ex = SpanNear(Seq(SpanTerm("x"), SpanTerm("y")), slop = 20, inOrder = false)
    assert(!m(SpanNot(SpanTerm("a"), ex, pre = 3, post = 0), p))
    assert(m(SpanNot(SpanTerm("a"), ex, pre = 2, post = 0), p))
  }

  test("SpanFirst: exclusive end position ≤ end, i.e. last token strictly before the limit") {
    // phrase a b at [3,4]: endPosition (exclusive) = 5 — SpanFirstQuery
    // accepts iff end ≥ 5
    val p = pos("a" -> Seq(3), "b" -> Seq(4))
    val near = SpanNear(Seq(SpanTerm("a"), SpanTerm("b")), slop = 0, inOrder = true)
    assert(m(SpanFirst(near, 5), p))
    assert(!m(SpanFirst(near, 4), p))
  }

  test("brute-force doc-match equivalence vs reference span semantics on random positions") {
    val rnd = new Random(42)
    var notChecked = 0
    (0 until 3000).foreach { i =>
      val a = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(18)).distinct.sorted
      val b = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(18)).distinct.sorted
      val c = Seq.fill(rnd.nextInt(3))(rnd.nextInt(18)).distinct.sorted
      val p = pos("a" -> a, "b" -> b, "c" -> c)
      val slop = rnd.nextInt(6)
      // reference windows of near(a, b, slop, inOrder): all qualifying pairs
      def windows(inOrder: Boolean): Seq[(Int, Int)] =
        for {
          pa <- a; pb <- b
          if !inOrder || pa < pb // unordered allows overlap, like the reference
          lo = math.min(pa, pb); hi = math.max(pa, pb)
          if hi - lo - 1 <= slop // gap between the two leaves
        } yield (lo, hi)
      val ordered = SpanNear(Seq(SpanTerm("a"), SpanTerm("b")), slop, inOrder = true)
      val unordered = SpanNear(Seq(SpanTerm("a"), SpanTerm("b")), slop, inOrder = false)
      // SpanOr: doc matches iff any clause has a window
      assert(m(SpanOr(Seq(ordered, SpanTerm("c"))), p) ==
        (windows(true).nonEmpty || c.nonEmpty), s"or i=$i a=$a b=$b c=$c slop=$slop")
      // SpanFirst: some window ends strictly before the limit
      val limit = 1 + rnd.nextInt(18)
      assert(m(SpanFirst(unordered, limit), p) ==
        windows(false).exists(_._2 < limit), s"first i=$i a=$a b=$b slop=$slop limit=$limit")
      // SpanNot vs term exclude with asymmetric pre/post: a window survives
      // iff no c within [lo − pre, hi + post]
      val (pre, post) = (rnd.nextInt(3), rnd.nextInt(3))
      val qn = SpanNot(ordered, SpanTerm("c"), pre, post)
      val want = windows(true).exists { case (lo, hi) =>
        !c.exists(pc => pc >= lo - pre && pc <= hi + post)
      }
      assert(m(qn, p) == want, s"not i=$i a=$a b=$b c=$c slop=$slop pre=$pre post=$post")
      if (want != windows(true).nonEmpty) notChecked += 1
      // SpanContaining / SpanWithin evaluate under MINIMAL-interval
      // semantics (see the Spans scaladoc: the documented divergence from
      // greedy span enumeration when the container side's occurrences
      // nest) — so the brute force computes the minimal window set from
      // first principles, independently of IntervalEval
      val ws = windows(false)
      val minimalWs = ws.filter(w => !ws.exists(o =>
        o != w && o._1 >= w._1 && o._2 <= w._2))
      val qc = SpanContaining(unordered, SpanTerm("c"))
      val wantC = minimalWs.exists { case (lo, hi) => c.exists(pc => pc >= lo && pc <= hi) }
      assert(m(qc, p) == wantC, s"containing i=$i a=$a b=$b c=$c slop=$slop")
      val qw = SpanWithin(SpanTerm("c"), unordered)
      assert(m(qw, p) == wantC, s"within i=$i a=$a b=$b c=$c slop=$slop")
    }
    assert(notChecked > 50, "the not-filter must actually bite on this seed")
  }

  test("SpanQuery end-to-end through the distributed Searcher matches the corpus brute force") {
    val s = new Searcher(index, ScoringMode.PreciseBM25())
    def positions(toks: IndexedSeq[Token]): Map[String, Array[Int]] =
      toks.groupBy(_.term).map { case (t, ts) => t -> ts.map(_.position).toArray.sorted }
    def brute(src: SpanSource): Set[Long] =
      corpus.collect { case (doc, toks)
        if IntervalEval.matches(Spans.toIntervals(src), positions(toks)) => doc }.toSet
    val queries = Seq[SpanSource](
      SpanNot(SpanNear(Seq(SpanTerm("group"), SpanTerm("key")), 4, inOrder = true),
        SpanTerm("the"), pre = 1, post = 2),
      SpanOr(Seq(SpanTerm("dup"),
        SpanNear(Seq(SpanTerm("fast"), SpanTerm("filter")), 1, inOrder = false))),
      SpanFirst(SpanOr(Seq(SpanTerm("spark"), SpanTerm("hash"))), 3),
      SpanContaining(SpanNear(Seq(SpanTerm("join"), SpanTerm("scan")), 5, inOrder = true),
        SpanTerm("merge")),
      SpanWithin(SpanTerm("merge"),
        SpanNear(Seq(SpanTerm("join"), SpanTerm("scan")), 5, inOrder = true)))
    queries.foreach { q =>
      val got = s.scored(SpanQuery(q)).collect().map(_.getLong(0)).toSet
      val want = brute(q)
      assert(got == want, s"query $q: got ${got.size} docs, want ${want.size}")
      assert(want.nonEmpty, s"vacuous fixture for $q")
    }
  }
}
