package graft.search

import scala.collection.mutable

/** Interval query algebra — the reference's `Intervals` sources
  * (`lucene/queries/src/java/org/apache/lucene/queries/intervals/Intervals.java:56`)
  * under minimal-interval semantics (Clarke, Cormack & Burkowski's GC-list
  * algebra, which is also the reference's model): every source yields, per
  * document, the set of intervals that match it and contain no shorter
  * matching interval.
  *
  * Evaluation here is per-document over decoded position lists (an
  * executor-side pure function, like [[SpanMatcher]]) — the doc-level
  * candidate set comes from the usual postings conjunction, so only matching
  * docs ever reach the interval evaluator.
  */
sealed trait IntervalsSource extends Serializable {
  /** terms the source needs positions for */
  def terms: Set[String]
}

object Intervals {
  final case class Term(t: String) extends IntervalsSource { def terms = Set(t) }
  /** sub-sources in order, non-overlapping (`Intervals.ordered`) */
  final case class Ordered(ss: Seq[IntervalsSource]) extends IntervalsSource {
    def terms = ss.flatMap(_.terms).toSet
  }
  /** all sub-sources within a window, any order (`Intervals.unordered`) */
  final case class Unordered(ss: Seq[IntervalsSource]) extends IntervalsSource {
    def terms = ss.flatMap(_.terms).toSet
  }
  /** union (`Intervals.or`) */
  final case class Or(ss: Seq[IntervalsSource]) extends IntervalsSource {
    def terms = ss.flatMap(_.terms).toSet
  }
  /** consecutive terms (`Intervals.phrase`) */
  final case class Phrase(ts: Seq[String]) extends IntervalsSource {
    def terms = ts.toSet
  }
  /** keep intervals with `end − start + 1 ≤ width` (`Intervals.maxwidth`) */
  final case class MaxWidth(width: Int, s: IntervalsSource) extends IntervalsSource {
    def terms = s.terms
  }
  /** keep intervals whose internal gap count ≤ `gaps`; defined over sources
    * whose leaves are single positions, as `width − leafCount`
    * (`Intervals.maxgaps`) */
  final case class MaxGaps(gaps: Int, s: IntervalsSource) extends IntervalsSource {
    def terms = s.terms
  }
  /** intervals of `big` containing ≥ 1 interval of `small` (`Intervals.containing`) */
  final case class Containing(big: IntervalsSource, small: IntervalsSource) extends IntervalsSource {
    def terms = big.terms ++ small.terms
  }
  /** intervals of `small` contained in ≥ 1 interval of `big` (`Intervals.containedBy`) */
  final case class ContainedBy(small: IntervalsSource, big: IntervalsSource) extends IntervalsSource {
    def terms = small.terms ++ big.terms
  }
}

object IntervalEval extends Serializable {
  /** (start, end) token positions, inclusive. */
  type Interval = (Int, Int)

  /** number of leaf positions a source consumes (for maxgaps) */
  private def leafCount(src: IntervalsSource): Int = src match {
    case Intervals.Term(_) => 1
    case Intervals.Phrase(ts) => ts.size
    case Intervals.Ordered(ss) => ss.map(leafCount).sum
    case Intervals.Unordered(ss) => ss.map(leafCount).sum
    case Intervals.Or(ss) => ss.map(leafCount).max
    case Intervals.MaxWidth(_, s) => leafCount(s)
    case Intervals.MaxGaps(_, s) => leafCount(s)
    case Intervals.Containing(big, _) => leafCount(big)
    case Intervals.ContainedBy(small, _) => leafCount(small)
  }

  /** Keep only minimal intervals: drop any interval that properly contains
    * another. Input arbitrary; output sorted by (start, end), distinct. */
  private def minimalize(xs: Seq[Interval]): Vector[Interval] = {
    if (xs.isEmpty) return Vector.empty
    // sort start asc, end DESC (so a same-start wider interval precedes the
    // tighter one), then sweep right-to-left: an interval survives iff its
    // end is strictly below every survivor that starts at-or-after it
    val sorted = xs.distinct.sortBy { case (a, b) => (a, -b) }
    val out = mutable.ArrayBuffer.empty[Interval]
    var minEnd = Int.MaxValue
    var i = sorted.length - 1
    while (i >= 0) {
      val iv = sorted(i)
      if (iv._2 < minEnd) { out += iv; minEnd = iv._2 }
      i -= 1
    }
    out.sortBy(identity).toVector
  }

  /** Minimal matching intervals of `src` in a doc given its per-term sorted
    * position arrays. */
  def eval(src: IntervalsSource, positions: Map[String, Array[Int]]): Vector[Interval] = src match {
    case Intervals.Term(t) =>
      positions.get(t).map(_.toVector.map(p => (p, p))).getOrElse(Vector.empty)

    case Intervals.Phrase(ts) =>
      val lists = ts.map(t => positions.getOrElse(t, Array.empty[Int]))
      if (lists.exists(_.isEmpty)) Vector.empty
      else lists.head.toVector.collect {
        case p if ts.indices.tail.forall(i => java.util.Arrays.binarySearch(lists(i), p + i) >= 0) =>
          (p, p + ts.size - 1)
      }

    case Intervals.Or(ss) =>
      minimalize(ss.flatMap(s => eval(s, positions)))

    case Intervals.Ordered(ss) =>
      // fold: extend each accumulated interval with the next child's
      // intervals that start strictly after it ends; for each child interval
      // pick the LATEST-ending compatible prefix (tightest start) —
      // minimalize at each step
      ss.map(s => eval(s, positions)).reduceLeft { (acc, next) =>
        if (acc.isEmpty || next.isEmpty) Vector.empty
        else minimalize(next.flatMap { case (cs, ce) =>
          // latest acc interval fully before cs (max start among end < cs)
          val before = acc.filter(_._2 < cs)
          if (before.isEmpty) None
          else {
            val best = before.maxBy(iv => (iv._1, iv._2))
            Some((best._1, ce))
          }
        })
      }

    case Intervals.Unordered(ss) =>
      val lists = ss.map(s => eval(s, positions))
      if (lists.exists(_.isEmpty)) Vector.empty
      else {
        // smallest-range style sweep: one candidate interval per choice of
        // the minimal-start element; advance the list holding the min start
        val idx = Array.fill(lists.size)(0)
        val out = mutable.ArrayBuffer.empty[Interval]
        var done = false
        while (!done) {
          var minStart = Int.MaxValue; var minList = -1
          var maxEnd = Int.MinValue
          var i = 0
          while (i < lists.size) {
            val iv = lists(i)(idx(i))
            if (iv._1 < minStart) { minStart = iv._1; minList = i }
            if (iv._2 > maxEnd) maxEnd = iv._2
            i += 1
          }
          out += ((minStart, maxEnd))
          idx(minList) += 1
          if (idx(minList) >= lists(minList).length) done = true
        }
        minimalize(out.toSeq)
      }

    case Intervals.MaxWidth(w, s) =>
      eval(s, positions).filter { case (a, b) => b - a + 1 <= w }

    case Intervals.MaxGaps(g, s) =>
      val k = leafCount(s)
      eval(s, positions).filter { case (a, b) => (b - a + 1) - k <= g }

    case Intervals.Containing(big, small) =>
      val smalls = eval(small, positions)
      eval(big, positions).filter { case (a, b) =>
        smalls.exists { case (sa, sb) => a <= sa && sb <= b }
      }

    case Intervals.ContainedBy(small, big) =>
      val bigs = eval(big, positions)
      eval(small, positions).filter { case (sa, sb) =>
        bigs.exists { case (a, b) => a <= sa && sb <= b }
      }
  }

  def matches(src: IntervalsSource, positions: Map[String, Array[Int]]): Boolean =
    eval(src, positions).nonEmpty
}
