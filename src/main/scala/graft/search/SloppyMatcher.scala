package graft.search

import scala.collection.mutable

/** Sloppy-phrase frequency — a faithful re-implementation of the reference's
  * greedy minimal-width match enumeration
  * (`lucene/core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java:188-221`,
  * `PhraseScorer` summing `sloppyWeight = 1/(1+matchLength)` per match):
  *
  *  - each phrase term's token positions are offset-adjusted
  *    (`position = tokenPos − phraseIndex`), so an exact in-order match has
  *    all adjusted positions equal;
  *  - a priority queue repeatedly advances the least adjusted position; a
  *    match is emitted when the advancing term passes the runner-up, with
  *    `matchLength` = the minimal `end − min` width encountered;
  *  - the enumeration is intentionally greedy (not all slop-valid
  *    combinations), matching the reference's documented behavior — e.g.
  *    `"a b"~2` on `x a b a y` yields matches of length 0 and 2, so
  *    freq = 1/1 + 1/3.
  *
  * Phrases with REPEATED terms take the reference's separate repeat-group
  * machinery and are not supported here (the exact-phrase path handles
  * slop=0 repeats).
  */
object SloppyMatcher extends Serializable {

  /** positions(i) = ascending token positions of phrase term i (all non-empty,
    * terms pairwise distinct). Returns Σ 1/(1+matchLength) over matches. */
  def sloppyFreq(positions: Array[Array[Int]], slop: Int): Double = {
    val k = positions.length
    require(k >= 2, "sloppy phrase needs at least two terms")

    final class PP(val arr: Array[Int], val offset: Int, val ord: Int) {
      var idx = 0
      def position: Int = arr(idx) - offset
      def advance(): Boolean = { idx += 1; idx < arr.length }
    }
    // min-queue on (position, offset, ord) — the reference's tie-break
    val ord = Ordering.by[PP, (Int, Int, Int)](p => (p.position, p.offset, p.ord)).reverse
    val pq = mutable.PriorityQueue.empty[PP](ord)
    var end = Int.MinValue
    var i = 0
    while (i < k) {
      val pp = new PP(positions(i), i, i)
      if (pp.position > end) end = pp.position
      pq.enqueue(pp)
      i += 1
    }

    var freq = 0.0
    var positioned = true
    while (positioned) {
      // one nextMatch() call
      var pp = pq.dequeue()
      var matchLength = end - pp.position
      var next = pq.head.position
      var emitted = false
      var exhausted = false
      while (!emitted && !exhausted) {
        if (!pp.advance()) {
          exhausted = true
        } else {
          if (pp.position > end) end = pp.position
          if (pp.position > next) { // done minimizing current match length
            pq.enqueue(pp)
            if (matchLength <= slop) {
              freq += 1.0 / (1 + matchLength)
              emitted = true
            } else {
              pp = pq.dequeue()
              next = pq.head.position
              matchLength = end - pp.position
            }
          } else {
            val ml2 = end - pp.position
            if (ml2 < matchLength) matchLength = ml2
          }
        }
      }
      if (exhausted) {
        positioned = false
        if (matchLength <= slop) freq += 1.0 / (1 + matchLength)
      }
    }
    freq
  }
}
