package graft.search

import graft.core.{PostingBlock, PostingsCodec}

/** In-partition dynamic block-max WAND/MAXSCORE loop — the per-segment
  * document-at-a-time scorer the reference runs inside one searcher thread
  * (`lucene/core/src/java/org/apache/lucene/search/WANDScorer.java:55`,
  * `MaxScoreBulkScorer.java:26`, `ImpactsDISI.java:56`), re-expressed as a
  * `flatMapGroups` body over one segment's surviving posting blocks.
  *
  * A segment holds the complete postings of every document it owns (for all
  * terms), so per-doc sums computed inside one segment group are exact — the
  * same invariant that makes the reference's per-LeafReaderContext scoring
  * correct. The loop consumes blocks across terms in ascending-firstDoc order
  * and keeps a local top-k heap whose k-th score lifts the static pass-1
  * threshold `T` into a *rising* local threshold τ:
  *
  *  - a block `b` of term `t` is skipped (never decoded) when
  *    `ub(b) + Σ_{t'≠t} segMaxUb(t') < τ`: any doc in `b` has true score
  *    below τ at skip time, and τ only rises, so the doc can never enter the
  *    local (hence global) top k. Its accumulated partial sum from other
  *    terms stays below τ too (partial ≤ true), so the final `sum ≥ τ` gate
  *    drops it — exactly the static pass-2 argument, block by block.
  *  - docs strictly below every term's current block frontier are complete
  *    (terms' blocks are doc-ordered and disjoint), so they are finalized
  *    into the heap eagerly, which is what makes τ rise *during* the scan —
  *    the dynamic advantage the reference gets from collector feedback.
  *
  * The caller still applies the global static threshold and merges segment
  * top-ks; this loop only ever *removes* decode work, never changes results.
  */
object Wand {

  private final class Acc(var sum: Double, var cnt: Int)

  /** Score one segment's blocks document-at-a-time with dynamic block-max
    * skipping. Emits this segment's top-k (docId, exact score) candidates
    * with score ≥ the rising threshold (≥ `threshold`).
    *
    * @param rows       (term, blockUpperBound, block) for every surviving
    *                   block of this segment
    * @param scorers    per-term exact scorer (freq, quantizedDoclen) => score
    * @param nTerms     number of distinct query terms present in the index
    * @param requireAll conjunction semantics: docs must carry all nTerms
    * @param threshold  static lower bound on the global k-th best score
    * @param k          result size
    */
  def segmentTopK(
      rows: Iterator[(String, Double, PostingBlock)],
      scorers: Map[String, (Int, Int) => Double],
      nTerms: Int,
      requireAll: Boolean,
      threshold: Double,
      k: Int): Iterator[(Long, Double)] = {

    // ---- per-term doc-ordered block queues
    val byTerm = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[(Double, PostingBlock)]]
    rows.foreach { case (t, ub, b) =>
      byTerm.getOrElseUpdate(t, scala.collection.mutable.ArrayBuffer.empty) += ((ub, b))
    }
    if (byTerm.isEmpty) return Iterator.empty
    if (requireAll && byTerm.size < nTerms) return Iterator.empty // a MUST term misses the segment
    val terms = byTerm.keys.toArray
    val queues = terms.map { t =>
      val q = byTerm(t)
      q.sortInPlaceBy(_._2.firstDoc)
      q
    }
    val segMaxUb = queues.map(q => q.iterator.map(_._1).max)
    val sumSegMax = segMaxUb.sum
    // Σ_{t'≠t} segMaxUb(t') — bounds every other term's possible per-doc
    // contribution anywhere in the segment (a doc has one block per term)
    val othersBound = segMaxUb.map(sumSegMax - _)

    // ---- local top-k heap (worst on top: lowest score, then HIGHEST docId —
    // ties prefer the smaller doc id, mirroring the global sort order)
    val heap = new java.util.PriorityQueue[(Double, Long)](k, (a: (Double, Long), b: (Double, Long)) =>
      if (a._1 != b._1) java.lang.Double.compare(a._1, b._1) else java.lang.Long.compare(b._2, a._2))
    var tau = threshold
    def offer(doc: Long, score: Double): Unit = {
      if (heap.size < k) {
        heap.add((score, doc))
        if (heap.size == k) tau = math.max(threshold, heap.peek()._1)
      } else {
        val worst = heap.peek()
        if (score > worst._1 || (score == worst._1 && doc < worst._2)) {
          heap.poll(); heap.add((score, doc))
          tau = math.max(threshold, heap.peek()._1)
        }
      }
    }

    // ---- doc accumulator, finalized in doc order as the frontier advances
    val acc = new java.util.TreeMap[java.lang.Long, Acc]()
    def flushBelow(frontier: Long): Unit = {
      while (!acc.isEmpty && acc.firstKey() < frontier) {
        val e = acc.pollFirstEntry()
        val a = e.getValue
        if ((!requireAll || a.cnt == nTerms) && a.sum >= tau) offer(e.getKey, a.sum)
      }
    }

    // ---- DAAT over blocks
    val ptr = new Array[Int](terms.length)
    var done = false
    while (!done) {
      var tStar = -1
      var minFirst = Long.MaxValue
      var i = 0
      while (i < terms.length) {
        if (ptr(i) < queues(i).length) {
          val f = queues(i)(ptr(i))._2.firstDoc
          if (f < minFirst) { minFirst = f; tStar = i }
        }
        i += 1
      }
      if (tStar < 0) { flushBelow(Long.MaxValue); done = true }
      else {
        val (ub, b) = queues(tStar)(ptr(tStar))
        // every unconsumed block of every term starts at ≥ b.firstDoc, so docs
        // strictly below it can receive no further contribution
        flushBelow(b.firstDoc)
        if (ub + othersBound(tStar) >= tau) {
          val f = scorers(terms(tStar))
          val d = PostingsCodec.decodeBlock(b)
          var j = 0
          while (j < d.docs.length) {
            val a = acc.get(d.docs(j))
            val s = f(d.freqs(j), d.doclens(j))
            if (a == null) acc.put(d.docs(j), new Acc(s, 1))
            else { a.sum += s; a.cnt += 1 }
            j += 1
          }
        }
        ptr(tStar) += 1
      }
    }

    val out = new Array[(Long, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { val e = heap.poll(); out(i) = (e._2, e._1); i -= 1 }
    out.iterator
  }
}
