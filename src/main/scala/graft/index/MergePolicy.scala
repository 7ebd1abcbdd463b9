package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One segment's stats (the reference's `SegmentSizeAndDocs`): `rawBytes` is
  * the on-disk size, `sizeBytes` the delete-prorated estimate the reference
  * budgets and packs with (`MergePolicy.size()`: raw scaled by the live
  * ratio). */
final case class Seg(id: Long, rawBytes: Long, maxDoc: Long, delCount: Long) {
  def liveDocs: Long = maxDoc - delCount
  def sizeBytes: Long =
    if (maxDoc <= 0) rawBytes
    else (rawBytes * (liveDocs.toDouble / maxDoc)).toLong
}

/** Size-tiered merge selection — an exact re-expression of the reference's
  * `TieredMergePolicy` NATURAL path
  * (`lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:316-434`
  * budget computation, `:453-636` candidate enumeration, `:683-734` skew
  * scoring): compute the allowed segment count from the tier geometry, and
  * while the index is over budget pick the lowest-scoring window of
  * size-sorted segments, where score = skew · size^0.05 · nonDelRatio² and
  * lower is better. The policy is a PURE function over segment statistics —
  * the decision brain runs on the driver over a tiny stats frame (one row
  * per segment), while the merges it selects run distributed through
  * [[SegmentMerger]]; nothing here touches postings.
  *
  * "Bytes" here are whatever size measure the caller supplies;
  * [[MergePolicy.segmentStats]] feeds `sumDoclen` (token volume — postings
  * bytes are proportional under the fixed block codec). The reference's
  * IO-throttling/concurrency machinery (merge scheduler) is out of scope; the
  * `merging` set models its in-flight exclusion.
  */
final case class TieredPolicy(
    segsPerTier: Double = 8.0,
    floorSegmentBytes: Long = 16L * 1024 * 1024,
    maxMergedSegmentBytes: Long = 5L * 1024 * 1024 * 1024,
    deletesPctAllowed: Double = 20.0,
    targetSearchConcurrency: Int = 1) {
  require(segsPerTier >= 2.0, "segsPerTier must be >= 2")
  require(deletesPctAllowed >= 5.0 && deletesPctAllowed <= 50.0)
  require(targetSearchConcurrency >= 1)

  private def floorSize(bytes: Long): Long = math.max(floorSegmentBytes, bytes)

  private val mergeFactor: Int = segsPerTier.toInt

  /** The reference's merge score (`score()`, :683-734): skew of the floored
    * sizes (first = largest, sorted input), gently scaled by total size,
    * strongly scaled by the square of the non-deleted ratio. Lower wins. */
  private def score(candidate: Seq[Seg], hitTooLarge: Boolean): Double = {
    var totAfter = 0L // prorated (deletes reclaimed)
    var totAfterFloored = 0L
    var totBefore = 0L // raw
    candidate.foreach { s =>
      totAfter += s.sizeBytes
      totAfterFloored += floorSize(s.sizeBytes)
      totBefore += s.rawBytes
    }
    val skew =
      if (hitTooLarge) 1.0 / mergeFactor
      else floorSize(candidate.head.sizeBytes).toDouble / totAfterFloored
    val nonDelRatio = totAfter.toDouble / math.max(1L, totBefore)
    skew * math.pow(totAfter.toDouble, 0.05) * nonDelRatio * nonDelRatio
  }

  /** NATURAL findMerges. `segments` need not be sorted; `merging` are
    * in-flight segment ids (excluded, their bytes counted like the
    * reference's `mergingBytes`). Returns merge groups of segment ids, best
    * first — at most one too-large merge per call, like the reference's
    * one-large-merge-per-cycle rule. */
  def findMerges(segments: Seq[Seg], merging: Set[Long] = Set.empty): Seq[Seq[Long]] = {
    if (segments.isEmpty) return Nil
    // sort by size desc, id asc tiebreak (getSortedBySegmentSize)
    var sorted = segments.sortBy(s => (-s.sizeBytes, s.id))
    var totIndexBytes = 0L
    var minSegmentBytes = Long.MaxValue
    var totalDelDocs = 0L
    var totalMaxDoc = 0L
    var mergingBytes = 0L
    sorted.foreach { s =>
      if (merging.contains(s.id)) {
        mergingBytes += s.sizeBytes
        totalMaxDoc += s.liveDocs
      } else {
        totalDelDocs += s.delCount
        totalMaxDoc += s.maxDoc
      }
      minSegmentBytes = math.min(minSegmentBytes, s.sizeBytes)
      totIndexBytes += s.sizeBytes
    }
    sorted = sorted.filterNot(s => merging.contains(s.id))

    val totalDelPct = 100.0 * totalDelDocs / math.max(1L, totalMaxDoc)
    var allowedDelCount = (deletesPctAllowed * totalMaxDoc / 100).toLong

    // grace out too-big segments + the first targetSearchConcurrency-1
    var tooBigCount = 0
    var concurrencyCount = 0
    var allowedSegCount = 0.0
    val eligible = scala.collection.mutable.ArrayBuffer.empty[Seg]
    sorted.foreach { s =>
      val segDelPct = 100.0 * s.delCount / math.max(1L, s.maxDoc)
      if (s.sizeBytes > maxMergedSegmentBytes / 2 &&
        (totalDelPct <= deletesPctAllowed || segDelPct <= deletesPctAllowed)) {
        tooBigCount += 1
        totIndexBytes -= s.sizeBytes
        allowedDelCount -= s.delCount
      } else if (concurrencyCount + tooBigCount < targetSearchConcurrency - 1) {
        concurrencyCount += 1
        allowedSegCount += 1
        totIndexBytes -= s.sizeBytes
        eligible += s
      } else {
        eligible += s
      }
    }
    allowedDelCount = math.max(0L, allowedDelCount)

    // tier geometry → allowed segment count (:403-419)
    var levelSize = math.max(minSegmentBytes, floorSegmentBytes)
    var bytesLeft = totIndexBytes
    var done = false
    while (!done) {
      val segCountLevel = bytesLeft / levelSize.toDouble
      if (segCountLevel < segsPerTier || levelSize == maxMergedSegmentBytes) {
        allowedSegCount += math.ceil(segCountLevel)
        done = true
      } else {
        allowedSegCount += segsPerTier
        bytesLeft -= (segsPerTier * levelSize).toLong
        levelSize = math.min(maxMergedSegmentBytes, levelSize * mergeFactor)
      }
    }
    allowedSegCount = math.max(allowedSegCount, segsPerTier)
    allowedSegCount = math.max(allowedSegCount, (targetSearchConcurrency - tooBigCount).toDouble)
    val allowedDocCount = math.ceil((totalMaxDoc - totalDelDocs).toDouble / targetSearchConcurrency).toLong
    val maxMergeIsRunning = mergingBytes >= maxMergedSegmentBytes

    doFindMerges(eligible.toVector, allowedSegCount.toInt, allowedDelCount,
      allowedDocCount, maxMergeIsRunning)
  }

  private def doFindMerges(sortedEligibleIn: Vector[Seg], allowedSegCount: Int,
                           allowedDelCount: Long, allowedDocCount: Long,
                           maxMergeIsRunning: Boolean): Seq[Seq[Long]] = {
    if (sortedEligibleIn.isEmpty) return Nil
    val originalSortedSize = sortedEligibleIn.size
    val toBeMerged = scala.collection.mutable.Set.empty[Long]
    val spec = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var haveOneLargeMerge = false
    var looping = true
    while (looping) {
      val sortedEligible = sortedEligibleIn.filterNot(s => toBeMerged.contains(s.id))
      if (sortedEligible.isEmpty) return spec.toSeq
      val remainingDelCount = sortedEligible.map(_.delCount).sum
      if (sortedEligible.size <= allowedSegCount && remainingDelCount <= allowedDelCount)
        return spec.toSeq

      // over budget: enumerate windows from each start, pick lowest score
      var bestScore = Double.NaN
      var best: Seq[Seg] = null
      var bestTooLarge = false
      var startIdx = 0
      var break = false
      while (startIdx < sortedEligible.size && !break) {
        val candidate = scala.collection.mutable.ArrayBuffer.empty[Seg]
        var hitTooLarge = false
        var bytesThisMerge = 0L
        var docCountThisMerge = 0L
        var idx = startIdx
        while (idx < sortedEligible.size &&
          (candidate.size < mergeFactor || bytesThisMerge < floorSegmentBytes) &&
          bytesThisMerge < maxMergedSegmentBytes &&
          (bytesThisMerge < floorSegmentBytes || docCountThisMerge <= allowedDocCount)) {
          val s = sortedEligible(idx)
          val segDocCount = s.liveDocs
          var skip = false
          if (bytesThisMerge + s.sizeBytes > maxMergedSegmentBytes ||
            (bytesThisMerge > floorSegmentBytes &&
              docCountThisMerge + segDocCount > allowedDocCount)) {
            hitTooLarge |= bytesThisMerge + s.sizeBytes > maxMergedSegmentBytes
            if (candidate.nonEmpty) skip = true // keep packing smaller segments
          }
          if (!skip) {
            candidate += s
            bytesThisMerge += s.sizeBytes
            docCountThisMerge += segDocCount
          }
          idx += 1
        }

        val maxCand = candidate.head
        val pathological = !hitTooLarge &&
          bytesThisMerge < maxCand.sizeBytes * 1.5 &&
          maxCand.delCount < maxCand.maxDoc * deletesPctAllowed / 100
        val pointlessSingleton = candidate.size == 1 && maxCand.delCount == 0
        if (!pathological && !pointlessSingleton) {
          if (best != null && !hitTooLarge && candidate.size < mergeFactor) {
            break = true // tail of the list: only smaller merges remain
          } else {
            val sc = score(candidate.toSeq, hitTooLarge)
            if ((best == null || sc < bestScore) && (!hitTooLarge || !maxMergeIsRunning)) {
              best = candidate.toSeq
              bestScore = sc
              bestTooLarge = hitTooLarge
            }
          }
        }
        startIdx += 1
      }

      if (best == null) return spec.toSeq
      if (!haveOneLargeMerge || !bestTooLarge) {
        haveOneLargeMerge |= bestTooLarge
        spec += best.map(_.id)
      }
      best.foreach(s => toBeMerged += s.id)
      looping = originalSortedSize - toBeMerged.size > 0
    }
    spec.toSeq
  }
}

object MergePolicy {
  /** Per-segment statistics for the policy, computed from the index's own
    * manifest rows (`segments`: one row per flushed segment — no postings
    * scan) with per-segment delete counts from the tombstone frame joined
    * against the doc table. Size measure = `sumDoclen` (token volume;
    * proportional to postings bytes under the fixed-width block codec). */
  def segmentStats(index: InvertedIndex): DataFrame = {
    val segs = index.segments
      .select(col("segmentId"), col("sumDoclen").as("sizeBytes"), col("numDocs").as("maxDoc"))
    val dels = index.deletedDocs match {
      case Some(d) =>
        index.docs.select(col("segmentId").as("sid"), col("docId"))
          .join(d.select("docId"), "docId")
          .groupBy("sid").agg(count(lit(1)).as("delCount"))
      case None =>
        segs.sparkSession.emptyDataFrame
          .withColumn("sid", lit(0L)).withColumn("delCount", lit(0L))
          .limit(0).select("sid", "delCount")
    }
    segs.join(dels, segs("segmentId") === dels("sid"), "left")
      .select(col("segmentId"), col("sizeBytes"), col("maxDoc"),
        coalesce(col("delCount"), lit(0L)).as("delCount"))
  }

  /** Policy decision over a live index: collect the (tiny) stats frame and
    * run [[TieredPolicy.findMerges]]. One row per segment on the driver —
    * bounded by segment count, not corpus size. */
  def findMerges(index: InvertedIndex, policy: TieredPolicy,
                 merging: Set[Long] = Set.empty): Seq[Seq[Long]] = {
    val stats = segmentStats(index).collect().map { r =>
      Seg(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    policy.findMerges(stats.toSeq, merging)
  }
}
