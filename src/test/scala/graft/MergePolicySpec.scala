package graft

import graft.index.{MergePolicy, Seg, TieredPolicy}
import org.scalatest.funsuite.AnyFunSuite

/** [[TieredPolicy]] vs the reference `TieredMergePolicy` NATURAL behavior:
  * the tier budget (no merging under the allowed segment count), window
  * packing at the merge factor, the skew preference for balanced merges, the
  * nonDelRatio² preference for delete-reclaiming merges, too-large segment
  * grace, and determinism — each on crafted segment distributions where the
  * reference's arithmetic pins the expected outcome. */
class MergePolicySpec extends AnyFunSuite {

  private val p = TieredPolicy(segsPerTier = 8.0, floorSegmentBytes = 1L,
    maxMergedSegmentBytes = 1000000L, deletesPctAllowed = 20.0)

  private def segs(sizes: Seq[Long]): Seq[Seg] =
    sizes.zipWithIndex.map { case (s, i) => Seg(i.toLong, s, s, 0L) }

  test("under the tier budget: no merges") {
    // 8 equal segments, segsPerTier = 8 -> allowed = 8 >= count
    assert(p.findMerges(segs(Seq.fill(8)(100L))) == Nil)
  }

  test("over budget: equal segments merge mergeFactor at a time, largest-first order") {
    // 16 equal segments -> allowed 9 -> merge one window of 8 (ids 0-7 via
    // the size-desc id-asc sort), leaving 8 <= 9
    val groups = p.findMerges(segs(Seq.fill(16)(100L)))
    assert(groups.size == 1)
    assert(groups.head.toSet == (0L until 8L).toSet)
  }

  test("skew: balanced windows beat windows containing one huge segment") {
    // one 1000-byte segment + 30 ten-byte segments: the all-small windows
    // score ~0.05 vs ~0.9 for any window holding the big one
    val sizes = 1000L +: Seq.fill(30)(10L)
    val groups = p.findMerges(segs(sizes))
    assert(groups.nonEmpty)
    groups.foreach(g => assert(!g.contains(0L), s"big segment merged: $g"))
    groups.foreach(g => assert(g.size == 8))
  }

  test("deletes: nonDelRatio² prefers the delete-reclaiming window") {
    // 10 clean segments and 10 same-raw-size segments at 40% deleted; the
    // deleted window's score carries (0.6)² and wins despite equal skew
    val clean = (0 until 10).map(i => Seg(i.toLong, 100L, 100L, 0L))
    val deleted = (10 until 20).map(i => Seg(i.toLong, 100L, 100L, 40L))
    val groups = p.findMerges(clean ++ deleted)
    assert(groups.nonEmpty)
    assert(groups.head.forall(_ >= 10L), s"first merge should reclaim deletes: ${groups.head}")
  }

  test("too-large segments are graced out of merging") {
    val policy = TieredPolicy(segsPerTier = 8.0, floorSegmentBytes = 1L,
      maxMergedSegmentBytes = 1000L, deletesPctAllowed = 20.0)
    // 600 > maxMerged/2 with few deletes -> removed from consideration
    val sizes = 600L +: Seq.fill(30)(10L)
    val groups = policy.findMerges(segs(sizes))
    assert(groups.nonEmpty)
    groups.foreach(g => assert(!g.contains(0L)))
  }

  test("windows pack past an oversize candidate to fill toward the cap") {
    val policy = TieredPolicy(segsPerTier = 4.0, floorSegmentBytes = 1L,
      maxMergedSegmentBytes = 100L, deletesPctAllowed = 20.0)
    // sizes 60,50,40,30,...: 60+50 > 100 so the window from 60 skips 50 and
    // packs 40 (60+40 = 100 hits the cap exactly at the boundary)
    val sizes = Seq(60L, 50L, 40L, 30L, 20L, 10L, 5L, 4L, 3L, 2L, 1L, 1L, 1L, 1L, 1L, 1L)
    val groups = policy.findMerges(segs(sizes))
    // every group respects the byte cap
    groups.foreach { g =>
      val bytes = g.map(id => sizes(id.toInt)).sum
      assert(bytes <= 100L, s"group $g = $bytes bytes")
    }
  }

  test("merging set is excluded from selection") {
    val all = segs(Seq.fill(16)(100L))
    val groups = p.findMerges(all, merging = (0L until 4L).toSet)
    groups.foreach(g => assert(g.forall(_ >= 4L)))
  }

  test("deterministic") {
    val sizes = Seq.tabulate(40)(i => (i * 37 % 400 + 5).toLong)
    val a = p.findMerges(segs(sizes))
    val b = p.findMerges(segs(sizes))
    assert(a == b && a.nonEmpty)
  }

  test("segmentStats + findMerges run end-to-end on a live index with tombstones") {
    import SparkTestEnv._
    val idx = Indexes.tombstonedIndex(spark, sfDir)
    val stats = MergePolicy.segmentStats(idx).collect()
    assert(stats.nonEmpty)
    assert(stats.map(_.getLong(3)).sum > 0, "tombstones should count as per-segment deletes")
    // tiny fixture segments sit under any realistic floor: with a small
    // floor + tier budget the policy proposes merges deterministically
    val policy = TieredPolicy(segsPerTier = 2.0, floorSegmentBytes = 1L,
      maxMergedSegmentBytes = Long.MaxValue / 4, deletesPctAllowed = 5.0)
    val groups = MergePolicy.findMerges(idx, policy)
    val again = MergePolicy.findMerges(idx, policy)
    assert(groups == again)
  }
}
