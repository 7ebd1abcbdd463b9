package graft

import graft.core.PostingsCodec
import graft.search.Wand
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** MAXSCORE bulk scorer: fuzzed equivalence against brute-force disjunctive
  * top-k over synthetic segments, plus the decode-saving property that
  * motivates the essential/non-essential split. (The production routing is
  * additionally covered end-to-end by PrunedBooleanSpec's OR cases and the
  * FuzzSpec differential, which now exercise this path for SHOULD queries.) */
class MaxScoreSpec extends AnyFunSuite {

  /** Synthetic segment: nTerms postings lists over a doc universe, scorer =
    * freq (doclen-independent, so upper bounds are exact maxFreq). */
  private def makeSegment(rnd: Random, nTerms: Int, universe: Int, skew: Boolean) = {
    (0 until nTerms).map { ti =>
      val density = if (skew && ti == 0) 0.6 else 0.05 + rnd.nextDouble() * 0.2
      val docs = (0 until universe).filter(_ => rnd.nextDouble() < density)
        .map(_.toLong).toArray
      val maxF = if (skew && ti == 0) 50 else 2 + rnd.nextInt(4)
      val freqs = docs.map(_ => 1 + rnd.nextInt(maxF))
      val doclens = docs.map(_ => 100)
      s"t$ti" -> PostingsCodec.encodeBlocks(docs, freqs, doclens, null)
    }.toMap
  }

  private def brute(seg: Map[String, Vector[graft.core.PostingBlock]],
                    threshold: Double, k: Int): Seq[(Long, Double)] = {
    val sums = scala.collection.mutable.HashMap.empty[Long, Double]
    seg.values.flatten.foreach { b =>
      val d = PostingsCodec.decodeBlock(b)
      d.docs.indices.foreach(i => sums(d.docs(i)) = sums.getOrElse(d.docs(i), 0.0) + d.freqs(i))
    }
    sums.toSeq.filter(_._2 >= threshold)
      .sortBy { case (doc, s) => (-s, doc) }.take(k)
  }

  test("fuzzed: maxscore top-k == brute-force disjunctive top-k") {
    val rnd = new Random(7)
    (0 until 40).foreach { trial =>
      val seg = makeSegment(rnd, 2 + rnd.nextInt(4), 200 + rnd.nextInt(400), rnd.nextBoolean())
      val scorers = seg.keys.map(t => t -> ((f: Int, _: Int) => f.toDouble)).toMap
      val expected = brute(seg, threshold = 0.0, k = 10)
      val threshold = if (expected.size < 10) 0.0 else expected.last._2
      val rows = seg.iterator.flatMap { case (t, bs) =>
        bs.iterator.map(b => (t, b.maxFreq.toDouble, b))
      }
      val got = Wand.segmentTopKMaxScore(rows, scorers, threshold, 10).toSeq
        .sortBy { case (doc, s) => (-s, doc) }
      assert(got == brute(seg, threshold, 10), s"trial $trial")
    }
  }

  test("skewed term weights: non-essential blocks outside candidates skip decode") {
    // deterministic skew: the heavy term owns docs 0..9 (one block) at
    // freq 100; three light terms (freq 1) spread over 2000 docs (~16 blocks
    // each). Under the resulting threshold the lights are non-essential and
    // only their FIRST block (the one containing the candidates) may decode.
    val heavyDocs = (0L until 10L).toArray
    val seg = Map(
      "heavy" -> PostingsCodec.encodeBlocks(heavyDocs,
        heavyDocs.map(_ => 100), heavyDocs.map(_ => 100), null)) ++
      (1 to 3).map { ti =>
        val docs = (0 until 2000).map(_.toLong).toArray
        s"light$ti" -> PostingsCodec.encodeBlocks(docs,
          docs.map(_ => 1), docs.map(_ => 100), null)
      }
    val scorers = seg.keys.map(t => t -> ((f: Int, _: Int) => f.toDouble)).toMap
    val expected = brute(seg, 0.0, 10)
    val threshold = expected.last._2 // = 103: only heavy-term docs qualify
    val total = seg.values.map(_.size).sum
    var decodes = 0
    val rows = seg.iterator.flatMap { case (t, bs) =>
      bs.iterator.map(b => (t, b.maxFreq.toDouble, b))
    }
    val got = Wand.segmentTopKMaxScore(rows, scorers, threshold, 10,
      onDecode = () => decodes += 1).toSeq.sortBy { case (d, s) => (-s, d) }
    assert(got == brute(seg, threshold, 10))
    assert(got.size == 10)
    // 1 heavy block + exactly one block per light term; the other ~45 light
    // blocks never decode — the MAXSCORE saving this path exists for
    assert(decodes == 4, s"decoded $decodes of $total blocks (expected 4)")
  }

  test("empty input and all-below-threshold inputs") {
    assert(Wand.segmentTopKMaxScore(Iterator.empty, Map.empty, 1.0, 10).isEmpty)
    val docs = Array(1L, 2L, 3L)
    val blocks = PostingsCodec.encodeBlocks(docs, Array(1, 1, 1), Array(100, 100, 100), null)
    val rows = blocks.iterator.map(b => ("t", 1.0, b))
    val got = Wand.segmentTopKMaxScore(rows,
      Map("t" -> ((f: Int, _: Int) => f.toDouble)), 5.0, 10)
    assert(got.isEmpty)
  }
}
