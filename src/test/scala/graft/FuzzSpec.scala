package graft

import graft.core.SimpleAnalyzer
import graft.search._
import graft.streaming.Monitor
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential fuzzing: random query ASTs evaluated by two INDEPENDENT
  * implementations — the distributed index searcher (postings algebra,
  * pruning, expansions) and the per-document Monitor evaluator (MemoryIndex
  * analog) — must agree on the matching doc set. The reference uses the
  * same trick with `RandomIndexWriter` + dual-codec cross-checks
  * (`lucene/test-framework/src/java/org/apache/lucene/tests/index/RandomIndexWriter.java:53`).
  */
class FuzzSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val vocab: IndexedSeq[String] =
    corpus.values.flatMap(_.map(_.term)).toSet.toIndexedSeq.sorted

  private lazy val views: Map[Long, Monitor.DocView] =
    corpus.map { case (id, toks) => id -> new Monitor.DocView(toks) }

  private def term(rnd: Random): String = vocab(rnd.nextInt(vocab.size))

  private def randQuery(rnd: Random, depth: Int): Query = {
    val leaf = depth <= 0 || rnd.nextInt(3) == 0
    if (leaf) rnd.nextInt(8) match {
      case 0 | 1 => TermQuery(term(rnd))
      case 2 => PhraseQuery(Seq(term(rnd), term(rnd)))
      case 3 => PrefixQuery(term(rnd).take(1 + rnd.nextInt(3)))
      case 4 => TermInSetQuery(Set(term(rnd), term(rnd), term(rnd)))
      case 5 => FuzzyQuery(term(rnd), 1 + rnd.nextInt(2))
      case 6 => SynonymQuery(Seq(term(rnd), term(rnd)))
      case _ =>
        val a = term(rnd); val b = term(rnd)
        TermRangeQuery(Some(if (a <= b) a else b), Some(if (a <= b) b else a), true, rnd.nextBoolean())
    } else rnd.nextInt(4) match {
      case 0 =>
        val n = 2 + rnd.nextInt(3)
        BooleanQuery((0 until n).map { _ =>
          val occ = rnd.nextInt(5) match {
            case 0 => Occur.MUST_NOT
            case 1 | 2 => Occur.MUST
            case _ => Occur.SHOULD
          }
          occ -> randQuery(rnd, depth - 1)
        })
      case 1 =>
        val n = 2 + rnd.nextInt(2)
        BooleanQuery((0 until n).map(_ => Occur.SHOULD -> randQuery(rnd, depth - 1)),
          minimumShouldMatch = 1 + rnd.nextInt(2))
      case 2 => DisjunctionMaxQuery(Seq(randQuery(rnd, depth - 1), randQuery(rnd, depth - 1)))
      case _ => BoostQuery(randQuery(rnd, depth - 1), 0.5f + rnd.nextInt(4))
    }
  }

  test("fuzzed pruned boolean top-k == exhaustive (random terms, occur, k)") {
    val pruned = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = 1L)
    val plain = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = Long.MaxValue)
    val rnd = new Random(424242)
    (0 until 25).foreach { i =>
      val n = 2 + rnd.nextInt(3)
      val ts = (0 until n).map(_ => term(rnd)).distinct
      val occ = if (rnd.nextBoolean()) Occur.MUST else Occur.SHOULD
      val k = Seq(1, 3, 10)(rnd.nextInt(3))
      val q = BooleanQuery(ts.map(t => occ -> TermQuery(t)))
      val a = pruned.search(q, k).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = plain.search(q, k).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a.map(_._1) == b.map(_._1), s"fuzz-pruned #$i: $occ $ts k=$k")
      a.zip(b).foreach { case ((_, sa), (_, sb)) =>
        assert(math.abs(sa - sb) < 1e-9, s"fuzz-pruned #$i score: $occ $ts k=$k") }
    }
  }

  test("searcher doc set == per-doc evaluator on 120 random query trees") {
    val searcher = new Searcher(index, ScoringMode.PreciseBM25())
    val rnd = new Random(20260817)
    var nonEmpty = 0
    (0 until 120).foreach { i =>
      val q = randQuery(rnd, depth = 2)
      val viaIndex: Set[Long] =
        searcher.scored(q).select("docId").collect().map(_.getLong(0)).toSet
      val viaDocs: Set[Long] =
        views.collect { case (id, v) if Monitor.matches(QueryRewriter.rewrite(q), v) => id }.toSet
      assert(viaIndex == viaDocs,
        s"fuzz #$i mismatch (idx=${viaIndex.size} docs=${viaDocs.size}) for $q\n" +
          s"only-index=${(viaIndex -- viaDocs).take(5)} only-docs=${(viaDocs -- viaIndex).take(5)}")
      if (viaIndex.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 30, s"fuzz corpus too sparse: only $nonEmpty non-empty result sets")
  }
}
