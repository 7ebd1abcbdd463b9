package graft

import graft.search._
import org.scalatest.funsuite.AnyFunSuite

/** LRU filter cache + usage-tracking admission policy ([[QueryCache]]) —
  * the reference's LRUQueryCache/UsageTrackingQueryCachingPolicy contract:
  * admission only after repeated use, cheap queries never admitted, LRU
  * eviction unpersists, and cached results stay identical to uncached. */
class QueryCacheSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  private lazy val index = SparkTestEnv.index

  private def topIds(s: Searcher, q: Query): Seq[(Long, Double)] =
    s.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("costly filter admits after 2 uses; results identical to uncached") {
    val cache = new LRUQueryCache(maxEntries = 8)
    val cached = new Searcher(index, queryCache = Some(cache))
    val plain = new Searcher(index)
    val q = BooleanQuery(Seq(
      Occur.MUST -> TermQuery("spark"),
      Occur.FILTER -> PrefixQuery("st")))
    val want = topIds(plain, q)

    assert(topIds(cached, q) == want) // use 1: computed, not yet admitted
    assert(cache.cachedQueries.isEmpty)
    assert(topIds(cached, q) == want) // use 2: admitted (costly → threshold 2)
    assert(cache.cachedQueries == Set(PrefixQuery("st")))
    val missesAfterAdmit = cache.missCount
    assert(topIds(cached, q) == want) // use 3: served from cache
    assert(cache.hitCount >= 1)
    assert(cache.missCount == missesAfterAdmit)
  }

  test("term filters never cache; cheap shapes need 5 uses") {
    val policy = new UsageTrackingQueryCachingPolicy()
    (1 to 10).foreach(_ => policy.onUse(TermQuery("spark")))
    assert(!policy.shouldCache(TermQuery("spark")))
    val cheap = BooleanQuery(Seq(Occur.SHOULD -> TermQuery("a"),
      Occur.SHOULD -> TermQuery("b")))
    (1 to 4).foreach(_ => policy.onUse(cheap))
    assert(!policy.shouldCache(cheap))
    policy.onUse(cheap)
    assert(policy.shouldCache(cheap))
  }

  test("onUse ticks on cache hits too: an evicted hot filter re-admits immediately") {
    val cache = new LRUQueryCache(maxEntries = 1)
    val s = new Searcher(index, queryCache = Some(cache))
    def run(p: String): Unit =
      s.search(BooleanQuery(Seq(
        Occur.MUST -> TermQuery("spark"),
        Occur.FILTER -> PrefixQuery(p))), 5).collect()
    run("st"); run("st"); run("st") // admit at 2, hit at 3 — history: 3 uses
    assert(cache.cachedQueries == Set(PrefixQuery("st")))
    run("qu"); run("qu") // admit qu → evicts st
    assert(cache.cachedQueries == Set(PrefixQuery("qu")))
    // st's history (3 uses, hits included) survives eviction: ONE more use
    // re-admits it — a hit-blind history would need two more
    run("st")
    assert(cache.cachedQueries == Set(PrefixQuery("st")))
  }

  test("frames wider than the size budget are computed but not retained") {
    val tiny = new LRUQueryCache(maxEntries = 8, maxFrameFraction = 0.001)
    val s = new Searcher(index, queryCache = Some(tiny))
    val plain = new Searcher(index)
    val q = BooleanQuery(Seq(
      Occur.MUST -> TermQuery("spark"),
      Occur.FILTER -> PrefixQuery("st")))
    val want = topIds(plain, q)
    assert(topIds(s, q) == want)
    assert(topIds(s, q) == want) // admission point — but the frame is too wide
    assert(tiny.cachedQueries.isEmpty)
    assert(tiny.skippedLargeCount >= 1)
    assert(topIds(s, q) == want)
  }

  test("cache binds to one index identity and refuses another searcher's index") {
    val cache = new LRUQueryCache(maxEntries = 8)
    new Searcher(index, queryCache = Some(cache))
    assert(cache.boundIndexKey.contains(index.identityKey))
    // same identity: fine
    new Searcher(index, queryCache = Some(cache))
    // different identity (the stop-filtered variant index): refused
    val other = Indexes.stopIndex(spark, SparkTestEnv.sfDir)
    assertThrows[IllegalArgumentException] {
      new Searcher(other, queryCache = Some(cache))
    }
  }

  test("LRU eviction drops the eldest admitted filter") {
    val cache = new LRUQueryCache(maxEntries = 1)
    val s = new Searcher(index, queryCache = Some(cache))
    def run(p: String): Unit =
      s.search(BooleanQuery(Seq(
        Occur.MUST -> TermQuery("spark"),
        Occur.FILTER -> PrefixQuery(p))), 5).collect()
    run("st"); run("st") // admit st
    assert(cache.cachedQueries == Set(PrefixQuery("st")))
    run("qu"); run("qu") // admit qu → evicts st
    assert(cache.cachedQueries == Set(PrefixQuery("qu")))
  }
}
