package graft.search

import org.apache.spark.sql.DataFrame

/** Per-filter result caching — the reference's `LRUQueryCache` +
  * `UsageTrackingQueryCachingPolicy`
  * (`lucene/core/src/java/org/apache/lucene/search/LRUQueryCache.java:87`,
  * `UsageTrackingQueryCachingPolicy.java`): FILTER clauses admit into the
  * cache only after repeated use (expensive expansions sooner than cheap
  * shapes), trivially-cheap queries never cache, and entries evict LRU.
  * Relationally a cached filter is a PERSISTED distinct-docId frame in
  * Spark's cluster cache — every executor reads the materialized bitset
  * analog instead of re-deriving it, which is exactly the reference's
  * cached `DocIdSet` role. Complements [[graft.index.InvertedIndex.warm]]
  * (which pins the index itself): warm() caches inputs, this caches
  * per-FILTER results with a reuse policy.
  */
final class UsageTrackingQueryCachingPolicy(historySize: Int = 256) {

  private val recent = new java.util.ArrayDeque[Query]()

  private val freq = new java.util.HashMap[Query, Integer]()

  /** Record a use of `q` in the ring of recent filters
    * (`UsageTrackingQueryCachingPolicy.onUse`). Called on EVERY use — cache
    * hits included, like the reference's ring buffer — so after LRU
    * eviction a hot filter re-admits from its accumulated history instead
    * of from zero. A frequency map rides beside the deque: O(1) lookups
    * under the cache lock instead of an O(historySize) scan. */
  def onUse(q: Query): Unit = synchronized {
    recent.addLast(q)
    freq.merge(q, 1, (a, b) => a + b)
    if (recent.size > historySize) {
      val old = recent.removeFirst()
      val left = freq.merge(old, -1, (a, b) => a + b)
      if (left <= 0) freq.remove(old)
    }
  }

  private def frequency(q: Query): Int = synchronized {
    val n = freq.get(q)
    if (n == null) 0 else n.intValue()
  }

  /** Queries never worth caching (`shouldNeverCache`): a term lookup is
    * as cheap as reading the cache, match-all/none are free. */
  def shouldNeverCache(q: Query): Boolean = q match {
    case _: TermQuery | MatchAllDocsQuery | MatchNoDocsQuery => true
    case BooleanQuery(clauses, _) if clauses.isEmpty => true
    case _ => false
  }

  /** Admission threshold (`minFrequencyToCache`): costly multi-term
    * expansions admit after 2 uses, everything else after 5. */
  def minFrequencyToCache(q: Query): Int = q match {
    case _: PrefixQuery | _: WildcardQuery | _: RegexpQuery | _: FuzzyQuery |
         _: TermRangeQuery | _: TermInSetQuery => 2
    case _ => 5
  }

  def shouldCache(q: Query): Boolean =
    !shouldNeverCache(q) && frequency(q) >= minFrequencyToCache(q)
}

/** LRU cache of persisted filter frames, bounded by entry count.
  *
  * A cache instance is BOUND to one index identity
  * ([[graft.index.InvertedIndex.identityKey]]) on first use and refuses any
  * other — the reference keys cached DocIdSets per segment core key and
  * drops them when segments change; here a persisted docId frame served
  * against a different snapshot would silently be stale. A
  * delete/append/merge commits a new snapshot version ⇒ new identity ⇒ a
  * [[Searcher]] over the refreshed index rejects the old cache at
  * construction (discard it and build a new one).
  *
  * Frames wider than `maxFrameFraction` of the bound index's doc count are
  * computed but NOT retained (the reference's skip-caching-when-not-
  * worthwhile guard, `LRUQueryCache.java` skipCacheFactor family): a
  * near-match-all filter costs cluster-cache memory proportional to the
  * corpus and saves almost nothing over re-deriving it — at 10^12 docs a
  * 90%-density frame is ~the corpus itself. */
final class LRUQueryCache(
    maxEntries: Int = 64,
    val policy: UsageTrackingQueryCachingPolicy = new UsageTrackingQueryCachingPolicy(),
    maxFrameFraction: Double = 0.9) {

  private val entries =
    new java.util.LinkedHashMap[Query, DataFrame](16, 0.75f, /*accessOrder=*/ true)

  private var hits = 0L
  private var misses = 0L
  private var skippedLarge = 0L
  private var boundKey: String = null
  private var boundDocCount: Long = Long.MaxValue

  def hitCount: Long = synchronized(hits)
  def missCount: Long = synchronized(misses)
  /** frames computed but not retained because they exceeded the size budget */
  def skippedLargeCount: Long = synchronized(skippedLarge)
  def boundIndexKey: Option[String] = synchronized(Option(boundKey))
  def cachedQueries: Set[Query] = synchronized {
    import scala.jdk.CollectionConverters._
    entries.keySet().asScala.toSet
  }

  /** Bind this cache to one index identity (first call wins). Returns false
    * when already bound to a DIFFERENT identity — the caller must refuse
    * the cache rather than serve stale frames. */
  def bind(indexKey: String, docCount: Long): Boolean = synchronized {
    if (boundKey == null) { boundKey = indexKey; boundDocCount = docCount; true }
    else boundKey == indexKey
  }

  /** queries whose frames exceeded the size budget — never re-probed (the
    * reference's large-segment skip never re-materializes either) */
  private val tooLargeMemo = new java.util.HashSet[Query]()

  /** The docId frame of FILTER query `q`: served from cache when present;
    * otherwise computed via `compute`, and — once the policy has seen
    * enough uses and the frame fits the size budget — persisted into the
    * cluster cache and retained LRU (evicted entries are unpersisted).
    *
    * The size-budget probe (persist + count) runs OUTSIDE the cache lock:
    * it is a full Spark job, and holding the lock across it would serialize
    * every unrelated cache hit behind one admission. An admission race is
    * resolved on re-entry (the loser unpersists its frame and takes the
    * winner's). An oversized result is memoized so a hot-but-wide filter is
    * probed exactly once, never made more expensive by the cache. */
  def filterDocs(q: Query, compute: () => DataFrame): DataFrame = {
    val (hit, admit) = synchronized {
      policy.onUse(q) // every use, hits included (reference ring-buffer contract)
      val h = entries.get(q)
      if (h != null) { hits += 1; (h, false) }
      else {
        misses += 1
        (null, !tooLargeMemo.contains(q) && policy.shouldCache(q))
      }
    }
    if (hit != null) return hit
    val frame = compute()
    if (!admit) return frame
    val persisted = frame.persist()
    val n = persisted.count() // materializes into the cluster cache, unlocked
    synchronized {
      val raced = entries.get(q)
      if (raced != null) { persisted.unpersist(); return raced }
      if (n > maxFrameFraction * boundDocCount) {
        persisted.unpersist()
        skippedLarge += 1
        if (tooLargeMemo.size < 4096) tooLargeMemo.add(q)
        frame
      } else {
        entries.put(q, persisted)
        if (entries.size > maxEntries) {
          val it = entries.entrySet().iterator()
          val eldest = it.next()
          eldest.getValue.unpersist()
          it.remove()
        }
        persisted
      }
    }
  }
}
