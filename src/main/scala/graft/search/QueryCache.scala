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

  /** Record a use of `q` in the ring of recent filters
    * (`UsageTrackingQueryCachingPolicy.onUse`). */
  def onUse(q: Query): Unit = synchronized {
    recent.addLast(q)
    if (recent.size > historySize) recent.removeFirst()
  }

  private def frequency(q: Query): Int = synchronized {
    var n = 0
    val it = recent.iterator()
    while (it.hasNext) if (it.next() == q) n += 1
    n
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

/** LRU cache of persisted filter frames, bounded by entry count. */
final class LRUQueryCache(
    maxEntries: Int = 64,
    val policy: UsageTrackingQueryCachingPolicy = new UsageTrackingQueryCachingPolicy()) {

  private val entries =
    new java.util.LinkedHashMap[Query, DataFrame](16, 0.75f, /*accessOrder=*/ true)

  private var hits = 0L
  private var misses = 0L

  def hitCount: Long = synchronized(hits)
  def missCount: Long = synchronized(misses)
  def cachedQueries: Set[Query] = synchronized {
    import scala.jdk.CollectionConverters._
    entries.keySet().asScala.toSet
  }

  /** The docId frame of FILTER query `q`: served from cache when present;
    * otherwise computed via `compute`, and — once the policy has seen
    * enough uses — persisted into the cluster cache and retained LRU
    * (evicted entries are unpersisted). */
  def filterDocs(q: Query, compute: () => DataFrame): DataFrame = synchronized {
    val hit = entries.get(q)
    if (hit != null) { hits += 1; return hit }
    misses += 1
    policy.onUse(q)
    val frame = compute()
    if (policy.shouldCache(q)) {
      val persisted = frame.persist()
      entries.put(q, persisted)
      if (entries.size > maxEntries) {
        val it = entries.entrySet().iterator()
        val eldest = it.next()
        eldest.getValue.unpersist()
        it.remove()
      }
      persisted
    } else frame
  }
}
