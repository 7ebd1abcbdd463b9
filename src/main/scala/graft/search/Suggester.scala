package graft.search

import graft.index.InvertedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix completion — the reference's suggest module `Lookup` contract
  * (`lucene/suggest/src/java/org/apache/lucene/search/suggest/Lookup.java:36`):
  * given a key prefix, return the top-k completions by weight. The corpus
  * vocabulary with document frequency as weight is the
  * `DocumentDictionary`-over-the-index shape; relationally it is a pushed
  * prefix filter on the (already aggregated, Zipf-small) term dictionary
  * followed by a bounded top-k — no postings are touched.
  */
object Suggester {

  /** Top-k completions of `prefix` by (df desc, term asc). */
  def suggest(index: InvertedIndex, prefix: String, k: Int): DataFrame =
    index.termStats
      .filter(col("term").startsWith(prefix))
      .select(col("term"), col("df").cast("long").as("weight"))
      .orderBy(desc("weight"), asc("term"))
      .limit(k)
}
