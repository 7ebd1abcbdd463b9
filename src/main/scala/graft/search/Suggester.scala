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

  /** "Did you mean" — the reference's `DirectSpellChecker` shape
    * (`lucene/suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java:37`):
    * dictionary terms within `maxEdits` Levenshtein distance of `word`,
    * ranked by (distance asc, df desc, term asc). One scan of the Zipf-small
    * term dictionary with Spark's codegen'd `levenshtein` — never the
    * postings; the length pre-filter (|len−|word|| ≤ maxEdits) prunes the
    * scan before the quadratic edit-distance kernel runs. */
  def spell(index: InvertedIndex, word: String, k: Int, maxEdits: Int = 2): DataFrame =
    index.termStats
      .filter(abs(length(col("term")) - lit(word.length)) <= maxEdits &&
        col("term") =!= word)
      .withColumn("dist", levenshtein(col("term"), lit(word)))
      .filter(col("dist") <= maxEdits)
      .select(col("term"), col("dist").cast("long").as("dist"),
        col("df").cast("long").as("weight"))
      .orderBy(asc("dist"), desc("weight"), asc("term"))
      .limit(k)

  /** Infix suggestions — the reference's `AnalyzingInfixSuggester` contract
    * (`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/AnalyzingInfixSuggester.java:82-100`):
    * a suggestion matches when the query is a PREFIX of any analyzed token
    * of its text (so the match may sit anywhere inside the suggestion),
    * ranked by weight descending. The reference materializes edge-ngrams of
    * every token into an auxiliary index; relationally the same contract is
    * one predicate over the token array (`exists(tokens, startswith)`), a
    * pushed scan + TakeOrdered — the auxiliary structure is the column.
    *
    * `suggestions` carries (`textCol`: suggestion text, `weightCol`). */
  /** Analyzed tokens of a column under the SimpleAnalyzer contract, joined
    * into the suggester KEY (the reference's analyzed-form FST key,
    * `AnalyzingSuggester.java:117-133`, with a single separator). */
  private def analyzedKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(filter(split(lower(c), "[^a-z0-9]+"), t => t =!= lit("")), " ")

  private def analyzeQuery(q: String): String =
    q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).mkString(" ")

  /** Analyzing completion — the reference's `AnalyzingSuggester`
    * (`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/AnalyzingSuggester.java:76`):
    * the ANALYZED query must be a prefix of the suggestion's ANALYZED key
    * (so completion crosses token boundaries and is case/punctuation
    * insensitive), ranked by weight; surface forms are returned. The
    * reference stores keys in an FST; relationally the key is a derived
    * column and lookup is one pushed prefix scan + TakeOrdered. */
  def analyzing(suggestions: DataFrame, textCol: String, weightCol: String,
                query: String, k: Int): DataFrame =
    suggestions
      .filter(analyzedKey(col(textCol)).startsWith(analyzeQuery(query)))
      .select(col(textCol).as("suggestion"), col(weightCol).cast("long").as("weight"))
      .orderBy(desc("weight"), asc("suggestion"))
      .limit(k)

  /** Fuzzy completion — the reference's `FuzzySuggester`
    * (`suggest/analyzing/FuzzySuggester.java:47-66` defaults: maxEdits=1,
    * an exact `nonFuzzyPrefix` of 1, and no fuzzing below
    * `minFuzzyLength`=3): the analyzed query may differ from the analyzed
    * key's same-length prefix by ≤ maxEdits, first char exact. */
  def fuzzy(suggestions: DataFrame, textCol: String, weightCol: String,
            query: String, k: Int, maxEdits: Int = 1,
            nonFuzzyPrefix: Int = 1, minFuzzyLength: Int = 3): DataFrame = {
    val q = analyzeQuery(query)
    if (q.length < minFuzzyLength) return analyzing(suggestions, textCol, weightCol, query, k)
    val key = analyzedKey(col(textCol))
    suggestions
      .filter(substring(key, 1, nonFuzzyPrefix) === q.substring(0, nonFuzzyPrefix) &&
        levenshtein(substring(key, 1, q.length), lit(q)) <= maxEdits)
      .select(col(textCol).as("suggestion"), col(weightCol).cast("long").as("weight"))
      .orderBy(desc("weight"), asc("suggestion"))
      .limit(k)
  }

  def infix(suggestions: DataFrame, textCol: String, weightCol: String,
            query: String, k: Int): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= lit(""))
    suggestions
      .filter(exists(toks, t => t.startsWith(lit(query))))
      .select(col(textCol).as("suggestion"), col(weightCol).cast("long").as("weight"))
      .orderBy(desc("weight"), asc("suggestion"))
      .limit(k)
  }
}
