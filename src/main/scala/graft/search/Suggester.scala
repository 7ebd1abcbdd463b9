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
