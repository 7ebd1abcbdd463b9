package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-term highlighting — the reference's highlighter contract
  * (`lucene/highlighter/src/java/org/apache/lucene/search/highlight/Highlighter.java:42`:
  * pick the best-scoring fragment, mark the query terms) re-expressed as a
  * deterministic token-window rule so an external SQL engine can reproduce it
  * byte-for-byte:
  *
  *  - fragments are token windows of `window` tokens starting AT a matched
  *    term (highlighters align fragments on hits);
  *  - the best fragment maximizes the count of query-term tokens in its
  *    window, ties broken by earliest position (the "best fragment" scorer of
  *    `QueryTermScorer` reduced to counts);
  *  - matched tokens are wrapped `<b>…</b>`, tokens joined by single spaces
  *    (the `SimpleHTMLFormatter` default tags).
  *
  * Works off the analyzed token stream (the reference's highlighter also
  * re-analyzes stored text); docs without any match are dropped.
  */
object Highlighter {

  def highlight(docs: DataFrame, idCol: String, textCol: String,
                terms: Set[String], window: Int,
                /** must match the analyzer of the index the query terms came
                  * from — stemmed/stopped/folded query terms only hit tokens
                  * produced by the SAME chain */
                analyzer: graft.core.Analyzer = graft.core.SimpleAnalyzer): DataFrame = {
    val hlUdf = udf((text: String) => {
      val toks = analyzer.tokenize(text).map(_.term).toArray
      var best = -1
      var bestScore = 0
      var p = 0
      while (p < toks.length) {
        if (terms.contains(toks(p))) {
          var s = 0
          var q = p
          val end = math.min(p + window, toks.length)
          while (q < end) { if (terms.contains(toks(q))) s += 1; q += 1 }
          if (s > bestScore) { bestScore = s; best = p } // ties keep earliest
        }
        p += 1
      }
      if (best < 0) null
      else toks.slice(best, math.min(best + window, toks.length))
        .map(t => if (terms.contains(t)) s"<b>$t</b>" else t)
        .mkString(" ")
    })
    docs.select(col(idCol), hlUdf(col(textCol)).as("snippet"))
      .filter(col("snippet").isNotNull)
  }
}
