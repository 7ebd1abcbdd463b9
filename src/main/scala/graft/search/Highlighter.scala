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

  // --------------------------------------------------- passage scoring (UH)

  /** Passage pivot in TOKENS — the reference's `PassageScorer` pivot of 87
    * CHARS ("some rough idea of average sentence length") re-based to tokens
    * (~5.4 chars/token incl. separator ⇒ ≈ 16). */
  private val Pivot = 16.0
  private val K1 = 1.2
  private val B = 0.75

  /** Passage-scoring highlighter — the reference `UnifiedHighlighter`'s
    * `PassageScorer` formulas
    * (`lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/PassageScorer.java:80-138`):
    * per-passage score = norm(start) × Σ over distinct matched terms of
    * tf(freqInPassage, passageLen) × weight(contentLength, freqInDoc), with
    *  - weight = (k1+1) · ln(1 + (1 + contentLength/pivot + 0.5)/(freqInDoc + 0.5))
    *  - tf     = fp / (fp + k1·((1−b) + b·passageLen/pivot))
    *  - norm   = 1 + 1/ln(pivot + passageStart)
    * — every statistic DOC-LOCAL (the reference approximates numDocs from
    * content length precisely so no index stats are needed).
    *
    * Two deviations, both deterministic and documented: passages are fixed
    * `window`-token slabs (`pos / window`) instead of BreakIterator
    * sentences (the reference's `DefaultPassageFormatter` contract allows any
    * passage supplier), and lengths/offsets count TOKENS, not chars, so an
    * external SQL engine can reproduce scores byte-for-byte from the token
    * stream. Returns each matching doc's single BEST passage (highest score,
    * ties → earliest), its slab index, score, and `<b>`-marked snippet.
    * Per-row map only — no shuffle, scales linearly with the corpus. */
  def passages(docs: DataFrame, idCol: String, textCol: String,
               terms: Set[String], window: Int,
               analyzer: graft.core.Analyzer = graft.core.SimpleAnalyzer): DataFrame = {
    require(window > 0)
    val psUdf = udf((text: String) => {
      val toks = analyzer.tokenize(text).map(_.term).toArray
      val dl = toks.length
      if (dl == 0) null
      else {
        val freqInDoc = scala.collection.mutable.HashMap.empty[String, Int]
        toks.foreach(t => if (terms.contains(t)) freqInDoc(t) = freqInDoc.getOrElse(t, 0) + 1)
        if (freqInDoc.isEmpty) null
        else {
          var bestPid = -1
          var bestScore = 0.0
          var pid = 0
          while (pid * window < dl) {
            val start = pid * window
            val plen = math.min(window, dl - start)
            val fp = scala.collection.mutable.HashMap.empty[String, Int]
            var i = start
            while (i < start + plen) {
              if (terms.contains(toks(i))) fp(toks(i)) = fp.getOrElse(toks(i), 0) + 1
              i += 1
            }
            if (fp.nonEmpty) {
              var s = 0.0
              fp.foreach { case (t, f) =>
                val weight = (K1 + 1) * math.log(1 + (1 + dl / Pivot + 0.5) / (freqInDoc(t) + 0.5))
                val tf = f / (f + K1 * ((1 - B) + B * plen / Pivot))
                s += tf * weight
              }
              s *= 1 + 1 / math.log(Pivot + start)
              if (s > bestScore) { bestScore = s; bestPid = pid } // ties keep earliest
            }
            pid += 1
          }
          val start = bestPid * window
          val snippet = toks.slice(start, math.min(start + window, dl))
            .map(t => if (terms.contains(t)) s"<b>$t</b>" else t)
            .mkString(" ")
          (bestPid.toLong, bestScore, snippet)
        }
      }
    })
    docs.select(col(idCol), psUdf(col(textCol)).as("p"))
      .filter(col("p").isNotNull)
      .select(col(idCol), col("p._1").as("passage"),
        col("p._2").as("score"), col("p._3").as("snippet"))
  }
}
