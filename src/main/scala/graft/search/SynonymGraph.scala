package graft.search

/** One synonym mapping: a consecutive-token input pattern and the alternative
  * token sequences it may be replaced by. Multi-token on either side is the
  * "graph" case the flat single-token [[SynonymQuery]] cannot express.
  * Reference: `lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/SynonymMap.java:38`
  * (rules parsed from `a b => x` / `a, b c` lines into an FST keyed by the
  * input token sequence). */
final case class SynonymRule(input: Seq[String], outputs: Seq[Seq[String]])

/** Multi-word (graph) synonym expansion, done at QUERY time.
  *
  * The reference's `SynonymGraphFilter`
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/SynonymGraphFilter.java:78`)
  * injects synonym side-paths into the token graph, and `QueryBuilder`
  * (`lucene/core/src/java/org/apache/lucene/util/QueryBuilder.java:560`,
  * `analyzeGraphBoolean`) then compiles the graph: articulation points split
  * the graph into independent spans, each span's alternative paths become a
  * disjunction — `SynonymQuery` when every path is a single token, otherwise
  * a SHOULD boolean of term/phrase queries — and spans combine under the
  * outer operator. The reference itself documents query-time expansion as the
  * default mode (index-time graph injection breaks positions for phrases), so
  * this module implements exactly that compilation as a pure [[Query]]
  * rewrite: no new execution machinery, the expanded tree runs on the
  * existing term/phrase/boolean scans and inherits their pruned plans.
  *
  * Matching is greedy longest-input-first at each position, the FST's
  * leftmost-longest rule (`SynonymGraphFilter.java:36-44` "greedily matches
  * the longest rule"). Overlapping matches after a consumed span re-start at
  * the next unconsumed token, also the reference's behavior.
  */
object SynonymGraph {

  /** Expand analyzed query `tokens` against `rules` into a [[Query]]:
    * each matched span becomes the disjunction of (original tokens) and every
    * rule output; unmatched tokens stay [[TermQuery]]; spans conjoin with
    * `occur` (MUST = all spans required, the QueryBuilder AND-operator mode;
    * SHOULD = any span, the OR mode). */
  def expand(tokens: Seq[String], rules: Seq[SynonymRule],
             occur: Occur.Value = Occur.MUST): Query = {
    require(occur == Occur.MUST || occur == Occur.SHOULD,
      s"span operator must be MUST or SHOULD, got $occur")
    val byFirst: Map[String, Seq[SynonymRule]] =
      rules.groupBy(_.input.head).map { case (k, rs) =>
        // longest-input-first so the greedy scan is leftmost-longest
        k -> rs.sortBy(-_.input.size)
      }
    val spans = scala.collection.mutable.ArrayBuffer.empty[Query]
    var i = 0
    while (i < tokens.length) {
      val hit = byFirst.getOrElse(tokens(i), Nil).find { r =>
        r.input.size <= tokens.length - i &&
          tokens.slice(i, i + r.input.size) == r.input
      }
      hit match {
        case Some(rule) =>
          val alts = (rule.input +: rule.outputs).distinct.map(pathQuery)
          spans += (
            if (alts.forall(_.isInstanceOf[TermQuery]))
              SynonymQuery(alts.map(_.asInstanceOf[TermQuery].term))
            else BooleanQuery(alts.map(Occur.SHOULD -> _))
          )
          i += rule.input.size
        case None =>
          spans += TermQuery(tokens(i))
          i += 1
      }
    }
    if (spans.isEmpty) MatchNoDocsQuery
    else if (spans.size == 1) spans.head
    else BooleanQuery(spans.toSeq.map(occur -> _))
  }

  /** One alternative path: a term for single tokens, an exact phrase for
    * multi-token paths (`QueryBuilder.analyzeGraphPhrase` reduces each path
    * to a PhraseQuery over its tokens). */
  private def pathQuery(path: Seq[String]): Query =
    if (path.size == 1) TermQuery(path.head) else PhraseQuery(path)
}
