package graft.search

/** Logical query AST — the operator surface of the reference's `Query`
  * hierarchy (SURVEY.md §2.4/§2.5), minus execution details: compilation to
  * DataFrame plans happens in [[Searcher]].
  */
sealed trait Query

/** Exact term match, scored. Reference: `lucene/core/src/java/org/apache/lucene/search/TermQuery.java:39`. */
final case class TermQuery(term: String) extends Query

/** Several terms scored as if they were one term (summed tf, max df).
  * Reference: `lucene/core/src/java/org/apache/lucene/search/SynonymQuery.java:54`. */
final case class SynonymQuery(terms: Seq[String]) extends Query

/** Consecutive-position phrase (slop 0 = exact). Reference:
  * `lucene/core/src/java/org/apache/lucene/search/PhraseQuery.java:71`. */
final case class PhraseQuery(terms: Seq[String], slop: Int = 0) extends Query

/** Phrase with term alternatives per position. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/MultiPhraseQuery.java:54`. */
final case class MultiPhraseQuery(positions: Seq[Seq[String]]) extends Query

object Occur extends Enumeration {
  val MUST, SHOULD, MUST_NOT, FILTER = Value
}

/** Boolean composition. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/BooleanQuery.java:45-167`. */
final case class BooleanQuery(
    clauses: Seq[(Occur.Value, Query)],
    minimumShouldMatch: Int = 0) extends Query

object BooleanQuery {
  def must(qs: Query*): BooleanQuery = BooleanQuery(qs.map(Occur.MUST -> _))
  def should(qs: Query*): BooleanQuery = BooleanQuery(qs.map(Occur.SHOULD -> _))
}

/** Terms with the given prefix (constant-score rewrite). Reference:
  * `lucene/core/src/java/org/apache/lucene/search/PrefixQuery.java:29`. */
final case class PrefixQuery(prefix: String) extends Query

/** Terms in lexicographic range. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/TermRangeQuery.java:37`. */
final case class TermRangeQuery(
    lower: Option[String], upper: Option[String],
    includeLower: Boolean = true, includeUpper: Boolean = true) extends Query

/** Docs containing any of a term set (semi-join). Reference:
  * `lucene/core/src/java/org/apache/lucene/search/TermInSetQuery.java:73`. */
final case class TermInSetQuery(terms: Set[String]) extends Query

/** Terms within Levenshtein distance maxEdits. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java:52`. */
final case class FuzzyQuery(term: String, maxEdits: Int = 2) extends Query

/** Scored fuzzy match — the reference's DEFAULT fuzzy rewrite
  * (`lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java:60-61`
  * `TopTermsBlendedFreqScoringRewrite`, `TopTermsRewrite.java:36`,
  * `BlendedTermQuery.java:47`): expand to the dictionary terms within
  * `maxEdits`, keep the top `maxExpansions` by docFreq, blend df to the max
  * of the kept set, score each term BM25 × the edit-similarity boost
  * `1 − dist/min(|term|, |query|)` (`FuzzyTermsEnum`'s boost attribute) and
  * sum per doc. [[FuzzyQuery]] stays the CONSTANT_SCORE variant. */
final case class ScoredFuzzyQuery(term: String, maxEdits: Int = 2,
                                  maxExpansions: Int = 50) extends Query

/** SCORED prefix expansion — `PrefixQuery` under the reference's
  * `TopTermsScoringBooleanQueryRewrite` (`MultiTermQuery.java:38-83`,
  * `TopTermsRewrite.java:36`): the top `maxExpansions` matching terms by
  * docFreq become a SHOULD boolean of BM25-scored term queries, each with
  * its OWN statistics (no blending — that is the boolean-rewrite contract).
  * [[PrefixQuery]] stays the CONSTANT_SCORE default. */
final case class ScoredPrefixQuery(prefix: String, maxExpansions: Int = 50) extends Query

/** SCORED wildcard expansion — `WildcardQuery` under
  * `TopTermsScoringBooleanQueryRewrite`, like [[ScoredPrefixQuery]]. */
final case class ScoredWildcardQuery(pattern: String, maxExpansions: Int = 50) extends Query

/** Terms matching a regular expression. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/RegexpQuery.java:44`. */
final case class RegexpQuery(pattern: String) extends Query

/** Shell-style wildcard (`*`, `?`). Reference:
  * `lucene/core/src/java/org/apache/lucene/search/WildcardQuery.java:38`. */
final case class WildcardQuery(pattern: String) extends Query

/** Multiply the wrapped query's scores. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/BoostQuery.java:29`. */
final case class BoostQuery(query: Query, boost: Float) extends Query

/** Matches like the wrapped query, fixed score 1.0 (× boost). Reference:
  * `lucene/core/src/java/org/apache/lucene/search/ConstantScoreQuery.java:28`. */
final case class ConstantScoreQuery(query: Query) extends Query

/** OR taking max clause score + tieBreaker × sum of the rest. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/DisjunctionMaxQuery.java:44`. */
final case class DisjunctionMaxQuery(disjuncts: Seq[Query], tieBreaker: Float = 0f) extends Query

/** Positional proximity: all `terms` occur within a window of
  * `terms.size + slop` positions, optionally in order — the span algebra's
  * near operator, as a (constant-score) doc-set predicate. Reference:
  * `lucene/queries/src/java/org/apache/lucene/queries/spans/SpanNearQuery.java`,
  * `lucene/core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java:54`. */
final case class SpanNearQuery(terms: Seq[String], slop: Int, inOrder: Boolean) extends Query

/** Span-algebra query — SpanOr/SpanNot/SpanFirst/SpanContaining/SpanWithin
  * composed over a [[SpanSource]] tree, evaluated by lowering onto the
  * interval machinery ([[Spans.toIntervals]]; doc-level-exact, see
  * [[Spans]] scaladoc). Constant-score doc-set predicate like
  * [[SpanNearQuery]]/[[IntervalQuery]]. Reference:
  * `lucene/queries/src/java/org/apache/lucene/queries/spans/SpanQuery.java`. */
final case class SpanQuery(span: SpanSource) extends Query

/** Interval-algebra query: docs with ≥ 1 minimal interval matching `source`
  * (constant-score doc-set predicate; see [[IntervalsSource]]). Reference:
  * `lucene/queries/src/java/org/apache/lucene/queries/intervals/IntervalQuery.java:48`. */
final case class IntervalQuery(source: IntervalsSource) extends Query

/** Restrict `inner`'s matches to a doc-id range (inclusive). Because doc ids
  * are assigned in global url order, this is the sorted-index range query:
  * posting blocks are skipped on their (firstDoc, lastDoc) metadata before
  * decode — the analog of binary-searching a sort-ordered index. Reference:
  * `lucene/core/src/java/org/apache/lucene/search/IndexSortSortedNumericDocValuesRangeQuery.java:69`. */
final case class DocIdRangeQuery(inner: Query, lo: Long, hi: Long) extends Query

/** Cost-based two-plan filtered query — the reference's
  * `IndexOrDocValuesQuery`
  * (`lucene/core/src/java/org/apache/lucene/search/IndexOrDocValuesQuery.java:56`:
  * "wraps two queries that match the same documents" and picks per-segment
  * whichever is cheaper given the lead's cost). `scoring` is required and
  * scored; `filter` (an expansion query — prefix/range/set/fuzzy/regexp) is a
  * non-scoring FILTER evaluated by whichever plan the compile-time cost
  * estimate says is cheaper:
  *  - "index" plan: full expansion scan of the filter's postings, then
  *    semi-join — right when the filter is narrow;
  *  - "doc-values" plan: the scoring lead's doc set drives — the filter's
  *    posting blocks are skipped on [firstDoc,lastDoc] overlap with the lead
  *    and rows verified against it, the random-access-verify analog — right
  *    when the lead is rare and the filter wide. */
final case class IndexOrDocValuesQuery(scoring: Query, filter: Query) extends Query

/** All docs, score 1. Reference: `search/MatchAllDocsQuery.java:23`. */
case object MatchAllDocsQuery extends Query

/** No docs. Reference: `search/MatchNoDocsQuery.java:23`. */
case object MatchNoDocsQuery extends Query

object QueryRewriter {
  /** Logical rewrites mirroring the reference's `Query.rewrite` fixpoint
    * (`lucene/core/src/java/org/apache/lucene/search/BooleanQuery.java:269-351`,
    * `IndexSearcher.java:866-877`): empty boolean → MatchNoDocs, one-clause
    * unwrap, MatchNoDocs propagation, nested flattening, dedup of
    * FILTER/MUST_NOT clauses, wildcard→prefix/regexp lowering. */
  def rewrite(q: Query): Query = {
    val r = rewriteOnce(q)
    if (r == q) r else rewrite(r)
  }

  private def rewriteOnce(q: Query): Query = q match {
    case WildcardQuery(p) if !p.contains('?') && p.endsWith("*") &&
        !p.substring(0, p.length - 1).exists(c => c == '*' || c == '?') =>
      PrefixQuery(p.substring(0, p.length - 1))
    case WildcardQuery(p) =>
      RegexpQuery(p.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
        case c => c.toString
      })
    case PhraseQuery(Seq(t), _) => TermQuery(t)
    case SynonymQuery(Seq(t)) => TermQuery(t)
    case IndexOrDocValuesQuery(s0, f0) =>
      (rewriteOnce(s0), rewriteOnce(f0)) match {
        case (MatchNoDocsQuery, _) | (_, MatchNoDocsQuery) => MatchNoDocsQuery
        case (s1, f1) => IndexOrDocValuesQuery(s1, f1)
      }
    case BoostQuery(inner, b) if b == 1f => rewriteOnce(inner)
    case BoostQuery(inner, b) => BoostQuery(rewriteOnce(inner), b)
    case ConstantScoreQuery(inner) => ConstantScoreQuery(rewriteOnce(inner))
    case DisjunctionMaxQuery(Seq(d), _) => rewriteOnce(d)
    case DisjunctionMaxQuery(ds, t) => DisjunctionMaxQuery(ds.map(rewriteOnce), t)
    case BooleanQuery(clauses, msm) =>
      var cs = clauses.map { case (o, c) => (o, rewriteOnce(c)) }
      // MatchNoDocs in MUST/FILTER kills the query; in SHOULD/MUST_NOT it is dropped
      if (cs.exists { case (o, c) => c == MatchNoDocsQuery && (o == Occur.MUST || o == Occur.FILTER) })
        return MatchNoDocsQuery
      cs = cs.filterNot { case (o, c) => c == MatchNoDocsQuery && (o == Occur.SHOULD || o == Occur.MUST_NOT) }
      // dedup non-scoring clauses
      cs = cs.distinct
      if (cs.isEmpty) MatchNoDocsQuery
      else if (cs.size == 1 && msm <= 1) cs.head match {
        case (Occur.MUST, c) => c
        case (Occur.SHOULD, c) => c
        case (Occur.FILTER, c) => ConstantScoreQuery(c)
        case (Occur.MUST_NOT, _) => MatchNoDocsQuery // pure negation matches nothing
      }
      else BooleanQuery(cs, msm)
    case other => other
  }
}
