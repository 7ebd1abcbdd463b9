package graft

import graft.search._
import org.scalatest.funsuite.AnyFunSuite

/** IndexOrDocValuesQuery: the cost-based plan choice must (a) actually pick
  * different plans under opposite cost profiles and (b) be invisible in the
  * results — both plans ≡ the plain MUST+FILTER boolean. */
class IndexOrDocValuesSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val searcher = new Searcher(index, ScoringMode.PreciseBM25())

  private def docsOf(q: Query): Map[Long, Double] =
    searcher.scored(q).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** The rarest term in the corpus dictionary (df = 1 if any) and a head
    * term, picked from live stats so the test tracks the synthetic corpus. */
  private lazy val (rareTerm, headTerm) = {
    val byDf = corpus.values.flatten.map(_.term).toSeq
      .groupBy(identity).map { case (t, xs) =>
        t -> corpus.count(_._2.exists(_.term == t))
      }.toSeq
    (byDf.minBy(p => (p._2, p._1))._1, byDf.maxBy(p => (p._2, p._1.length * -1))._1)
  }

  test("opposite cost profiles choose opposite plans") {
    // rare scoring lead vs the wide [a TO z] filter -> candidates verify
    assert(searcher.iodvPlan(TermQuery(rareTerm),
      TermRangeQuery(Some("a"), Some("zzzz"))) == "docvalues")
    // head scoring lead vs a filter matching almost nothing -> index scan
    assert(searcher.iodvPlan(TermQuery(headTerm),
      PrefixQuery("zzzznope")) == "index")
  }

  test("docvalues plan result == boolean MUST+FILTER result") {
    val filter = TermRangeQuery(Some("a"), Some("zzzz"))
    assert(searcher.iodvPlan(TermQuery(rareTerm), filter) == "docvalues")
    val got = docsOf(IndexOrDocValuesQuery(TermQuery(rareTerm), filter))
    val ref = docsOf(BooleanQuery(Seq(
      Occur.MUST -> TermQuery(rareTerm), Occur.FILTER -> filter)))
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("index plan result == boolean MUST+FILTER result") {
    val filter = PrefixQuery("st")
    // 'spark' df is well above the handful of st-prefixed dictionary terms?
    // not necessarily — just pin whatever plan fires and compare results
    val got = docsOf(IndexOrDocValuesQuery(TermQuery("spark"), filter))
    val ref = docsOf(BooleanQuery(Seq(
      Occur.MUST -> TermQuery("spark"), Occur.FILTER -> filter)))
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("empty filter or dead scoring side short-circuits to no docs") {
    assert(docsOf(IndexOrDocValuesQuery(TermQuery("spark"), PrefixQuery("zzzzzz"))).isEmpty)
    assert(docsOf(IndexOrDocValuesQuery(TermQuery("zzz_absent_zzz"),
      PrefixQuery("st"))).isEmpty)
  }
}
