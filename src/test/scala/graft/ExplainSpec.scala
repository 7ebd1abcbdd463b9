package graft

import graft.search._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Searcher.explain]] — IndexSearcher.explain analog: leaf rows sum (or
  * max) to exactly the scored() value; non-scoring clauses are absent. */
class ExplainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  private lazy val searcher = new Searcher(SparkTestEnv.index, ScoringMode.PreciseBM25())

  private def rowsOf(q: Query, d: Long): Map[String, (String, Double)] =
    searcher.explain(q, d).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap

  private def firstMatch(q: Query): Long =
    searcher.scored(q).agg(min("docId")).head().getLong(0)

  test("boolean MUST: leaves sum to the total; breakdown matches per-term scored()") {
    val q = BooleanQuery.must(TermQuery("spark"), TermQuery("data"))
    val d = firstMatch(q)
    val rows = rowsOf(q, d)
    assert(rows.keySet == Set("spark", "data", "total"))
    assert(rows("spark")._1 == "MUST" && rows("total")._1 == "TOTAL")
    assert(math.abs(rows("spark")._2 + rows("data")._2 - rows("total")._2) < 1e-9)
    val sp = searcher.scored(TermQuery("spark")).filter(col("docId") === d)
      .head().getDouble(1)
    assert(math.abs(rows("spark")._2 - sp) < 1e-9)
  }

  test("boost scales the leaf; filter clause contributes no row") {
    val q = BooleanQuery(Seq(
      Occur.MUST -> BoostQuery(TermQuery("spark"), 3.0f),
      Occur.FILTER -> TermQuery("data")))
    val d = firstMatch(q)
    val rows = rowsOf(q, d)
    assert(rows.keySet == Set("spark", "total")) // the filter term is non-scoring
    assert(math.abs(rows("spark")._2 - rows("total")._2) < 1e-9)
    val unboosted = searcher.scored(TermQuery("spark")).filter(col("docId") === d)
      .head().getDouble(1)
    assert(math.abs(rows("spark")._2 - 3.0 * unboosted) < 1e-9)
  }

  test("a leaf that does not match the doc is absent (noMatch)") {
    val q = BooleanQuery(Seq(
      Occur.SHOULD -> TermQuery("spark"), Occur.SHOULD -> TermQuery("dup")))
    // a doc with 'spark' but without 'dup'
    val dupDocs = searcher.scored(TermQuery("dup")).collect().map(_.getLong(0)).toSet
    val d = searcher.scored(TermQuery("spark")).collect().map(_.getLong(0))
      .filterNot(dupDocs).min
    val rows = rowsOf(q, d)
    assert(rows.keySet == Set("spark", "total"))
    assert(math.abs(rows("spark")._2 - rows("total")._2) < 1e-9)
  }
}
