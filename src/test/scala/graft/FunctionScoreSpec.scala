package graft

import graft.search.FunctionScore
import org.scalatest.funsuite.AnyFunSuite

/** [[FunctionScore]] — the expressions/FunctionScoreQuery analog: `_score`
  * binds to the query score, corpus columns bind by name, the formula is
  * Catalyst-compiled. */
class FunctionScoreSpec extends AnyFunSuite {

  test("formula binds _score and corpus fields; reorders the ranking") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    val matched = Seq((1L, 2.0), (2L, 1.0), (3L, 0.5)).toDF("docId", "score")
    val corpus = Seq((1L, 1.0), (2L, 10.0), (3L, 100.0)).toDF("doc_id", "boost")
    val got = FunctionScore.functionScore(matched, corpus, "doc_id", "_score * boost")
      .orderBy(org.apache.spark.sql.functions.desc("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // 3: 0.5*100=50, 2: 1*10=10, 1: 2*1=2 — the field flips the BM25 order
    assert(got == Seq((3L, 50.0), (2L, 10.0), (1L, 2.0)))
  }

  test("boostByValue multiplies; non-multiplicative formulas also compile") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    val matched = Seq((1L, 2.0), (2L, 4.0)).toDF("docId", "score")
    val corpus = Seq((1L, 3.0), (2L, 0.0)).toDF("doc_id", "w")
    val mult = FunctionScore.boostByValue(matched, corpus, "doc_id", "1.0 + w")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(mult == Map(1L -> 8.0, 2L -> 4.0))
    val add = FunctionScore.functionScore(matched, corpus, "doc_id", "_score + sqrt(w) * 10")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(add(1L) - (2.0 + math.sqrt(3.0) * 10)) < 1e-12 && add(2L) == 4.0)
  }
}
