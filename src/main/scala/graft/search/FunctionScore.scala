package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Custom scoring formulas over query scores and document fields — the
  * reference's expressions module + function-score query
  * (`lucene/expressions/src/java/org/apache/lucene/expressions/Expression.java:59`
  * compiles a formula against `Bindings` where `_score` is the query score
  * and other names bind to doc values;
  * `lucene/queries/src/java/org/apache/lucene/queries/function/FunctionScoreQuery.java:41`
  * replaces a query's score with such a source).
  *
  * Spark-first compilation: the formula is a SQL expression string handed to
  * Catalyst (`expr(...)`) — the analog of `JavascriptCompiler.compile`, except
  * the "bytecode" is whole-stage-codegen'd alongside the rest of the plan
  * instead of an ASM-generated class invoked per doc. `_score` binds to the
  * incoming query score; every corpus column binds by name. */
object FunctionScore {

  /** @param matched  `(docId, score)` frame from [[Searcher]]
    * @param corpus   table carrying the bindable fields, keyed by `docIdCol`
    * @param formula  SQL expression over `_score` and corpus columns
    * @return `(docId, score)` with `score` replaced by the formula value
    */
  def functionScore(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                    formula: String): DataFrame = {
    val fields = matched
      .join(corpus.withColumnRenamed(docIdCol, "joinId"), col("docId") === col("joinId"))
      .withColumnRenamed("score", "_score")
    fields
      .withColumn("score", expr(formula).cast("double"))
      .select((col("docId") +: col("score") +:
        corpus.columns.filter(_ != docIdCol).map(c => col(c))): _*)
  }

  /** `FunctionScoreQuery.boostByValue` shape: multiply the query score by a
    * field-derived factor. */
  def boostByValue(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                   factor: String): DataFrame =
    functionScore(matched, corpus, docIdCol, s"_score * ($factor)")
}
