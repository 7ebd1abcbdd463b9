package graft.search

import graft.index.InvertedIndex
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-position payloads — the `DelimitedPayloadTokenFilter` +
  * `PayloadScoreQuery` family
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/payloads/DelimitedPayloadTokenFilter.java:33`,
  * `lucene/queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java:43`)
  * re-expressed relationally: the reference smuggles a per-position byte[]
  * through the postings writer; here the payload stream is its own columnar
  * side table `(docId, term, pos, payload)` built by ONE pure-Catalyst pass
  * over the documents (posexplode + split — codegen'd, no UDF), the same
  * side-table shape as [[graft.index.TermVectors]]. A payload-scored query
  * is then a pushed term filter + one map-side-combined aggregation.
  *
  * Scale shape: the build is a single projection (scales with input); a
  * query reads one term's rows via the pushed `term =` predicate and
  * aggregates — no joins unless `includeSpanScore` composes the BM25 frame.
  */
object Payloads {

  /** PayloadFunction analogs (`SumPayloadFunction`, `AveragePayloadFunction`,
    * `MinPayloadFunction`, `MaxPayloadFunction`): docScore = f(payloads at
    * matching positions). */
  sealed trait PayloadFunction { def agg(c: Column): Column }
  case object SumPayload extends PayloadFunction { def agg(c: Column): Column = sum(c) }
  case object AvgPayload extends PayloadFunction { def agg(c: Column): Column = avg(c) }
  case object MinPayload extends PayloadFunction { def agg(c: Column): Column = min(c) }
  case object MaxPayload extends PayloadFunction { def agg(c: Column): Column = max(c) }

  /** The DelimitedPayload pass: whitespace tokens `term|payload` become rows
    * `(docId, term, pos, payload)` with the float decoder's semantics
    * (`PayloadDecoder.FLOAT_DECODER`); tokens without a delimiter carry a
    * null payload, like the reference's absent-payload positions. */
  def build(docs: DataFrame, delimiter: String = "\\|"): DataFrame =
    docs.select(col("docId"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .select(col("docId"),
        lower(element_at(split(col("tok"), delimiter), 1)).as("term"),
        col("pos"),
        try_element_at(split(col("tok"), delimiter), lit(2))
          .cast("float").as("payload"))

  /** `PayloadScoreQuery(SpanTermQuery(term), fn, FLOAT_DECODER,
    * includeSpanScore)`: matching is SPAN-driven — every doc containing the
    * term matches, and a doc whose occurrences all lack payloads scores the
    * functions' zero-payload default of 1
    * (`SumPayloadFunction.docScore:39` et al.). When `spanScore` is given
    * (a Searcher frame over the same docs), the payload score multiplies the
    * wrapped query's score, the includeSpanScore=true mode. */
  def payloadScore(payloads: DataFrame, term: String, fn: PayloadFunction,
                   spanScore: Option[DataFrame] = None): DataFrame = {
    // count(payload) counts non-null payloads only; zero seen -> docScore 1
    val base = payloads
      .filter(col("term") === lit(term))
      .groupBy("docId")
      .agg(fn.agg(col("payload")).cast("double").as("raw"),
        count(col("payload")).as("npay"))
      .select(col("docId"),
        when(col("npay") > 0, col("raw")).otherwise(lit(1.0)).as("pscore"))
    spanScore match {
      case None => base.withColumnRenamed("pscore", "score")
      case Some(wrapped) =>
        wrapped.join(base, Seq("docId"), "left_outer")
          .select(col("docId"),
            (coalesce(col("pscore"), lit(1.0)) * col("score")).as("score"))
    }
  }
}
