package graft

import graft.core.DelimitedPayloadAnalyzer
import graft.search.{Payloads, ScoringMode, Searcher, TermQuery}
import graft.index.{IndexBuilder, IndexConfig, InputDoc}
import org.scalatest.funsuite.AnyFunSuite

/** Payload side table + PayloadScoreQuery analogs ([[Payloads]]): the
  * delimited parse, the four PayloadFunctions, includeSpanScore composition,
  * and the searchable-index analyzer stripping. */
class PayloadsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "apple|2.0 banana|1.0 apple|5.0"),
    (1L, "apple|3.5 cherry|4.0"),
    (2L, "banana|7.0 banana"), // second banana has no payload
    (3L, "cherry|0.5"),
    (4L, "banana plain")) // NO payloads at all: still a span match, score 1

  private lazy val payloads =
    Payloads.build(corpus.toDF("docId", "text")).cache()

  private def scores(term: String, fn: Payloads.PayloadFunction): Map[Long, Double] =
    Payloads.payloadScore(payloads, term, fn)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("delimited parse: term/pos/payload, null payload when undelimited") {
    val rows = payloads.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Float])))
    assert(rows.contains((0L, "apple", 0, Some(2.0f))))
    assert(rows.contains((0L, "apple", 2, Some(5.0f))))
    assert(rows.contains((2L, "banana", 1, None)))
  }

  test("sum/avg/min/max payload functions") {
    assert(scores("apple", Payloads.SumPayload) == Map(0L -> 7.0, 1L -> 3.5))
    assert(scores("apple", Payloads.AvgPayload) == Map(0L -> 3.5, 1L -> 3.5))
    assert(scores("apple", Payloads.MinPayload) == Map(0L -> 2.0, 1L -> 3.5))
    assert(scores("apple", Payloads.MaxPayload) == Map(0L -> 5.0, 1L -> 3.5))
    // doc 2's payload-less banana position contributes nothing (absent
    // payloads skip the function, like the reference's null payload check);
    // doc 4 has NO payloads anywhere yet still matches, at the functions'
    // zero-payload docScore of 1 (SumPayloadFunction.docScore:39)
    assert(scores("banana", Payloads.SumPayload) ==
      Map(0L -> 1.0, 2L -> 7.0, 4L -> 1.0))
    assert(scores("banana", Payloads.AvgPayload) ==
      Map(0L -> 1.0, 2L -> 7.0, 4L -> 1.0))
  }

  test("includeSpanScore multiplies the wrapped query's score") {
    val dir = java.nio.file.Files.createTempDirectory("graft-payload-").toString
    val idx = IndexBuilder.build(
      corpus.toDF("docId", "text").as[InputDoc],
      dir, IndexConfig(DelimitedPayloadAnalyzer(), withPositions = true))
    val searcher = new Searcher(idx, ScoringMode.PreciseBM25())
    val wrapped = searcher.scored(TermQuery("apple"))
    val bm25 = wrapped.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Payloads.payloadScore(payloads, "apple", Payloads.SumPayload, Some(wrapped))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(math.abs(got(0L) - 7.0 * bm25(0L)) < 1e-12)
    assert(math.abs(got(1L) - 3.5 * bm25(1L)) < 1e-12)
  }

  test("DelimitedPayloadAnalyzer strips the payload suffix for indexing") {
    val a = DelimitedPayloadAnalyzer()
    assert(a.tokenize("Apple|2.0 banana cherry|1").map(_.term) ==
      Seq("apple", "banana", "cherry"))
    assert(a.tokenize("Apple|2.0 banana cherry|1").map(_.position) == Seq(0, 1, 2))
  }
}
