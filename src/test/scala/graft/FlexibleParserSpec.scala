package graft

import graft.core.SimpleAnalyzer
import graft.index.{IndexBuilder, IndexConfig, InputDoc, InvertedIndex}
import graft.search.{FlexibleParser, ScoringMode, Searcher, TermQuery}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Flexible/standard parser subset ([[FlexibleParser]]): per-leaf
  * multi-field expansion equals the hand-assembled per-field frames, and
  * the single-field case degenerates to the plain Searcher. */
class FlexibleParserSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  import spark.implicits._

  private lazy val titleIndex: InvertedIndex = {
    val dir = java.nio.file.Files.createTempDirectory("graft-flexttl-").toString
    val docs = spark.read.parquet(s"${SparkTestEnv.sfDir}/documents.parquet")
      .select(col("doc_id").as("docId"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        InputDoc(id, SimpleAnalyzer.tokenize(text).take(5).map(_.term).mkString(" "))
      }
    IndexBuilder.build(docs, dir, IndexConfig(SimpleAnalyzer, withPositions = false))
  }
  private lazy val body: InvertedIndex = SparkTestEnv.index
  private lazy val fields = Seq(titleIndex -> 2.0, body -> 1.0)

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** same doc set, scores equal up to summation-order float noise */
  private def assertSameScores(got: Map[Long, Double], want: Map[Long, Double]): Unit = {
    assert(got.keySet == want.keySet)
    val off = got.filter { case (d, s) =>
      math.abs(s - want(d)) > 1e-9 * math.max(1.0, math.abs(s))
    }
    assert(off.isEmpty, s"scores differ beyond tolerance: ${off.take(5)}")
  }

  private def leaf(term: String): Map[Long, Double] = {
    val t = new Searcher(titleIndex, ScoringMode.PreciseBM25()).scored(TermQuery(term))
      .select(col("docId"), (col("score") * 2.0).as("score"))
    val b = new Searcher(body, ScoringMode.PreciseBM25()).scored(TermQuery(term))
    rows(t.unionByName(b).groupBy("docId").agg(sum("score").as("score")))
  }

  test("must + should: per-leaf field expansion, should adds where present") {
    val got = rows(FlexibleParser.search(fields, "+spark data", SimpleAnalyzer))
    val spark_ = leaf("spark")
    val data_ = leaf("data")
    val want = spark_.map { case (d, s) => d -> (s + data_.getOrElse(d, 0.0)) }
    assertSameScores(got, want)
    assert(got.nonEmpty)
  }

  test("must_not excludes across ANY field") {
    val got = rows(FlexibleParser.search(fields, "spark -dup", SimpleAnalyzer))
    val dupDocs = leaf("dup").keySet
    assert(got.nonEmpty && got.keySet.intersect(dupDocs).isEmpty)
    val want = leaf("spark").filter { case (d, _) => !dupDocs.contains(d) }
    assertSameScores(got, want)
  }

  test("single field degenerates to the plain Searcher") {
    val got = rows(FlexibleParser.search(Seq(body -> 1.0), "spark", SimpleAnalyzer))
    val want = rows(new Searcher(body, ScoringMode.PreciseBM25()).scored(TermQuery("spark")))
    assertSameScores(got, want)
  }
}
