package graft

import graft.core.{SimpleAnalyzer, EnglishAnalyzer}
import graft.index.{IndexBuilder, IndexConfig, InvertedIndex, Deletes}
import graft.search.{Searcher, TermQuery, ScoringMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[IndexBuilder.addIndexes]] — index-level segment adoption
  * (IndexWriter.addIndexes(Directory...) analog): scoring equivalence with a
  * one-shot build, snapshot isolation, tombstone carry-over, and the two
  * validation guards. */
class AddIndexesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  import spark.implicits._

  private def docs(pred: Long => Boolean) =
    spark.read.parquet(s"${SparkTestEnv.sfDir}/documents.parquet")
      .select(col("doc_id").as("docId"), col("text")).as[graft.index.InputDoc]
      .filter((d: graft.index.InputDoc) => pred(d.docId))

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-addidx-$tag-").toString

  test("adopted index scores exactly like the one-shot full build") {
    val dirA = freshDir("a"); val dirB = freshDir("b")
    IndexBuilder.build(docs(_ % 2 == 0), dirA, IndexConfig(SimpleAnalyzer, withPositions = true))
    IndexBuilder.build(docs(_ % 2 == 1), dirB, IndexConfig(SimpleAnalyzer, withPositions = true))
    val preVersion = graft.index.Snapshots.latest(dirA).map(_.version).getOrElse(0)
    IndexBuilder.addIndexes(spark, dirA, InvertedIndex.open(spark, dirB))
    val combined = new Searcher(InvertedIndex.open(spark, dirA), ScoringMode.PreciseBM25())
    val full = new Searcher(SparkTestEnv.index, ScoringMode.PreciseBM25())
    for (t <- Seq("spark", "merge", "dup")) {
      val got = combined.scored(TermQuery(t)).orderBy("docId")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = full.scored(TermQuery(t)).orderBy("docId")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"term $t")
    }
    // snapshot isolation: the pre-adoption version still sees only evens
    val pinned = new Searcher(InvertedIndex.open(spark, dirA, Some(preVersion)),
      ScoringMode.PreciseBM25())
    val ids = pinned.scored(TermQuery("spark")).collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ % 2 == 0))
    // segment identity stays unique after relocation
    val segs = InvertedIndex.open(spark, dirA).segments.select("segmentId").collect().map(_.getLong(0))
    assert(segs.distinct.length == segs.length)
  }

  test("pending source tombstones carry over") {
    val dirA = freshDir("ta"); val dirB = freshDir("tb")
    IndexBuilder.build(docs(_ % 2 == 0), dirA, IndexConfig(SimpleAnalyzer, withPositions = true))
    IndexBuilder.build(docs(_ % 2 == 1), dirB, IndexConfig(SimpleAnalyzer, withPositions = true))
    val victim = 7L // odd: lives in the source index
    Deletes.tombstone(spark, dirB, Seq(java.lang.Long.valueOf(victim)).toDS())
    IndexBuilder.addIndexes(spark, dirA, InvertedIndex.open(spark, dirB))
    val combined = new Searcher(InvertedIndex.open(spark, dirA), ScoringMode.PreciseBM25())
    val ids = combined.scored(TermQuery("spark")).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(victim) && ids.exists(_ % 2 == 1))
  }

  test("guards: analyzer mismatch and overlapping doc ids are rejected") {
    val dirA = freshDir("ga"); val dirB = freshDir("gb"); val dirC = freshDir("gc")
    IndexBuilder.build(docs(_ < 100), dirA, IndexConfig(SimpleAnalyzer, withPositions = true))
    IndexBuilder.build(docs(_ < 50), dirB, IndexConfig(EnglishAnalyzer(), withPositions = true))
    IndexBuilder.build(docs(_ < 50), dirC, IndexConfig(SimpleAnalyzer, withPositions = true))
    intercept[IllegalArgumentException] {
      IndexBuilder.addIndexes(spark, dirA, InvertedIndex.open(spark, dirB))
    }
    intercept[IllegalArgumentException] {
      IndexBuilder.addIndexes(spark, dirA, InvertedIndex.open(spark, dirC))
    }
  }
}
