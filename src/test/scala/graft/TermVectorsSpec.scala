package graft

import graft.index.TermVectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TermVectors]] (doc-major postings transpose) vs the analyzer ground
  * truth, and the term-vector-seeded MoreLikeThis path vs the re-analysis
  * path. */
class TermVectorsSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val tvec = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvec-spec-").toString
    TermVectors.build(index, dir)
  }

  test("a doc's vector equals its analyzed term frequencies and positions") {
    val docIds = Seq(0L, 7L, 42L)
    docIds.foreach { id =>
      val toks = corpus(id)
      val wantFreqs = toks.groupBy(_.term).view.mapValues(_.size).toMap
      val wantPos = toks.groupBy(_.term).view
        .mapValues(_.map(_.position).sorted.toVector).toMap
      val got = TermVectors.vector(tvec, id).collect()
      assert(got.map(_.getString(0)).toSet == wantFreqs.keySet, s"doc $id terms")
      got.foreach { r =>
        val t = r.getString(0)
        assert(r.getInt(1) == wantFreqs(t), s"doc $id freq($t)")
        assert(r.getSeq[Int](2).toVector == wantPos(t), s"doc $id positions($t)")
      }
    }
  }

  test("vector lookup is doc-pruned and term-sorted") {
    val terms = TermVectors.vector(tvec, 3L).collect().map(_.getString(0))
    assert(terms.sameElements(terms.sorted))
    assert(tvec.filter(col("docId") === 3L).count() == terms.length)
  }

  test("MoreLikeThis by doc id (term-vector seed) equals MLT by re-analyzed text") {
    val searcher = Indexes.searcher(spark, sfDir)
    val text = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val byText = searcher.moreLikeThis(text, 5, 10, excludeDocId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val byDoc = searcher.moreLikeThisByDoc(tvec, 0L, 5, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(byDoc == byText)
  }
}
