package graft

import graft.core.SimpleAnalyzer
import graft.index.{IndexConfig, IndexSort}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[IndexSort]] — generalized index sorting (setIndexSort analog): dense
  * internal ids by global (sortKey, extId) order independent of input
  * partitioning; sorted top-k early-terminates; ranges become doc-id
  * ranges. */
class IndexSortSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  private lazy val docs = spark.read.parquet(s"${SparkTestEnv.sfDir}/documents.parquet")

  private lazy val built = {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxsort-").toString
    IndexSort.buildSorted(docs, "doc_id", "n_chars", "text", dir,
      IndexConfig(SimpleAnalyzer, withPositions = true))
  }

  test("internal ids are dense and follow (sortKey, extId) order; map is partitioning-independent") {
    val (_, smap) = built
    val rows = smap.orderBy("docId").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until rows.length))
    val keys = rows.map(r => (r._3, r._2)).toSeq
    assert(keys == keys.sorted)
    // rebuilding from a differently-partitioned input assigns identical ids
    val dir2 = java.nio.file.Files.createTempDirectory("graft-idxsort2-").toString
    val (_, smap2) = IndexSort.buildSorted(docs.repartition(13).orderBy(desc("doc_id")),
      "doc_id", "n_chars", "text", dir2,
      IndexConfig(SimpleAnalyzer, withPositions = true), numPartitions = 3)
    assert(smap2.orderBy("docId").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      rows.map(r => (r._1, r._2)).toSeq)
  }

  test("sorted top-k == brute (smallest n_chars matching docs, scores intact)") {
    val (idx, smap) = built
    val got = IndexSort.topKBySortField(spark, idx, smap, "spark", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = SparkTestEnv.bruteTermScores("spark")
    val lens = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = brute.keys.toSeq.map(d => (d, lens(d)))
      .sortBy { case (d, l) => (l, d) }.take(10)
      .map { case (d, l) => (d, l, brute(d)) }
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-9) }
  }

  test("sort-field range == filtered brute") {
    val (idx, smap) = built
    val got = IndexSort.sortFieldRange(spark, idx, smap, "spark", 100L, 250L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val lens = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = SparkTestEnv.bruteTermScores("spark")
      .filter { case (d, _) => lens(d) >= 100L && lens(d) <= 250L }
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (d, s) => assert(math.abs(s - want(d)) < 1e-9) }
  }
}
