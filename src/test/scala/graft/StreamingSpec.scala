package graft

import graft.core.SimpleAnalyzer
import graft.index._
import graft.search._
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion: micro-batches append segments; a re-opened reader
  * sees a point-in-time view equivalent to a batch build over the same docs
  * (the NRT `openIfChanged` contract). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkTestEnv.spark
  }

  // shared SparkTestEnv session — never stopped here (other suites use it)

  private val docsA = Seq(
    InputDoc(0L, "spark streams data fast"),
    InputDoc(1L, "lucene builds inverted index"),
    InputDoc(2L, "spark index spark query"))
  private val docsB = Seq(
    InputDoc(3L, "streaming appends new segments"),
    InputDoc(4L, "query spark after refresh"))

  test("two micro-batches == one batch build (stats, postings, top-k)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt-").toString

    val source = MemoryStream[InputDoc]
    val q = StreamingIndexer.start(source.toDS(), dir, IndexConfig(SimpleAnalyzer), ckpt)
    source.addData(docsA: _*)
    q.processAllAvailable()

    // mid-stream view: only batch A visible
    val midIdx = StreamingIndexer.reopen(spark, dir)
    assert(midIdx.collectionStats.docCount == 3L)

    source.addData(docsB: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamingIndexer.reopen(spark, dir)
    val batchDir = java.nio.file.Files.createTempDirectory("graft-stream-ref-").toString
    val batched = IndexBuilder.build(
      s.createDataset(docsA ++ docsB), batchDir, IndexConfig(SimpleAnalyzer))

    assert(streamed.collectionStats == batched.collectionStats)
    val tsS = streamed.termStats.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val tsB = batched.termStats.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(tsS == tsB)

    val topS = new Searcher(streamed).search(TermQuery("spark"), 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val topB = new Searcher(batched).search(TermQuery("spark"), 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(topS == topB)

    // segment namespaces are disjoint across batches
    val segIds = streamed.segments.select("segmentId").collect().map(_.getLong(0)).toSet
    assert(segIds.size >= 2)
    assert(segIds.forall(_ >= (1L << 40)))

    // the incrementally-grown index satisfies the full CheckIndex contract
    val violations = CheckIndex.check(streamed)
    assert(violations.isEmpty, violations.take(3).mkString("; "))
  }
}
