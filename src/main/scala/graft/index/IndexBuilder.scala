package graft.index

import graft.core._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** One input document: external id (globally unique) + field text. */
final case class InputDoc(docId: Long, text: String)

/** Staging row written by the build — a tagged union of the three index
  * tables, so one tokenize pass produces docs + postings + segment manifest
  * with a single shuffle-free write (`partitionBy("kind")` splits files, it
  * does not shuffle).
  *
  * kind 0 = doc row, 1 = postings row, 2 = segment manifest row.
  */
final case class StageRow(
    kind: Int,
    segmentId: Long,
    // doc fields (kind 0)
    docId: Long,
    doclen: Int,
    dlb: Byte,
    // postings fields (kind 1)
    term: String,
    blockGroup: Int,
    df: Int,
    ttf: Long,
    blocks: Seq[PostingBlock],
    // segment manifest fields (kind 2) — per-partition lineage + metrics
    partitionId: Int,
    numDocs: Long,
    sumDoclen: Long,
    numTerms: Long,
    postingsFlushed: Long,
    flushOrdinal: Int)

object StageRow {
  def doc(segmentId: Long, docId: Long, doclen: Int, dlb: Byte): StageRow =
    StageRow(0, segmentId, docId, doclen, dlb, null, 0, 0, 0L, null, 0, 0L, 0L, 0L, 0L, 0)
  def postings(segmentId: Long, term: String, blockGroup: Int, df: Int, ttf: Long,
               blocks: Seq[PostingBlock]): StageRow =
    StageRow(1, segmentId, 0L, 0, 0, term, blockGroup, df, ttf, blocks, 0, 0L, 0L, 0L, 0L, 0)
  def segment(segmentId: Long, partitionId: Int, numDocs: Long, sumDoclen: Long,
              numTerms: Long, postingsFlushed: Long, flushOrdinal: Int): StageRow =
    StageRow(2, segmentId, 0L, 0, 0, null, 0, 0, 0L, null, partitionId, numDocs,
      sumDoclen, numTerms, postingsFlushed, flushOrdinal)
}

/** Configuration of an index build.
  *
  * @param analyzer        analysis chain (must be recorded so queries analyze
  *                        identically)
  * @param withPositions   index positions (needed for phrase queries)
  * @param flushDocBudget  max docs accumulated per in-memory segment before
  *                        flushing
  * @param flushTokenBudget max accumulated tokens per in-memory segment — the
  *                        RAM proxy; the analog of the reference's
  *                        flush-by-RAM DWPT policy (16 MB default,
  *                        `lucene/core/src/java/org/apache/lucene/index/IndexWriterConfig.java:83`).
  *                        Bounds per-task memory regardless of partition
  *                        size, which is what keeps N concurrent flush tasks
  *                        GC-stable on any executor — a partition-sized
  *                        buffer would scale per-task memory with input
  *                        partition size, the classic oversubscription trap.
  */
final case class IndexConfig(
    analyzer: Analyzer = SimpleAnalyzer,
    withPositions: Boolean = true,
    flushDocBudget: Int = 1 << 18,
    flushTokenBudget: Long = 1L << 19)

/** Distributed inverted-index build: the reference's
  * IndexWriter/DocumentsWriterPerThread dataflow
  * (`lucene/core/src/java/org/apache/lucene/index/IndexingChain.java:553`)
  * re-expressed Spark-first.
  *
  * Design for scale (SURVEY.md §7):
  *  - One Spark input partition plays the role of one DWPT: it accumulates an
  *    in-RAM term→postings hash and flushes segments when the doc budget is
  *    hit. The segment build itself is *shuffle-free* — postings are built
  *    map-side, exactly where the text already lives.
  *  - Doc ids are the external ids, so there is no docBase renumbering and no
  *    global coordination between partitions.
  *  - A postings row holds at most [[PostingsCodec.BlocksPerRow]] blocks
  *    (4096 docs), so a head term (present in >50% of docs) produces many
  *    bounded rows, never one giant row — term-frequency skew is handled by
  *    layout, and the only shuffle in the whole build (the global term-stats
  *    aggregation) is a map-side-combined count, immune to skew.
  *  - Per-partition segment manifest rows (lineage + metrics) make the build
  *    resumable: a re-run skips partitions whose manifest rows exist,
  *    mirroring the reference's two-phase commit
  *    (`lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:3582,4063`).
  */
object IndexBuilder {

  /** Build (or resume) an index over `input` at `dir`. Returns the opened index. */
  def build(input: Dataset[InputDoc], dir: String, config: IndexConfig = IndexConfig(),
            resume: Boolean = false): InvertedIndex = {
    val spark = input.sparkSession
    import spark.implicits._

    val completedPartitions: Set[Int] =
      if (resume && new java.io.File(s"$dir/data").exists()) {
        spark.read.parquet(s"$dir/data").filter($"kind" === 2)
          .select($"partitionId").distinct().as[Int].collect().toSet
      } else Set.empty

    val bc = spark.sparkContext.broadcast((config, completedPartitions))

    val staged: Dataset[StageRow] = input.mapPartitions { docs =>
      val (cfg, done) = bc.value
      val pid = TaskContext.getPartitionId()
      if (done.contains(pid)) Iterator.empty
      else new SegmentFlusher(cfg, 0L, pid, docs)
    }

    staged.write
      .mode(if (resume) "append" else "overwrite")
      .partitionBy("kind")
      .parquet(s"$dir/data")

    refreshStats(spark, dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/analyzer"), config.analyzer.name)

    InvertedIndex.open(spark, dir)
  }

  /** Append one micro-batch as new segments under a disjoint segment-id
    * namespace — the incremental surface behind [[graft.streaming.StreamingIndexer]]
    * (the reference's flushed-but-merge-pending NRT segments,
    * `lucene/core/src/java/org/apache/lucene/index/DirectoryReader.java:48`).
    * Does NOT refresh global stats; callers batch that via [[refreshStats]]
    * (the `SearcherManager.maybeRefresh` analog). */
  private[graft] def appendBatch(batch: Dataset[InputDoc], dir: String,
                                 config: IndexConfig, segNamespace: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(config)
    batch.mapPartitions { docs =>
      new SegmentFlusher(bc.value, segNamespace, TaskContext.getPartitionId(), docs)
    }.write.mode("append").partitionBy("kind").parquet(s"$dir/data")
  }

  /** Recompute global term/collection statistics from the committed segment
    * data. The only shuffle of the build; partial (map-side) aggregation makes
    * it skew-proof — a head term contributes one partial count per task, not
    * its postings. */
  def refreshStats(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val data = spark.read.parquet(s"$dir/data")
    data.filter($"kind" === 1)
      .groupBy($"term")
      .agg(sum($"df").cast("long").as("df"), sum($"ttf").as("ttf"))
      .write.mode("overwrite").parquet(s"$dir/term_stats")
    data.filter($"kind" === 2)
      .agg(sum($"numDocs").as("docCount"), sum($"sumDoclen").as("sumTotalTermFreq"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Per-partition segment accumulator (the DWPT analog). Streams input docs,
    * flushes a segment whenever the doc budget is reached, and emits one
    * manifest row per flushed segment. */
  private final class SegmentFlusher(cfg: IndexConfig, segNamespace: Long, pid: Int,
                                     docs: Iterator[InputDoc])
      extends Iterator[StageRow] {

    private var flushOrdinal = 0
    private val pending = mutable.Queue.empty[StageRow]

    private final class PostingsBuf {
      val docIds = new mutable.ArrayBuffer[Long]
      val freqs = new mutable.ArrayBuffer[Int]
      val doclens = new mutable.ArrayBuffer[Int]
      val positions = new mutable.ArrayBuffer[Array[Int]]
      var ttf = 0L
    }

    private var terms = mutable.HashMap.empty[String, PostingsBuf]
    private var segDocs = new mutable.ArrayBuffer[(Long, Int)] // (docId, doclen)
    private var segSumDoclen = 0L

    private def addDoc(d: InputDoc): Unit = {
      val toks = cfg.analyzer.tokenize(d.text)
      val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[Int]]
      toks.foreach(t => byTerm.getOrElseUpdate(t.term, new mutable.ArrayBuffer[Int]) += t.position)
      val doclen = toks.length
      byTerm.foreach { case (term, poss) =>
        val buf = terms.getOrElseUpdate(term, new PostingsBuf)
        buf.docIds += d.docId
        buf.freqs += poss.length
        buf.doclens += doclen
        buf.ttf += poss.length
        if (cfg.withPositions) buf.positions += poss.toArray
      }
      segDocs += ((d.docId, doclen))
      segSumDoclen += doclen
    }

    private def flush(): Unit = {
      if (segDocs.isEmpty) return
      val segmentId = segNamespace + pid.toLong * 4096L + flushOrdinal
      var postingsFlushed = 0L
      segDocs.foreach { case (id, len) =>
        pending += StageRow.doc(segmentId, id, len, SmallFloat.intToByte4(len))
      }
      // flush terms in sorted order, like the reference's FreqProxTermsWriter
      // (`lucene/core/src/java/org/apache/lucene/index/FreqProxTermsWriter.java:43`)
      // — and, relationally, so parquet row-group min/max stats on `term`
      // prune term-lookup scans (the block-tree term dictionary analog).
      terms.toSeq.sortBy(_._1).foreach { case (term, buf) =>
        // sort this term's postings by doc id (input order within a partition
        // is not guaranteed)
        val n = buf.docIds.length
        val order = Array.tabulate(n)(identity).sortBy(buf.docIds(_))
        val ids = order.map(buf.docIds)
        val fr = order.map(buf.freqs)
        val dl = order.map(buf.doclens)
        val pos = if (cfg.withPositions) order.map(buf.positions) else null
        val blocks = PostingsCodec.encodeBlocks(ids, fr, dl, pos)
        blocks.grouped(PostingsCodec.BlocksPerRow).zipWithIndex.foreach {
          case (grp, gi) =>
            val df = grp.map(_.count).sum
            val ttf = if (gi == 0 && blocks.size <= PostingsCodec.BlocksPerRow) buf.ttf else {
              // per-row partial ttf: recompute from the group's freqs
              grp.map(b => VByte.decode(b.freqs, b.count).map(_.toLong).sum).sum
            }
            pending += StageRow.postings(segmentId, term, gi, df, ttf, grp)
            postingsFlushed += df
        }
      }
      pending += StageRow.segment(segmentId, pid, segDocs.length.toLong, segSumDoclen,
        terms.size.toLong, postingsFlushed, flushOrdinal)
      flushOrdinal += 1
      terms = mutable.HashMap.empty
      segDocs = new mutable.ArrayBuffer[(Long, Int)]
      segSumDoclen = 0L
    }

    override def hasNext: Boolean = {
      while (pending.isEmpty && docs.hasNext) {
        addDoc(docs.next())
        if (segDocs.length >= cfg.flushDocBudget || segSumDoclen >= cfg.flushTokenBudget) flush()
      }
      if (pending.isEmpty && segDocs.nonEmpty) flush()
      pending.nonEmpty
    }

    override def next(): StageRow = {
      if (!hasNext) throw new NoSuchElementException
      pending.dequeue()
    }
  }
}

/** An opened index: typed views over the staged tables.
  *
  * `postings`: term, segmentId, blockGroup, df, ttf, blocks
  * `docs`: docId, segmentId, doclen, dlb
  * `segments`: segmentId, partitionId, numDocs, sumDoclen, numTerms, postingsFlushed
  * `termStats`: term, df, ttf (global)
  */
final class InvertedIndex private (
    val spark: SparkSession,
    val dir: String,
    val analyzer: Analyzer,
    val collectionStats: CollectionStats,
    /** a merged index holds only rewritten postings; docs/segments/global
      * stats are read through the parent chain (segment data is immutable —
      * a merge is a postings rewrite + manifest swap, the Iceberg commit
      * model; no bulk copying of unchanged sections) */
    val parent: Option[InvertedIndex]) extends Serializable {

  private def data: DataFrame = spark.read.parquet(s"$dir/data")

  def postings: DataFrame =
    data.filter(col("kind") === 1)
      .select("term", "segmentId", "blockGroup", "df", "ttf", "blocks")

  def docs: DataFrame = parent match {
    case Some(p) => p.docs
    case None => data.filter(col("kind") === 0).select("docId", "segmentId", "doclen", "dlb")
  }

  def segments: DataFrame = parent match {
    case Some(p) => p.segments
    case None =>
      data.filter(col("kind") === 2)
        .select("segmentId", "partitionId", "numDocs", "sumDoclen", "numTerms",
          "postingsFlushed", "flushOrdinal")
  }

  /** term statistics are merge-invariant — resolved through the parent chain */
  def termStats: DataFrame = parent match {
    case Some(p) => p.termStats
    case None => spark.read.parquet(s"$dir/term_stats")
  }
}

object InvertedIndex {
  def open(spark: SparkSession, dir: String): InvertedIndex = {
    val parentPath = java.nio.file.Paths.get(s"$dir/parent")
    val parent =
      if (java.nio.file.Files.exists(parentPath))
        Some(open(spark, java.nio.file.Files.readString(parentPath).trim))
      else None
    val statsDir = parent.map(_.dir).getOrElse(dir)
    val statsRow = spark.read.parquet(s"$statsDir/stats").collect()(0)
    val stats = CollectionStats(statsRow.getLong(0), statsRow.getLong(1))
    val analyzer = parent.map(_.analyzer).getOrElse(
      Analyzers.byName(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/analyzer")).trim))
    new InvertedIndex(spark, dir, analyzer, stats, parent)
  }
}
