package graft.index

import graft.core.{PostingBlock, PostingsCodec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term vectors — the reference's doc-major per-document inverted view
  * (`lucene/core/src/java/org/apache/lucene/codecs/lucene90/compressing/Lucene90CompressingTermVectorsWriter.java`,
  * `index/TermVectors.java`): for each document, its terms with frequencies
  * and positions, stored DOC-keyed so a single document's vector is
  * retrievable without re-analyzing stored text. The reference writes `.tvd`
  * files beside the postings at flush; the columnar analog is a one-time
  * transpose of the postings into a parquet table range-partitioned and
  * sorted by `docId` — a per-doc lookup prunes to one row group via parquet
  * min/max, the same "few pages per document" access path the reference's
  * chunked tvd format provides.
  *
  * Scale shape: the build is one postings scan + one range shuffle (no
  * driver state); lookups are doc-pruned scans. The classic consumers —
  * MoreLikeThis by doc id ([[graft.search.Searcher.moreLikeThisByDoc]]) and
  * highlighting stored-field-free documents — read one vector, not the
  * corpus.
  */
object TermVectors {

  /** Transpose the index's postings into the doc-major vectors table at
    * `dir/tvec` and return it. Positions are present when the index was
    * built `withPositions` (empty arrays otherwise, like an index without
    * term-vector positions). */
  def build(index: InvertedIndex, dir: String): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val rows = index.postings
      .select(col("term"), col("blocks"))
      .as[(String, Seq[PostingBlock])]
      .flatMap { case (t, blks) =>
        blks.iterator.flatMap { b =>
          val d = PostingsCodec.decodeBlock(b, withPositions = b.positions.nonEmpty)
          val hasPos = d.positions.nonEmpty
          Iterator.tabulate(d.docs.length) { i =>
            (d.docs(i), t, d.freqs(i),
              if (hasPos) d.positions(i) else Array.empty[Int])
          }
        }
      }
      .toDF("docId", "term", "freq", "positions")
    rows.repartitionByRange(col("docId"))
      .sortWithinPartitions("docId", "term")
      .write.mode("overwrite")
      .option("parquet.block.size", 8 * 1024 * 1024)
      .option("compression", "zstd")
      .parquet(s"$dir/tvec")
    open(spark, dir)
  }

  /** Open a previously built vectors table. */
  def open(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/tvec")

  /** One document's vector: `(term, freq, positions)`, term-sorted — the
    * reference's `TermVectors.get(doc)` terms enumeration. Doc-id pruned
    * scan (parquet min/max on the range-sorted table). */
  def vector(tvec: DataFrame, docId: Long): DataFrame =
    tvec.filter(col("docId") === docId)
      .select(col("term"), col("freq"), col("positions"))
      .orderBy("term")
}
