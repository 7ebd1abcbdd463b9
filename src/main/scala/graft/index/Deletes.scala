package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}

/** Document deletion, following the reference's lifecycle
  * (`lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1844`
  * `deleteDocuments` → per-segment liveDocs → physical purge at merge):
  *
  *  - [[tombstone]] appends deleted doc ids under `dir/deletes` — a commit
  *    of intent, no data rewritten. A reopened [[InvertedIndex]] exposes
  *    them and [[graft.search.Searcher]] anti-joins every match set against
  *    them (the liveDocs filter). Collection/term statistics intentionally
  *    KEEP counting tombstoned docs — exactly the reference's semantics,
  *    where docFreq/docCount ignore deletions until segments are rewritten;
  *  - [[SegmentMerger.merge]] purges: tombstoned postings are dropped during
  *    the rewrite, docs rows are filtered, statistics recomputed — the merged
  *    index is standalone (no parent link) and tombstone-free, the
  *    `forceMergeDeletes` analog.
  *
  * Updating a document keeps the reference's shape: tombstone the doc id,
  * purge via merge, then append the new version (the external doc id is the
  * update key, like `updateDocument(Term, doc)`); re-adding an id while its
  * tombstone is still pending would delete both, so the purge must happen
  * first — [[updateDocuments]] sequences exactly that.
  */
object Deletes {

  /** Record doc ids as deleted. Visible to searchers on the next open. */
  def tombstone(spark: SparkSession, dir: String, ids: Dataset[java.lang.Long]): Unit =
    ids.toDF("docId").write.mode("append").parquet(s"$dir/deletes")

  /** Delete + re-add under new segments: purge-merge the tombstoned index to
    * `mergedDir`, then append the new versions there. Returns the updated
    * index view. */
  def updateDocuments(index: InvertedIndex, mergedDir: String,
                      newVersions: Dataset[InputDoc], config: IndexConfig,
                      segNamespace: Long): InvertedIndex = {
    import index.spark.implicits._
    Deletes.tombstone(index.spark, index.dir,
      newVersions.map(d => java.lang.Long.valueOf(d.docId)))
    val reopened = InvertedIndex.open(index.spark, index.dir)
    val (purged, _) = SegmentMerger.merge(reopened, mergedDir, computeMetrics = false)
    IndexBuilder.appendBatch(newVersions, mergedDir, config, segNamespace)
    // a purged dir carries no base segment-manifest rows (its doc rows were
    // rewritten standalone), so stats must aggregate doc rows, not manifests
    val prior = Snapshots.latest(mergedDir)
    IndexBuilder.refreshStatsFromDocs(index.spark, mergedDir,
      version = prior.map(_.version + 1).getOrElse(1))
    Snapshots.commit(mergedDir, "append",
      prior.map(_.namespaces).getOrElse(Seq(0L)) :+ segNamespace)
    InvertedIndex.open(index.spark, purged.dir)
  }
}
