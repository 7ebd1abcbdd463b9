package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the reference's `TopDocs.rrf`
  * (`lucene/core/src/java/org/apache/lucene/search/TopDocs.java:372-434`):
  * each input ranking contributes `1 / (k + rank)` for every document it
  * holds, contributions sum across rankings, and the fused list sorts by
  * that sum with the reference's doc-id tiebreak. The reference accumulates
  * in double "to reduce accuracy loss" — so does this.
  *
  * Ranks are recomputed from each input's own ordering contract
  * (score DESC, docId ASC — the TopDocs scoreDocs order), so callers pass
  * plain `(docId, score)` frames straight from `Searcher`/ANN top-k.
  *
  * Scale shape: fusion operates on per-query top-k lists — bounded inputs by
  * construction — so the unpartitioned rank windows here never see more than
  * the k rows each retriever returned. For batched serving, [[rrfBatch]]
  * partitions every window by `queryId` and fuses all queries in one pass:
  * no per-query driver loop, one shuffle keyed by query.
  */
object Fusion {

  /** Fuse ranked lists. Inputs: `(docId, score)`; output:
    * `(docId, rrf_score)`, top `topN` by summed reciprocal rank.
    *
    * @param topN fused list size (>= 1)
    * @param k    rank damping constant (>= 1); higher gives tail ranks more
    *             relative influence — the reference's parameter, same name
    */
  def rrf(topN: Int, k: Int, hits: Seq[DataFrame]): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(k >= 1, s"k must be >= 1, got $k")
    require(hits.nonEmpty, "need at least one ranking")
    val contributions = hits.map { df =>
      val w = Window.orderBy(desc("score"), col("docId").asc)
      df.select(col("docId"), row_number().over(w).as("rank"))
        .select(col("docId"), (lit(1.0) / (lit(k.toDouble) + col("rank"))).as("contrib"))
    }
    contributions.reduce(_.unionAll(_))
      .groupBy("docId")
      .agg(sum("contrib").as("rrf_score"))
      .orderBy(desc("rrf_score"), col("docId").asc)
      .limit(topN)
  }

  /** Batched fusion: inputs carry `(queryId, docId, score)`; ranks and sums
    * are computed per query in one plan — the whole query set fuses in a
    * single shuffle on `queryId` (the serving-path analog of running
    * `TopDocs.rrf` once per query). Output: `(queryId, docId, rrf_score)`,
    * `topN` rows per query. */
  def rrfBatch(topN: Int, k: Int, hits: Seq[DataFrame]): DataFrame = {
    require(topN >= 1 && k >= 1, "topN and k must be >= 1")
    require(hits.nonEmpty, "need at least one ranking")
    val contributions = hits.map { df =>
      val w = Window.partitionBy("queryId").orderBy(desc("score"), col("docId").asc)
      df.select(col("queryId"), col("docId"), row_number().over(w).as("rank"))
        .select(col("queryId"), col("docId"),
          (lit(1.0) / (lit(k.toDouble) + col("rank"))).as("contrib"))
    }
    val fused = contributions.reduce(_.unionAll(_))
      .groupBy("queryId", "docId")
      .agg(sum("contrib").as("rrf_score"))
    val rankW = Window.partitionBy("queryId").orderBy(desc("rrf_score"), col("docId").asc)
    fused.withColumn("r", row_number().over(rankW))
      .filter(col("r") <= topN)
      .drop("r")
  }
}
