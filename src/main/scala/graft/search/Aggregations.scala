package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Facet counting over a matched doc set — the reference's facets module
  * re-expressed as relational aggregation (SURVEY.md §2.7).
  *
  * `matched` is any `(docId, score)` frame produced by [[Searcher]];
  * `corpus` is the source table carrying the facet dimensions, keyed by
  * `docIdCol`.
  */
object Facets {

  /** Counts per flat string dimension — `SortedSetDocValuesFacetCounts`
    * (`lucene/facet/src/java/org/apache/lucene/facet/sortedset/SortedSetDocValuesFacetCounts.java:58`). */
  def stringCounts(matched: DataFrame, corpus: DataFrame, docIdCol: String, dim: String): DataFrame =
    matched.select(col("docId"))
      .join(corpus, col("docId") === corpus(docIdCol))
      .groupBy(col(dim)).agg(count(lit(1)).as("cnt"))

  /** Counts per numeric range bucket — `LongRangeFacetCounts`
    * (`lucene/facet/src/java/org/apache/lucene/facet/range/LongRangeFacetCounts.java:41`). */
  def rangeCounts(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                  valueCol: String, bucketWidth: Long): DataFrame =
    matched.select(col("docId"))
      .join(corpus, col("docId") === corpus(docIdCol))
      .groupBy(floor(col(valueCol) / lit(bucketWidth)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Hierarchical (taxonomy) facet counts — `FastTaxonomyFacetCounts`
    * (`lucene/facet/src/java/org/apache/lucene/facet/taxonomy/FastTaxonomyFacetCounts.java:40`):
    * counts at every prefix level of the dimension path (here via ROLLUP over
    * the path columns; subtotal levels carry `<ALL>` markers so results are
    * null-free and portable). */
  def taxonomyCounts(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                     path: Seq[String]): DataFrame = {
    val joined = matched.select(col("docId"))
      .join(corpus, col("docId") === corpus(docIdCol))
    joined.rollup(path.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(path.map(d => coalesce(col(d).cast("string"), lit("<ALL>")).as(d)) :+ col("cnt"): _*)
  }

  /** Distinct value count per group — `DistinctValuesCollector`. */
  def distinctCounts(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                     groupDim: String, valueDim: String): DataFrame =
    matched.select(col("docId"))
      .join(corpus, col("docId") === corpus(docIdCol))
      .groupBy(col(groupDim)).agg(countDistinct(col(valueDim)).as("ndv"))
}

/** Drill-sideways faceting — the reference's `DrillSideways`
  * (`lucene/facet/src/java/org/apache/lucene/facet/DrillSideways.java:71`):
  * with drill-down filters on several dimensions, each dimension's facet
  * counts are computed under all filters EXCEPT its own (so the UI can show
  * what the other values of that dimension would yield).
  */
object DrillSideways {

  /** @param matched     base-query matches `(docId, score)`
    * @param corpus      table with the dimension columns, keyed by `docIdCol`
    * @param dimFilters  (dimension column, drilled-down value) per dimension
    * @return rows `(dim, value, cnt)` — for each dimension, counts per value
    *         under the other dimensions' filters
    */
  def counts(matched: DataFrame, corpus: DataFrame, docIdCol: String,
             dimFilters: Seq[(String, String)]): DataFrame = {
    val base = matched.select(col("docId"))
      .join(corpus, col("docId") === corpus(docIdCol))
    dimFilters.map { case (dim, _) =>
      val others = dimFilters.filter(_._1 != dim)
      val filtered = others.foldLeft(base) { case (df, (d, v)) => df.filter(col(d) === lit(v)) }
      filtered.groupBy(col(dim))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(dim).as("dim"), col(dim).cast("string").as("value"), col("cnt"))
    }.reduce(_ unionAll _)
  }
}

/** Grouping: top-k docs per group and group heads — the reference's grouping
  * module (`lucene/grouping/src/java/org/apache/lucene/search/grouping/GroupingSearch.java:42`)
  * as window functions (SURVEY.md §2.8).
  */
object Grouping {

  /** Top-k scored docs within each group, ranked (score desc, docId asc). */
  def topKPerGroup(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                   groupDim: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupDim)).orderBy(desc("score"), asc("docId"))
    matched
      .join(corpus, col("docId") === corpus(docIdCol))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupDim), col("docId"), col("score"), col("rank"))
  }

  /** Best doc per group — `AllGroupHeadsCollector`. */
  def groupHeads(matched: DataFrame, corpus: DataFrame, docIdCol: String, groupDim: String): DataFrame =
    topKPerGroup(matched, corpus, docIdCol, groupDim, 1).drop("rank")

  /** Two-pass grouped search — the reference's `GroupingSearch`
    * (`lucene/grouping/src/java/org/apache/lucene/search/grouping/GroupingSearch.java:42`,
    * `FirstPassGroupingCollector.java:44`, `SecondPassGroupingCollector.java:35`):
    * pass 1 ranks groups by their best doc's score (top `nGroups`), pass 2
    * returns the top `kPerGroup` docs within each retained group.
    * Returns `(group, groupRank, docId, score, rank)`. */
  def topGroups(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                groupDim: String, nGroups: Int, kPerGroup: Int): DataFrame = {
    val spark = matched.sparkSession
    val perGroup = topKPerGroup(matched, corpus, docIdCol, groupDim, kPerGroup)
    // Pass 1 ranks the groups. nGroups is a top-k, so take it with
    // orderBy+limit (TakeOrderedAndProject: bounded per-partition heaps merged
    // on the driver) and rank the ≤ nGroups survivors driver-side — never an
    // unpartitioned global Window, which would funnel every group head
    // through one task (the r1 `WindowExec: No Partition Defined` hotspot).
    val heads = perGroup.filter(col("rank") === 1)
      .select(col(groupDim), col("score").as("headScore"))
      .orderBy(desc("headScore"), asc(groupDim))
      .limit(nGroups)
      .collect()
    val dimType = perGroup.schema(groupDim).dataType
    val rankRows = heads.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i + 1)
    }
    val ranksDf = spark.createDataFrame(
      java.util.Arrays.asList(rankRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(groupDim, dimType),
        org.apache.spark.sql.types.StructField("groupRank",
          org.apache.spark.sql.types.IntegerType))))
    perGroup.join(broadcast(ranksDf), groupDim)
      .select(col(groupDim), col("groupRank"), col("docId"), col("score"), col("rank"))
  }
}

/** Diversity-capped top-k — the reference's `DiversifiedTopDocsCollector`
  * (`lucene/misc/src/java/org/apache/lucene/misc/search/DiversifiedTopDocsCollector.java:69`):
  * a global top-k where no key (e.g. site/source/retailer) contributes more
  * than `maxPerKey` hits. The reference links a per-key priority queue of
  * size `maxPerKey` to the global queue; the relational equivalence is
  * per-key top-`maxPerKey` followed by a global top-k (an addition rejected
  * by its full per-key queue can never be a final hit, and a per-key
  * eviction is by construction below the global floor).
  *
  * Scale shape: the per-key cap runs as a typed Aggregator with a bounded
  * buffer, so it PARTIALLY AGGREGATES map-side — the shuffle carries at most
  * `maxPerKey` rows per key per input partition, never the full matched set
  * (unlike a ranked-window cap, which shuffles every matched row). The
  * global top-k is a TakeOrdered, not a sort.
  */
object Diversify {
  import org.apache.spark.sql.{Encoder, Encoders}
  import org.apache.spark.sql.expressions.Aggregator

  /** Bounded per-key hit list ordered (score desc, docId asc) — the per-key
    * `ScoreDocKey` queue. Buffers are ≤ `m` entries at every stage, so
    * map-side partial aggregation keeps the shuffle bounded. */
  private final class TopM(m: Int)
      extends Aggregator[(String, Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    private def trim(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
      xs.sortBy { case (d, s) => (-s, d) }.take(m)
    override def zero: Seq[(Long, Double)] = Nil
    override def reduce(b: Seq[(Long, Double)], a: (String, Long, Double)): Seq[(Long, Double)] =
      trim((a._2, a._3) +: b)
    override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
      trim(b1 ++ b2)
    override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
  }

  /** @param matched   `(docId, score)` frame from [[Searcher]]
    * @param corpus    table carrying the diversity key, keyed by `docIdCol`
    * @param keyDim    the key column (at most `maxPerKey` final hits share one)
    * @return `(docId, score, <keyDim>)`, the diversified top-k
    */
  def diversifiedTopK(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                      keyDim: String, maxPerKey: Int, k: Int): DataFrame = {
    val spark = matched.sparkSession
    import spark.implicits._
    val keyed = matched
      .join(corpus.select(col(docIdCol).cast("long").as("joinId"),
        col(keyDim).cast("string").as("divKey")), col("docId") === col("joinId"))
      .select(col("divKey"), col("docId").cast("long"), col("score").cast("double"))
      .as[(String, Long, Double)]
    val cap = new TopM(maxPerKey).toColumn
    keyed.groupByKey(_._1)
      .agg(cap.name("hits"))
      .flatMap { case (key, hits) => hits.map { case (d, s) => (d, s, key) } }
      .toDF("docId", "score", keyDim)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }
}

/** Sampled facet counting — the reference's `RandomSamplingFacetsCollector`
  * (`lucene/facet/src/java/org/apache/lucene/facet/RandomSamplingFacetsCollector.java`):
  * counts over a subsample of the matched docs. Here the sample is the
  * deterministic residue class `docId % rate == 0` so an external SQL oracle
  * can reproduce it exactly; swap in `df.sample(seed)` for production use.
  */
object Sampling {
  def sampledStringCounts(matched: DataFrame, corpus: DataFrame, docIdCol: String,
                          dim: String, rate: Int): DataFrame =
    Facets.stringCounts(matched.filter(col("docId") % rate === 0), corpus, docIdCol, dim)
}

/** Index-time parent/child join — the reference's block join
  * (`lucene/join/src/java/org/apache/lucene/search/join/ToParentBlockJoinQuery.java:68`):
  * child docs matching a child query are aggregated (max/sum/avg/count) onto
  * their parent. Lucene co-locates child+parent in one doc block; relationally
  * the parent key IS the block, so the join is a keyed aggregation — and at
  * scale it broadcast- or shuffle-joins like any fact/dim join.
  */
object BlockJoin {

  /** @param children     matched child rows (already filtered by the child query)
    * @param childKeyCol  the parent-key column on the child side
    * @param childScore   per-child score expression
    * @param scoreMode    max | sum | avg | count (`ScoreMode` analog)
    * @param parents      parent table (already filtered by the parent query)
    * @param parentKeyCol parent-key column on the parent side
    * @return parents joined with `joinScore`
    */
  def toParent(children: DataFrame, childKeyCol: String,
               childScore: org.apache.spark.sql.Column, scoreMode: String,
               parents: DataFrame, parentKeyCol: String): DataFrame = {
    val aggFn = scoreMode match {
      case "max" => max(childScore)
      case "sum" => sum(childScore)
      case "avg" => avg(childScore)
      case "count" => count(lit(1)).cast("double")
      case other => throw new IllegalArgumentException(s"scoreMode: $other")
    }
    val agg = children.groupBy(col(childKeyCol).as("blockKey"))
      .agg(aggFn.as("joinScore"))
    parents.join(agg, parents(parentKeyCol) === col("blockKey"), "inner")
      .drop("blockKey")
  }

  /** Children of matching parents — `ToChildBlockJoinQuery`
    * (`lucene/join/src/java/org/apache/lucene/search/join/ToChildBlockJoinQuery.java`). */
  def toChildren(parents: DataFrame, parentKeyCol: String,
                 children: DataFrame, childKeyCol: String): DataFrame =
    children.join(parents.select(col(parentKeyCol).as("blockKey")).distinct(),
      children(childKeyCol) === col("blockKey"), "left_semi")
}

/** Query-time join — the reference's `JoinUtil.createJoinQuery`
  * (`lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:56`):
  * collect the join-field values of docs matching a "from" query, then match
  * "to"-side rows, optionally aggregating scores (max/sum/avg).
  */
object JoinUtil {

  /** Semi-join flavor (ScoreMode.None): to-side rows whose `toField` appears
    * among from-side matches. */
  def semiJoin(fromMatched: DataFrame, fromCorpus: DataFrame, fromIdCol: String,
               fromField: String, toCorpus: DataFrame, toField: String): DataFrame = {
    val keys = fromMatched.select(col("docId"))
      .join(fromCorpus, col("docId") === fromCorpus(fromIdCol))
      .select(col(fromField).as("joinKey")).distinct()
    toCorpus.join(keys, toCorpus(toField) === col("joinKey"), "left_semi")
  }

  /** Scored flavor: to-side rows with the aggregated (max/sum/avg) score of
    * the from-side matches sharing the join key. */
  def scoredJoin(fromMatched: DataFrame, fromCorpus: DataFrame, fromIdCol: String,
                 fromField: String, toCorpus: DataFrame, toField: String,
                 scoreMode: String): DataFrame = {
    val aggFn = scoreMode match {
      case "max" => max(col("score"))
      case "sum" => sum(col("score"))
      case "avg" => avg(col("score"))
      case other => throw new IllegalArgumentException(s"scoreMode: $other")
    }
    val keyScores = fromMatched
      .join(fromCorpus, col("docId") === fromCorpus(fromIdCol))
      .groupBy(col(fromField).as("joinKey"))
      .agg(aggFn.as("joinScore"))
    toCorpus.join(keyScores, toCorpus(toField) === col("joinKey"), "inner")
      .drop("joinKey")
  }
}
