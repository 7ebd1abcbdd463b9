package graft.search

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical facet taxonomy as a SIDE INDEX — the reference's taxonomy
  * model (`lucene/facet/src/java/org/apache/lucene/facet/taxonomy/
  * FastTaxonomyFacetCounts.java:40`, `TaxonomyWriter`): every facet PATH of
  * every depth gets a compact ordinal with a parent pointer, documents
  * resolve to leaf ordinals, and counting aggregates each match's whole
  * ancestor chain. Re-expressed relationally:
  *
  *  - [[build]] — the taxonomy table `(ordinal, path, parent, depth)` over
  *    the DISTINCT prefix closure of the corpus's paths. Ordinal assignment
  *    is the deterministic DISTRIBUTED zip-with-index (range-repartition on
  *    path, sort within partitions, one count pre-pass for global offsets —
  *    the same mechanism as [[graft.index.IndexSort.buildSorted]] dense
  *    ids): web-corpus taxonomies (host/path hierarchies) have cardinality
  *    proportional to the corpus, so a single-partition global window would
  *    be a serial bottleneck and a one-executor OOM at scale.
  *  - [[counts]] — matched docs join their path, explode the ancestor
  *    prefixes IN the plan (no per-level passes), aggregate once, and join
  *    the broadcast taxonomy for ordinals: the `FastTaxonomyFacetCounts`
  *    increment-ordinals-then-rollup shape as a single map-side-combined
  *    aggregation.
  *  - [[topChildren]] — `getTopChildren(dim, path)`: children of one parent
  *    ranked by count.
  */
object Taxonomy {

  /** All '/'-prefixes of `path`, depth 1..n, as an array column. */
  private def prefixes(path: Column): Column =
    transform(sequence(lit(1), size(split(path, "/"))),
      i => array_join(slice(split(path, "/"), lit(1), i), "/"))

  /** Build the side index over the corpus's path column. Ordinals are dense
    * 0-based ranks in global path order, assigned without any
    * single-partition exchange: the prefix closure is range-partitioned on
    * path and sorted within partitions (a distributed sort), partition
    * counts are collected once (ints, not rows), and each partition stamps
    * ids from its broadcast global offset. The closure frame is cached so
    * the count pre-pass and the stamping pass see identical partitioning. */
  def build(corpus: DataFrame, pathCol: Column, numPartitions: Int = 32): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val paths = corpus.select(pathCol.as("path")).distinct()
      .select(explode(prefixes(col("path"))).as("path"))
      .distinct()
      .as[String]
      .repartitionByRange(numPartitions, col("path"))
      .sortWithinPartitions("path")
      .cache()
    val counts = paths
      .mapPartitions(it => Iterator.single((TaskContext.getPartitionId(), it.size.toLong)))
      .collect()
    val bc = spark.sparkContext.broadcast(graft.index.IndexSort.offsets(counts))
    val tax = paths.mapPartitions { it =>
      var next = bc.value(TaskContext.getPartitionId())
      it.map { p => val o = next; next += 1; (p, o) }
    }.toDF("path", "ordinal")
      .withColumn("depth", size(split(col("path"), "/")))
      .withColumn("parent",
        when(col("depth") > lit(1),
          array_join(slice(split(col("path"), "/"), lit(1), size(split(col("path"), "/")) - 1), "/")))
      .cache()
    tax.count() // materialize before releasing the closure frame
    paths.unpersist()
    tax
  }

  /** Facet counts at every level of the hierarchy for the matched doc set:
    * `(ordinal, path, depth, cnt)`. */
  def counts(matched: DataFrame, corpus: DataFrame, docIdCol: String,
             pathCol: Column, taxonomy: DataFrame): DataFrame = {
    val docPaths = corpus.select(col(docIdCol).as("tdoc"), pathCol.as("path"))
    matched.select(col("docId")).join(docPaths, col("docId") === col("tdoc"))
      .select(explode(prefixes(col("path"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .join(broadcast(taxonomy), Seq("path"))
      .select(col("ordinal"), col("path"), col("depth"), col("cnt"))
  }

  /** Top-n children of `parentPath` (null/None = roots) by count. */
  def topChildren(allCounts: DataFrame, taxonomy: DataFrame,
                  parentPath: Option[String], n: Int): DataFrame = {
    val kids = taxonomy.filter(parentPath match {
      case Some(p) => col("parent") === p
      case None => col("parent").isNull
    }).select(col("path"))
    allCounts.join(broadcast(kids), Seq("path"))
      .orderBy(desc("cnt"), asc("path")).limit(n)
  }
}
