package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *    is a path-ordered `row_number` in one partition: the taxonomy
  *    dictionary is dimension-sized (orders of magnitude smaller than the
  *    corpus — the reference's taxonomy index is likewise a single
  *    sequential structure), so the sequential step is on the small side by
  *    construction, and everything joining it broadcasts.
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

  /** Build the side index over the corpus's path column. */
  def build(corpus: DataFrame, pathCol: Column): DataFrame = {
    corpus.select(pathCol.as("path")).distinct()
      .select(explode(prefixes(col("path"))).as("path"))
      .distinct()
      .withColumn("ordinal", row_number().over(Window.orderBy("path")).cast("long") - 1)
      .withColumn("depth", size(split(col("path"), "/")))
      .withColumn("parent",
        when(col("depth") > lit(1),
          array_join(slice(split(col("path"), "/"), lit(1), size(split(col("path"), "/")) - 1), "/")))
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
