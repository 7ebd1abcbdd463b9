package graft.search

import graft.core.Analyzer
import graft.index.InvertedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A subset of the reference's flexible/standard query parser pipeline
  * (`lucene/queryparser/src/java/org/apache/lucene/queryparser/flexible/standard/StandardQueryParser.java:231`):
  * syntax tree → processors → builders.
  *
  *  - SYNTAX: the classic grammar is reused ([[QueryParser]] — the flexible
  *    parser accepts the same surface syntax).
  *  - PROCESSORS: the `MultiFieldQueryNodeProcessor` stage
  *    (`flexible/standard/processors/MultiFieldQueryNodeProcessor.java:42`):
  *    every fieldless leaf expands to a SHOULD group over the configured
  *    fields, each alternative carrying its field boost
  *    (`setMultiFields` + `setFieldsBoost` semantics). Because each LEAF
  *    expands independently, a MUST query can be satisfied across different
  *    fields per term — per-leaf, not per-query, expansion.
  *  - BUILDERS: each expanded leaf becomes ONE Spark frame — the union of
  *    the per-field scored frames, weighted and summed per doc (BooleanQuery
  *    SHOULD-sum over the group) — and the boolean structure is assembled
  *    with joins over those frames.
  *
  * Subset boundaries (documented, SURVEY §7.4): the processors implemented
  * are multi-field expansion and boost propagation; point/interval-function
  * syntax and per-node analyzers stay out — the classic single-field parser
  * (q40) covers those surfaces programmatically.
  *
  * Scale shape: one scored frame per (leaf × field) — a handful of
  * partition-pruned postings scans unioned and aggregated on docId; no
  * driver-side iteration, no full-index scan.
  */
object FlexibleParser {

  /** Parse `input` and search it across `fields` (index → field boost),
    * returning one (docId, score) row per matching doc. */
  def search(fields: Seq[(InvertedIndex, Double)], input: String,
             analyzer: Analyzer): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    val tree = QueryParser.parse(input, analyzer) // syntax stage
    val searchers = fields.map { case (idx, w) =>
      (new Searcher(idx, ScoringMode.PreciseBM25()), w)
    }
    build(tree, searchers) // processors are fused into the leaf builder
  }

  /** Builder: leaves expand over fields; boolean nodes combine frames. */
  private def build(q: Query, searchers: Seq[(Searcher, Double)]): DataFrame =
    q match {
      case BoostQuery(inner, b) =>
        build(inner, searchers).withColumn("score", col("score") * lit(b.toDouble))
      case BooleanQuery(clauses, msm) => buildBoolean(clauses, msm, searchers)
      case leaf => leafFrame(leaf, searchers)
    }

  /** The multi-field expansion of one leaf: SHOULD over per-field variants =
    * per-doc sum of weighted per-field scores. */
  private def leafFrame(leaf: Query, searchers: Seq[(Searcher, Double)]): DataFrame = {
    val perField = searchers.map { case (s, w) =>
      s.scored(leaf).select(col("docId"), (col("score") * lit(w)).as("score"))
    }
    perField.reduce(_ unionByName _)
      .groupBy("docId").agg(sum("score").as("score"))
  }

  private def buildBoolean(clauses: Seq[(Occur.Value, Query)], msm: Int,
                           searchers: Seq[(Searcher, Double)]): DataFrame = {
    val musts = clauses.collect { case (Occur.MUST, q) => q }
    val filters = clauses.collect { case (Occur.FILTER, q) => q }
    val shoulds = clauses.collect { case (Occur.SHOULD, q) => q }
    val nots = clauses.collect { case (Occur.MUST_NOT, q) => q }

    def tagged(qs: Seq[Query]): DataFrame =
      qs.zipWithIndex.map { case (q, i) =>
        build(q, searchers).withColumn("tag", lit(i))
      }.reduce(_ unionByName _)

    val mustFrame: Option[DataFrame] =
      if (musts.isEmpty) None
      else Some(tagged(musts).groupBy("docId")
        .agg(sum("score").as("mscore"), countDistinct("tag").as("mcnt"))
        .filter(col("mcnt") === musts.size).drop("mcnt"))

    val shouldFrame: Option[DataFrame] =
      if (shoulds.isEmpty) None
      else Some(tagged(shoulds).groupBy("docId")
        .agg(sum("score").as("sscore"), countDistinct("tag").as("scnt")))

    var base: DataFrame = (mustFrame, shouldFrame) match {
      case (Some(m), Some(s)) =>
        val joinType = if (msm > 0) "inner" else "left_outer"
        val joined = m.join(s, Seq("docId"), joinType)
        val filtered =
          if (msm > 0) joined.filter(col("scnt") >= msm) else joined
        filtered.select(col("docId"),
          (col("mscore") + coalesce(col("sscore"), lit(0.0))).as("score"))
      case (Some(m), None) => m.withColumnRenamed("mscore", "score")
      case (None, Some(s)) =>
        s.filter(col("scnt") >= math.max(msm, 1))
          .select(col("docId"), col("sscore").as("score"))
      case (None, None) if filters.nonEmpty =>
        // filter-only boolean: matching docs at score 0, the Searcher's own
        // filter-only semantics (non-scoring clauses still select)
        build(filters.head, searchers)
          .select(col("docId"), lit(0.0).as("score"))
      case (None, None) => return searchers.head._1.scored(MatchNoDocsQuery)
    }
    filters.foreach { f =>
      base = base.join(build(f, searchers).select("docId"), Seq("docId"), "left_semi")
    }
    nots.foreach { n =>
      base = base.join(build(n, searchers).select("docId"), Seq("docId"), "left_anti")
    }
    base
  }
}
