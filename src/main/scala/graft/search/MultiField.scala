package graft.search

import graft.core._
import graft.index.InvertedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-field scoring over per-field indexes.
  *
  * The reference keys every index structure by field (postings, norms, stats
  * are all per-field — SURVEY.md §1.1); relationally each field is its own
  * index (a partition of the logical `(field, term)`-keyed postings table).
  * This module implements the two cross-field scored operators on top:
  *
  *  - [[combinedField]] — `CombinedFieldQuery` / BM25F
  *    (`lucene/core/src/java/org/apache/lucene/search/CombinedFieldQuery.java:98`):
  *    per-field term frequencies and field lengths are merged with field
  *    weights into ONE pseudo-field (`freq = Σ_f w_f·tf_f`,
  *    `dl = Σ_f w_f·len_f`), scored once with BM25 against blended collection
  *    statistics — so a match in a boosted short field (title) outranks the
  *    same tf in a long body, the BM25F model.
  *  - [[blendedTerm]] — `BlendedTermQuery`
  *    (`lucene/core/src/java/org/apache/lucene/search/BlendedTermQuery.java:47`):
  *    each field keeps its own length normalization but document frequency is
  *    blended across fields (max, the reference's default), and per-field
  *    scores are summed — the "same term, comparable idf across fields" model.
  */
object MultiField {

  /** Decoded hits of one term in one field's index: `(docId, freq, doclen)`.
    * One partition-pruned scan of that index's postings. */
  def termHits(index: InvertedIndex, term: String): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    index.postings
      .filter(col("term") === lit(term))
      .select(explode(col("blocks")).as("b"))
      .select("b.*")
      .as[PostingBlock]
      .mapPartitions { it =>
        it.flatMap { b =>
          val d = PostingsCodec.decodeBlock(b)
          Iterator.tabulate(d.docs.length)(i => (d.docs(i), d.freqs(i), d.doclens(i)))
        }
      }.toDF("docId", "freq", "doclen")
  }

  private def idf(docCount: Long, df: Long): Double =
    math.log(1 + (docCount - df + 0.5) / (df + 0.5))

  /** BM25F over a TERM SET: one blended-pseudo-field BM25 score per doc,
    * the reference's multi-term `CombinedFieldQuery` model
    * (`CombinedFieldQuery.java:309-328,405-440`): per-doc
    * `freq = Σ_{field,term} w_f·tf`, one merged norm `dl = Σ_f w_f·len_f`,
    * and ONE pseudo-term similarity whose `docFreq` is the MAX over every
    * (field, term) pair — a single BM25 evaluation per doc, exactly the
    * `CombinedFieldScorer` + `MultiNormsLeafSimScorer` composition.
    *
    * @param fields (field index, field weight); all indexes over the same doc
    *               set (docCount from the widest)
    */
  def combinedField(fields: Seq[(InvertedIndex, Double)], terms: Seq[String],
                    k1: Double, b: Double): DataFrame = {
    require(fields.nonEmpty && terms.nonEmpty)
    val distinctTerms = terms.distinct
    val docCount = fields.map(_._1.collectionStats.docCount).max
    // blended average length: Σ_f w_f · sumTTF_f / docCount
    val avgdl = fields.map { case (ix, w) => w * ix.collectionStats.sumTotalTermFreq }.sum / docCount
    // pseudo-term docFreq = max df over (field, term) pairs
    // (`CombinedFieldQuery.java:319`): RAM lookup on warm dictionaries,
    // otherwise a 1-row in-plan aggregate (no driver round-trip)
    val dfFrame: DataFrame =
      if (fields.forall(_._1.warmTermStats.isDefined)) {
        val d = fields.flatMap { case (ix, _) =>
          distinctTerms.map(t => ix.warmTermStats.get.get(t).map(_._1).getOrElse(0L))
        }.max
        fields.head._1.spark.range(1).select(lit(d.toDouble).as("dfv"))
      } else {
        fields.map { case (ix, _) =>
          ix.termStats.filter(col("term").isin(distinctTerms: _*))
            .agg(max(col("df")).as("m"))
        }.reduce(_ unionAll _)
          .agg(max(coalesce(col("m"), lit(0L))).cast("double").as("dfv"))
      }
    val perPair = fields.flatMap { case (ix, w) =>
      distinctTerms.map(t =>
        termHits(ix, t).select(col("docId"), (col("freq") * lit(w)).as("wfreq")))
    }
    val freqs = perPair.reduce(_ unionAll _)
      .groupBy("docId").agg(sum("wfreq").as("freq"))
    // The pseudo-field length sums ALL fields' weighted lengths — including
    // fields where the term did not match (the merged-norm semantics of
    // `CombinedFieldQuery`'s single length normalization) — but only for
    // MATCHED docs: each field's per-doc length joins against the (small)
    // matched set, so no full-corpus length aggregation ever runs.
    val withDl = fields.zipWithIndex.foldLeft(freqs) { case (acc, ((ix, w), i)) =>
      acc.join(ix.docs.select(col("docId"), (col("doclen") * lit(w)).as(s"wdl$i")),
        Seq("docId"), "left")
    }
    val dlExpr = fields.indices.map(i => coalesce(col(s"wdl$i"), lit(0.0))).reduce(_ + _)
    val union = withDl.select(col("docId"), col("freq"), dlExpr.as("dl"))
    val idfCol = log(lit(1.0) +
      (lit(docCount.toDouble) - col("dfv") + lit(0.5)) / (col("dfv") + lit(0.5)))
    union.crossJoin(broadcast(dfFrame))
      .select(col("docId"),
        (idfCol * (col("freq") / (col("freq") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))))
          .as("score"))
  }

  /** Single-term BM25F (the multi-term model with one term). */
  def combinedField(fields: Seq[(InvertedIndex, Double)], term: String,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    combinedField(fields, Seq(term), k1, b)

  /** BlendedTermQuery: per-field BM25 with blended (max) document frequency,
    * scores summed across fields. */
  def blendedTerm(fields: Seq[(InvertedIndex, Double)], term: String,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fields.nonEmpty)
    // One df lookup for ALL fields: warm (driver-resident) dictionaries are a
    // RAM read; otherwise the per-field stats scans union into a single plan
    // and a single action — not one driver round-trip per field.
    val dfs: Seq[Long] =
      if (fields.forall(_._1.warmTermStats.isDefined))
        fields.map { case (ix, _) => ix.warmTermStats.get.get(term).map(_._1).getOrElse(0L) }
      else {
        val tagged = fields.zipWithIndex.map { case ((ix, _), i) =>
          ix.termStats.filter(col("term") === lit(term))
            .select(lit(i).as("fieldIdx"), col("df"))
        }
        val found = tagged.reduce(_ unionAll _).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        fields.indices.map(i => found.getOrElse(i, 0L))
      }
    val blendedDf = dfs.max
    val scored = fields.map { case (ix, boost) =>
      val cs = ix.collectionStats
      val avgdl = cs.sumTotalTermFreq / cs.docCount.toDouble
      val w = idf(cs.docCount, math.min(blendedDf, cs.docCount)) * boost
      termHits(ix, term).select(col("docId"),
        (lit(w) * (col("freq") / (col("freq") + lit(k1) * (lit(1 - b) + lit(b) * col("doclen") / lit(avgdl)))))
          .as("score"))
    }
    scored.reduce(_ unionAll _)
      .groupBy("docId").agg(sum("score").as("score"))
  }

  /** FieldExistsQuery analog for an indexed field
    * (`lucene/core/src/java/org/apache/lucene/search/FieldExistsQuery.java:41`):
    * docs with at least one token in the field, constant-scored. */
  def fieldExists(index: InvertedIndex, boost: Double = 1.0): DataFrame =
    index.docs.filter(col("doclen") > 0)
      .select(col("docId"), lit(boost).as("score"))
}
