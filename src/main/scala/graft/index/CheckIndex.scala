package graft.index

import graft.core._
import org.apache.spark.sql.functions._

/** Index invariant validation — the analog of the reference's `CheckIndex`
  * (`lucene/core/src/java/org/apache/lucene/index/CheckIndex.java:571,1099-1121`):
  * per-postings-row structural checks (doc order, df = posting length,
  * sum(freq) = ttf, impact metadata dominates members, positions consistent
  * with freqs and doc length) plus cross-table statistics consistency.
  */
object CheckIndex {

  final case class Violation(check: String, detail: String)

  /** Run all checks; returns the list of violations (empty = healthy). */
  def check(index: InvertedIndex): Seq[Violation] = {
    val spark = index.spark
    import spark.implicits._
    val out = Vector.newBuilder[Violation]

    // 1. per-row structural invariants, validated distributed
    val rowViolations: Seq[String] = index.postings
      .select(col("term"), col("df"), col("ttf"), col("blocks"))
      .as[(String, Int, Long, Seq[PostingBlock])]
      .mapPartitions { it =>
        it.flatMap { case (term, df, ttf, blocks) =>
          val errs = Vector.newBuilder[String]
          var n = 0
          var sumFreq = 0L
          var prevLast = Long.MinValue
          blocks.foreach { b =>
            val d = PostingsCodec.decodeBlock(b, withPositions = b.positions.nonEmpty)
            n += d.docs.length
            if (d.docs.length != b.count) errs += s"$term: block count ${b.count} != ${d.docs.length}"
            if (b.firstDoc <= prevLast) errs += s"$term: blocks not doc-ordered"
            prevLast = b.lastDoc
            if (d.docs.head != b.firstDoc || d.docs.last != b.lastDoc)
              errs += s"$term: block header docs mismatch"
            var i = 0
            var prev = Long.MinValue
            var maxFreq = 0
            var minLen = Int.MaxValue
            while (i < d.docs.length) {
              if (d.docs(i) <= prev) errs += s"$term: docs not strictly increasing"
              prev = d.docs(i)
              if (d.freqs(i) < 1) errs += s"$term: freq < 1"
              sumFreq += d.freqs(i)
              if (d.freqs(i) > maxFreq) maxFreq = d.freqs(i)
              if (d.doclens(i) < minLen) minLen = d.doclens(i)
              if (d.positions.nonEmpty) {
                val ps = d.positions(i)
                if (ps.length != d.freqs(i)) errs += s"$term: positions count != freq"
                // doclens are byte-quantized (≤ true length), so positions are
                // only bounded by the next quantization level above it
                if (ps.nonEmpty && (ps.head < 0 ||
                    SmallFloat.intToByte4(ps.last) > SmallFloat.intToByte4(d.doclens(i))))
                  errs += s"$term: position out of doc length range"
                var k = 1
                while (k < ps.length) {
                  if (ps(k) <= ps(k - 1)) errs += s"$term: positions not increasing"
                  k += 1
                }
              }
              i += 1
            }
            if (maxFreq != b.maxFreq) errs += s"$term: maxFreq ${b.maxFreq} != $maxFreq"
            if (SmallFloat.intToByte4(minLen) != b.minDlb)
              errs += s"$term: minDlb mismatch"
            // competitive-impact frontier must dominate every posting
            if (b.impFreqs.isEmpty || b.impFreqs.length != b.impDlbs.length)
              errs += s"$term: malformed impact frontier"
            else {
              i = 0
              while (i < d.docs.length) {
                var dominated = false
                var j = 0
                while (j < b.impFreqs.length && !dominated) {
                  if (b.impFreqs(j) >= d.freqs(i) &&
                      SmallFloat.byte4ToInt(b.impDlbs(j)) <= d.doclens(i)) dominated = true
                  j += 1
                }
                if (!dominated) errs += s"$term: posting (${d.freqs(i)},${d.doclens(i)}) not dominated by impact frontier"
                i += 1
              }
            }
          }
          if (n != df) errs += s"$term: df $df != posting length $n"
          if (sumFreq != ttf) errs += s"$term: ttf $ttf != sum(freq) $sumFreq"
          errs.result()
        }
      }.take(100).toSeq
    rowViolations.foreach(v => out += Violation("postings-row", v))

    // 2. term_stats consistency: global df/ttf == sum of per-row partials
    val statsDiff = index.postings.groupBy("term")
      .agg(sum("df").as("df2"), sum("ttf").as("ttf2"))
      .join(index.termStats, "term")
      .filter(col("df") =!= col("df2") || col("ttf") =!= col("ttf2"))
      .count()
    if (statsDiff > 0) out += Violation("term-stats", s"$statsDiff terms with inconsistent global stats")

    // 3. collection stats vs docs table
    val docAgg = index.docs.agg(
      org.apache.spark.sql.functions.count(lit(1)).as("n"),
      sum("doclen").as("sumdl")).collect()(0)
    if (docAgg.getLong(0) != index.collectionStats.docCount)
      out += Violation("collection-stats", s"docCount ${index.collectionStats.docCount} != docs rows ${docAgg.getLong(0)}")
    if (docAgg.getLong(1) != index.collectionStats.sumTotalTermFreq)
      out += Violation("collection-stats", s"sumTotalTermFreq mismatch")

    // 4. every doc id unique
    val dupDocs = index.docs.groupBy("docId")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    if (dupDocs > 0) out += Violation("docs", s"$dupDocs duplicate doc ids")

    out.result()
  }
}
