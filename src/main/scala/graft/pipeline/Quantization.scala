package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar quantization of float vectors to `bits`-bit bytes — the
  * reference's `ScalarQuantizer` / `ScalarQuantizedVectorSimilarity` model
  * (`lucene/core/src/java/org/apache/lucene/util/quantization/ScalarQuantizer.java:37-113`,
  * `ScalarQuantizedVectorSimilarity.java:80-89`,
  * `DefaultVectorUtilSupport.java:269-311`), re-expressed over columns:
  *
  *   byte  = round(scale · (clamp(v) − minQ))         scale = (2^bits−1)/(maxQ−minQ)
  *   v̂     = byte · α + minQ                           α     = (maxQ−minQ)/(2^bits−1)
  *   v₁·v₂ ≈ dot(b₁,b₂)·α² + off₁ + off₂               off   = Σ minQ·(v − minQ/2) + (dx − dxq)·dxq
  *
  * so a stored vector is `(bytes, off)` and similarity needs only an integer
  * dot product plus two precomputed corrections — 4× smaller vectors and
  * integer kernels, the reason the reference makes this its default vector
  * format. Cosine mode unit-normalizes first and scores
  * `max((1 + adjusted)/2, 0)`, exactly the reference's `DotProduct` scorer.
  *
  * Arithmetic here is double end-to-end (the gate's DuckDB oracle replays it
  * exactly); the reference computes in float32 — QuantizationSpec quantifies
  * that divergence on the fixture corpus (byte-level mismatch count).
  *
  * Scale shape: `fit` at confidence 1.0 is one min/max aggregate over the
  * corpus; at c < 1 it samples a bounded 25k vectors (the reference's own
  * `SCALAR_QUANTIZATION_SAMPLE_SIZE`) by hash order — deterministic and
  * driver-bounded by construction. `quantizeAll` is a stateless projection;
  * `quantizedTopK` is one scan + TakeOrdered, composable with the IVF lists
  * in [[Ann]] the same way the reference pairs quantization with HNSW.
  */
object Quantization {

  /** Quantizer state. Mirrors the reference constructor: equal quantiles
    * widen by the divisor on both sides (alpha = scale = 1). */
  final case class SQ(minQuantile: Double, maxQuantile: Double, bits: Int) extends Serializable {
    require(bits > 0 && bits <= 8, s"bits must be in [1,8], got $bits")
    require(maxQuantile >= minQuantile)
    val divisor: Double = ((1 << bits) - 1).toDouble
    val (lo, hi): (Double, Double) =
      if (minQuantile == maxQuantile) (minQuantile - divisor, maxQuantile + divisor)
      else (minQuantile, maxQuantile)
    val scale: Double = divisor / (hi - lo)
    val alpha: Double = (hi - lo) / divisor

    /** Quantize one vector: bytes + the corrective offset
      * (`DefaultVectorUtilSupport.quantizeFloat`: the `minQ·(v − minQ/2)`
      * global term plus the `(dx − dxq)·dxq` rounding-loss term, summed). */
    def quantize(v: Array[Double]): (Array[Byte], Double) = {
      val dest = new Array[Byte](v.length)
      var corr = 0.0
      var i = 0
      while (i < v.length) {
        val x = v(i)
        val dx = x - lo
        val dxc = math.max(lo, math.min(hi, x)) - lo
        val b = math.floor(scale * dxc + 0.5) // Math.round semantics for dxc >= 0
        dest(i) = b.toByte
        val dxq = b * alpha
        corr += lo * (x - lo / 2.0) + (dx - dxq) * dxq
        i += 1
      }
      (dest, corr)
    }

    /** Dequantize (the reference's `v̂ = α·byte + minQ`). */
    def dequantize(b: Array[Byte]): Array[Double] =
      b.map(x => alpha * (x & 0xff) + lo)
  }

  /** The reference's bounded sample size (`ScalarQuantizer.java:77`). */
  val SampleSize = 25000
  private val ScratchVectors = 20 // reference SCRATCH_SIZE

  /** L2-normalize a vector column into `Array[Double]` — cosine mode's
    * precondition (the reference asserts unit vectors for COSINE and then
    * scores as dot product). */
  def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val normUdf = udf((v: Seq[Float]) => {
      var s = 0.0
      v.foreach(x => s += x.toDouble * x.toDouble)
      val n = math.sqrt(s)
      if (n == 0) v.map(_.toDouble).toArray else v.map(_.toDouble / n).toArray
    })
    df.select(col(idCol).as("id"), normUdf(col(vecCol)).as("v"))
  }

  /** Fit quantiles. `confidence == 1.0` is an exact global min/max aggregate
    * (one pass, fully distributed). `confidence < 1` mirrors
    * `ScalarQuantizer.fromVectors`: a deterministic (hash-ordered) sample of
    * at most [[SampleSize]] vectors, batched in groups of 20, per-batch
    * trimmed min/max at `selectorIndex = ⌊len·(1−c)/2 + 0.5⌋`
    * (`getUpperAndLowerQuantile`, `ScalarQuantizer.java:556-576`), averaged
    * across batches. */
  def fit(normalized: DataFrame, bits: Int, confidence: Double): SQ = {
    require(confidence > 0 && confidence <= 1.0)
    if (confidence == 1.0) {
      val row = normalized
        .select(explode(col("v")).as("x"))
        .agg(min("x").as("mn"), max("x").as("mx"))
        .head()
      SQ(row.getDouble(0), row.getDouble(1), bits)
    } else {
      // bounded, deterministic sample — same cap as the reference
      val sample = normalized
        .withColumn("h", xxhash64(col("id")))
        .orderBy("h")
        .limit(SampleSize)
        .select("v")
        .collect()
        .map(_.getSeq[Double](0).toArray)
      var lowerSum = 0.0
      var upperSum = 0.0
      var batches = 0
      sample.grouped(ScratchVectors).foreach { group =>
        if (group.length == ScratchVectors || sample.length < ScratchVectors) {
          val arr = group.flatten.sorted
          val sel =
            if (arr.length <= 2) 0
            else (arr.length * (1.0 - confidence) / 2.0 + 0.5).toInt
          lowerSum += arr(sel)
          upperSum += arr(arr.length - 1 - sel)
          batches += 1
        }
        // (partial trailing batches are dropped, like the reference's scratch)
      }
      SQ(lowerSum / batches, upperSum / batches, bits)
    }
  }

  /** Quantize every vector: `(id, qvec: binary, qoff: double)` — the stored
    * form (`QuantizedByteVectorValues`: bytes beside a per-vector score
    * correction). A stateless projection; no shuffle. */
  def quantizeAll(normalized: DataFrame, sq: SQ): DataFrame = {
    val qUdf = udf((v: Seq[Double]) => {
      val (b, c) = sq.quantize(v.toArray)
      (b, c)
    })
    normalized.select(col("id"), qUdf(col("v")).as("q"))
      .select(col("id"), col("q._1").as("qvec"), col("q._2").as("qoff"))
  }

  /** Quantized cosine top-k around `queryId`: integer dot product over the
    * byte vectors plus the two corrective offsets, scored
    * `max((1 + dot·α² + offQ + offD)/2, 0)` — the reference `DotProduct`
    * scorer. One scan + TakeOrdered. */
  def quantizedTopK(quantized: DataFrame, sq: SQ, queryId: Long, k: Int): DataFrame = {
    val qRow = quantized.filter(col("id") === queryId).select("qvec", "qoff").head()
    val qVec = qRow.getAs[Array[Byte]](0)
    val qOff = qRow.getDouble(1)
    val alpha2 = sq.alpha * sq.alpha
    val scoreUdf = udf((b: Array[Byte], off: Double) => {
      var dp = 0L
      var i = 0
      while (i < b.length) { dp += (b(i) & 0xff).toLong * (qVec(i) & 0xff).toLong; i += 1 }
      math.max((1.0 + dp * alpha2 + qOff + off) / 2.0, 0.0)
    })
    quantized.filter(col("id") =!= queryId)
      .select(col("id"), scoreUdf(col("qvec"), col("qoff")).as("qscore"))
      .orderBy(desc("qscore"), col("id").asc)
      .limit(k)
  }

  /** Scale path: quantized scan selects `rerank` candidates, exact cosine
    * re-scores them, top-k of the exact scores — the reference's
    * quantized-then-rescore serving shape. */
  def quantizedTopKRescored(normalized: DataFrame, quantized: DataFrame, sq: SQ,
                            queryId: Long, k: Int, rerank: Int): DataFrame = {
    val candidates = quantizedTopK(quantized, sq, queryId, rerank).select("id")
    val qv = normalized.filter(col("id") === queryId).select("v").head().getSeq[Double](0).toArray
    val cosUdf = udf((v: Seq[Double]) => {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * qv(i); i += 1 }
      s // inputs are unit vectors: dot == cosine
    })
    normalized.join(candidates, "id")
      .select(col("id"), cosUdf(col("v")).as("cos"))
      .orderBy(desc("cos"), col("id").asc)
      .limit(k)
  }
}
