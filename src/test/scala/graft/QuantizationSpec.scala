package graft

import graft.pipeline.{Ann, Quantization}
import graft.pipeline.Quantization.SQ
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar quantization vs the reference `ScalarQuantizer` model: constructor
  * edge cases, the round-trip error bound, corrective-offset accuracy,
  * quantized-top-k recall and the rescore path on the fixture embeddings,
  * determinism of the sampled c<1 fit, and a quantified float32-vs-double
  * divergence (the engine computes in double; the reference in float). */
class QuantizationSpec extends AnyFunSuite {
  import SparkTestEnv._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val nv = Quantization.normalized(emb, "vec_id", "embedding").cache()
  private lazy val sq = Quantization.fit(nv, bits = 7, confidence = 1.0)
  private lazy val quantized = Quantization.quantizeAll(nv, sq).cache()

  test("equal quantiles widen by the divisor on each side (reference constructor)") {
    // the reference comment claims alpha = scale = 1, but its code widens by
    // divisor on BOTH sides → range 2·divisor → alpha = 2, scale = 0.5; this
    // engine reproduces the CODE
    val s = SQ(3.0, 3.0, 7)
    assert(s.lo == 3.0 - 127 && s.hi == 3.0 + 127)
    assert(s.alpha == 2.0 && s.scale == 0.5)
  }

  test("round-trip error is bounded by alpha/2 on in-range values") {
    val s = SQ(-1.0, 1.0, 7)
    val rnd = new scala.util.Random(3)
    val v = Array.fill(256)(rnd.nextDouble() * 2 - 1)
    val (b, _) = s.quantize(v)
    val back = s.dequantize(b)
    v.zip(back).foreach { case (x, y) =>
      assert(math.abs(x - y) <= s.alpha / 2 + 1e-12, s"$x vs $y")
    }
  }

  test("quantized dot with corrective offsets approximates the true dot") {
    val rnd = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val vecs = Array.fill(40)(unit())
    val mn = vecs.flatten.min
    val mx = vecs.flatten.max
    val s = SQ(mn, mx, 7)
    val qs = vecs.map(s.quantize)
    val alpha2 = s.alpha * s.alpha
    for (i <- vecs.indices; j <- i + 1 until vecs.length) {
      val exact = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      var dp = 0L
      val (bi, oi) = qs(i)
      val (bj, oj) = qs(j)
      var d = 0
      while (d < 64) { dp += (bi(d) & 0xff).toLong * (bj(d) & 0xff).toLong; d += 1 }
      val approx = dp * alpha2 + oi + oj
      assert(math.abs(approx - exact) < 0.02, s"pair ($i,$j): $approx vs $exact")
    }
  }

  test("quantized top-k recall vs exact cosine on the fixture") {
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Quantization.quantizedTopK(quantized, sq, queryId = 0L, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = (exact & quant).size / 10.0
    assert(recall >= 0.8, s"recall $recall, quantized $quant vs exact $exact")
  }

  test("rescored path recovers the exact top-k from a quantized candidate set") {
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(r => r.getLong(0)).toSeq
    val rescored = Quantization.quantizedTopKRescored(nv, quantized, sq,
        queryId = 0L, k = 10, rerank = 100)
      .collect().map(_.getLong(0)).toSeq
    assert(rescored == exact)
  }

  test("sampled fit (c < 1) is deterministic and narrower than the full range") {
    val a = Quantization.fit(nv, bits = 7, confidence = 0.95)
    val b = Quantization.fit(nv, bits = 7, confidence = 0.95)
    assert(a == b)
    assert(a.minQuantile >= sq.minQuantile - 1e-12)
    assert(a.maxQuantile <= sq.maxQuantile + 1e-12)
    assert(a.maxQuantile > a.minQuantile)
  }

  test("float32-vs-double divergence is quantified (reference computes in float)") {
    // replay quantizeFloat in float32 and count byte disagreements with the
    // engine's double path over the whole fixture corpus
    val loF = sq.lo.toFloat
    val hiF = sq.hi.toFloat
    val scaleF = (127.0f / (hiF - loF))
    val rows = nv.collect().map(_.getSeq[Double](1).toArray)
    var mismatches = 0L
    var total = 0L
    rows.foreach { v =>
      val (bD, _) = sq.quantize(v)
      v.zipWithIndex.foreach { case (x, i) =>
        val xF = x.toFloat
        val dxcF = math.max(loF, math.min(hiF, xF)) - loF
        val bF = Math.round(scaleF * dxcF).toByte
        total += 1
        if (bF != bD(i)) mismatches += 1
      }
    }
    val rate = mismatches.toDouble / total
    assert(rate < 0.01, s"float/double byte divergence $mismatches/$total = $rate")
  }
}
