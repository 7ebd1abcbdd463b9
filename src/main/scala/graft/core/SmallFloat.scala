package graft.core

/** Lossy small-float encodings used for per-document length norms.
  *
  * Re-implements (from the documented semantics, not the code) the encoding
  * Lucene uses for BM25 length norms: an int document length is quantized to
  * one byte such that values 0..23 are exact and larger values keep 4
  * significant bits, preserving ordering. Reference behavior:
  * `lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-165`.
  *
  * Score parity with the reference (SURVEY.md §2.6) requires this exact
  * quantization: BM25 reads document length back through a 256-entry decode
  * table, so the byte — not the true length — is the scoring input.
  */
object SmallFloat {

  /** Order-preserving 4-significant-bit float-like encoding of a positive long.
    * Values 0..7 are "subnormal" (exact); larger values keep the top 4 bits
    * and encode the shift in the high bits of the result.
    */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"Only supports positive values, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) {
      i.toInt
    } else {
      val shift = numBits - 4
      // keep 3 explicit mantissa bits (top bit implicit), encode shift+1 above
      (((i >>> shift).toInt) & 0x07) | ((shift + 1) << 3)
    }
  }

  /** Inverse of [[longToInt4]] (lossy: returns the smallest long mapping to
    * the given encoded value). */
  def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4: Int = longToInt4(Int.MaxValue)
  /** 255 - longToInt4(Int.MaxValue): low values below this are stored exactly. */
  val NumFreeValues: Int = 255 - MaxInt4

  /** Quantize a non-negative int to one byte: exact below [[NumFreeValues]]
    * (= 24), then 4-significant-bit lossy, order-preserving. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"Only supports positive values, got $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4(i - NumFreeValues.toLong)).toByte
  }

  /** Decode a byte produced by [[intToByte4]]. */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val decoded = NumFreeValues + int4ToLong(i - NumFreeValues)
      math.toIntExact(decoded)
    }
  }

  /** Decode table for all 256 byte values (index by `b & 0xFF`). */
  val LengthTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))
}
