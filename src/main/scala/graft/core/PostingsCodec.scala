package graft.core

/** Variable-byte encoding for non-negative ints/longs (7 bits per byte, high
  * bit = continuation). Same scheme as the reference's VInt/VLong
  * (`lucene/core/src/java/org/apache/lucene/store/DataOutput.java`), written
  * from the public spec.
  */
object VByte {
  def encodedSize(x: Long): Int = {
    var v = x; var n = 1
    while ((v & ~0x7FL) != 0) { v >>>= 7; n += 1 }
    n
  }

  def encodeLongs(xs: Array[Long]): Array[Byte] = {
    var size = 0
    var i = 0
    while (i < xs.length) { size += encodedSize(xs(i)); i += 1 }
    val out = new Array[Byte](size)
    var o = 0
    i = 0
    while (i < xs.length) {
      var v = xs(i)
      while ((v & ~0x7FL) != 0) {
        out(o) = ((v & 0x7F) | 0x80).toByte; o += 1; v >>>= 7
      }
      out(o) = v.toByte; o += 1
      i += 1
    }
    out
  }

  def encode(xs: Array[Int]): Array[Byte] = {
    val longs = new Array[Long](xs.length)
    var i = 0
    while (i < xs.length) { longs(i) = xs(i).toLong; i += 1 }
    encodeLongs(longs)
  }

  /** Decode exactly `n` long values from `bytes` starting at offset 0. */
  def decodeLongs(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var o = 0
    var i = 0
    while (i < n) {
      var b = bytes(o); o += 1
      var v = (b & 0x7F).toLong
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(o); o += 1
        v |= (b & 0x7F).toLong << shift
        shift += 7
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** Decode exactly `n` int values. */
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var o = 0
    var i = 0
    while (i < n) {
      var b = bytes(o); o += 1
      var v = b & 0x7F
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(o); o += 1
        v |= (b & 0x7F) << shift
        shift += 7
      }
      out(i) = v
      i += 1
    }
    out
  }
}

/** One compressed posting block: ≤ [[PostingsCodec.BlockSize]] documents of a
  * single term, with skip/impact metadata for block-max pruning.
  *
  * Logical re-expression of the reference's 128-doc posting blocks + level-0
  * skip entries + competitive impacts
  * (`lucene/core/src/java/org/apache/lucene/codecs/lucene103/Lucene103PostingsFormat.java:343-353`,
  * `lucene/core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java:27`).
  *
  * Doc ids are *global external* ids (no per-segment renumbering): the
  * relational layout has no dense-int requirement, which removes the
  * reference's docBase-rebase step from merges entirely.
  *
  * `maxFreq` and `minDlb` (the norm byte of the shortest doc in the block)
  * give a conservative per-block score upper bound: BM25 is monotone
  * increasing in freq and decreasing in doc length, so
  * score(maxFreq, minDlb) ≥ any member's score. (The reference keeps a
  * pareto frontier of (freq, norm) pairs for a tighter bound; this single
  * pair is looser but always valid.)
  *
  * Per-doc lengths are stored as the reference's one-byte SmallFloat norm
  * (`lucene/core/src/java/org/apache/lucene/index/IndexingChain.java` norms;
  * `BM25Similarity` scores against the byte, not the true length), so scoring
  * runs join-free at one byte per posting. Exact lengths live once per doc in
  * the `docs` table, not once per posting.
  *
  * @param firstDoc  first doc id in the block
  * @param lastDoc   last doc id (inclusive) — enables doc-range skipping
  * @param count     number of documents in the block
  * @param maxFreq   max term frequency within the block
  * @param minDlb    norm byte of the shortest doc in the block
  * @param docDeltas VByte doc-id gaps (first value 0, relative to firstDoc)
  * @param freqs     VByte term frequencies (≥ 1)
  * @param dlbs      raw SmallFloat norm byte per member doc (count bytes)
  * @param positions VByte per-doc position deltas, concatenated in doc order;
  *                  doc i contributes freqs(i) values (delta vs previous
  *                  position in the doc, first absolute). Empty when positions
  *                  are not indexed.
  */
final case class PostingBlock(
    firstDoc: Long,
    lastDoc: Long,
    count: Int,
    maxFreq: Int,
    minDlb: Byte,
    docDeltas: Array[Byte],
    freqs: Array[Byte],
    dlbs: Array[Byte],
    positions: Array[Byte])

/** Decoded view of one block.
  * `doclens(i)` is the QUANTIZED doc length `byte4ToInt(dlbs(i))` — the same
  * value the reference's BM25 reads back through its 256-entry norm cache. */
final case class DecodedBlock(
    docs: Array[Long],
    freqs: Array[Int],
    doclens: Array[Int],
    /** positions(i) = positions of the term in doc i (empty if not decoded) */
    positions: Array[Array[Int]])

object PostingsCodec {
  /** Docs per block; matches the reference's BLOCK_SIZE
    * (`Lucene103PostingsFormat.java:343`). */
  val BlockSize = 128

  /** Blocks per postings-table row (level-1 skip granularity analog,
    * `Lucene103PostingsFormat.java:348-353`: 32 blocks = 4096 docs). Bounds
    * row payload size so head terms never materialize as one giant row. */
  val BlocksPerRow = 32

  /** Encode one term's postings (sorted by doc id, doc-unique) into blocks.
    * `doclens(i)` is the token count of doc `docs(i)` (exact or already
    * quantized — quantization is idempotent).
    * `positions` may be null for docs/freqs-only indexing.
    */
  def encodeBlocks(
      docs: Array[Long],
      freqs: Array[Int],
      doclens: Array[Int],
      positions: Array[Array[Int]]): Vector[PostingBlock] = {
    require(docs.length == freqs.length && docs.length == doclens.length)
    val out = Vector.newBuilder[PostingBlock]
    var start = 0
    while (start < docs.length) {
      val end = math.min(start + BlockSize, docs.length)
      val n = end - start
      val deltas = new Array[Long](n)
      val fr = new Array[Int](n)
      val dlb = new Array[Byte](n)
      var maxFreq = 0
      var minLen = Int.MaxValue
      var minDlb: Byte = 0
      var prev = docs(start)
      var i = 0
      while (i < n) {
        val d = docs(start + i)
        deltas(i) = d - prev
        prev = d
        fr(i) = freqs(start + i)
        val dl = doclens(start + i)
        dlb(i) = SmallFloat.intToByte4(dl)
        if (fr(i) > maxFreq) maxFreq = fr(i)
        if (dl < minLen) { minLen = dl; minDlb = dlb(i) }
        i += 1
      }
      val posBytes =
        if (positions eq null) Array.emptyByteArray
        else {
          var total = 0
          var j = start
          while (j < end) { total += positions(j).length; j += 1 }
          val flat = new Array[Int](total)
          var o = 0
          j = start
          while (j < end) {
            val ps = positions(j)
            var prevPos = 0
            var k = 0
            while (k < ps.length) {
              flat(o) = ps(k) - prevPos; prevPos = ps(k); o += 1; k += 1
            }
            j += 1
          }
          VByte.encode(flat)
        }
      out += PostingBlock(
        firstDoc = docs(start),
        lastDoc = docs(end - 1),
        count = n,
        maxFreq = maxFreq,
        minDlb = minDlb,
        docDeltas = VByte.encodeLongs(deltas),
        freqs = VByte.encode(fr),
        dlbs = dlb,
        positions = posBytes)
      start = end
    }
    out.result()
  }

  /** Doc-ids-only decode (delta chain; freqs/norms/positions untouched) —
    * for constant-score doc-set paths (term expansion, field-exists) where
    * decoding the full block would triple the work. */
  def decodeDocIds(b: PostingBlock): Array[Long] = {
    val deltas = VByte.decodeLongs(b.docDeltas, b.count)
    val docs = new Array[Long](b.count)
    var acc = b.firstDoc
    var i = 0
    while (i < b.count) { acc += deltas(i); docs(i) = acc; i += 1 }
    docs
  }

  def decodeBlock(b: PostingBlock, withPositions: Boolean = false): DecodedBlock = {
    val deltas = VByte.decodeLongs(b.docDeltas, b.count)
    val docs = new Array[Long](b.count)
    var acc = b.firstDoc
    var i = 0
    while (i < b.count) { acc += deltas(i); docs(i) = acc; i += 1 }
    val freqs = VByte.decode(b.freqs, b.count)
    val doclens = new Array[Int](b.count)
    i = 0
    while (i < b.count) { doclens(i) = SmallFloat.LengthTable(b.dlbs(i) & 0xFF); i += 1 }
    val positions =
      if (!withPositions || b.positions.isEmpty) Array.empty[Array[Int]]
      else {
        var total = 0
        i = 0
        while (i < b.count) { total += freqs(i); i += 1 }
        val flat = VByte.decode(b.positions, total)
        val out = new Array[Array[Int]](b.count)
        var o = 0
        i = 0
        while (i < b.count) {
          val ps = new Array[Int](freqs(i))
          var prevPos = 0
          var k = 0
          while (k < ps.length) { prevPos += flat(o); ps(k) = prevPos; o += 1; k += 1 }
          out(i) = ps
          i += 1
        }
        out
      }
    DecodedBlock(docs, freqs, doclens, positions)
  }
}
