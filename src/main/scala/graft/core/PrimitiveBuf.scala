package graft.core

/** Growable primitive buffers for in-RAM postings accumulation — the
  * allocation-discipline analog of the reference's byte-slice pools
  * (`lucene/core/src/java/org/apache/lucene/index/ByteSlicePool.java`,
  * `FreqProxTermsWriterPerField.java:28`): Lucene pools postings bytes
  * precisely because per-posting object allocation makes indexing GC-bound
  * once writer-thread count grows. A boxed `ArrayBuffer[Long]` costs ~24
  * bytes per element in object overhead; these cost 8/4 with amortized
  * doubling, which keeps N concurrent segment builders' live set at
  * ~15 bytes/token instead of ~120 — the difference between GC-bound and
  * CPU-bound at 32 executor threads.
  */
final class LongBuf(initial: Int = 8) {
  private var arr = new Array[Long](initial)
  private var n = 0
  def length: Int = n
  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    arr(n) = v; n += 1
  }
  def apply(i: Int): Long = arr(i)
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)
}

final class IntBuf(initial: Int = 8) {
  private var arr = new Array[Int](initial)
  private var n = 0
  def length: Int = n
  def add(v: Int): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    arr(n) = v; n += 1
  }
  def addAll(vs: Array[Int], from: Int, len: Int): Unit = {
    while (n + len > arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    System.arraycopy(vs, from, arr, n, len); n += len
  }
  def apply(i: Int): Int = arr(i)
  /** logical reset without releasing the backing array (scratch reuse) */
  def reset(): Unit = n = 0
  /** increment element `i` in place (freq accumulation) */
  def bump(i: Int): Unit = arr(i) += 1
  /** copy of the slice [from, from+len) */
  def slice(from: Int, len: Int): Array[Int] =
    java.util.Arrays.copyOfRange(arr, from, from + len)
  def toArray: Array[Int] = java.util.Arrays.copyOf(arr, n)
}
