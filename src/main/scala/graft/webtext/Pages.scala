package graft.webtext

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style web page — the exact input shape fixed by the
  * north rule (`BASELINE.json input_hint`):
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic webtext corpus (FIXTURES.md §1).
  *
  * Every page is a pure function of `(seed, i)` — independent of Spark
  * partitioning, task order, or parallelism — so the same `(seed, nDocs)`
  * yields byte-identical corpora at `local[8]` and `local[32]`, which is what
  * makes the two-parallelism scaling benchmark (BASELINE.md §2) an
  * apples-to-apples comparison, and what makes resume tests reproducible.
  *
  * Statistical shape mirrors the reference's benchmark corpora
  * (`lucene/benchmark/conf/indexing.alg:56`, `lucene/test-framework/src/java/
  * org/apache/lucene/tests/util/LineFileDocs.java:61`) adapted to webtext:
  *  - ~30k-word vocabulary, Zipf-distributed (s ≈ 1.07) — a realistic
  *    df skew with head terms whose posting lists are ~corpus-sized, which is
  *    exactly what the salted merge shuffle must survive;
  *  - doc length log-normal (configurable mean, long tail past the exact
  *    range of `SmallFloat.intToByte4`, values > 39 lossy —
  *    `lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:147`);
  *  - a small forced head-term set present in > 50% of docs;
  *  - `html` is well-formed markup wrapping `text`, so
  *    `HtmlStrip(html) == text` byte-identically (the per-row invariant).
  */
object PageGen {

  final case class Params(
      seed: Long = 42L,
      vocabSize: Int = 30000,
      zipfS: Double = 1.07,
      meanLen: Int = 400,
      sigma: Double = 0.7,
      maxLen: Int = 12000,
      nHosts: Int = 997,
      headTerms: Int = 5,
      headProb: Double = 0.6)

  /** Vocabulary word `j`: short pronounceable-ish token, deterministic. */
  def word(j: Int): String = {
    val b = new StringBuilder
    var v = j
    val cons = "bcdfgklmnprstvz"
    val vow = "aeiou"
    b.append(cons.charAt(v % cons.length)); v /= cons.length
    b.append(vow.charAt(v % vow.length)); v /= vow.length
    while (v > 0) {
      b.append(cons.charAt(v % cons.length)); v /= cons.length
      if (v > 0) { b.append(vow.charAt(v % vow.length)); v /= vow.length }
    }
    b.toString
  }

  /** Cumulative Zipf distribution over the vocabulary (driver-computed once,
    * broadcast with the generator closure — ~240 KB at 30k words). */
  def zipfCdf(p: Params): Array[Double] = {
    val w = Array.tabulate(p.vocabSize)(j => 1.0 / math.pow(j + 1.0, p.zipfS))
    val total = w.sum
    val cdf = new Array[Double](p.vocabSize)
    var acc = 0.0
    var j = 0
    while (j < p.vocabSize) { acc += w(j) / total; cdf(j) = acc; j += 1 }
    cdf(p.vocabSize - 1) = 1.0
    cdf
  }

  private def sampleZipf(cdf: Array[Double], u: Double): Int = {
    var lo = 0; var hi = cdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cdf(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Page `i`'s url — computable without generating the page body, which is
    * what lets doc-id assignment shuffle (url, ordinal) pairs instead of full
    * page payloads (late materialization; see WebIndex.buildGenerated). */
  def urlOf(i: Long, p: Params): String = s"https://site${i % p.nHosts}.example/p/$i"

  /** Page `i`'s language — an independent deterministic stream so metadata is
    * derivable without generating the page body. */
  def langOf(i: Long, p: Params): String = {
    val rnd = new java.util.Random(p.seed * 7654321L + i * 31L + 17L)
    if (rnd.nextDouble() < 0.95) "en" else Seq("de", "fr", "es")(rnd.nextInt(3))
  }

  def tsOf(i: Long): java.sql.Timestamp = new java.sql.Timestamp(1600000000000L + i * 1000L)

  /** Generate page `i` purely from `(p.seed, i)`. */
  def page(i: Long, p: Params, cdf: Array[Double]): Page = {
    val text = textOf(i, p, cdf)
    // title lives in an attribute so tag-stripping yields exactly `text`
    // (HtmlStrip keeps element text content; <title>x</title> would leak "x")
    val html = (s"""<html><head><meta name="title" content="page $i"/>""" +
      "<!-- warc synthetic --></head><body><p>" +
      text + "</p></body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(urlOf(i, p), tsOf(i), html, text, langOf(i, p))
  }

  /** Page `i`'s text only — skips the html payload (index-build input path). */
  def textOf(i: Long, p: Params, cdf: Array[Double]): String = {
    val rnd = new java.util.Random(p.seed * 1000003L + i)
    val len = math.min(p.maxLen,
      math.max(1, math.round(math.exp(math.log(p.meanLen.toDouble) - p.sigma * p.sigma / 2
        + p.sigma * rnd.nextGaussian())).toInt))
    val sb = new StringBuilder(len * 6)
    // forced head terms (> 50% of docs) — the merge-skew driver
    var h = 0
    while (h < p.headTerms) {
      if (rnd.nextDouble() < p.headProb) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append("hw").append(h)
      }
      h += 1
    }
    var t = 0
    while (t < len) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(word(sampleZipf(cdf, rnd.nextDouble())))
      t += 1
    }
    sb.toString
  }

  /** Distributed deterministic corpus: `spark.range` → pure per-row map. */
  def synthesize(spark: SparkSession, nDocs: Long, nPartitions: Int,
                 p: Params = Params()): Dataset[Page] = {
    import spark.implicits._
    val cdf = zipfCdf(p)
    spark.range(0, nDocs, 1, nPartitions).map(i => page(i, p, cdf))
  }

  /** The reference query set (FIXTURES.md §2): a deterministic mix of
    * term / boolean / phrase / prefix / range queries over the corpus
    * vocabulary, modeled on `lucene/benchmark/conf/query-terms.txt` and
    * `query-phrases.txt`. */
  def querySet(p: Params = Params()): Seq[graft.search.Query] = {
    import graft.search._
    val rnd = new java.util.Random(p.seed ^ 0x5EED)
    def headT = "hw" + rnd.nextInt(p.headTerms)
    def zipfT(maxRank: Int) = word(rnd.nextInt(maxRank))
    val terms: Seq[Query] =
      (0 until 5).map(_ => TermQuery(headT)) ++
      (0 until 10).map(_ => TermQuery(zipfT(2000))) ++
      (0 until 4).map(_ => TermQuery(zipfT(p.vocabSize))) ++
      Seq(TermQuery("absentterm0"))
    val bools: Seq[Query] = (0 until 20).map { k =>
      val n = 2 + rnd.nextInt(3)
      val ts = (0 until n).map(_ => zipfT(3000))
      k % 4 match {
        case 0 => BooleanQuery.must(ts.map(TermQuery): _*)
        case 1 => BooleanQuery.should(ts.map(TermQuery): _*)
        case 2 => BooleanQuery(Seq(Occur.MUST -> TermQuery(ts.head),
          Occur.MUST_NOT -> TermQuery(ts.last)))
        case _ => BooleanQuery(ts.map(t => Occur.SHOULD -> TermQuery(t)),
          minimumShouldMatch = 2)
      }
    }
    val phrases: Seq[Query] = (0 until 10).map { _ =>
      PhraseQuery(Seq(zipfT(300), zipfT(300)))
    }
    val prefixes: Seq[Query] = (0 until 5).map(_ => PrefixQuery(zipfT(500).take(2)))
    val ranges: Seq[Query] = (0 until 5).map { _ =>
      val a = word(rnd.nextInt(p.vocabSize)); val b = word(rnd.nextInt(p.vocabSize))
      TermRangeQuery(Some(if (a < b) a else b), Some(if (a < b) b else a), true, true)
    }
    terms ++ bools ++ phrases ++ prefixes ++ ranges
  }
}
