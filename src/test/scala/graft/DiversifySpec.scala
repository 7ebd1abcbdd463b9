package graft

import graft.search.Diversify
import org.scalatest.funsuite.AnyFunSuite

/** [[Diversify.diversifiedTopK]] vs a faithful sequential model of the
  * reference's `DiversifiedTopDocsCollector` (linked per-key + global
  * priority queues, `DiversifiedTopDocsCollector.java:105-160`), fuzzed over
  * random scored corpora. Proves the relational form — per-key top-M then
  * global top-k — computes the collector's exact result set. */
class DiversifySpec extends AnyFunSuite {

  /** Sequential reference model: docs arrive in docId order (as a collector
    * sees them); the per-key queue of size m gates entry to the global queue
    * of size k; a per-key eviction also leaves the global queue. Ordering is
    * (score desc, docId asc), like TopScoreDocCollector. */
  private def collectorModel(docs: Seq[(Long, Double, String)], m: Int, k: Int): Seq[(Long, Double, String)] = {
    val ord = Ordering.by[(Long, Double, String), (Double, Long)] { case (d, s, _) => (-s, d) }
    var global = Vector.empty[(Long, Double, String)] // kept sorted best-first
    val perKey = scala.collection.mutable.Map.empty[String, Vector[(Long, Double, String)]]
    docs.sortBy(_._1).foreach { doc =>
      // global competitiveness check (insert() early exit)
      if (global.size < k || ord.lt(doc, global.last)) {
        val kq = perKey.getOrElse(doc._3, Vector.empty)
        if (kq.size < m) {
          perKey(doc._3) = (kq :+ doc).sorted(ord)
          global = (global :+ doc).sorted(ord)
          if (global.size > k) {
            val evicted = global.last
            global = global.dropRight(1)
            perKey(evicted._3) = perKey(evicted._3).filterNot(_ == evicted)
          }
        } else if (ord.lt(doc, kq.last)) {
          // replaces its key's weakest, which also leaves the global queue
          val out = kq.last
          perKey(doc._3) = (kq.dropRight(1) :+ doc).sorted(ord)
          global = (global.filterNot(_ == out) :+ doc).sorted(ord)
          if (global.size > k) { // possible when `out` had already been evicted
            val evicted = global.last
            global = global.dropRight(1)
            perKey(evicted._3) = perKey(evicted._3).filterNot(_ == evicted)
          }
        }
      }
    }
    global
  }

  test("fuzz: relational diversified top-k == the reference collector model") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nKeys = 3 + rnd.nextInt(6)
      val n = 40 + rnd.nextInt(120)
      val m = 1 + rnd.nextInt(3)
      val k = 5 + rnd.nextInt(10)
      // quantized scores force plenty of ties; docId breaks them
      val docs = (0L until n).map(d =>
        (d, (rnd.nextInt(12) / 3.0) + 1.0, s"src${rnd.nextInt(nKeys)}"))
      val matched = docs.map { case (d, s, _) => (d, s) }.toDF("docId", "score")
      val corpus = docs.map { case (d, _, key) => (d, key) }.toDF("doc_id", "source")
      val got = Diversify.diversifiedTopK(matched, corpus, "doc_id", "source", m, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      val want = collectorModel(docs, m, k)
      assert(got == want, s"trial $trial (nKeys=$nKeys n=$n m=$m k=$k)")
      assert(got.groupBy(_._3).values.forall(_.size <= m))
    }
  }

  test("caps a dominant key and backfills with other keys") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    // key A owns the 5 best scores; with m=2 only its top 2 survive
    val docs = Seq(
      (1L, 9.0, "A"), (2L, 8.0, "A"), (3L, 7.0, "A"), (4L, 6.0, "A"), (5L, 5.0, "A"),
      (6L, 4.0, "B"), (7L, 3.0, "B"), (8L, 2.0, "C"))
    val matched = docs.map { case (d, s, _) => (d, s) }.toDF("docId", "score")
    val corpus = docs.map { case (d, _, key) => (d, key) }.toDF("doc_id", "source")
    val got = Diversify.diversifiedTopK(matched, corpus, "doc_id", "source", 2, 4)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((1L, "A"), (2L, "A"), (6L, "B"), (7L, "B")))
  }
}
