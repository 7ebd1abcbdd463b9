package graft

import graft.pipeline.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.connectedComponents]] / [[Dedup.dedupByPairs]] — transitive
  * closure of near-dup pairs into clusters, fuzzed against a sequential
  * union-find. */
class DedupComponentsSpec extends AnyFunSuite {

  private def unionFind(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("chains collapse transitively: A~B, B~C, C~D is one component") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("fuzz vs sequential union-find (long paths, stars, cycles)") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 60 + rnd.nextInt(60)
      val pairs = (0 until n).map { _ =>
        val a = rnd.nextInt(40).toLong; var b = rnd.nextInt(40).toLong
        if (a == b) b = (b + 1) % 40
        (math.min(a, b), math.max(a, b))
      }.distinct
      val got = Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == unionFind(40, pairs), s"trial $trial")
    }
    // a worst-case path graph exercises multi-round convergence
    val path = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Dedup.connectedComponents(path.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.toSet == Set(0L) && got.size == 30)
  }

  test("dedupByPairs keeps one survivor per cluster and all unclustered rows") {
    val spark = SparkTestEnv.spark
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }
}
