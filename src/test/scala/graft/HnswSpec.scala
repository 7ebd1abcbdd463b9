package graft

import graft.pipeline.{Ann, Hnsw}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Segmented HNSW ([[Hnsw]]) — per-partition graphs searched and
  * rank-merged, the reference's per-segment architecture. Asserts the
  * properties the reference gets from its own tests: bounded degrees,
  * deterministic builds, and high recall vs the exact brute-force oracle
  * (the divergence surface of the simplified neighbor selection). */
class HnswSpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark
  private lazy val emb = spark.read.parquet(s"${SparkTestEnv.sfDir}/embeddings.parquet")

  private lazy val graph = Hnsw.build(emb, "vec_id", "embedding",
    m = 8, efConstruction = 64, numParts = 4).persist()

  test("graph structure: partitioned, degree-bounded, neighbors in-partition") {
    val nodes = graph.collect()
    assert(nodes.length == 500)
    assert(nodes.map(_.part).distinct.sorted.toSeq.forall(p => p >= 0 && p < 4))
    val byPart = nodes.groupBy(_.part)
    nodes.foreach { n =>
      assert(n.neighbors.length == n.level + 1)
      n.neighbors.zipWithIndex.foreach { case (layer, lc) =>
        val mmax = if (lc == 0) 16 else 8 // 2M at layer 0, M above
        assert(layer.length <= mmax, s"node ${n.id} layer $lc degree ${layer.length}")
        val partIds = byPart(n.part).map(_.id).toSet
        assert(layer.forall(partIds.contains), "neighbor outside its graph")
      }
    }
    // the level draw is geometric: strictly fewer nodes per ascending level
    val levelCounts = nodes.groupBy(_.level).view.mapValues(_.length).toMap
    assert(levelCounts.getOrElse(0, 0) > levelCounts.getOrElse(1, 0))
  }

  test("build is deterministic across runs and input order") {
    def canon(ds: org.apache.spark.sql.Dataset[graft.pipeline.HnswNode]) =
      ds.collect().sortBy(_.id)
        .map(n => (n.id, n.level, n.neighbors.map(_.toSeq).toSeq)).toSeq
    val again = Hnsw.build(emb.orderBy(desc("vec_id")), "vec_id", "embedding",
      m = 8, efConstruction = 64, numParts = 4)
    assert(canon(graph) == canon(again))
  }

  test("recall@10 vs exact brute force") {
    val queries = Seq(3L, 77L, 150L, 288L, 444L)
    val recalls = queries.map { q =>
      val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Hnsw.topKForId(emb, graph, "vec_id", "embedding", q, 10, efSearch = 96)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall $avg (per-query: $recalls)")
    assert(recalls.min >= 0.7, s"worst recall ${recalls.min}")
  }

  test("diverse neighbor selection keeps recall on CLUSTERED vectors at default M/efSearch") {
    // 4 tight, well-separated clusters: plain top-M-by-similarity selection
    // links only within a cluster and greedy search cannot escape the entry
    // cluster; the reference's diversity heuristic preserves the
    // cross-cluster edges. Deterministic fixture, one graph (numParts = 1).
    import spark.implicits._
    val dim = 8
    def noise(id: Long, d: Int): Float = {
      var z = id * 31 + d + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = z ^ (z >>> 27)
      (((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat * 0.4f
    }
    val rows = (0L until 400L).map { id =>
      val cluster = (id % 4).toInt
      val v = Array.tabulate(dim)(d => (if (d == cluster * 2) 10.0f else 0.0f) + noise(id, d))
      (id, v)
    }
    val cemb = rows.toDF("vec_id", "embedding")
    val cgraph = Hnsw.build(cemb, "vec_id", "embedding",
      m = 8, efConstruction = 64, numParts = 1)
    val recalls = Seq(2L, 5L, 11L, 16L).map { q => // one query per cluster
      val exact = Ann.bruteForceTopK(cemb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Hnsw.topKForId(cemb, cgraph, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"clustered avg recall $avg (per-query: $recalls)")
  }

  test("per-segment merge: result is the rank-merge of per-graph candidates") {
    val q = emb.filter(col("vec_id") === 3L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val merged = Hnsw.topK(graph, q, 10, efSearch = 96)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ordered by (cos desc, id asc), no duplicate ids, k rows
    assert(merged.map(_._1).distinct.length == 10)
    assert(merged == merged.sortBy { case (id, c) => (-c, id) })
  }
}
