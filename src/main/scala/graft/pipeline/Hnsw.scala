package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** One graph node: `neighbors(layer)` = adjacent node ids, layers 0..level. */
final case class HnswNode(part: Int, id: Long, vec: Array[Float], level: Int,
                          neighbors: Array[Array[Long]])

/** Segmented HNSW ANN — the reference's per-segment hierarchical small-world
  * graphs (`lucene/core/src/java/org/apache/lucene/util/hnsw/HnswGraphBuilder.java:40`,
  * `HnswGraphSearcher.java:36`, `KnnFloatVectorQuery.java:49`) mapped to
  * Spark's execution model: Lucene builds one graph PER SEGMENT and a kNN
  * query searches every segment's graph, rank-merging the per-segment
  * top-k (`AbstractKnnVectorQuery.java` merges per-leaf TopDocs). Here a
  * segment is a partition — `mapPartitions` runs the same sequential insert
  * algorithm per partition, the graphs persist as a plain columnar table,
  * and search fans out per graph then TakeOrdered-merges. Graph build is the
  * one place the survey's "no driver-side loops" rule yields to
  * per-partition imperative code: the algorithm is inherently sequential
  * WITHIN a graph, exactly why Lucene scopes graphs to segments.
  *
  * Determinism (unlike the reference, whose level draw uses an RNG seeded by
  * insertion order): a node's level comes from a splitmix64 mix of its id,
  * and all tie-breaks prefer the smaller id — identical inputs give
  * identical graphs on every run and parallelism.
  *
  * Neighbor selection uses the reference's diversity heuristic
  * (`HnswGraphBuilder.java` `diversityCheck` on insert,
  * `findWorstNonDiverse` on overflow) — the piece that preserves
  * cross-cluster connectivity (and recall) on clustered data. Recall is
  * asserted against the exact brute-force oracle in HnswSpec, including a
  * clustered fixture where plain top-M-by-similarity selection loses the
  * inter-cluster edges.
  */
object Hnsw {

  /** splitmix64 finalizer → uniform in (0,1), deterministic per id. */
  private def unitU(id: Long): Double = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble + 0.5) / (1L << 53).toDouble
  }

  /** Geometric level draw, `mL = 1/ln(M)` (paper §4.1; HnswGraphBuilder). */
  def levelOf(id: Long, m: Int): Int =
    math.floor(-math.log(unitU(id)) / math.log(m.toDouble)).toInt

  private def cosSim(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** In-partition graph as parallel arrays (local ids 0..n-1). */
  private final class LocalGraph(val ids: Array[Long], val vecs: Array[Array[Float]],
                                 val levels: Array[Int],
                                 val adj: Array[Array[mutable.ArrayBuffer[Int]]]) {
    var entry: Int = -1
    var topLevel: Int = -1
  }

  /** Better-first ordering: higher sim wins, smaller id breaks ties. */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** ef-bounded beam search in one layer (paper alg. 2 / HnswGraphSearcher):
    * returns up to `ef` (localId, sim) best-first. */
  private def searchLayer(g: LocalGraph, q: Array[Float], eps: Seq[Int],
                          ef: Int, layer: Int): mutable.ArrayBuffer[(Int, Double)] = {
    val visited = new java.util.HashSet[Integer]()
    implicit val candOrd: Ordering[(Int, Double)] = // max-heap on sim, then min id
      Ordering.fromLessThan[(Int, Double)]((a, b) => !better(a._2, g.ids(a._1), b._2, g.ids(b._1)))
    val candidates = mutable.PriorityQueue.empty[(Int, Double)](candOrd)
    // result set kept sorted best-first (ef is small)
    val results = mutable.ArrayBuffer.empty[(Int, Double)]
    def resInsert(e: (Int, Double)): Unit = {
      val at = results.indexWhere(r => better(e._2, g.ids(e._1), r._2, g.ids(r._1)))
      if (at < 0) results.append(e) else results.insert(at, e)
      if (results.length > ef) results.remove(results.length - 1)
    }
    eps.foreach { ep =>
      if (visited.add(ep)) {
        val s = cosSim(q, g.vecs(ep))
        candidates.enqueue((ep, s)); resInsert((ep, s))
      }
    }
    while (candidates.nonEmpty) {
      val (c, cs) = candidates.dequeue()
      val worst = results.last
      if (!better(cs, g.ids(c), worst._2, g.ids(worst._1)) && results.length >= ef) {
        candidates.clear() // best remaining candidate can't improve the set
      } else if (layer <= g.levels(c)) {
        g.adj(c)(layer).foreach { nb =>
          if (visited.add(nb)) {
            val s = cosSim(q, g.vecs(nb))
            if (results.length < ef ||
              better(s, g.ids(nb), results.last._2, g.ids(results.last._1))) {
              candidates.enqueue((nb, s)); resInsert((nb, s))
            }
          }
        }
      }
    }
    results
  }

  /** Diverse neighbor selection (`HnswGraphBuilder.selectAndLinkDiverse` /
    * `diversityCheck`): walk candidates best-first, keep a candidate only if
    * no already-kept neighbor is closer to it than the new node is —
    * `sim(cand, kept) ≥ sim(cand, node)` disqualifies. This is what
    * preserves cross-cluster edges (and recall) on clustered data. */
  private def selectDiverse(g: LocalGraph, q: Array[Float],
      cands: collection.Seq[(Int, Double)], max: Int): mutable.ArrayBuffer[Int] = {
    val out = mutable.ArrayBuffer.empty[Int]
    val it = cands.iterator
    while (out.length < max && it.hasNext) {
      val (c, simToNode) = it.next()
      val diverse = out.forall(s => cosSim(g.vecs(c), g.vecs(s)) < simToNode)
      if (diverse) out += c
    }
    out
  }

  /** Overflow prune (`HnswGraphBuilder.findWorstNonDiverse`): drop the WORST
    * neighbor that is dominated by a better one (some better neighbor closer
    * to it than the node is); if every neighbor is diverse, drop the overall
    * worst. One removal per overflow, like the reference. */
  private def prune(g: LocalGraph, node: Int, layer: Int, mmax: Int): Unit = {
    val a = g.adj(node)(layer)
    if (a.length <= mmax) return
    val scored = a.map(j => (j, cosSim(g.vecs(node), g.vecs(j))))
      .sortWith((x, y) => better(x._2, g.ids(x._1), y._2, g.ids(y._1)))
    var removeIdx = scored.length - 1
    var i = scored.length - 1
    var found = false
    while (!found && i > 0) {
      val (w, ws) = scored(i)
      var b = 0
      while (!found && b < i) {
        if (cosSim(g.vecs(w), g.vecs(scored(b)._1)) >= ws) { removeIdx = i; found = true }
        b += 1
      }
      i -= 1
    }
    val kept = scored.indices.filter(_ != removeIdx).map(scored(_)._1)
    a.clear(); a ++= kept
  }

  /** Sequential insert build (paper alg. 1), one call per partition. */
  private def buildLocal(rows: Array[(Long, Array[Float])], m: Int, efC: Int): LocalGraph = {
    val sorted = rows.sortBy(_._1) // insertion order independent of shuffle order
    val n = sorted.length
    val levels = Array.tabulate(n)(i => levelOf(sorted(i)._1, m))
    val g = new LocalGraph(sorted.map(_._1), sorted.map(_._2), levels,
      Array.tabulate(n)(i => Array.fill(levels(i) + 1)(mutable.ArrayBuffer.empty[Int])))
    var i = 0
    while (i < n) {
      val l = levels(i)
      if (g.entry < 0) { g.entry = i; g.topLevel = l }
      else {
        val q = g.vecs(i)
        var eps: Seq[Int] = Seq(g.entry)
        var lc = g.topLevel
        while (lc > l) { // greedy descent above the node's level
          eps = searchLayer(g, q, eps, 1, lc).take(1).map(_._1).toSeq
          lc -= 1
        }
        lc = math.min(l, g.topLevel)
        while (lc >= 0) {
          val cands = searchLayer(g, q, eps, efC, lc)
          val mmax = if (lc == 0) 2 * m else m
          selectDiverse(g, q, cands, m).foreach { j =>
            g.adj(i)(lc) += j
            g.adj(j)(lc) += i
            prune(g, j, lc, mmax)
          }
          eps = cands.map(_._1).toSeq
          lc -= 1
        }
        if (l > g.topLevel) { g.entry = i; g.topLevel = l }
      }
      i += 1
    }
    g
  }

  /** Build one graph per partition; `(id hash % numParts)` fixes membership
    * independent of input layout. Returns the persistable node table. */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, efConstruction: Int = 64, numParts: Int = 4): Dataset[HnswNode] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        pmod(hash(col(idCol)), lit(numParts)).as("part"))
      .as[(Long, Array[Float], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (part, it) =>
        val rows = it.map(r => (r._1, r._2)).toArray
        val g = buildLocal(rows, m, efConstruction)
        (0 until g.ids.length).iterator.map { i =>
          HnswNode(part, g.ids(i), g.vecs(i), g.levels(i),
            g.adj(i).map(_.map(j => g.ids(j)).toArray))
        }
      }
  }

  /** kNN over every partition graph, rank-merged — the reference's
    * per-leaf search + TopDocs.merge. `efSearch` caps per-graph beam width;
    * the merge is a TakeOrdered, not a sort. */
  def topK(graph: Dataset[HnswNode], query: Array[Float], k: Int,
           efSearch: Int = 64): DataFrame = {
    val spark = graph.sparkSession
    import spark.implicits._
    val ef = math.max(efSearch, k)
    graph.groupByKey(_.part)
      .flatMapGroups { (_, it) =>
        val nodes = it.toArray.sortBy(_.id)
        if (nodes.isEmpty) Iterator.empty
        else {
          val idx = nodes.zipWithIndex.map { case (nd, i) => nd.id -> i }.toMap
          val g = new LocalGraph(nodes.map(_.id), nodes.map(_.vec), nodes.map(_.level),
            nodes.map(_.neighbors.map(layer =>
              mutable.ArrayBuffer.from(layer.map(idx)))))
          g.entry = {
            var best = 0
            nodes.indices.foreach { i =>
              if (nodes(i).level > nodes(best).level ||
                (nodes(i).level == nodes(best).level && nodes(i).id < nodes(best).id)) best = i
            }
            best
          }
          g.topLevel = nodes(g.entry).level
          var eps: Seq[Int] = Seq(g.entry)
          var lc = g.topLevel
          while (lc > 0) {
            eps = searchLayer(g, query, eps, 1, lc).take(1).map(_._1).toSeq
            lc -= 1
          }
          searchLayer(g, query, eps, ef, 0).take(ef).iterator
            .map { case (i, s) => (g.ids(i), s) }
        }
      }
      .toDF("id", "cos")
      .orderBy(desc("cos"), asc("id"))
      .limit(k)
  }

  /** Convenience: top-k neighbors of an indexed vector (excluding itself). */
  def topKForId(embeddings: DataFrame, graph: Dataset[HnswNode], idCol: String,
                vecCol: String, queryId: Long, k: Int, efSearch: Int = 64): DataFrame = {
    val qv = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0).toArray
    topK(graph, qv, k + 1, efSearch).filter(col("id") =!= queryId)
      .orderBy(desc("cos"), asc("id")).limit(k)
  }
}
