package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The dot product / cosine is pure Catalyst (`zip_with` + `aggregate`, in
  * double precision) — whole-stage-codegen'd, no UDF. Brute force is the
  * exact baseline (one scan per query — embarrassingly parallel and often
  * the right answer on a cluster when queries are batched); the
  * random-hyperplane LSH variant is the sublinear scale path: bucket the
  * corpus once, then probe only matching buckets.
  */
object Ann {

  /** `Σ a_i·b_i` in double precision, native expressions. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of the vector with id `queryId`.
    * The query vector rides along as a literal (broadcast semantics): one
    * scan, then `ORDER BY LIMIT k` = per-partition heaps + driver merge. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val qv = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val q = array(qv.map(v => lit(v)): _*)
    embeddings.filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), col(idCol).asc)
      .limit(k)
  }

  /** Filtered kNN — the reference's `KnnFloatVectorQuery(..., filter)`
    * (`lucene/core/src/java/org/apache/lucene/search/KnnFloatVectorQuery.java:49`):
    * top-k among the vectors whose rows satisfy `filter`. Relationally the
    * filter is pushed INTO the scan (predicate pushdown to parquet), so the
    * selective case scans only survivors — the pre-filter strategy the
    * reference switches to when the filter is restrictive. */
  def bruteForceTopKFiltered(embeddings: DataFrame, idCol: String, vecCol: String,
                             filter: org.apache.spark.sql.Column,
                             queryId: Long, k: Int): DataFrame = {
    val qv = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val q = array(qv.map(v => lit(v)): _*)
    embeddings.filter(col(idCol) =!= queryId)
      .filter(filter)
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), col(idCol).asc)
      .limit(k)
  }

  /** Dimension-truncated top-k (Matryoshka-style): cosine over the first
    * `dims` components only — the standard cheap first pass for
    * MRL-trained embeddings (4× fewer multiplies at dims = d/4, rescoreable
    * by [[bruteForceTopK]] on the survivors). Cosine self-normalizes, so no
    * re-normalization step is needed after the slice. */
  def truncatedTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                    dims: Int, queryId: Long, k: Int): DataFrame = {
    require(dims >= 1)
    val truncated = embeddings.select(col(idCol), slice(col(vecCol), 1, dims).as("tv"))
    val qv = truncated.filter(col(idCol) === queryId)
      .select(col("tv")).head().getSeq[Float](0)
    val q = array(qv.map(v => lit(v)): _*)
    truncated.filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col("tv"), q).as("cos"))
      .orderBy(desc("cos"), col(idCol).asc)
      .limit(k)
  }

  /** All pairs with cosine ≥ `tau` (exact, all-pairs — the oracle/small path;
    * compose [[lshBuckets]] + within-bucket pairs for the sublinear path).
    *
    * Each vector is L2-normalized ONCE up front (linear pass), so the
    * quadratic pair stage is a single tight-loop dot product per pair — not
    * three interpreted higher-order aggregates. The loop is a compiled Scala
    * function over primitive arrays; at n² pair counts that is the difference
    * between seconds and minutes. */
  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
                  tau: Double): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"), norm(col(vecCol)).as("nv"))
    val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => {
      var s = 0.0
      var i = 0
      val n = a.length
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    })
    e.toDF("a", "va", "na").join(e.toDF("b", "vb", "nb"), col("a") < col("b"))
      .select(col("a"), col("b"),
        (dotUdf(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** All pairs with cosine ≥ `tau`, EXACT, executed as a tiled self-join —
    * the classic blocked matrix-product decomposition:
    *
    *  - vectors are L2-normalized once (linear pass), hashed into
    *    `⌈n/blockSize⌉` tiles, and each tile is packed into one row;
    *  - the `T(T+1)/2` tile pairs are generated as a real (tiny) frame and
    *    EQUI-joined to the tile data twice — no BroadcastNestedLoopJoin, no
    *    per-pair row materialization;
    *  - each task computes one tile-pair's dot products over primitive
    *    arrays (a tight O(blockSize² · dim) loop) and emits only survivors.
    *
    * The O(n²·d) flops are inherent to an exact all-pairs answer; this shape
    * distributes them evenly (no skew — tiles are hash-balanced), bounds task
    * memory at 2·blockSize·d doubles, and its shuffle volume is
    * n·d·⌈n/blockSize⌉ — the standard communication cost of 2-D tiling. For
    * recall-tolerant scale use [[lshBuckets]] / [[lshTopK]] instead. */
  def cosinePairsBlocked(embeddings: DataFrame, idCol: String, vecCol: String,
                         tau: Double, blockSize: Int = 256): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val n = embeddings.count()
    val nTiles = math.max(1, ((n + blockSize - 1) / blockSize).toInt)
    // keep raw doubles + precomputed norms so the per-pair arithmetic is
    // dot/(|a|·|b|) in exactly the oracle's operation order
    val prepared = embeddings
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), _.cast("double")).as("v"), norm(col(vecCol)).as("nv"))
    val tiles = prepared
      .withColumn("tile", pmod(hash(col("id")), lit(nTiles)).cast("long"))
      .groupBy("tile")
      .agg(collect_list(struct(col("id").as("_1"), col("v").as("_2"), col("nv").as("_3"))).as("vecs"))
    val tilePairs = spark.range(nTiles).as[Long]
      .flatMap(i => (i until nTiles.toLong).map(j => (i, j))).toDF("t1", "t2")
    tilePairs
      .join(tiles.toDF("t1", "vecs1"), "t1")
      .join(tiles.toDF("t2", "vecs2"), "t2")
      .select(col("t1"), col("t2"), col("vecs1"), col("vecs2"))
      .as[(Long, Long, Seq[(Long, Seq[Double], Double)], Seq[(Long, Seq[Double], Double)])]
      .flatMap { case (t1, t2, vs1, vs2) =>
        val a1 = vs1.iterator.map { case (id, v, nv) => (id, v.toArray, nv) }.toArray
        val a2 = if (t1 == t2) a1 else vs2.iterator.map { case (id, v, nv) => (id, v.toArray, nv) }.toArray
        val out = Vector.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < a1.length) {
          val (id1, v1, n1) = a1(i)
          var j = if (t1 == t2) i + 1 else 0
          while (j < a2.length) {
            val (id2, v2, n2) = a2(j)
            var s = 0.0
            var d = 0
            val dim = v1.length
            while (d < dim) { s += v1(d) * v2(d); d += 1 }
            val cos = s / (n1 * n2)
            if (cos >= tau) out += (if (id1 < id2) (id1, id2, cos) else (id2, id1, cos))
            j += 1
          }
          i += 1
        }
        out.result()
      }.toDF("a", "b", "cos")
  }

  /** Deterministic Rademacher (±1) hyperplane component for (plane, dim):
    * one md5 bit — reproducible anywhere. */
  private def planeSign(plane: Int, dim: Column): Column =
    when(TextOps.h60(concat(lit(s"plane$plane:"), dim.cast("string")))
      .bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (`nPlanes`-bit sign pattern) for each
    * vector. Vectors in the same bucket are similarity candidates; expected
    * collision prob. for angle θ is (1 − θ/π)^nPlanes. */
  def lshBuckets(embeddings: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int = 8): DataFrame = {
    val sigBits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
          (v, i) => v.cast("double") * planeSign(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      sigBits.reduce(_ + _).as("bucket"))
  }

  // ------------------------------------------------------------------ IVF

  /** IVF coarse quantizer: `nlist` k-means centroids trained DETERMINISTICALLY
    * on a bounded sample (the `sampleSize` lowest-id vectors — no RNG, so
    * builds are reproducible across runs and cluster sizes), Lloyd's
    * iterations driver-side. At 100 TB the sample is a tiny pushed-down scan
    * (`ORDER BY id LIMIT n` → TakeOrdered); training cost is
    * O(sample · nlist · dim · iters) on the driver, independent of corpus
    * size — the standard IVF recipe (FAISS coarse quantizer; the flat-list
    * alternative to a graph index, which immutable columnar storage can't
    * host efficiently). */
  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, iters: Int = 5, sampleSize: Int = 4096): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = embeddings
      .orderBy(col(idCol).asc).limit(sampleSize)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty embedding table")
    val k = math.min(nlist, sample.length)
    val dim = sample(0).length
    // deterministic init: evenly strided sample vectors
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty list keeps its centroid
        else { val s = sums(c); var d = 0; while (d < dim) { s(d) /= counts(c); d += 1 }; s }
      }
      it += 1
    }
    centroids
  }

  /** Index of the max-cosine centroid for `v` (ties → lowest index). */
  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    val nv = { var s = 0.0; var d = 0; while (d < v.length) { s += v(d) * v(d); d += 1 }; math.sqrt(s) }
    var c = 0
    while (c < cs.length) {
      var s = 0.0; var n2 = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * cs(c)(d); n2 += cs(c)(d) * cs(c)(d); d += 1 }
      val cos = if (n2 == 0 || nv == 0) 0.0 else s / (nv * math.sqrt(n2))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** Assign every vector to its inverted list (broadcast centroids, one
    * scan): `(id, v, list)`. At scale this is the partitioning key — list
    * files cluster similar vectors so probes touch few partitions. */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame = {
    val bc = embeddings.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Double]) => nearestCentroid(v.toArray, bc.value))
    embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      assignUdf(transform(col(vecCol), _.cast("double"))).as("list"))
  }

  /** IVF top-k: rank centroids by query cosine, scan only the `nprobe`
    * nearest inverted lists, exact-rerank candidates. `nprobe = nlist`
    * degrades to exact brute force (the gate configuration); smaller nprobe
    * trades recall for a 1/nlist·nprobe scan fraction — the scale path. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nlist: Int = 16, nprobe: Int = 4,
              centroids: Array[Array[Double]] = null): DataFrame = {
    val cs = if (centroids != null) centroids
             else ivfCentroids(embeddings, idCol, vecCol, nlist)
    val assigned = ivfAssign(embeddings, idCol, vecCol, cs)
    val qv = embeddings.filter(col(idCol) === queryId)
      .select(transform(col(vecCol), _.cast("double"))).head().getSeq[Double](0).toArray
    val probes = probeOrder(qv, cs).take(math.min(nprobe, cs.length)).map(Integer.valueOf)
    val q = array(qv.map(v => lit(v)): _*)
    assigned
      .filter(col("id") =!= queryId && col("list").isin(probes: _*))
      .select(col("id"), cosine(col("v"), q).as("cos"))
      .orderBy(desc("cos"), col("id").asc)
      .limit(k)
  }

  /** Centroid indices by descending query cosine (deterministic tiebreak). */
  private def probeOrder(q: Array[Double], cs: Array[Array[Double]]): Seq[Int] = {
    val nv = math.sqrt(q.map(x => x * x).sum)
    cs.indices.map { c =>
      var s = 0.0; var n2 = 0.0
      var d = 0
      while (d < q.length) { s += q(d) * cs(c)(d); n2 += cs(c)(d) * cs(c)(d); d += 1 }
      (if (n2 == 0 || nv == 0) 0.0 else s / (nv * math.sqrt(n2)), c)
    }.sortBy { case (cos, c) => (-cos, c) }.map(_._2)
  }

  /** Approximate top-k neighbors of `queryId`: probe only buckets within
    * `probeHamming` sign-bits of the query's bucket (multi-probe LSH), then
    * exact-rerank the candidates. Sublinear: scans |candidates|, not |corpus|. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nPlanes: Int = 8,
              probeHamming: Int = 1): DataFrame = {
    val bucketed = lshBuckets(embeddings, idCol, vecCol, nPlanes)
    val qRow = bucketed.filter(col("id") === queryId).select("bucket", "v").head()
    val qBucket = qRow.getLong(0)
    val qv = qRow.getSeq[Float](1)
    val q = array(qv.map(v => lit(v)): _*)
    bucketed
      .filter(col("id") =!= queryId &&
        bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .select(col("id"), cosine(col("v"), q).as("cos"))
      .orderBy(desc("cos"), col("id").asc)
      .limit(k)
  }
}
