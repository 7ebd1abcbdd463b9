package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact
  * (hash groupBy), MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design notes (100 TB / 10^9+ docs):
  *  - Exact dedup is one shuffle on the content hash; group payload per key is
  *    the duplicate-set size, which for web corpora is short-tailed enough for
  *    AQE; pathological keys (empty docs) should be pre-filtered.
  *  - MinHash-LSH is the scale path for near-dup: cost is
  *    O(docs × shingles) map-side + a shuffle keyed by (band, bandValue).
  *    Bucket skew (a band value shared by a huge near-dup cluster) is the
  *    classic hot-key: candidate pairs within one bucket are quadratic, so
  *    buckets are capped (`maxBucket`) exactly like production dedup pipelines
  *    cap connected-component sizes.
  *  - The exact Jaccard verify joins candidates back to the shingle table —
  *    a semi-join on (doc, shingle), proportional to candidate count, not to
  *    corpus².
  *  - SimHash pairs with Hamming ≤ h use (h+1)-way signature banding: a pair
  *    within distance h agrees on ≥1 band by pigeonhole, so banding has
  *    perfect recall while only ever joining on 15-bit keys.
  */
object Dedup {

  /** Exact dedup by a content key: every row gets the minimum `idCol` of its
    * key group as `keep_id`; rows with `id != keep_id` are the duplicates.
    * One shuffle (window over the key). */
  def exact(df: DataFrame, keyCol: Column, idCol: String): DataFrame = {
    val w = Window.partitionBy("dedup_key")
    df.withColumn("dedup_key", keyCol)
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
  }

  /** Transitive closure of near-duplicate PAIRS into clusters — the step a
    * training-data pipeline runs after [[minhashLshPairs]] /
    * [[simhashPairs]] / [[jaccardPrefixPairs]]: a pair list is not a dedup
    * decision until A~B, B~C collapse into one cluster with one survivor.
    *
    * Algorithm: iterative min-label propagation with POINTER JUMPING — each
    * round every node takes `min(own, neighbors' labels)` and then
    * shortcuts `label := label(label)` (every label is itself a node id, so
    * the hop is a self-join). Neighbor-min alone moves a label one hop per
    * round (a diameter-d path needs d rounds); the jump halves remaining
    * chains, giving O(log d) rounds — the same doubling idea as the
    * alternating-star algorithm (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"). Each round is two keyed shuffles; lineage is
    * truncated per round so plan size stays constant. Throws if the cap is
    * hit before the fixpoint (silent partial components would poison a
    * dedup decision).
    *
    * @return `(id, component)` for every node that appears in `pairs`,
    *         where `component` is the cluster's minimum id. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 25): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .unionAll(pairs.select(col(bCol).cast("long").as("u"), col(aCol).cast("long").as("v")))
      .distinct().persist()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbr = edges
        .join(labels.select(col("id").as("v"), col("label").as("vlabel")), "v")
        .groupBy(col("u").as("id")).agg(min(col("vlabel")).as("nbrMin"))
      val propagated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("label"))
      // pointer jump: label := label(label) — labels are node ids, so this
      // is a self-join; halves any remaining chain each round
      val next = propagated
        .join(propagated.select(col("id").as("label"), col("label").as("jump")),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("jump"), col("label")).as("label"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") < col("old")).limit(1).count() == 0L
      labels = next
      it += 1
    }
    edges.unpersist()
    require(converged, s"connectedComponents: no fixpoint after $maxIters rounds")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Cluster-and-keep: collapse near-dup pairs into components and keep one
    * survivor (the minimum id) per cluster — rows of `df` outside any pair
    * survive untouched. Returns `df` plus a `component` column (= own id for
    * unclustered rows), filtered to survivors. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String = "a", bCol: String = "b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    df.join(comp.withColumnRenamed("id", "joinId"),
        col(idCol) === col("joinId"), "left")
      .withColumn("component", coalesce(col("component"), col(idCol).cast("long")))
      .drop("joinId")
      .filter(col(idCol).cast("long") === col("component"))
  }

  /** Distinct `(doc, shingle)` table — the shared input of the signature,
    * candidate, and verify stages. Callers that run more than one stage
    * should compute it ONCE and persist it (see [[minhashLshPairs]]): the
    * tokenize+shingle explode is the dominant map-side cost and was being
    * recomputed per stage in r1. */
  def shingleTable(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    TextOps.parallelized(df).select(col(idCol).as("doc"),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("sg"))
      .distinct()

  /** Per-doc MinHash signature over word `n`-gram shingles: `numHashes`
    * seeded hashes h_i(s) = xxhash64(i, s), signature(i) = min over shingles.
    * One aggregation, no explode-by-permutation. xxhash64 (native, codegen'd)
    * is deliberately NOT the oracle-reproducible md5: signatures only drive
    * candidate RECALL — the verify stage re-checks exact Jaccard, which is
    * what the DuckDB oracle compares. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, numHashes: Int = 16): DataFrame =
    minhashSignaturesFrom(shingleTable(df, textCol, idCol, n), numHashes)

  /** [[minhashSignatures]] over a precomputed [[shingleTable]]. */
  def minhashSignaturesFrom(sh: DataFrame, numHashes: Int = 16): DataFrame = {
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("sg"))).as(s"h$i"))
    sh.groupBy("doc").agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from MinHash signatures: `bands` bands of
    * `sig.length / bands` rows; docs sharing any band value are candidates.
    * `maxBucket` caps quadratic blowup in hot buckets. */
  def lshCandidates(sigs: DataFrame, bands: Int, maxBucket: Int = 1000): DataFrame = {
    val rows = expr(s"size(sig) div $bands")
    val banded = sigs
      .select(col("doc"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * rows + 1, rows))).as(Seq("band", "bv")))
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "bv")))
      .filter(col("bucket_n") <= maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("a"), col("b.doc").as("b"))
      .distinct()
  }

  /** Exact word-shingle Jaccard for the given candidate pairs `(a, b)`:
    * joins back to distinct shingle sets, proportional to candidates. */
  def verifyJaccard(df: DataFrame, textCol: String, idCol: String,
                    candidates: DataFrame, n: Int = 3): DataFrame =
    verifyJaccardFrom(shingleTable(df, textCol, idCol, n), candidates)

  /** [[verifyJaccard]] over a precomputed [[shingleTable]]. */
  def verifyJaccardFrom(sh: DataFrame, candidates: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("nsh"))
    val inter = candidates
      .join(sh.toDF("doc_a", "sg"), col("a") === col("doc_a"))
      .join(sh.toDF("doc_b", "sg2"), col("b") === col("doc_b") && col("sg") === col("sg2"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_sa", "na"), col("a") === col("doc_sa"))
      .join(sizes.toDF("doc_sb", "nb"), col("b") === col("doc_sb"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs with exact-verified Jaccard ≥ `tau`.
    * The shingle table is computed once and persisted across the signature
    * and verify stages (it backs both plans — without the persist the
    * explode+distinct runs twice, the r1 q17/q19 hotspot). */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      tau: Double, n: Int = 3, numHashes: Int = 16,
                      bands: Int = 8): DataFrame = {
    val sh = shingleTable(df, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minhashSignaturesFrom(sh, numHashes)
    val cands = lshCandidates(sigs, bands)
    verifyJaccardFrom(sh, cands).filter(col("jaccard") >= tau)
  }

  /** EXACT n-gram Jaccard ≥ `tau` pairs via prefix filtering — the
    * set-similarity-join algorithm of SSJoin / All-Pairs (Chaudhuri et al.
    * ICDE'06; Bayardo et al. WWW'07), no probability anywhere:
    *
    * Order every doc's shingles by GLOBAL document frequency ascending (one
    * canonical total order). If J(A,B) ≥ τ then |A∩B| ≥ τ·max(|A|,|B|), and
    * by the prefix-filter lemma the first `|X| − ⌈τ|X|⌉ + 1` shingles of A
    * and of B (in that shared order) must intersect. So the candidate join
    * explodes only each doc's ~(1−τ) RAREST shingles — at τ=0.8 one fifth of
    * the shingle table, keyed by rare (small-bucket) shingles, which is what
    * kills both the candidate explosion of aggressive LSH banding and the
    * Σdf² blowup of the naive inverted join. Exact Jaccard verify follows,
    * proportional to candidates. Deterministic full recall, unlike any
    * banding scheme. */
  def jaccardPrefixPairs(df: DataFrame, textCol: String, idCol: String,
                         tau: Double, n: Int = 3): DataFrame = {
    val sh = shingleTable(df, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sgdf = sh.groupBy("sg").agg(count(lit(1)).as("sgdf"))
    // rank and per-doc shingle count share one doc-partitioned window — the
    // unordered count rides the same shuffle as the ordered row_number, so
    // no separate sizes aggregation + join
    val ranked = sh.join(sgdf, "sg")
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc").orderBy(col("sgdf"), col("sg"))))
      .withColumn("nsh", count(lit(1)).over(Window.partitionBy("doc")))
    val prefix = ranked
      .filter(col("rank") <= col("nsh") - ceil(lit(tau) * col("nsh")) + 1)
      .select("doc", "sg")
      // both sides of the candidate self-join read this — persist, or the
      // window + join subtree executes twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = prefix.toDF("a", "sg").join(prefix.toDF("b", "sg2"),
        col("sg") === col("sg2") && col("a") < col("b"))
      .select("a", "b").distinct()
    verifyJaccardFrom(sh, cands).filter(col("jaccard") >= tau)
  }

  /** Exact all-pairs word-shingle Jaccard ≥ `tau` via an inverted shingle
    * join (no LSH): the small-scale/oracle path. Cost is Σ_sg df(sg)² — use
    * [[jaccardPrefixPairs]] (exact) or [[minhashLshPairs]] (approximate)
    * beyond ~10^6 docs. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        tau: Double, n: Int = 3): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("sg"))
      .distinct()
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("nsh"))
    val inter = sh.toDF("a", "sg").join(sh.toDF("b", "sg2"),
        col("sg") === col("sg2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_sa", "na"), col("a") === col("doc_sa"))
      .join(sizes.toDF("doc_sb", "nb"), col("b") === col("doc_sb"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Per-doc 60-bit SimHash over tf-weighted token hashes: bit b of the
    * signature is set iff Σ_tokens tf × (bit b of h60(token) ? +1 : -1) > 0.
    * Expressed as two aggregations (per-(doc,bit) vote, then bit-pack) —
    * both map-side combinable. */
  def simhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        bits: Int = 60): DataFrame = {
    val tf = TextOps.parallelized(df)
      .select(col(idCol).as("doc"), explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy("doc", "t").agg(count(lit(1)).as("tf"))
      .withColumn("h", TextOps.h60(col("t")))
    val votes = tf
      .select(col("doc"), explode(sequence(lit(0), lit(bits - 1))).as("b"), col("h"), col("tf"))
      .select(col("doc"), col("b"),
        when(expr("shiftright(h, b)").bitwiseAND(1) === 1, col("tf"))
          .otherwise(-col("tf")).as("v"))
      .groupBy("doc", "b").agg(sum("v").as("v"))
    votes.groupBy("doc")
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("sig"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, found by
    * banding the signature into `maxHamming + 1` chunks (pigeonhole ⇒ perfect
    * recall) and verifying with `bit_count(a XOR b)`. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, bits: Int = 60): DataFrame = {
    val sigs = simhashSignatures(df, textCol, idCol, bits)
    val nBands = maxHamming + 1
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val banded = sigs.select(col("doc"), col("sig"),
      posexplode(array((0 until nBands).map(j =>
        shiftright(col("sig"), j * bandBits).bitwiseAND(mask)): _*)).as(Seq("band", "bv")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"),
        col("x.sig").as("siga"), col("y.sig").as("sigb"))
      .distinct()
      .withColumn("hamming", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
