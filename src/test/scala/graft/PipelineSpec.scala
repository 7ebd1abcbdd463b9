package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operator tests: LSH recall vs exact baselines,
  * multimodal plumbing, ANN correctness. */
class PipelineSpec extends AnyFunSuite {
  import SparkTestEnv._

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("minhash LSH finds every pair the exact n-gram Jaccard finds (full recall at tau=0.9)") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau = 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", tau = 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
  }

  test("prefix-filtered jaccard join equals exact all-pairs at tau 0.8 and 0.9") {
    Seq(0.8, 0.9).foreach { tau =>
      val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val pf = Dedup.jaccardPrefixPairs(docs, "text", "doc_id", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(exact.nonEmpty)
      assert(pf.keySet == exact.keySet, s"tau=$tau")
      pf.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-12) }
    }
  }

  test("simhash banding has perfect recall for hamming <= 3 (pigeonhole)") {
    val sigs = Dedup.simhashSignatures(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    val banded = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty)
    assert(banded == brute)
  }

  test("exact dedup groups docs by fingerprint with min-id representative") {
    val d = Dedup.exact(docs, TextOps.bagFingerprint(col("text")), "doc_id")
    val rows = d.select("doc_id", "dedup_key", "keep_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byKey = rows.groupBy(_._2)
    byKey.foreach { case (_, grp) =>
      val minId = grp.map(_._1).min
      assert(grp.forall(_._3 == minId))
    }
    assert(byKey.exists(_._2.length > 1), "corpus should contain fingerprint dups")
  }

  test("ANN LSH: full-probe equals brute force; narrow probe returns exact scores") {
    val brute = Ann.bruteForceTopK(embs, "vec_id", "embedding", 7L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // probing every bucket (hamming <= nPlanes) must degenerate to brute force
    val full = Ann.lshTopK(embs, "vec_id", "embedding", 7L, 10, nPlanes = 8, probeHamming = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute, "full-probe LSH must equal brute force")
    // narrow probe: a subset of the corpus, scored exactly
    val approx = Ann.lshTopK(embs, "vec_id", "embedding", 7L, 10, nPlanes = 8, probeHamming = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(approx.nonEmpty, "multi-probe should surface candidates")
    val exact = Ann.cosinePairs(embs.filter(col("vec_id").isin(7L +: approx.map(_._1): _*)),
      "vec_id", "embedding", tau = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    approx.foreach { case (id, c) =>
      val key = if (7L < id) (7L, id) else (id, 7L)
      assert(math.abs(exact(key) - c) < 1e-12)
    }
  }

  test("ANN IVF: full probe equals brute force; narrow probe == brute force over probed lists") {
    val brute = Ann.bruteForceTopK(embs, "vec_id", "embedding", 7L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cs = Ann.ivfCentroids(embs, "vec_id", "embedding", nlist = 8)
    val full = Ann.ivfTopK(embs, "vec_id", "embedding", 7L, 10,
        nlist = 8, nprobe = 8, centroids = cs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute, "full-probe IVF must equal brute force")
    // deterministic training: same centroids on re-train
    val cs2 = Ann.ivfCentroids(embs, "vec_id", "embedding", nlist = 8)
    assert(cs.length == cs2.length && cs.indices.forall(i => cs(i).sameElements(cs2(i))))
    // narrow probe: exactly brute force restricted to the probed lists
    val assigned = Ann.ivfAssign(embs, "vec_id", "embedding", cs)
      .select("id", "list").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val narrow = Ann.ivfTopK(embs, "vec_id", "embedding", 7L, 10,
        nlist = 8, nprobe = 2, centroids = cs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(narrow.nonEmpty)
    val probedLists = narrow.map(r => assigned(r._1)).toSet
    assert(probedLists.size <= 2, "narrow probe must scan at most nprobe lists")
    // every returned score is the exact cosine (rerank is never approximate)
    val bruteAll = Ann.bruteForceTopK(embs, "vec_id", "embedding", 7L, embs.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    narrow.foreach { case (id, c) => assert(math.abs(bruteAll(id) - c) < 1e-12) }
  }

  test("tiled exact pairs equal all-pairs cosine (same pairs, same doubles)") {
    val allPairs = Ann.cosinePairs(embs, "vec_id", "embedding", tau = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // tiny blockSize forces many tiles + both the diagonal and off-diagonal
    // kernel paths
    val blocked = Ann.cosinePairsBlocked(embs, "vec_id", "embedding", tau = 0.45, blockSize = 37)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(allPairs.nonEmpty, "corpus should contain planted near-dup vectors")
    assert(blocked.keySet == allPairs.keySet)
    blocked.foreach { case (k, c) => assert(math.abs(c - allPairs(k)) < 1e-12) }
  }

  test("multimodal: decode/feature/frame plumbing over binary payloads") {
    val assets = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val meta = Multimodal.decodeMeta(assets).collect()
    assert(meta.length == docs.count())
    meta.foreach { m =>
      assert(m.sizeBytes > 0)
      assert(m.width >= 1 && m.width <= 64 && m.height >= 1 && m.height <= 64)
      assert(m.modality != "video" || m.nFrames >= 1)
    }
    val feats = Multimodal.extractFeatures(assets).collect()
    feats.foreach { f =>
      assert(f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1f) < 1e-3, "histogram normalized")
    }
    val frames = Multimodal.sampleFrames(assets, stride = 2)
    val fr = frames.collect()
    assert(fr.nonEmpty)
    assert(frames.columns.toSeq == Seq("assetId", "frameIdx", "frameBytes"))
    fr.foreach(r => assert(r.getInt(1) % 2 == 0, "stride respected"))
  }

  test("quality score is within [0,1] and favors longer diverse docs") {
    val q = TextAnalysis.qualityScore(docs, "text").select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    val longDiverse = (1 to 80).map(i => s"word$i").mkString(" ")
    val short = TextAnalysis.qualityScore(
      spark.createDataFrame(Seq((1L, "word"), (2L, longDiverse))).toDF("doc_id", "text"),
      "text").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(short(2L) > short(1L))
  }
}
