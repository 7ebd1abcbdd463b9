package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operator demos over the driver testdata tables
  * (`documents`, `embeddings`), each with an ANSI-SQL DuckDB oracle.
  *
  * Oracle-reproducibility contracts:
  *  - token stream: lowercase maximal `[a-z0-9]+` runs (the engine analyzer);
  *  - hashes: md5 (both engines), 60-bit ints via first-15-hex-chars;
  *  - floats: double arithmetic with matching operation order, `round(.,6)`.
  *
  * The LSH queries (q17 minhash, q18 simhash) are checked against oracles
  * that compute the *exact* all-pairs answer — so a PASS additionally proves
  * the LSH path achieved full recall on the gate corpus (the banding
  * parameters are chosen to make the miss probability negligible / zero).
  */
object PipelineQueries {

  /** For CPU-heavy per-row operators (shingle/hash dedup): spread a
    * single-file input over the cluster first. */
  private def documents(s: SparkSession, dir: String): DataFrame =
    TextOps.parallelized(s.read.parquet(s"$dir/documents.parquet"))

  /** For expression-only operators (lang-id, quality, token stats,
    * fingerprint): a plain scan — repartitioning a narrow input costs more
    * than the expressions themselves, and `parallelized` materializes the
    * RDD lineage just to read the partition count (the r2 q22 regression). */
  private def documentsExpr(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_dedup_fingerprint" -> ((s, dir) => {
      Dedup.exact(documents(s, dir), TextOps.bagFingerprint(col("text")), "doc_id")
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"), col("keep_id"))
        .orderBy("doc_id")
    }),
    "q17_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashLshPairs(documents(s, dir), "text", "doc_id", tau = 0.9)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    }),
    "q88_dedup_cluster" -> ((s, dir) => {
      // transitive closure of the minhash near-dup pairs into clusters: the
      // decision step of a dedup pipeline (A~B, B~C collapse to one
      // component = min doc_id); iterative min-label propagation, one
      // shuffle per round, rounds = cluster diameter
      Dedup.connectedComponents(
          Dedup.minhashLshPairs(documents(s, dir), "text", "doc_id", tau = 0.9),
          "a", "b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),
    "q18_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(documents(s, dir), "text", "doc_id", maxHamming = 3)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
        .orderBy("a", "b")
    }),
    "q19_dedup_ngram" -> ((s, dir) => {
      // exact prefix-filtered set-similarity join (SSJoin/All-Pairs):
      // deterministic full recall at any τ — unlike banding, which at τ=0.8
      // either risks misses or (1-row bands) explodes candidates
      Dedup.jaccardPrefixPairs(documents(s, dir), "text", "doc_id", tau = 0.8)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    }),
    "q20_ann_topk" -> ((s, dir) => {
      Ann.bruteForceTopK(embeddings(s, dir), "vec_id", "embedding", queryId = 0L, k = 10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos"))
    }),
    "q21_embed_neardup" -> ((s, dir) => {
      // exact all-pairs, tiled: equi-joined tile pairs + primitive-array
      // kernels — no BroadcastNestedLoopJoin (τ=0.45 sits ~0.06 above the
      // background cosine distribution, far too loose for LSH recall; the
      // exact tiled path is the only shape that reproduces the oracle)
      Ann.cosinePairsBlocked(embeddings(s, dir), "vec_id", "embedding", tau = 0.45)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
        .orderBy("a", "b")
    }),
    "q69_ann_ivf" -> ((s, dir) => {
      // IVF coarse-quantizer path at full probe (nprobe = nlist): exercises
      // the train/assign/probe machinery end-to-end with an exact answer —
      // identical to the brute-force oracle; nprobe < nlist is the
      // recall-vs-scan-fraction scale path (PipelineSpec)
      Ann.ivfTopK(embeddings(s, dir), "vec_id", "embedding", queryId = 0L,
          k = 10, nlist = 8, nprobe = 8)
        .select(col("id").as("vec_id"), round(col("cos"), 6).as("cos"))
    }),
    "q105_ann_truncated" -> ((s, dir) => {
      // Matryoshka-style truncated-dimension pass: exact cosine over the
      // first 16 of 64 components (the cheap first stage for MRL
      // embeddings; rescore on survivors = bruteForceTopK)
      Ann.truncatedTopK(embeddings(s, dir), "vec_id", "embedding",
          dims = 16, queryId = 0L, k = 10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos"))
    }),
    "q98_ann_filtered" -> ((s, dir) => {
      // filtered kNN (KnnFloatVectorQuery with a filter): top-k among
      // label=1 vectors only; the predicate pushes into the parquet scan
      Ann.bruteForceTopKFiltered(embeddings(s, dir), "vec_id", "embedding",
          col("label") === 1, queryId = 0L, k = 10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos"))
    }),
    "q95_quantized_ann" -> ((s, dir) => {
      // int7 scalar quantization at confidence 1.0 (exact global min/max —
      // the SQL-replayable interval): quantized cosine top-k scored as
      // dot·α² + corrective offsets, the reference's DotProduct scorer; the
      // c<1 sampled-quantile fit and the rescore path are QuantizationSpec's
      val nv = Quantization.normalized(embeddings(s, dir), "vec_id", "embedding")
      val sq = Quantization.fit(nv, bits = 7, confidence = 1.0)
      Quantization.quantizedTopK(Quantization.quantizeAll(nv, sq), sq, queryId = 0L, k = 10)
        .select(col("id").as("vec_id"), round(col("qscore"), 6).as("qscore"))
    }),
    "q22_lang_id" -> ((s, dir) => {
      TextAnalysis.languageId(documentsExpr(s, dir), "text")
        .groupBy(col("predicted_lang")).agg(count(lit(1)).as("cnt"))
        .orderBy("predicted_lang")
    }),
    "q23_quality" -> ((s, dir) => {
      TextAnalysis.qualityScore(documentsExpr(s, dir), "text")
        .select(col("doc_id"), col("quality"))
        .orderBy("doc_id")
    }),
    "q24_token_stats" -> ((s, dir) => {
      val d = documentsExpr(s, dir)
      val toks = d.select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
      val tokAgg = toks.groupBy("source")
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("t")).as("n_terms"))
      val docAgg = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      docAgg.join(tokAgg, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_terms"))
        .orderBy("source")
    }),
    "q25_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(documentsExpr(s, dir), "text")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), col("fingerprint"))
        .orderBy("doc_id")
    }),
    "q26_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val assets = Multimodal.syntheticAssets(documentsExpr(s, dir), "doc_id", "text")
      Multimodal.decodeMeta(assets).toDF()
        .select(col("assetId").as("asset_id"), col("modality"),
          col("sizeBytes").as("size_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("nFrames").cast("long").as("n_frames"))
        .orderBy("asset_id")
    })
  )

  // ----------------------------------------------------------- oracle SQL

  /** Tokens + 3-shingles CTE over `documents` (matches TextOps.tokens /
    * TextOps.shingles). */
  private val SHINGLE_CTE: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term,
      |         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS i
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos
      |  FROM raw WHERE term <> ''
      |), sh AS (
      |  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS sg
      |  FROM toks a
      |  JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |  JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      |), shsz AS (
      |  SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id
      |)""".stripMargin

  private def jaccardPairsSql(tau: Double): String =
    s"""$SHINGLE_CTE,
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
       |  FROM sh x JOIN sh y ON x.sg = y.sg AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, round(c::DOUBLE / (sa.nsh + sb.nsh - c), 6) AS jaccard
       |FROM inter
       |JOIN shsz sa ON sa.doc_id = a
       |JOIN shsz sb ON sb.doc_id = b
       |WHERE c::DOUBLE / (sa.nsh + sb.nsh - c) >= $tau
       |ORDER BY a, b""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q16_dedup_fingerprint" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id, md5(string_agg(DISTINCT term, ' ' ORDER BY term)) AS f
        |  FROM raw WHERE term <> '' GROUP BY doc_id
        |), g AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS keep_id FROM fp
        |)
        |SELECT doc_id, keep_id FROM g WHERE doc_id <> keep_id ORDER BY doc_id""".stripMargin,

    "q17_dedup_minhash" -> jaccardPairsSql(0.9),

    // components of the EXACT τ=0.9 pair graph (q17 proves the engine's LSH
    // pair set equals it), closed transitively by a recursive CTE
    "q88_dedup_cluster" -> graft.SparkEntry.memSafe(
      s"""${SHINGLE_CTE.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |inter AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |  FROM sh x JOIN sh y ON x.sg = y.sg AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT a, b FROM inter
         |  JOIN shsz sa ON sa.doc_id = a
         |  JOIN shsz sb ON sb.doc_id = b
         |  WHERE c::DOUBLE / (sa.nsh + sb.nsh - c) >= 0.9),
         |edges AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         |SELECT u AS doc_id, least(u, min(v)) AS component
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin),

    "q18_dedup_simhash" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM raw WHERE term <> '' GROUP BY 1, 2
        |), th AS (
        |  SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf
        |), votes AS (
        |  SELECT doc_id, bs.b AS b,
        |         sum(CASE WHEN (h >> bs.b) & 1 = 1 THEN tf ELSE -tf END) AS v
        |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS b) bs
        |  GROUP BY 1, 2
        |), sig AS (
        |  SELECT doc_id,
        |         sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS s
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |       bit_count(xor(x.s, y.s))::BIGINT AS hamming
        |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.s, y.s)) <= 3
        |ORDER BY a, b""".stripMargin,

    "q19_dedup_ngram" -> jaccardPairsSql(0.8),

    "q20_ann_topk" ->
      """SELECT vec_id,
        |       round(list_cosine_similarity(embedding::DOUBLE[],
        |         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY list_cosine_similarity(embedding::DOUBLE[],
        |  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    // IVF at full probe is exact — same oracle as brute force
    "q69_ann_ivf" ->
      """SELECT vec_id,
        |       round(list_cosine_similarity(embedding::DOUBLE[],
        |         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY list_cosine_similarity(embedding::DOUBLE[],
        |  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q105_ann_truncated" ->
      """SELECT vec_id,
        |       round(list_cosine_similarity(list_slice(embedding, 1, 16)::DOUBLE[],
        |         (SELECT list_slice(embedding, 1, 16)::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY list_cosine_similarity(list_slice(embedding, 1, 16)::DOUBLE[],
        |  (SELECT list_slice(embedding, 1, 16)::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q98_ann_filtered" ->
      """SELECT vec_id,
        |       round(list_cosine_similarity(embedding::DOUBLE[],
        |         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos
        |FROM embeddings WHERE vec_id <> 0 AND label = 1
        |ORDER BY list_cosine_similarity(embedding::DOUBLE[],
        |  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    // int7 scalar quantization replayed exactly: unit-normalize, global
    // min/max interval, byte = floor(scale·(x − lo) + 0.5), per-vector
    // corrective offset Σ lo·(x − lo/2) + (dx − dxq)·dxq, score
    // max((1 + dot·α² + offQ + offD)/2, 0)
    "q95_quantized_ann" ->
      """WITH nv AS (
        |  SELECT vec_id,
        |         list_transform(embedding::DOUBLE[],
        |           x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM nv
        |), params AS (
        |  SELECT min(x) AS lo, max(x) AS hi,
        |         127.0 / (max(x) - min(x)) AS scale,
        |         (max(x) - min(x)) / 127.0 AS alpha
        |  FROM el
        |), q AS (
        |  SELECT vec_id, i, x,
        |         floor((SELECT scale FROM params)
        |           * (least(greatest(x, (SELECT lo FROM params)), (SELECT hi FROM params))
        |              - (SELECT lo FROM params)) + 0.5) AS b
        |  FROM el
        |), voff AS (
        |  SELECT vec_id,
        |         sum((SELECT lo FROM params) * (x - (SELECT lo FROM params) / 2.0)
        |             + ((x - (SELECT lo FROM params)) - b * (SELECT alpha FROM params))
        |               * (b * (SELECT alpha FROM params))) AS o
        |  FROM q GROUP BY vec_id
        |), dp AS (
        |  SELECT d.vec_id, sum(d.b * qq.b) AS dot
        |  FROM q d JOIN q qq ON d.i = qq.i AND qq.vec_id = 0
        |  WHERE d.vec_id <> 0 GROUP BY d.vec_id
        |), scored AS (
        |  SELECT dp.vec_id,
        |         greatest((1 + dp.dot * (SELECT alpha * alpha FROM params)
        |           + (SELECT o FROM voff WHERE vec_id = 0) + od.o) / 2.0, 0) AS qscore
        |  FROM dp JOIN voff od ON dp.vec_id = od.vec_id
        |)
        |SELECT vec_id, round(qscore, 6) AS qscore FROM scored
        |ORDER BY qscore DESC, vec_id LIMIT 10""".stripMargin,

    "q21_embed_neardup" ->
      """SELECT x.vec_id AS a, y.vec_id AS b,
        |       round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
        |WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.45
        |ORDER BY a, b""".stripMargin,

    "q22_lang_id" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents
        |), scores AS (
        |  SELECT doc_id,
        |    count(*) FILTER (term IN ('the','a','of','and','to','in','is')) AS s_en,
        |    count(*) FILTER (term IN ('der','die','und','das','ist','ein')) AS s_de,
        |    count(*) FILTER (term IN ('le','la','les','et','est','une')) AS s_fr,
        |    count(*) FILTER (term IN ('el','los','las','es','una','y')) AS s_es
        |  FROM raw WHERE term <> '' GROUP BY doc_id
        |), pred AS (
        |  SELECT d.doc_id,
        |    CASE
        |      WHEN length(d.text) > 0 AND
        |           length(regexp_replace(d.text, '[^a-zA-Z0-9 ]', '', 'g'))::DOUBLE
        |             / length(d.text) < 0.5 THEN 'zh'
        |      WHEN greatest(coalesce(s_en,0), coalesce(s_de,0), coalesce(s_fr,0), coalesce(s_es,0)) = 0 THEN 'und'
        |      WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |      WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |      WHEN s_fr >= s_es THEN 'fr'
        |      ELSE 'es'
        |    END AS predicted_lang
        |  FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
        |)
        |SELECT predicted_lang, count(*) AS cnt FROM pred
        |GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin,

    "q23_quality" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, count(*) AS n, count(DISTINCT term) AS nd
        |  FROM raw WHERE term <> '' GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  round((least(coalesce(t.n, 0) / 50.0, 1.0)
        |       + CASE WHEN coalesce(t.n, 0) > 0 THEN t.nd::DOUBLE / t.n ELSE 0.0 END
        |       + CASE WHEN length(d.text) > 0
        |              THEN length(regexp_replace(d.text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE / length(d.text)
        |              ELSE 0.0 END) / 3.0, 6) AS quality
        |FROM documents d LEFT JOIN t ON d.doc_id = t.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q24_token_stats" ->
      """WITH raw AS (
        |  SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents
        |), t AS (
        |  SELECT source, count(*) AS n_tokens, count(DISTINCT term) AS n_terms
        |  FROM raw WHERE term <> '' GROUP BY source
        |), d AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        |)
        |SELECT d.source, d.n_docs, t.n_tokens, t.n_terms
        |FROM d JOIN t ON d.source = t.source ORDER BY d.source""".stripMargin,

    "q25_fingerprint" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents WHERE doc_id < 20
        |)
        |SELECT doc_id, md5(string_agg(DISTINCT term, ' ' ORDER BY term)) AS fingerprint
        |FROM raw WHERE term <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q26_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |       octet_length(encode(text))::BIGINT AS size_bytes,
        |       (ascii(substr(text, 1, 1)) % 64 + 1)::BIGINT AS width,
        |       (ascii(substr(text, 2, 1)) % 64 + 1)::BIGINT AS height,
        |       (CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) // 256 + 1 ELSE 1 END)::BIGINT AS n_frames
        |FROM documents ORDER BY asset_id""".stripMargin
  )
}
