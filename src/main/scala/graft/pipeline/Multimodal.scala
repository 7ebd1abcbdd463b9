package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque payload bytes + typed metadata. The payload
  * stays `binary` end-to-end (never decoded into Spark rows wholesale);
  * metadata travels as ordinary columns so filters/joins prune without
  * touching payload bytes — at 100 TB the parquet column split means a
  * metadata-only query never reads the blob pages at all.
  */
final case class MediaAsset(
    assetId: Long,
    modality: String, // "image" | "audio" | "video"
    bytes: Array[Byte])

/** Decoded (stub) metadata for an asset. */
final case class MediaMeta(
    assetId: Long,
    modality: String,
    sizeBytes: Long,
    width: Int,
    height: Int,
    nFrames: Int)

/** Extracted feature vector for an asset. */
final case class MediaFeature(assetId: Long, feature: Array[Float])

/** Multimodal-column plumbing: decode / feature-extract / frame-sample over
  * opaque `binary` payloads.
  *
  * The *decode* step is a STUB — image/audio codecs are not available in this
  * environment — implemented as a deterministic function of the payload bytes
  * so every downstream stage (schema, batching, partitioning, joins) is real
  * and testable. Swap `stubDecode`/`stubFeature` for a real codec (JNI or a
  * vectorized Arrow UDF) without touching any caller.
  *
  * Batch shape: `mapPartitions` processes a whole partition per task — the
  * same contract a vectorized/Arrow UDF would get — so a real decoder can
  * amortize model/codec init across the partition (the reason `mapInPandas`
  * exists on the Python side).
  */
object Multimodal {

  /** STUB decoder: deterministic pseudo-metadata from the payload header.
    * A real implementation parses the container format here. */
  private[pipeline] def stubDecode(a: MediaAsset): MediaMeta = {
    val b0 = if (a.bytes.nonEmpty) a.bytes(0) & 0xFF else 0
    val b1 = if (a.bytes.length > 1) a.bytes(1) & 0xFF else 0
    MediaMeta(
      assetId = a.assetId,
      modality = a.modality,
      sizeBytes = a.bytes.length.toLong,
      width = b0 % 64 + 1,
      height = b1 % 64 + 1,
      nFrames = if (a.modality == "video") (a.bytes.length / 256) + 1 else 1)
  }

  /** STUB feature extractor: a deterministic 8-dim byte-histogram sketch of
    * the payload. A real implementation runs the vision/audio encoder here,
    * batched per partition. */
  private[pipeline] def stubFeature(a: MediaAsset): MediaFeature = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < a.bytes.length) {
      hist((a.bytes(i) & 0xFF) >> 5) += 1f
      i += 1
    }
    val n = math.max(1, a.bytes.length).toFloat
    MediaFeature(a.assetId, hist.map(_ / n))
  }

  /** Decode metadata for every asset. One pass, codec init amortized per
    * partition. */
  def decodeMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: open codec context once per partition here
      it.map(stubDecode)
    }
  }

  /** Extract features for every asset (partition-batched). */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it => it.map(stubFeature))
  }

  /** Frame sampling for video payloads: every `stride`-th 256-byte "frame"
    * (stub frame = fixed-size byte window; a real impl seeks keyframes).
    * Output rows are (assetId, frameIdx, frameBytes) — exploding frames into
    * rows is what makes downstream per-frame ops (dedup, captioning)
    * ordinary relational operators. */
  def sampleFrames(assets: Dataset[MediaAsset], stride: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").flatMap { a =>
      val frameSize = 256
      val nFrames = a.bytes.length / frameSize + 1
      (0 until nFrames by stride).map { f =>
        val from = f * frameSize
        val until = math.min(a.bytes.length, from + frameSize)
        (a.assetId, f, java.util.Arrays.copyOfRange(a.bytes, from, until))
      }
    }.toDF("assetId", "frameIdx", "frameBytes")
  }

  /** Wrap a text corpus as deterministic fake assets (payload = UTF-8 bytes,
    * modality by id mod 3) — the fixture generator for tests and the
    * oracle-checked demo query. */
  def syntheticAssets(df: DataFrame, idCol: String, textCol: String): Dataset[MediaAsset] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("assetId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3 + 1).cast("int")).as("modality"),
        encode(col(textCol), "UTF-8").as("bytes"))
      .as[MediaAsset]
  }
}
